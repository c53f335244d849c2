package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-round synchronous LABEL PROPAGATION communities (Raghavan
  * et al. 2007) — the community detector beside [[Components]]:
  * connected components answer "is there ANY path", LPA answers
  * "where is the DENSE structure" (a single bridge edge cannot glue
  * two tight clusters into one community, which is exactly what you
  * want when a co-occurrence graph has incidental links).
  *
  * Determinism contract: SYNCHRONOUS rounds (every node updates from
  * the previous round's labels), most-frequent neighbor label with
  * (count desc, label asc) tie-break, and a FIXED round count rather
  * than a convergence test — the run is a pure function of the edge
  * set, replayable on any engine by unrolling the rounds. (Classic
  * async LPA is order-dependent; the synchronous fixed-round form
  * trades a little convergence speed for exact reproducibility.)
  *
  * Scale shape: each round is one edge-sized join + a (node, label)
  * hash aggregate + a top-1 window per node — rounds × O(|E|), no
  * driver state, lineage flattened per round (localCheckpoint) so a
  * long ladder cannot blow the planner.
  */
object LabelProp {

  /** `rounds` synchronous LPA rounds over undirected `(src, dst)`
    * edges. Returns (id, community) for every endpoint; isolated
    * label regions keep their min-id seed.
    */
  def communities(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"rounds out of range: $rounds")
    val ed = edges.select(col("src").as("s"), col("dst").as("d"))
      .unionByName(edges.select(col("dst").as("s"), col("src").as("d")))
      .localCheckpoint(true)
    val nodes = ed.select(col("s").as("id")).distinct()
      .localCheckpoint(true)
    var labels = nodes.withColumn("lab", col("id"))
    for (_ <- 1 to rounds) {
      val nl = ed
        .join(labels.select(col("id").as("s"), col("lab")), "s")
        .groupBy(col("d").as("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val pick = nl.withColumn("rk", row_number().over(
          Window.partitionBy("id").orderBy(col("c").desc, col("lab"))))
        .filter(col("rk") === 1)
        .select(col("id"), col("lab").as("new_lab"))
      labels = nodes.join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lab"), col("id")).as("lab"))
        .localCheckpoint(true)
    }
    labels.select(col("id"), col("lab").as("community"))
  }
}
