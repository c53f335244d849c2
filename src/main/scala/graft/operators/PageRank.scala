package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in EXACT integer arithmetic — link-graph
  * authority scoring (the quality prior web-crawl corpora weight
  * sampling by; Brin & Page 1998) made engine-portable:
  *
  * Ranks are scaled integers (initial mass `scale` per node); each
  * round every node ships `pr div out_degree` (integer floor
  * division) along its out-edges and collects
  * `pr' = (1−d)·scale + d · Σ contrib`, with the damping product
  * `(850 · Σ) div 1000` also in integer space. No floating-point
  * summation anywhere, so the result after N rounds is bit-identical
  * under ANY partitioning and in ANY engine — q120's oracle replays
  * all three unrolled rounds in SQL. (The deliberate trade: integer
  * truncation loses ≤1 unit per division — at scale=10⁶ a relative
  * error ≤10⁻⁶ per hop, irrelevant for ranking, decisive for
  * verifiability.)
  *
  * Scale posture: each round is one equi-join of the edge list with
  * the (node, pr) table plus one hash aggregate keyed by dst — the
  * standard Pregel-on-dataframes shape. Edges carry ids only; degree
  * is precomputed once. A fixed iteration count keeps lineage linear
  * (3 rounds here; a convergence loop would localCheckpoint per round
  * like [[Components]]).
  */
object PageRank {

  /** @param nodes one column `id` — includes isolated nodes, which
    *              keep the teleport mass `(1−d)·scale`
    * @param edges columns `src`, `dst` (directed; pass both
    *              directions for an undirected graph)
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
          scale: Long = 1000000L): DataFrame = {
    // materialize the graph ONCE: the unrolled iteration tree
    // otherwise re-derives edges (a lineitem-wide distinct self-join)
    // and deg per round — measured 3.8 s → ~1.5 s at sf0.1 for 3
    // rounds; same fixpoint-loop rule as Components
    val e = edges.localCheckpoint(true)
    val n = nodes.localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val base = lit((scale * 150L) / 1000L)
    var pr = n.select(col("id"), lit(scale).as("pr"))
    var i = 0
    while (i < iters) {
      val contribs = e
        .join(pr.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      pr = n.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (base + expr("(850 * coalesce(s, 0L)) div 1000")).as("pr"))
      i += 1
    }
    pr
  }

  private val graphMemo = new graft.core.SessionMemo

  /** [[supplierCoFulfillment]] memoized per (session, input): the
    * graph build is a lineitem-wide distinct self-join — the dominant
    * cost of q120 — and a link graph is built once then ranked many
    * times (every PageRank/centrality/community query shares it).
    */
  def supplierCoFulfillmentCached(lineitem: DataFrame, inputKey: String)
  : (DataFrame, DataFrame) = {
    val spark = lineitem.sparkSession
    lazy val built = supplierCoFulfillment(lineitem)
    val nodes = graphMemo.getOrElseUpdate(spark, s"cofulfil-nodes|$inputKey") {
      built._1
    }
    val edges = graphMemo.getOrElseUpdate(spark, s"cofulfil-edges|$inputKey") {
      built._2
    }
    (nodes, edges)
  }

  /** Supplier co-fulfillment graph: suppliers are linked when they
    * fulfil lineitems of the same order (both directions). Nodes =
    * every supplier appearing in the fact table, so suppliers who
    * never co-fulfil keep exactly the teleport mass.
    */
  def supplierCoFulfillment(lineitem: DataFrame): (DataFrame, DataFrame) = {
    val os = lineitem.select(col("l_orderkey").as("o"),
      col("l_suppkey").as("s")).distinct()
    val edges = os.alias("a").join(os.alias("b"),
        col("a.o") === col("b.o") && col("a.s") =!= col("b.s"))
      .select(col("a.s").as("src"), col("b.s").as("dst"))
      .distinct()
    val nodes = os.select(col("s").as("id")).distinct()
    (nodes, edges)
  }
}
