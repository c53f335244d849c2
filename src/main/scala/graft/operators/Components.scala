package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step
  * that turns pairwise similarity output (Dedup.*NearDups) into
  * dedup GROUPS: every doc in a component is a near-dup (possibly
  * transitively) of the others, and the min-id member is the canonical
  * representative to keep.
  *
  * Algorithm: iterative min-label propagation (each node repeatedly
  * adopts the smallest label among itself and its neighbors) with a
  * driver-side convergence check. Each iteration is one join + one
  * aggregate — the alternating large-star/small-star optimization
  * halves iterations on long chains but the per-round plan shape is
  * identical; chain diameters in near-dup graphs are tiny (dup
  * clusters are cliques or near-cliques), so rounds ≈ 2-3 in practice.
  * All state lives in DataFrames; nothing is collected to the driver
  * except the per-round change count.
  */
object Components {

  /** @param pairs (id_a, id_b) undirected edges
    * @return (id, component) — component = min id reachable
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    // localCheckpoint each round: iterative self-joins otherwise grow
    // the logical plan exponentially (every round embeds the previous
    // round's plan) — lineage truncation is mandatory for any
    // fixpoint-loop DataFrame algorithm. The INITIAL labels need no
    // checkpoint (their lineage is one projection over the cached
    // edges); the first round's checkpoint truncates it anyway, and
    // skipping it saves one materialization job per call.
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("component", col("id"))

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // each node adopts min(own component, neighbors' components);
      // the per-row changed flag is computed IN the same projection so
      // convergence is one coalesced count — no labels⋈updated join,
      // no overflow-prone Σlabel arithmetic, and it works for any
      // orderable id type (string/UUID ids included) and empty input
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("component").as("nbr_component"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"),
            coalesce(col("nbr_component"), col("component"))).as("component"),
          (coalesce(col("nbr_component"), col("component")) < col("component"))
            .cast("long").as("__changed"))
        .localCheckpoint(true)
      val changes = updated
        .agg(coalesce(sum("__changed"), lit(0L))).head().getLong(0)
      labels = updated.drop("__changed")
      converged = changes == 0L
      iter += 1
    }
    edges.unpersist()
    // wrong-but-silent labels are worse than failing: label propagation
    // advances one hop per round, so hitting maxIter means some
    // component with diameter > maxIter is still split
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations " +
        "(component diameter exceeds maxIter); raise maxIter")
    labels
  }

  /** Session-scoped memo of computed label tables, mirroring
    * `Dedup.pairGraphMemo`: the queries that consume the same pair
    * graph (cluster report, corpus rewrite, end-to-end pipeline) run
    * the fixpoint ONCE per session. Deterministic input ⇒ identical
    * labels, so reuse cannot change answers.
    */
  private val labelMemo = new graft.core.SessionMemo

  /** `connectedComponents` with session-lifetime reuse keyed by the
    * caller-supplied pair-graph identity (e.g. sfDir + parameters);
    * entries evict on session end and `inputKey` must identify the
    * pair graph's CONTENT (the [[graft.core.SessionMemo]] contract).
    */
  def connectedComponentsCached(pairs: DataFrame,
                                inputKey: String): DataFrame =
    labelMemo.getOrElseUpdate(pairs.sparkSession, inputKey) {
      connectedComponents(pairs)
    }

  /** Deduplicate a corpus given near-dup pairs: keep the min-id doc of
    * every component plus all unpaired docs. `cacheKey` opts into the
    * session label memo (pass the pair graph's identity).
    */
  def dedupCorpus(df: DataFrame, idCol: String, pairs: DataFrame,
                  cacheKey: Option[String] = None): DataFrame = {
    val comps = cacheKey.fold(connectedComponents(pairs))(
      connectedComponentsCached(pairs, _))
    val losers = comps.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Deduplicate keeping the BEST doc of every near-dup cluster by a
    * caller-chosen quality score (ties → smallest id), not the
    * smallest-id doc: min-id keeps an arbitrary cluster member, while
    * a curation pipeline wants the longest / highest-quality variant
    * to survive. Unpaired docs always survive.
    *
    * Everything after component labeling is ids+score only: one hash
    * aggregate (`max(struct(score, -id))`) picks each cluster's
    * winner, and the corpus is anti-joined against the loser id list
    * — doc payloads never enter a shuffle, and the component table is
    * pair-graph-sized (tiny next to the corpus).
    */
  def canonicalByScore(df: DataFrame, idCol: String, scoreCol: String,
                       pairs: DataFrame,
                       cacheKey: Option[String] = None): DataFrame = {
    val comps = cacheKey.fold(connectedComponents(pairs))(
      connectedComponentsCached(pairs, _))
    val scored = comps.join(
      df.select(col(idCol).as("id"), col(scoreCol).as("score")), "id")
    val winners = scored.groupBy("component")
      .agg(max(struct(col("score"), (-col("id")).as("neg_id"))).as("w"))
      .select(col("component"), (-col("w.neg_id")).as("win_id"))
    val losers = comps.join(winners, "component")
      .filter(col("id") =!= col("win_id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
