package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected graph — the
  * clustering-coefficient / community-density primitive (here driven
  * by the supplier co-fulfillment graph; in a corpus pipeline the same
  * shape runs over near-dup or citation graphs).
  *
  * Algorithm: orient every undirected edge low→high, build wedges by
  * joining oriented edges on the middle vertex, then close each wedge
  * with a third equi-join back to the edge set. Each triangle
  * {a<b<c} is produced exactly once as (a,b)+(b,c)+(a,c).
  *
  * Scale posture: both joins are hash equi-joins on vertex keys. The
  * wedge count is Σ_v C(out-deg(v), 2); the production refinement for
  * skewed graphs is DEGREE ordering (orient edges toward the
  * higher-degree endpoint, capping out-degrees at O(√m)) — same plan,
  * different orientation key. A minimum co-occurrence support
  * threshold prunes the quasi-complete "everything touches
  * everything" core that makes raw co-occurrence graphs explode.
  */
object Triangles {

  private val edgeMemo = new graft.core.SessionMemo

  /** [[coOccurrenceEdges]] memoized per (input, params) — the
    * co-occurrence graph is a built-once artifact (the PageRank
    * co-fulfillment pattern): iterative/graph queries over the same
    * corpus probe the built edge set instead of re-running the
    * group self-join.
    */
  def coOccurrenceEdgesCached(pairs: DataFrame, inputKey: String,
                              groupCol: String, memberCol: String,
                              minSupport: Long): DataFrame =
    edgeMemo.getOrElseUpdate(pairs.sparkSession,
      s"cooc|$inputKey|$groupCol|$memberCol|$minSupport") {
      coOccurrenceEdges(pairs, groupCol, memberCol, minSupport)
    }

  /** Undirected support-filtered co-occurrence edges (src < dst). */
  def coOccurrenceEdges(pairs: DataFrame, groupCol: String,
                        memberCol: String, minSupport: Long): DataFrame = {
    val gm = pairs.select(col(groupCol).as("g"), col(memberCol).as("m"))
      .distinct()
    gm.alias("a").join(gm.alias("b"),
        col("a.g") === col("b.g") && col("a.m") < col("b.m"))
      .groupBy(col("a.m").as("src"), col("b.m").as("dst"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select("src", "dst")
  }

  /** Per-vertex triangle participation counts, densest first. */
  def triangleCounts(edges: DataFrame, topK: Int = 20): DataFrame = {
    val und = edges.select(col("src"), col("dst")).distinct()
    val e1 = und.select(col("src").as("a"), col("dst").as("b"))
    val e2 = und.select(col("src").as("b"), col("dst").as("c"))
    val tri = e1.join(e2, "b")
      .join(und.select(col("src").as("a"), col("dst").as("c")),
        Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("node"))
      .limit(topK)
  }
}
