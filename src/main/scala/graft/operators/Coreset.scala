package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection over an embedding column —
  * diversity-aware subset selection (Gonzalez 1985 farthest-point
  * traversal; the "k-Center-Greedy" of coreset/active-learning
  * pipelines, e.g. Sener & Savarese 2018): pick the point farthest
  * from the current centers, k times. The selected rows 2-approximate
  * the optimal k-center cover, which is what "choose k maximally
  * diverse training examples / dedup anchors" asks for.
  *
  * Physical shape (what matters at 100 TB): k rounds, each ONE
  * map-only scan of the cached working set — the running
  * min-distance-to-centers column folds in only the single NEW center
  * (a scalar literal in the plan, not a join), and the updated column
  * is re-cached each round so round j costs the same O(N) as round 1
  * (total O(Nk) distance evals, k cache swaps). The farthest point
  * comes from `max(struct(dist, -id))` — a tree-aggregate, never a
  * sort. Driver state is k centers (k is small by definition); the
  * corpus is never shuffled or collected.
  *
  * Distance = 1 − cosine via the native codegen `graft_cosine`
  * expression. Iterative argmax ⇒ not single-statement-SQL
  * replayable (the q69/q131 class); correctness is pinned by
  * CoresetSpec against an independent driver-side reference
  * implementation plus planted-cluster coverage.
  */
object Coreset {

  /** Select `k` centers greedily; returns one row per center in
    * selection order: (sel_order, vec_id, radius) where `radius` is
    * the point's distance to the nearest EARLIER center at the moment
    * it was chosen (the cover radius achieved by the previous
    * selection — monotonically non-increasing; −1.0 for the seed row,
    * which has no earlier center). The first center is the min-id row
    * (deterministic seed, no RNG); ties on distance break to the
    * smaller vec_id.
    */
  def kCenters(emb: DataFrame, vecCol: String, idCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    val base = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v")).persist()
    try {
      val n = base.count()
      require(n > 0, "empty input")
      val kk = math.min(k.toLong, n).toInt

      def vecOf(id: Long): Array[Float] =
        base.filter(col("id") === id).select("v").head()
          .getSeq[Float](0).toArray
      def distToCol(vec: Array[Float]) =
        lit(1.0) - call_function("graft_cosine", col("v"), typedLit(vec))

      val firstId = base.agg(min("id")).head().getLong(0)
      var centers = List((1L, firstId, -1.0))
      var cur = base.withColumn("dist", distToCol(vecOf(firstId))).persist()
      for (j <- 2 to kk) {
        // farthest point, min-id tie-break: max of (dist, -id) structs
        val far = cur
          .agg(max(struct(col("dist"), (-col("id")).as("nid"))).as("m"))
          .select(col("m.dist"), (-col("m.nid")).as("id")).head()
        val (fd, fid) = (far.getDouble(0), far.getLong(1))
        centers ::= ((j.toLong, fid, fd))
        if (j < kk) {
          // fold the new center into dist and re-cache so the NEXT
          // round reads a materialized column (flat lineage, O(N)/round)
          val next = cur.withColumn("dist",
            least(col("dist"), distToCol(vecOf(fid)))).persist()
          next.count()
          cur.unpersist()
          cur = next
        }
      }
      cur.unpersist()
      centers.reverse.toDF("sel_order", "vec_id", "radius")
    } finally base.unpersist()
  }
}
