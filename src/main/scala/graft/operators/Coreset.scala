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

  /** Same double-fold cosine as the native `graft_cosine` expression
    * (sequential accumulation, no guard on zero norms) — keeps the
    * in-memory greedy bit-compatible with the scan form.
    */
  private[graft] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact Gonzalez greedy on an IN-MEMORY point set — the same seed
    * (min id), tie (larger dist, then smaller id) and distance rules
    * as [[kCenters]]; used per-partition and driver-side by
    * [[kCentersBatched]]. Returns (sel_order, id, radius).
    */
  private[graft] def greedyInMemory(pts: Array[(Long, Array[Float])],
                                    k: Int): Array[(Long, Long, Double)] = {
    val kk = math.min(k, pts.length)
    if (kk == 0) return Array.empty
    val seedIdx = pts.indices.minBy(pts(_)._1)
    val out = new Array[(Long, Long, Double)](kk)
    out(0) = (1L, pts(seedIdx)._1, -1.0)
    val dist = new Array[Double](pts.length)
    var i = 0
    while (i < pts.length) {
      dist(i) = 1.0 - cosine(pts(i)._2, pts(seedIdx)._2); i += 1
    }
    var j = 2
    while (j <= kk) {
      var best = 0
      i = 1
      while (i < pts.length) {
        if (dist(i) > dist(best) ||
          (dist(i) == dist(best) && pts(i)._1 < pts(best)._1)) best = i
        i += 1
      }
      out(j - 1) = (j.toLong, pts(best)._1, dist(best))
      if (j < kk) {
        i = 0
        while (i < pts.length) {
          val d = 1.0 - cosine(pts(i)._2, pts(best)._2)
          if (d < dist(i)) dist(i) = d
          i += 1
        }
      }
      j += 1
    }
    out
  }

  /** Partition-parallel k-center for LARGE k — the composable-coreset
    * / tournament scheme (Gonzalez-on-Gonzalez): each partition runs
    * the exact greedy over ITS points to nominate k local candidates
    * (one map-only pass, all partitions in parallel), then the driver
    * runs the exact greedy over the P·k nominated candidates.
    *
    * Why it exists: [[kCenters]] is k DRIVER ROUNDS — each a Spark job
    * + cache swap. Flat per-round cost is fine at k≈8, but at k in the
    * thousands the job-scheduling floor alone (tens of ms × k) plus k
    * cache materializations dominates; this form is ONE distributed
    * pass regardless of k, with wall clock ≈ scan + (N/P)·k local
    * distance evals in parallel + (P·k)·k driver evals. Measured
    * (Profile stress-kcenter, 200k × 64-dim): sequential grows
    * linearly in k while batched stays near-flat — see SURVEY §8.2.
    *
    * Approximation: the sequential greedy 2-approximates the optimal
    * k-center radius; the two-level scheme keeps a CONSTANT factor
    * (any point is within its partition's local cover radius of a
    * candidate, and candidates are covered by the final selection, so
    * the cover radius telescopes to O(OPT) — the standard composable-
    * coreset argument, e.g. Indyk, Mahabadi, Mahdian & Mirrokni,
    * "Composable core-sets for diversity and coverage maximization",
    * PODS 2014). CoresetSpec pins: ≡ [[kCenters]] exactly at
    * numPartitions = 1, planted-cluster coverage, and a ≤3× cover-
    * radius bound vs sequential on random data.
    *
    * Driver memory is P·k vectors (the nominated candidates) — size
    * numPartitions accordingly; for k·P beyond driver memory, insert a
    * middle tournament level (the scheme composes).
    *
    * Deterministic: partitions are hash-of-id (layout-independent),
    * seeds/ties are id-ordered, no RNG anywhere.
    */
  def kCentersBatched(emb: DataFrame, vecCol: String, idCol: String,
                      k: Int, numPartitions: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val candidates = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .repartition(numPartitions, col("id"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val pts = it.toArray
        val byId = pts.iterator.map(p => p._1 -> p._2).toMap
        greedyInMemory(pts, k).iterator
          .map { case (_, id, _) => (id, byId(id)) }
      }
      .collect()
    require(candidates.nonEmpty, "empty input")
    val sel = greedyInMemory(candidates.sortBy(_._1), k)
    sel.toSeq.toDF("sel_order", "vec_id", "radius")
  }
}
