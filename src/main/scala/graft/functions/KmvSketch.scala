package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** KMV (k-minimum-values / bottom-k) distinct-count sketch as a typed
  * `Aggregator` — the §2.8 "custom UDAF surface" exercised with a
  * genuinely mergeable sketch:
  *
  *  - keep the k smallest DISTINCT 64-bit hashes of the values;
  *  - if fewer than k survive, the count is exact;
  *  - else estimate D ≈ (k−1)/u(k) where u(k) is the k-th smallest
  *    hash mapped to (0,1) in unsigned order (Bar-Yossef et al. 2002,
  *    standard bottom-k estimator);
  *  - merging two sketches = merge-distinct-take-k ⇒ map-side partial
  *    aggregation works, shuffle carries ≤ k longs per group.
  *
  * Deterministic (xxhash64, no RNG), order-independent, and unlike
  * `approx_count_distinct`'s HLL the sketch doubles as a uniform
  * sample of the value space (bottom-k hashes = deterministic random
  * sample — the basis of q44-style sampling at sketch scale).
  *
  * Input is the PRE-HASHED value: apply as `kmv(xxhash64(col), k)`.
  */
object KmvSketch {

  final case class Buf(values: Seq[Long])

  /** Unsigned-order key for a signed Long hash. */
  @inline private def uord(h: Long): Long = h ^ Long.MinValue

  class KmvAggregator(k: Int) extends Aggregator[java.lang.Long, Buf, Long] {
    require(k >= 2, "k must be >= 2")

    override def zero: Buf = Buf(Vector.empty)

    override def reduce(b: Buf, boxed: java.lang.Long): Buf = {
      if (boxed == null) return b // null input ≡ countDistinct: skipped
      val h = boxed.longValue()
      // hot path first: a saturated sketch rejects hashes above its
      // k-th minimum in O(1)-ish (single maxBy) without the O(k)
      // contains scan — after saturation almost every row exits here
      if (b.values.length >= k) {
        val worst = b.values.maxBy(uord)
        if (uord(h) >= uord(worst)) b
        else if (b.values.contains(h)) b
        else Buf(b.values.filterNot(_ == worst) :+ h)
      } else if (b.values.contains(h)) b
      else Buf(b.values :+ h)
    }

    override def merge(a: Buf, b: Buf): Buf =
      Buf((a.values ++ b.values).distinct.sortBy(uord).take(k))

    override def finish(b: Buf): Long = {
      val vs = b.values
      if (vs.length < k) vs.length.toLong
      else {
        val kth = vs.map(uord).max
        // map to (0,1): shift unsigned order into positive double space
        val u = (kth.toDouble - Long.MinValue.toDouble) /
          math.pow(2.0, 64)
        math.round((k - 1) / u)
      }
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: `KmvSketch.distinctEstimate(col("x"), 256)`.
    * NULLs are excluded (countDistinct semantics): xxhash64(null)
    * would hash to the seed constant, so the null is made explicit
    * BEFORE hashing and skipped in reduce.
    */
  def distinctEstimate(c: Column, k: Int = 256): Column =
    udaf(new KmvAggregator(k), Encoders.LONG)
      .apply(org.apache.spark.sql.functions.when(c.isNotNull, xxhash64(c)))

  /** Bottom-k estimator shared by [[KmvAggregator.finish]] and
    * [[graft.functions.KmvSetOps]]: exact when the sketch holds fewer
    * than k hashes, else D ≈ (k−1)/u(k).
    */
  def estimateFrom(sortedByUord: Array[Long], k: Int): Long = {
    if (sortedByUord.length < k) sortedByUord.length.toLong
    else {
      val kth = uord(sortedByUord(k - 1))
      val u = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1) / u)
    }
  }

  private[functions] def uordKey(h: Long): Long = uord(h)

  /** Same sketch, materialized: the bottom-k hash array itself (sorted
    * in unsigned order) instead of the scalar estimate. This is the
    * form set operations need — a KMV sketch of A is simultaneously a
    * uniform sample of A's hash space, so two materialized sketches
    * support union / intersection / Jaccard estimation
    * (Beyer et al., "On Synopses for Distinct-Value Estimation Under
    * Multiset Operations", SIGMOD 2007) via [[KmvSetOps]].
    */
  class KmvArrayAggregator(k: Int)
    extends Aggregator[java.lang.Long, Buf, Array[Long]] {
    private val inner = new KmvAggregator(k)
    override def zero: Buf = inner.zero
    override def reduce(b: Buf, v: java.lang.Long): Buf = inner.reduce(b, v)
    override def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
    override def finish(b: Buf): Array[Long] =
      b.values.sortBy(uord).toArray
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form of the materialized sketch. */
  def sketchArray(c: Column, k: Int = 256): Column =
    udaf(new KmvArrayAggregator(k), Encoders.LONG)
      .apply(org.apache.spark.sql.functions.when(c.isNotNull, xxhash64(c)))
}

/** `graft_kmv_setops(sketch_a, sketch_b, k)` — distinct-count algebra
  * over two materialized KMV sketches (Beyer et al., SIGMOD 2007):
  *
  *  - union: the bottom-k of the merged hash sets IS the KMV sketch
  *    of A ∪ B, so the standard estimator applies directly;
  *  - intersection: the merged bottom-k is a uniform sample of
  *    A ∪ B's hash space, so the fraction ρ of its members present in
  *    BOTH input sketches estimates |A∩B| / |A∪B| (= Jaccard), and
  *    |A∩B| ≈ ρ · est(A∪B);
  *  - when BOTH sketches are unsaturated (< k hashes) they are the
  *    complete hash sets and every output is exact.
  *
  * Evaluates once per pair of GROUP results — never in a per-row hot
  * loop — so a `CodegenFallback` eval is deliberate (same reasoning
  * as `graft_td_quantile`). Cost O(k) with a hash-set probe.
  */
case class KmvSetOps(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int)
  extends org.apache.spark.sql.catalyst.expressions.Expression
  with org.apache.spark.sql.catalyst.trees.BinaryLike[
    org.apache.spark.sql.catalyst.expressions.Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types._

  require(k >= 2, "k must be >= 2")

  override def dataType: DataType = StructType(Seq(
    StructField("est_a", LongType, nullable = false),
    StructField("est_b", LongType, nullable = false),
    StructField("est_union", LongType, nullable = false),
    StructField("est_intersect", LongType, nullable = false),
    StructField("jaccard_est", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_setops expects two array<bigint> sketches, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val la = left.eval(input)
    val rb = right.eval(input)
    if (la == null || rb == null) return null
    val a = la.asInstanceOf[ArrayData].toLongArray()
    val b = rb.asInstanceOf[ArrayData].toLongArray()
    require(a.length <= k && b.length <= k,
      s"sketch longer than k=$k: built with a different k than probed")
    val setA = new java.util.HashSet[java.lang.Long](a.length * 2)
    a.foreach(setA.add(_))
    val setB = new java.util.HashSet[java.lang.Long](b.length * 2)
    b.foreach(setB.add(_))
    val merged = (a ++ b).distinct.sortBy(KmvSketch.uordKey)
    val estA = KmvSketch.estimateFrom(a, k)
    val estB = KmvSketch.estimateFrom(b, k)
    val exact = a.length < k && b.length < k
    if (exact) {
      // both sketches are the complete hash sets: everything is exact
      val inter = a.count(setB.contains(_)).toLong
      val union = merged.length.toLong
      val j = if (union == 0) 0.0 else inter.toDouble / union.toDouble
      InternalRow(estA, estB, union, inter, j)
    } else {
      val estU = KmvSketch.estimateFrom(merged, k)
      // merged.length >= k here: a saturated side alone contributes k
      val sample = merged.take(k)
      val x = sample.count(h => setA.contains(h) && setB.contains(h))
      val rho = x.toDouble / k.toDouble
      InternalRow(estA, estB, estU, math.round(rho * estU), rho)
    }
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): KmvSetOps =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kmv_setops"
}
