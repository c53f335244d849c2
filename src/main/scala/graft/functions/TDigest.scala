package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** t-digest quantile sketch (Dunning & Ertl, "Computing extremely
  * accurate quantiles using t-digests", 2019 — merging-digest variant)
  * as a Catalyst `TypedImperativeAggregate`, completing the mergeable
  * sketch family beside KMV (distinct count) and Count-Min (frequency).
  *
  * The digest is a list of (mean, weight) centroids kept sorted by
  * mean; a centroid at quantile position q may hold at most
  * `4·N·q(1-q)/δ` mass (the k1-style size bound), so resolution
  * concentrates at the tails — p99/p999 stay sharp while the sketch
  * stays O(δ) centroids regardless of N.
  *
  * Scale design: the buffer holds O(δ·ln(n/δ)) centroids — the
  * weight-based k1 bound keeps tail points as singletons (exact
  * extreme quantiles) at the cost of a log factor over the asin-scale
  * variant's strict 2δ: measured ≈380 centroids at n=5e3, ≈450 at
  * n=5e4, and ≤ ~1.3k (≈20 KB serialized) even at n=1e12 — so each
  * executor ships a few-KB partial per group across the shuffle
  * regardless of row count, and `merge` (concatenate + recompress) is
  * associative. Unlike CM the RESULT is not bit-identical under
  * re-partitioning — which values share a centroid depends on merge
  * order — but the rank-error bound is partitioning-invariant
  * (spec-asserted at 1 vs 7 partitions), which is the guarantee a
  * quantile sketch actually gives. Exact `percentile` (q39's oracle)
  * is the ground truth the bound is checked against.
  *
  * Emitted layout (self-describing, the lesson from the CM header):
  * `[δ, m, min, max, mean_0, w_0, …, mean_{m-1}, w_{m-1}]` as
  * `array<double>`; `graft_td_quantile` validates δ and m before
  * reading, so a probe against a foreign array fails loudly.
  */
object TDigest {

  /** Header: [compression, centroidCount, min, max]. */
  val HeaderLen = 4

  /** Max centroid weight at cumulative-midpoint quantile q of n total:
    * the k1 size bound. Never below 1 so singletons always fit.
    */
  @inline def sizeLimit(q: Double, n: Double, compression: Int): Double =
    math.max(1.0, 4.0 * n * q * (1.0 - q) / compression)

  /** Mutable buffer: a merged, mean-sorted centroid prefix plus an
    * unsorted tail of raw points; compressed when the tail fills.
    */
  final class Buf(val compression: Int) {
    var means = new Array[Double](0)
    var weights = new Array[Double](0)
    var m = 0 // live centroids in means/weights
    val tailCap = 8 * compression
    val tMeans = new Array[Double](tailCap)
    val tWeights = new Array[Double](tailCap)
    var t = 0
    var min = Double.PositiveInfinity
    var max = Double.NegativeInfinity

    def add(x: Double, w: Double): Unit = {
      if (t == tailCap) compress()
      tMeans(t) = x; tWeights(t) = w; t += 1
      if (x < min) min = x
      if (x > max) max = x
    }

    /** Deterministic merge pass: sort every centroid by mean (stable
      * on the already-sorted prefix), then greedily coalesce
      * neighbours while the k1 bound at the running midpoint allows.
      */
    def compress(): Unit = {
      if (t == 0) return
      val n = m + t
      val ms = new Array[Double](n)
      val ws = new Array[Double](n)
      System.arraycopy(means, 0, ms, 0, m)
      System.arraycopy(tMeans, 0, ms, m, t)
      System.arraycopy(weights, 0, ws, 0, m)
      System.arraycopy(tWeights, 0, ws, m, t)
      // index sort by mean (ties by index → deterministic for a fixed
      // accumulation sequence)
      val idx = Array.range(0, n).sortBy(ms(_))
      val total = ws.sum
      val outM = new Array[Double](n)
      val outW = new Array[Double](n)
      var k = -1
      var cum = 0.0 // weight fully to the left of the open centroid
      idx.foreach { i =>
        val w = ws(i); val x = ms(i)
        if (k >= 0) {
          val proposed = outW(k) + w
          val q = (cum + proposed / 2.0) / total
          if (proposed <= sizeLimit(q, total, compression)) {
            // weighted mean update keeps the centroid the true mean
            outM(k) = outM(k) + (x - outM(k)) * (w / proposed)
            outW(k) = proposed
          } else {
            cum += outW(k); k += 1; outM(k) = x; outW(k) = w
          }
        } else { k = 0; outM(0) = x; outW(0) = w }
      }
      m = k + 1
      means = java.util.Arrays.copyOf(outM, m)
      weights = java.util.Arrays.copyOf(outW, m)
      t = 0
    }

    def totalWeight: Double = {
      var s = 0.0; var i = 0
      while (i < m) { s += weights(i); i += 1 }
      while (i - m < t) { s += tWeights(i - m); i += 1 }
      s
    }
  }

  /** Estimate the q-quantile from an emitted digest array: centroid
    * mass is centered at its cumulative midpoint; linear interpolation
    * between adjacent midpoints, anchored at the true min/max.
    */
  def quantile(arr: ArrayData, q: Double): Double = {
    val m = arr.getDouble(1).toInt
    val min = arr.getDouble(2); val max = arr.getDouble(3)
    if (m == 1) return arr.getDouble(HeaderLen)
    var total = 0.0
    var i = 0
    while (i < m) { total += arr.getDouble(HeaderLen + 2 * i + 1); i += 1 }
    val target = q * total
    var cum = 0.0
    var prevMid = 0.0
    var prevMean = min
    i = 0
    while (i < m) {
      val w = arr.getDouble(HeaderLen + 2 * i + 1)
      val mid = cum + w / 2.0
      val mean = arr.getDouble(HeaderLen + 2 * i)
      if (target < mid) {
        val span = mid - prevMid
        return if (span <= 0) mean
        else prevMean + (mean - prevMean) * (target - prevMid) / span
      }
      cum += w; prevMid = mid; prevMean = mean
      i += 1
    }
    // beyond the last midpoint: interpolate toward the true max
    val span = total - prevMid
    if (span <= 0) max
    else prevMean + (max - prevMean) * (target - prevMid) / span
  }

  def checkDigest(arr: ArrayData, what: String): Unit = {
    val n = arr.numElements()
    if (n < HeaderLen ||
        n != HeaderLen + 2 * arr.getDouble(1).toInt ||
        arr.getDouble(0) < 20)
      throw new IllegalArgumentException(
        s"$what: array of $n elements is not a graft_tdigest digest " +
          "(expected [compression, m, min, max, mean/weight pairs])")
  }
}

/** `graft_tdigest(value, compression)` — grouped aggregate building a
  * t-digest over a DOUBLE column; NULLs skipped. Emits the
  * self-describing array documented on [[TDigest]].
  */
case class TDigestAgg(child: Expression, compression: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest.Buf] with UnaryLike[Expression] {

  require(compression >= 20 && compression <= 1000,
    s"compression $compression out of [20,1000]")

  override def createAggregationBuffer(): TDigest.Buf =
    new TDigest.Buf(compression)

  override def update(buf: TDigest.Buf, input: InternalRow): TDigest.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(a: TDigest.Buf, b: TDigest.Buf): TDigest.Buf = {
    b.compress()
    var i = 0
    while (i < b.m) { a.add(b.means(i), b.weights(i)); i += 1 }
    if (b.min < a.min) a.min = b.min
    if (b.max > a.max) a.max = b.max
    a
  }

  override def eval(buf: TDigest.Buf): Any = {
    buf.compress()
    if (buf.m == 0) return null
    val out = new Array[Double](TDigest.HeaderLen + 2 * buf.m)
    out(0) = compression.toDouble; out(1) = buf.m.toDouble
    out(2) = buf.min; out(3) = buf.max
    var i = 0
    while (i < buf.m) {
      out(TDigest.HeaderLen + 2 * i) = buf.means(i)
      out(TDigest.HeaderLen + 2 * i + 1) = buf.weights(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TDigest.Buf): Array[Byte] = {
    buf.compress()
    val bb = java.nio.ByteBuffer.allocate(8 * (3 + 2 * buf.m))
    bb.putDouble(buf.min).putDouble(buf.max).putDouble(buf.m.toDouble)
    var i = 0
    while (i < buf.m) {
      bb.putDouble(buf.means(i)).putDouble(buf.weights(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigest.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TDigest.Buf(compression)
    buf.min = bb.getDouble(); buf.max = bb.getDouble()
    val m = bb.getDouble().toInt
    buf.means = new Array[Double](m)
    buf.weights = new Array[Double](m)
    buf.m = m
    var i = 0
    while (i < m) {
      buf.means(i) = bb.getDouble(); buf.weights(i) = bb.getDouble(); i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tdigest expects a DOUBLE input, got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(off: Int): TDigestAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TDigestAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): TDigestAgg =
    copy(child = c)
  override def prettyName: String = "graft_tdigest"
}

/** `graft_td_quantile(digest, q)` — point quantile estimate against a
  * materialized digest. Runs once per GROUP (not per input row), so a
  * `CodegenFallback` eval is deliberate: the per-call cost is O(δ) on
  * a handful of rows, never in a whole-stage-codegen hot loop (unlike
  * `graft_cm_estimate`, which probes per candidate row and needed
  * `doGenCode`).
  */
case class TdQuantile(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, false), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, true), DoubleType) =>
        // checkDigest reads header/centroid slots with getDouble, which
        // on a null-bearing UnsafeArrayData returns garbage instead of
        // the intended loud shape error — refuse the type up front.
        // TDigestAgg itself emits containsNull = false, so only a
        // hand-built array can hit this.
        TypeCheckResult.TypeCheckFailure(
          "graft_td_quantile digest array must not allow null elements " +
            "(graft_tdigest emits array<double> with containsNull=false)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_td_quantile expects (array<double> digest, double q), " +
          s"got ${l.simpleString}, ${r.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val d = left.eval(input)
    val q = right.eval(input)
    if (d == null || q == null) null
    else {
      val arr = d.asInstanceOf[ArrayData]
      TDigest.checkDigest(arr, "graft_td_quantile")
      val qd = q.asInstanceOf[Double]
      require(qd >= 0.0 && qd <= 1.0, s"quantile $qd out of [0,1]")
      TDigest.quantile(arr, qd)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_td_quantile"
}
