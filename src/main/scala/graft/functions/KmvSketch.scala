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
}
