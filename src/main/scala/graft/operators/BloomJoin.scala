package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Semi-join reduction via a sketch membership filter: before a
  * large⋈small join SHUFFLES the large side, drop large-side rows
  * whose key cannot exist on the small side.
  *
  * The filter is the Count-Min sketch already in the engine
  * (`graft_count_min`): a CM sketch with point estimate 0 is a
  * counting Bloom filter — `estimate(k) > 0` has NO false negatives
  * (CM error is one-sided: estimates never under-count), so no
  * matching row is ever dropped; false positives simply survive to the
  * real join, which discards them. Correctness is therefore
  * unconditional (oracle-checked in q63); the sketch parameters only
  * tune how much shuffle is saved.
  *
  * Scale shape: the sketch is built DISTRIBUTED (one fixed d×w buffer
  * per partition, merged by the aggregate — never a driver-side key
  * collect), attached to the big side as a 1-row BROADCAST, and probed
  * inside whole-stage codegen (`graft_cm_estimate.doGenCode`) BEFORE
  * the join's exchange. At 100 TB with a selective small side this
  * converts a full fact-table shuffle into a shuffle of only the keys
  * that can match — the same play as Spark's AQE runtime bloom filter
  * (InjectRuntimeFilter), expressed as an explicit operator the user
  * controls.
  */
object BloomJoin {

  /** Filter `df` to rows whose `probeCol` is (probably) present among
    * `small`'s `smallKey` values. No false negatives; false-positive
    * rate shrinks with `width` (≈ (1−e^(−m/w))^d for m distinct keys).
    */
  def pruneByMembership(df: DataFrame, probeCol: String,
                        small: DataFrame, smallKey: String,
                        depth: Int = 4, width: Int = 1 << 16): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    val sketch = small.agg(call_function("graft_count_min",
      xxhash64(col(smallKey)), lit(depth), lit(width)).as("__bloom_sk"))
    df.crossJoin(broadcast(sketch))
      .where(call_function("graft_cm_estimate", col("__bloom_sk"),
        xxhash64(col(probeCol)), lit(depth), lit(width)) > 0)
      .drop("__bloom_sk")
  }

  /** Inner join `big ⋈ small ON bigKey = smallKey` with the big side
    * membership-pruned first. Result is IDENTICAL to the plain join;
    * only the shuffle volume changes.
    */
  def prunedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 depth: Int = 4, width: Int = 1 << 16): DataFrame = {
    val pruned = pruneByMembership(big, bigKey, small, smallKey, depth, width)
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }
}
