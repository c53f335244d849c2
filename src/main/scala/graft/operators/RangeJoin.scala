package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range (interval) join WITHOUT an equi-key: every left row
  * matches right rows whose timestamp falls in
  * [left.ts + lo, left.ts + hi].
  *
  * A pure inequality join in Spark plans as BroadcastNestedLoopJoin —
  * O(|L|·|R|) and a driver-killer at scale. This implementation
  * manufactures an equi-key by BUCKETING time into ⌈(hi−lo)⌉-sized
  * epochs: a right row in bucket b can only match left rows in buckets
  * {b-1, b} (for hi−lo ≤ bucket width), so each left row is duplicated
  * onto the bucket pair and the join becomes a hash equi-join on the
  * bucket id followed by the exact range predicate. Shuffle volume is
  * 2|L|+|R| rows — linear — and Catalyst gets a normal shuffled hash /
  * sort-merge join it can AQE-tune.
  */
object RangeJoin {

  /** @param left     left rows
    * @param right    right rows
    * @param leftTs   left timestamp column
    * @param rightTs  right timestamp column
    * @param loSec    window start offset (seconds, may be negative)
    * @param hiSec    window end offset (seconds, > loSec)
    * @return left rows joined to each matching right row (inner)
    */
  def timeRange(left: DataFrame, right: DataFrame,
                leftTs: String, rightTs: String,
                loSec: Long, hiSec: Long): DataFrame = {
    require(hiSec > loSec, "empty range")
    val widthUs = (hiSec - loSec) * 1000000L

    // exact microsecond arithmetic (second-truncated epochs would need
    // an extra slack bucket); window [l+lo, l+hi] spans ≤ 2 buckets of
    // width (hi-lo), so each left row lands in exactly 2 bucket slots
    val l = left
      .withColumn("__wstart", unix_micros(col(leftTs)) + loSec * 1000000L)
      .withColumn("__bucket",
        explode(array(floor(col("__wstart") / widthUs),
          floor(col("__wstart") / widthUs) + 1)))
    val r = right
      .withColumn("__repoch", unix_micros(col(rightTs)))
      .withColumn("__bucket", floor(col("__repoch") / widthUs))

    l.join(r, Seq("__bucket"))
      .filter(col("__repoch") >= col("__wstart") &&
        col("__repoch") <= col("__wstart") + widthUs)
      .drop("__bucket", "__wstart", "__repoch")
  }
}
