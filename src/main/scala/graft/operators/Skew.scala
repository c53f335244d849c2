package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers. AQE already splits skewed JOIN partitions at
  * runtime (enabled in GraftSession); what AQE does NOT fix is a
  * skewed high-cardinality AGGREGATE where one group key receives a
  * large share of all rows — that one reducer still bottlenecks.
  * `saltedAgg` is the standard two-phase fix: partial-aggregate on
  * (key, salt) to spread the hot key over `salts` reducers, then
  * final-aggregate the partials on the key.
  *
  * Works for any algebraic aggregate expressible as (partial, merge):
  * count = sum of counts, sum = sum of sums, min/max = min/max of
  * partials, avg = sum/count pair.
  */
object Skew {

  /** Salted sum/count aggregate: returns key columns + sum_<col> and
    * cnt columns. One example shape; the pattern generalizes.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      floor(rand(seed = 42) * salts).cast("int"))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("cnt"))
  }
}
