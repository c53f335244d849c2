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

  /** Salted equi-join for a skewed BIG side against a replicable
    * small side — the manual form of AQE's skew-join split, usable
    * when the skew is known ahead of time (a hot user, a head token)
    * or when AQE's per-partition thresholds don't trigger (many
    * medium-hot keys in one partition).
    *
    * The big side is salted with `saltExpr` (any deterministic or
    * random int expression — the RESULT is salt-invariant, only the
    * reducer spread depends on it); the small side is replicated
    * `salts`× via one generator (no driver loop), so every
    * (key, salt) bucket finds its small-side partner and each
    * matching row pair joins EXACTLY once. Join output ≡ the plain
    * equi-join, row for row — which is what q138's oracle checks.
    *
    * Cost model: small side ships salts× its size through the
    * shuffle — that is the price of spreading one hot key over
    * `salts` reducers. Keep `salts` ≈ the per-reducer skew factor,
    * not higher.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltExpr: Column, salts: Int = 8): DataFrame = {
    // coalesce: a NULL saltExpr must still land in SOME bucket — a
    // NULL __salt would match no small-side replica and silently
    // drop the row, breaking the "≡ plain equi-join" contract
    val bigS = big.withColumn("__salt",
      coalesce(pmod(saltExpr.cast("int"), lit(salts)), lit(0)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
