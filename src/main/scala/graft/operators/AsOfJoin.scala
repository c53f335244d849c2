package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row
  * with the same key and right.ts ≤ left.ts (inclusive, "backward").
  *
  * Spark has no built-in as-of join; the naive form (key-equi join +
  * per-left-row max filter) materializes |left|×|right-per-key| rows.
  * This implementation uses the UNION + ORDERED-WINDOW pattern instead:
  * tag both inputs, union them, and run `last(right-payload,
  * ignoreNulls)` over (key ORDER BY ts, side) — each left row picks up
  * the latest preceding right payload in ONE shuffle of |L|+|R| rows,
  * no join product at all. At 100 TB this is the difference between a
  * linear sort-shuffle and a quadratic per-key blowup; skewed keys
  * behave like any other wide window (AQE-salting applies).
  *
  * Tie semantics: right rows sort BEFORE left rows at an equal
  * timestamp, so an exactly-simultaneous right row is visible to the
  * left row (matches DuckDB/pandas ASOF `>=` semantics). Among equal
  * right timestamps the one with the largest `rightOrder` wins.
  */
object AsOfJoin {

  /** @param left       left rows (must contain keyCol + leftTs)
    * @param right      right rows (must contain keyCol + rightTs)
    * @param keyCol     equi-key column name present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightCols  right payload columns to attach (renamed as-is)
    * @param rightOrder extra right tiebreak column (defaults rightTs)
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String],
               rightOrder: Option[String] = None): DataFrame =
    asOf(left, right, keyCol, leftTs, rightTs, rightCols, rightOrder,
      ascending = true)

  /** Forward as-of: the EARLIEST right row with right.ts >= left.ts
    * (same key). Same union+window plan run in reverse time order.
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
              leftTs: String, rightTs: String,
              rightCols: Seq[String],
              rightOrder: Option[String] = None): DataFrame =
    asOf(left, right, keyCol, leftTs, rightTs, rightCols, rightOrder,
      ascending = false)

  /** Nearest join: for every left row, the right row (same key)
    * closest IN EITHER DIRECTION within `toleranceSec`, composed from
    * one backward and one forward pass — still two linear
    * union+window shuffles, never a join product (pandas
    * `merge_asof(direction='nearest')` semantics).
    *
    * Distance is measured in floored epoch seconds (the same
    * definition the external replay uses); an exact distance tie
    * prefers the BACKWARD (earlier) match. Tie among equal right
    * timestamps: backward keeps the largest `rightOrder`, forward the
    * smallest — inherited from the two directional passes and pinned
    * by q114's oracle.
    *
    * @param rightIdCol right row-identity column attached to the
    *                   output (also the equal-timestamp tiebreaker)
    */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String,
              leftTs: String, rightTs: String, rightIdCol: String,
              toleranceSec: Long): DataFrame = {
    val r = right.select(col(keyCol),
      col(rightTs).as("__r_ts"), col(rightIdCol).as("__r_id"))
    val bwd = backward(left, r, keyCol, leftTs, "__r_ts",
      Seq("__r_ts", "__r_id"), rightOrder = Some("__r_id"))
      .withColumnRenamed("__r_ts", "__b_ts")
      .withColumnRenamed("__r_id", "__b_id")
    val both = forward(bwd, r, keyCol, leftTs, "__r_ts",
      Seq("__r_ts", "__r_id"), rightOrder = Some("__r_id"))
      .withColumnRenamed("__r_ts", "__f_ts")
      .withColumnRenamed("__r_id", "__f_id")

    val lEp = col(leftTs).cast("long")
    val bDist = lEp - col("__b_ts").cast("long")
    val fDist = col("__f_ts").cast("long") - lEp
    val bOk = col("__b_id").isNotNull && bDist <= toleranceSec
    val fOk = col("__f_id").isNotNull && fDist <= toleranceSec
    val useB = bOk && (!fOk || bDist <= fDist)
    both
      .withColumn("nearest_id",
        when(useB, col("__b_id")).when(fOk, col("__f_id")))
      .withColumn("dist_sec",
        when(useB, bDist).when(fOk, fDist))
      .withColumn("direction",
        when(useB, lit("b")).when(fOk, lit("f")))
      .drop("__b_ts", "__b_id", "__f_ts", "__f_id")
  }

  /** Shared implementation; ascending = backward (latest preceding
    * right row), descending = forward (earliest following). NULL left
    * timestamps sort before every right row in BOTH directions, so
    * they match nothing instead of grabbing an arbitrary extreme row.
    */
  private def asOf(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   rightCols: Seq[String], rightOrder: Option[String],
                   ascending: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightCols.contains),
      "rightCols must not collide with left columns")
    val tieBreak = rightOrder.getOrElse(rightTs)
    val l = left.select(
      col(keyCol).as("__key"), col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__left"),
      lit(null).cast(payloadType(right, rightCols)).as("__payload"))
    // null-ts right rows can never be "as of" anything — and with
    // nulls-first ordering they would otherwise become visible to
    // every left row
    val r = right.filter(col(rightTs).isNotNull).select(
      col(keyCol).as("__key"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(leftStructType(left)).as("__left"),
      struct(rightCols.map(col): _*).as("__payload"),
      col(tieBreak).as("__tie"))
    val lFull = l.withColumn("__tie",
      lit(null).cast(r.schema("__tie").dataType))
    val unioned = lFull.unionByName(r)

    val order =
      if (ascending)
        Seq(col("__ts").asc_nulls_first, col("__side"), col("__tie"))
      else
        Seq(col("__ts").desc_nulls_first, col("__side"), col("__tie").desc)
    val w = Window.partitionBy("__key").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftOut = leftCols.map(c => col(s"__left.$c").as(c))
    val rightOut = rightCols.map(c => col(s"__asof.$c").as(c))
    matched.select(leftOut ++ rightOut: _*)
  }

  private def payloadType(right: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => right.schema(c)))

  private def leftStructType(left: DataFrame) =
    org.apache.spark.sql.types.StructType(left.schema.fields)
}
