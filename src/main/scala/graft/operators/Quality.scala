package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The data-quality gate (/root/reference/quality/checks.py:59-157):
  * empty-check, required columns, per-column null counts, keyed
  * duplicate count, numeric range checks → PASS/FAIL report; FAIL
  * aborts the pipeline.
  *
  * Scale design: the reference runs one eager pass per check. Here ALL
  * null-count and range checks fuse into a SINGLE aggregate job (one
  * scan, map-side partial aggregation, one-row result); the duplicate
  * count is a second aggregate (it needs a groupBy on the key). Two
  * scans total regardless of the number of rules — at 100 TB that is
  * the difference between 2 and 2+2·columns passes.
  */
object Quality {

  /** One range rule: count rows with col outside [lo, hi]. Bounds per
    * quality/checks.py:100-107.
    */
  final case class RangeRule(column: String, lo: Double, hi: Double)

  val weatherRangeRules: Seq[RangeRule] = Seq(
    RangeRule("temperature_c", -90, 60),
    RangeRule("relative_humidity_pct", 0, 100),
    RangeRule("precipitation_mm", 0, 500),
    RangeRule("wind_speed_kmh", 0, 200))

  final case class QualityReport(
      checkRunId: String,
      batchId: String,
      status: String, // PASS | FAIL
      totalRows: Long,
      duplicateRows: Long,
      nullCounts: Map[String, Long],   // ALL checked columns, zeros kept
      rangeCounts: Map[String, Long]) { // ALL rules, zeros kept
    def passed: Boolean = status == "PASS"
    /** Columns actually in violation (the reference's log view,
      * checks.py:152-155; the PERSISTED row keeps the full counts).
      */
    def nullViolations: Map[String, Long] = nullCounts.filter(_._2 > 0)
    def rangeViolations: Map[String, Long] = rangeCounts.filter(_._2 > 0)
  }

  /** Run all checks. `requiredColumns` missing → IllegalArgumentException
    * (the reference raises before any counting, checks.py:74-89).
    */
  def check(df: DataFrame,
            batchId: String,
            requiredColumns: Seq[String],
            keyColumns: Seq[String],
            rangeRules: Seq[RangeRule]): QualityReport = {
    Cleaning.requireColumns(df, requiredColumns)

    val nullAggs = requiredColumns.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null__$c"))
    val rangeAggs = rangeRules.map(r =>
      sum(when(col(r.column) < r.lo || col(r.column) > r.hi, 1L)
        .otherwise(0L)).as(s"range__${r.column}"))
    val aggs = (count(lit(1)).as("total_rows") +: (nullAggs ++ rangeAggs))

    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val totalRows = row.getAs[Long]("total_rows")
    val nulls = requiredColumns
      .map(c => c -> row.getAs[Long](s"null__$c")).toMap
    val ranges = rangeRules
      .map(r => r.column -> row.getAs[Long](s"range__${r.column}")).toMap

    // duplicate EXCESS rows: sum(cnt - 1) over groups with cnt > 1
    // (quality/checks.py:93-98)
    val dupRows =
      if (totalRows == 0) 0L
      else df.groupBy(keyColumns.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .agg(coalesce(sum(col("cnt") - 1), lit(0L)))
        .head().getLong(0)

    val failed = totalRows == 0 || dupRows > 0 ||
      nulls.exists(_._2 > 0) || ranges.exists(_._2 > 0)
    QualityReport(
      checkRunId = java.util.UUID.randomUUID().toString,
      batchId = batchId,
      status = if (failed) "FAIL" else "PASS",
      totalRows = totalRows,
      duplicateRows = dupRows,
      nullCounts = nulls,
      rangeCounts = ranges)
  }

  /** Weather-pipeline gate with the reference's exact rules. */
  def checkWeather(df: DataFrame, batchId: String): QualityReport =
    check(df, batchId, graft.core.Schemas.weatherHourlyColumns,
      Seq("city", "ts_utc"), weatherRangeRules)

  /** Per-group percentile-band filter — the curation policy "trim the
    * tails": keep rows whose `valueCol` sits between ranks `lo` and
    * `hi` (inclusive) of their group's empirical distribution, e.g.
    * drop the shortest and longest 5% of documents per source before
    * training. One windowed pass per group partition — no global sort,
    * no per-group collect; `percent_rank` is (rank-1)/(n-1), pure
    * integer-derived division, so the band predicate is exactly
    * reproducible cross-engine. `tieCol` makes ranks deterministic
    * under duplicate values.
    */
  def quantileBand(df: DataFrame, groupCol: String, valueCol: String,
                   tieCol: String, lo: Double, hi: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(valueCol), col(tieCol))
    df.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= lo && col("pr") <= hi)
      .drop("pr")
  }
}
