package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column null counts, exact distinct counts, and
  * min/max (rendered as strings so one result schema fits every input
  * type) — the "describe the table before you trust it" step of any
  * ingestion pipeline.
  *
  * Scale design: ONE aggregate job regardless of column count — all
  * per-column aggregates fuse into a single pass with map-side
  * partials (multiple exact count-distincts plan as one Expand +
  * aggregate). The wide 1-row result is then unpivoted driver-free
  * with `stack`. At 100 TB this is 1 scan, not 4·columns scans.
  */
object Profiling {

  /** @return one row per profiled column:
    *         (column, n_rows, n_null, n_distinct, min_s, max_s)
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null__$c"),
        count_distinct(col(c)).as(s"dist__$c"),
        min(col(c)).cast("string").as(s"min__$c"),
        max(col(c)).cast("string").as(s"max__$c"))
    } :+ count(lit(1)).as("n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)

    val stackArgs = columns.map { c =>
      s"'$c', `null__$c`, `dist__$c`, `min__$c`, `max__$c`"
    }.mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${columns.size}, $stackArgs) AS " +
          "(column, n_null, n_distinct, min_s, max_s)"))
      .select(col("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
