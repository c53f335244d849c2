package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: turn a change log into a
  * versioned history table — one row per (key, attribute-state)
  * interval with `valid_from`/`valid_to`/`is_current`. This is the
  * standard warehouse answer to "the reference's metadata table only
  * keeps latest-wins" (`runner/BatchLifecycle` S4): latest-wins tells
  * you where a dimension IS, SCD2 tells you where it was for every
  * point in time, which is what slowly-changing joins (as-of, q35)
  * consume.
  *
  * Shape: two windowed passes over the log, both on the same
  * (key × time) partitioning — Catalyst reuses one sort+shuffle for
  * the pair, so the whole build is a single exchange regardless of
  * history depth. No self-join against the existing dimension: the
  * log IS the source of truth, and rebuilding from it is idempotent
  * (re-running on the same log gives byte-identical history — the
  * Airflow-retry guarantee the reference relies on, extended to
  * versioned dimensions).
  *
  * Consecutive duplicate states are suppressed (a change log often
  * re-asserts the current value); `tieCol` makes same-timestamp
  * changes deterministic.
  */
object Scd2 {

  def fromChangeLog(log: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, stateCol: String): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val changes = log
      .withColumn("prev_state", lag(col(stateCol), 1).over(byTime))
      .filter(col("prev_state").isNull ||
        col("prev_state") =!= col(stateCol))
      .select(col(keyCol), col(stateCol), col(tsCol).as("valid_from"),
        col(tieCol).as("tie"))
    val byFrom = Window.partitionBy(keyCol)
      .orderBy(col("valid_from"), col("tie"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("tie")
  }
}
