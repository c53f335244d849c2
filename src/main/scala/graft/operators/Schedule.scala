package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schedule-cadence reconciliation — the one orchestration contract the
  * reference delegates to Airflow that is still expressible as a pure
  * data operator: expand the cadence into its logical ticks and
  * reconcile them against the run log.
  *
  * Reference semantics (`airflow/dags/etl_pipeline_dag.py:16-31`): the
  * DAG runs `@daily` with `catchup=False` — when the scheduler comes
  * back after downtime it does NOT backfill every missed logical date;
  * only the MOST RECENT missed tick is scheduled, older gaps are
  * permanently skipped. `PipelineRunner` already reproduces the task
  * chain and retries; this closes the cadence/catchup gap flagged in
  * round 5 ("What's missing" §2).
  *
  * Scale: the tick domain is days — thousands of rows for a decade —
  * expanded with `sequence()` from a 1-row bounds aggregate, never
  * collected. The run log joins on the day key (broadcast-sized in any
  * realistic deployment: one row per day per pipeline), and the single
  * "latest missed tick" decision is a 1-row aggregate broadcast back,
  * so the whole reconciliation is two broadcast joins over a
  * calendar-sized frame regardless of how much DATA each run touched.
  */
object Schedule {

  /** Daily logical ticks covering [start, end] inclusive — one row,
    * column `day: date`, per calendar day, generated distributed-side
    * from a 1×2 bounds frame (`sequence` steps 1 day for date args).
    */
  def dailyTicks(bounds: DataFrame, start: Column, end: Column): DataFrame =
    bounds.select(explode(sequence(start, end)).as("day"))

  /** Reconcile daily ticks against a run log with `catchup=False`
    * semantics. `runLog` must have a `day: date` column (one row per
    * completed run). Output: one row per tick with
    *   status = 'ran'                (a run completed for that day)
    *          | 'pending'            (the single latest missed tick —
    *                                  what the scheduler would run next)
    *          | 'skipped_no_catchup' (older missed ticks, never run).
    */
  def reconcileCatchupFalse(ticks: DataFrame, runLog: DataFrame): DataFrame = {
    val ran = runLog.select(col("day"), lit(1).as("__ran")).distinct()
    val j = ticks.join(broadcast(ran), Seq("day"), "left")
    // 1-row "latest missed" decision, broadcast back — the catchup=False
    // rule is global over the calendar, not per-partition.
    val latestMissed = j.filter(col("__ran").isNull)
      .agg(max(col("day")).as("__pending_day"))
    j.crossJoin(broadcast(latestMissed))
      .select(col("day"),
        when(col("__ran").isNotNull, lit("ran"))
          .when(col("day") === col("__pending_day"), lit("pending"))
          .otherwise(lit("skipped_no_catchup")).as("status"))
  }
}
