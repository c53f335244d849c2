package graft.runner

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Schemas
import graft.operators.{Cleaning, Flatten, Quality}
import graft.sinks.MergeWriter
import graft.models.StarModels

/** C1–C4 — the linear DAG
  * `ingest >> transform >> quality >> load >> models >> model_tests`
  * (/root/reference/airflow/dags/etl_pipeline_dag.py:80) as a driver
  * program: each stage reads inputs, runs a DataFrame program, writes
  * outputs; failures abort the run (fail-fast quality gate,
  * quality/checks.py:156-157). Retry policy (retries=2,
  * etl_pipeline_dag.py:16-21) is a wrapper around stage execution.
  */
object PipelineRunner {

  final case class RunContext(batchId: String, workDir: String,
                              retryDelayMs: Long = DefaultRetryDelayMs) {
    def rawPath: String = s"$workDir/raw_responses"
    def stagingParquet: String = s"$workDir/weather_hourly_$batchId"
    def warehousePath: String = s"$workDir/staging_weather_hourly"
    def reportPath: String = s"$workDir/quality_reports"
  }

  final case class StageFailure(stage: String, cause: Throwable)
    extends RuntimeException(s"stage $stage failed", cause)

  /** Fixed delay between retry attempts, mirroring the reference DAG's
    * `retry_delay=timedelta(minutes=2)` (etl_pipeline_dag.py:18-20).
    * Tests override via the `sleeper` parameter; production default is
    * the reference's 2 minutes.
    */
  val DefaultRetryDelayMs: Long = 2 * 60 * 1000L

  /** C3: retry wrapper (reference: 2 retries per task, 2-minute delay).
    * Only NonFatal failures retry (an OOM/interrupt must propagate, not
    * re-execute on a possibly-corrupted JVM), each retried attempt is
    * logged so the first failure's diagnostics aren't silently
    * discarded, and a fixed delay separates attempts — immediate
    * re-execution just re-hits whatever transient infrastructure
    * failure caused the first attempt to die.
    */
  def withRetries[T](stage: String, retries: Int = 2,
                     retryDelayMs: Long = DefaultRetryDelayMs,
                     sleeper: Long => Unit = Thread.sleep)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case scala.util.control.NonFatal(e) if attempt < retries =>
          attempt += 1
          System.err.println(
            s"[pipeline] stage $stage attempt $attempt failed, " +
              s"retrying in ${retryDelayMs}ms: $e")
          if (retryDelayMs > 0) sleeper(retryDelayMs)
        case scala.util.control.NonFatal(e) => throw StageFailure(stage, e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Full run from an already-landed raw layer (ingest is file-based in
    * this zero-egress environment — FixtureSource in tests plays the
    * HTTP source's role). Returns the quality report + model row counts.
    */
  def run(spark: SparkSession, ctx: RunContext): Quality.QualityReport = {
    // transform: flatten + clean → staging parquet (S6)
    val staged = withRetries("transform", retryDelayMs = ctx.retryDelayMs) {
      val raw = spark.read.schema(Schemas.rawResponses).parquet(ctx.rawPath)
        .filter(col("batch_id") === ctx.batchId)
      val cleaned = Cleaning.clean(Flatten.flattenResponses(raw, ctx.batchId))
      cleaned.write.mode(SaveMode.Overwrite).parquet(ctx.stagingParquet)
      spark.read.parquet(ctx.stagingParquet)
    }

    // quality gate (C4): FAIL persists the report, then aborts
    val report = withRetries("quality", retryDelayMs = ctx.retryDelayMs) {
      Quality.checkWeather(staged, ctx.batchId)
    }
    persistReport(spark, ctx, report)
    if (!report.passed)
      throw StageFailure("quality", new RuntimeException(
        s"Quality checks failed: $report"))

    // load: keyed upsert into the warehouse table (S8), partitioned by
    // day — the merge then joins/rewrites only partitions the batch
    // touches (partition pruning at 100 TB; SURVEY §7.4-7)
    withRetries("load", retryDelayMs = ctx.retryDelayMs) {
      MergeWriter.merge(spark, ctx.warehousePath,
        staged.withColumn("loaded_at", current_timestamp())
          .withColumn("dt", to_date(col("ts_utc"))),
        keys = Seq("city", "ts_utc"),
        partitionColumns = Seq("dt"))
    }

    // models + schema tests (dbt run / dbt test), with the reference's
    // materialization split (dbt_project.yml:13-21): the STAGING model
    // is a VIEW — a logical, zero-copy relation whose reads always
    // reflect the current warehouse table — while the mart models are
    // TABLES (physical parquet). At 100 TB that distinction is the
    // difference between re-materializing the staging layer every run
    // and only paying for what the marts aggregate.
    withRetries("models", retryDelayMs = ctx.retryDelayMs) {
      val warehouse = refreshStagingView(spark, ctx)
      val dimLoc = StarModels.dimLocation(warehouse)
      val dimDt = StarModels.dimDate(warehouse)
      val fact = StarModels.factWeatherHourly(warehouse)
      dimLoc.write.mode(SaveMode.Overwrite).parquet(s"${ctx.workDir}/dim_location")
      dimDt.write.mode(SaveMode.Overwrite).parquet(s"${ctx.workDir}/dim_date")
      fact.write.mode(SaveMode.Overwrite).parquet(s"${ctx.workDir}/fact_weather_hourly")
      val failures = StarModels.runSchemaTests(dimLoc, dimDt, fact)
      require(failures.isEmpty, s"model tests failed: $failures")
    }
    report
  }

  /** (Re-)issue the staging VIEW — dbt's `materialized: view` for the
    * staging layer (dbt_project.yml:16-18): a zero-copy relation over
    * the warehouse table, recreated by each model run as dbt does
    * (view "materialization" is DDL-only; no data moves). Marts remain
    * `materialized: table` (physical parquet writes below).
    */
  def refreshStagingView(spark: SparkSession, ctx: RunContext): DataFrame = {
    spark.read.parquet(ctx.warehousePath)
      .createOrReplaceTempView("stg_weather_hourly")
    spark.table("stg_weather_hourly")
  }

  /** Deterministic (key-sorted) JSON rendering for the report's JSONB-
    * equivalent columns.
    */
  private def toJson(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", "}")

  /** S9: append the quality report to the report table with full field
    * parity to `staging.quality_check_results`
    * (/root/reference/sql/staging_schema.sql:24-35): parquet_path, the
    * UNFILTERED per-column counts as JSON, and the free-form `details`
    * JSON (checks.py:117-121 persists all counts, zeros included — the
    * filtered view is only for logging).
    */
  private def persistReport(spark: SparkSession, ctx: RunContext,
                            r: Quality.QualityReport): Unit = {
    import spark.implicits._
    val details =
      s"""{"null_counts": ${toJson(r.nullCounts)}, """ +
        s""""duplicate_rows": ${r.duplicateRows}, """ +
        s""""range_violations": ${toJson(r.rangeCounts)}}"""
    Seq((r.checkRunId, r.batchId, ctx.stagingParquet, r.status, r.totalRows,
        r.duplicateRows, toJson(r.nullCounts), toJson(r.rangeCounts), details))
      .toDF("check_run_id", "batch_id", "parquet_path", "status", "total_rows",
        "duplicate_rows", "null_violations", "range_violations", "details")
      .withColumn("checked_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(ctx.reportPath)
  }
}
