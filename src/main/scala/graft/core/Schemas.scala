package graft.core

import org.apache.spark.sql.types._

/** Explicit StructTypes for every pipeline layer — never schema
  * inference in production paths (SURVEY §1.4: the reference declares
  * DDL statically and validates column sets defensively;
  * /root/reference/sql/raw_schema.sql, staging_schema.sql).
  */
object Schemas {

  /** Open-Meteo payload: a struct whose `hourly` field holds five
    * index-aligned parallel arrays
    * (/root/reference/transformation/clean_data.py:59-72).
    */
  val payload: StructType = StructType(Seq(
    StructField("hourly", StructType(Seq(
      StructField("time", ArrayType(StringType)),
      StructField("temperature_2m", ArrayType(DoubleType)),
      StructField("relative_humidity_2m", ArrayType(LongType)),
      StructField("precipitation", ArrayType(DoubleType)),
      StructField("wind_speed_10m", ArrayType(DoubleType)))))))

  /** raw.ingestion_batches (/root/reference/sql/raw_schema.sql:7-19). */
  val ingestionBatches: StructType = StructType(Seq(
    StructField("batch_id", StringType, nullable = false),
    StructField("source", StringType),
    StructField("started_at", TimestampType),
    StructField("finished_at", TimestampType),
    StructField("requested_start", DateType),
    StructField("requested_end", DateType),
    StructField("locations", StringType), // JSON
    StructField("status", StringType),
    StructField("http_success_count", IntegerType),
    StructField("http_failure_count", IntegerType),
    StructField("total_payload_bytes", LongType)))

  /** raw.open_meteo_responses (/root/reference/sql/raw_schema.sql:23-36). */
  val rawResponses: StructType = StructType(Seq(
    StructField("ingestion_id", StringType, nullable = false),
    StructField("batch_id", StringType, nullable = false),
    StructField("ingested_at", TimestampType),
    StructField("source", StringType),
    StructField("city", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("requested_start", DateType),
    StructField("requested_end", DateType),
    StructField("http_status", IntegerType),
    StructField("payload", StringType), // raw JSON, nullable on failure
    StructField("payload_bytes", IntegerType)))

  /** staging.weather_hourly minus loaded_at — the parquet hand-off
    * schema (/root/reference/transformation/clean_data.py:137-148;
    * sql/staging_schema.sql:7-20). Logical PK (city, ts_utc).
    */
  val weatherHourly: StructType = StructType(Seq(
    StructField("batch_id", StringType),
    StructField("city", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("ts_utc", TimestampType),
    StructField("temperature_c", DoubleType),
    StructField("relative_humidity_pct", IntegerType),
    StructField("precipitation_mm", DoubleType),
    StructField("wind_speed_kmh", DoubleType),
    StructField("source_ingested_at", TimestampType)))

  /** Columns required by quality + load
    * (/root/reference/quality/checks.py:74-89).
    */
  val weatherHourlyColumns: Seq[String] = weatherHourly.fieldNames.toSeq
}
