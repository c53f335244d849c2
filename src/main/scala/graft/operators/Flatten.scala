package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** P1 — the engine's signature source operator: raw JSON payloads whose
  * `hourly` struct holds five parallel arrays, zipped index-wise into
  * tabular rows (/root/reference/transformation/clean_data.py:59-89).
  *
  * Spark-first design: `from_json` + `explode(arrays_zip(...))` — one
  * declarative Generate over ALL cities at once (no per-city driver
  * loop + concat like the reference), fully inside whole-stage codegen,
  * trivially parallel over input partitions at 100 TB.
  *
  * Reference semantics preserved:
  *  - missing/short arrays → `arrays_zip` null-pads to the longest
  *    array; absent `hourly` → zero rows (explode of null/empty);
  *  - non-200 or null payload rows are filtered out
  *    (clean_data.py:117-118);
  *  - timestamps parse non-strictly (null on malformed, strict=False
  *    at clean_data.py:78);
  *  - constants (city/lat/lon/ingested_at) broadcast onto every row.
  */
object Flatten {

  /** rawResponses-shaped input (see Schemas.rawResponses) → un-cleaned
    * weatherHourly rows (casts applied, no dedup/na.drop yet).
    */
  def flattenResponses(raw: DataFrame, batchId: String): DataFrame =
    flatten(raw, lit(batchId))

  /** Streaming/multi-batch variant: batch_id travels per input row. */
  def flattenResponsesKeepBatch(raw: DataFrame): DataFrame =
    flatten(raw, col("batch_id"))

  private def flatten(raw: DataFrame,
                      batchIdCol: org.apache.spark.sql.Column): DataFrame = {
    raw
      .filter(col("http_status") === 200 && col("payload").isNotNull)
      .withColumn("p", from_json(col("payload"), Schemas.payload))
      .select(
        batchIdCol.as("__batch_id"),
        col("city"), col("latitude"), col("longitude"), col("ingested_at"),
        explode(arrays_zip(
          col("p.hourly.time").as("time"),
          col("p.hourly.temperature_2m").as("temperature_2m"),
          col("p.hourly.relative_humidity_2m").as("relative_humidity_2m"),
          col("p.hourly.precipitation").as("precipitation"),
          col("p.hourly.wind_speed_10m").as("wind_speed_10m"))).as("h"))
      .select(
        col("__batch_id").as("batch_id"),
        col("city"),
        col("latitude").cast("double").as("latitude"),
        col("longitude").cast("double").as("longitude"),
        // non-strict parse: null on malformed (strict=False parity)
        to_timestamp(col("h.time"), "yyyy-MM-dd'T'HH:mm").as("ts_utc"),
        col("h.temperature_2m").cast("double").as("temperature_c"),
        col("h.relative_humidity_2m").cast("int").as("relative_humidity_pct"),
        col("h.precipitation").cast("double").as("precipitation_mm"),
        col("h.wind_speed_10m").cast("double").as("wind_speed_kmh"),
        col("ingested_at").cast("timestamp").as("source_ingested_at"))
  }
}
