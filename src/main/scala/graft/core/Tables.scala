package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables
  * (`/root/testdata/sf*` — see TESTDATA.md / FIXTURES.md §B).
  *
  * All loads are plain parquet scans: schema comes from the parquet
  * footer (stable across scale factors), filters/projections push down
  * via the normal Catalyst datasource-v2 path. Keep these as the single
  * entry point so scan-level tuning (e.g. nanosecond-timestamp handling)
  * lives in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical parquet encodings across
    * testdata generations: INT64 TIMESTAMP(NANOS) (rejected by Spark's
    * vectorized reader → read as raw long nanoseconds via the legacy
    * conf and convert) and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (reads as TIMESTAMP_NTZ). Branch on the
    * footer schema so both arrive as the same session-tz (UTC)
    * TimestampType — sub-microsecond precision is not semantically
    * observable in any query (events are seconds apart; `event_id` is
    * the tiebreaker).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    // NB: session-sticky conf — later reads of OTHER nanos-timestamp
    // parquet in this session also get raw longs. All engine inputs go
    // through Tables.*, so the blast radius is this loader.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: float division at epoch-nanos
        // magnitude (~1.7e18, double ulp = 256 ns) rounds before the
        // cast and can be 1 µs off the true floor(ns/1000)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ → instant is wall-clock-preserving under the pinned UTC
        // session tz (Verify/Bench/specs all set it)
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
