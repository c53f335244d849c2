package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The round-6 regression class, pinned: the driver has shipped
  * `events.ts` as INT64 TIMESTAMP(NANOS) (reads as raw longs under
  * the legacy conf) and as TIMESTAMP(MICROS)/NTZ across testdata
  * generations. Both loaders (batch `Tables.events`, streaming
  * `EventsStream.readEvents`) must normalize EVERY encoding to the
  * same session-tz TimestampType with the same instants — this spec
  * materializes all three encodings of the same logical rows and
  * asserts value-identical loads, batch and streaming.
  */
class EventsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // one logical table: three events, seconds apart
  private val micros = Seq(
    (1L, 1700000000000000L, 10L, "view", 1.5, """{"k":1}"""),
    (2L, 1700000001000000L, 11L, "click", 2.5, """{"k":2}"""),
    (3L, 1700000002000000L, 10L, "purchase", 3.5, """{"k":3}"""))

  /** The driver ships each table as a single FILE named
    * `<table>.parquet` (TESTDATA.md); mirror that — the streaming
    * loader's symlink staging depends on it.
    */
  private def writeDir(prefix: String)(write: String => Unit): String = {
    val d = tmpDir(prefix)
    val staging = s"$d/staging"
    write(staging)
    val part = new java.io.File(staging).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  private val asLongNanos = writeDir("enc_nanos") { p =>
    micros.map { case (id, us, u, t, v, pr) => (id, us * 1000L, u, t, v, pr) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(p)
  }

  private val asInstant = writeDir("enc_instant") { p =>
    micros.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(p)
  }

  private val asNtz = writeDir("enc_ntz") { p =>
    micros.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(p)
  }

  private val allDirs =
    Seq("long-nanos" -> asLongNanos, "instant" -> asInstant, "ntz" -> asNtz)

  test("batch loader normalizes every encoding to the same instants") {
    for ((name, d) <- allDirs) {
      val got = Tables.events(spark, d)
      assert(got.schema("ts").dataType.simpleString === "timestamp", name)
      val epochs = got.orderBy("event_id")
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
      assert(epochs === micros.map(_._2), name)
    }
  }

  test("streaming loader agrees with the batch loader on every encoding") {
    for ((name, d) <- allDirs) {
      val stream = graft.streaming.EventsStream.readEvents(spark, d)
        .groupBy("event_type")
        .agg(max(unix_micros(col("ts"))).as("max_us"))
      val got = graft.streaming.EventsStream.runToTable(spark, stream,
          s"enc_${name.replace('-', '_')}_${System.nanoTime()}")
        .orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val exp = Tables.events(spark, d)
        .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
        .orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === exp, name)
    }
  }
}
