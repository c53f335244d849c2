package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.runner.BatchLifecycle
import graft.streaming.IncrementalStaging
import graft.Fixtures._

class BatchLifecycleSpec extends SparkSpec {

  test("open -> RUNNING; close -> SUCCESS with counters; latest-wins read") {
    val path = tmpDir("bl") + "/batches"
    BatchLifecycle.open(spark, path, "b1", "open-meteo",
      java.sql.Date.valueOf("2026-08-01"), java.sql.Date.valueOf("2026-08-07"),
      """[{"city":"Paris"}]""")
    val running = BatchLifecycle.currentState(spark, path).collect()
    assert(running.length === 1)
    assert(running.head.getAs[String]("status") === "RUNNING")

    BatchLifecycle.close(spark, path, "b1",
      httpSuccess = 3, httpFailure = 0, totalBytes = 1234L)
    val closed = BatchLifecycle.currentState(spark, path).collect()
    assert(closed.length === 1) // still one row per batch (latest wins)
    assert(closed.head.getAs[String]("status") === "SUCCESS")
    assert(closed.head.getAs[Int]("http_success_count") === 3)
    assert(closed.head.getAs[Long]("total_payload_bytes") === 1234L)

    // partial failure path
    BatchLifecycle.open(spark, path, "b2", "open-meteo",
      java.sql.Date.valueOf("2026-08-01"), java.sql.Date.valueOf("2026-08-07"), "[]")
    BatchLifecycle.close(spark, path, "b2", 2, 1, 99L)
    val b2 = BatchLifecycle.currentState(spark, path)
      .filter(col("batch_id") === "b2").head()
    assert(b2.getAs[String]("status") === "PARTIAL_FAILURE")
    assert(intercept[IllegalArgumentException] {
      BatchLifecycle.close(spark, path, "nope", 0, 0, 0L)
    }.getMessage.contains("unopened"))
  }
}

class IncrementalStagingSpec extends SparkSpec {

  test("streamed staging processes only new raw files and upserts") {
    val work = tmpDir("inc")
    val rawDir = s"$work/raw"
    val wh = s"$work/warehouse"
    val ckpt = s"$work/ckpt"

    // drop 1: batch b1, 3 cities x 3 hours
    standardBatch(spark).write.mode(SaveMode.Append).parquet(rawDir)
    IncrementalStaging.runOnce(spark, rawDir, wh, ckpt)
    assert(spark.read.parquet(wh).count() === 9)

    // drop 2: batch b2 overlaps (same Paris hours, hotter) + new city
    val update = rawDf(spark, Seq(
      rawRow("Paris", 48.85, 2.35, 200,
        payloadJson(Seq("2026-08-01T00:00"), Seq(30.0), Seq(40L), Seq(0.0), Seq(8.0)),
        batchId = "b2", ingestedAt = "2026-08-04 06:00:00"),
      rawRow("Nice", 43.7, 7.27, 200, happyPayload(), batchId = "b2",
        ingestedAt = "2026-08-04 06:00:00")))
    update.write.mode(SaveMode.Append).parquet(rawDir)
    IncrementalStaging.runOnce(spark, rawDir, wh, ckpt)

    val out = spark.read.parquet(wh)
    assert(out.count() === 12) // 9 + 3 Nice hours; Paris hour updated in place
    val paris0 = out.filter(col("city") === "Paris" &&
      col("ts_utc") === "2026-08-01 00:00:00").collect()
    assert(paris0.length === 1)
    assert(paris0.head.getAs[Double]("temperature_c") === 30.0)
    assert(paris0.head.getAs[String]("batch_id") === "b2")

    // re-run with nothing new: checkpoint makes it a no-op
    IncrementalStaging.runOnce(spark, rawDir, wh, ckpt)
    assert(spark.read.parquet(wh).count() === 12)
  }
}
