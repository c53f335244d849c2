package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream
import graft.operators.Multimodal

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming windowed counts equal the batch GROUP BY") {
    val streamed = EventsStream.runToTable(spark,
      EventsStream.windowedCounts(EventsStream.readEvents(spark, sfDir)),
      "t_win")
    val batch = graft.core.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    assert(streamed.count() === batch.count())
    assert(streamed.join(batch, Seq("window_start", "event_type"))
      .filter(streamed("n") =!= batch("n")).count() === 0)
  }

  test("session windows split at the 30-minute gap") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val dir = tmpDir("sess")
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 00:10:00"), 7L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 01:00:00"), 7L, "click", 3.0, "{}"), // gap 50m -> new session
      (4L, ts("2024-01-01 00:05:00"), 8L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val events = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val out = EventsStream.runToTable(spark,
      EventsStream.sessionize(events), "t_sess").collect()
    assert(out.length === 3)
    val u7 = out.filter(_.getLong(0) == 7L).sortBy(_.getLong(1))
    assert(u7.map(_.getLong(2)).toSeq === Seq(2L, 1L)) // 2 events then 1
  }

  test("flatMapGroupsWithState anomaly detector flags the planted spike") {
    val ts = (i: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00")
    val rows = (0 until 10).map(i =>
      EventsStream.EventRow(i.toLong, ts(i), 1L, "m",
        if (i == 7) 1000.0 else 10.0))
    val dir = tmpDir("anom")
    rows.toDS().write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(rows.toDS().schema).parquet(dir)
      .as[EventsStream.EventRow]
    val alerts = EventsStream.runToTable(spark,
      EventsStream.detectAnomalies(src, k = 5.0).toDF(), "t_anom",
      org.apache.spark.sql.streaming.OutputMode.Append()).collect()
    assert(alerts.length === 1)
    assert(alerts.head.getAs[Long]("event_id") === 7L)
    assert(alerts.head.getAs[Double]("running_mean") === 10.0)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.withParsedMetadata(
    Multimodal.syntheticMedia(spark, docs))

  test("schema round-trip and feature extraction batch shape") {
    assert(media.schema.fieldNames.toSeq ===
      Multimodal.mediaSchema.fieldNames.toSeq)
    val feats = Multimodal.extractFeatures(
      media.as[Multimodal.MediaRecord]).collect()
    assert(feats.length === 500)
    assert(feats.forall(_.feature.length === 8))
    // deterministic: same bytes -> same features on re-run
    val again = Multimodal.extractFeatures(
      media.as[Multimodal.MediaRecord]).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("PNG/WAV headers: hand-built fixtures parse to exact fields; " +
    "corrupt bytes degrade to None") {
    import graft.operators.MediaHeaders
    val png = MediaHeaders.pngBytes(width = 640, height = 480)
    assert(MediaHeaders.parsePng(png) ===
      Some(MediaHeaders.PngInfo(640, 480)))

    // 2 s of 16 kHz mono 16-bit PCM = 32000 samples
    val wav = MediaHeaders.wavBytes(sampleRate = 16000, nSamples = 32000)
    assert(MediaHeaders.parseWav(wav) ===
      Some(MediaHeaders.WavInfo(1, 16000, 16, 2000L)))
    // stereo 8 kHz: duration respects block align
    val stereo = MediaHeaders.wavBytes(8000, 4000, channels = 2)
    assert(MediaHeaders.parseWav(stereo) ===
      Some(MediaHeaders.WavInfo(2, 8000, 16, 500L)))

    // corruption paths: wrong magic, truncation, cross-parsing
    assert(MediaHeaders.parsePng("not a png at all".getBytes) === None)
    assert(MediaHeaders.parsePng(png.take(10)) === None)
    assert(MediaHeaders.parseWav(png) === None)
    assert(MediaHeaders.parsePng(wav) === None)
    assert(MediaHeaders.parseWav(wav.take(20)) === None)
    assert(MediaHeaders.parsePng(null) === None)
  }

  test("withParsedMetadata fills image/audio metadata from ACTUAL bytes") {
    val rows = media.collect()
    rows.filter(_.getAs[String]("kind") == "image").foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 100 && w < 1100, s"parsed width $w")
      assert(h >= 50 && h < 850, s"parsed height $h")
      assert(r.isNullAt(r.fieldIndex("sample_rate")))
    }
    rows.filter(_.getAs[String]("kind") == "audio").foreach { r =>
      assert(r.getAs[Int]("sample_rate") === 16000)
      assert(r.getAs[Long]("duration_ms") > 0)
      assert(r.isNullAt(r.fieldIndex("width")))
    }
    // video payloads aren't a parseable container: declared values stand
    rows.filter(_.getAs[String]("kind") == "video").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("width")))
      assert(r.getAs[Long]("duration_ms") > 0) // declared, preserved
    }
  }

  test("resize plan preserves aspect ratio within the box") {
    val planned = Multimodal.planResize(
      media.filter($"kind" === "image"), maxSide = 256)
      .select("width", "height", "target_width", "target_height").collect()
    planned.foreach { r =>
      val (w, h, tw, th) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(tw <= 256 + 1 && th <= 256 + 1)
      if (w > 256 || h > 256)
        assert(math.abs(tw.toDouble / th - w.toDouble / h) < 0.1)
    }
  }

  test("frame-sample plan: every 1000ms across the duration") {
    val out = Multimodal.planFrameSample(
      media.filter($"kind" === "video"), everyMs = 1000)
      .select($"duration_ms", size($"sample_times_ms").as("n")).collect()
    out.foreach { r =>
      assert(r.getInt(1) === ((r.getLong(0) - 1) / 1000 + 1).toInt)
    }
  }
}
