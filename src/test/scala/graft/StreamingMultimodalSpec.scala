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
      EventsStream.detectAnomalies(src, k = 5L).toDF(), "t_anom",
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
    // images alternate PNG (IHDR path) and JPEG (SOF path); both parse
    rows.filter(_.getAs[String]("kind") == "image").foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 8 && w < 64, s"parsed width $w")
      assert(h >= 8 && h < 40, s"parsed height $h")
      assert(r.isNullAt(r.fieldIndex("sample_rate")))
    }
    assert(rows.count(r => r.getAs[String]("kind") == "image" &&
      r.getAs[Long]("media_id") % 2 == 1) > 0, "no JPEG rows in fixture")
    rows.filter(_.getAs[String]("kind") == "audio").foreach { r =>
      assert(r.getAs[Int]("sample_rate") === 16000)
      assert(r.getAs[Long]("duration_ms") > 0)
      assert(r.isNullAt(r.fieldIndex("width")))
    }
    // video rows are real MP4s: dims + duration come from the box walk
    rows.filter(_.getAs[String]("kind") == "video").foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w > 0 && w % 160 == 0, s"mp4 tkhd width $w")
      assert(h > 0 && h % 90 == 0, s"mp4 tkhd height $h")
      assert(r.getAs[Long]("duration_ms") > 0) // parsed from mvhd
      assert(r.isNullAt(r.fieldIndex("sample_rate")))
    }
  }

  test("MP4 box walk: exact mvhd/tkhd fields, corruption paths, " +
    "metadata-feature dispatch") {
    import graft.operators.MediaHeaders
    val mp4 = MediaHeaders.mp4Bytes(width = 640, height = 360,
      durationMs = 5000L)
    assert(MediaHeaders.parseMp4(mp4) ===
      Some(MediaHeaders.Mp4Info("isom", 5000L, 640, 360, 1)))
    // v0 duration round-trips through an arbitrary timescale
    val ts = MediaHeaders.mp4Bytes(320, 240, 1234L, timescale = 90000)
    assert(MediaHeaders.parseMp4(ts).get.durationMs === 1234L)
    // real metadata features, no stub: [w, h, durS, nTracks, aspect...]
    val f = Multimodal.decodeVideoMeta(mp4).get
    assert(f(0) === 640f && f(1) === 360f && f(2) === 5f &&
      f(3) === 1f && math.abs(f(4) - 640f / 360f) < 1e-6)
    assert(Multimodal.decode("video", mp4).sameElements(f))
    // corruption: wrong magic, truncation, cross-parsing, null
    assert(MediaHeaders.parseMp4("not an mp4".getBytes) === None)
    assert(MediaHeaders.parseMp4(mp4.take(30)) === None)
    assert(MediaHeaders.parseMp4(MediaHeaders.pngBytes(10, 10)) === None)
    assert(MediaHeaders.parseMp4(null) === None)
    assert(MediaHeaders.parseWav(mp4) === None)
    val cut = mp4.take(30)
    assert(Multimodal.decode("video", cut)
      .sameElements(Multimodal.decodeStub(cut)))
  }

  test("resize plan preserves aspect ratio within the box") {
    val planned = Multimodal.planResize(
      media.filter($"kind" === "image"), maxSide = 16)
      .select("width", "height", "target_width", "target_height").collect()
    assert(planned.exists(r => r.getInt(0) > 16 || r.getInt(1) > 16),
      "no image exceeds the box — scaling branch untested")
    planned.foreach { r =>
      val (w, h, tw, th) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(tw <= 16 + 1 && th <= 16 + 1)
      // both sides scaled by the SAME factor (ceil'd): that IS aspect
      // preservation under integer quantization
      val scale = math.min(1.0, math.min(16.0 / w, 16.0 / h))
      assert(tw === math.ceil(w * scale).toInt, s"${w}x$h -> ${tw}x$th")
      assert(th === math.ceil(h * scale).toInt, s"${w}x$h -> ${tw}x$th")
    }
  }

  test("JPEG SOF parsing: real codec output, hand-built progressive " +
    "SOF2, and corruption paths") {
    import graft.operators.MediaHeaders
    val jpg = MediaHeaders.imageBytes(37, 21, "jpg", seed = 7)
    assert(MediaHeaders.parseJpeg(jpg) ===
      Some(MediaHeaders.JpegInfo(37, 21, progressive = false)))
    // hand-built minimal progressive frame header (SOF2)
    val sof2 = Array(0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b, 0x08,
      0x01, 0x00, 0x02, 0x80, 0x01, 0x11, 0x00, 0x00)
      .map(_.toByte)
    assert(MediaHeaders.parseJpeg(sof2) ===
      Some(MediaHeaders.JpegInfo(640, 256, progressive = true)))
    // corruption: wrong magic, truncation before SOF, PNG bytes, null
    assert(MediaHeaders.parseJpeg("nope".getBytes) === None)
    assert(MediaHeaders.parseJpeg(jpg.take(6)) === None)
    assert(MediaHeaders.parseJpeg(MediaHeaders.pngBytes(10, 10)) === None)
    assert(MediaHeaders.parseJpeg(null) === None)
    // a marker stream that hits SOS without any SOF yields None
    val noSof = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)
    assert(MediaHeaders.parseJpeg(noSof) === None)
  }

  test("real image decode: exact channel means on a solid PNG, close " +
    "means on a solid JPEG, corrupt payload falls back to the stub") {
    import graft.operators.MediaHeaders
    // solid orange 24x10 PNG: lossless -> exact stats
    val png = MediaHeaders.solidImageBytes(24, 10, 0xcc6633, "png")
    val f = Multimodal.decodeImage(png).get
    assert(f(0) === 24f && f(1) === 10f)
    assert(f(2) === 0xcc.toFloat && f(3) === 0x66.toFloat &&
      f(4) === 0x33.toFloat, s"pixel means off: ${f.toSeq}")
    assert(f(6) < 1e-3, "solid image must have ~zero luma stddev")
    // JPEG is lossy: means within a few units
    val jpg = MediaHeaders.solidImageBytes(24, 10, 0xcc6633, "jpg")
    val fj = Multimodal.decodeImage(jpg).get
    assert(math.abs(fj(2) - 0xcc) < 6 && math.abs(fj(3) - 0x66) < 6 &&
      math.abs(fj(4) - 0x33) < 6, s"jpeg means off: ${fj.toSeq}")
    // corrupt: a valid-header PNG whose payload is noise decodes to
    // None and the dispatch falls back to the deterministic stub
    val corrupt = MediaHeaders.pngBytes(640, 480)
    assert(Multimodal.decodeImage(corrupt) === None)
    assert(Multimodal.decode("image", corrupt)
      .sameElements(Multimodal.decodeStub(corrupt)))
  }

  test("real PCM decode: constant and alternating samples give exact " +
    "rms/zero-crossing stats") {
    import graft.operators.MediaHeaders
    // hand-build 4 samples at amplitude +8192 (=0.25 normalized)
    val base = MediaHeaders.wavBytes(8000, 4)
    val bb = java.nio.ByteBuffer.wrap(base)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(8192, -8192, 8192, -8192).zipWithIndex.foreach { case (s, i) =>
      bb.putShort(44 + 2 * i, s.toShort)
    }
    val f = Multimodal.decodeWavPcm(base).get
    assert(f(0) === 1f && f(1) === 8000f && f(2) === 4f)
    assert(math.abs(f(4) - 0.25f) < 1e-4, s"rms ${f(4)}")
    assert(math.abs(f(5) - 0.25f) < 1e-4, s"maxAbs ${f(5)}")
    assert(math.abs(f(6) - 0.75f) < 1e-4, s"zcr ${f(6)} (3 crossings / 4)")
    // dispatch integrates: audio kind with noisy fixture decodes real
    val noisy = MediaHeaders.wavBytes(16000, 64, noiseSeed = 5)
    val fn = Multimodal.decode("audio", noisy)
    assert(fn(1) === 16000f && fn(2) === 64f && fn(4) > 0f)
    // truncated payload: parseWav fails -> stub fallback
    val cut = noisy.take(30)
    assert(Multimodal.decode("audio", cut)
      .sameElements(Multimodal.decodeStub(cut)))
  }

  test("frame-sample plan: every 1000ms across the duration") {
    val out = Multimodal.planFrameSample(
      media.filter($"kind" === "video"), everyMs = 1000)
      .select($"duration_ms", size($"sample_times_ms").as("n")).collect()
    out.foreach { r =>
      assert(r.getInt(1) === ((r.getLong(0) - 1) / 1000 + 1).toInt)
    }
  }

  test("dHash: identical images distance 0, one-pixel edit stays near, " +
    "different images stay far") {
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gradient(seed: Int, flipX: Int = -1): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val v = (x * 3 + y * 2 + seed * 37) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      if (flipX >= 0) img.setRGB(flipX, 10, 0xffffff)
      img
    }
    val a = Multimodal.dHash(png(gradient(1))).get
    val aCopy = Multimodal.dHash(png(gradient(1))).get
    val aEdit = Multimodal.dHash(png(gradient(1, flipX = 5))).get
    val other = Multimodal.dHash(png(gradient(9))).get
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, aCopy) === 0)
    assert(ham(a, aEdit) <= 6, s"one-pixel edit moved ${ham(a, aEdit)} bits")
    assert(Multimodal.dHash("not an image".getBytes) === None)
  }

  test("imageNearDups: planted identical pairs found at Hamming 0, " +
    "unrelated images not paired") {
    val imgs = media.filter($"kind" === "image")
    val dups = imgs.filter($"media_id" % 5 === 0)
      .withColumn("media_id", $"media_id" + 100000L)
    val planted = imgs.filter($"media_id" % 5 === 0)
      .select($"media_id").collect().map(_.getLong(0)).toSet
    val pairs = Multimodal.imageNearDups(imgs.unionByName(dups),
      maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every planted duplicate is found, at distance 0
    val found = pairs.collect {
      case (a, b, h) if b == a + 100000L => (a, h)
    }.toMap
    assert(planted.forall(id => found.get(id).contains(0)),
      s"missing planted pairs: ${planted -- found.keySet}")
    // no cross-image pair: the generator varies dims/content per id
    pairs.foreach { case (a, b, _) =>
      assert(b == a + 100000L, s"unexpected pair ($a,$b)")
    }
  }

  test("dominant tone: every candidate frequency recovered exactly; " +
    "short clips, ties, and corrupt bytes handled") {
    import graft.operators.{MediaHeaders, Multimodal}
    val cands = (1 to 20).map(_ * 100).toArray
    // every candidate at the q217 minimum clip length (47 chars ≈
    // 752 samples) AND at a comfortable length
    for (f <- cands; n <- Seq(752, 8000)) {
      val wav = MediaHeaders.toneWavBytes(16000, n, f)
      assert(Multimodal.dominantTone(wav, cands).contains(f),
        s"tone $f Hz at $n samples")
    }
    // corrupt payload → None
    assert(Multimodal.dominantTone(Array[Byte](1, 2, 3), cands).isEmpty)
    // all-zero payload: every bin has zero power — argmax tie rule
    // keeps the FIRST (lowest) candidate
    val silent = MediaHeaders.wavBytes(16000, 1000)
    assert(Multimodal.dominantTone(silent, cands).contains(100))
  }
}
