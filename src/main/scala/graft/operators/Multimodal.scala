package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * Decode is REAL where the JVM has a codec: images (PNG/JPEG/GIF/BMP)
  * go through `javax.imageio` to actual pixels, audio through a
  * direct 16-bit PCM WAV read, and video through an MP4 ISO-BMFF box
  * walk (ftyp/moov/mvhd/tkhd → duration + track dims; no frame
  * pixels — the JRE has no video codec and frame decode belongs on
  * GPU workers). All zero new dependencies. `decodeStub` remains only
  * as the corruption fallback, so a rotten payload degrades to a
  * deterministic fake vector instead of killing the stage. A real
  * deployment swaps the per-kind decoders for JNI/model calls with the
  * SAME signature; nothing else changes.
  *
  * Scale design: `mapPartitions` amortizes per-batch decoder init (the
  * expensive part with real codecs — model load, GPU context) across
  * the partition; binary payloads never pass through a shuffle (feature
  * extraction happens before any wide transform); metadata-only ops
  * (resize planning, frame sampling) are pure column arithmetic.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),         // image | audio | video
    StructField("bytes", BinaryType),
    StructField("width", IntegerType),       // image/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio
    StructField("duration_ms", LongType)))   // audio/video

  final case class MediaRecord(media_id: Long, kind: String,
                               bytes: Array[Byte], width: Option[Int],
                               height: Option[Int], sample_rate: Option[Int],
                               duration_ms: Option[Long])
  final case class MediaFeatures(media_id: Long, kind: String,
                                 feature: Array[Float], n_bytes: Int)

  /** STUB decoder ??? → the fallback for kinds with no JVM codec
    * (video) and for corrupt payloads. Deterministic fake: 8 floats
    * derived from a rolling hash of the payload — stable across
    * executors/retries, so downstream tests and dedup logic behave
    * exactly as with a real embedding.
    */
  def decodeStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % dim) += (h % 1000) / 1000.0f
      i += 1
    }
    out.map(v => v / math.max(1, bytes.length / dim))
  }

  // ImageIO's default scratch-file cache would put a disk write in
  // every executor decode call; decode in memory instead.
  javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP — the
    * codecs every JRE ships). Features = pixel statistics:
    * `[w, h, meanR, meanG, meanB, meanLuma, stdLuma, aspect]`.
    * None on any unreadable/corrupt payload.
    */
  def decodeImage(bytes: Array[Byte]): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var sl = 0.0; var sl2 = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
            val b = p & 0xff
            val luma = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += luma; sl2 += luma * luma
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        val meanL = sl / n
        Some(Array(w.toFloat, h.toFloat, (sr / n).toFloat, (sg / n).toFloat,
          (sb / n).toFloat, meanL.toFloat,
          math.sqrt(math.max(0.0, sl2 / n - meanL * meanL)).toFloat,
          (w.toDouble / h).toFloat))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode: 16-bit PCM WAV samples read directly (the fmt
    * chunk is already parsed by MediaHeaders; PCM is bytes). Features =
    * `[channels, sampleRate, nFrames, meanAmp, rms, maxAbs, zcr,
    * durationSec]` with amplitudes normalized to [-1, 1]. None for
    * non-PCM/non-16-bit or corrupt payloads.
    */
  def decodeWavPcm(bytes: Array[Byte]): Option[Array[Float]] =
    MediaHeaders.parseWav(bytes).flatMap { info =>
      if (info.bitsPerSample != 16 || info.channels <= 0) None
      else findWavData(bytes).map { case (off, len) =>
        val nSamples = len / 2
        var sum = 0.0; var sum2 = 0.0; var maxAbs = 0.0
        var zc = 0; var prevSign = 0
        var i = 0
        while (i < nSamples) {
          val lo = bytes(off + 2 * i) & 0xff
          val hi = bytes(off + 2 * i + 1).toInt
          val s = ((hi << 8) | lo) / 32768.0
          sum += s; sum2 += s * s
          val a = math.abs(s); if (a > maxAbs) maxAbs = a
          val sign = java.lang.Double.compare(s, 0.0)
          if (sign != 0) {
            if (prevSign != 0 && sign != prevSign) zc += 1
            prevSign = sign
          }
          i += 1
        }
        val n = math.max(1, nSamples).toDouble
        val frames = nSamples / info.channels
        Array(info.channels.toFloat, info.sampleRate.toFloat,
          frames.toFloat, (sum / n).toFloat,
          math.sqrt(sum2 / n).toFloat, maxAbs.toFloat,
          (zc / n).toFloat,
          (frames.toDouble / info.sampleRate).toFloat)
      }
    }

  /** Dominant-tone detection over a 16-bit mono PCM WAV: Goertzel
    * power at each candidate frequency, argmax (ties → lower
    * frequency). The ONLY float sensitivity is the argmax, and a pure
    * sine's true bin carries orders of magnitude more power than any
    * leakage bin at ≥ hundreds of samples — deterministic in
    * practice and spec-pinned. None for corrupt/non-PCM input (the
    * decodeStub contract).
    */
  def dominantTone(bytes: Array[Byte],
                   candidatesHz: Array[Int]): Option[Int] =
    MediaHeaders.parseWav(bytes).flatMap { info =>
      if (info.bitsPerSample != 16 || info.channels != 1) None
      else findWavData(bytes).flatMap { case (off, len) =>
        val n = len / 2
        if (n < 16 || candidatesHz.isEmpty) None
        else {
          var best = 0
          var bestPower = -1.0
          var c = 0
          while (c < candidatesHz.length) {
            val f = candidatesHz(c)
            val coeff =
              2.0 * math.cos(2.0 * math.Pi * f / info.sampleRate)
            var s1 = 0.0
            var s2 = 0.0
            var i = 0
            while (i < n) {
              val lo = bytes(off + 2 * i) & 0xff
              val hi = bytes(off + 2 * i + 1).toInt
              val x = ((hi << 8) | lo).toDouble
              val s0 = x + coeff * s1 - s2
              s2 = s1
              s1 = s0
              i += 1
            }
            val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
            if (p > bestPower) { bestPower = p; best = f }
            c += 1
          }
          Some(best)
        }
      }
    }

  /** Pure-tone audio corpus: one sine WAV per audio-kind doc, tone =
    * (n_chars % 20 + 1)·100 Hz — every clip's frequency has a closed
    * integer form in the source table, so detection is oracle-exact.
    */
  def toneMedia(spark: SparkSession, documents: DataFrame): DataFrame = {
    val gen = udf((id: Long, nChars: Int) =>
      MediaHeaders.toneWavBytes(16000, nChars * 16,
        (nChars % 20 + 1) * 100))
    documents.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id").as("media_id"),
        gen(col("doc_id"), col("n_chars").cast("int")).as("bytes"))
  }

  /** Locate the PCM payload: (offset, usable length) of the "data"
    * chunk, clamped to the buffer.
    */
  private def findWavData(bytes: Array[Byte]): Option[(Int, Int)] = {
    def le32(off: Int): Long =
      ((bytes(off + 3) & 0xffL) << 24) | ((bytes(off + 2) & 0xffL) << 16) |
        ((bytes(off + 1) & 0xffL) << 8) | (bytes(off) & 0xffL)
    if (bytes.length < 44) return None
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = le32(off + 4)
      if (id == "data") {
        val avail = math.min(size, (bytes.length - off - 8).toLong).toInt
        return if (avail >= 2) Some((off + 8, avail)) else None
      }
      val step = 8L + size + (size & 1L)
      if (step <= 0 || off + step > bytes.length) return None
      off += step.toInt
    }
    None
  }

  /** REAL video metadata decode: MP4 box walk (MediaHeaders.parseMp4)
    * → `[width, height, durationSec, nTracks, aspect, bytesPerSec,
    * nBytes, 0]`. No frame pixels — the JRE has no video codec, and
    * at 100 TB frame decode belongs on GPU workers anyway — but every
    * emitted feature comes from actual container bytes. None for
    * non-MP4/corrupt payloads (→ stub fallback).
    */
  def decodeVideoMeta(bytes: Array[Byte]): Option[Array[Float]] =
    MediaHeaders.parseMp4(bytes).map { m =>
      val durS = m.durationMs / 1000.0
      Array(m.width.toFloat, m.height.toFloat, durS.toFloat,
        m.nTracks.toFloat,
        if (m.height > 0) m.width.toFloat / m.height else 0f,
        if (durS > 0) (bytes.length / durS).toFloat else 0f,
        bytes.length.toFloat, 0f)
    }

  /** Per-kind dispatch: real codec where the JVM has one, real
    * container-metadata walk for video, stub fallback only for
    * corrupt/unknown payloads — ONE signature for every kind, so
    * swapping in a JNI/model decoder is a local change.
    */
  def decode(kind: String, bytes: Array[Byte]): Array[Float] = kind match {
    case "image" => decodeImage(bytes).getOrElse(decodeStub(bytes))
    case "audio" => decodeWavPcm(bytes).getOrElse(decodeStub(bytes))
    case "video" => decodeVideoMeta(bytes).getOrElse(decodeStub(bytes))
    case _ => decodeStub(bytes) // unknown kind: corruption fallback
  }

  /** Perceptual difference-hash (dHash) of a decoded image: the luma
    * plane is block-averaged onto a 9×8 grid and bit (r,c) of the
    * 64-bit hash is set iff grid(r)(c) < grid(r)(c+1). Small pixel
    * edits move block averages barely, so near-identical images land
    * within a few bits of Hamming distance — the standard perceptual
    * near-dup key (the image-side sibling of the text SimHash, and it
    * rides the SAME 64-bit pigeonhole machinery at scale).
    * None for unreadable payloads.
    */
  def dHash(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val grid = Array.ofDim[Double](8, 9)
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 9) {
            val y0 = r * h / 8; val y1 = math.max(y0 + 1, (r + 1) * h / 8)
            val x0 = c * w / 9; val x1 = math.max(x0 + 1, (c + 1) * w / 9)
            var s = 0.0; var n = 0
            var y = y0
            while (y < y1 && y < h) {
              var x = x0
              while (x < x1 && x < w) {
                val p = img.getRGB(x, y)
                s += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
                  0.114 * (p & 0xff)
                n += 1; x += 1
              }
              y += 1
            }
            grid(r)(c) = if (n == 0) 0.0 else s / n
            c += 1
          }
          r += 1
        }
        var bits = 0L
        var k = 0
        while (k < 64) {
          val rr = k / 8; val cc = k % 8
          if (grid(rr)(cc) < grid(rr)(cc + 1)) bits |= (1L << k)
          k += 1
        }
        Some(bits)
      }
    } catch { case _: Exception => None }

  /** Perceptual image near-dup pairs at Hamming ≤ maxHamming over the
    * dHash: pigeonhole chunk join (d+1 chunks of 64/(d+1) bits — two
    * hashes within distance d MUST agree on ≥1 whole chunk), ids-only
    * candidates, exact `bit_count(xor)` verify. Identical plan shape
    * to the text SimHash path — never all-pairs.
    */
  def imageNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming $maxHamming: pigeonhole chunks must be ≥ 8 bits")
    val hashUdf = udf((b: Array[Byte]) => dHash(b))
    val hashed = media.filter(col("kind") === "image")
      .select(col("media_id").as("id"), hashUdf(col("bytes")).as("h"))
      .filter(col("h").isNotNull)
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val mask = (1L << width) - 1
    val chunked = hashed.select(col("id"), col("h"),
      explode(array((0 until chunks).map(c => struct(lit(c).as("c"),
        (shiftrightunsigned(col("h"), c * width) bitwiseAND lit(mask))
          .as("v"))): _*)).as("ck"))
      .select(col("id"), col("h"), col("ck.c").as("c"), col("ck.v").as("v"))
    chunked.alias("a").join(chunked.alias("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.h").as("h_a"), col("b.h").as("h_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Batch feature extraction: one decoder "session" per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: init decoder/model ONCE here, reuse across the batch
      it.map(m => MediaFeatures(m.media_id, m.kind,
        decode(m.kind, m.bytes), m.bytes.length))
    }
  }

  /** Metadata-only resize planning: target box fit preserving aspect
    * ratio — pure column arithmetic, no decode.
    */
  def planResize(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide) / greatest(col("width"), lit(1)),
      lit(maxSide) / greatest(col("height"), lit(1)), lit(1.0))
    df.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame-sample plan for video: every `everyMs` milliseconds. */
  def planFrameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("sample_times_ms",
      when(col("duration_ms").isNotNull && col("duration_ms") > 0,
        sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
        .otherwise(array()))

  /** Parse REAL container headers (MediaHeaders: PNG IHDR, JPEG SOF,
    * WAV RIFF/fmt/data, MP4 ftyp/moov box walk) into the metadata
    * columns; parsed values override declared ones, declared values
    * survive where the payload isn't a recognized container.
    *
    * Scalar UDFs, deliberately: byte-level header reads aren't
    * expressible in Catalyst builtins, the cost is O(header bytes) per
    * row (not payload-sized), and the binary column still never rides
    * a shuffle.
    */
  def withParsedMetadata(df: DataFrame): DataFrame = {
    val img = udf((b: Array[Byte]) =>
      MediaHeaders.parsePng(b).map(p => (p.width, p.height))
        .orElse(MediaHeaders.parseJpeg(b).map(j => (j.width, j.height))))
    val wav = udf((b: Array[Byte]) =>
      MediaHeaders.parseWav(b).map(w =>
        (w.channels, w.sampleRate, w.bitsPerSample, w.durationMs)))
    val mp4 = udf((b: Array[Byte]) =>
      MediaHeaders.parseMp4(b).map(m =>
        (m.width, m.height, m.durationMs)))
    df.withColumn("__img", img(col("bytes")))
      .withColumn("__wav", wav(col("bytes")))
      .withColumn("__mp4", mp4(col("bytes")))
      .withColumn("width",
        coalesce(col("__img._1"),
          when(col("__mp4._1") > 0, col("__mp4._1")), col("width")))
      .withColumn("height",
        coalesce(col("__img._2"),
          when(col("__mp4._2") > 0, col("__mp4._2")), col("height")))
      .withColumn("sample_rate", coalesce(col("__wav._2"), col("sample_rate")))
      .withColumn("duration_ms", coalesce(col("__wav._4"),
        col("__mp4._3"), col("duration_ms")))
      .drop("__img", "__wav", "__mp4")
  }

  /** Deterministic synthetic media table with REAL media bytes: image
    * rows are fully-decodable encoded images — PNG and JPEG
    * alternating, via the JVM's own codec — audio rows valid 16-bit
    * PCM WAVs with non-trivial samples; video rows stay opaque noise
    * with declared metadata (no JVM video codec). Images are kept
    * small (≤ 64×40) so generating N rows costs milliseconds, not a
    * re-encode of a photo corpus. All metadata columns for image and
    * audio are left NULL here — `withParsedMetadata` must fill them
    * from the bytes.
    */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): DataFrame = {
    val gen = udf((id: Long, kind: String, nChars: Int) => kind match {
      case "image" => MediaHeaders.imageBytes(
        nChars % 56 + 8, nChars % 32 + 8,
        if (id % 2 == 0) "png" else "jpg", id)
      case "audio" => MediaHeaders.wavBytes(16000, nChars * 16,
        noiseSeed = id + 1)
      case _ => MediaHeaders.mp4Bytes(
        width = (nChars % 8 + 1) * 160, height = (nChars % 8 + 1) * 90,
        durationMs = nChars.toLong * 10, payloadLen = nChars,
        noiseSeed = id + 1)
    })
    documents.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("n_chars").cast("int").as("n_chars"))
      .select(
        col("media_id"), col("kind"),
        gen(col("media_id"), col("kind"), col("n_chars")).as("bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms"))
  }
}
