package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape, feature output — while the actual media decode is a
  * STUB (this container has no image/audio codecs): `decodeStub`
  * produces a deterministic fake feature vector from the bytes. A real
  * deployment swaps `decodeStub` for a JNI/codec call with the SAME
  * signature; nothing else changes.
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

  /** STUB decoder ??? → in production this is the codec/model call.
    * Deterministic fake: 8 floats derived from a rolling hash of the
    * payload — stable across executors/retries, so downstream tests
    * and dedup logic behave exactly as with a real embedding.
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

  /** Batch feature extraction: one decoder "session" per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: init decoder/model ONCE here, reuse across the batch
      it.map(m => MediaFeatures(m.media_id, m.kind,
        decodeStub(m.bytes), m.bytes.length))
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

  /** Parse REAL container headers (MediaHeaders: PNG IHDR, WAV
    * RIFF/fmt/data) into the metadata columns; parsed values override
    * declared ones, declared values survive where the payload isn't a
    * recognized container (e.g. video — no pure-JVM mp4 walker here).
    *
    * Scalar UDFs, deliberately: byte-level header reads aren't
    * expressible in Catalyst builtins, the cost is O(header bytes) per
    * row (not payload-sized), and the binary column still never rides
    * a shuffle.
    */
  def withParsedMetadata(df: DataFrame): DataFrame = {
    val png = udf((b: Array[Byte]) =>
      MediaHeaders.parsePng(b).map(p => (p.width, p.height)))
    val wav = udf((b: Array[Byte]) =>
      MediaHeaders.parseWav(b).map(w =>
        (w.channels, w.sampleRate, w.bitsPerSample, w.durationMs)))
    df.withColumn("__png", png(col("bytes")))
      .withColumn("__wav", wav(col("bytes")))
      .withColumn("width", coalesce(col("__png._1"), col("width")))
      .withColumn("height", coalesce(col("__png._2"), col("height")))
      .withColumn("sample_rate", coalesce(col("__wav._2"), col("sample_rate")))
      .withColumn("duration_ms", coalesce(col("__wav._4"), col("duration_ms")))
      .drop("__png", "__wav")
  }

  /** Deterministic synthetic media table with REAL container bytes:
    * image rows are valid-header PNGs, audio rows valid PCM WAVs (so
    * header parsing reads actual payloads); video rows stay opaque
    * noise with declared metadata. All metadata columns for image and
    * audio are left NULL here — `withParsedMetadata` must fill them
    * from the bytes.
    */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): DataFrame = {
    val gen = udf((id: Long, kind: String, nChars: Int) => kind match {
      case "image" => MediaHeaders.pngBytes(
        nChars % 1000 + 100, nChars % 800 + 50, nChars % 256 + 16, id)
      case "audio" => MediaHeaders.wavBytes(16000, nChars * 16)
      case _ => s"video-payload-$id-$nChars".getBytes("UTF-8")
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
        when(col("kind") === "video", (col("n_chars") * 10).cast("long"))
          .otherwise(lit(null).cast("long")).as("duration_ms"))
  }
}
