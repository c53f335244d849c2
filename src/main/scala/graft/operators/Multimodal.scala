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

  /** Deterministic synthetic media table (documents' bytes reused as
    * fake payloads) — the test/bench input in this codec-less env.
    */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 1000 + 100).cast("int"))
        .otherwise(lit(null).cast("int")).as("width"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 800 + 50).cast("int"))
        .otherwise(lit(null).cast("int")).as("height"),
      when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(null).cast("int"))
        .as("sample_rate"),
      when(col("doc_id") % 3 =!= 0, (col("n_chars") * 10).cast("long"))
        .otherwise(lit(null).cast("long")).as("duration_ms"))
}
