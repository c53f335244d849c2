package graft.runner

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** S2/S4 — the ingestion-batch lifecycle
  * (/root/reference/sql/raw_schema.sql:7-19;
  * /root/reference/ingestion/fetch_data.py:146-163, 242-263):
  * open a batch (status RUNNING), close it (SUCCESS/PARTIAL_FAILURE +
  * counters).
  *
  * The reference UPDATEs the row in place; an immutable columnar store
  * has no in-place update, so state transitions are APPENDS and the
  * current state is the latest row per batch_id — a window over
  * `state_seq` (S4 emulation, SURVEY §2.1). At scale the metadata
  * table is tiny relative to data; the latest-per-key window is one
  * narrow shuffle.
  */
object BatchLifecycle {

  private val stateSchema = Schemas.ingestionBatches
    .add("state_seq", org.apache.spark.sql.types.IntegerType)

  def open(spark: SparkSession, path: String, batchId: String,
           source: String, requestedStart: java.sql.Date,
           requestedEnd: java.sql.Date, locationsJson: String): Unit = {
    val row = Row(batchId, source, now(), null, requestedStart, requestedEnd,
      locationsJson, "RUNNING", null, null, null, 0)
    append(spark, path, row)
  }

  def close(spark: SparkSession, path: String, batchId: String,
            httpSuccess: Int, httpFailure: Int, totalBytes: Long): Unit = {
    val status = if (httpFailure == 0) "SUCCESS" else "PARTIAL_FAILURE"
    val prev = currentState(spark, path)
      .filter(col("batch_id") === batchId).collect()
    require(prev.nonEmpty, s"close of unopened batch $batchId")
    val p = prev.head
    val row = Row(batchId, p.getAs[String]("source"),
      p.getAs[Timestamp]("started_at"), now(),
      p.getAs[java.sql.Date]("requested_start"),
      p.getAs[java.sql.Date]("requested_end"),
      p.getAs[String]("locations"), status,
      httpSuccess, httpFailure, totalBytes,
      p.getAs[Int]("state_seq") + 1)
    append(spark, path, row)
  }

  /** Latest state per batch_id (the reference's mutable row, read side). */
  def currentState(spark: SparkSession, path: String): DataFrame = {
    val w = Window.partitionBy("batch_id")
      .orderBy(col("state_seq").desc)
    spark.read.schema(stateSchema).parquet(path)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  private def now() = new Timestamp(System.currentTimeMillis())

  private def append(spark: SparkSession, path: String, row: Row): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), stateSchema)
      .write.mode(SaveMode.Append).parquet(path)
}
