package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output-file sizing — the small-files problem. A 1000-executor job
  * that writes a partitioned table naively produces
  * (#partitions × #executors) tiny files, and every downstream scan
  * pays per-file open/list cost; conversely one file per partition
  * key serializes the write. The fix is to PLAN file counts from data
  * volume: estimate per-key output bytes, derive
  * ceil(bytes / targetFileBytes) files per key, and route rows to
  * exactly those files.
  *
  * [[plan]] is pure SQL (one hash aggregate + a |keys|-row window for
  * the cumulative file offsets). [[writeCompacted]] enforces the plan
  * exactly: each row gets a global file id (its key's offset + a hash
  * bucket within the key), and a keyed repartition with an IDENTITY
  * partitioner places one file id per task — the one place the RDD
  * API is genuinely needed, because DataFrame `repartition(n, cols)`
  * hashes keys over tasks and cannot guarantee per-key file counts.
  * The shuffle moves each row once, same as any repartition-write.
  */
object Compaction {

  /** Per-key file plan: (key, n_rows, est_bytes, n_files, file_offset).
    * Byte estimate = Σ (UTF-8 bytes of `textCol` + `rowOverhead`) —
    * a proxy for the uncompressed row payload; refine per format if
    * column stats are available. `file_offset` is the cumulative file
    * count of preceding keys (key order), giving every planned file a
    * stable global index.
    */
  def plan(df: DataFrame, keyCol: String, textCol: String,
           targetFileBytes: Long, rowOverhead: Int = 16): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val agg = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(octet_length(col(textCol)) + lit(rowOverhead)).as("est_bytes"))
      .withColumn("n_files",
        greatest(lit(1L),
          ceil(col("est_bytes").cast("double") /
            targetFileBytes.toDouble).cast("long")))
    // |keys| rows — the single-partition window is deliberate
    val w = Window.orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.withColumn("file_offset", sum("n_files").over(w) - col("n_files"))
  }

  /** Writes `df` under `outPath` partitioned by `keyCol`, with AT MOST
    * the planned number of files per key: rows spread across a key's
    * files by id hash, and every non-empty bucket becomes exactly one
    * file (an empty bucket — possible only when a key has fewer rows
    * than planned files, i.e. rows smaller than targetFileBytes —
    * writes nothing). Hash routing keeps the write path at ONE
    * shuffle; per-key round-robin numbering would guarantee exact
    * counts at any row count but costs a second full exchange.
    * Returns the plan that was enforced.
    */
  def writeCompacted(df: DataFrame, keyCol: String, idCol: String,
                     textCol: String, targetFileBytes: Long,
                     outPath: String): DataFrame = {
    val p = plan(df, keyCol, textCol, targetFileBytes)
    val routed = df.join(
        broadcast(p.select(col(keyCol), col("n_files"), col("file_offset"))),
        keyCol)
      .withColumn("__fid",
        (col("file_offset") + pmod(xxhash64(col(idCol)), col("n_files")))
          .cast("long"))
    val total = p.agg(sum("n_files")).head().getLong(0).toInt
    val schema = routed.schema
    val fidAt = schema.fieldIndex("__fid")
    val placed = routed.rdd
      .map(r => (r.getLong(fidAt), r))
      .partitionBy(new Partitioner {
        override def numPartitions: Int = total
        override def getPartition(key: Any): Int =
          key.asInstanceOf[Long].toInt
      })
      .map(_._2)
    df.sparkSession.createDataFrame(placed, schema)
      .drop("n_files", "file_offset", "__fid")
      .write.mode("overwrite").partitionBy(keyCol).parquet(outPath)
    p
  }
}
