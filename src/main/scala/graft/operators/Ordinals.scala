package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dense global ordinals (0..n−1 in key order) WITHOUT a single-
  * partition global sort — the scalable version of `zipWithIndex` for
  * assigning stable corpus positions (sequence packing order, shard
  * manifests, deterministic shuffles).
  *
  * A naive `row_number() OVER (ORDER BY key)` collapses the corpus
  * into ONE task. Instead:
  *
  *   1. range-repartition by the key (parallel, sampled boundaries),
  *   2. sort within partitions (parallel),
  *   3. count rows per partition — a tiny aggregate whose result is
  *      #partitions rows collected to the driver (bounded by cluster
  *      size, not data size),
  *   4. broadcast the per-partition cumulative offsets back and add
  *      them to the within-partition `row_number`.
  *
  * The output is deterministic for a unique key regardless of sampled
  * partition boundaries: the range partitioner preserves global key
  * order across partition ids, so offset + local rank reproduces the
  * global rank exactly.
  */
object Ordinals {

  def globalOrdinals(df: DataFrame, keyCol: String,
                     numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(keyCol)
      .withColumn("__pid", spark_partition_id())
    // Bounded driver collect: one row per partition.
    val sizes = ranged.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // Exclusive prefix sums over pid-sorted sizes; empty partitions
    // are absent from the aggregate and contribute 0, so skipping
    // them keeps the offsets correct.
    val cum = sizes.map(_._2).scanLeft(0L)(_ + _).init
    val offsetsDf = df.sparkSession.createDataFrame(
      sizes.map(_._1).zip(cum).toSeq
    ).toDF("__pid", "__offset")
    val w = Window.partitionBy("__pid").orderBy(keyCol)
    ranged.join(broadcast(offsetsDf), "__pid")
      .withColumn("ordinal",
        col("__offset") + row_number().over(w).cast("long") - 1L)
      .drop("__pid", "__offset")
  }
}
