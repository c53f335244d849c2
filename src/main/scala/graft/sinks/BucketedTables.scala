package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketing: pre-shuffle a table ONCE at write time so every later
  * equi-join/aggregation on the bucket key runs shuffle-free — the
  * core co-location tool for repeated large-scale joins (e.g. orders ⋈
  * lineitem on orderkey at every pipeline run).
  *
  * Spark bucketing requires the table catalog (`saveAsTable`); both
  * sides bucketed by the same key into the same bucket count join with
  * NO Exchange on either side (asserted in BucketingSpec). At 100 TB
  * this converts the dominant repeated shuffle into a one-time write
  * cost.
  */
object BucketedTables {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Co-located equi-join of two tables bucketed on the join key. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
