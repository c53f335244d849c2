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

  /** Write `df` bucketed as `table` if this session's catalog doesn't
    * have it yet. A fresh in-memory catalog can be missing the table
    * while a PREVIOUS JVM's managed-table directory still sits in the
    * warehouse dir — saveAsTable refuses such orphaned locations, so
    * they are cleared first (the catalog, not the directory, is the
    * source of truth for a managed table).
    */
  def ensureBucketed(spark: SparkSession, table: String, bucketCol: String,
                     buckets: Int, sortCol: Option[String] = None)
                    (df: => DataFrame): Unit = {
    if (spark.catalog.tableExists(table)) return
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    val whPath = if (wh.getScheme == null) wh.getPath
      else java.nio.file.Paths.get(wh).toString
    val stale = java.nio.file.Paths.get(whPath, table.toLowerCase)
    if (java.nio.file.Files.exists(stale)) {
      java.nio.file.Files.walk(stale)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    writeBucketed(df, table, bucketCol, buckets, sortCol)
  }
}
