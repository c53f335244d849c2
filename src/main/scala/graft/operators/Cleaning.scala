package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** P3–P7, A7, O1 — the transform stage's cleaning steps
  * (/root/reference/transformation/clean_data.py:132-151).
  */
object Cleaning {

  /** P14: column-set validation — fail listing missing columns, like
    * clean_data.py:173-187 / quality/checks.py:74-89.
    */
  def requireColumns(df: DataFrame, required: Seq[String]): Unit = {
    val missing = required.filterNot(df.columns.toSet)
    require(missing.isEmpty,
      s"missing required columns: ${missing.mkString(", ")}")
  }

  /** P7: any-null row drop (clean_data.py:149). */
  def dropNullRows(df: DataFrame): DataFrame = df.na.drop("any")

  /** A7: keyed dedup. The reference's keep="first" (clean_data.py:150)
    * is order-dependent and effectively arbitrary; we strengthen to a
    * DEFINED survivor: latest source_ingested_at, ties to the smaller
    * batch_id (SURVEY §7.4 risk 2). One shuffle on the key columns.
    */
  def dedupKeepLatest(df: DataFrame,
                      keys: Seq[String] = Seq("city", "ts_utc"),
                      orderCols: Seq[org.apache.spark.sql.Column] =
                        Seq(col("source_ingested_at").desc, col("batch_id"))): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full clean: select the 10-column schema in order, drop null rows,
    * dedup on (city, ts_utc). The reference then globally sorts
    * (clean_data.py:151) — that order only affects parquet row order,
    * not semantics, so at scale we sort WITHIN partitions after
    * clustering by city: same locality benefit, no global range shuffle
    * (SURVEY §2.5 O1).
    */
  def clean(flattened: DataFrame): DataFrame = {
    requireColumns(flattened, Schemas.weatherHourlyColumns)
    val selected = flattened.select(Schemas.weatherHourlyColumns.map(col): _*)
    dedupKeepLatest(dropNullRows(selected))
      .sortWithinPartitions("city", "ts_utc")
  }
}
