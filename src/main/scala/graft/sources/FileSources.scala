package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-first JSONL / CSV ingestion with explicit corrupt-record
  * capture — the landing contract for text-format raw layers:
  *
  *  - the schema is DECLARED, never inferred (inference is a full
  *    extra pass over the data and nondeterministic under drift);
  *  - malformed lines land in a `_corrupt_record` column instead of
  *    being silently dropped (PERMISSIVE mode) — the quality gate
  *    decides what to do with them, the source never loses bytes;
  *  - `partitioned` splits well-formed rows from corrupt ones in one
  *    pass so pipelines can route rejects to a quarantine sink.
  */
object FileSources {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))

  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** (wellFormed, corrupt) split. Spark requires the corrupt column be
    * materialized (cached) before filtering on it — referencing it
    * straight off the lazy scan raises AnalysisException by design.
    */
  def partitioned(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    (cached.filter(col(CorruptCol).isNull).drop(CorruptCol),
      cached.filter(col(CorruptCol).isNotNull))
  }
}
