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

  /** Column-level variant of the same contract for JSON that is
    * already IN a column (message queues, raw-layer payload columns):
    * adds `parsed` (struct) and `is_valid`.
    *
    * Validity is judged by the corrupt-record channel, NOT by
    * null-ness of parsed fields: Spark's PERMISSIVE parser MAY keep
    * partial results for a record truncated mid-value (the salvaged
    * prefix fields would then mis-classify it as valid), and a valid
    * record may legitimately omit a nullable field. `is_valid` is
    * false for exactly the rows the parser flagged — consumers must
    * gate field access on `is_valid`, never on field null-ness.
    */
  def parseJsonColumn(df: DataFrame, jsonCol: String,
                      schema: StructType): DataFrame = {
    val full = withCorrupt(schema)
    df.withColumn("parsed",
        org.apache.spark.sql.functions.from_json(col(jsonCol), full,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)))
      .withColumn("is_valid", col(s"parsed.$CorruptCol").isNull)
  }
}
