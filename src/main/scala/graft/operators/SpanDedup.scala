package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact substring-span dedup (the span-granular form of "dedup
  * repeated long substrings across the corpus"): documents are cut
  * into fixed-width token spans, a span is DUPLICATED if the same
  * span text already occurs in an earlier document (min doc id wins),
  * and each document reports its duplicated-span fraction — the
  * training-data signal for "this page is mostly boilerplate copied
  * from elsewhere", one level coarser than suffix-array ExactSubstr
  * but shuffle-friendly.
  *
  * Scale shape: one explode to span rows, one aggregate for the
  * first-occurrence table, one join back, one per-doc aggregate —
  * two shuffles total, both keyed on md5(span) rather than the span
  * text itself so shuffle rows carry a 32-char digest instead of a
  * ~100-char span (md5 because it is the one digest the external
  * oracle computes identically). The span transform is a per-doc
  * lambda over a ~dozen-element array — small-array territory where
  * interpreted HOFs are fine (the bulk work is the aggregates).
  */
object SpanDedup {

  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
                   spanTokens: Int = 16): DataFrame = {
    val toks = split(col(textCol), " ")
    val spans = df.select(col(idCol).as("id"),
      explode(transform(
        sequence(lit(0),
          floor((size(toks) - lit(1)) / lit(spanTokens)).cast("int")),
        i => array_join(
          slice(toks, i * lit(spanTokens) + lit(1), lit(spanTokens)), " ")))
        .as("sp"))
      .select(col("id"), md5(col("sp")).as("h"))
    val firstDoc = spans.groupBy("h").agg(min(col("id")).as("first_id"))
    spans.join(firstDoc, "h")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum((col("first_id") < col("id")).cast("long")).as("n_dup_spans"))
      .withColumn("dup_frac",
        round(col("n_dup_spans") / col("n_spans"), 4))
  }
}
