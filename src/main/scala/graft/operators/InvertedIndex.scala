package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Inverted-index construction — the corpus artifact behind keyword
  * retrieval, decontamination-by-lookup, and posting-intersection
  * joins.
  *
  * The build is a single shuffle of (token, doc_id) pairs into a hash
  * aggregate; per-token posting lists come from `collect_set` +
  * `array_sort` inside that one aggregate (map-side partial
  * aggregation applies — each mapper emits its local doc-id set per
  * token). At 100 TB a single posting row per token would hot-spot the
  * few head tokens (Zipf), so the real-scale layout shards postings by
  * `(token, doc_id mod S)` and the shard count rides the same
  * aggregate key — the plan shape is identical; this builder keeps
  * S=1 for replayability.
  */
object InvertedIndex {

  /** One row per token: document frequency, total term frequency, and
    * the sorted doc-id posting list (comma-joined, engine-portable).
    */
  def build(docs: DataFrame, textCol: String, idCol: String,
            minDf: Long = 1L): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    toks.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf_total"),
        array_join(
          transform(array_sort(collect_set(col("doc_id"))),
            x => x.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf)
  }
}
