package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-order text statistics: n-gram novelty (the memorization-
  * risk / freshness diagnostic) and the Heaps-law vocabulary growth
  * curve (the corpus-characterization stat behind tokenizer/vocab
  * sizing). Both are linear: gram/token-keyed aggregates only, no
  * corpus-sized join-back, windows on domain-sized tables
  * (`Profile stress-text` measures the 20× ladder).
  */
object TextStats {

  /** Per-document n-gram novelty in `idCol` order: of a doc's
    * DISTINCT word n-grams, how many first occur in that doc
    * (first occurrence = minimum doc id). Output: (doc_id, n_grams,
    * n_novel). Novelty counts come from grouping the (gram → first
    * doc) table by its own first-doc id — two gram-keyed aggregates
    * plus a |docs|-row join, never a gram-sized join-back.
    */
  def noveltyByDoc(docs: DataFrame, textCol: String, idCol: String,
                   n: Int = 4): DataFrame = {
    val grams = Dedup.shingleRowsRaw(docs, textCol, idCol, n)
      .select(col("id"), col("g")).distinct()
    val perDoc = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val novel = grams.groupBy("g").agg(min(col("id")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }

  /** Heaps-law vocabulary growth: cumulative (tokens, distinct word
    * types) after every `checkpointDocs` documents in `idCol` order.
    * Each type contributes via its FIRST document only (one
    * token-keyed min aggregate); the cumulative window runs on the
    * CHECKPOINT domain (|docs|/checkpointDocs rows), never the token
    * stream. Output: (checkpoint_docs, toks_cum, vocab_cum).
    */
  def heapsCurve(docs: DataFrame, textCol: String, idCol: String,
                 checkpointDocs: Int = 100): DataFrame = {
    require(checkpointDocs > 0,
      s"checkpointDocs must be positive: $checkpointDocs")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.wordTokens(col(textCol)))
        .as("t"))
    val tokCounts = toks
      .groupBy(expr(s"doc_id div $checkpointDocs").as("b"))
      .agg(count(lit(1)).as("toks"))
    val newTypes = toks.groupBy("t").agg(min("doc_id").as("f"))
      .groupBy(expr(s"f div $checkpointDocs").as("b"))
      .agg(count(lit(1)).as("types"))
    val w = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokCounts.join(newTypes, Seq("b"), "full")
      .select((col("b") * checkpointDocs + checkpointDocs)
        .as("checkpoint_docs"),
        sum(coalesce(col("toks"), lit(0L))).over(w).as("toks_cum"),
        sum(coalesce(col("types"), lit(0L))).over(w).as("vocab_cum"))
  }
}
