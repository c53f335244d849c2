package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level retrieval scoring: BM25 ranking and DSIR-style
  * importance scoring for training-data selection.
  *
  * Both operators share the same scale posture: the only corpus-sized
  * work is token explosion feeding hash aggregates (codegen, map-side
  * combinable), every model table (query-term document frequencies,
  * unigram language models) is tiny and broadcast, and per-document
  * scores come from one more hash aggregate — no global sort until the
  * final bounded top-k.
  */
object Retrieval {

  /** Okapi BM25 ranking of documents against a small query-term set
    * (the retrieval scorer behind decontamination-by-retrieval and
    * quality-by-query curation passes).
    *
    * score(D,Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·|D|/avgdl))
    * with the Robertson-Sparck-Jones idf ln((N−df+0.5)/(df+0.5)+1).
    *
    * Plan shape at 100 TB: document length |D| is computed NARROW
    * (`size(tokens)`) — no token shuffle just for lengths; corpus
    * stats (N, avgdl) reduce to one broadcast row; only tokens that
    * match the query survive the explode filter, so the tf aggregate
    * shuffles a few rows per matching doc, not the corpus. One
    * TakeOrderedAndProject caps the result.
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 10): DataFrame = {
    val dl = docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("dl")).as("__avgdl"))
    val tf = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("score_t",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("__avgdl"))))
      .groupBy(idCol)
      .agg(round(sum("score_t"), 4).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** DSIR-style importance score for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * rank raw-corpus documents by how much more likely they are under
    * a target-domain unigram LM than under the raw-corpus LM,
    *
    *   score(D) = Σ_t tf(t,D) · [ln p̂_tgt(t) − ln p̂_raw(t)]
    *
    * with Laplace-smoothed token probabilities p̂(t) = (c(t)+1)/(T+V)
    * and V = the raw corpus vocabulary size. Documents with the
    * highest scores are the ones importance resampling keeps.
    *
    * The two language models are corpus-level token aggregates (tiny:
    * |vocab| rows) broadcast onto the per-doc tf table; the target
    * model left-joins so unseen-in-target tokens get c_tgt = 0. The
    * only corpus-sized shuffle is the per-doc tf aggregate.
    */
  def dsirScores(docs: DataFrame, textCol: String, idCol: String,
                 isTarget: org.apache.spark.sql.Column,
                 topK: Int = 20): DataFrame = {
    val toks = docs.select(col(idCol), isTarget.as("is_tgt"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(idCol, "token")
      .agg(count(lit(1)).as("tf"))
    val rawLm = toks.groupBy("token").agg(count(lit(1)).as("c_raw"))
    val tgtLm = toks.filter(col("is_tgt"))
      .groupBy("token").agg(count(lit(1)).as("c_tgt"))
    val totals = rawLm.agg(
      sum("c_raw").cast("double").as("__t_raw"),
      count(lit(1)).cast("double").as("__v"))
    val tgtTotal = tgtLm.agg(sum("c_tgt").cast("double").as("__t_tgt"))
    tf.join(broadcast(rawLm), "token")
      .join(broadcast(tgtLm), Seq("token"), "left")
      .na.fill(0L, Seq("c_tgt"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(tgtTotal))
      .withColumn("llr",
        log((col("c_tgt") + 1.0) / (col("__t_tgt") + col("__v"))) -
          log((col("c_raw") + 1.0) / (col("__t_raw") + col("__v"))))
      .groupBy(idCol)
      .agg(round(sum(col("tf") * col("llr")), 4).as("dsir_score"),
        sum("tf").as("n_tokens"))
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(topK)
  }
}
