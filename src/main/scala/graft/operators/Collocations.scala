package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collocation (multi-word-expression) mining by pointwise mutual
  * information — the phrase-detection pass of word2vec/GloVe-style
  * pipelines ("new york" → one token) and a standard corpus-analysis
  * operator.
  *
  * PMI over the bigram contingency table: for adjacent pair (x, y),
  * `pmi = ln( c_xy · N / (c_x· · c_·y) )` where N is the total bigram
  * count, c_x· the count of bigrams starting with x, and c_·y the
  * count ending with y. All four inputs are exact integers from ONE
  * hash aggregate over the token stream, so the score is a single
  * deterministic `ln` of an exact rational — externally replayable
  * (q113's oracle recomputes it verbatim).
  *
  * Scale: corpus-sized work is one map-side-combined groupBy over
  * bigram rows; marginals are derived FROM the bigram table (two
  * window sums over |pair-vocab| rows, never a second corpus scan);
  * the total is a 1-row broadcast. Output is a bounded
  * top-k (TakeOrderedAndProject), never a global sort.
  */
object Collocations {

  def pmiBigrams(df: DataFrame, textCol: String, idCol: String,
                 minCount: Long = 5L, topK: Int = 20): DataFrame = {
    val toks = df
      .select(col(idCol).as("id"),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("p", "t")))
      .filter(col("t") =!= "")
    val w = Window.partitionBy("id").orderBy("p")
    val pairs = toks
      .withColumn("w2", lead(col("t"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("t").as("w1"), col("w2"))

    val bg = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    // contingency-table marginals and total from the bigram table:
    // window sums keyed by each side (no join, no second corpus pass)
    val withMarginals = bg
      .withColumn("c_x", sum(col("c_xy")).over(Window.partitionBy("w1")))
      .withColumn("c_y", sum(col("c_xy")).over(Window.partitionBy("w2")))
    val total = bg.agg(sum(col("c_xy")).as("nb"))

    withMarginals
      .filter(col("c_xy") >= minCount)
      .crossJoin(broadcast(total))
      // integer products first (exact in BIGINT at any realistic
      // corpus), ONE double division, ONE ln — bit-replayable
      .withColumn("pmi", round(
        log((col("c_xy") * col("nb")).cast("double") /
          (col("c_x") * col("c_y")).cast("double")), 4))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("c_xy"), col("pmi"))
  }
}
