package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) merge learning — the "build
  * the tokenizer vocabulary from the corpus" step of a training-data
  * pipeline. Classic BPE (Sennrich et al. 2016): train on the WORD
  * FREQUENCY table (types × counts, not the raw token stream), then
  * repeatedly merge the most frequent adjacent symbol pair.
  *
  * Scale design:
  *  - the expensive part — word counting — is one hash-aggregate over
  *    the corpus (map-side combined); everything after runs on the
  *    word-TYPE table, which is vocabulary-sized, not corpus-sized;
  *  - each merge round is one pair-count aggregate + one argmax
  *    `limit(1).collect()` (a single row — the merge DECISION is the
  *    inherently sequential part of BPE) + one codegen string
  *    `replace` applying the merge; lineage is checkpoint-truncated
  *    per round like every fixpoint loop here;
  *  - adjacent-pair extraction uses an array lambda: acceptable OFF
  *    the hot path because it runs over word types (thousands), not
  *    corpus tokens (billions at 100 TB).
  *
  * Greedy left-to-right merge application matches the reference BPE.
  * The replace pattern keeps the TRAILING separator via lookahead:
  * consuming it would hide the next occurrence in a run ("aaaa" with
  * merge(a,a) must give [aa, aa], not [aa, a, a]).
  *
  * Determinism: argmax ties break on (left, right) ascending, so the
  * learned merge list is a pure function of the corpus.
  */
object BpeVocab {

  /** Separator for the symbol-string encoding; never appears in
    * whitespace-tokenized lowercase text.
    */
  private val Sep = ""

  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pair_count: Long)

  private def encode(word: org.apache.spark.sql.Column) =
    concat(lit(Sep), concat_ws(Sep, split(word, "")), lit(Sep))

  /** Greedy-safe merge rewrite: match `SEP l SEP r` only when another
    * SEP follows (lookahead, not consumed), replace with `SEP lr`.
    */
  private def applyOneMerge(enc: org.apache.spark.sql.Column,
                            l: String, r: String) = {
    val pattern = java.util.regex.Pattern.quote(Sep + l + Sep + r) +
      "(?=" + java.util.regex.Pattern.quote(Sep) + ")"
    val replacement =
      java.util.regex.Matcher.quoteReplacement(Sep + l + r)
    regexp_replace(enc, lit(pattern), lit(replacement))
  }

  /** Adjacent symbol pairs of a SEP-encoded word (array lambda — word
    * types only, see scaladoc).
    */
  private def pairsOf(enc: org.apache.spark.sql.Column) = {
    val syms = filter(split(enc, Sep), s => length(s) > 0)
    when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
      .otherwise(transform(sequence(lit(0), size(syms) - 2),
        i => struct(element_at(syms, i + 1).as("l"),
          element_at(syms, i + 2).as("r"))))
  }

  /** Learn `numMerges` merges from the corpus. Returns the merge table
    * (rank, left, right, merged, pair_count) in learned order; stops
    * early when no adjacent pair remains.
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(encode(col("w")).as("enc"), col("freq"))
      .localCheckpoint(true)

    var vocab = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    var r = 0
    while (r < numMerges && !exhausted) {
      val top = vocab
        .select(explode(pairsOf(col("enc"))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Row(l: String, rr: String, n: Long) = top.head
        merges += Merge(r + 1, l, rr, l + rr, n)
        vocab = vocab
          .select(applyOneMerge(col("enc"), l, rr).as("enc"), col("freq"))
          .localCheckpoint(true)
        r += 1
      }
    }
    spark.createDataFrame(merges.toSeq)
      .select(col("rank"), col("left"), col("right"), col("merged"),
        col("pair_count"))
  }

  /** Tokenize words with a learned merge list: apply merges in rank
    * order (each a greedy left-to-right replace), then split into the
    * final subword symbols. `merges` is collected (vocabulary-sized)
    * and folded into ONE codegen expression chain — per-row work is
    * pure string ops inside whole-stage codegen.
    */
  def applyMerges(df: DataFrame, wordCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val enc = merges.foldLeft(encode(col(wordCol))) { case (e, (l, r)) =>
      applyOneMerge(e, l, r)
    }
    df.withColumn("subwords", filter(split(enc, Sep), s => length(s) > 0))
  }
}
