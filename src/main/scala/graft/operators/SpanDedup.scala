package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** ExactSubstr-style dedup: maximal repeated token spans at
    * ARBITRARY offsets (the suffix-array-equivalent granularity of
    * "Deduplicating Training Data Makes Language Models Better", Lee
    * et al. 2022 — their ExactSubstr removes every ≥50-token substring
    * that occurs elsewhere in the corpus, keeping one copy). The
    * fixed-boundary [[dupSpanStats]] misses a copy shifted by one
    * token; this form slides a `minTokens`-gram anchor over EVERY
    * offset, so any repeated run of ≥ `minTokens` tokens is caught at
    * its exact extent.
    *
    * Semantics (deterministic keep-first): an offset `(doc, i)` is
    * duplicated iff the k-gram starting there also occurs at a
    * strictly earlier `(doc', i')` in `(doc, pos)` order — the
    * earliest copy survives, later copies (cross-doc AND intra-doc
    * repeats) are flagged. Consecutive duplicated offsets merge into
    * maximal islands: an island of anchor offsets `[s..e]` covers the
    * repeated token run `[s, e + k - 1]`, reported as
    * `(id, start_tok, span_tokens = e - s + k)`.
    *
    * Scale shape (suffix arrays don't distribute; this does): one
    * explode to per-offset anchor hashes, one group-by for the
    * first-occurrence table keyed on the digest (shuffle rows carry a
    * 32-char md5, never span text — md5 because the external oracle
    * computes it identically; at 100 TB swap in `xxhash64` over the
    * joined span for 8-byte shuffle keys), one hash join back, then a
    * per-document gaps-and-islands window — bounded by tokens-per-doc,
    * never corpus-sized. Total: two shuffles plus the window, all
    * linear in corpus token count. The `(doc, i)` pair is packed into
    * one long (`doc * 1e6 + i`; token offsets < 1e6 asserted by the
    * guard below) so "earliest occurrence" is a single `min` aggregate
    * with map-side partial combine.
    */
  /** The APPLY step of [[exactSubstrIntervals]]: excise every flagged
    * island from the text, keeping the earliest copy corpus-wide —
    * what ExactSubstr actually does to training data. Each doc
    * reports original/kept token counts and the rejoined survivor
    * text (token order preserved); docs with nothing flagged pass
    * through whole.
    *
    * Scale shape: the islands pipeline plus one explode of COVERED
    * offsets (≤ corpus tokens), an anti-join on (doc, offset), and a
    * per-doc ordered re-aggregation — all linear, the window again
    * per-doc-bounded.
    */
  def exactSubstrApply(df: DataFrame, idCol: String, textCol: String,
                       minTokens: Int = 8): DataFrame = {
    val islands = exactSubstrIntervals(df, idCol, textCol, minTokens)
    val covered = islands.select(col(idCol).as("id"),
      explode(sequence(col("start_tok"),
        col("start_tok") + col("span_tokens") - 1)).as("p"))
    val toks = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("p", "tok")))
      .withColumn("p", col("p").cast("long"))
    val kept = toks.join(covered, Seq("id", "p"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ").as("text_kept"))
    // LEFT from the corpus side: a doc whose every token was flagged
    // (a whole-doc duplicate) still reports, as (0, "")
    df.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens_orig"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens_orig"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  def exactSubstrIntervals(df: DataFrame, idCol: String, textCol: String,
                           minTokens: Int = 8): DataFrame = {
    val k = minTokens
    val toks = split(col(textCol), " ")
    val offs = df
      .select(col(idCol).as("id"), toks.as("toks"))
      .where(size(col("toks")).between(k, 1000000))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), size(col("toks")) - lit(k)),
          i => md5(array_join(
            slice(col("toks"), i + lit(1), lit(k)), " ")))))
      .select(col("id"), col("pos").cast("long").as("i"),
        col("col").as("h"))
    val packed = col("id") * lit(1000000L) + col("i")
    val first = offs.groupBy("h").agg(min(packed).as("fk"))
    val dup = offs.join(first, "h").where(packed > col("fk"))
      .select(col("id"), col("i"))
    val w = Window.partitionBy("id").orderBy("i")
    dup
      .withColumn("grp", col("i") - row_number().over(w))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("i")).as("start_tok"),
        (max(col("i")) - min(col("i")) + lit(k.toLong)).as("span_tokens"))
      .select(col("id").as(idCol), col("start_tok"), col("span_tokens"))
  }
}
