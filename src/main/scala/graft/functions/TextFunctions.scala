package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, counting, quality scoring, language ID,
  * fingerprinting. All pure Catalyst built-ins / higher-order functions
  * — fully codegen'd, no UDFs, so they pipeline inside whole-stage
  * codegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenizer (lowercased, empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: word-piece count estimated by splitting on
    * non-alphanumerics AND intra-word boundaries every 4 chars (a cheap
    * deterministic stand-in for a real BPE vocab — the plumbing point
    * is a per-doc token budget column, not the exact vocab).
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("int"))

  /** Character n-gram shingles of the raw text (for MinHash/Jaccard). */
  def charShingles(text: Column, n: Int): Column = {
    val t = lower(text)
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n))))
  }

  /** Word n-gram shingles (space-joined), the standard MinHash unit for
    * document dedup.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      when(size(ts) < n, array(concat_ws(" ", ts)))
        .otherwise(transform(
          sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
  }

  private val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Quality signals: length, token stats, stopword ratio, punctuation
    * ratio, digit ratio — the usual cheap pre-filters for web-scale
    * corpus cleaning. Returns a struct column.
    */
  def qualitySignals(text: Column): Column = {
    val ts = tokens(text)
    val nTok = size(ts).cast("double")
    struct(
      length(text).as("n_chars"),
      size(ts).as("n_tokens"),
      (length(text).cast("double") / greatest(nTok, lit(1.0))).as("avg_token_len"),
      (size(filter(ts, t => t.isin(stopwords.map(lit): _*))).cast("double") /
        greatest(nTok, lit(1.0))).as("stopword_ratio"),
      (length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("double") /
        greatest(length(text).cast("double"), lit(1.0))).as("punct_ratio"),
      (length(regexp_replace(text, "[^0-9]", "")).cast("double") /
        greatest(length(text).cast("double"), lit(1.0))).as("digit_ratio"))
  }

  /** Composite quality score in [0,1]: penalize too-short/too-long
    * docs, extreme stopword ratios, heavy punctuation/digits.
    */
  def qualityScore(text: Column): Column = {
    val s = qualitySignals(text)
    val lenScore = when(s("n_tokens") < 5, 0.2)
      .when(s("n_tokens") > 10000, 0.5)
      .otherwise(1.0)
    val stopScore = when(s("stopword_ratio") > 0.6, 0.5)
      .otherwise(1.0)
    val punctScore = when(s("punct_ratio") > 0.3, 0.3).otherwise(1.0)
    val digitScore = when(s("digit_ratio") > 0.3, 0.5).otherwise(1.0)
    round(lenScore * stopScore * punctScore * digitScore, 4)
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Deterministic, vectorizable, no model file.
    */
  private val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
    "es" -> Seq("el", "la", "los", "y", "de", "un", "una", "es"),
    "it" -> Seq("il", "la", "di", "e", "un", "una", "che", "per"))

  /** Language ID: score = fraction of tokens hitting each language's
    * stopword profile; argmax with 'und' (undetermined) when no profile
    * scores above the floor.
    */
  def langId(text: Column, floor: Double = 0.05): Column = {
    val ts = tokens(text)
    val nTok = greatest(size(ts).cast("double"), lit(1.0))
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (size(filter(ts, t => t.isin(words.map(lit): _*))).cast("double") / nTok)
          .as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best("score") >= floor, best("lang")).otherwise(lit("und"))
  }

  /** Per-token 48-bit hash: the first 12 hex digits of md5, as a long.
    * md5 is the one digest every engine renders identically, so
    * downstream fingerprints stay verifiable against external oracles
    * (xxhash64 exists only inside Spark). Native `graft_md5i` form —
    * bit-identical to `conv(substr(md5(t),1,12),16,10)` (the idiom
    * oracles replay) without the hex round-trip, which matters most
    * inside [[fingerprint]]'s interpreted `aggregate` lambda. Callers
    * must have `GraftFunctions.ensureRegistered` on the session.
    */
  def tokenHash48(t: Column): Column =
    call_function("graft_md5i", t, lit(12))

  /** Fingerprint modulus: 2^55. Keeps `acc*31 + hash48 < 2^63` at every
    * fold step, so the arithmetic is overflow-free — engines that CHECK
    * overflow (rather than wrap like the JVM) compute the identical
    * value.
    */
  val FingerprintMod: Long = 1L << 55

  /** Document fingerprint: polynomial rolling hash over token hashes
    * (order-sensitive — two docs with the same tokens in a different
    * order fingerprint differently, unlike a set hash). Folded mod 2^55
    * with a 48-bit md5-derived token hash: every step stays within a
    * signed 64-bit range, making the value reproducible in any engine
    * with exact integer semantics.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * lit(31L) + tokenHash48(t)) % lit(FingerprintMod))

  /** TF-IDF top terms per document: tf(t,d) · ln(N/df(t)), computed
    * with two hash-aggregates over the exploded token table (no
    * per-doc vocabulary map materialized). Returns
    * (idCol, token, tf, df, tfidf, rank) with rank ≤ topK, ties broken
    * by token for determinism.
    */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, textCol: String,
                    idCol: String, topK: Int = 5)
  : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
      explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // N stays a lazy 1-row broadcast, not an eager count() at
    // plan-construction time (no extra scan job just to build the plan)
    val n = df.agg(countDistinct(col(idCol)).cast("double").as("__n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("__n") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Intra-document repetition score (the Gopher/RefinedWeb-style
    * quality rule "too many repeated n-grams ⇒ boilerplate/spam"):
    * 1 − distinct/total word n-grams per doc. Totals need the
    * NON-distinct gram stream, so this is its own explode + one
    * count/count-distinct aggregate (codegen, map-side combinable);
    * docs shorter than n tokens score 0 (their single whole-doc gram
    * cannot repeat). Returns (idCol, n_grams, n_distinct_grams,
    * repetition).
    */
  def repetitionScore(df: org.apache.spark.sql.DataFrame, textCol: String,
                      idCol: String, n: Int = 3)
  : org.apache.spark.sql.DataFrame = {
    // Pure per-row array arithmetic — NO shuffle. The r8 form
    // (explode + two windows + count-distinct aggregate) paid two
    // per-doc sort exchanges for what is a scalar function of one
    // document; at 100 TB this form is a map-only pass that pipelines
    // into whatever filter consumes the score. Docs with zero tokens
    // produce no gram stream and are dropped (matching the explode
    // form, where they vanished before the aggregate).
    // The token array is BOUND via its own projection before the gram
    // transform: higher-order functions evaluate interpreted, and a
    // lambda body that references a complex expression (rather than a
    // bound column) re-evaluates it PER ELEMENT — the unbound form
    // re-ran split+lower+filter once per token, O(n_tok²) per doc
    // (measured 4.3 s vs 0.7 s over 5k docs at sf0.1). The alias is
    // referenced several times from non-cheap expressions, so
    // CollapseProject keeps the binding projection intact.
    df.select(col(idCol), wordTokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col(idCol), wordGramsOfToks(col("toks"), n).as("grams"))
      .select(col(idCol),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long")
          .as("n_distinct_grams"))
      .withColumn("repetition",
        round(lit(1.0) - col("n_distinct_grams").cast("double") /
          col("n_grams").cast("double"), 4))
  }

  /** Lowercased whitespace tokens as a scalar array column (empty
    * tokens from leading/double whitespace removed). */
  def wordTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  /** Word n-grams of one document as a scalar array column: starts
    * 1..n_tok−n+1 when the doc has ≥n tokens, one whole-doc gram
    * otherwise (the [[graft.operators.Dedup.shingleRows]] short-doc
    * convention). Zero-token docs yield `[""]` — callers that must
    * match the exploded form's drop-empty-docs behavior filter on
    * `size(wordTokens(text)) >= 1` first.
    *
    * PERF: prefer projecting `wordTokens(text).as("toks")` first and
    * calling [[wordGramsOfToks]] on the bound column — HOF lambdas
    * evaluate interpreted and re-evaluate a complex `toks` argument
    * per element. */
  def wordGrams(text: Column, n: Int): Column =
    wordGramsOfToks(wordTokens(text), n)

  /** [[wordGrams]] over an already-computed token-array column. The
    * lambda only touches the bound `toks` reference, so per-element
    * work is O(n) slice+concat, not a re-tokenization of the doc. */
  def wordGramsOfToks(toks: Column, n: Int): Column =
    when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Per-row repetition fraction (1 − distinct/total word n-grams,
    * rounded to 4 dp) — the scalar form of [[repetitionScore]] for
    * pipelines that already hold the doc row.
    *
    * PERF WARNING: higher-order functions don't whole-stage-codegen;
    * if this lands in a Filter predicate (directly or via Catalyst
    * pushing a filter on an aliased copy back through the Project),
    * the gram construction is re-evaluated interpreted per reference
    * — measured 19× slower than the once-evaluated Project form at
    * sf0.1. Joining [[repetitionScoreAgg]] is the safe shape when a
    * downstream filter consumes the score. */
  def repetitionOf(text: Column, n: Int = 3): Column = {
    val grams = wordGrams(text, n)
    round(lit(1.0) - size(array_distinct(grams)).cast("double") /
      size(grams).cast("double"), 4)
  }

  /** [[repetitionScore]] behind an aggregate barrier: same rows and
    * values, but the trailing per-id aggregate (a no-op on the unique
    * id) BLOCKS Catalyst from pushing a downstream `repetition <= x`
    * filter into the gram-construction Project — without the barrier
    * the pushed predicate re-evaluates the (non-codegen) higher-order
    * gram expression per row interpreted, measured 4.7 s vs 1.3 s on
    * the q77 capstone at sf0.1. The aggregate shuffles only the
    * narrow (id, 3 numeric) rows. */
  def repetitionScoreAgg(df: org.apache.spark.sql.DataFrame,
                         textCol: String, idCol: String, n: Int = 3)
  : org.apache.spark.sql.DataFrame =
    repetitionScore(df, textCol, idCol, n)
      .groupBy(idCol)
      .agg(max("n_grams").as("n_grams"),
        max("n_distinct_grams").as("n_distinct_grams"),
        max("repetition").as("repetition"))

  /** Corpus-trained bigram-LM perplexity per document — the CCNet-
    * style "how surprising is this text under a language model"
    * quality signal, with the LM trained ON the corpus itself (no
    * model file): Laplace-smoothed P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V).
    *
    * Scale shape: two hash-aggregates build the unigram and bigram
    * count tables (vocabulary-sized), the corpus bigram stream joins
    * against them (broadcast when small, shuffle when not — Spark
    * picks), and one aggregate folds per-doc log-probabilities.
    * Docs with < 2 tokens have no bigrams and drop out. Returns
    * (idCol, n_bigrams, ppl) with ppl = exp(−Σ ln P / n) rounded.
    */
  def bigramPerplexity(df: org.apache.spark.sql.DataFrame, textCol: String,
                       idCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
      posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("p", "t")))
      .filter(col("t") =!= "")
    val w = Window.partitionBy(idCol).orderBy("p")
    val bigrams = toks
      .withColumn("w2", lead(col("t"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("t").as("w1"), col("w2"))
    val uni = toks.groupBy(col("t").as("w1"))
      .agg(count(lit(1)).as("c1"))
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // V as a lazy 1-row broadcast (same pattern as TF-IDF's N)
    val v = uni.agg(count(lit(1)).cast("double").as("__v"))
    bigrams
      .join(bi, Seq("w1", "w2"))
      .join(uni, "w1")
      .crossJoin(broadcast(v))
      .withColumn("logp",
        log((col("c2") + 1.0) / (col("c1") + col("__v"))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-sum(col("logp")) / count(lit(1))), 4).as("ppl"))
  }

  /** DataFrame-level language ID: codegen'd explode + one conditional-
    * sum per language profile + argmax — the bulk form of `langId`
    * (whose array lambdas run interpreted). Returns (idCol...,
    * detected_lang).
    */
  def langIdByDoc(df: org.apache.spark.sql.DataFrame, textCol: String,
                  idCol: String, floor: Double = 0.05)
  : org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(col(textCol)), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val profiles = langProfiles.toSeq.sortBy(_._1)
    val aggs = profiles.map { case (lang, words) =>
      avg(when(col("t").isin(words.map(lit): _*), 1.0).otherwise(0.0))
        .as(s"score_$lang")
    }
    val scored = toks.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
    val best = greatest(profiles.map { case (lang, _) =>
      struct(col(s"score_$lang").as("score"), lit(lang).as("lang"))
    }: _*)
    scored.select(col(idCol),
      when(best("score") >= floor, best("lang")).otherwise(lit("und"))
        .as("detected_lang"))
  }
}
