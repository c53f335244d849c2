package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, smallest-to-
  * largest hammer:
  *
  *  - exact: hash-groupBy on content digest — one shuffle.
  *  - MinHash + LSH: shingle → minhash signature → band → bucket join →
  *    verified Jaccard. Candidate pairs come from equal band-hashes,
  *    never from an O(N²) cross join.
  *  - SimHash: 64-bit sign-aggregated fingerprint; near-dups = small
  *    Hamming distance, found by exact-match on chunks (pigeonhole:
  *    d ≤ k ⟹ some ⌈64/(k+1)⌉-bit chunk matches exactly).
  *  - n-gram Jaccard: exact all-pairs similarity via inverted-index
  *    join with AllPairs-style LENGTH filtering inside the join
  *    condition (PPJoin prefix filtering was measured and LOST on this
  *    uniform synthetic vocabulary — see ngramJaccardPairs; it remains
  *    the standard scale-out for Zipfian corpora).
  *  - embedding cosine: near-dup pairs above a cosine threshold via
  *    random-hyperplane LSH bucketing.
  *
  * Physical design notes (these matter at 100 TB):
  *  - Signatures (minhash / simhash / hyperplane) are computed via
  *    explode + hash-aggregate rather than array higher-order
  *    functions: HOF lambdas execute INTERPRETED in Spark (outside
  *    whole-stage codegen), while explode + 64 scalar hash/sum
  *    aggregates stay fully codegen'd with map-side partial
  *    aggregation — measured ~5-10× faster here and shuffle-light
  *    (partial aggs reduce to one row per doc per partition).
  *  - Candidate generation carries ONLY ids through the self-join +
  *    dedup; shingle arrays / vectors are re-joined afterwards for
  *    verification, so wide payloads never ride the hot shuffle.
  */
object Dedup {

  /** Exact dedup: keep the smallest `idCol` per identical content.
    * Deterministic survivor; single hash-aggregate shuffle.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct word n-gram shingles as ROWS (id, g, n_sh): tokens via
    * codegen'd split + posexplode, n-grams via window `lead` over token
    * position — everything whole-stage-codegen (the array-HOF shingle
    * form measured ~10s on 5k docs; this form ~1s). Docs shorter than
    * n tokens yield one whole-doc shingle (concat_ws skips the null
    * leads), matching TextFunctions.wordShingles.
    */
  def shingleRows(df: DataFrame, textCol: String, idCol: String,
                  n: Int): DataFrame = {
    val withGram = shingleRowsRaw(df, textCol, idCol, n).distinct()
    withGram.withColumn("n_sh",
      count(lit(1)).over(Window.partitionBy("id")))
  }

  /** [[shingleRows]] without the per-(id,g) distinct and the n_sh
    * window — the raw positional gram stream (one row per gram
    * OCCURRENCE). Correct whenever the consumer dedups anyway (an
    * equi-join followed by a distinct/countDistinct aggregate, as in
    * decontamination) or wants occurrence counts.
    *
    * Shape: MAP-ONLY — the token array is bound in its own projection
    * (see the HOF-rebinding note on TextFunctions.repetitionScore),
    * grams come from one in-row array transform, and a Generate
    * explodes them. Zero exchanges, vs the r8 form's two per-doc
    * window sorts (lead over token position) — at 100 TB the gram
    * stream pipelines straight into whatever shuffle consumes it
    * instead of paying its own sort first. Short docs (< n tokens)
    * yield one whole-doc gram; empty docs yield nothing.
    */
  def shingleRowsRaw(df: DataFrame, textCol: String, idCol: String,
                     n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        graft.functions.TextFunctions.wordTokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("id"),
        explode(graft.functions.TextFunctions
          .wordGramsOfToks(col("toks"), n)).as("g"))

  /** MinHash signatures as 64 codegen'd min-aggregates over shingle
    * rows: returns (id, sig array<long>). One shuffle keyed by id
    * with map-side partial mins.
    */
  def minhashSignatures(grams: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("g"), lit(i))).as(s"m$i"))
    grams.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band hashes from a signature column. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",",
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).cast("string")).as("h")))

  /** Near-duplicate pairs by MinHash+LSH, verified with EXACT Jaccard
    * on the shingle sets. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, jaccard ≥ threshold.
    */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      shingleSize: Int = 3, numHashes: Int = 64,
                      bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val rowsPerBand = numHashes / bands
    val grams = shingleRows(df, textCol, idCol, shingleSize)
    val sigs = minhashSignatures(grams, numHashes)

    // candidate generation on ids only — no payloads ride the shuffle
    val banded = sigs.select(col("id"),
        explode(bandHashes(col("sig"), bands, rowsPerBand)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
    val candidates = banded.alias("l")
      .join(banded.alias("r"), Seq("band", "h"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()

    verifyJaccard(candidates, grams, threshold)
  }

  /** Session-scoped memo of VERIFIED near-dup pair graphs, keyed by
    * (session, input identity, parameters): q-series queries that
    * share a pair graph (pairs → clustering → corpus rewrite) pay the
    * signature+verify cost ONCE per session instead of per query —
    * the materialized (localCheckpoint'd) result is deterministic, so
    * reuse cannot change any answer. Entries are pair LISTS (ids +
    * score — tiny relative to the corpus) and are evicted when their
    * session's context ends; see [[graft.core.SessionMemo]] for the
    * key-identifies-content contract.
    */
  private val pairGraphMemo = new graft.core.SessionMemo

  /** `minhashNearDups` with session-lifetime reuse of the materialized
    * result. Use from repeated-pipeline contexts (the q23/q37/q65
    * family); call the uncached form for one-shot use. `inputKey` must
    * identify the input's CONTENT (path + params suffices for
    * immutable-within-session data — the SessionMemo contract).
    */
  def minhashNearDupsCached(df: DataFrame, inputKey: String,
                            textCol: String, idCol: String,
                            shingleSize: Int = 3, numHashes: Int = 64,
                            bands: Int = 16,
                            threshold: Double = 0.7): DataFrame =
    pairGraphMemo.getOrElseUpdate(df.sparkSession,
      s"$inputKey|$textCol|$idCol|$shingleSize|$numHashes|$bands|$threshold") {
      minhashNearDups(df, textCol, idCol, shingleSize, numHashes, bands,
        threshold)
    }

  /** Incremental near-dup, AD-HOC form: pairs between an arriving
    * BATCH and a corpus, both given as DataFrames — BOTH sides'
    * signatures are computed in this call. Use when the corpus is
    * already in memory for other reasons or for one-shot jobs; the
    * PRODUCTION maintenance path is [[NearDupIndex]], which persists
    * the corpus's band index + gram postings (epoch-partitioned
    * VersionedTable) so each ingest computes batch signatures only and
    * probes/verifies against STORED data — per-ingest work scales with
    * the batch, never corpus². Verification re-joins shingles for the
    * touched ids only (the candidate set carries ids, not payloads).
    *
    * Returns (corpus_id, batch_id, jaccard) with jaccard ≥ threshold.
    * Cross-set pairs only: run `minhashNearDups(batch)` separately for
    * within-batch duplicates. Id spaces must be disjoint across the
    * two inputs (same contract as a keyed index).
    *
    * Same signature parameters as [[minhashNearDups]] — the cross-set
    * result is exactly the full pair set restricted to one-side-each,
    * which is what the q97 oracle checks.
    */
  def incrementalNearDups(corpus: DataFrame, batch: DataFrame,
                          textCol: String, idCol: String,
                          shingleSize: Int = 3, numHashes: Int = 64,
                          bands: Int = 16,
                          threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val rowsPerBand = numHashes / bands
    val corpusGrams = shingleRows(corpus, textCol, idCol, shingleSize)
    val batchGrams = shingleRows(batch, textCol, idCol, shingleSize)
    def bandIndex(grams: DataFrame): DataFrame =
      minhashSignatures(grams, numHashes)
        .select(col("id"),
          explode(bandHashes(col("sig"), bands, rowsPerBand)).as("bh"))
        .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
    // ids only through the probe join; payloads re-joined in verify
    val candidates = bandIndex(corpusGrams).alias("l")
      .join(bandIndex(batchGrams).alias("r"), Seq("band", "h"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    verifyJaccard(candidates, corpusGrams.unionByName(batchGrams), threshold)
      .select(col("id_a").as("corpus_id"), col("id_b").as("batch_id"),
        col("jaccard"))
  }

  /** EXACT-Jaccard verification of (id_a, id_b) candidates against the
    * (id, g, n_sh) shingle-row table, arithmetically:
    * J = common/(n_a + n_b - common) where common = count of shared
    * distinct grams — a join + hash-aggregate, no array intersection.
    */
  private[operators] def verifyJaccard(candidates: DataFrame,
                                       grams: DataFrame,
                                       threshold: Double): DataFrame = {
    val a = grams.select(col("id").as("id_a"), col("g"), col("n_sh").as("n_a"))
    val b = grams.select(col("id").as("id_b"), col("g"), col("n_sh").as("n_b"))
    candidates
      .join(a, "id_a")
      .join(b, Seq("id_b", "g"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"),
        first("n_a").as("n_a"), first("n_b").as("n_b"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** First 64 bits of a token's md5 as ONE long (two 32-bit `conv`
    * halves; the high half's shifted multiply intentionally wraps —
    * two's-complement wraparound reproduces the exact 64-bit pattern).
    * md5-derived bits (rather than xxhash64) keep the whole SimHash
    * pipeline reproducible in any engine that renders md5 — external
    * oracles recompute the same bits nibble-wise from the hex string.
    * Bit b here lands in hex digit 16-b/4; the oracle reads digit
    * b/4+1 — a fixed bit PERMUTATION, which Hamming distances are
    * invariant to, so the two layouts interoperate.
    *
    * Parsing the hex ONCE per token and extracting bits with integer
    * shifts is the hot-path shape: per-(token,bit) substr/conv string
    * work after the ×64 explode measured 3× slower end-to-end.
    */
  private def md5Long(t: Column): Column = {
    // native digest-bytes halves (graft_md5i ≡ the conv/substr idiom,
    // property-tested); same wrap arithmetic, no hex materialization.
    // Self-registering against the ACTIVE session so the public
    // column-form callers ([[simhash]]) work on a fresh session without
    // a manual GraftFunctions.ensureRegistered (the DataFrame-taking
    // operators also register explicitly against THEIR input's session,
    // which wins when the two differ).
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.ensureRegistered)
    call_function("graft_md5i", t, lit(8)) * lit(4294967296L) +
      call_function("graft_md5i", t, lit(8), lit(8))
  }

  /** 64-bit SimHash per doc: the sign-sum per (doc, bit) is
    * Σ count(doc, token)·±1, so occurrences are FIRST collapsed to
    * (doc, distinct-token, count) — one cheap map-side-combinable
    * aggregate — and only the collapsed rows ride the ×64 bit explode.
    * On Zipfian text (doc-distinct tokens ≪ occurrences) this shrinks
    * the dominant exploded stream several-fold; the token hash is also
    * computed once per doc-distinct token instead of per occurrence.
    * Two narrow hash-aggregates follow (sign-sum per (id,bit), then
    * bit-OR per id): a 64-column-wide aggregate was measured ~1.5s warm
    * but ~10s cold — whole-stage codegen emits a huge generated class
    * the JIT must compile; the narrow form trades row inflation (fully
    * map-side-combined) for constant-size codegen. Returns (id, sh).
    */
  def simhashes(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val occ = df.select(col(idCol).as("id"),
      explode(split(lower(col(textCol)), "\\s+")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("id", "t").agg(count(lit(1)).as("cnt"))
      .select(col("id"), col("cnt"), md5Long(col("t")).as("h"))
    // 64 sign-sums as ONE wide aggregate over the collapsed rows: no
    // ×64 row explode, one shuffle keyed by id with map-side partials.
    // The generated class is large (~10s one-time codegen+JIT per JVM,
    // which Bench's warm-up absorbs) but the steady-state run beats the
    // narrow explode form ~1.6× at sf0.1 — at 100 TB the explode form
    // would push 64× the rows through the exchange.
    val bitSums = (0 until 64).map(b =>
      sum(when(call_function("shiftright", col("h"), lit(b))
        .bitwiseAND(1) === 1, col("cnt")).otherwise(-col("cnt"))).as(s"s$b"))
    occ.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sh"))
  }

  /** Column form kept for spot use/tests (interpreted HOF — fine for
    * small data, use `simhashes` for bulk work). Self-registers
    * `graft_md5i` against the active session (see [[md5Long]]).
    */
  def simhash(tokens: Column): Column = {
    val bitSums = transform(sequence(lit(0), lit(63)),
      b => aggregate(tokens, lit(0),
        (acc, t) => acc +
          when(call_function("shiftright", md5Long(t), b.cast("int"))
            .bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, b) => when(s >= 0,
          call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(0L)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDistance.
    * Candidates via the pigeonhole chunk trick — chunk-equality is a
    * hash-join, not a cross join.
    */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val chunkBits = 64 / chunks
    val base = simhashes(df, textCol, idCol)
    val chunked = base.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(chunks - 1)),
        c => struct(c.as("c"),
          call_function("shiftright", col("sh"), (c * chunkBits).cast("int"))
            .bitwiseAND((1L << chunkBits) - 1).as("v")))).as("ch"))
      .select(col("id"), col("sh"), col("ch.c").as("c"), col("ch.v").as("v"))
    chunked.alias("l").join(chunked.alias("r"), Seq("c", "v"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hammingDistance(col("l.sh"), col("r.sh")).as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .distinct()
  }

  /** Exact all-pairs n-gram Jaccard via inverted-index join with
    * AllPairs-style LENGTH filtering, verified ARITHMETICALLY:
    * J(a,b) = common/(|a|+|b|-common), where `common` is the exact
    * shared-distinct-gram count from the postings join — no array
    * intersection, no shingle arrays riding any shuffle.
    *
    * Length filter (inside the join condition, applied during probe):
    * J ≥ t requires t·|a| ≤ |b| ≤ |a|/t — wildly different-sized docs
    * never become pair rows. A rarest-first prefix filter was measured
    * here and LOST (Σdf²/N = 10.7 on this uniform vocabulary: no Zipf
    * tail, so prefixes don't prune but add two shuffles — 1.8× slower,
    * `Profile stress-zipf`). [[ngramJaccardPairsPrefix]] is the
    * validated Zipfian-corpus variant and [[ngramJaccardAuto]] picks
    * by the measured Σdf²/N probe.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2, minJaccard: Double = 0.5): DataFrame = {
    val inv = shingleRows(df, textCol, idCol, n)

    // identical-alias self-join: both sides shuffle the SAME child plan
    // by g, so Spark's ReuseExchange materializes the postings once
    val common = inv.alias("l").join(inv.alias("r"),
        col("l.g") === col("r.g") && col("l.id") < col("r.id") &&
          col("r.n_sh") >= lit(minJaccard) * col("l.n_sh") &&
          col("l.n_sh") >= lit(minJaccard) * col("r.n_sh"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("common"),
        first(col("l.n_sh")).as("n_a"), first(col("r.n_sh")).as("n_b"))

    common
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact all-pairs n-gram CONTAINMENT: C(a,b) = common/min(|a|,|b|)
    * ≥ t — the asymmetric companion to [[ngramJaccardPairs]]. Jaccard
    * misses near-SUPERSET duplicates (a doc quoted whole inside a much
    * larger one has J ≈ |small|/|big| → 0 but C ≈ 1); containment is
    * the standard detector for quote/subset duplication (Broder's
    * "containment" from the original resemblance paper, SEQUENCES
    * 1997).
    *
    * Same inverted-index candidate join and arithmetic verification as
    * the Jaccard form, but NO symmetric length filter is admissible —
    * a tiny doc inside a huge one is exactly the hit we want, so
    * candidates are every gram-sharing pair (Σdf² over grams). On a
    * Zipfian corpus use [[ngramContainmentPairsPrefix]] (the one-sided
    * PPJoin bound: only the SMALLER side's (1−t)-prefix enters the
    * candidate join) or [[ngramContainmentAuto]], which probes the
    * corpus shape and dispatches — same trade as [[ngramJaccardAuto]].
    */
  def ngramContainmentPairs(df: DataFrame, textCol: String, idCol: String,
                            n: Int = 3, minContainment: Double = 0.8)
  : DataFrame = {
    val inv = shingleRows(df, textCol, idCol, n)
    inv.alias("l").join(inv.alias("r"),
        col("l.g") === col("r.g") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("common"),
        first(col("l.n_sh")).as("n_a"), first(col("r.n_sh")).as("n_b"))
      .withColumn("containment", col("common").cast("double") /
        least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 4).as("containment"))
  }

  /** One-sided prefix-filtered exact containment — the Zipfian-corpus
    * scale-out [[ngramContainmentPairs]]'s doc promises, identical
    * results. For C(a,b) = common/min(|a|,|b|) ≥ t with |a| ≤ |b| the
    * required overlap is o = ⌈t·|a|⌉, so under the global (df asc, g)
    * gram order the SMALLER doc must share one of its first
    * |a| − o + 1 grams with the larger (pigeonhole on its suffix) —
    * only the smaller side's prefix enters the candidate join, probed
    * against FULL postings on the other side (no symmetric bound is
    * admissible: the tiny-doc-inside-huge-doc is the target hit).
    * Candidate volume drops from Σ_g df(g)² to Σ_g df_pref(g)·df(g);
    * on the Zipf head df_pref ≈ 0 (hot grams rank last and fall out
    * of prefixes), which is where the plain join explodes. Arithmetic
    * verification over full postings, as everywhere in this file.
    */
  def ngramContainmentPairsPrefix(df: DataFrame, textCol: String,
                                  idCol: String, n: Int = 3,
                                  minContainment: Double = 0.8)
  : DataFrame =
    containmentFromPostings(shingleRows(df, textCol, idCol, n),
      minContainment)

  private[operators] def containmentFromPostings(inv0: DataFrame,
                                                 minContainment: Double)
  : DataFrame = {
    val inv = inv0.localCheckpoint(true)
    val dfreq = inv.groupBy("g").agg(count(lit(1)).as("df"))
    val ranked = inv.join(dfreq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("g"))))
    val prefix = ranked.filter(
        col("rk") <= col("n_sh") - ceil(lit(minContainment) * col("n_sh")) + 1)
      .select("id", "g", "n_sh")
    // the prefix side is the SMALLER doc (ties to the smaller id so
    // each unordered pair generates once); normalize to id_a < id_b
    val cand = prefix.alias("l").join(inv.alias("r"),
        col("l.g") === col("r.g") &&
          (col("l.n_sh") < col("r.n_sh") ||
            (col("l.n_sh") === col("r.n_sh") && col("l.id") < col("r.id"))))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
      .distinct()
    cand
      .join(inv.select(col("id").as("id_a"), col("g"),
        col("n_sh").as("n_a")), Seq("id_a"))
      .join(inv.select(col("id").as("id_b"), col("g"),
        col("n_sh").as("n_b")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .withColumn("containment", col("common").cast("double") /
        least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 4).as("containment"))
  }

  /** Shape-adaptive exact containment: the [[prefixFilterPays]] probe
    * dispatches between the plain postings join and the one-sided
    * prefix form. Identical results either way.
    */
  def ngramContainmentAuto(df: DataFrame, textCol: String, idCol: String,
                           n: Int = 3, minContainment: Double = 0.8,
                           cacheKey: Option[String] = None)
  : DataFrame = {
    val inv = shingleRows(df, textCol, idCol, n)
    val pays = cacheKey.map(k => prefixFilterPaysCached(inv, s"contain|$k"))
      .getOrElse(prefixFilterPays(inv))
    if (pays) containmentFromPostings(inv, minContainment)
    else ngramContainmentPairs(df, textCol, idCol, n, minContainment)
  }

  /** PPJoin-style prefix-filtered exact n-gram Jaccard (Xiao, Wang,
    * Lin & Yu, "Efficient Similarity Joins for Near Duplicate
    * Detection", WWW 2008): identical RESULTS to
    * [[ngramJaccardPairs]], different candidate generation, built for
    * Zipfian (natural-language) vocabularies.
    *
    * Under a global gram order (rarest document-frequency first), two
    * docs with J ≥ t MUST share a gram inside each one's first
    * `|d| − ⌈t·|d|⌉ + 1` grams — so only PREFIX postings enter the
    * candidate self-join. On a power-law vocabulary the plain join's
    * cost is Σ df² over hot grams (quadratic in the head), while
    * prefixes hold mostly TAIL grams (hot grams sort last and drop
    * out), collapsing candidate volume. Measured (`Profile
    * stress-zipf`, 3k docs, Zipf vocab 3000, Σdf²/N = 31): the plain
    * join materializes 2.23M candidate rows for 1500 true pairs;
    * prefix filtering runs ~1.7× faster end-to-end (2.5 s vs 4.3 s) —
    * and the gap grows with corpus size, since Σdf² scales
    * quadratically in the head while prefix candidates track true
    * pairs. On the uniform tiny-vocab fixture (Σdf²/N = 10.7) the
    * ranking pre-pass just adds two shuffles and loses ~1.8×
    * (5.9 s vs 3.2 s) — hence [[ngramJaccardAuto]].
    *
    * Verification re-joins FULL postings on the (ids-only) candidate
    * set and counts common grams arithmetically, exactly like the
    * plain variant — no false negatives, no array intersections.
    */
  def ngramJaccardPairsPrefix(df: DataFrame, textCol: String, idCol: String,
                              n: Int = 2, minJaccard: Double = 0.5)
  : DataFrame = {
    val inv = shingleRows(df, textCol, idCol, n)
    ngramJaccardFromPostings(inv, minJaccard)
  }

  private[operators] def ngramJaccardFromPostings(inv0: DataFrame,
                                                  minJaccard: Double)
  : DataFrame = {
    // the postings feed a frequency agg, a window pass, and the verify
    // join: evaluate the shingle plan once
    val inv = inv0.localCheckpoint(true)
    val dfreq = inv.groupBy("g").agg(count(lit(1)).as("df"))
    // global total order: (df asc, g) — ties broken by gram text so
    // every doc ranks grams identically (prefix proof requirement)
    val ranked = inv.join(dfreq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("g"))))
    val prefix = ranked.filter(
        col("rk") <= col("n_sh") - ceil(lit(minJaccard) * col("n_sh")) + 1)
      .select("id", "g", "n_sh")
    // candidate ids only; the length filter rides inside the join
    val cand = prefix.alias("l").join(prefix.alias("r"),
        col("l.g") === col("r.g") && col("l.id") < col("r.id") &&
          col("r.n_sh") >= lit(minJaccard) * col("l.n_sh") &&
          col("l.n_sh") >= lit(minJaccard) * col("r.n_sh"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    // arithmetic verify over full postings of candidate pairs
    val common = cand
      .join(inv.select(col("id").as("id_a"), col("g"),
        col("n_sh").as("n_a")), Seq("id_a"))
      .join(inv.select(col("id").as("id_b"), col("g"),
        col("n_sh").as("n_b")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
    common
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Corpus-shape probe behind [[ngramJaccardAuto]]: the plain
    * postings join materializes exactly Σ_g df(g)² pair rows, so
    * estimate that sum against the postings size. A uniform/tiny
    * corpus keeps Σdf² within a small multiple of N; a Zipf head
    * blows it up (hot grams contribute df² each). The probe is one
    * hash-aggregate over the postings — O(N), trivially parallel,
    * worth it whenever it averts a quadratic join.
    *
    * Threshold from the `Profile stress-zipf` measurements: prefix
    * filtering broke even at Σdf²/N ≈ 17, won 1.7× at 31, and lost
    * 1.8× at 10.7 — 16 splits the measured regimes.
    */
  def prefixFilterPays(inv: DataFrame, blowupFactor: Double = 16.0): Boolean = {
    val r = inv.groupBy("g").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df")).as("pairRows"), sum("df").as("n"))
      .head()
    r.getLong(0).toDouble > blowupFactor * r.getLong(1)
  }

  /** Session memo of [[prefixFilterPays]] decisions: the Σdf²/N probe
    * is one postings aggregate — linear but a full corpus pass — and
    * the decision is a pure function of the corpus content, so repeat
    * dispatches on the same immutable input (the steady-state of a
    * pipeline re-running its dedup stage) pay it once. Same
    * content-key contract as [[graft.core.SessionMemo]]; entries are
    * two boxed booleans per (session, corpus), so no eviction hook is
    * needed.
    */
  private val dispatchMemo =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql
      .SparkSession, String), java.lang.Boolean]()

  private def prefixFilterPaysCached(inv: DataFrame,
                                     cacheKey: String): Boolean =
    dispatchMemo.computeIfAbsent((inv.sparkSession, cacheKey),
      _ => prefixFilterPays(inv))

  /** Shape-adaptive exact n-gram Jaccard: probes the gram-frequency
    * skew and dispatches — plain ReuseExchange self-join for
    * uniform/small vocabularies, PPJoin prefix filtering when the
    * head would explode the join. Identical results either way.
    */
  def ngramJaccardAuto(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 2, minJaccard: Double = 0.5,
                       cacheKey: Option[String] = None): DataFrame = {
    val inv = shingleRows(df, textCol, idCol, n)
    val pays = cacheKey.map(k => prefixFilterPaysCached(inv, s"jacc|$k"))
      .getOrElse(prefixFilterPays(inv))
    if (pays) ngramJaccardFromPostings(inv, minJaccard)
    else ngramJaccardPairs(df, textCol, idCol, n, minJaccard)
  }

  /** Random-hyperplane LSH bucket signatures per (table, vector):
    * posexplode the vector once, compute tables×bits signed
    * projections as codegen'd conditional sums, reduce to bucket ids.
    * Returns (id, t, b) — one row per table.
    */
  def hyperplaneBuckets(vecs: DataFrame, bits: Int, tables: Int,
                        seed: Int = 42): DataFrame = {
    val pos = vecs.select(col("id"), posexplode(col("v")).as(Seq("p", "x")))
    val projSums = for (t <- 0 until tables; b <- 0 until bits) yield
      sum(col("x").cast("double") *
        when(xxhash64(lit(seed + t), lit(b), col("p")) % 2 === 0, 1.0)
          .otherwise(-1.0)).as(s"s${t}_$b")
    val agg = pos.groupBy("id").agg(projSums.head, projSums.tail: _*)
    val tableBuckets = (0 until tables).map { t =>
      val bucket = (0 until bits).map(b =>
        when(col(s"s${t}_$b") >= 0, lit(1 << b)).otherwise(lit(0)))
        .reduce(_ + _)
      struct(lit(t).as("t"), bucket.as("b"))
    }
    agg.select(col("id"), explode(array(tableBuckets: _*)).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b"))
  }

  /** Candidate pairs from hyperplane-LSH bucket collisions — ids only,
    * deduplicated across tables. Exposed separately so tests can budget
    * the candidate-set size against the true-pair count (candidate
    * volume, not verification arithmetic, is what blows up when LSH
    * parameters drift recall-biased).
    */
  def hyperplaneCandidatePairs(base: DataFrame, bits: Int,
                               tables: Int): DataFrame = {
    val bucketed = hyperplaneBuckets(base, bits, tables)
    bucketed.alias("l").join(bucketed.alias("r"), Seq("t", "b"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** Embedding near-dup pairs: cosine ≥ threshold; candidates from
    * hyperplane-LSH buckets, exact cosine verification (ids-only
    * candidate shuffle; vectors re-joined for the cosine).
    */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        threshold: Double = 0.95, bits: Int = 8,
                        tables: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val candidates = hyperplaneCandidatePairs(base, bits, tables)

    // exact cosine verification: candidates stay ids-only through the
    // banding, then each side's vector hash-joins back and the native
    // codegen graft_cosine scores in a Project. (The earlier
    // per-dimension posexplode join paid |candidates|·d joined rows —
    // 64M at the q89 wide-recall config — and measured ~6× slower
    // than this shape; the array-HOF cosine runs interpreted and is
    // not the alternative.) No broadcast hint: the vector side is
    // corpus-sized, and Spark/AQE picks broadcast exactly when it
    // fits — the same plan survives a corpus that doesn't.
    candidates
      .join(base.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("cosine", call_function("graft_cosine", col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
