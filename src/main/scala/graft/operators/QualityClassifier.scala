package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality-classifier INFERENCE over hashed n-gram features —
  * the fastText / "quality filter" shape every LLM-corpus pipeline
  * runs at full scale (CCNet's LM filter, GPT-3's WebText-vs-Common-
  * Crawl logistic classifier, Llama's wiki-reference classifier all
  * reduce to this at serving time): featurize each document into a
  * bag of hashed word-bigrams (feature hashing, Weinberger et al.
  * 2009 — a FIXED dimensionality `dim` regardless of vocabulary, so
  * the weight vector is a constant-size array and NO vocabulary
  * dictionary exists to build, broadcast, or go stale), look each
  * bucket's weight up, sum, threshold.
  *
  * Physical shape (what matters at 100 TB): inference is ONE
  * map-only pass — split → adjacent-bigram transform → per-gram
  * bucket hash → weight → sum, all built-in higher-order functions
  * on a codegen path, zero UDFs, zero shuffles, zero broadcast
  * state. Scoring 100 TB is embarrassingly parallel and reads each
  * document exactly once; the classifier adds nothing to the shuffle
  * plan of whatever query consumes the score.
  *
  * The weight table here is deterministic (bucket b's weight derives
  * from md5("w:" + b), mapped to an INTEGER in [-8, 8]) rather than
  * trained: training is a one-off offline step (a logistic fit over
  * a labeled sample, e.g. via L-BFGS on a driver-sized design
  * matrix), while the engine-side contract this operator pins is the
  * inference plan and its exact integer arithmetic. Integer weights
  * make the document score an exact BIGINT — no IEEE sum-order
  * drift, so the result hash-matches any engine that replays the
  * same md5 arithmetic (the DuckDB oracle does, q225).
  */
object QualityClassifier {

  /** First `hexChars` hex digits of md5(`c`) as a non-negative long
    * (4 hex chars → [0, 65535]) — the native `graft_md5i` expression,
    * bit-identical to `cast(conv(substr(md5(c),1,n),16,10) as bigint)`
    * (the form the oracle replays) without the hex-string round-trip.
    */
  private def md5Int(c: Column, hexChars: Int): Column =
    call_function("graft_md5i", c, lit(hexChars))

  /** Feature-hash bucket in [0, dim) for one gram. */
  private def bucket(gram: Column, dim: Int): Column =
    md5Int(gram, 4) % dim

  /** Deterministic integer weight in [-8, 8] for bucket `b` —
    * stands in for a trained weight vector; same derivation is
    * replayed verbatim by the SQL oracle.
    */
  private def weight(b: Column): Column =
    md5Int(concat(lit("w:"), b.cast("string")), 4) % 17 - 8

  /** Score every document: (doc_id, n_grams, score, label).
    * `score` = Σ over adjacent word-bigrams of
    * weight(bucket(bigram)); `label` = 1 iff score > 0. Exact
    * integers end-to-end. `dim` must be ≤ 65536 (the bucket hash is
    * 16 bits wide).
    *
    * `replayable = true` (default) derives hashes from md5 so any
    * engine can replay the exact scores (the q225 oracle contract).
    * `replayable = false` swaps in `xxhash64` — same model class and
    * plan shape, ~6× cheaper per gram (md5 is the dominant inference
    * cost: 2 digests per bigram; see `Profile stress-classify`) —
    * for production scoring where cross-engine replay isn't needed.
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
            dim: Int = 4096, replayable: Boolean = true,
            keep: Seq[String] = Nil): DataFrame = {
    require(dim > 0 && dim <= 65536, s"dim must be in (0, 65536]: $dim")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    def bucketOf(g: Column): Column =
      if (replayable) bucket(g, dim) else pmod(xxhash64(g), lit(dim))
    def weightOf(b: Column): Column =
      if (replayable) weight(b)
      else pmod(xxhash64(concat(lit("w:"), b.cast("string"))), lit(17)) - 8
    val ts = filter(split(lower(col(textCol)), "\\s+"), t => t =!= lit(""))
    // adjacent bigrams: slice to the first n-1 tokens, pair each with
    // its successor (SQL array indexing is 0-based; transform's i is
    // the index within the slice, so ts[i+1] is the successor)
    docs
      .withColumn("ts", ts)
      .withColumn("grams", expr(
        "transform(slice(ts, 1, greatest(size(ts) - 1, 0)), " +
          "(t, i) -> concat(t, ' ', ts[i + 1]))"))
      .select(Seq(
        col(idCol).as("doc_id"),
        greatest(size(col("ts")) - 1, lit(0)).cast("long").as("n_grams"),
        aggregate(col("grams"), lit(0L),
          (acc, g) => acc + weightOf(bucketOf(g))).as("score")) ++
        keep.map(col): _*)
      .withColumn("label", (col("score") > 0).cast("long"))
  }
}
