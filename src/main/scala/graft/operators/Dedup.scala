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
  *    verified Jaccard. The bucket join is the scale path: candidate
  *    pairs come from equal band-hashes, never from an O(N²) cross
  *    join; at 100 TB the band-bucket shuffle is linear in corpus size
  *    and bucket skew is bounded by band width.
  *  - SimHash: 64-bit sign-aggregated fingerprint; near-dups = small
  *    Hamming distance, found by exact-match on rotated chunks
  *    (pigeonhole: d ≤ k ⟹ some ⌈64/(k+1)⌉-bit chunk matches exactly).
  *  - n-gram Jaccard: exact verified similarity on candidate pairs.
  *  - embedding cosine: near-dup pairs above a cosine threshold, with
  *    hyperplane-LSH bucketing as the candidate generator.
  *
  * Everything is pure DataFrame/higher-order-function Spark — no UDFs,
  * no driver-side loops; every stage is a shuffle-bounded distributed
  * job.
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

  /** MinHash signature: for hash function i (0..numHashes-1),
    * sig[i] = min over shingles of xxhash64(shingle, i). Computed with
    * nested higher-order functions — one pass per row, no explode of
    * the shingle set through a shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** LSH band hashes: split the signature into `bands` rows of width
    * numHashes/bands; docs sharing ANY band hash become candidates.
    */
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
    val rowsPerBand = numHashes / bands
    val base = df.select(
      col(idCol).as("id"),
      TextFunctions.wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // candidate generation: explode band hashes, join within buckets
    val banded = base.select(col("id"), col("sh"),
        explode(bandHashes(col("sig"), bands, rowsPerBand)).as("bh"))
      .select(col("id"), col("sh"), col("bh.band").as("band"), col("bh.h").as("h"))
    val l = banded.select(col("band"), col("h"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("h"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = l.join(r, Seq("band", "h"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    // exact-Jaccard verification on the candidates only
    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over tokens: bit b is the sign of Σ±1 across token
    * hashes (+1 if token's bit b set, else −1).
    */
  def simhash(tokens: Column): Column = {
    // NB: the Scala DSL's shiftright/shiftleft only take literal Int
    // shift amounts; the Catalyst SQL functions accept column shifts.
    val bitSums = transform(sequence(lit(0), lit(63)),
      b => aggregate(tokens, lit(0),
        (acc, t) => acc +
          when(call_function("shiftright", xxhash64(t), b.cast("int"))
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
    * Candidates via the pigeonhole chunk trick: split 64 bits into
    * (maxDistance+1) chunks; any pair within distance must share one
    * chunk exactly. Chunk-equality is a hash-join, not a cross join.
    */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val chunkBits = 64 / chunks
    val base = df.select(col(idCol).as("id"),
      simhash(TextFunctions.tokens(col(textCol))).as("sh"))
    val chunked = base.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(chunks - 1)),
        c => struct(c.as("c"),
          call_function("shiftright", col("sh"), (c * chunkBits).cast("int"))
            .bitwiseAND((1L << chunkBits) - 1).as("v")))).as("ch"))
      .select(col("id"), col("sh"), col("ch.c").as("c"), col("ch.v").as("v"))
    val l = chunked.select(col("c"), col("v"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = chunked.select(col("c"), col("v"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("c", "v"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingDistance(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxDistance)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for candidate pairs sharing at
    * least `minCommon` n-grams (inverted-index join: explode n-grams,
    * join on the n-gram, count shared — linear shuffle, no cross join).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2, minJaccard: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      TextFunctions.wordShingles(col(textCol), n).as("ng"))
      .filter(size(col("ng")) > 0)
    val inv = base.select(col("id"), col("ng"), explode(col("ng")).as("g"))
    val shared = inv.select(col("g"), col("id").as("id_a"))
      .join(inv.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    val sizes = base.select(col("id"), size(col("ng")).as("n_ng"))
    shared
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_ng", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_ng", "n_b"), "id_b")
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold. Candidates from
    * hyperplane-LSH buckets (multi-probe via several independent
    * bucketings to keep recall); exact cosine verification.
    */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        threshold: Double = 0.95, bits: Int = 8,
                        tables: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bucketed = base.select(col("id"), col("v"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          VectorFunctions.hyperplaneBucket(col("v"), bits, seed = 42 + t)
            .as("b"))): _*)).as("tb"))
      .select(col("id"), col("v"), col("tb.t").as("t"), col("tb.b").as("b"))
    val l = bucketed.select(col("t"), col("b"), col("id").as("id_a"), col("v").as("v_a"))
    val r = bucketed.select(col("t"), col("b"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("t", "b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
