package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "completely different text about spark query engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (5L, "spark engines process distributed data with shuffles and joins"),
    (6L, "an unrelated short sentence")
  ).toDF("doc_id", "text")

  test("shingleRows handles leading/irregular whitespace (gap positions)") {
    val docs = Seq(
      (1L, "  a b c  d"),   // leading + double spaces
      (2L, " hi"),          // short doc, leading space
      (3L, "a b c d")).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.shingleRows(docs, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(rows(1L) === Set("a b", "b c", "c d")) // no dropped shingles
    assert(rows(2L) === Set("hi"))                // whole-doc shingle kept
    assert(rows(1L) === rows(3L))                 // whitespace-insensitive
  }

  test("exact dedup keeps smallest id per identical text") {
    val out = Dedup.exact(corpus, "text", "doc_id")
    assert(out.count() === 5)
    assert(out.filter($"doc_id" === 4L).count() === 0)
    assert(out.filter($"doc_id" === 1L).count() === 1)
  }

  test("minhash LSH finds planted near-dup and exact-dup pairs, not unrelated") {
    val pairs = Dedup.minhashNearDups(corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      s"near-dup pair not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L && p._1 != 5L))
  }

  test("minhash jaccard values are exact (verified), not estimates") {
    val out = Dedup.minhashNearDups(corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.95)
    val exact = out.filter($"id_a" === 1L && $"id_b" === 4L).head()
    assert(exact.getAs[Double]("jaccard") === 1.0)
  }

  test("incremental near-dups equal the full pair set restricted to cross-set") {
    val batch = corpus.filter($"doc_id" % 2 === 0) // 2, 4, 6
    val indexed = corpus.filter($"doc_id" % 2 =!= 0) // 1, 3, 5
    val inc = Dedup.incrementalNearDups(indexed, batch, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ground truth: the full pair graph, restricted to one-side-each,
    // reoriented so the corpus (odd) id leads
    val full = Dedup.minhashNearDups(corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => (p._1 % 2 == 0) != (p._2 % 2 == 0))
      .map(p => if (p._1 % 2 != 0) p else (p._2, p._1, p._3)).toSet
    assert(inc === full)
    assert(inc.nonEmpty) // the planted (1, 2) and (1, 4) pairs cross the split
    assert(inc.forall { case (c, b, _) => c % 2 != 0 && b % 2 == 0 })
  }

  test("simhash: identical docs hamming 0; near-dups small distance; pairs found") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sh = corpus.select($"doc_id",
      Dedup.simhash(TextFunctions.tokens($"text")).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) <= 8, s"near-dup hamming ${ham(sh(1L), sh(2L))}")
    assert(ham(sh(1L), sh(3L)) > 8, "unrelated docs too close")

    val pairs = Dedup.simhashNearDups(corpus, "text", "doc_id", maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("ngram jaccard pairs: inverted-index join matches brute-force jaccard") {
    val out = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      n = 2, minJaccard = 0.3)
    val m = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(m((1L, 4L)) === 1.0)
    // brute force check for (1,2): 12 bigrams each, 10 shared
    val bi = (s: String) => s.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val (a, b) = (bi("the quick brown fox jumps over the lazy dog near the river bank"),
      bi("the quick brown fox jumps over the lazy dog near the river bend"))
    val expected = a.intersect(b).size.toDouble / a.union(b).size
    assert(math.abs(m((1L, 2L)) - expected) < 1e-3)
  }

  test("prefix-filtered (PPJoin) jaccard returns EXACTLY the plain " +
    "variant's pairs; the shape probe dispatches by skew") {
    val plain = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      n = 2, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.ngramJaccardPairsPrefix(corpus, "text", "doc_id",
      n = 2, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref === plain, "prefix filtering changed the exact result")
    val auto = Dedup.ngramJaccardAuto(corpus, "text", "doc_id",
      n = 2, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto === plain)

    // shape probe: uniform tiny corpus -> plain; a corpus with a hot
    // head gram in every doc -> prefix (sum df^2 blows up vs N)
    val uniformInv = Dedup.shingleRows(corpus, "text", "doc_id", 2)
    assert(!Dedup.prefixFilterPays(uniformInv),
      "probe chose prefix filtering on the uniform fixture")
    val hot = (1L to 200L).map(i => (i, s"the same hot head u$i v$i"))
      .toDF("doc_id", "text")
    val hotInv = Dedup.shingleRows(hot, "text", "doc_id", 2)
    assert(Dedup.prefixFilterPays(hotInv),
      "probe kept the plain join on a degenerate hot-gram corpus")
  }

  test("embedding near-dups: planted duplicate vector found via LSH buckets") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, -0.2f)),
      (2L, Array(0.99f, 0.01f, 0.49f, -0.21f)), // near-dup of 1
      (3L, Array(-1.0f, 0.3f, -0.5f, 0.8f)),
      (4L, Array(0.0f, 1.0f, -0.7f, 0.1f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "embedding", "vec_id",
      threshold = 0.95, bits = 2, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("hyperplane LSH at production params: high recall on planted " +
    "correlations, candidate volume within budget") {
    // deterministic planted-correlation corpus: 300 random unit-ish
    // vectors + 20 strongly-correlated near-dup partners (cos ≥ ~0.95)
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = (0L until 300L).map(i => (i, vec()))
    val planted = (0 until 20).map { k =>
      val (srcId, v) = base(k * 7)
      val noisy = v.map(x => x + (rnd.nextDouble() * 0.06 - 0.03).toFloat)
      (1000L + k, noisy, srcId)
    }
    val vecs = (base ++ planted.map(p => (p._1, p._2))).toDF("vec_id", "embedding")

    val prodBits = 7
    val prodTables = 4
    val found = Dedup.embeddingNearDups(vecs, "embedding", "vec_id",
      threshold = 0.9, bits = prodBits, tables = prodTables)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedPairs = planted.map(p => (p._3, p._1)).toSet
    val recall = plantedPairs.count(found.contains).toDouble / plantedPairs.size
    assert(recall >= 0.8,
      s"recall $recall below 0.8 — LSH params drifted precision-biased")

    // candidate budget: the cost driver at scale is candidate volume;
    // recall-biased params (too few bits) explode it quadratically.
    // On a corpus with ~20 true pairs the candidate set must stay a
    // small multiple of N, not approach N²/2 (~51k here).
    val nVecs = 320L
    val candidates = Dedup.hyperplaneCandidatePairs(
      vecs.select($"vec_id".as("id"), $"embedding".as("v")),
      prodBits, prodTables).count()
    assert(candidates <= 20L * nVecs,
      s"candidate set $candidates exceeds budget ${20L * nVecs}")
  }

  test("line dedup: cross-doc boilerplate dropped everywhere, unique " +
    "and blank lines kept in order, within-doc repeats survive, " +
    "fully-boilerplate doc yields empty text") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nalpha beta\n\ngamma delta\nCOOKIE BANNER"),
      (2L, "COOKIE BANNER\nepsilon zeta"),
      (3L, "COOKIE BANNER"),
      (4L, "eta theta\neta theta\niota"), // within-doc repeat only
      (5L, "lone doc with one line")
    ).toDF("doc_id", "text")
    val out = graft.operators.LineDedup
      .dedupLines(docs, "doc_id", "text", maxDocs = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

    // doc 1: banner (2 occurrences) dropped, blank line kept verbatim
    assert(out(1L) === (("alpha beta\n\ngamma delta", 5L, 2L)))
    assert(out(2L) === (("epsilon zeta", 2L, 1L)))
    // all lines boilerplate -> empty text, every input doc present
    assert(out(3L) === (("", 1L, 1L)))
    // within-doc repetition is 1 distinct doc -> kept both times
    assert(out(4L) === (("eta theta\neta theta\niota", 3L, 0L)))
    assert(out(5L) === (("lone doc with one line", 1L, 0L)))
  }

  test("line dedup: maxDocs threshold and minLineLen eligibility") {
    val docs = Seq(
      (1L, "shared pair\nx"), (2L, "shared pair\ny"),
      (3L, "x"), (4L, "x")   // 'x' is below minLineLen 2 -> ineligible
    ).toDF("doc_id", "text")
    val out = graft.operators.LineDedup
      .dedupLines(docs, "doc_id", "text", maxDocs = 2, minLineLen = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'shared pair' occurs in 2 docs = maxDocs -> kept
    assert(out(1L) === "shared pair\nx")
    // 'x' occurs in 3 docs but is ineligible (too short) -> kept
    assert(out(3L) === "x" && out(4L) === "x")
  }
}
