package graft

import graft.operators.{Decontam, TextStats}
import org.apache.spark.sql.functions._

/** Algebraic identities of the corpus text-stats operators — the
  * SQL-free consistency checks beside the q72/q278-q280 oracles:
  * the multi-suite matrix must equal the union of per-suite overlap
  * runs, novelty must conserve the corpus vocabulary, and the Heaps
  * curve's final point must equal the whole-corpus totals.
  */
class DecontamTextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta", "iota", "kappa")
    (0 until n).map { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(6))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("matrix decontamination equals the union of per-suite overlaps") {
    val docs = mkDocs(7, 40)
    val corpus = docs.filter($"doc_id" >= 9)
    val suites = docs.filter($"doc_id" < 9)
      .withColumn("suite", $"doc_id" % 3)
    val viaMatrix = Decontam.matrix(corpus, suites, "text", "doc_id",
      "suite", n = 3)
      .select("doc_id", "suite", "n_shared_grams", "first_bench_hit")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val viaLoop = (0L until 3L).flatMap { s =>
      Decontam.overlap(corpus, suites.filter($"suite" === s),
        "text", "doc_id", n = 3)
        .collect().map(r => (r.getAs[Long]("doc_id"), s) ->
          (r.getAs[Long]("n_shared_grams"),
            r.getAs[Long]("first_bench_hit")))
    }.toMap
    assert(viaMatrix === viaLoop,
      "one-pass matrix must equal the per-suite-sequential runs")
    assert(viaMatrix.nonEmpty, "fixture produced no overlap at all")
  }

  test("novelty conserves the vocabulary: sum of per-doc novel grams " +
    "equals the corpus's distinct gram count") {
    val docs = mkDocs(11, 30)
    val nov = TextStats.noveltyByDoc(docs, "text", "doc_id", n = 3)
    val totalNovel = nov.agg(sum("n_novel")).head().getLong(0)
    val distinctGrams = graft.operators.Dedup
      .shingleRowsRaw(docs, "text", "doc_id", 3)
      .select("g").distinct().count()
    assert(totalNovel === distinctGrams,
      "every distinct gram is novel in exactly one document")
    // the first document's grams are all novel
    val firstDoc = nov.filter($"doc_id" === 0L).head()
    assert(firstDoc.getAs[Long]("n_novel") ===
      firstDoc.getAs[Long]("n_grams"))
  }

  test("heaps curve's last checkpoint equals whole-corpus totals and " +
    "both cumulative columns are monotone") {
    val docs = mkDocs(13, 35)
    val curve = TextStats.heapsCurve(docs, "text", "doc_id",
      checkpointDocs = 10).orderBy("checkpoint_docs").collect()
    val toks = docs.select(explode(
      graft.functions.TextFunctions.wordTokens($"text")).as("t"))
    assert(curve.last.getAs[Long]("toks_cum") === toks.count())
    assert(curve.last.getAs[Long]("vocab_cum") ===
      toks.distinct().count())
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("toks_cum") <= b.getAs[Long]("toks_cum"))
      assert(a.getAs[Long]("vocab_cum") <= b.getAs[Long]("vocab_cum"))
    case _ => ()
    }
  }
}
