package graft

import org.apache.spark.sql.functions._

import graft.functions.CompressStats
import graft.operators.{FuzzyJoin, Retrieval}

/** Pins the round-5 retrieval/ER/quality additions: BM25 against a
  * hand-computed fixture, DSIR scores against a hand-computed
  * two-LM fixture, blocked fuzzy matching (blocking, band pruning,
  * multiplicity arithmetic, id expansion), and the deflate-ratio
  * quality signal (determinism + orderings the oracle can't check).
  */
class RetrievalFuzzySpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches hand-computed Okapi scores") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple apple apple apple")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, "text", "doc_id", Seq("apple"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // N=3, avgdl=3, df(apple)=2, idf=ln(1.6); d3: tf=4,dl=4 -> 0.7520;
    // d1: tf=2,dl=3 -> 0.6463; d2 has no query term -> absent.
    assert(out.toSeq === Seq((3L, 0.7520, 1L), (1L, 0.6463, 1L)))
  }

  test("dsir scores match hand-computed two-LM log-likelihood ratios") {
    val docs = Seq(
      (1L, "ml ml data", "tgt"),
      (2L, "ml model", "tgt"),
      (3L, "web spam spam", "raw"),
      (4L, "data web", "raw")
    ).toDF("doc_id", "text", "source")
    val out = Retrieval.dsirScores(docs, "text", "doc_id",
        col("source") === "tgt")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // V=5, T_raw=10, T_tgt=5; llr(ml)=llr(model)=ln(1.5),
    // llr(data)=0, llr(web)=llr(spam)=ln(0.5).
    assert(out(1L) === 0.8109)
    assert(out(2L) === 0.8109)
    assert(out(4L) === -0.6931)
    assert(out(3L) === -2.0794)
  }

  test("fuzzy nameMatches: blocking, distance cut, multiplicities") {
    val df = Seq(
      (1L, "red bolt"), (2L, "red bolt"), (3L, "rod bolt"),
      (4L, "blue ring"), (5L, "red ring")
    ).toDF("id", "name")
    val m = FuzzyJoin.nameMatches(df, "name",
        element_at(split(col("name"), " "), -1), maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    // "blue ring" vs "red ring" is lev 3 -> cut; singleton diagonal
    // rows (c=1) are dropped by n_pairs > 0.
    assert(m === Set(
      ("red bolt", "red bolt", 0, 1L),
      ("red bolt", "rod bolt", 1, 2L)))
  }

  test("fuzzyPairs expands value matches to id pairs once each") {
    val df = Seq(
      (1L, "red bolt"), (2L, "red bolt"), (3L, "rod bolt"),
      (4L, "blue ring"), (5L, "red ring")
    ).toDF("id", "name")
    val pairs = FuzzyJoin.fuzzyPairs(df, "id", "name",
        element_at(split(col("name"), " "), -1), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("fuzzy join plans a hash equi-join on the blocking key, not BNL") {
    val df = Seq((1L, "red bolt"), (2L, "rod bolt")).toDF("id", "name")
    val plan = FuzzyJoin.nameMatches(df, "name",
        element_at(split(col("name"), " "), -1), maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("deflate ratio: deterministic, bounded, orders repetitive < prose") {
    import org.apache.spark.unsafe.types.UTF8String
    def ratio(s: String): Double =
      CompressStats.deflateRatio(UTF8String.fromString(s))
    val repetitive = "spam ham " * 200
    val prose = (1 to 100).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")
    assert(ratio(repetitive) === ratio(repetitive)) // deterministic
    assert(ratio(repetitive) < 0.2)
    assert(ratio(prose) > ratio(repetitive))
    assert(ratio("") === 1.0)
    val viaSql = {
      graft.functions.GraftFunctions.ensureRegistered(spark)
      Seq(repetitive).toDF("t")
        .selectExpr("graft_deflate_ratio(t) AS r").head().getDouble(0)
    }
    assert(viaSql === ratio(repetitive)) // codegen path == helper path
  }
}
