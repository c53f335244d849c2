package graft

import org.apache.spark.sql.functions._
import graft.functions.{BpeEncode, BpeMergeTable, GraftFunctions}
import org.apache.spark.unsafe.types.UTF8String

class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(text: String, merges: (String, String)*): Seq[String] = {
    val arr = BpeEncode.encode(UTF8String.fromString(text),
      new BpeMergeTable(merges))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("Sennrich worked example: lowest-rank pair merges first, " +
    "merges cascade") {
    // merges learned from a {low, lower, newest, widest}-style corpus
    assert(enc("lowest",
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")) ===
      Seq("low", "est"))
  }

  test("min-rank LOOP semantics: a later merge can create an " +
    "earlier-rank pair, which a rank-order sweep would miss") {
    // rank 1 = (a, bc), rank 2 = (b, c). Sweep: (a,bc) absent in
    // [a,b,c] when visited → result [a, bc]. Min-rank loop: (b,c)
    // merges first, THEN (a,bc) applies → [abc].
    assert(enc("abc", ("a", "bc"), ("b", "c")) === Seq("abc"))
  }

  test("greedy left-to-right within one pair; disjoint occurrences " +
    "merge in one round") {
    assert(enc("aaa", ("a", "a")) === Seq("aa", "a"))
    assert(enc("abab", ("a", "b")) === Seq("ab", "ab"))
  }

  test("multiple words, unknown characters pass through, " +
    "whitespace/case folding") {
    assert(enc("TH E  th", ("t", "h")) === Seq("th", "e", "th"))
    assert(enc("x!z") === Seq("x", "!", "z"))
    assert(enc("") === Seq.empty)
  }

  test("SQL surface: literal merge array required; codegen path " +
    "equals interpreted eval") {
    GraftFunctions.ensureRegistered(spark)
    val rows = Seq("lowest", "low").toDF("t")
      .selectExpr("graft_bpe_encode(t, array('e s','es t','l o','lo w')) AS s")
      .collect().map(_.getSeq[String](0).toList)
    assert(rows.toList === List(List("low", "est"), List("low")))
    val err = intercept[Exception] {
      Seq(("a", "b c")).toDF("t", "m")
        .selectExpr("graft_bpe_encode(t, array(m))").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("agrees with BpeVocab.applyMerges on sweep-safe merge lists " +
    "(each merge's parts exist before later ranks)") {
    GraftFunctions.ensureRegistered(spark)
    val words = Seq("lowest", "lower", "newest", "widest", "low")
      .toDF("w")
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val sweep = graft.operators.BpeVocab.applyMerges(words, "w", merges)
      .select("subwords").collect().map(_.getSeq[String](0).toList)
    val loop = words.selectExpr(
      "graft_bpe_encode(w, array('e s','es t','l o','lo w')) AS s")
      .collect().map(_.getSeq[String](0).toList)
    assert(sweep.toList === loop.toList)
  }
}
