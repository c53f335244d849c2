package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Collocations, Dedup}

/** Containment dedup, PMI collocations, nearest join (q112–q114). */
class ContainColloSpec extends SparkSpec {
  import spark.implicits._

  test("containment: detects a whole-quote subset that Jaccard misses") {
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val small = (10 to 17).map(i => s"w$i").mkString(" ") // 8 tokens ⊂ big
    val docs = Seq((1L, big), (2L, small), (3L, "x y z q r s t u"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
      n = 3, minContainment = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(cont === Array((1L, 2L)), "subset pair must be flagged")
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.5).count()
    assert(jac === 0L, "Jaccard must NOT flag the subset (that's the point)")
  }

  test("containment prefix filter equals the plain form (incl. values)") {
    // mixed sizes + a shared-head vocabulary so prefixes actually prune:
    // doc 2 ⊂ doc 1 (whole-quote), doc 4 ≈ doc 1 (same size), doc 3/5
    // unrelated, doc 6 a tiny doc contained in doc 5
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, big),
      (2L, (10 to 17).map(i => s"w$i").mkString(" ")),
      (3L, "x y z q r s t u v"),
      (4L, big + " extra"),
      (5L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"),
      (6L, "p4 p5 p6 p7 p8")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("containment"))).toSet
    for (t <- Seq(0.6, 0.8, 0.95)) {
      val plain = canon(Dedup.ngramContainmentPairs(docs, "text",
        "doc_id", n = 3, minContainment = t))
      val pref = canon(Dedup.ngramContainmentPairsPrefix(docs, "text",
        "doc_id", n = 3, minContainment = t))
      assert(pref === plain, s"divergence at t=$t")
      assert(plain.nonEmpty, s"fixture found no pairs at t=$t")
    }
    // the auto form agrees too (this corpus dispatches to plain)
    val auto = canon(Dedup.ngramContainmentAuto(docs, "text", "doc_id",
      n = 3, minContainment = 0.8))
    assert(auto === canon(Dedup.ngramContainmentPairs(docs, "text",
      "doc_id", n = 3, minContainment = 0.8)))
  }

  test("collocations: hand-computed PMI on a fixed contingency table") {
    // corpus: "a b" ×6, "a c" ×2, "d b" ×2  (each doc = one bigram)
    val docs = (Seq.fill(6)("a b") ++ Seq.fill(2)("a c") ++
      Seq.fill(2)("d b")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Collocations.pmiBigrams(docs, "text", "doc_id",
        minCount = 2L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // N=10, c(a·)=8, c(·b)=8, c(ab)=6 → pmi = ln(60/64)
    assert(out(("a", "b"))._1 === 6L)
    assert(math.abs(out(("a", "b"))._2 -
      BigDecimal(math.log(60.0 / 64.0)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // c(ac)=2, c(a·)=8, c(·c)=2 → pmi = ln(20/16) > 0
    assert(math.abs(out(("a", "c"))._2 -
      BigDecimal(math.log(20.0 / 16.0)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("nearest join: direction choice, tolerance, backward tie-break") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq(
      (1L, 10L, ts(1000)), // errors at 990 (d=10) and 1030 (d=30) → b
      (2L, 10L, ts(2000)), // only a forward error at 2100 → f
      (3L, 10L, ts(5000)), // nearest error 3000s away → no match
      (4L, 20L, ts(100)),  // equal distance 50 both sides → backward
      (5L, 30L, ts(700))   // no errors for user 30 → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts(990)), (102L, 10L, ts(1030)),
      (103L, 10L, ts(2100)),
      (104L, 10L, ts(8000)),
      (105L, 20L, ts(50)), (106L, 20L, ts(150))
    ).toDF("err_id", "user_id", "ts")
    val out = AsOfJoin.nearest(left, right, "user_id", "ts", "ts",
        "err_id", toleranceSec = 1800L)
      .select($"event_id", $"nearest_id", $"dist_sec", $"direction")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.getString(3)))).sortBy(_._1)
    assert(out(0) === ((1L, Some(101L), Some(10L), Some("b"))))
    assert(out(1) === ((2L, Some(103L), Some(100L), Some("f"))))
    assert(out(2) === ((3L, None, None, None)))
    assert(out(3) === ((4L, Some(105L), Some(50L), Some("b"))))
    assert(out(4) === ((5L, None, None, None)))
  }
}
