package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Independent JVM reimplementation of the scoring contract
    * (java.security MessageDigest, not Spark SQL): bucket =
    * int(md5(gram)[0:4], 16) % dim, weight = int(md5("w:"+b)[0:4],
    * 16) % 17 - 8, score = Σ weights over adjacent bigrams.
    */
  private def md5Hex4(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(2).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  private def refScore(text: String, dim: Int = 4096): (Long, Long) = {
    val ts = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val grams = ts.dropRight(1).zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
    val score = grams.map { g =>
      val b = md5Hex4(g) % dim
      md5Hex4(s"w:$b") % 17 - 8
    }.sum
    (grams.length.toLong, score)
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  spark   engines  process distributed data "), // ragged spaces
    (3L, "single"),                                       // 1 token → 0 grams
    (4L, ""),                                             // empty → 0 grams
    (5L, "The Quick BROWN fox")                           // case-folded
  ).toDF("doc_id", "text")

  test("score matches an independent MessageDigest reimplementation") {
    val got = QualityClassifier.score(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((id, text) <- Seq(1L -> "the quick brown fox jumps over the lazy dog",
                           2L -> "  spark   engines  process distributed data ",
                           3L -> "single", 4L -> "",
                           5L -> "The Quick BROWN fox")) {
      val (nGrams, score) = refScore(text)
      assert(got(id) === ((nGrams, score, if (score > 0) 1L else 0L)),
        s"doc $id")
    }
  }

  test("case-insensitive: same grams ⇒ same score") {
    val got = QualityClassifier.score(docs, "text", "doc_id")
      .filter(col("doc_id").isin(1L, 5L)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (_, s5lower) = refScore("the quick brown fox")
    assert(got(5L) === s5lower)
  }

  test("zero-gram docs score 0 with label 0") {
    val got = QualityClassifier.score(docs, "text", "doc_id")
      .filter(col("doc_id").isin(3L, 4L))
      .select("n_grams", "score", "label").collect()
    assert(got.forall(r =>
      r.getLong(0) === 0L && r.getLong(1) === 0L && r.getLong(2) === 0L))
  }

  test("score is bounded by ±8·n_grams (weight range invariant)") {
    val all = QualityClassifier.score(docs, "text", "doc_id").collect()
    assert(all.forall(r => math.abs(r.getLong(2)) <= 8 * r.getLong(1)))
  }

  test("inference plan is map-only (no shuffle exchange)") {
    val plan = QualityClassifier.score(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("graft_md5i ≡ conv(substr(md5(x),1,n),16,10) for n in 1..15") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val strs = ("" +: "w:0" +: (1 to 200).map(i => s"tok$i gram$i")).toDF("s")
    for (n <- Seq(1, 4, 8, 12, 15)) {
      val bad = strs.select(
          call_function("graft_md5i", col("s"), lit(n)).as("native"),
          expr(s"cast(conv(substr(md5(s), 1, $n), 16, 10) as bigint)")
            .as("idiom"))
        .filter(col("native") =!= col("idiom")).count()
      assert(bad === 0L, s"nibbles=$n")
    }
  }

  test("graft_md5i offset form ≡ conv(substr(md5(x),o+1,n),16,10)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val strs = (1 to 200).map(i => s"tok$i").toDF("s")
    for ((n, o) <- Seq((8, 8), (4, 12), (12, 20), (1, 31))) {
      val bad = strs.select(
          call_function("graft_md5i", col("s"), lit(n), lit(o)).as("native"),
          expr(s"cast(conv(substr(md5(s), ${o + 1}, $n), 16, 10) as bigint)")
            .as("idiom"))
        .filter(col("native") =!= col("idiom")).count()
      assert(bad === 0L, s"nibbles=$n offset=$o")
    }
  }

  test("fast (xxhash64) variant: same shape, deterministic, bounded") {
    val a = QualityClassifier.score(docs, "text", "doc_id",
      replayable = false).collect().sortBy(_.getLong(0))
    val b = QualityClassifier.score(docs, "text", "doc_id",
      replayable = false).collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // same n_grams as the replayable path (tokenization is shared)
    val md5 = QualityClassifier.score(docs, "text", "doc_id")
      .collect().sortBy(_.getLong(0))
    assert(a.map(_.getLong(1)).toSeq === md5.map(_.getLong(1)).toSeq)
    assert(a.forall(r => math.abs(r.getLong(2)) <= 8 * r.getLong(1)))
    val plan = QualityClassifier.score(docs, "text", "doc_id",
      replayable = false).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
