package graft

import org.apache.spark.sql.functions._
import graft.operators.ErrorBounds

/** The bound-gate queries (q84–q89) are graded by the driver's oracle
  * compare; this spec pins the gate LOGIC itself — that each check
  * actually fails when the property it claims to verify is violated,
  * not just that it passes on good inputs.
  */
class ErrorBoundsSpec extends SparkSpec {
  import spark.implicits._

  test("tdigestRankBound: uniform data passes at tol 2%, and an " +
    "impossible tolerance fails") {
    val df = (1 to 2000).map(i => ("g", i / 20.0)).toDF("grp", "v")
    val ok = ErrorBounds.tdigestRankBound(df, "grp", "v", Seq(0.5, 0.95))
      .collect().head
    assert(ok.getAs[Long]("n_rows") === 2000L)
    assert(ok.getAs[Boolean]("p50_rank_ok") && ok.getAs[Boolean]("p95_rank_ok"))
    // negative tolerance demands P[x ≤ est] ≥ q+1% AND P[x < est] ≤
    // q-1% simultaneously — impossible unless ≥2% of the mass sits
    // exactly at the estimate, which distinct values rule out. If this
    // "passes", the gate is vacuous.
    val strict = ErrorBounds.tdigestRankBound(df, "grp", "v", Seq(0.5),
      tol = -0.01).collect().head
    assert(!strict.getAs[Boolean]("p50_rank_ok"),
      "impossible tolerance passed — the check is vacuous")
  }

  test("annRecallGate: counts hits correctly and full-budget " +
    "divergence trips the exact flag") {
    val exact = Seq((0L, 10L), (0L, 11L), (1L, 20L), (1L, 21L))
      .toDF("qid", "neighbor_id")
    val pruned = Seq((0L, 10L), (0L, 99L), (1L, 20L), (1L, 21L))
      .toDF("qid", "neighbor_id") // 3 of 4 hits = 0.75 avg recall
    val r1 = ErrorBounds.annRecallGate(pruned, exact, exact,
      k = 2, minAvgRecall = 0.7).collect().head
    assert(r1.getAs[Long]("n_queries") === 2L)
    assert(r1.getAs[Boolean]("recall_ok"))
    assert(r1.getAs[Boolean]("full_budget_exact"))
    val r2 = ErrorBounds.annRecallGate(pruned, pruned, exact,
      k = 2, minAvgRecall = 0.8).collect().head
    assert(!r2.getAs[Boolean]("recall_ok"), "0.75 cleared a 0.8 floor")
    assert(!r2.getAs[Boolean]("full_budget_exact"),
      "a diverging full-budget result passed the exactness gate")
  }

  test("lshCosineRecall: identical vectors are always found (same " +
    "buckets in every table), and the exact pair count is right") {
    // 4 copies of one direction + 4 of an orthogonal one: exact pairs
    // at threshold 0.9 = the 6+6 within-group pairs, all cosine 1.0
    val v1 = Array.fill(16)(1.0f)
    val v2 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = ((0 until 4).map(i => (i.toLong, v1)) ++
      (4 until 8).map(i => (i.toLong, v2))).toDF("vec_id", "embedding")
    val r = ErrorBounds.lshCosineRecall(df, "embedding", "vec_id",
      threshold = 0.9, bits = 4, tables = 2, minRecall = 0.99)
      .collect().head
    assert(r.getAs[Long]("n_exact_pairs") === 12L)
    assert(r.getAs[Boolean]("recall_ok"),
      "identical vectors missed by LSH — bucketing is broken")
  }

  test("exactCosinePairs: cluster-pruned pair set IDENTICAL to the " +
    "quadratic definition on the real corpus, at loose and tight " +
    "thresholds") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def brute(threshold: Double): Set[(Long, Long)] = {
      val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val ids = base.select(col("id"))
      ids.select(col("id").as("id_a"))
        .crossJoin(ids.select(col("id").as("id_b")))
        .filter(col("id_a") < col("id_b"))
        .join(base.select(col("id").as("id_a"), col("v").as("va")), "id_a")
        .join(base.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
        .withColumn("cosine",
          round(call_function("graft_cosine", col("va"), col("vb")), 4))
        .filter(col("cosine") >= threshold)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // 0.4 is the q89 operating point (66 true pairs at sf0.001); 0.3
    // widens the set so the prune faces a denser frontier. 0.5+ has
    // zero pairs in this corpus — an empty-set compare proves nothing.
    Seq(0.3, 0.4).foreach { t =>
      val pruned = graft.operators.Similarity
        .exactCosinePairs(emb, "embedding", "vec_id", t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = brute(t)
      assert(exact.nonEmpty, s"fixture has no pairs at $t — test is vacuous")
      assert(pruned === exact,
        s"threshold $t: pruning changed the exact pair set " +
          s"(missing ${(exact -- pruned).take(3)}, " +
          s"extra ${(pruned -- exact).take(3)})")
    }
  }
}
