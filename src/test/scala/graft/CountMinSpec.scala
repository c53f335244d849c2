package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.ensureRegistered(spark)

  private def sketch(df: org.apache.spark.sql.DataFrame, col_ : String,
                     depth: Int, width: Int) =
    df.agg(call_function("graft_count_min",
      xxhash64(col(col_)), lit(depth), lit(width)).as("sk"))

  private lazy val toks = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(explode(split(lower($"text"), "\\s+")).as("token"))
    .filter($"token" =!= "")

  test("one-sided error: estimate >= exact always, <= exact + eps*N " +
    "at adversarially small width") {
    val depth = 4
    val width = 16 // far fewer buckets than distinct tokens: collisions certain
    val n = toks.count()
    val est = toks.distinct()
      .crossJoin(broadcast(sketch(toks, "token", depth, width)))
      .select($"token", call_function("graft_cm_estimate",
        $"sk", xxhash64($"token"), lit(depth), lit(width)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    val eps = 2.0 / width
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"CM underestimated $t: ${est(t)} < $c")
      assert(est(t) <= c + (eps * n).toLong,
        s"CM overestimate for $t beyond eps*N: ${est(t)} vs $c + ${eps * n}")
    }
    // collisions MUST be happening at width 16, or the bound test is vacuous
    assert(exact.exists { case (t, c) => est(t) > c },
      "expected at least one collision at width 16")
  }

  test("merge is partitioning-invariant: identical sketch under " +
    "1-partition and many-partition aggregation") {
    val a = sketch(toks.repartition(1), "token", 4, 64)
      .head().getSeq[Long](0)
    val b = sketch(toks.repartition(7), "token", 4, 64)
      .head().getSeq[Long](0)
    assert(a === b)
    // self-describing [depth, width] header leads the emitted array
    assert(a.take(2) === Seq(4L, 64L))
    // total mass per row = N (every increment lands once per row)
    val n = toks.count()
    val h = graft.functions.CountMin.HeaderLen
    (0 until 4).foreach { d =>
      assert(a.slice(h + d * 64, h + (d + 1) * 64).sum === n)
    }
  }

  test("at generous width the estimate is exact (q61's regime)") {
    val depth = 4
    val width = 1024
    val est = toks.distinct()
      .crossJoin(broadcast(sketch(toks, "token", depth, width)))
      .select($"token", call_function("graft_cm_estimate",
        $"sk", xxhash64($"token"), lit(depth), lit(width)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === exact)
  }

  test("graft_cm_estimate generates compilable code (no silent " +
    "interpreted fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = toks.limit(50).distinct()
        .crossJoin(broadcast(sketch(toks, "token", 4, 64)))
        .select(call_function("graft_cm_estimate",
          $"sk", xxhash64($"token"), lit(4), lit(64)).as("est"))
        .collect()
      assert(out.nonEmpty && out.forall(_.getLong(0) >= 1L))
    } finally prev.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
      spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("bloom-pruned join: result identical to the plain join, big " +
    "side genuinely pruned, no false negatives") {
    val lineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val small = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .filter($"o_totalprice" > 250000)
      .select("o_orderkey", "o_orderstatus")

    val plain = lineitem.join(small, $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pruned = graft.operators.BloomJoin.prunedJoin(
        lineitem, small, "l_orderkey", "o_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pruned === plain)

    // the membership filter must actually drop rows (selective small
    // side) while keeping every true match
    val surviving = graft.operators.BloomJoin.pruneByMembership(
      lineitem, "l_orderkey", small, "o_orderkey").count()
    val trueMatches = lineitem
      .join(small, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    assert(surviving < lineitem.count(), "filter pruned nothing")
    assert(surviving >= trueMatches, "false negative: true match dropped")
  }

  test("probe with mismatched (depth, width) fails loudly, not with " +
    "silent garbage") {
    val sk = sketch(toks, "token", 4, 64)
    val bad = toks.limit(5).distinct()
      .crossJoin(broadcast(sk))
      .select(call_function("graft_cm_estimate",
        $"sk", xxhash64($"token"), lit(4), lit(128)).as("est"))
    val e = intercept[Exception] { bad.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("depth*width")),
      s"expected a shape-mismatch error, got: ${msgs(e).mkString(" | ")}")
  }

  test("probe with same-product mismatched shape (8x32 vs 4x64) also " +
    "fails loudly — the header catches what a length check cannot") {
    val sk = sketch(toks, "token", 8, 32)
    val bad = toks.limit(5).distinct()
      .crossJoin(broadcast(sk))
      .select(call_function("graft_cm_estimate",
        $"sk", xxhash64($"token"), lit(4), lit(64)).as("est"))
    val e = intercept[Exception] { bad.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("8 x 32") && m.contains("4 x 64")),
      s"expected a header-mismatch error, got: ${msgs(e).mkString(" | ")}")
  }

  test("null inputs are skipped (countDistinct-style semantics)") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("x")
    val sk = df.agg(call_function("graft_count_min",
      when($"x".isNotNull, xxhash64($"x")), lit(2), lit(32)).as("sk"))
    val est = df.filter($"x".isNotNull).distinct()
      .crossJoin(broadcast(sk))
      .select($"x", call_function("graft_cm_estimate",
        $"sk", xxhash64($"x"), lit(2), lit(32)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 2L, "b" -> 1L))
  }
}
