package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q141–q144 family: domain quota, mask plan, Poisson bootstrap, KS
  * test. Query-level properties run on the sf0.001 testdata (same
  * tables the driver uses); arithmetic cores are re-derived on hand
  * fixtures.
  */
class CorpusStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def hasData = new java.io.File(s"$sf/documents.parquet").exists

  test("domain quota: ≤ k per source, highest priority kept, deterministic") {
    assume(hasData)
    val got = SparkEntry.queries("q141_domain_quota")(spark, sf).cache()
    val perSource = got.groupBy("source").agg(count(lit(1)).as("n"),
      max("rank").as("max_rank")).collect()
    perSource.foreach { r =>
      assert(r.getAs[Long]("n") <= 20L)
      assert(r.getAs[Long]("max_rank") === r.getAs[Long]("n"),
        "ranks are dense 1..n")
    }
    // within a source, rank order follows priority DESC
    val viol = got.alias("a").join(got.alias("b"),
      col("a.source") === col("b.source") &&
        col("a.rank") < col("b.rank") && col("a.prio") < col("b.prio"))
    assert(viol.count() === 0)
    val again = SparkEntry.queries("q141_domain_quota")(spark, sf)
    assert(got.except(again).count() === 0)
    got.unpersist()
  }

  test("mask plan: spans in bounds, len 2-4, expected span count") {
    assume(hasData)
    val plan = SparkEntry.queries("q142_mask_plan")(spark, sf).cache()
    val docs = core.Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text"))
        .cast("long").as("n_tok"))
    val joined = plan.join(docs, "doc_id")
    assert(joined.filter(col("len") < 2 || col("len") > 4).count() === 0)
    assert(joined.filter(col("start") < 0 ||
      col("start") + col("len") > col("n_tok")).count() === 0)
    // span count per doc = max(1, floor(n_tok·0.15/3)); docs < 8 tokens excluded
    val counts = joined.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), max("n_tok").as("n_tok"))
      .withColumn("expected", greatest(lit(1L),
        floor(col("n_tok").cast("double") * 0.15 / 3.0).cast("long")))
    assert(counts.filter(col("n_spans") =!= col("expected")).count() === 0)
    assert(docs.filter(col("n_tok") < 8).join(plan, "doc_id").count() === 0)
    plan.unpersist()
  }

  test("bootstrap: Poisson(1) weights average to ~1, replicates deterministic") {
    assume(hasData)
    val got = SparkEntry.queries("q143_bootstrap")(spark, sf).cache()
    assert(got.count() === 8)
    val n = core.Tables.lineitem(spark, sf).count()
    got.collect().foreach { r =>
      val nEff = r.getAs[Long]("n_eff")
      // E[n_eff] = n, sd ≈ √n: ±5σ window
      assert(math.abs(nEff - n) < 5 * math.sqrt(n.toDouble),
        s"replicate ${r.getAs[Long]("b")}: n_eff=$nEff vs n=$n")
    }
    val again = SparkEntry.queries("q143_bootstrap")(spark, sf)
    assert(got.except(again).count() === 0)
    got.unpersist()
  }

  test("cm inner product: exact join size at ample width, over-estimate " +
    "under forced collisions — never an under-estimate") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def est(aKeys: Seq[Long], bKeys: Seq[Long], w: Int): (Long, Long) = {
      val a = aKeys.toDF("k").agg(
        call_function("graft_count_min", xxhash64(col("k")), lit(4),
          lit(w)).as("a"))
      val b = bKeys.toDF("k").agg(
        call_function("graft_count_min", xxhash64(col("k")), lit(4),
          lit(w)).as("b"))
      // +3: skip the 2-long [depth,width] header (1-based element_at)
      val e = a.crossJoin(b).withColumn("est", expr(
        s"""array_min(transform(sequence(0, 3), d ->
           |  aggregate(sequence(0, ${w - 1}), CAST(0 AS BIGINT),
           |    (acc, x) -> acc + element_at(a, d*$w + x + 3)
           |      * element_at(b, d*$w + x + 3))))""".stripMargin))
        .head().getAs[Long]("est")
      val exact = aKeys.toDF("k").join(bKeys.toDF("k"), "k").count()
      (exact, e)
    }
    // key 1: 2×1, key 2: 1×2 → 4 join rows; width 1024 = no collisions
    val (ex1, e1) = est(Seq(1L, 1L, 2L), Seq(1L, 2L, 2L), 1024)
    assert(ex1 === 4L && e1 === 4L)
    // adversarial width 2 forces collisions: the estimate stays
    // one-sided (≥ exact = 0) and bounded by n1·n2
    val (ex2, e2) = est(Seq(1L, 2L, 3L), Seq(4L, 5L), 2)
    assert(ex2 === 0L && e2 >= 0L && e2 <= 6L,
      s"collisions inflate within [exact, n1·n2]: $e2")
  }

  test("link extraction: only well-formed hrefs become edges") {
    import spark.implicits._
    val html = Seq(
      (1L, """<a href="/docs/7">x</a> <a href="/docs/9">y</a>"""),
      (2L, """<a href="/docs/abc">bad</a> href="/docs/11" no-tag ok"""),
      (3L, """no links here""")
    ).toDF("doc_id", "html")
    val edges = html
      .select(col("doc_id").as("src"),
        explode(expr(
          "regexp_extract_all(html, 'href=\"/docs/(\\\\d+)\"', 1)"))
          .as("dst_s"))
      .select(col("src"), col("dst_s").cast("long").as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 2's bare href=… (no <a> needed — the pattern is attribute-
    // level) still extracts 11; the non-numeric path does not
    assert(edges === Set((1L, 7L), (1L, 9L), (2L, 11L)))
  }

  test("sequence export: struct sort gives the (ts, event_id) order") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(t0.getTime + m * 1000L)
    // same-ts tie broken by event_id
    val ev = Seq((1L, t(2), 30L, "C"), (1L, t(0), 10L, "A"),
      (1L, t(0), 11L, "B"), (2L, t(1), 20L, "Z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = ev.groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        x => x.getField("event_type")), ">").as("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "A>B>C")
    assert(got(2L) === "Z")
  }

  test("embedding dim stats: hand-computed quartiles on a fixed dim") {
    import spark.implicits._
    // one dimension with values 1..5 (micro units 1e6..5e6)
    val df = (1 to 5).map(v => Tuple1(Array(v.toFloat))).toDF("embedding")
    val got = df.select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim"),
        round(col("x").cast("double") * 1e6).cast("long").as("xm"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("xm").as("s"),
        expr("percentile(xm, array(0.25, 0.5, 0.75))").as("qs"))
      .head()
    assert(got.getAs[Long]("n") === 5L)
    assert(got.getAs[Long]("s") === 15000000L)
    val qs = got.getSeq[Double](got.fieldIndex("qs"))
    assert(qs === Seq(2000000.0, 3000000.0, 4000000.0))
  }

  test("ks statistic: identical samples D=0, disjoint samples D=1") {
    import spark.implicits._
    def ks(df: org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val g = df.groupBy("cents").agg(sum("is1").as("c1"),
        (count(lit(1)) - sum("is1")).as("c2"))
      val tot = g.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val w = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = g.withColumn("cum1", sum("c1").over(w))
        .withColumn("cum2", sum("c2").over(w))
        .crossJoin(broadcast(tot))
        .withColumn("diff",
          abs(col("cum1").cast("double") / col("n1").cast("double")
            - col("cum2").cast("double") / col("n2").cast("double")))
        .groupBy("n1", "n2").agg(round(max("diff"), 6).as("ks_d"))
        .withColumn("reject",
          col("ks_d") > lit(1.358) *
            sqrt((col("n1") + col("n2")).cast("double") /
              (col("n1") * col("n2")).cast("double")))
        .head()
      (r.getAs[Double]("ks_d"), r.getAs[Boolean]("reject"))
    }
    val same = (1 to 50).flatMap(i =>
      Seq((i.toLong % 10, 1L), (i.toLong % 10, 0L))).toDF("cents", "is1")
    val (d0, rej0) = ks(same)
    assert(d0 === 0.0 && !rej0)
    val disjoint = ((1 to 50).map(i => (i.toLong, 1L)) ++
      (51 to 100).map(i => (i.toLong, 0L))).toDF("cents", "is1")
    val (d1, rej1) = ks(disjoint)
    assert(d1 === 1.0 && rej1)
  }
}
