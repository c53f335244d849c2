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
