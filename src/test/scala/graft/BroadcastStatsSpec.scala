package graft

import java.nio.file.Files
import graft.plans.GraftBroadcastStats
import graft.sinks.VersionedTable
import org.apache.spark.sql.functions._

/** Statistics-driven auto-broadcast for graft joins: without the rule
  * a graft scan reports no size (V1ScanWrapper drops
  * SupportsReportStatistics) and a tiny-dim join plans sort-merge;
  * with the rule the manifest-derived byte size plants a BROADCAST
  * hint and the SAME query plans a broadcast join — no user hint.
  */
class BroadcastStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoots(): (String, String) = {
    val base = Files.createTempDirectory("bstats")
    (base.resolve("fact").toString, base.resolve("dim").toString)
  }

  private def bhj(plan: String): Boolean =
    plan.contains("BroadcastHashJoin")

  test("a small graft dim auto-broadcasts only once the rule is " +
    "installed; result identical either way") {
    val (factRoot, dimRoot) = freshRoots()
    val fact = spark.range(0, 5000)
      .select(col("id"), (col("id") % 7).as("k"),
        (col("id") * 3).as("v"))
    val dim = spark.range(0, 7)
      .select(col("id").as("k"), (col("id") * 100).as("w"))
    VersionedTable.upsert(spark, factRoot, fact, Seq("id"))
    VersionedTable.upsert(spark, dimRoot, dim, Seq("k"))

    def query() = spark.read.format("graft").load(factRoot)
      .join(spark.read.format("graft").load(dimRoot), "k")
      .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))

    // the session is shared across suites — the rule may already be
    // installed by an earlier test; only assert the uninstalled shape
    // when it genuinely is uninstalled
    val pre = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[GraftBroadcastStats])
    if (!pre) {
      val before = query().queryExecution.executedPlan.toString
      assert(!bhj(before),
        s"graft scan unexpectedly reported stats:\n${before.take(800)}")
    }
    val want = query().head

    GraftBroadcastStats.install(spark)
    GraftBroadcastStats.install(spark) // idempotent
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[GraftBroadcastStats]) === 1)
    val q = query()
    val after = q.queryExecution.executedPlan.toString
    assert(bhj(after), s"no broadcast after install:\n${after.take(800)}")
    assert(q.head === want)
  }

  test("a graft side past the threshold is NOT hinted, and an " +
    "explicit user hint always wins") {
    val (factRoot, dimRoot) = freshRoots()
    VersionedTable.upsert(spark, factRoot,
      spark.range(0, 50000).select(col("id"), (col("id") % 5).as("k"),
        concat(lit("pad-pad-pad-pad-"), col("id")).as("pad")),
      Seq("id"))
    VersionedTable.upsert(spark, dimRoot,
      spark.range(0, 5).select(col("id").as("k")), Seq("k"))
    GraftBroadcastStats.install(spark)
    val factBytes =
      graft.sources.GraftScanPlanner.liveBytes(
        graft.sources.GraftScanPlanner.opts(
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(
            java.util.Collections.singletonMap("path", factRoot)))).get
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // threshold below the fact's size but above the dim's
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        math.max(1024L, factBytes - 1).toString)
      def q() = spark.read.format("graft").load(factRoot)
        .join(spark.read.format("graft").load(dimRoot), "k")
      assert(bhj(q().queryExecution.executedPlan.toString),
        "the under-threshold dim side should get the hint")
      // user SHUFFLE_MERGE hint outranks the planted one
      val forced = spark.read.format("graft").load(factRoot)
        .join(spark.read.format("graft").load(dimRoot)
          .hint("shuffle_merge"), "k")
      assert(!bhj(forced.queryExecution.executedPlan.toString))
      // broadcast disabled entirely -> rule stands down
      // (queryExecution caches per Dataset, so re-plan fresh)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!bhj(q().queryExecution.executedPlan.toString))
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", old)
  }
}
