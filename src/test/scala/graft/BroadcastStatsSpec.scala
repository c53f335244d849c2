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

    // the session is shared across suites — the rules may already be
    // installed by an earlier test; only assert the uninstalled shape
    // when BOTH stats paths genuinely are uninstalled
    val pre = spark.experimental.extraOptimizations.exists(r =>
      r.isInstanceOf[GraftBroadcastStats] ||
        r.isInstanceOf[graft.plans.GraftScanStats])
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

  test("SupportsReportStatistics through the V1 wrapper: with the " +
    "HINT RULE REMOVED, the broadcast decision flows from the " +
    "reported stats alone, and sidecar row counts reach the logical " +
    "plan statistics") {
    val (factRoot, dimRoot) = freshRoots()
    VersionedTable.upsert(spark, factRoot,
      spark.range(0, 5000).select(col("id"), (col("id") % 7).as("k"),
        (col("id") * 3).as("v")), Seq("id"))
    VersionedTable.upsert(spark, dimRoot,
      spark.range(0, 7).select(col("id").as("k"),
        (col("id") * 100).as("w")), Seq("k"))
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        saved.filterNot(r => r.isInstanceOf[GraftBroadcastStats] ||
          r.isInstanceOf[graft.plans.GraftScanStats]) :+
          graft.plans.GraftScanStats(spark)
      def query() = spark.read.format("graft").load(factRoot)
        .join(spark.read.format("graft").load(dimRoot), "k")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      val q = query()
      val plan = q.queryExecution.executedPlan.toString
      assert(bhj(plan),
        s"reported stats alone must drive the broadcast:\n" +
          plan.take(800))
      // the LOGICAL statistics carry real numbers: manifest bytes
      // and the sidecar row count (7 dim rows, no deletes pending)
      val dimStats = spark.read.format("graft").load(dimRoot)
        .queryExecution.optimizedPlan.stats
      assert(dimStats.rowCount.contains(BigInt(7)), s"$dimStats")
      assert(dimStats.sizeInBytes > 0 &&
        dimStats.sizeInBytes < 1000000, s"$dimStats")
      assert(q.head.getLong(0) === 5000L)
      // a table with pending MoR masks must DECLINE the row count
      // (visible cardinality differs from the file counts) but keep
      // the size upper bound
      VersionedTable.softDeletePos(spark, dimRoot, col("k") === 0)
      val masked = spark.read.format("graft").load(dimRoot)
        .queryExecution.optimizedPlan.stats
      assert(masked.rowCount.isEmpty, s"$masked")
      assert(masked.sizeInBytes > 0, s"$masked")
    } finally spark.experimental.extraOptimizations = saved
  }
}
