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

  test("ANALYZE column statistics: exact NDV/nulls/min-max persist " +
    "version-stamped, reach the leaf's attributeStats, shrink CBO's " +
    "filter estimate, and go stale-silent after a commit") {
    val (root, _) = freshRoots()
    VersionedTable.upsert(spark, root,
      spark.range(0, 1000).select(col("id"),
        (col("id") % 10).as("k"),
        when(col("id") % 100 === 0, lit(null).cast("long"))
          .otherwise(col("id") % 50).as("v"),
        concat(lit("s"), col("id") % 3).as("s")), Seq("id"))
    // probe the planner BEFORE analyzing: the never-analyzed answer
    // must not stick — ANALYZE writes no manifest bump, so the memo
    // keys on the stats FILE identity too (r15 review finding)
    val savedPre = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        savedPre.filterNot(r => r.isInstanceOf[GraftBroadcastStats] ||
          r.isInstanceOf[graft.plans.GraftScanStats]) :+
          graft.plans.GraftScanStats(spark)
      assert(spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats.attributeStats.isEmpty)
    } finally spark.experimental.extraOptimizations = savedPre
    val st = VersionedTable.analyzeColumns(spark, root, exact = true)
    assert(st.rows === 1000L)
    assert(st.cols("k").ndv === 10L && st.cols("k").nulls === 0L)
    assert(st.cols("v").nulls === 10L && st.cols("v").ndv === 50L)
    assert(st.cols("k").min.contains("0") &&
      st.cols("k").max.contains("9"))
    assert(st.cols("s").maxLen.contains(2L) &&
      st.cols("s").avgLen.contains(2L))
    // inspectable through the metadata table, marked fresh
    val m = spark.read.format("graft").option("metadata", "stats")
      .load(root)
    val kRow = m.filter(col("col_name") === "k").head
    assert(kRow.getAs[Long]("ndv") === 10L)
    assert(kRow.getAs[Boolean]("fresh"))
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        saved.filterNot(r => r.isInstanceOf[GraftBroadcastStats] ||
          r.isInstanceOf[graft.plans.GraftScanStats]) :+
          graft.plans.GraftScanStats(spark)
      val leaf = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats
      assert(leaf.attributeStats.nonEmpty, s"$leaf")
      val kStat = leaf.attributeStats
        .find(_._1.name == "k").map(_._2).get
      assert(kStat.distinctCount.contains(BigInt(10)), s"$kStat")
      assert(kStat.min.contains(0L) && kStat.max.contains(9L),
        s"$kStat")
      // CBO consumes them: a selective range filter's estimated
      // row count interpolates from min/max instead of guessing
      val cboWas = spark.conf.get("spark.sql.cbo.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val est = spark.read.format("graft").load(root)
          .filter(col("k") < 2).queryExecution.optimizedPlan.stats
        assert(est.rowCount.isDefined &&
          est.rowCount.get > BigInt(0) &&
          est.rowCount.get < BigInt(500), s"$est")
      } finally spark.conf.set("spark.sql.cbo.enabled", cboWas)
      // a commit flips the fingerprint: the planner must see NOTHING
      // (stale stats degrade to absent, never to wrong); the metadata
      // table still serves them, marked stale
      VersionedTable.upsert(spark, root,
        spark.range(1000, 1001).select(col("id"), lit(99L).as("k"),
          lit(null).cast("long").as("v"), lit("zz").as("s")),
        Seq("id"))
      val stale = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats
      assert(stale.attributeStats.isEmpty, s"$stale")
      assert(!spark.read.format("graft").option("metadata", "stats")
        .load(root).filter(col("col_name") === "k")
        .head.getAs[Boolean]("fresh"))
    } finally spark.experimental.extraOptimizations = saved
  }

  test("column stats SURVIVE an append (r16): the commit folds the " +
    "batch — rows/nulls/min-max advance, NDV from the HLL sketch " +
    "union (exact in the coupon regime), histograms drop, the " +
    "planner still serves them; a DELETE degrades to absent") {
    val (root, _) = freshRoots()
    def half(a: Long, b: Long) = spark.range(a, b).select(col("id"),
      (col("id") % 7).as("k"),
      when(col("id") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("s"), col("id") % 13)).as("s"))
    VersionedTable.append(spark, root, half(0, 100))
    VersionedTable.analyzeColumns(spark, root, exact = true,
      histogramBins = 4)
    assert(VersionedTable.readColumnStats(root).get
      .cols("k").hist.nonEmpty, "bins requested")
    VersionedTable.append(spark, root, half(100, 250))
    val cs = VersionedTable.readColumnStats(root).get
    val fp = VersionedTable.statsFingerprint(root)
    assert((cs.version, cs.posVersion, cs.eqVersion) === fp,
      "folded stats must be stamped FRESH at the post-append version")
    assert(cs.rows === 250L && !cs.exact)
    // coupon-regime HLL unions are exact by construction
    assert(cs.cols("k").ndv === 7L)
    assert(cs.cols("id").ndv === 250L)
    assert(cs.cols("s").ndv === 13L)
    assert(cs.cols("id").min.contains("0") &&
      cs.cols("id").max.contains("249"))
    assert(cs.cols("s").nulls === 50L) // ids ≡ 0 (mod 5)
    assert(cs.cols("s").maxLen.contains(3L))
    assert(cs.cols("k").hist.isEmpty,
      "equi-height bins do not compose — folded stats drop them")
    // the planner serves the FOLDED stats (fingerprint advanced with
    // the table — no re-ANALYZE after the insert)
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        saved.filterNot(r => r.isInstanceOf[GraftBroadcastStats] ||
          r.isInstanceOf[graft.plans.GraftScanStats]) :+
          graft.plans.GraftScanStats(spark)
      val leaf = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats
      val kStat = leaf.attributeStats
        .find(_._1.name == "k").map(_._2)
      assert(kStat.exists(_.distinctCount.contains(BigInt(7))),
        s"$leaf")
      // a DELETE commit still invalidates: no stored summary can
      // follow rows OUT of the table
      VersionedTable.softDelete(spark, root,
        Seq(0L).toDF("id"), Seq("id"))
      val stale = spark.read.format("graft").load(root)
        .queryExecution.optimizedPlan.stats
      assert(stale.attributeStats.isEmpty, s"$stale")
    } finally spark.experimental.extraOptimizations = saved
    // a second append on the now-stale stats must NOT fold (the
    // fingerprint no longer chains) — stays stale, never wrong
    VersionedTable.append(spark, root, half(250, 260))
    val cs2 = VersionedTable.readColumnStats(root).get
    assert((cs2.version, cs2.posVersion, cs2.eqVersion) !==
      VersionedTable.statsFingerprint(root))
  }

  test("fold integrity under nondeterministic batch lineage: the " +
    "folded statistics describe the rows actually WRITTEN (the " +
    "append materializes the batch once for write + fold)") {
    val (root, _) = freshRoots()
    VersionedTable.append(spark, root,
      spark.range(0, 50).select(col("id"), (col("id") % 5).as("k")))
    VersionedTable.analyzeColumns(spark, root, exact = true)
    // a rand()-derived column: re-executing this plan yields
    // DIFFERENT values — without the write/fold materialization the
    // folded min/max/ndv would describe rows not in the table
    val nd = spark.range(50, 80).select(col("id"),
      (rand() * 1000000).cast("long").as("k"))
    VersionedTable.append(spark, root, nd)
    val cs = VersionedTable.readColumnStats(root).get
    assert((cs.version, cs.posVersion, cs.eqVersion) ===
      VersionedTable.statsFingerprint(root), "fold must have run")
    val actual = VersionedTable.readLive(spark, root)
      .agg(min("k"), max("k"), countDistinct("k")).head
    assert(cs.cols("k").min.contains(actual.getLong(0).toString),
      s"${cs.cols("k")} vs table min ${actual.getLong(0)}")
    assert(cs.cols("k").max.contains(actual.getLong(1).toString),
      s"${cs.cols("k")} vs table max ${actual.getLong(1)}")
    // coupon regime (≤ 35 distinct) ⇒ the folded sketch estimate is
    // the exact distinct count of what was WRITTEN
    assert(cs.cols("k").ndv === actual.getLong(2),
      s"${cs.cols("k")} vs table ndv ${actual.getLong(2)}")
  }

  test("equi-height histograms: skew-aware CBO selectivity where " +
    "uniform min/max interpolation misleads; bins round-trip") {
    val (root, _) = freshRoots()
    // 90% zeros, 10% spread over 1..991 — a tail range filter is
    // ~10x overestimated by the uniform interpolation
    VersionedTable.upsert(spark, root,
      spark.range(0, 10000).select(col("id"),
        when(col("id") % 10 === 0, (col("id") % 1000) + 1)
          .otherwise(0L).as("m")), Seq("id"))
    VersionedTable.analyzeColumns(spark, root, exact = true)
    val saved = spark.experimental.extraOptimizations
    val cboWas = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.experimental.extraOptimizations =
        saved.filterNot(r => r.isInstanceOf[GraftBroadcastStats] ||
          r.isInstanceOf[graft.plans.GraftScanStats]) :+
          graft.plans.GraftScanStats(spark)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def est(): BigInt = spark.read.format("graft").load(root)
        .filter(col("m") >= 500)
        .queryExecution.optimizedPlan.stats.rowCount.get
      val uniform = est()
      // re-analyze WITH histograms: the stats-file-identity memo key
      // must pick this up without any table commit
      VersionedTable.analyzeColumns(spark, root, exact = true,
        histogramBins = 16)
      val cs = VersionedTable.readColumnStats(root).get
      assert(cs.cols("m").hist.size === 16)
      assert(cs.cols("m").hist.head.lo === 0.0)
      val withHist = est()
      // truth is 500 rows; uniform lands ~5000, histogram within a
      // bin or two of truth
      assert(uniform > BigInt(3000), s"uniform=$uniform")
      assert(withHist < uniform / 2 && withHist > BigInt(0),
        s"uniform=$uniform withHist=$withHist")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboWas)
      spark.experimental.extraOptimizations = saved
    }
  }

  test("CostBasedJoinReorder consumes the analyzed NDVs: with fresh " +
    "stats a 3-table join re-associates to join the selective dim " +
    "first") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val base = java.nio.file.Files.createTempDirectory("cbo3")
    val fRoot = base.resolve("f").toString
    val d1Root = base.resolve("d1").toString
    val d2Root = base.resolve("d2").toString
    // f ⋈ d1 on ka (ndv 1000) keeps ~|f| rows; f ⋈ d2 on kb (ndv 2)
    // explodes to |f|·|d2|/2 — the reorderer must pick d1 first
    VersionedTable.upsert(spark, fRoot,
      spark.range(0, 20000).select(col("id"),
        (col("id") % 1000).as("ka"), (col("id") % 2).as("kb")),
      Seq("id"))
    VersionedTable.upsert(spark, d1Root,
      spark.range(0, 1000).select(col("id").as("ka"),
        (col("id") * 7).as("w1")), Seq("ka"))
    VersionedTable.upsert(spark, d2Root,
      spark.range(0, 1000).select(col("id").as("d2id"),
        (col("id") % 2).as("kb"), (col("id") * 3).as("w2")),
      Seq("d2id"))
    Seq(fRoot, d1Root, d2Root).foreach(r =>
      VersionedTable.analyzeColumns(spark, r, exact = true))
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        saved.filterNot(r => r.isInstanceOf[GraftBroadcastStats] ||
          r.isInstanceOf[graft.plans.GraftScanStats]) :+
          graft.plans.GraftScanStats(spark)
      spark.read.format("graft").load(fRoot)
        .createOrReplaceTempView("cbo_f")
      spark.read.format("graft").load(d1Root)
        .createOrReplaceTempView("cbo_d1")
      spark.read.format("graft").load(d2Root)
        .createOrReplaceTempView("cbo_d2")
      // written so the EXPLODING join comes first in SQL order
      val plan = spark.sql(
        """SELECT count(*) FROM cbo_f f
          |JOIN cbo_d2 d2 ON f.kb = d2.kb
          |JOIN cbo_d1 d1 ON f.ka = d1.ka""".stripMargin)
        .queryExecution.optimizedPlan
      def roots(p: LogicalPlan): Set[String] = p.collect {
        case r: DataSourceV2ScanRelation => r.name
      }.toSet
      val fName = roots(plan).find(_.contains("/f")).get
      val d1Name = roots(plan).find(_.contains("/d1")).get
      // sanity: without reorder the innermost join pairs f with d2
      val joins0 = plan.collect { case j: Join => j }
      assert(joins0.nonEmpty)
      val innermost0 = joins0.filter(j => roots(j).contains(fName))
        .minBy(j => roots(j).size)
      assert(!roots(innermost0).contains(d1Name),
        s"expected SQL order f⋈d2 first pre-reorder:\n$plan")
      // apply the CBO reorder rule with stats live
      val cboWas = spark.conf.get("spark.sql.cbo.enabled")
      val jrWas = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      try {
        val reordered = org.apache.spark.sql.catalyst.optimizer
          .CostBasedJoinReorder(plan)
        val joins = reordered.collect { case j: Join => j }
        val innermost = joins.filter(j => roots(j).contains(fName))
          .minBy(j => roots(j).size)
        assert(roots(innermost).contains(d1Name),
          s"NDV stats must reorder the selective join first:\n" +
            s"$reordered")
        // r16: an INSERT must not blind the reorderer — the append
        // FOLDS the fact's stats (no re-ANALYZE), the fingerprint
        // advances, and the same reorder still fires
        VersionedTable.append(spark, fRoot,
          spark.range(20000, 22000).select(col("id"),
            (col("id") % 1000).as("ka"), (col("id") % 2).as("kb")))
        val cs = VersionedTable.readColumnStats(fRoot).get
        assert((cs.version, cs.posVersion, cs.eqVersion) ===
          VersionedTable.statsFingerprint(fRoot),
          "append must fold, not invalidate")
        val plan2 = spark.sql(
          """SELECT count(*) FROM cbo_f f
            |JOIN cbo_d2 d2 ON f.kb = d2.kb
            |JOIN cbo_d1 d1 ON f.ka = d1.ka""".stripMargin)
          .queryExecution.optimizedPlan
        val reordered2 = org.apache.spark.sql.catalyst.optimizer
          .CostBasedJoinReorder(plan2)
        val joins2 = reordered2.collect { case j: Join => j }
        val innermost2 = joins2.filter(j => roots(j).contains(fName))
          .minBy(j => roots(j).size)
        assert(roots(innermost2).contains(d1Name),
          s"FOLDED stats must keep the reorder firing after an " +
            s"INSERT:\n$reordered2")
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", cboWas)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", jrWas)
      }
    } finally spark.experimental.extraOptimizations = saved
  }
}
