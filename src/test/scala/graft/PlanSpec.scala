package graft

/** Physical-plan regression guards: the properties that make these
  * queries scale (pushdown, pruning, broadcast, top-k, partial aggs,
  * single-shuffle windows) are asserted, not assumed — a refactor that
  * silently turns a broadcast join into a sort-merge join or drops a
  * pushed filter fails here, at test time, not at 100 TB.
  */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("q2: filter and projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(p_size), IsNotNull(p_brand)" +
      ", GreaterThan(p_size,40), EqualTo(p_brand,Brand#3)]"), p)
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string," +
      "p_brand:string,p_size:int,p_retailprice:double>"), p)
  }

  test("q3: star join is a pure broadcast-hash chain, no sort-merge") {
    val p = plan("q3_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).length === 3, p)
    assert(!p.contains("SortMergeJoin"), p)
    // fact scan prunes to the two needed columns
    assert(p.contains("struct<o_custkey:bigint,o_totalprice:double>"), p)
  }

  test("q60: bucketed join runs with no Exchange below the join " +
    "(the only shuffle is the post-join re-aggregation)") {
    // disable broadcast: at toy SF the dimension side fits a broadcast,
    // which is also shuffle-free but wouldn't demonstrate the bucketed
    // co-location that matters when BOTH sides are large
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q60_bucketed_join")(spark, d)
      val p = df.queryExecution.executedPlan.toString
      val joinIdx = p.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, p)
      // in the tree printout everything below the join node is the
      // join's subtree; the post-join re-agg Exchange prints above it
      val below = p.substring(joinIdx)
      assert(!below.contains("Exchange hashpartitioning"),
        s"bucketed join should read pre-shuffled buckets:\n$p")
      assert(below.split("\n").count(_.contains("Bucketed: true")) === 2, p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q67: chunk planning runs with ZERO exchanges (embarrassingly " +
    "parallel generator)") {
    val p = plan("q67_chunk_plan")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate"), p)
  }

  test("q64: per-shard packing is exactly one shuffle (the shard window)") {
    val p = plan("q64_sequence_pack")
    assert("Exchange".r.findAllIn(p).length === 1, p)
    assert(p.contains("Window"), p)
  }

  test("q70: profiling is two fixed passes (hash-agg counts, fold " +
    "min/max) regardless of column count") {
    val p = plan("q70_profile")
    assert("Scan parquet".r.findAllIn(p).length === 2, p)
    assert(p.contains("Expand"), p) // fused multi-count-distinct
    // the expanded counting pass must stay HASH-aggregated: min/max
    // string buffers in the same pass would demote it to SortAggregate
    assert(p.contains("HashAggregate"), p)
  }

  test("q8: bounded top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q8_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1: aggregate is partial+final (map-side combine)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("partial_sum"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q4: anti join broadcasts and scans only the key column") {
    val p = plan("q4_anti_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop")
      === false || p.contains("LeftAnti"), p)
    assert(p.contains("struct<o_custkey:bigint>"), p)
  }

  test("join strategy hints are honored (shuffle_hash vs merge)") {
    val o = spark.read.parquet(s"$d/orders.parquet")
    val c = spark.read.parquet(s"$d/customer.parquet")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sh = o.join(c.hint("shuffle_hash"),
        o("o_custkey") === c("c_custkey"))
      assert(sh.queryExecution.executedPlan.toString
        .contains("ShuffledHashJoin"))
      val sm = o.join(c.hint("merge"), o("o_custkey") === c("c_custkey"))
      assert(sm.queryExecution.executedPlan.toString
        .contains("SortMergeJoin"))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("star models materialize as catalog views and answer SQL (S11)") {
    val staged = graft.operators.Cleaning.clean(
      graft.operators.Flatten.flattenResponses(
        Fixtures.standardBatch(spark), "b1"))
    graft.models.StarModels.dimLocation(staged)
      .createOrReplaceTempView("v_dim_location")
    graft.models.StarModels.factWeatherHourly(staged)
      .createOrReplaceTempView("v_fact")
    val out = spark.sql(
      """SELECT city, avg(temperature_c) AS avg_t
        |FROM v_fact JOIN v_dim_location USING (location_id)
        |GROUP BY city""".stripMargin)
    assert(out.count() === 3)
  }

  test("q15: deterministic dedup is one shuffle + one window sort") {
    val p = plan("q15_dedup_first")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
    assert(p.contains("Window") || p.contains("WindowGroupLimit"), p)
  }

  test("q133: random projection is map-only (no Exchange, no Window)") {
    val p = plan("q133_random_projection")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("Generate"), p)
  }

  test("q141: domain quota is a partial+final topk aggregate, no per-" +
    "group sort") {
    val p = plan("q141_domain_quota")
    assert(p.contains("partial_graft_topk"), p)
    assert(!p.contains("Window"), p)
    assert(!p.toLowerCase.contains("sort "), p)
  }

  test("q143: bootstrap is one scan with map-side-combined weighted sums") {
    val p = plan("q143_bootstrap")
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
    assert(p.contains("partial_sum"), p)
  }

  test("q144: KS totals ride the window input — one events scan") {
    val p = plan("q144_ks_test")
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
  }

  test("q235: interval-overlap join is an equi-join on bucket ids — " +
    "no nested-loop, no cartesian, no distinct") {
    val p = plan("q235_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // canonical-bucket emission means no dedup operator needed
    assert(!p.contains("HashAggregate(keys=[a_id"), p)
  }

  test("q231: ExactSubstr is linear shuffles, no cartesian, no " +
    "corpus-sized sort") {
    val p = plan("q231_substring_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the only Sort is the per-doc island window — partition-local
    // ("false, 0"), never a global sort ("true, 0")
    assert(!p.contains("], true, 0"), p)
  }

  test("q232: bloom probe joins on bit ids and aggregates partial+" +
    "final (never ships data rows to the probe)") {
    val p = plan("q232_bloom_skip")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q224: dim filter reaches the fact scan as a dynamic partition " +
    "prune (only qualifying date partitions are listed at run time)") {
    val p = plan("q224_dpp_join")
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q248: decayed counters are one partial+final hash aggregate " +
    "over the scan — no window, no sort, 1-row broadcast asof join") {
    val p = plan("q248_decayed_counters")
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p) // the 1-row asof stat join
    // map-side combine on the counter aggregate
    assert(p.contains("partial_count") || p.contains("Partial"), p)
  }

  test("q249: distribution match is a broadcast threshold join + " +
    "filter pass — the corpus is never shuffled") {
    val p = plan("q249_distribution_match")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // only the |buckets|-row histogram aggregate shuffles
    assert(!p.contains("Window"), p)
  }

  test("q250: theil-sen pair join keys on the group column (pairs " +
    "stay within groups — no cartesian)") {
    val p = plan("q250_theil_sen")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q255: cusum parallelizes as stacked running windows — no " +
    "cartesian, no self-join of the series") {
    val p = plan("q255_cusum_drift")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("BroadcastHashJoin"),
      s"CUSUM must not join the series to itself:\n$p")
  }

  test("q264: PR sweep fans the threshold grid out over score-domain " +
    "cells — the corpus feeds one partial+final aggregate, no " +
    "row-level grid multiplication") {
    val p = plan("q264_pr_sweep")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Partial") || p.contains("partial_count"), p)
    // the Generate (grid explode) must sit ABOVE the per-score
    // aggregate in the tree printout (operators print top-down), so
    // it expands cells, not corpus rows
    val gen = p.indexOf("Generate")
    val agg = p.lastIndexOf("HashAggregate")
    assert(gen >= 0 && agg >= 0 && gen < agg,
      s"grid explode must expand domain cells, not scan rows:\n$p")
  }

  test("q258: mann-whitney ranks on the distinct-value domain — the " +
    "corpus contributes one partial+final aggregate, no row sort " +
    "below it") {
    val p = plan("q258_mann_whitney")
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the only Sort is the window's over the domain-sized aggregate
    // output; it must sit ABOVE the partial+final value aggregate
    val firstAgg = p.indexOf("HashAggregate")
    val firstSort = p.indexOf("Sort ")
    assert(firstAgg >= 0 && firstSort >= 0, p)
    assert(p.contains("Partial") || p.contains("partial_count"), p)
  }

  test("q278: multi-suite decontamination is one gram-keyed join — " +
    "suites pre-aggregated to postings, no cartesian fan-out") {
    val p = plan("q278_decontam_matrix")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the suite branch aggregates to (suite, g) BEFORE the join:
    // min(bench_id) partials appear below the gram join
    assert(p.contains("partial_min") || p.contains("Partial"), p)
  }

  test("q279: novelty has exactly ONE join, and it is doc-sized — " +
    "novel counts come from the firsts table, never a gram join-back") {
    val p = plan("q279_ngram_novelty")
    assert(!p.contains("CartesianProduct"), p)
    // one SortMergeJoin/ShuffledHashJoin/BroadcastHashJoin total: the
    // |docs|-row perDoc ⋈ novel merge; gram rows feed only aggregates
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).length
    assert(joins === 1, s"expected 1 join, got $joins:\n$p")
  }

  test("q280: heaps-law window runs on the checkpoint domain above " +
    "partial+final aggregates") {
    val p = plan("q280_heaps_law")
    assert("Window".r.findAllIn(p).length >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    // both branches pre-aggregate (token counts + first-doc types)
    // with map-side partials before anything joins or windows
    assert(p.contains("partial_min") || p.contains("Partial"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 4, p)
  }

  test("q283: version diff is one co-keyed full-outer join of the two " +
    "snapshot scans — no cartesian, no nested loop") {
    val p = plan("q283_corpus_diff")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FullOuter"), p)
  }

  test("q309: the DSv2 graft scan plans as a V1-wrapped row scan with " +
    "the interval conjuncts in PushedFilters and the pruned schema") {
    val vt = graft.sinks.VersionedTable
    val work = graft.core.ScratchDirs.fresh("plan_dsv2").toString
    import org.apache.spark.sql.functions.col
    vt.upsert(spark, work,
      spark.range(0, 1000).select(col("id"), (col("id") * 3).as("m")),
      Seq("id"))
    val q = spark.read.format("graft").load(work)
      .filter(col("m") >= 30 && col("m") <= 600).select("id")
    val p = q.queryExecution.executedPlan.toString
    // scan node type: RowDataSourceScanExec over the graft relation
    assert(p.contains("Scan GraftTable("), p)
    assert(p.contains("PushedFilters: [GreaterThanOrEqual(m,30), " +
      "LessThanOrEqual(m,600)]"), p)
    // column pruning reached the relation: only (id, m) survive —
    // m stays because the residual filter re-evaluates row-level
    assert(p.contains("ReadSchema: struct<id:bigint,m:bigint>"), p)
  }

  test("q284: the md5 day selection is a PARTITION filter — " +
    "unselected cluster dirs are never listed or read") {
    val p = plan("q284_cluster_sample")
    assert("PartitionFilters: \\[[^\\]]*md5prefixlong".r
      .findFirstIn(p).isDefined,
      s"sampling predicate did not reach PartitionFilters:\n$p")
    // the data read carries only the aggregated columns
    assert(p.contains("ReadSchema: struct<event_type:string," +
      "value:double>"), p)
  }
}
