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

  test("q15: deterministic dedup is one shuffle + one window sort") {
    val p = plan("q15_dedup_first")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
    assert(p.contains("Window") || p.contains("WindowGroupLimit"), p)
  }
}
