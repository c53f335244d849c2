package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}
import graft.functions.GraftFunctions

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("as-of backward join picks latest right <= left.ts, inclusive") {
    val trades = Seq(
      (1L, 7L, ts("2024-01-01 10:00:05")),
      (2L, 7L, ts("2024-01-01 10:00:00")), // exactly at quote q2 -> inclusive
      (3L, 7L, ts("2024-01-01 09:00:00")), // before all quotes -> null
      (4L, 8L, ts("2024-01-01 10:00:10"))  // other key
    ).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (100L, 7L, ts("2024-01-01 09:59:00"), 1.0),
      (101L, 7L, ts("2024-01-01 10:00:00"), 2.0),
      (102L, 8L, ts("2024-01-01 10:00:10"), 3.0),
      (103L, 7L, ts("2024-01-01 11:00:00"), 9.0) // future, never matches
    ).toDF("err_event_id", "user_id", "err_ts", "err_value")

    val out = AsOfJoin.backward(trades, quotes, "user_id", "ts", "err_ts",
      Seq("err_event_id", "err_value"), Some("err_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L) === Some(101L))
    assert(out(2L) === Some(101L)) // inclusive >=
    assert(out(3L) === None)
    assert(out(4L) === Some(102L))
  }

  test("forward as-of picks earliest right >= left.ts, inclusive") {
    val trades = Seq(
      (1L, 7L, ts("2024-01-01 10:00:05")),
      (2L, 7L, ts("2024-01-01 10:00:00")), // exactly at quote 101
      (3L, 7L, ts("2024-01-01 12:00:00"))  // after all quotes -> null
    ).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (100L, 7L, ts("2024-01-01 09:59:00"), 1.0),
      (101L, 7L, ts("2024-01-01 10:00:00"), 2.0),
      (103L, 7L, ts("2024-01-01 11:00:00"), 9.0)
    ).toDF("err_event_id", "user_id", "err_ts", "err_value")
    val out = AsOfJoin.forward(trades, quotes, "user_id", "ts", "err_ts",
      Seq("err_event_id", "err_value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L) === Some(103L)) // next after 10:00:05
    assert(out(2L) === Some(101L)) // inclusive
    assert(out(3L) === None)
  }

  test("standardize: per-dimension zero mean / unit variance") {
    val vecs = Seq(
      (1L, Array(1.0f, 10.0f)),
      (2L, Array(2.0f, 20.0f)),
      (3L, Array(3.0f, 30.0f))).toDF("vec_id", "embedding")
    val std = graft.functions.VectorFunctions
      .standardize(vecs, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // dim means 2/20, stddev_pop sqrt(2/3)*1 and *10 -> z = ±1.2247, 0
    val e = math.sqrt(1.5)
    assert(math.abs(std(1L)(0) + e) < 1e-6)
    assert(math.abs(std(2L)(0)) < 1e-6)
    assert(math.abs(std(3L)(1) - e) < 1e-6)
  }

  test("as-of join plan has no join node (union+window, linear)") {
    val l = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq((2L, 1L, ts("2024-01-01 00:00:00"), 5.0))
      .toDF("err_event_id", "user_id", "err_ts", "err_value")
    val plan = AsOfJoin.backward(l, r, "user_id", "ts", "err_ts",
      Seq("err_event_id", "err_value")).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
    assert(plan.contains("Window"))
  }

  test("range join matches brute-force filter; no nested-loop join in plan") {
    val signups = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:07:30"))).toDF("s_event_id", "ts")
    val errors = Seq(
      (10L, ts("2024-01-01 00:00:00")),  // in window of 1 (inclusive start)
      (11L, ts("2024-01-01 00:05:00")),  // exactly at 1's end; before 2's start
      (12L, ts("2024-01-01 00:12:30")),  // exactly at 2's end
      (13L, ts("2024-01-01 00:12:31"))   // just outside
    ).toDF("e_event_id", "err_ts")
    val out = RangeJoin.timeRange(signups, errors, "ts", "err_ts", 0, 300)
      .select("s_event_id", "e_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (1L, 11L), (2L, 12L)))

    val plan = RangeJoin.timeRange(signups, errors, "ts", "err_ts", 0, 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("interval-overlap join: matches brute force, each pair exactly " +
    "once despite multi-bucket spans, touching counts, disjoint " +
    "excluded") {
    // widths chosen so some pairs share 3+ buckets (width 10)
    val a = Seq((1L, 0L, 35L), (2L, 50L, 55L), (3L, 100L, 100L))
      .toDF("id", "s", "e")
    val b = Seq((10L, 5L, 90L),   // overlaps 1 (long span, many buckets)
      (11L, 35L, 40L),            // touches 1 at exactly 35 -> overlap 0
      (12L, 56L, 60L),            // disjoint from 2 (gap of 1)
      (13L, 95L, 100L))           // touches 3 at the point 100
      .toDF("id", "s", "e")
    val got = graft.operators.IntervalJoin
      .overlap(a, b, "id", "s", "e", widthSec = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(got === Seq((1L, 10L, 30L), (1L, 11L, 0L), (2L, 10L, 5L),
      (3L, 13L, 0L)))
    // exactly-once even when recomputed with a width that puts every
    // overlapping pair in ONE bucket vs many: same result
    val wide = graft.operators.IntervalJoin
      .overlap(a, b, "id", "s", "e", widthSec = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(wide === got, "bucket width must not change the answer")
  }

  test("graft_cosine native expression matches the HOF formulation") {
    GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select($"vec_id".as("id_a"), $"embedding".as("v_a"))
      .join(emb.select($"vec_id".as("id_b"), $"embedding".as("v_b")),
        $"id_a" === $"id_b" - 1)
    val diff = pairs.select(
      call_function("graft_cosine", $"v_a", $"v_b").as("native"),
      graft.functions.VectorFunctions.cosine($"v_a", $"v_b").as("hof"))
      .withColumn("d", abs($"native" - $"hof"))
      .agg(max("d")).head().getDouble(0)
    assert(diff < 1e-12, s"max diff $diff")
  }

  test("GraftExtensions injects graft_cosine via SparkSessionExtensions") {
    val ext = new graft.functions.GraftExtensions
    val se = new org.apache.spark.sql.SparkSessionExtensions
    ext(se) // must register without throwing; builder arity-checked
    val err = intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.cosineBuilder(Seq.empty)
    }
    assert(err.getMessage.contains("2 arguments"))
    // the full function family rides the same injection path
    intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.countMinBuilder(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.cmEstimateBuilder(Seq.empty)
    }
    // depth/width must be literals (plan-time parameters, not columns)
    intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.countMinBuilder(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "d", org.apache.spark.sql.types.IntegerType)(),
        org.apache.spark.sql.catalyst.expressions.Literal(8)))
    }
  }

  test("graft_cosine handles nulls and zero vectors") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f)))).toDF("a", "b")
    val out = df.select(call_function("graft_cosine", $"a", $"b")).collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(1).isNullAt(0)) // zero norm
    assert(out(2).isNullAt(0)) // null input
  }

  test("approx_count_distinct within 10% of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct("l_partkey").as("a"),
      countDistinct("l_partkey").as("e")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.1, s"approx $a exact $e")
  }
}
