package graft

import org.apache.spark.sql.functions._
import graft.operators.Schedule

/** Spark-4 VARIANT semi-structured handling (q220) and scheduler
  * cadence reconciliation (q221 — Airflow `@daily`/`catchup=False`
  * parity, reference `airflow/dags/etl_pipeline_dag.py:16-31`).
  */
class VariantScheduleSpec extends SparkSpec {

  test("variant: typed path extraction routes heterogeneous shapes") {
    import spark.implicits._
    val rows = Seq(
      """{"k": 7}""",
      """{"k": 35}""",
      """{"priority":"1-URGENT","cents":1200}""",
      """{"priority":"5-LOW","cents":-50}""").toDF("payload")
    val out = rows.select(parse_json(col("payload")).as("v"))
      .select(
        try_variant_get(col("v"), "$.priority", "string").as("p"),
        try_variant_get(col("v"), "$.k", "long").as("k"),
        try_variant_get(col("v"), "$.cents", "long").as("c"))
      .collect()
    assert(out.count(_.isNullAt(0)) === 2)   // events: no priority path
    assert(out.map(r => if (r.isNullAt(1)) 0L else r.getLong(1)).sum === 42L)
    assert(out.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum === 1150L)
  }

  test("variant: type-mismatched path yields null, not an error") {
    import spark.implicits._
    val out = Seq("""{"k": "not-a-number"}""").toDF("p")
      .select(try_variant_get(parse_json(col("p")), "$.k", "long").as("k"))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("variant: survives a parquet round-trip with values intact") {
    import spark.implicits._
    val dir = tmpDir("variant-rt")
    Seq("""{"a": {"b": [1, 2, 3]}}""", """{"a": {"b": []}}""")
      .toDF("payload")
      .select(parse_json(col("payload")).as("v"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .select(try_variant_get(col("v"), "$.a.b[2]", "long").as("x"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(back.toSeq === Seq(-1L, 3L))
  }

  test("schedule: catchup=False marks only the latest missed tick pending") {
    import spark.implicits._
    val ticks = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
      "2024-01-05", "2024-01-06")
      .toDF("s").select(to_date(col("s")).as("day"))
    // ran on 1,2,5,6 — missed 3 and 4; only day 4 (the latest missed)
    // is pending, day 3 is skipped forever.
    val runs = Seq("2024-01-01", "2024-01-02", "2024-01-05", "2024-01-06")
      .toDF("s").select(to_date(col("s")).as("day"))
    val rec = Schedule.reconcileCatchupFalse(ticks, runs)
      .collect().map(r => r.getDate(0).toString -> r.getString(1)).toMap
    assert(rec("2024-01-03") === "skipped_no_catchup")
    assert(rec("2024-01-04") === "pending")
    assert(Seq("2024-01-01", "2024-01-02", "2024-01-05", "2024-01-06")
      .forall(rec(_) === "ran"))
  }

  test("schedule: no missed ticks means every tick ran, none pending") {
    import spark.implicits._
    val days = Seq("2024-02-01", "2024-02-02").toDF("s")
      .select(to_date(col("s")).as("day"))
    val rec = Schedule.reconcileCatchupFalse(days, days)
      .collect().map(_.getString(1))
    assert(rec.toSeq === Seq("ran", "ran"))
  }

  test("seq-support collapse: min/max per (user,type) ≡ event-level A-before-B") {
    import spark.implicits._
    // interleavings chosen to need the min/max rule, not adjacency:
    // u1 has A..B..A (A before B even though the LAST A is after B),
    // u2 has B..A only (no A-before-B), u3 has A,B at equal ts via
    // distinct micros (strict < must hold).
    val ev = Seq(
      (1L, "A", 100L), (1L, "B", 200L), (1L, "A", 300L),
      (2L, "B", 100L), (2L, "A", 200L),
      (3L, "A", 100L), (3L, "B", 101L))
      .toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    // brute force: event-level exists(a.ts < b.ts)
    val brute = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.event_type") =!= col("b.event_type") &&
        col("a.ts") < col("b.ts"))
      .select(col("a.user_id").as("u"), col("a.event_type").as("x"),
        col("b.event_type").as("y")).distinct()
      .groupBy("x", "y").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // collapsed: the q223 shape
    val ut = ev.groupBy("user_id", "event_type")
      .agg(min("ts").as("t0"), max("ts").as("t1"))
    val fast = ut.select(col("user_id"), col("event_type").as("x"), col("t0"))
      .join(ut.select(col("user_id"), col("event_type").as("y"), col("t1")),
        Seq("user_id"))
      .filter(col("x") =!= col("y") && col("t0") < col("t1"))
      .groupBy("x", "y").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(fast === brute)
    // u1 (A..B..A) counts BOTH directions; u2 only B→A; u3 only A→B
    assert(fast(("A", "B")) === 2L && fast(("B", "A")) === 2L)
  }

  test("schedule: dailyTicks spans bounds inclusive") {
    import spark.implicits._
    val bounds = Seq(("2024-03-01", "2024-03-05")).toDF("a", "b")
      .select(to_date(col("a")).as("d0"), to_date(col("b")).as("d1"))
    val n = Schedule.dailyTicks(bounds, col("d0"), col("d1")).count()
    assert(n === 5L)
  }
}
