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

  test("schedule: dailyTicks spans bounds inclusive") {
    import spark.implicits._
    val bounds = Seq(("2024-03-01", "2024-03-05")).toDF("a", "b")
      .select(to_date(col("a")).as("d0"), to_date(col("b")).as("d1"))
    val n = Schedule.dailyTicks(bounds, col("d0"), col("d1")).count()
    assert(n === 5L)
  }
}
