package graft

import org.apache.spark.sql.functions._
import graft.operators.Flatten
import graft.Fixtures._

class FlattenSpec extends SparkSpec {

  test("happy path: 3 cities x 3 hours -> 9 rows with broadcast constants") {
    val out = Flatten.flattenResponses(standardBatch(spark), "b1")
    assert(out.count() === 9)
    val paris = out.filter(col("city") === "Paris")
      .orderBy("ts_utc").collect()
    assert(paris.length === 3)
    assert(paris(0).getAs[Double]("temperature_c") === 20.5)
    assert(paris(0).getAs[Int]("relative_humidity_pct") === 55)
    assert(paris(0).getAs[Double]("latitude") === 48.85)
    assert(paris(0).getAs[java.sql.Timestamp]("ts_utc").toString
      === "2026-08-01 00:00:00.0")
    assert(out.columns.toSeq === graft.core.Schemas.weatherHourlyColumns)
  }

  test("non-200 and null payloads are filtered out (P2)") {
    val out = Flatten.flattenResponses(standardBatch(spark), "b1")
    assert(out.filter(col("city").isin("FailedCity", "NullPayload")).count() === 0)
  }

  test("missing hourly key -> zero rows (clean_data.py:60-61 parity)") {
    val raw = rawDf(spark, Seq(rawRow("X", 0, 0, 200, """{"other": 1}""")))
    assert(Flatten.flattenResponses(raw, "b1").count() === 0)
  }

  test("ragged arrays null-pad to the longest array") {
    val p = payloadJson(
      Seq("2026-08-01T00:00", "2026-08-01T01:00"),
      Seq(20.0), Seq(50L, 51L), Seq(0.0, 0.1), Seq(5.0, 6.0))
    val out = Flatten.flattenResponses(rawDf(spark, Seq(rawRow("X", 0, 0, 200, p))), "b1")
    assert(out.count() === 2)
    assert(out.filter(col("temperature_c").isNull).count() === 1)
  }

  test("malformed timestamp -> null (strict=False parity)") {
    val p = payloadJson(Seq("not-a-time"), Seq(20.0), Seq(50L), Seq(0.0), Seq(5.0))
    val out = Flatten.flattenResponses(rawDf(spark, Seq(rawRow("X", 0, 0, 200, p))), "b1")
    assert(out.count() === 1)
    assert(out.filter(col("ts_utc").isNull).count() === 1)
  }

  test("null entries inside metric arrays survive as nulls") {
    val p = payloadJson(Seq("2026-08-01T00:00", "2026-08-01T01:00"),
      Seq(20.0, null), Seq(50L, 51L), Seq(0.0, 0.1), Seq(5.0, 6.0))
    val out = Flatten.flattenResponses(rawDf(spark, Seq(rawRow("X", 0, 0, 200, p))), "b1")
    assert(out.filter(col("temperature_c").isNull).count() === 1)
  }
}
