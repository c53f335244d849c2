package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, Flatten, Quality}
import graft.Fixtures._

class CleaningQualitySpec extends SparkSpec {
  import spark.implicits._

  test("clean drops null rows and dedups (city, ts_utc) deterministically") {
    // same city+hours twice with different ingested_at: later wins
    val raw = rawDf(spark, Seq(
      rawRow("Paris", 48.85, 2.35, 200, happyPayload(),
        ingestedAt = "2026-08-02 06:00:00"),
      rawRow("Paris", 48.85, 2.35, 200,
        payloadJson(Seq("2026-08-01T00:00"), Seq(99.0), Seq(1L), Seq(0.0), Seq(1.0)),
        ingestedAt = "2026-08-03 06:00:00")))
    val out = Cleaning.clean(Flatten.flattenResponses(raw, "b1"))
    assert(out.count() === 3) // 3 distinct hours
    val h0 = out.filter(col("ts_utc") === "2026-08-01 00:00:00").collect()
    assert(h0.length === 1)
    assert(h0(0).getAs[Double]("temperature_c") === 99.0) // latest survives
  }

  test("rows with any null are dropped (P7)") {
    val p = payloadJson(Seq("2026-08-01T00:00", "2026-08-01T01:00"),
      Seq(20.0, null), Seq(50L, 51L), Seq(0.0, 0.1), Seq(5.0, 6.0))
    val out = Cleaning.clean(Flatten.flattenResponses(
      rawDf(spark, Seq(rawRow("X", 0, 0, 200, p))), "b1"))
    assert(out.count() === 1)
  }

  test("requireColumns fails listing the missing columns (P14)") {
    val df = Seq((1, "a")).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Cleaning.requireColumns(df, Seq("x", "z"))
    }
    assert(e.getMessage.contains("z"))
  }

  test("quality gate passes a clean batch") {
    val staged = Cleaning.clean(Flatten.flattenResponses(standardBatch(spark), "b1"))
    val r = Quality.checkWeather(staged, "b1")
    assert(r.passed, r.toString)
    assert(r.totalRows === 9)
    assert(r.duplicateRows === 0)
  }

  test("quality gate fails on range violation with per-column counts") {
    val p = payloadJson(Seq("2026-08-01T00:00"), Seq(120.0), Seq(50L), Seq(0.0), Seq(5.0))
    val staged = Cleaning.clean(Flatten.flattenResponses(
      rawDf(spark, Seq(rawRow("Hot", 0, 0, 200, p))), "b1"))
    val r = Quality.checkWeather(staged, "b1")
    assert(!r.passed)
    assert(r.rangeViolations === Map("temperature_c" -> 1L))
  }

  test("quality gate fails on duplicates (pre-dedup data) and empty input") {
    val flat = Flatten.flattenResponses(rawDf(spark, Seq(
      rawRow("P", 0, 0, 200, happyPayload()),
      rawRow("P", 0, 0, 200, happyPayload(), ingestedAt = "2026-08-03 06:00:00"))), "b1")
    val r = Quality.checkWeather(flat.select(
      graft.core.Schemas.weatherHourlyColumns.map(col): _*), "b1")
    assert(!r.passed)
    assert(r.duplicateRows === 3) // 3 keys each with 1 excess row

    val empty = Cleaning.clean(Flatten.flattenResponses(
      rawDf(spark, Seq(rawRow("X", 0, 0, 500, null))), "b1"))
    assert(!Quality.checkWeather(empty, "b1").passed)
  }

  test("quality gate soundness (property): any injected violation => FAIL") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val gen = Gen.oneOf("null_temp", "dup", "range_hum", "range_wind")
    def row(temp: Any = 20.0, hum: Any = 50, wind: Any = 10.0) =
      org.apache.spark.sql.Row("b1", "C", 1.0, 2.0,
        java.sql.Timestamp.valueOf("2026-08-01 00:00:00"), temp, hum, 0.0,
        wind, java.sql.Timestamp.valueOf("2026-08-02 00:00:00"))
    val prop = forAll(gen) { kind =>
      val bad: Seq[org.apache.spark.sql.Row] = kind match {
        case "null_temp" => Seq(row(temp = null))
        case "dup" => Seq(row(), row())
        case "range_hum" => Seq(row(hum = 101))
        case "range_wind" => Seq(row(wind = 999.0))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(bad), graft.core.Schemas.weatherHourly)
      !Quality.checkWeather(df, "b1").passed
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(8))
    assert(res.passed, res.status.toString)
  }
}
