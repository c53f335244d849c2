package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core.Schemas

/** Deterministic synthetic raw weather batch used by the
  * `q18_weather_pipeline` driver query (the zero-egress stand-in for the
  * reference's Open-Meteo HTTP source — SURVEY §2.1 S1: the fetch stays
  * outside the query engine and lands as a DataFrame).
  */
object WeatherDemo {

  def syntheticRaw(spark: SparkSession, cities: Int, hours: Int): DataFrame = {
    val rows = (0 until cities).map { c =>
      val times = (0 until hours).map { h =>
        f"2026-08-${h / 24 + 1}%02dT${h % 24}%02d:00"
      }
      def series(base: Double, amp: Double): Seq[Double] =
        (0 until hours).map(h => base + amp * math.sin((c + 1) * h / 7.0))
      val hum = (0 until hours).map(h => 40L + ((c * 13 + h * 7) % 55))
      val payload =
        s"""{"hourly":{"time":[${times.map("\"" + _ + "\"").mkString(",")}],
           |"temperature_2m":[${series(15 + c, 8).mkString(",")}],
           |"relative_humidity_2m":[${hum.mkString(",")}],
           |"precipitation":[${series(1.0, 0.9).map(v => math.max(0, v)).mkString(",")}],
           |"wind_speed_10m":[${series(20, 10).mkString(",")}]}}""".stripMargin
          .replaceAll("\n", "")
      Row(s"ing-$c", "demo-batch", Timestamp.valueOf("2026-08-03 06:00:00"),
        "synthetic", s"city_$c", 40.0 + c, 2.0 + c,
        Date.valueOf("2026-08-01"), Date.valueOf("2026-08-02"),
        200, payload, payload.length)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.rawResponses)
  }
}
