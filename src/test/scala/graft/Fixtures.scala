package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core.Schemas

/** Reference-shaped weather fixtures (FIXTURES.md §A): raw Open-Meteo
  * response rows with struct-of-parallel-arrays JSON payloads, plus the
  * malformed variants the reference tolerates.
  */
object Fixtures {

  def payloadJson(times: Seq[String], temps: Seq[Any], hums: Seq[Any],
                  precs: Seq[Any], winds: Seq[Any]): String = {
    def arr(xs: Seq[Any]): String = xs.map {
      case null => "null"
      case s: String => s""""$s""""
      case x => x.toString
    }.mkString("[", ",", "]")
    s"""{"hourly":{"time":${arr(times)},"temperature_2m":${arr(temps)},
       |"relative_humidity_2m":${arr(hums)},"precipitation":${arr(precs)},
       |"wind_speed_10m":${arr(winds)}}}""".stripMargin.replaceAll("\n", "")
  }

  /** A happy 3-hour payload starting at the given day/hour. */
  def happyPayload(day: String = "2026-08-01"): String = payloadJson(
    Seq(s"${day}T00:00", s"${day}T01:00", s"${day}T02:00"),
    Seq(20.5, 21.0, 19.8), Seq(55L, 60L, 65L),
    Seq(0.0, 0.2, 0.0), Seq(10.0, 12.5, 9.1))

  def rawRow(city: String, lat: Double, lon: Double, status: Int,
             payload: String, batchId: String = "b1",
             ingestedAt: String = "2026-08-02 06:00:00"): Row =
    Row(s"ing-$city", batchId, Timestamp.valueOf(ingestedAt), "open-meteo",
      city, lat, lon, java.sql.Date.valueOf("2026-08-01"),
      java.sql.Date.valueOf("2026-08-01"), status, payload,
      if (payload == null) 0 else payload.length)

  def rawDf(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.rawResponses)

  /** Standard 3-city raw batch incl. a failed fetch and a null payload. */
  def standardBatch(spark: SparkSession): DataFrame = rawDf(spark, Seq(
    rawRow("Paris", 48.85, 2.35, 200, happyPayload()),
    rawRow("Lyon", 45.76, 4.84, 200, happyPayload()),
    rawRow("Marseille", 43.30, 5.37, 200, happyPayload()),
    rawRow("FailedCity", 1.0, 1.0, 500, null),
    rawRow("NullPayload", 2.0, 2.0, 200, null)))
}
