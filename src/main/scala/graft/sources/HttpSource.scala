package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.{Date, Timestamp}
import java.time.LocalDate
import scala.util.control.NonFatal
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core.Schemas

/** S1 — the live HTTP ingestion client, with the reference's exact
  * retry policy (/root/reference/ingestion/fetch_data.py:71-84):
  * 5 retries, backoff factor 0.5 (0.5s, 1s, 2s, 4s, 8s), retry only on
  * 429/500/502/503/504 (and transport errors), GET only, 30 s timeout,
  * and the tolerant decode of fetch_data.py:180-186 — a non-200 status
  * or unparseable body yields a NULL payload row, never an exception
  * (the raw layer records failures; the quality gate judges them).
  *
  * The engine's queries stay fixture-first (zero-egress environment —
  * WeatherDemo.syntheticRaw): this client is the production ingestion
  * path, unit-tested against an in-process stub server.
  */
object HttpSource {

  /** Mirror of urllib3's `Retry(total=5, backoff_factor=0.5,
    * status_forcelist=(429,500,502,503,504))`.
    */
  final case class RetryPolicy(
      maxRetries: Int = 5,
      backoffFactor: Double = 0.5,
      retryStatuses: Set[Int] = Set(429, 500, 502, 503, 504),
      timeoutMs: Long = 30000)

  /** Outcome of one logical GET: final status (-1 = transport error on
    * the last attempt), the body when the final attempt produced one,
    * and how many attempts were made.
    */
  final case class FetchResult(status: Int, body: Option[String],
                               attempts: Int)

  /** urllib3 backoff: factor · 2^(retryNumber-1), in milliseconds. */
  def backoffMs(policy: RetryPolicy, retryNumber: Int): Long =
    (policy.backoffFactor * math.pow(2, retryNumber - 1) * 1000).toLong

  /** Blocking GET with retry; `sleeper` is injectable so tests assert
    * the backoff schedule without waiting it out.
    */
  final class Fetcher(policy: RetryPolicy = RetryPolicy(),
                      sleeper: Long => Unit = Thread.sleep) {
    private val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(policy.timeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

    def get(url: String): FetchResult = {
      var attempt = 0 // number of FINISHED attempts
      var last = FetchResult(-1, None, 0)
      while (attempt <= policy.maxRetries) {
        if (attempt > 0) sleeper(backoffMs(policy, attempt))
        val outcome =
          try {
            val req = HttpRequest.newBuilder(URI.create(url))
              .timeout(java.time.Duration.ofMillis(policy.timeoutMs))
              .GET().build()
            val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
            Some(resp)
          } catch { case NonFatal(_) => None } // transport error: retryable
        attempt += 1
        outcome match {
          case Some(r) if !policy.retryStatuses.contains(r.statusCode()) =>
            return FetchResult(r.statusCode(), Option(r.body()), attempt)
          case Some(r) =>
            last = FetchResult(r.statusCode(), Option(r.body()), attempt)
          case None =>
            last = FetchResult(-1, None, attempt)
        }
      }
      last
    }
  }

  /** `resp.json() if status == 200 else None` with the except-ValueError
    * guard (fetch_data.py:180-186): payload survives only when the
    * status is 200 AND the body parses as JSON.
    */
  def tolerantJsonPayload(r: FetchResult): Option[String] =
    r.body.filter(_ => r.status == 200).filter { b =>
      try { new com.fasterxml.jackson.databind.ObjectMapper().readTree(b); true }
      catch { case NonFatal(_) => false }
    }

  final case class Location(city: String, latitude: Double, longitude: Double)

  /** Open-Meteo archive URL for one location/date-range
    * (fetch_data.py:168-175) against a configurable base (tests point
    * it at the stub server).
    */
  def archiveUrl(base: String, loc: Location,
                 start: LocalDate, end: LocalDate): String =
    s"$base?latitude=${loc.latitude}&longitude=${loc.longitude}" +
      s"&start_date=$start&end_date=$end" +
      "&hourly=temperature_2m,relative_humidity_2m,precipitation,wind_speed_10m" +
      "&timezone=UTC"

  /** Fetch every location and land one raw-response row each, in the
    * exact `raw.open_meteo_responses` shape (S2/S3). The per-location
    * loop is driver-side BY DESIGN: locations number in the dozens (the
    * reference iterates a config list); the heavy data is the payload
    * CONTENT, which Spark parses/explodes executor-side downstream.
    */
  def fetchBatch(spark: SparkSession, fetcher: Fetcher, baseUrl: String,
                 locations: Seq[Location], batchId: String,
                 start: LocalDate, end: LocalDate): DataFrame = {
    val now = Timestamp.from(java.time.Instant.now())
    val rows = locations.map { loc =>
      val res = fetcher.get(archiveUrl(baseUrl, loc, start, end))
      val payload = tolerantJsonPayload(res)
      val bytes = res.body.map(_.getBytes("UTF-8").length).getOrElse(0)
      Row(java.util.UUID.randomUUID().toString, batchId, now,
        "open-meteo-archive", loc.city, loc.latitude, loc.longitude,
        Date.valueOf(start), Date.valueOf(end),
        res.status, payload.orNull, bytes)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.rawResponses)
  }
}
