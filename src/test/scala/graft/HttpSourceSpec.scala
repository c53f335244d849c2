package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.HttpSource
import graft.sources.HttpSource.{Fetcher, Location, RetryPolicy}

/** Exercises the live HTTP client's retry/timeout/decode policy
  * (fetch_data.py:71-84,180-186) against an in-process stub server —
  * the zero-egress stand-in for the real Open-Meteo endpoint.
  */
class HttpSourceSpec extends SparkSpec {

  private def withServer(routes: Map[String, HttpExchange => Unit])
                        (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) =>
        try handler(ex) finally ex.close())
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  test("clean 200: one attempt, JSON payload kept") {
    withServer(Map("/ok" -> (respond(_, 200, """{"hourly":{}}""")))) { base =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val f = new Fetcher(RetryPolicy(), sleeps.append(_))
      val r = f.get(s"$base/ok")
      assert(r.status === 200)
      assert(r.attempts === 1)
      assert(sleeps.isEmpty)
      assert(HttpSource.tolerantJsonPayload(r) === Some("""{"hourly":{}}"""))
    }
  }

  test("503,503,200: retried with doubling backoff (0.5s factor)") {
    val calls = new AtomicInteger(0)
    withServer(Map("/flaky" -> { ex =>
      if (calls.incrementAndGet() <= 2) respond(ex, 503, "try later")
      else respond(ex, 200, """{"ok":true}""")
    })) { base =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val f = new Fetcher(RetryPolicy(), sleeps.append(_))
      val r = f.get(s"$base/flaky")
      assert(r.status === 200)
      assert(r.attempts === 3)
      assert(sleeps.toSeq === Seq(500L, 1000L)) // 0.5·2^0, 0.5·2^1
      assert(HttpSource.tolerantJsonPayload(r).isDefined)
    }
  }

  test("404 is NOT retried; payload null (tolerant decode)") {
    val calls = new AtomicInteger(0)
    withServer(Map("/gone" -> { ex =>
      calls.incrementAndGet(); respond(ex, 404, "not found")
    })) { base =>
      val f = new Fetcher(RetryPolicy(), _ => ())
      val r = f.get(s"$base/gone")
      assert(r.status === 404)
      assert(r.attempts === 1)
      assert(calls.get() === 1)
      assert(HttpSource.tolerantJsonPayload(r) === None)
    }
  }

  test("persistent 429: exhausts 5 retries then reports the last status") {
    val calls = new AtomicInteger(0)
    withServer(Map("/limited" -> { ex =>
      calls.incrementAndGet(); respond(ex, 429, "slow down")
    })) { base =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val f = new Fetcher(RetryPolicy(), sleeps.append(_))
      val r = f.get(s"$base/limited")
      assert(r.status === 429)
      assert(r.attempts === 6) // 1 original + 5 retries
      assert(calls.get() === 6)
      assert(sleeps.toSeq === Seq(500L, 1000L, 2000L, 4000L, 8000L))
      assert(HttpSource.tolerantJsonPayload(r) === None)
    }
  }

  test("200 with unparseable body: payload null, status preserved") {
    withServer(Map("/garbled" -> (respond(_, 200, "<html>not json")))) { base =>
      val f = new Fetcher(RetryPolicy(), _ => ())
      val r = f.get(s"$base/garbled")
      assert(r.status === 200)
      assert(HttpSource.tolerantJsonPayload(r) === None)
    }
  }

  test("connection refused counts as retryable transport error") {
    // a port with no listener: every attempt fails at the transport
    // layer, so all 5 retries burn and status is -1
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val f = new Fetcher(RetryPolicy(), sleeps.append(_))
    val r = f.get("http://127.0.0.1:1/nope")
    assert(r.status === -1)
    assert(r.attempts === 6)
    assert(sleeps.size === 5)
  }

  test("fetchBatch lands one raw-responses row per location, failures " +
    "as NULL-payload rows") {
    withServer(Map("/v1/archive" -> { ex =>
      val q = ex.getRequestURI.getQuery
      if (q.contains("latitude=1.0")) respond(ex, 200, """{"hourly":{"time":[]}}""")
      else respond(ex, 404, "no such location")
    })) { base =>
      val f = new Fetcher(RetryPolicy(), _ => ())
      val out = HttpSource.fetchBatch(spark, f, s"$base/v1/archive",
        Seq(Location("good_city", 1.0, 2.0), Location("bad_city", 9.0, 9.0)),
        "batch-1", java.time.LocalDate.parse("2026-08-01"),
        java.time.LocalDate.parse("2026-08-02"))
      assert(out.schema === graft.core.Schemas.rawResponses)
      val rows = out.collect().map(r =>
        r.getAs[String]("city") ->
          (r.getAs[Int]("http_status"), r.getAs[String]("payload"))).toMap
      assert(rows("good_city")._1 === 200)
      assert(rows("good_city")._2 === """{"hourly":{"time":[]}}""")
      assert(rows("bad_city")._1 === 404)
      assert(rows("bad_city")._2 === null)
    }
  }
}
