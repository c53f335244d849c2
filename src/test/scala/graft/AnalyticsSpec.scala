package graft

import java.nio.file.Files

/** Hand-computed semantics for the analytics query entries
  * (q105–q107), driven through `SparkEntry.queries` against a
  * fixture table dir shaped like the driver's testdata (events.ts is
  * physically INT64 nanoseconds, matching `Tables.events`).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ns(sec: Long): Long = sec * 1000000000L
  private val base = 1700000000L

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_analytics_").toString
    Seq(
      // u1: click 1 h before purchase → attributed, latency 3600
      (1L, ns(base), 1L, "click", 1.0, "{}"),
      (2L, ns(base + 3600), 1L, "purchase", 10.0, "{}"),
      // u2: click 400 h before purchase → stale (> 72 h) → null
      (3L, ns(base), 2L, "click", 1.0, "{}"),
      (4L, ns(base + 400L * 3600), 2L, "purchase", 10.0, "{}"),
      // u3: purchase with no click at all → null
      (5L, ns(base), 3L, "purchase", 10.0, "{}"),
      // u4: two clicks at the SAME ts → larger event_id wins
      (6L, ns(base + 100), 4L, "click", 1.0, "{}"),
      (7L, ns(base + 100), 4L, "click", 1.0, "{}"),
      (8L, ns(base + 1900), 4L, "purchase", 5.0, "{}"),
      // u10: 7-day RANGE frame boundaries (604800 s window, inclusive)
      (10L, ns(base), 10L, "view", 1.5, "{}"),
      (11L, ns(base + 604800), 10L, "view", 2.5, "{}"),
      (12L, ns(base + 604801), 10L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    Seq(
      ("O", "1-URGENT", 100.0),
      ("O", "2-HIGH", 50.0),
      ("F", "1-URGENT", 25.0)
    ).toDF("o_orderstatus", "o_orderpriority", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    d
  }

  test("q105 funnel: in-window click attributed with latency, stale " +
    "and absent clicks yield null, equal-ts ties go to the larger id") {
    val out = SparkEntry.queries("q105_funnel_attribution")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out(2L) === ((Some(1L), Some(3600L))))
    assert(out(4L) === ((None, None))) // stale
    assert(out(5L) === ((None, None))) // no click
    assert(out(8L) === ((Some(7L), Some(1800L)))) // tie → id 7
  }

  test("q106 rolling 7d: RANGE frame includes the exact-boundary row " +
    "and drops it one second later; cents are exact") {
    val out = SparkEntry.queries("q106_rolling_7d")(spark, dir)
      .filter($"user_id" === 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(10L) === ((1L, 150L)))
    assert(out(11L) === ((2L, 400L))) // base row still inside at +604800
    assert(out(12L) === ((2L, 350L))) // base row aged out at +604801
  }

  test("q107 grouping sets: three rollup shapes in one pass, grouping " +
    "indicators disambiguate") {
    val rows = SparkEntry.queries("q107_grouping_sets")(spark, dir)
      .collect().map(r => ((Option(r.getString(0)), Option(r.getString(1)),
        r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5))))
      .toSet
    assert(rows === Set(
      (Some("O"), None, 0, 1, 2L, 150.0),
      (Some("F"), None, 0, 1, 1L, 25.0),
      (None, Some("1-URGENT"), 1, 0, 2L, 125.0),
      (None, Some("2-HIGH"), 1, 0, 1L, 50.0),
      (None, None, 1, 1, 3L, 175.0)))
  }
}
