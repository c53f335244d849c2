package graft

import org.apache.spark.sql.functions._
import graft.functions.{Redaction, UrlFunctions}
import graft.operators.Quality
import graft.streaming.EventsStream

/** The round-5 curation operators: PII scrub, URL canonicalization,
  * percentile-band trim, and the stream–stream left-outer interval
  * join. The driver oracles (q90–q93) replay each on the real tables;
  * this spec pins the semantics on hand-built edge cases the synthetic
  * corpus can't produce.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redaction: counts and replacements for mixed PII, " +
    "negatives untouched") {
    val text = "mail a.b-c_1%x@sub.example.co or x@y.io, " +
      "call 555-867-5309 / 555.123.4567, host 10.0.255.7; " +
      "not-pii: 12-34, ver 1.2, a@b (no tld)"
    val r = Redaction.scrub(Seq(text).toDF("text"), "text").collect().head
    assert(r.getAs[Int]("n_emails") === 2)
    assert(r.getAs[Int]("n_phones") === 2)
    assert(r.getAs[Int]("n_ips") === 1)
    val red = r.getAs[String]("redacted")
    assert(red === "mail <EMAIL> or <EMAIL>, call <PHONE> / <PHONE>, " +
      "host <IP>; not-pii: 12-34, ver 1.2, a@b (no tld)")
  }

  test("url canonicalization: scheme/case/www/port/query/fragment/" +
    "trailing-slash noise collapses; registered domain extracted") {
    val rows = Seq(
      "https://WWW.Sub.Example.COM:8080/a/b/?q=1&r=2#frag",
      "http://sub.example.com/a/b",
      "https://example.org",
      "http://example.org/?only=query").toDF("url")
      .select(UrlFunctions.normalizeUrl(col("url")).as("norm"),
        UrlFunctions.registeredDomain(col("url")).as("domain"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) === (("sub.example.com/a/b", "example.com")))
    assert(rows(1) === (("sub.example.com/a/b", "example.com")),
      "the two spellings of the same page must canonicalize equal")
    assert(rows(2) === (("example.org", "example.org")))
    assert(rows(3) === (("example.org", "example.org")))
  }

  test("quantileBand keeps exactly the inner rank band per group") {
    val df = (1 to 100).map(i => ("g", i.toLong, i)).toDF("src", "id", "v")
    val kept = Quality.quantileBand(df, "src", "v", "id", 0.05, 0.95)
      .select("v").as[Int].collect().sorted
    // percent_rank = (rank-1)/99: >= 0.05 ⇒ rank ≥ 5.95 ⇒ 6;
    // <= 0.95 ⇒ rank ≤ 95.05 ⇒ 95
    assert(kept.head === 6 && kept.last === 95 && kept.length === 90)
  }

  test("scd2: change log becomes closed intervals, consecutive " +
    "duplicates suppressed, open tail is current") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "bronze"), // re-asserted, no row
      (1L, ts("2024-01-03 00:00:00"), 3L, "silver"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "gold"),
      (2L, ts("2024-01-01 00:00:00"), 5L, "gold"))
      .toDF("user_id", "ts", "event_id", "tier")
    val hist = graft.operators.Scd2.fromChangeLog(log,
      "user_id", "ts", "event_id", "tier")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("tier"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.toString),
        r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._3.getOrElse("9999")))
    assert(hist.length === 4, s"expected 4 intervals, got ${hist.toSeq}")
    assert(hist(0) === ((1L, "bronze", Some("2024-01-03 00:00:00.0"), false)))
    assert(hist(1) === ((1L, "silver", Some("2024-01-04 00:00:00.0"), false)))
    assert(hist(2) === ((1L, "gold", None, true)))
    assert(hist(3) === ((2L, "gold", None, true)))
  }

  test("span dedup: copied spans attribute to the earliest doc, " +
    "originals stay clean") {
    val a = (1 to 16).map(i => s"w$i").mkString(" ") // 2 spans of 8
    val b = (1 to 8).map(i => s"w$i").mkString(" ") +
      " x1 x2 x3 x4 x5 x6 x7 x8" // first span copied from doc 0
    val c = "y1 y2 y3" // single short span, unique
    val df = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "text")
    val got = graft.operators.SpanDedup
      .dupSpanStats(df, "doc_id", "text", spanTokens = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got(0L) === ((2L, 0L, 0.0)), "the original was blamed")
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((1L, 0L, 0.0)))
  }

  test("exact-substring dedup: arbitrary-offset copies resolve to " +
    "maximal islands; intra-doc repeats and whole-doc copies flagged; " +
    "originals and short docs clean") {
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val b = "z1 z2 " + (3 to 14).map(i => s"a$i").mkString(" ") +
      " u1 u2 u3" // 12 tokens of doc 0 at offset 2 — not span-aligned
    val c = a // whole-doc copy
    val rep = "b1 b2 b3 b4 b5 b6 b7 b8"
    val dd = rep + " c1 c2 " + rep // intra-doc repeat at offset 10
    val df = Seq((0L, a), (1L, b), (2L, c), (3L, dd), (4L, "s1 s2 s3"))
      .toDF("doc_id", "text")
    val got = graft.operators.SpanDedup
      .exactSubstrIntervals(df, "doc_id", "text", minTokens = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("span_tokens"))).toSet
    assert(got === Set((1L, 2L, 12L), (2L, 0L, 20L), (3L, 10L, 8L)))

    // APPLY: islands excised, earliest copies survive whole, a
    // whole-doc duplicate reduces to empty
    val applied = graft.operators.SpanDedup
      .exactSubstrApply(df, "doc_id", "text", minTokens = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens_orig"), r.getAs[Long]("n_tokens_kept"),
          r.getAs[String]("text_kept")))).toMap
    assert(applied(0L) === ((20L, 20L, a)), "the original must survive")
    assert(applied(1L) === ((17L, 5L, "z1 z2 u1 u2 u3")))
    assert(applied(2L) === ((20L, 0L, "")))
    assert(applied(3L) === ((18L, 10L, rep + " c1 c2")))
    assert(applied(4L) === ((3L, 3L, "s1 s2 s3")))
  }

  test("stream-stream left outer join emits null-padded unmatched " +
    "purchases once the watermark finalizes them") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val dir = tmpDir("louter")
    Seq(
      // user 1: error 10 min before purchase -> matched
      (1L, ts("2024-01-01 00:00:00"), 1L, "error", 0.0, "{}"),
      (2L, ts("2024-01-01 00:10:00"), 1L, "purchase", 5.0, "{}"),
      // user 2: error 2h before purchase -> outside interval, null row
      (3L, ts("2024-01-01 00:00:00"), 2L, "error", 0.0, "{}"),
      (4L, ts("2024-01-01 02:00:00"), 2L, "purchase", 5.0, "{}"),
      // far-future sentinels ON THE JOINED STREAMS: the watermark is
      // computed downstream of the event_type filters, so a filtered-
      // out row can't advance it. The error sentinel pushes the
      // error-side watermark past purchase 4, finalizing its null row;
      // the purchase sentinel itself stays inside the unfinalized
      // horizon and must NOT appear in the output.
      (8L, ts("2024-01-02 00:00:00"), 8L, "error", 0.0, "{}"),
      (9L, ts("2024-01-02 00:00:00"), 9L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    def src = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val out = EventsStream.runToTable(spark,
      EventsStream.purchaseErrorLeftJoin(
        src.filter(col("event_type") === "purchase"),
        src.filter(col("event_type") === "error")),
      "t_louter",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getAs[Long]("p_event_id"),
        Option(r.getAs[java.lang.Long]("e_event_id")).map(_.toLong)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((2L, Some(1L)), (4L, None)),
      s"expected one matched and one null-padded row, got ${out.toSeq}")
  }

  test("boilerplate stats: cross-doc phrases counted, unique text not; " +
    "fraction is exact") {
    val boiler = "subscribe to our newsletter today"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $boiler"),
      (2L, s"epsilon zeta eta theta $boiler"),
      (3L, s"iota kappa lambda mu $boiler"),
      (4L, "nu xi omicron pi rho sigma tau")).toDF("doc_id", "text")
    val out = graft.operators.Boilerplate
      .stats(docs, "text", "doc_id", n = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // each of docs 1-3: 9 tokens → 7 trigrams; the 3 trigrams fully
    // inside the 5-token boiler phrase occur in all 3 docs
    assert(out(1L) === ((7L, 3L, 3.0 / 7.0)))
    assert(out(2L) === ((7L, 3L, 3.0 / 7.0)))
    assert(out(3L) === ((7L, 3L, 3.0 / 7.0)))
    assert(out(4L) === ((5L, 0L, 0.0)))
  }

  test("cdc snapshot: last write wins per key, final delete removes " +
    "the key, ties broken by tie column") {
    val feed = Seq(
      // k1: I then two updates — last (t3) wins
      (1L, 1L, 10L, "I", 1.0),
      (1L, 2L, 11L, "U", 2.0),
      (1L, 3L, 12L, "U", 3.0),
      // k2: inserted then deleted — gone
      (2L, 1L, 20L, "I", 9.0),
      (2L, 2L, 21L, "D", 0.0),
      // k3: delete then REinserted — survives with the later insert
      (3L, 1L, 30L, "D", 0.0),
      (3L, 2L, 31L, "I", 7.0),
      // k4: same seq, tie column decides (higher tie wins)
      (4L, 5L, 40L, "U", 1.5),
      (4L, 5L, 41L, "U", 2.5)
    ).toDF("k", "seq", "tie", "op", "v")
    val snap = graft.operators.ChangeFeed
      .snapshot(feed, "k", "seq", "tie", "op", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(snap.keySet === Set(1L, 3L, 4L))
    assert(snap(1L) === ((3L, 12L, 3.0)))
    assert(snap(3L) === ((2L, 31L, 7.0)))
    assert(snap(4L) === ((5L, 41L, 2.5)))
  }

  test("cdc applyTo: matched-update, matched-delete, not-matched-" +
    "insert, untouched base rows, multi-change collapse") {
    val base = Seq((1L, 100.0), (2L, 200.0), (9L, 900.0))
      .toDF("k", "v")
    val feed = Seq(
      (1L, 1L, 10L, "U", 111.0),  // matched update
      (2L, 1L, 20L, "D", 0.0),    // matched delete
      (5L, 1L, 50L, "I", 555.0),  // not-matched insert
      (7L, 1L, 70L, "U", 700.0),  // doubly-changed: seq 2 wins
      (7L, 2L, 71L, "U", 777.0)
      // k9 untouched
    ).toDF("k", "seq", "tie", "op", "v")
    val out = graft.operators.ChangeFeed
      .applyTo(base, feed, "k", "seq", "tie", "op", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 111.0, 5L -> 555.0, 7L -> 777.0,
      9L -> 900.0))
  }
}
