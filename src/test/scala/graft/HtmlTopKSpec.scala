package graft

import org.apache.spark.sql.functions._
import graft.operators.Html
import graft.functions.{GraftFunctions, KmvSketch}

/** Round-5b additions: HTML extraction, bounded top-k aggregate, KMV
  * set-operation estimates.
  */
class HtmlTopKSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------------- Html

  test("html: script/style/comment content dropped, tags stripped, " +
    "entities decoded once, whitespace collapsed") {
    val html =
      """<html><head><style>body { color: red; }</style></head>
        |<body><h1 class="big">Title</h1>
        |<!-- secret comment -->
        |<p>one &amp; two &lt;three&gt; &amp;lt;not-twice&amp;gt;</p>
        |<script type="text/javascript">if (a < b) { alert("x"); }</script>
        |<p>tail&nbsp;text</p></body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(Html.extractText($"h").as("t")).head().getString(0)
    assert(out === "Title one & two <three> &lt;not-twice&gt; tail text")
    assert(!out.contains("alert"), "script content must not leak")
    assert(!out.contains("color"), "style content must not leak")
    assert(!out.contains("secret"), "comment content must not leak")
  }

  test("html: unclosed-tag and plain-text inputs survive") {
    val rows = Seq("no markup at all", "broken <b>tag", "<p>just</p>")
      .toDF("h").select(Html.extractText($"h").as("t"))
      .as[String].collect()
    assert(rows === Seq("no markup at all", "broken tag", "just"))
  }

  // ---------------------------------------------------------------- TopK

  test("topk: equals the window idiom, ties cut by id, " +
    "partitioning-invariant") {
    GraftFunctions.ensureRegistered(spark)
    val df = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_type", $"event_id",
        round($"value" * 100).cast("long").as("cents"))

    def viaTopK(partitions: Int): Array[(String, Long, Long)] = df
      .repartition(partitions)
      .groupBy("event_type")
      .agg(call_function("graft_topk", $"cents", $"event_id", lit(5))
        .as("tk"))
      .select($"event_type", explode($"tk").as("e"))
      .select($"event_type", $"e.score", $"e.id")
      .as[(String, Long, Long)].collect().sortBy(identity)

    val viaWindow = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy($"cents".desc, $"event_id")))
      .filter($"rn" <= 5)
      .select($"event_type", $"cents", $"event_id")
      .as[(String, Long, Long)].collect().sortBy(identity)

    assert(viaTopK(7) === viaWindow)
    assert(viaTopK(1) === viaTopK(13), "partitioning must not change top-k")
  }

  test("topk: duplicate scores ranked by id; fewer rows than k; nulls skip") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      ("g", 10L, 1L), ("g", 10L, 2L), ("g", 9L, 3L)
    ).toDF("grp", "s", "i")
      .union(Seq(("g", 0L, 0L)).toDF("grp", "s", "i")
        .select($"grp", lit(null).cast("long").as("s"), $"i"))
    val out = df.groupBy("grp")
      .agg(call_function("graft_topk", $"s", $"i", lit(10)).as("tk"))
      .select(explode($"tk").as("e")).select($"e.score", $"e.id")
      .as[(Long, Long)].collect()
    assert(out === Array((10L, 1L), (10L, 2L), (9L, 3L)))
  }

  // ---------------------------------------------------------- KmvSetOps

  test("kmv setops: exact when both sketches are unsaturated") {
    GraftFunctions.ensureRegistered(spark)
    val df = (1 to 300).map(i => (i, i + 100)).toDF("a", "b")
    val row = df.agg(
        KmvSketch.sketchArray($"a", 1024).as("ska"),
        KmvSketch.sketchArray($"b", 1024).as("skb"))
      .select(call_function("graft_kmv_setops", $"ska", $"skb", lit(1024))
        .as("e"))
      .select($"e.est_a", $"e.est_b", $"e.est_union", $"e.est_intersect")
      .head()
    // A = 1..300, B = 101..400: union 400, intersection 200
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) === ((300L, 300L, 400L, 200L)))
  }

  test("kmv setops: saturated estimates within 3σ; deterministic " +
    "under repartition") {
    GraftFunctions.ensureRegistered(spark)
    val k = 256
    val n = 20000
    // A = 0..19999, B = 10000..29999 → union 30000, intersect 10000
    val df = (0 until n).map(i => (i.toLong, (i + n / 2).toLong))
      .toDF("a", "b")
    def run(parts: Int) = df.repartition(parts).agg(
        KmvSketch.sketchArray($"a", k).as("ska"),
        KmvSketch.sketchArray($"b", k).as("skb"))
      .select(call_function("graft_kmv_setops", $"ska", $"skb", lit(k))
        .as("e"))
      .select($"e.est_union", $"e.est_intersect", $"e.jaccard_est")
      .head()
    val r = run(8)
    val estU = r.getLong(0); val estI = r.getLong(1)
    assert(math.abs(estU - 30000.0) / 30000.0 < 0.20,
      s"union est $estU too far from 30000")
    assert(math.abs(estI - 10000.0) / 10000.0 < 0.35,
      s"intersect est $estI too far from 10000")
    assert(r === run(3), "sketch algebra must be partitioning-invariant")
  }

  test("kmv setops: mismatched k fails loudly") {
    GraftFunctions.ensureRegistered(spark)
    val df = (1 to 500).map(i => Tuple1(i)).toDF("a")
    val ex = intercept[Exception] {
      df.agg(KmvSketch.sketchArray($"a", 256).as("sk"))
        .select(call_function("graft_kmv_setops", $"sk", $"sk", lit(64)))
        .head()
    }
    assert(ex.getMessage != null)
  }
}
