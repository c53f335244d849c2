package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Integer PageRank, MAD outliers, PSI drift, streaming digest
  * quantile (q119–q122).
  */
class GraphDriftSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hand-computed 3-node graph + isolated node, " +
    "partitioning-invariant") {
    // a -> b -> c -> a  (cycle), d isolated
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = PageRank.run(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // symmetric cycle: every round pr = 150000 + 850*1000000/1000 = 1M
    assert(pr(1L) === 1000000L && pr(2L) === 1000000L &&
      pr(3L) === 1000000L)
    assert(pr(4L) === 150000L, "isolated node keeps teleport mass only")

    val pr2 = PageRank.run(nodes.repartition(3), edges.repartition(2),
      iters = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr === pr2, "integer arithmetic must be partitioning-invariant")
  }

  test("pagerank: authority flows to the hub") {
    // star: 1..4 all point at 5; 5 points at 1
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val pr = PageRank.run(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(5L) > pr(1L) && pr(1L) > pr(2L),
      s"hub > its target > leaves: $pr")
    assert(pr(2L) === pr(3L) && pr(3L) === pr(4L), "leaves symmetric")
  }

  test("mad outliers: planted outlier flagged, clean data not") {
    val vals = (1 to 99).map(_.toDouble) :+ 10000.0
    val df = vals.map(("t", _)).toDF("event_type", "value")
    val med = df.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val mad = df.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(first(col("med")).as("med"),
        round(expr("percentile(round(abs(value - med), 6), 0.5)"), 6)
          .as("mad"))
    val out = df.join(broadcast(mad), "event_type")
      .filter(round(abs(col("value") - col("med")), 6) >
        lit(3.0) * col("mad"))
      .select("value").as[Double].collect()
    assert(out.toSeq === Seq(10000.0),
      "exactly the planted outlier must be flagged")
  }

  test("psi drift: identical halves score ~0, a shifted half scores big") {
    def psi(ref: Seq[Double], cur: Seq[Double]): Double = {
      val all = ref.map(("ref", _)) ++ cur.map(("cur", _))
      val df = all.toDF("half", "value")
      val b = df.filter($"half" === "ref").agg(
        round(expr("percentile(value, 0.25)"), 6).as("c1"),
        round(expr("percentile(value, 0.5)"), 6).as("c2"),
        round(expr("percentile(value, 0.75)"), 6).as("c3"))
      val binned = df.crossJoin(broadcast(b))
        .withColumn("bin", when($"value" <= $"c1", 0)
          .when($"value" <= $"c2", 1).when($"value" <= $"c3", 2)
          .otherwise(3))
        .groupBy("bin")
        .agg(sum(when($"half" === "ref", 1L).otherwise(0L)).as("nr"),
          sum(when($"half" === "cur", 1L).otherwise(0L)).as("nc"))
      val Seq(tr, tc) = Seq("nr", "nc").map(c =>
        binned.agg(sum(c)).head().getLong(0).toDouble)
      binned.collect().map { r =>
        val p = r.getLong(1) / tr; val q = r.getLong(2) / tc
        (p - q) * math.log((p + 1e-6) / (q + 1e-6))
      }.sum
    }
    val base = (1 to 200).map(_ % 40 + 0.5)
    assert(math.abs(psi(base, base)) < 1e-9, "identical halves: PSI 0")
    val shifted = base.map(_ + 30.0)
    assert(psi(base, shifted) > 0.5, "gross shift must show PSI >> 0.25")
  }

  test("streaming digest quantile equals the batch digest on the " +
    "same data") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = "/root/testdata/sf0.001"
    val streamed = graft.streaming.EventsStream.runToTable(spark,
      graft.streaming.EventsStream.windowedDigestQuantile(
        graft.streaming.EventsStream.readEvents(spark, d), q = 0.95),
      s"gds_sink_${System.nanoTime()}")
      .select($"window_start", $"event_type", $"p_est")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    val batch = graft.core.Tables.events(spark, d)
      .withColumn("w", window($"ts", "1 day"))
      .groupBy($"w.start".as("window_start"), $"event_type")
      .agg(call_function("graft_tdigest", $"value", lit(100)).as("td"))
      .select($"window_start", $"event_type",
        call_function("graft_td_quantile", $"td", lit(0.95)).as("p_est"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (k, v) =>
      assert(math.abs(v - batch(k)) < 1e-9,
        s"stream and batch digests must agree at $k")
    }
  }
}
