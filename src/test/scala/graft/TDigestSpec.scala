package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class TDigestSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.ensureRegistered(spark)

  // sf0.01 (15k rows, >1k per group): rank-error assertions need
  // groups large enough that one rank step is well under the bound.
  private lazy val events = graft.core.Tables
    .events(spark, "/root/testdata/sf0.01")
    .select($"event_type", $"value".cast("double").as("value"))

  private lazy val exactByGroup: Map[String, Array[Double]] =
    events.collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }

  /** rank(x) within the sorted group / n, i.e. the realized quantile
    * position of the estimate — the error metric t-digest bounds.
    */
  private def rankError(sorted: Array[Double], est: Double,
                        q: Double): Double = {
    val below = sorted.count(_ < est).toDouble
    val atOrBelow = sorted.count(_ <= est).toDouble
    val n = sorted.length.toDouble
    // est may fall inside a run of ties: take the closest achievable rank
    val lo = below / n; val hi = atOrBelow / n
    if (q < lo) lo - q else if (q > hi) q - hi else 0.0
  }

  private def digestEstimates(partitions: Int): Map[(String, Double), Double] = {
    val src = if (partitions == 0) events else events.repartition(partitions)
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    src.groupBy("event_type")
      .agg(call_function("graft_tdigest", $"value", lit(100)).as("td"))
      .select($"event_type" +: qs.map(q =>
        call_function("graft_td_quantile", $"td", lit(q)).as(s"p$q")): _*)
      .collect()
      .flatMap(r => qs.zipWithIndex.map { case (q, i) =>
        (r.getString(0), q) -> r.getDouble(i + 1)
      }).toMap
  }

  test("rank error <= 1% vs exact quantiles at compression 100, and " +
    "the bound is partitioning-invariant (1 vs 7 partitions)") {
    assert(exactByGroup.values.forall(_.length > 1000),
      "fixture too small for a meaningful rank-error test")
    Seq(1, 7).foreach { parts =>
      val est = digestEstimates(parts)
      est.foreach { case ((et, q), x) =>
        val err = rankError(exactByGroup(et), x, q)
        assert(err <= 0.01,
          s"$et q=$q parts=$parts: estimate $x has rank error $err > 1%")
      }
    }
  }

  test("quantile estimates are monotone in q and anchored at the " +
    "exact min/max for q=0/1") {
    val r = events.agg(
        call_function("graft_tdigest", $"value", lit(100)).as("td"))
      .select(
        call_function("graft_td_quantile", $"td", lit(0.0)).as("q0"),
        call_function("graft_td_quantile", $"td", lit(0.25)).as("q25"),
        call_function("graft_td_quantile", $"td", lit(0.5)).as("q50"),
        call_function("graft_td_quantile", $"td", lit(0.75)).as("q75"),
        call_function("graft_td_quantile", $"td", lit(1.0)).as("q1"))
      .head()
    val vs = (0 until 5).map(r.getDouble)
    assert(vs == vs.sorted, s"non-monotone quantiles: $vs")
    val mn = events.agg(min($"value"), max($"value")).head()
    assert(vs.head === mn.getDouble(0))
    assert(vs.last === mn.getDouble(1))
  }

  test("digest stays O(delta log n): centroid count grows only " +
    "logarithmically while n grows 10x, and total weight is exactly n") {
    def digestOf(n: Long): Seq[Double] = spark.range(n)
      .select((pmod(xxhash64($"id"), lit(1000000)) / 1000.0).as("v"))
      .agg(call_function("graft_tdigest", $"v", lit(100)).as("td"))
      .head().getSeq[Double](0)
    val small = digestOf(5000)
    val big = digestOf(50000)
    val h = graft.functions.TDigest.HeaderLen
    Seq(small -> 5000L, big -> 50000L).foreach { case (arr, n) =>
      val m = arr(1).toInt
      assert(arr.length == h + 2 * m)
      // weight-limited k1 bound: expected (delta/2)ln(2n/delta) + delta
      assert(m < 700, s"digest holds $m centroids at n=$n — not compressing")
      val w = (0 until m).map(i => arr(h + 2 * i + 1)).sum
      assert(w === n.toDouble)
    }
    // log growth, not linear: 10x the rows adds ~(delta/2)ln(10) ~ 115
    // centroids, nowhere near 10x
    assert(big(1) < small(1) + 3 * 100,
      s"centroids grew superlogarithmically: ${small(1)} -> ${big(1)}")
  }

  test("nulls are skipped; all-null group yields null digest") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Option.empty[Double])).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(call_function("graft_tdigest", $"v", lit(100)).as("td"))
      .select($"g",
        call_function("graft_td_quantile", $"td", lit(0.5)).as("p50"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("a") === 2.0) // median of {1, 3} interpolates to 2
    assert(out("b") == null)
  }

  test("probe against a non-digest array fails loudly") {
    val bad = Seq(Seq(1.0, 2.0, 3.0)).toDF("arr")
      .select(call_function("graft_td_quantile", $"arr", lit(0.5)))
    val e = intercept[Exception] { bad.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not a graft_tdigest digest")),
      s"expected a digest-validation error, got: ${msgs(e).mkString(" | ")}")
  }

  test("null-bearing digest arrays are rejected at analysis time, " +
    "not read as garbage doubles") {
    // array(double, containsNull=true): getDouble over null slots would
    // read uninitialized UnsafeArrayData instead of erroring — the type
    // check must refuse it up front (graft_tdigest emits containsNull=false)
    val e = intercept[Exception] {
      // analysis is eager: the type check fires at select(), not collect()
      Seq(Seq(Some(1.0), None, Some(3.0))).toDF("arr")
        .select(call_function("graft_td_quantile", $"arr", lit(0.5)))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must not allow null elements")),
      s"expected a containsNull rejection, got: ${msgs(e).mkString(" | ")}")
  }

  test("q80 entry (the driver-facing query) keeps the rank-error " +
    "bound vs q39's exact ground truth at sf0.01") {
    val d = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q80_tdigest_quantile")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = SparkEntry.queries("q39_percentile")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (et, (a50, a95, a99)) =>
      assert(a50 <= a95 && a95 <= a99, s"$et: non-monotone $a50/$a95/$a99")
      val sorted = exactByGroup(et)
      Seq(0.5 -> a50, 0.95 -> a95, 0.99 -> a99).foreach { case (q, x) =>
        val err = rankError(sorted, x, q)
        assert(err <= 0.012, // 0.01 + the query's own round(.,4) slack
          s"$et q=$q: entry estimate $x has rank error $err")
      }
    }
  }
}
