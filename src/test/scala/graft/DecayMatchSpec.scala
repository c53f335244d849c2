package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decay, DistributionMatch, TrendFit}

/** q248–q250 family: staircase-decayed counters, distribution-
  * matching subsample, Theil–Sen robust trend.
  */
class DecayMatchSpec extends SparkSpec {

  test("decay: hand-computed staircase weights, truncation, mergeability") {
    import spark.implicits._
    // ages 0, 1h, 3h, 50h at halfLife = 2h → steps 0,0,1,25(>20 → 0)
    val base = 1700000000000000L // epoch micros
    val us = 3600L * 1000000L
    val df = Seq(
      ("a", base, 10L), ("a", base - 1 * us, 20L),
      ("a", base - 3 * us, 30L), ("a", base - 50 * us, 40L))
      .toDF("k", "t_us", "cents")
      .select(col("k"), timestamp_micros(col("t_us")).as("ts"), col("cents"))
    val got = Decay.decayedCounters(df, Seq("k"), col("ts"), col("cents"),
      halfLifeUs = 2 * us).collect()
    assert(got.length === 1)
    val r = got.head
    val u = 1L << 20
    assert(r.getAs[Long]("n_events") === 4L)
    // weights: u, u, u/2, 0
    assert(r.getAs[Long]("decayed_n_units") === u + u + u / 2)
    assert(r.getAs[Long]("decayed_value_units") ===
      10L * u + 20L * u + 30L * (u / 2))
    assert(r.getAs[Long]("asof_us") === base)

    // mergeability at a shared instant: counters over two halves sum
    // to the whole-corpus counter
    val asof = lit(base)
    def units(sub: org.apache.spark.sql.DataFrame): Long =
      Decay.decayedCountersAsOf(sub, Seq("k"), col("ts"), col("cents"),
          2 * us, asof)
        .collect().headOption.map(_.getAs[Long]("decayed_value_units"))
        .getOrElse(0L)
    val whole = units(df)
    val parts = units(df.filter(col("cents") <= 20)) +
      units(df.filter(col("cents") > 20))
    assert(whole === parts)
  }

  test("decay: grid-aligned advance + merge equals one-shot recompute") {
    import spark.implicits._
    val h = 3600L * 1000000L // 1h half-life
    val grid0 = 1700000000000000L / h * h // grid-aligned base
    // history: events 1..5 hours before grid0; batch: within the next
    // 2 hours; final instant = grid0 + 2h (grid-aligned)
    val hist = (1 to 5).map(k => ("k", grid0 - k * h, 10L * k))
    val batch = Seq(("k", grid0 + h / 2, 7L), ("k", grid0 + h, 9L))
    def mk(rows: Seq[(String, Long, Long)]) = rows.toDF("g", "t_us", "cents")
      .select(col("g"), timestamp_micros(col("t_us")).as("ts"), col("cents"))
    val D = graft.operators.Decay
    val st1 = D.decayedCountersAsOf(mk(hist).withColumn("a", lit(grid0)),
      Seq("g"), col("ts"), col("cents"), h, col("a"))
    val st2 = D.decayedCountersAsOf(
      mk(batch).withColumn("a", lit(grid0 + 2 * h)),
      Seq("g"), col("ts"), col("cents"), h, col("a"))
    val inc = D.merge(D.advanced(st1, 2, h), st2, Seq("g"))
      .collect().head
    val direct = D.decayedCountersAsOf(
      mk(hist ++ batch).withColumn("a", lit(grid0 + 2 * h)),
      Seq("g"), col("ts"), col("cents"), h, col("a")).collect().head
    Seq("n_events", "decayed_n_units", "decayed_value_units", "asof_us")
      .foreach { c =>
        assert(inc.getAs[Long](c) === direct.getAs[Long](c), c)
      }
  }

  test("distribution match: kept set hits target ratios, idempotent, no upsample") {
    import spark.implicits._
    // bucket sizes 400/100: target 1:1 → K = 200, expect ~100 kept
    // from the big bucket and ALL 100 from the small one (rate 1)
    val df = (0 until 500).map(i =>
      (i.toLong, if (i < 400) "big" else "small")).toDF("id", "b")
    val kept = DistributionMatch.sampleToTarget(df, col("b"), col("id"),
      Seq(("big", 1L), ("small", 1L)), "t0|")
    val byB = kept.groupBy("b").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byB("small") === 100L, "rate-1 bucket must keep every row")
    // expected 100 from 400 at rate 1/4; binomial 3σ ≈ 26
    assert(math.abs(byB("big") - 100L) <= 30L, s"got ${byB("big")}")
    // deterministic: a second run selects the identical id set
    val again = DistributionMatch.sampleToTarget(df, col("b"), col("id"),
      Seq(("big", 1L), ("small", 1L)), "t0|")
    assert(kept.select("id").except(again.select("id")).count() === 0L)
    assert(again.select("id").except(kept.select("id")).count() === 0L)
    // different salt → different (but same-sized-ish) selection
    val other = DistributionMatch.sampleToTarget(df, col("b"), col("id"),
      Seq(("big", 1L), ("small", 1L)), "t1|")
    assert(other.select("id").except(kept.select("id")).count() > 0L)
    // bucket absent from the target is dropped entirely
    val dropped = DistributionMatch.sampleToTarget(df, col("b"), col("id"),
      Seq(("small", 1L)), "t0|")
    assert(dropped.filter(col("b") === "big").count() === 0L)
    assert(dropped.filter(col("b") === "small").count() === 100L)
  }

  test("theil-sen: robust to one outlier where OLS is not") {
    import spark.implicits._
    // y = 3x + 1 on x=0..9 with one wild outlier at x=5
    val pts = (0 until 10).map(x =>
      ("g", x.toLong, if (x == 5) 1000L else 3L * x + 1L))
      .toDF("g", "x", "y")
    val ts = TrendFit.theilSen(pts, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(ts.getAs[Long]("n_points") === 10L)
    assert(ts.getAs[Long]("n_pairs") === 45L)
    assert(ts.getAs[Double]("ts_slope") === 3.0,
      "median slope must shrug off the outlier")
    val ols = TrendFit.olsFit(pts, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(math.abs(ols.getAs[Double]("slope") - 3.0) > 5.0,
      "OLS should be wrecked by the outlier (that's the contrast)")
  }

  test("conformal: threshold is the exact order-statistic rank; " +
    "small calibration yields null tau and zero flags") {
    import spark.implicits._
    // 15 calibration scores 1..15 → rank ⌈16·7/8⌉ = 14 → τ = 14
    val cal = (1 to 15).map(v => ("g", v.toLong)).toDF("g", "s")
    val app = Seq(("g", 13L), ("g", 14L), ("g", 15L), ("g", 99L))
      .toDF("g", "s")
    val got = graft.operators.Conformal.splitConformal(
      cal, app, Seq("g"), "s", alphaNum = 1, alphaDen = 8)
      .collect().head
    assert(got.getAs[Long]("n_cal") === 15L)
    assert(got.getAs[Long]("tau") === 14L)
    assert(got.getAs[Long]("n_apply") === 4L)
    assert(got.getAs[Long]("n_flagged") === 2L) // 15 and 99 exceed τ
    // 3 calibration points at α=1/8: rank ⌈4·7/8⌉ = 4 > 3 → no τ
    val tiny = (1 to 3).map(v => ("g", v.toLong)).toDF("g", "s")
    val g2 = graft.operators.Conformal.splitConformal(
      tiny, app, Seq("g"), "s", alphaNum = 1, alphaDen = 8)
      .collect().head
    assert(g2.isNullAt(g2.fieldIndex("tau")))
    assert(g2.getAs[Long]("n_flagged") === 0L)
  }

  test("conformal: false-flag rate honors alpha on exchangeable data") {
    import spark.implicits._
    // deterministic pseudo-scores, split half/half: flag rate on the
    // apply half must be ≤ α plus finite-sample slack
    val rows = (0 until 2000).map { i =>
      ("g", (i * 2654435761L) % 10007L, i % 2 == 0)
    }
    val cal = rows.filter(_._3).map(r => (r._1, r._2)).toDF("g", "s")
    val app = rows.filterNot(_._3).map(r => (r._1, r._2)).toDF("g", "s")
    val got = graft.operators.Conformal.splitConformal(
      cal, app, Seq("g"), "s", alphaNum = 1, alphaDen = 10)
      .collect().head
    val rate = got.getAs[Long]("n_flagged").toDouble /
      got.getAs[Long]("n_apply")
    assert(rate <= 0.1 + 0.03, s"flag rate $rate breaches alpha=0.1")
    assert(rate >= 0.02, s"flag rate $rate suspiciously low")
  }

  test("cluster split: no pair straddles splits; singletons keep own id") {
    import spark.implicits._
    // 600 docs; pairs chain docs 0..299 into 100 clusters of 3
    val docs = (0L until 600L).toDF("doc_id")
    val comps = (0L until 300L).map(i => (i, i - i % 3))
      .toDF("id", "component")
    val asg = graft.operators.WeightedSample.clusterSplit(
      docs, "doc_id", comps, trainPct = 80, valPct = 10, salt = "t")
    // every clustered doc shares its cluster-mates' split
    val pairs = (0L until 300L).filter(_ % 3 != 0).map(i => (i - i % 3, i))
      .toDF("id_a", "id_b")
    val leaks = pairs
      .join(asg.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(asg.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(leaks.count() === 0L, "near-dup pair straddles splits")
    // singleton docs (300..599) use their own id as cluster
    val singletons = asg.filter(col("doc_id") >= 300)
    assert(singletons.filter(col("cluster") =!= col("doc_id")).count() === 0L)
    // all three splits materialize with plausible mass
    val bySplit = asg.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > 350L, s"train too small: $bySplit")
  }

  test("mann-kendall: hand-computed S and tie-corrected variance") {
    import spark.implicits._
    // y = 1,2,2,3 on x = 0..3: pairs (6): signs +1,+1,+1,0,+1,+1 → S=5
    // ties: one group of t=2 → tie_corr = 2·1·9 = 18
    // var18 = 4·3·13 − 18 = 138
    val pts = Seq(("g", 0L, 1L), ("g", 1L, 2L), ("g", 2L, 2L),
      ("g", 3L, 3L)).toDF("g", "x", "y")
    val got = graft.operators.TrendFit.mannKendall(
      pts, Seq("g"), col("x"), col("y")).collect().head
    assert(got.getAs[Long]("n_points") === 4L)
    assert(got.getAs[Long]("s_stat") === 5L)
    assert(got.getAs[Long]("var18") === 138L)
    // strictly decreasing series: S = −n(n−1)/2
    val dec = (0 until 6).map(x => ("d", x.toLong, (100 - x).toLong))
      .toDF("g", "x", "y")
    val d2 = graft.operators.TrendFit.mannKendall(
      dec, Seq("g"), col("x"), col("y")).collect().head
    assert(d2.getAs[Long]("s_stat") === -15L)
    assert(d2.getAs[Long]("var18") === 6L * 5L * 17L)
  }

  test("water-fill: hand-computed saturation; exact budget; caps hold") {
    import spark.implicits._
    // caps (10,100,100), weights (5,1,1), budget 60:
    // λ = 2, 100, 100 → a saturates (alloc 10), pool 50 splits 25/25
    val df = Seq(("a", 10L, 5L, 60L), ("b", 100L, 1L, 60L),
      ("c", 100L, 1L, 60L)).toDF("k", "cap", "w", "budget")
    val got = graft.operators.WaterFill.allocate(df, "k", "cap", "w",
      "budget").collect().map(r => r.getAs[String]("k") ->
      (r.getAs[Long]("alloc"), r.getAs[Long]("saturated"))).toMap
    assert(got("a") === ((10L, 1L)))
    assert(got("b") === ((25L, 0L)))
    assert(got("c") === ((25L, 0L)))
    // budget above total capacity: everything saturates at cap
    val over = Seq(("a", 10L, 1L, 100L), ("b", 10L, 1L, 100L))
      .toDF("k", "cap", "w", "budget")
    val g2 = graft.operators.WaterFill.allocate(over, "k", "cap", "w",
      "budget").collect()
    assert(g2.map(_.getAs[Long]("alloc")).sum === 20L)
    assert(g2.forall(_.getAs[Long]("saturated") === 1L))
    // property sweep: Σ alloc == min(B, Σ cap), every alloc ≤ cap,
    // unsaturated allocs proportional within the ±1 apportionment band
    val caps = (0 until 17).map(i => (s"s$i",
      (i * 37 % 91 + 3).toLong, (i % 4 + 1).toLong))
    for (budget <- Seq(50L, 300L, 700L, 2000L)) {
      val in = caps.map { case (k, c, w) => (k, c, w, budget) }
        .toDF("k", "cap", "w", "budget")
      val rows = graft.operators.WaterFill.allocate(in, "k", "cap",
        "w", "budget").collect()
      val totalCap = caps.map(_._2).sum
      assert(rows.map(_.getAs[Long]("alloc")).sum ===
        math.min(budget, totalCap), s"budget $budget")
      rows.foreach { r =>
        assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap"),
          s"cap breach at budget $budget: $r")
      }
      val un = rows.filter(_.getAs[Long]("saturated") === 0L)
      if (un.nonEmpty) {
        val pool = budget -
          rows.filter(_.getAs[Long]("saturated") === 1L)
            .map(_.getAs[Long]("cap")).sum
        val wSum = un.map(_.getAs[Long]("w")).sum
        un.foreach { r =>
          val exact = pool.toDouble * r.getAs[Long]("w") / wSum
          assert(math.abs(r.getAs[Long]("alloc") - exact) <= 1.0,
            s"unsat share off at budget $budget: $r vs $exact")
        }
      }
    }
  }

  test("water-fill: zero-weight rows allocate 0 and never absorb budget") {
    import spark.implicits._
    // the pathological case: one zero-weight row with positive cap
    // and budget below cap — classifying it saturated would hand it
    // cap=10 against a budget of 5
    val lone = Seq(("z", 10L, 0L, 5L)).toDF("k", "cap", "w", "budget")
    val got = graft.operators.WaterFill.allocate(lone, "k", "cap", "w",
      "budget").collect().head
    assert(got.getAs[Long]("alloc") === 0L)
    assert(got.getAs[Long]("saturated") === 0L)
    // mixed: zero-weight rows sit out, positive-weight rows see the
    // full budget; Σ alloc == min(budget, Σ cap over w>0)
    val mixed = Seq(("a", 10L, 2L, 30L), ("b", 40L, 1L, 30L),
      ("z1", 99L, 0L, 30L), ("z2", 0L, 0L, 30L))
      .toDF("k", "cap", "w", "budget")
    val rows = graft.operators.WaterFill.allocate(mixed, "k", "cap",
      "w", "budget").collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("alloc"), r.getAs[Long]("saturated"))).toMap
    assert(rows("a") === ((10L, 1L))) // λ=5 < pool level → saturates
    assert(rows("b") === ((20L, 0L))) // remaining 20 of the 30 budget
    assert(rows("z1") === ((0L, 0L)))
    assert(rows("z2") === ((0L, 1L))) // cap 0 is trivially full
    assert(rows.values.map(_._1).sum === 30L)
  }

  test("conformal: a group present only in apply surfaces with " +
    "n_cal=0, null tau, zero flags") {
    import spark.implicits._
    val cal = (1 to 15).map(v => ("g", v.toLong)).toDF("g", "s")
    val app = Seq(("g", 15L), ("h", 7L), ("h", 8L)).toDF("g", "s")
    val got = graft.operators.Conformal.splitConformal(
      cal, app, Seq("g"), "s", alphaNum = 1, alphaDen = 8)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got.keySet === Set("g", "h"))
    val h = got("h")
    assert(h.getAs[Long]("n_cal") === 0L)
    assert(h.isNullAt(h.fieldIndex("tau")))
    assert(h.getAs[Long]("n_apply") === 2L)
    assert(h.getAs[Long]("n_flagged") === 0L)
    assert(got("g").getAs[Long]("n_flagged") === 1L) // 15 > τ=14
  }

  test("decay: an event newer than asofUs fails loudly, not silently") {
    import spark.implicits._
    val ev = Seq(("a", java.sql.Timestamp.valueOf("2026-01-02 00:00:00"),
      100L)).toDF("g", "ts", "v")
    val asof = org.apache.spark.sql.functions.lit(
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    val ex = intercept[Exception] {
      graft.operators.Decay.decayedCountersAsOf(ev, Seq("g"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("v"),
        halfLifeUs = 86400000000L,
        asofUs = org.apache.spark.sql.functions.unix_micros(asof))
        .collect()
    }
    assert(ex.getMessage.contains("newer than asofUs") ||
      Option(ex.getCause).exists(_.getMessage.contains("newer than asofUs")))
  }

  test("cusum: matches the sequential max(0,...) recursion; a " +
    "sustained shift to 130 alarms while one lone 130 does not") {
    import spark.implicits._
    // series: 10 in-control periods at 100, then 10 at 130 (+30%)
    val series = ((0 until 10).map(t => ("g", t.toLong, 100L)) ++
      (10 until 20).map(t => ("g", t.toLong, 130L)))
      .toDF("g", "t", "x")
    val got = graft.operators.Cusum.detect(series, Seq("g"), "t", "x",
      slackDiv = 20L, threshDiv = 4L).orderBy("t").collect()
    // independent sequential reference
    val xs = (0 until 10).map(_ => 100L) ++ (0 until 10).map(_ => 130L)
    val mu = xs.sum / xs.length
    val slack = mu / 20
    var s = 0L
    val ref = xs.map { x => s = math.max(0L, s + (x - mu - slack)); s }
    got.zip(ref).foreach { case (r, expected) =>
      assert(r.getAs[Long]("cusum") === expected, s"t=${r.getAs[Long]("t")}")
    }
    // the sustained shift eventually alarms (cusum > μ/4)
    assert(got.last.getAs[Long]("alarm") === 1L)
    // the SAME level reached once does NOT accumulate enough evidence
    val spike = ((0 until 17).map(t => ("g", t.toLong, 100L)) :+
      (("g", 17L, 130L))).toDF("g", "t", "x")
    val g2 = graft.operators.Cusum.detect(spike, Seq("g"), "t", "x",
      slackDiv = 20L, threshDiv = 4L).orderBy("t").collect()
    assert(g2.forall(_.getAs[Long]("alarm") === 0L),
      "point spike must not trip the sustained-shift alarm")
  }

  test("mann-whitney: hand-computed tie case; U_A + U_B = n_a*n_b") {
    import spark.implicits._
    // A = {1, 2}, B = {2, 3}: ranks 1, 2.5, 2.5, 4 →
    // R_A = 3.5 → x2 = 7; U_A = 0.5 → x2 = 1; ties: t=2 → 6
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val got = graft.operators.RankTests.mannWhitneyU(df, "v", "g",
      "a", "b").collect().head
    assert(got.getAs[Long]("n_a") === 2L)
    assert(got.getAs[Long]("n_b") === 2L)
    assert(got.getAs[Long]("u_a_x2") === 1L)
    assert(got.getAs[Long]("tie_cubes") === 6L)
    // complement identity on a bigger deterministic sample
    val big = (0 until 300).map(i =>
      (if (i % 3 == 0) "a" else "b", (i * 17 % 23).toLong)).toDF("g", "v")
    val ua = graft.operators.RankTests.mannWhitneyU(big, "v", "g",
      "a", "b").collect().head
    val ub = graft.operators.RankTests.mannWhitneyU(big, "v", "g",
      "b", "a").collect().head
    assert(ua.getAs[Long]("u_a_x2") + ub.getAs[Long]("u_a_x2") ===
      2L * ua.getAs[Long]("n_a") * ua.getAs[Long]("n_b"))
    // a clean location shift maximizes U: all of A below all of B
    val sep = ((0 until 5).map(i => ("a", i.toLong)) ++
      (5 until 12).map(i => ("b", i.toLong))).toDF("g", "v")
    val us = graft.operators.RankTests.mannWhitneyU(sep, "v", "g",
      "a", "b").collect().head
    assert(us.getAs[Long]("u_a_x2") === 0L, "A fully below B => U_A = 0")
  }

  test("scaling ladder: rungs nest and cover the corpus") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q257_scaling_ladder")(spark, d)
      .collect().map(r => r.getAs[Long]("rung_denom") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val total = rows.values.map(_._1).sum
    assert(total === 500L, s"rungs must partition the corpus: $rows")
    // the 1/8 rung holds roughly an eighth (binomial 4σ band)
    val eighth = rows.getOrElse(8L, (0L, 0L))._1
    assert(math.abs(eighth - 62.5) < 40, s"1/8 rung off: $eighth")
    // nesting is definitional (threshold on one uniform): the
    // cumulative count at fraction f equals the docs with h < f·2^48,
    // so cum(1/4) ≥ cum(1/8) strictly by construction
    assert(rows.keySet === Set(1L, 2L, 4L, 8L))
  }

  test("trimmed stats: hand case with ties at the cut; sequential " +
    "reference agreement") {
    import spark.implicits._
    // values 1..10 with trimDiv=10: lo=1, hi=9 → drop one 1 and one
    // 10: trimmed = 2+..+9 = 44; winsorized adds 1·(v_2 + v_9) =
    // 2 + 9 = 11 → 55... v_lo = order stat at rank 2 = 2, v_hi at
    // rank 9 = 9 → winsor = 44 + 2 + 9 = 55 (clamp, don't drop)
    val df = (1 to 10).map(v => ("g", v.toLong)).toDF("g", "v")
    val got = graft.operators.RankTests.trimmedStats(df, Seq("g"), "v")
      .collect().head
    assert(got.getAs[Long]("n") === 10L)
    assert(got.getAs[Long]("n_kept") === 8L)
    assert(got.getAs[Long]("trimmed_sum") === 44L)
    assert(got.getAs[Long]("winsor_sum") === 55L)
    // ties spanning the cut: 30 copies of the same value — trimming
    // removes copies, not the value
    val ties = ((1 to 30).map(_ => ("t", 5L)) ++ Seq(("t", 100L)))
      .toDF("g", "v")
    val g2 = graft.operators.RankTests.trimmedStats(ties, Seq("g"), "v")
      .collect().head
    // n=31, lo=3, hi=28: keep ranks 4..28 → 25 fives (the 100 at
    // rank 31 is trimmed); winsor adds 3·(5 + 5)
    assert(g2.getAs[Long]("trimmed_sum") === 125L)
    assert(g2.getAs[Long]("winsor_sum") === 155L)
    // reference check on a scrambled multiset
    val vals = (0 until 97).map(i => (i * 37 % 23).toLong)
    val df3 = vals.map(("r", _)).toDF("g", "v")
    val sorted = vals.sorted
    val lo = 97 / 10
    val kept = sorted.slice(lo, 97 - lo)
    val g3 = graft.operators.RankTests.trimmedStats(df3, Seq("g"), "v")
      .collect().head
    assert(g3.getAs[Long]("trimmed_sum") === kept.sum)
    assert(g3.getAs[Long]("winsor_sum") ===
      kept.sum + lo * (kept.head + kept.last))
  }

  test("label propagation: a bridge edge cannot glue two triangles " +
    "(one component, two communities); sync rounds match a reference") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by bridge 3-4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = graft.operators.LabelProp.communities(edges, rounds = 4)
      .collect().map(r => r.getAs[Long]("id") ->
      r.getAs[Long]("community")).toMap
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(4L) === got(5L) && got(5L) === got(6L))
    assert(got(1L) !== got(4L),
      "bridge must not merge the two dense clusters")
    // connected components WOULD merge them — the operators answer
    // different questions
    val comp = graft.operators.Components.connectedComponents(
      edges.select(col("src").as("id_a"), col("dst").as("id_b")))
      .select("component").distinct().count()
    assert(comp === 1L)
    // independent synchronous reference loop
    val ed = Seq((1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var lab = (1 to 6).map(i => i -> i).toMap
    for (_ <- 1 to 4) {
      lab = (1 to 6).map { v =>
        val nbr = ed.collect { case (s, d) if d == v => lab(s) }
        v -> (if (nbr.isEmpty) lab(v)
              else nbr.groupBy(identity).toSeq
                .map { case (l, occ) => (-occ.size, l) }.min._2)
      }.toMap
    }
    (1 to 6).foreach { v =>
      assert(got(v.toLong) === lab(v).toLong, s"node $v")
    }
  }

  test("theil-sen: exact lower-median on an even pair count") {
    import spark.implicits._
    // 3 points → 3 pairs; 4 points → 6 pairs (even): lower median is
    // the 3rd smallest. Slopes for y=x² on x=0..3:
    // pairs (0,1)=1 (0,2)=2 (0,3)=3 (1,2)=3 (1,3)=4 (2,3)=5 →
    // sorted 1,2,3,3,4,5 → lower median (rank (6+1) div 2 = 3) = 3
    val pts = (0 until 4).map(x => ("g", x.toLong, (x * x).toLong))
      .toDF("g", "x", "y")
    val ts = TrendFit.theilSen(pts, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(ts.getAs[Long]("n_pairs") === 6L)
    assert(ts.getAs[Double]("ts_slope") === 3.0)
  }
}
