package graft

import graft.operators.Privacy

/** t-closeness on hand-computed fixtures (q233 replays the same
  * arithmetic against the real events table; these pin the EMD
  * closed form and the exact-integer gate on cases small enough to
  * check by hand).
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("ordered EMD: hand-computed values; identical-to-global group " +
    "scores 0; skewed group fails the 0.2 gate") {
    // groups g1/g2 balanced over {0,1}, g3 all-1s.
    // Global: vb0=2, vb1=4, N=6; cumP = (2, 6).
    // g1/g2: cumQ=(1,2), n_g=2: |1*6-2*2| = 2 -> emd = 2/(2*6*1) = 1/6
    // g3:   cumQ=(0,2), n_g=2: |0*6-2*2| = 4 -> emd = 4/12 = 1/3
    val df = Seq(
      ("g1", 0L), ("g1", 1L), ("g2", 0L), ("g2", 1L),
      ("g3", 1L), ("g3", 1L)).toDF("grp", "vb")
    val got = Privacy.tCloseness(df, Seq("grp"), "vb", m = 2)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_g"), r.getAs[Double]("emd"),
          r.getAs[Boolean]("meets_t")))).toMap
    assert(got("g1") === ((2L, 0.166667, true)))
    assert(got("g2") === ((2L, 0.166667, true)))
    assert(got("g3") === ((2L, 0.333333, false)))
  }

  test("a group distributed exactly like the global population has " +
    "EMD 0 however skewed both are; empty buckets densify correctly") {
    // every group = 3:1 over buckets {0,3} with buckets 1,2 EMPTY:
    // all groups match global exactly -> emd 0, meets any t
    val rows = for (g <- Seq("a", "b"); r <- Seq(0L, 0L, 0L, 3L))
      yield (g, r)
    val out = Privacy.tCloseness(rows.toDF("grp", "vb"), Seq("grp"),
      "vb", m = 4).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Double]("emd") === 0.0)
      assert(r.getAs[Boolean]("meets_t"))
    }
  }

  test("the gate is the exact integer compare, not the rounded float") {
    // craft emd exactly AT t = 1/3: one group all-0, other all-1,
    // equal sizes. Global cum = (3, 6); g0 cum = (3, 3):
    // |3*6 - 3*3| = 9 -> emd = 9/(3*6*1) = 0.5 ... choose t = 1/2:
    // 2*9 <= 1*18 holds with equality -> meets exactly at boundary
    val df = Seq(("g0", 0L), ("g0", 0L), ("g0", 0L),
      ("g1", 1L), ("g1", 1L), ("g1", 1L)).toDF("grp", "vb")
    val out = Privacy.tCloseness(df, Seq("grp"), "vb", m = 2,
        tNum = 1, tDen = 2)
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Boolean]("meets_t")).toMap
    assert(out === Map("g0" -> true, "g1" -> true),
      "emd == t must pass (<=, exact integers, no float drift)")
    val strict = Privacy.tCloseness(df, Seq("grp"), "vb", m = 2,
        tNum = 49, tDen = 100)
      .collect().map(_.getAs[Boolean]("meets_t"))
    assert(strict.forall(!_), "emd just over t must fail")
  }
}
