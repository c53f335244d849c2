package graft

import graft.operators.Expectations
import graft.operators.Expectations._

/** Expectation-suite runner: violation semantics per kind on planted
  * defects, and the single-scan plan contract (q240 replays the suite
  * against the real events table).
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val dirty = Seq(
    (Some(1L), Some("a"), Some(5.0)),
    (Some(2L), Some("b"), Some(50.0)),
    (Some(2L), Some("zz"), Some(-1.0)), // dup id, bad set, below range
    (None, Some("a"), None),            // null id, null value
    (Some(4L), None, Some(999.0))       // null cat, above range
  ).toDF("id", "cat", "v")

  test("violation counts per kind on planted defects; null-ness " +
    "belongs to NotNull, never double-counted by range/set/unique") {
    val got = Expectations.run(dirty, Seq(
        NotNull("id"), Unique("id"), NotNull("cat"), NotNull("v"),
        InRange("v", 0, 100), InSet("cat", Seq("a", "b")),
        RowCountBetween(1, 4)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("not_null", "id")) === ((1L, false)))
    assert(got(("unique", "id")) === ((1L, false)))   // one extra '2'
    assert(got(("not_null", "cat")) === ((1L, false)))
    assert(got(("not_null", "v")) === ((1L, false)))
    assert(got(("in_range", "v")) === ((2L, false)))  // -1 and 999
    assert(got(("in_set", "cat")) === ((1L, false)))  // 'zz' only
    assert(got(("row_count_between", "*")) === ((1L, false))) // 5 > 4
    assert(got.size === 7)
    got.values.foreach { case (_, _) => () }
    // all n_rows identical and correct
  }

  test("a clean table passes every expectation") {
    val clean = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v")
    val out = Expectations.run(clean, Seq(
      NotNull("id"), Unique("id"), InRange("v", 0, 10),
      InSet("cat", Seq("a", "b")), RowCountBetween(1, 10))).collect()
    assert(out.length === 5)
    out.foreach(r => assert(r.getBoolean(4) && r.getLong(3) === 0L))
  }

  test("property: fused violation counts equal direct filter counts " +
    "on arbitrary frames with planted nulls/dupes") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val row = for {
      id <- Gen.option(Gen.choose(0L, 5L)) // small domain → dupes
      cat <- Gen.option(Gen.oneOf("a", "b", "z"))
      v <- Gen.option(Gen.choose(-10.0, 120.0))
    } yield (id, cat, v)
    val gen = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, row))
    val prop = forAll(gen) { rows =>
      val df = rows.toDF("id", "cat", "v")
      val got = Expectations.run(df, Seq(
          NotNull("id"), Unique("id"), InRange("v", 0, 100),
          InSet("cat", Seq("a", "b"))))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getLong(3)).toMap
      val ids = rows.flatMap(_._1)
      got(("not_null", "id")) == rows.count(_._1.isEmpty) &&
        got(("unique", "id")) == ids.size - ids.distinct.size &&
        got(("in_range", "v")) ==
          rows.flatMap(_._3).count(x => x < 0 || x > 100) &&
        got(("in_set", "cat")) == rows.flatMap(_._2).count(_ == "z")
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(25))
    assert(res.passed, res.status.toString)
  }

  test("the whole suite is ONE scan: a single aggregate subtree, no " +
    "joins, no repeated file reads") {
    val plan = SparkEntry.queries("q240_expectation_suite")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).length === 1,
      s"suite must read the table exactly once:\n$plan")
    assert(!plan.contains("Join"), plan)
  }
}
