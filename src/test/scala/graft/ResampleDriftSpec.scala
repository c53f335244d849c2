package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Profiling, Skew}

/** q137–q140 family: LOCF gap fill, salted join, char entropy, drift
  * report.
  */
class ResampleDriftSpec extends SparkSpec {

  test("gap fill: LOCF carries the last observation, flags gaps") {
    import spark.implicits._
    val daily = Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), 100L),
      (1L, java.sql.Date.valueOf("2024-01-03"), 300L),
      (2L, java.sql.Date.valueOf("2024-01-02"), 200L)
    ).toDF("user_id", "day", "cents")
    val cal = daily.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = daily.select("user_id").distinct().crossJoin(cal)
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last("cents", ignoreNulls = true).over(w))
      .withColumn("is_gap", col("cents").isNull)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (Option(r.get(2)), r.get(3), r.getBoolean(4))).toMap
    // user 1, day 2 is a gap filled with day-1's value
    assert(got((1L, "2024-01-02")) === ((None, 100L, true)))
    assert(got((1L, "2024-01-03")) === ((Some(300L), 300L, false)))
    // user 2 has no observation on day 1: gap with null fill
    assert(got((2L, "2024-01-01")) === ((None, null, true)))
    assert(got((2L, "2024-01-02")) === ((Some(200L), 200L, false)))
    // grid is users × full calendar
    assert(got.size === 2 * 3)
  }

  test("salted join ≡ plain join, small side replicated salts×") {
    import spark.implicits._
    // skewed big side: key 1 holds 80% of rows
    val big = (1 to 100).map(i => (if (i <= 80) 1L else (i % 5) + 2L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (5L, "e"), (6L, "f")).toDF("k", "v")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, Seq("k"),
      saltExpr = pmod(col("payload"), lit(4)), salts = 4)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "v")
      .except(plain.select("k", "payload", "v")).count() === 0)
    assert(plain.select("k", "payload", "v")
      .except(salted.select("k", "payload", "v")).count() === 0)
    // replication factor is exactly `salts` before the join filter
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(3))))
    assert(replicated.count() === small.count() * 4)
  }

  test("char entropy: hand-computed distributions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aabb"),      // p = (.5, .5)            → 1.0 bit
      (2L, "abcd"),      // uniform over 4          → 2.0 bits
      (3L, "aaaa"),      // degenerate              → 0.0
      (4L, "aA!a")       // filter keeps only [a-z ]: "aaa" → 0.0
    ).toDF("doc_id", "text")
    val cc = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "")).as("ch"))
      .filter(col("ch").rlike("^[a-z ]$"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val n = cc.groupBy("doc_id").agg(sum("c").as("n"))
    val got = cc.join(n, "doc_id")
      .withColumn("pterm",
        (col("c").cast("double") / col("n").cast("double")) *
          log2(col("c").cast("double") / col("n").cast("double")))
      .groupBy("doc_id")
      .agg(max("n").as("n_chars"), round(-sum("pterm"), 4).as("e"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L) === ((4L, 1.0)))
    assert(got(2L) === ((4L, 2.0)))
    assert(got(3L) === ((4L, 0.0)))
    assert(got(4L) === ((3L, 0.0)), "case-folded, non-[a-z ] dropped")
  }

  test("drift report: planted cardinality blow-up and range change") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i % 10, "t"))
      .toDF("id", "tag")
    val b = (1 to 100).map(i => (i, "t"))  // 10× the id cardinality
      .toDF("id", "tag")
    val got = Profiling.driftReport(a, b, Seq("id", "tag"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val id = got("id")
    assert(id.getAs[Long]("n_distinct_a") === 10L)
    assert(id.getAs[Long]("n_distinct_b") === 100L)
    assert(id.getAs[Boolean]("card_drift"))
    assert(id.getAs[Boolean]("range_changed")) // max 9 → 100
    assert(!id.getAs[Boolean]("null_drift"))
    val tag = got("tag")
    assert(!tag.getAs[Boolean]("card_drift"))
    assert(!tag.getAs[Boolean]("range_changed"))
    // null drift: half of batch b goes null
    val bn = (1 to 100).map(i => (if (i % 2 == 0) None else Some(i % 10), "t"))
      .toDF("id", "tag")
    val gotN = Profiling.driftReport(a, bn, Seq("id", "tag"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(gotN("id").getAs[Boolean]("null_drift"))
    assert(gotN("id").getAs[Long]("n_null_b") === 50L)
  }
}
