package graft

import graft.operators.Ivm
import org.apache.spark.sql.functions._

/** Incremental view maintenance: delta application must equal a full
  * recompute of the changed base, for every CDC op shape (q236 replays
  * the same maintenance against the events table).
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  test("insert/update/delete deltas converge to the recompute; keys " +
    "appear and vanish correctly") {
    // base state: k=a {10, 20}, k=b {5}
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v")
    val view0 = Ivm.initialize(base, Seq("k"), "v")
    assert(view0.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSet === Set(("a", 2L, 30L), ("b", 1L, 5L)))
    // batch: insert c=7; update a's 10 -> 13 (d_sum=+3);
    // delete b's 5 (b vanishes: count hits 0)
    val deltas = Seq(
      ("c", 1L, 7L), ("a", 0L, 3L), ("b", -1L, -5L))
      .toDF("k", "d_count", "d_sum")
    val view1 = Ivm.applyDeltas(view0, deltas, Seq("k"))
    val got = view1.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSet
    // recompute of the post-change base: a {13, 20}, c {7}
    assert(got === Set(("a", 2L, 33L), ("c", 1L, 7L)))
    // second batch re-inserts into the vanished key
    val view2 = Ivm.applyDeltas(view1,
      Seq(("b", 1L, 9L)).toDF("k", "d_count", "d_sum"), Seq("k"))
    assert(view2.filter($"k" === "b").collect().map(r =>
      (r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 9L)))
  }

  test("maintenance never rescans the base: the applied plan reads " +
    "only view + delta") {
    val base = spark.range(1000).select(($"id" % 7).as("k"),
      $"id".as("v"))
    val view = Ivm.initialize(base, Seq("k"), "v")
      .localCheckpoint(true) // the stored view (as VersionedTable would)
    val deltas = Seq((0L, 1L, 100L)).toDF("k", "d_count", "d_sum")
    val plan = Ivm.applyDeltas(view, deltas, Seq("k"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("range"),
      s"delta application must not rescan the base table:\n$plan")
    // and it still equals the recompute
    val got = Ivm.applyDeltas(view, deltas, Seq("k"))
      .filter($"k" === 0L).collect().map(r => (r.getLong(1), r.getLong(2)))
    val expect = base.unionByName(Seq((0L, 100L)).toDF("k", "v"))
      .groupBy("k").agg(count(lit(1)), sum("v"))
      .filter($"k" === 0L).collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expect.toSeq)
  }
}
