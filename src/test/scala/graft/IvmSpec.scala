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

  test("property: arbitrary insert/update/delete sequences converge " +
    "to the recompute of the surviving rows") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    // model: rows are (rowId -> (key, value)); ops append CDC deltas
    val gen = for {
      nIns <- Gen.choose(1, 12)
      inserts <- Gen.listOfN(nIns, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.choose(-50L, 50L)))
      nMut <- Gen.choose(0, 8)
      muts <- Gen.listOfN(nMut, Gen.zip(Gen.choose(0, nIns - 1),
        Gen.oneOf("del", "upd"), Gen.choose(-50L, 50L)))
    } yield (inserts, muts)
    val prop = forAll(gen) { case (inserts, muts) =>
      val live = scala.collection.mutable.Map[Int, (String, Long)]()
      val deltas = scala.collection.mutable.ListBuffer[(String, Long, Long)]()
      inserts.zipWithIndex.foreach { case ((k, v), i) =>
        live(i) = (k, v); deltas += ((k, 1L, v))
      }
      muts.foreach { case (rid, op, nv) =>
        live.get(rid).foreach { case (k, ov) =>
          if (op == "del") { live.remove(rid); deltas += ((k, -1L, -ov)) }
          else { live(rid) = (k, nv); deltas += ((k, 0L, nv - ov)) }
        }
      }
      val view = Ivm.applyDeltas(
        Ivm.initialize(Seq.empty[(String, Long)].toDF("k", "v"),
          Seq("k"), "v"),
        deltas.toSeq.toDF("k", "d_count", "d_sum"), Seq("k"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val expect = live.values.groupBy(_._1).map { case (k, vs) =>
        k -> ((vs.size.toLong, vs.map(_._2).sum))
      }
      view == expect
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(25))
    assert(res.passed, res.status.toString)
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

  private def mmMap(view: org.apache.spark.sql.DataFrame) =
    Ivm.minMaxOf(view, Seq("k")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  private def noRescan: org.apache.spark.sql.DataFrame =
    sys.error("base must NOT be rescanned when no window drained")

  test("maintained MIN/MAX: deltas converge to the recompute; the " +
    "base is rescanned ONLY when a window drains") {
    val base = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 5L, 3L),
      ("b", 7L, 4L)).toDF("k", "v", "rid")
    val view0 = Ivm.initializeMinMax(base, Seq("k"), "v", "rid", k = 2)
    assert(mmMap(view0) === Map("a" -> ((3L, 20L, 5L)),
      "b" -> ((1L, 7L, 7L))))
    // insert a=30, delete a's 20: windows absorb both — the throwing
    // rescan thunk proves the base is never touched
    val d1 = Seq(("a", 1L, 30L, 5L), ("a", -1L, 20L, 2L))
      .toDF("k", "op", "v", "rid")
    val view1 = Ivm.applyMinMaxDeltas(view0, d1, Seq("k"), "v", "rid",
      k = 2, noRescan)
    assert(mmMap(view1) === Map("a" -> ((3L, 30L, 5L)),
      "b" -> ((1L, 7L, 7L))))
    // delete a's 30 and 10: the top window drains (value 5 was pushed
    // out of the k=2 window at init) — ONLY group a rescans, and the
    // result is the exact recompute
    val d2 = Seq(("a", -1L, 30L, 5L), ("a", -1L, 10L, 1L))
      .toDF("k", "op", "v", "rid")
    val after = Seq(("a", 5L, 3L), ("b", 7L, 4L)).toDF("k", "v", "rid")
    val view2 = Ivm.applyMinMaxDeltas(view1, d2, Seq("k"), "v", "rid",
      k = 2, after)
    assert(mmMap(view2) === Map("a" -> ((1L, 5L, 5L)),
      "b" -> ((1L, 7L, 7L))))
    // a key vanishing entirely (count 0) drops without a rescan
    val d3 = Seq(("a", -1L, 5L, 3L)).toDF("k", "op", "v", "rid")
    val view3 = Ivm.applyMinMaxDeltas(view2, d3, Seq("k"), "v", "rid",
      k = 2, noRescan)
    assert(mmMap(view3) === Map("b" -> ((1L, 7L, 7L))))
  }

  test("maintained MIN/MAX: the partial rescan touches ONLY drained " +
    "groups — a poisoned non-drained group in rescanBase must not " +
    "leak into the result") {
    val base = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 5L, 3L),
      ("b", 7L, 4L)).toDF("k", "v", "rid")
    val view0 = Ivm.initializeMinMax(base, Seq("k"), "v", "rid", k = 2)
    // drain group a's top window (delete both stored pairs; 5 was
    // pushed out at init so the floor is unknown)
    val d = Seq(("a", -1L, 20L, 2L), ("a", -1L, 10L, 1L))
      .toDF("k", "op", "v", "rid")
    // rescanBase: group a correct, group b POISONED — if the rescan
    // read any group beyond the drained set, b would come back 999
    val poisoned = Seq(("a", 5L, 3L), ("b", 999L, 4L))
      .toDF("k", "v", "rid")
    val view1 = Ivm.applyMinMaxDeltas(view0, d, Seq("k"), "v", "rid",
      k = 2, poisoned)
    assert(mmMap(view1) === Map("a" -> ((1L, 5L, 5L)),
      "b" -> ((1L, 7L, 7L))),
      "rescan must semi-join to the drained keys only")
  }

  test("maintained MIN/MAX: same-value update, transient row, and " +
    "redelivered insert all leave the window exact (no phantom " +
    "eviction, no phantom member)") {
    val base = Seq(("a", 100L, 1L), ("a", 50L, 2L), ("a", 40L, 3L),
      ("a", 10L, 4L)).toDF("k", "v", "rid")
    val view0 = Ivm.initializeMinMax(base, Seq("k"), "v", "rid", k = 3)
    assert(mmMap(view0) === Map("a" -> ((4L, 100L, 10L))))
    // same-value CDC update of the max row: del(100,1) + ins(100,1).
    // The buggy merge no-op-added the insert but still evicted the
    // live floor, then the delete removed the real max — reporting 50.
    val d1 = Seq(("a", -1L, 100L, 1L), ("a", 1L, 100L, 1L))
      .toDF("k", "op", "v", "rid")
    val view1 = Ivm.applyMinMaxDeltas(view0, d1, Seq("k"), "v", "rid",
      k = 3, noRescan)
    assert(mmMap(view1) === Map("a" -> ((4L, 100L, 10L))),
      "a same-value update must not change the extrema")
    // transient row inside one batch: ins(70,9) + del(70,9) nets out —
    // the window must NOT retain the never-live pair as a phantom max
    val d2 = Seq(("a", 1L, 70L, 9L), ("a", -1L, 70L, 9L),
      ("a", -1L, 100L, 1L)).toDF("k", "op", "v", "rid")
    val view2 = Ivm.applyMinMaxDeltas(view1, d2, Seq("k"), "v", "rid",
      k = 3, noRescan)
    assert(mmMap(view2) === Map("a" -> ((3L, 50L, 10L))),
      "a transient insert+delete must leave no phantom member")
  }

  test("maintained MIN/MAX: seeded random insert/delete churn with a " +
    "tiny window equals the recompute at every step") {
    val rnd = new scala.util.Random(42)
    var live = Map.empty[Long, (String, Long)] // rid -> (k, v)
    var nextRid = 0L
    def liveDf = {
      val rows = live.toSeq.map { case (rid, (k, v)) => (k, v, rid) }
      if (rows.isEmpty) Seq.empty[(String, Long, Long)].toDF("k", "v", "rid")
      else rows.toDF("k", "v", "rid")
    }
    // seed state
    (1 to 12).foreach { _ =>
      live += nextRid -> (("g" + rnd.nextInt(3), rnd.nextInt(50).toLong))
      nextRid += 1
    }
    var view = Ivm.initializeMinMax(liveDf, Seq("k"), "v", "rid", k = 2)
    (1 to 6).foreach { _ =>
      // a batch of random inserts and deletes (deletes pick live rows)
      val ops = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long)]
      (1 to 4).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 if live.nonEmpty => // delete a live row
            val rid = live.keys.toSeq.sorted.apply(rnd.nextInt(live.size))
            val (k, v) = live(rid)
            ops += ((k, -1L, v, rid)); live -= rid
          case 2 if live.nonEmpty => // in-batch UPDATE of a live row
            // (del old + ins new, same rid; sometimes the same value
            // — the no-op-update shape that corrupted the window)
            val rid = live.keys.toSeq.sorted.apply(rnd.nextInt(live.size))
            val (k, v) = live(rid)
            val v2 = if (rnd.nextBoolean()) v else rnd.nextInt(50).toLong
            ops += ((k, -1L, v, rid)); ops += ((k, 1L, v2, rid))
            live += rid -> ((k, v2))
          case 3 => // transient row: insert + delete in one batch
            val k = "g" + rnd.nextInt(3)
            val v = rnd.nextInt(50).toLong
            ops += ((k, 1L, v, nextRid)); ops += ((k, -1L, v, nextRid))
            nextRid += 1
          case _ => // plain insert
            val k = "g" + rnd.nextInt(3)
            val v = rnd.nextInt(50).toLong
            ops += ((k, 1L, v, nextRid)); live += nextRid -> ((k, v))
            nextRid += 1
        }
      }
      view = Ivm.applyMinMaxDeltas(view,
        ops.toSeq.toDF("k", "op", "v", "rid"), Seq("k"), "v", "rid",
        k = 2, liveDf)
      val expect = live.values.groupBy(_._1).map { case (k, vs) =>
        k -> ((vs.size.toLong, vs.map(_._2).max, vs.map(_._2).min))
      }
      assert(mmMap(view) === expect,
        s"diverged from recompute; live=$live")
    }
  }
}
