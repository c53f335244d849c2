package graft

import java.sql.Timestamp

/** Hand-computed semantics for the round-6 relational-analytics
  * additions: market-basket rules (q206), sweep-line interval
  * overlap (q207), FD audit (q208), blocking metrics (q209), and
  * integer HITS (q210) — driven through `SparkEntry.queries`
  * against a fixture table dir shaped like the driver's testdata.
  */
class BasketGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  private lazy val dir: String = {
    val d = tmpDir("graft_basket_")
    // Baskets (orders 1-6): o1{p1,p2,p3} o2{p1,p2} o3{p1,p2,p4}
    // o4{p3,p4} o5{p5} o6{p1}. Frequent pairs (minSupp 2): only
    // (p1,p2) with n_ab=3, n_a=4, n_b=3.
    // Orders 101-104 carry supplier 10's interval fixture (distinct
    // singleton parts 91-94 — no pair pollution): quantities 1,2,1,3
    // → durations 2,3,2,4 days → closed intervals [1/1,1/3]
    // [1/2,1/5] [1/5,1/7] [1/10,1/14]: overlaps A-B and B-C (closed
    // touch at 1/5), peak concurrency 2.
    val li = Seq(
      (1L, 1L, 1L, 1, 5.0, "1996-01-01"), (1L, 2L, 1L, 2, 5.0, "1996-01-01"),
      (1L, 3L, 1L, 3, 5.0, "1996-01-01"),
      (2L, 1L, 2L, 1, 5.0, "1996-02-01"), (2L, 2L, 2L, 2, 5.0, "1996-02-01"),
      (3L, 1L, 3L, 1, 5.0, "1996-03-01"), (3L, 2L, 3L, 2, 5.0, "1996-03-01"),
      (3L, 4L, 3L, 3, 5.0, "1996-03-01"),
      (4L, 3L, 4L, 1, 5.0, "1996-04-01"), (4L, 4L, 4L, 2, 5.0, "1996-04-01"),
      (5L, 5L, 5L, 1, 5.0, "1996-05-01"),
      (6L, 1L, 6L, 1, 5.0, "1996-06-01"),
      (101L, 91L, 10L, 1, 1.0, "2024-01-01"),
      (102L, 92L, 10L, 1, 2.0, "2024-01-02"),
      (103L, 93L, 10L, 1, 1.0, "2024-01-05"),
      (104L, 94L, 10L, 1, 3.0, "2024-01-10"))
    li.map { case (ok, pk, sk, ln, q, sd) =>
      (ok, pk, sk, ln, q, 100.0, 0.0, 0.0, "N", "O", ts(sd))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    (1L to 6L).map(k => (k, k, "O", 100.0, ts("1996-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    // Blocks: nation 0 = {CA1, CA2, CB9}, nation 1 = {CA3, Zed};
    // all ids % 20 == 0 → everything sampled. Truth (lev ≤ 3):
    // 6 pairs, 3 inside block 0 → completeness 5000 bp. Candidate
    // pairs 3+1=4 of C(5,2)=10 → reduction ratio 6000 bp.
    Seq((20L, "Customer A1", 0L), (40L, "Customer A2", 0L),
        (60L, "Customer B9", 0L), (80L, "Customer A3", 1L),
        (100L, "Zed", 1L))
      .toDF("c_custkey", "c_name", "c_nationkey")
      .withColumn("c_mktsegment",
        org.apache.spark.sql.functions.lit("BUILDING"))
      .write.parquet(s"$d/customer.parquet")
    // nationkey 1 maps to two regions → FD violated.
    Seq((1L, "A", 10L), (1L, "A2", 20L), (2L, "B", 10L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    // HITS graph from doc_id ∈ 0..4: edges i→7i%500 and i→13i%500.
    (0L to 4L).map(i => (i, s"doc $i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q206: Apriori rules hand-computed; prune is lossless") {
    val rows = q("q206_market_basket").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (1L, 2L, 3L, 4L, 3L))
    assert(r.getLong(5) == 7500L) // conf = 3*10000 div 4
    assert(r.getLong(6) == 1500L) // lift = 3*6*1000 div (4*3)
    // Losslessness: pair counting WITHOUT the frequent-item prune
    // yields the same surviving pairs (Apriori invariant).
    val items = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val brute = items.as("a").join(items.as("b"), "ok")
      .where($"a.pk" < $"b.pk")
      .groupBy($"a.pk", $"b.pk").count().where($"count" >= 2)
      .collect()
    assert(brute.map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet == Set((1L, 2L, 3L)))
  }

  test("q207: sweep-line pairs/peak equal brute-force interval join") {
    val out = q("q207_ship_overlap").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(10L) == ((4L, 2L, 2L))) // A-B, B-C (closed touch); peak 2
    // Brute force over ALL suppliers in the fixture: materialize the
    // O(n²) pair join the sweep avoids, and compare counts.
    val iv = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_suppkey AS sk",
        "l_orderkey * 10 + l_linenumber AS iid",
        "cast(l_shipdate as date) AS s",
        "date_add(cast(l_shipdate as date), " +
          "cast(l_quantity as int) % 7 + 1) AS e")
    val brute = iv.as("a").join(iv.as("b"),
        $"a.sk" === $"b.sk" && $"a.iid" < $"b.iid" &&
          $"a.s" <= $"b.e" && $"b.s" <= $"a.e")
      .groupBy($"a.sk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((sk, (_, pairs, _)) <- out)
      assert(brute.getOrElse(sk, 0L) == pairs,
        s"supplier $sk sweep=$pairs brute=${brute.getOrElse(sk, 0L)}")
  }

  test("q208: violated FD detected, intact FD clean") {
    val rows = q("q208_fd_audit").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // nationkey 1 → {10, 20}: 2 groups, 1 violating, worst 2, 1 excess
    assert(rows("nation.nationkey->regionkey") == ((2L, 1L, 2L, 1L)))
    // single-segment customers: FD holds
    assert(rows("customer.nationkey->mktsegment") == ((2L, 0L, 1L, 0L)))
  }

  test("q209: reduction ratio from block sizes; completeness on sample") {
    val r = q("q209_blocking_metrics").collect().head
    assert(r.getLong(0) == 5L)     // n_customers
    assert(r.getLong(1) == 2L)     // n_blocks
    assert(r.getLong(2) == 4L)     // cand_pairs = C(3,2)+C(2,2 choose)
    assert(r.getLong(3) == 10L)    // all_pairs = C(5,2)
    assert(r.getLong(4) == 6000L)  // rr = 10000 - 4000
    assert(r.getLong(5) == 6L)     // truth pairs at lev ≤ 3
    assert(r.getLong(6) == 3L)     // captured inside block 0
    assert(r.getLong(7) == 5000L)  // completeness
  }

  test("q210: two-iteration HITS path counts, hand-computed") {
    // Edges: 0→{0}, 1→{7,13}, 2→{14,26}, 3→{21,39}, 4→{28,52}.
    // auth2(target of i≥1) = h1(i) = 2; auth2(0) = h1(0) = 1;
    // hub2(i≥1) = 2+2 = 4; hub2(0) = 1.
    val rows = q("q210_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 13)
    assert(rows.head == ((7L, 2L, 0L))) // auth2 desc, id asc
    assert(rows.contains((0L, 1L, 1L))) // self-loop node: both roles
    assert(rows.count { case (_, a, _) => a == 2L } == 8)
    assert(rows.filter { case (id, _, _) => id >= 1L && id <= 4L }
      .forall { case (_, a, h) => a == 0L && h == 4L })
  }
}
