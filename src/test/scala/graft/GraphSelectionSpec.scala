package graft

import org.apache.spark.sql.functions._

import graft.operators.{InvertedIndex, Ordinals, Pareto, Similarity, Triangles}

/** Pins the graph/selection operators added in round 5: inverted
  * index, scalable global ordinals, triangle counting, Pareto
  * frontier, SemDeDup, hard-negative mining.
  */
class GraphSelectionSpec extends SparkSpec {
  import spark.implicits._

  test("inverted index: postings sorted, df/tf correct") {
    val docs = Seq(
      (10L, "b a b"), (2L, "a c"), (7L, "a a a")
    ).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(idx === Set(
      ("a", 3L, 5L, "2,7,10"),
      ("b", 1L, 2L, "10"),
      ("c", 1L, 1L, "2")))
  }

  test("global ordinals equal the naive global row_number") {
    // Shuffled non-contiguous keys across many partitions.
    val keys = (0 until 997).map(i => (i * 7919) % 9973).map(_.toLong)
    val df = spark.createDataFrame(
      keys.map(Tuple1(_))).toDF("k").repartition(13)
    val out = Ordinals.globalOrdinals(df, "k", numPartitions = 7)
      .select("k", "ordinal")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = keys.sorted.zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toMap
    assert(out === expected)
  }

  test("ordinals are dense 0..n-1 even with empty range partitions") {
    val df = Seq(5L, 1L, 9L).toDF("k")
    val out = Ordinals.globalOrdinals(df, "k", numPartitions = 8)
      .select("k", "ordinal")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 0L), (5L, 1L), (9L, 2L)))
  }

  test("ordinals stay dense at sampler-stressing scale (the round-8 " +
    "resample bug class: two plans drew different range boundaries)") {
    // 20k keys >> sampler reach per partition — the old two-plan
    // implementation produced duplicate + missing ordinals here
    val df = spark.range(20000)
      .select((col("id") * 2654435761L % 1000003L).as("k"),
        col("id").as("tie"))
      .select((col("k") * 100000L + col("tie")).as("k")) // unique
    val out = Ordinals.globalOrdinals(df, "k", numPartitions = 16)
    val stats = out.agg(min("ordinal"), max("ordinal"),
      countDistinct(col("ordinal")), count(lit(1))).head()
    assert(stats.getLong(0) === 0L)
    assert(stats.getLong(1) === 19999L)
    assert(stats.getLong(2) === 20000L && stats.getLong(3) === 20000L)
  }

  test("triangle counts on K4 minus one edge") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("src", "dst")
    val out = Triangles.triangleCounts(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("co-occurrence edges respect support and orientation") {
    val pairs = Seq(
      (1L, 10L), (1L, 20L), // order 1: {10,20}
      (2L, 10L), (2L, 20L), // order 2: {10,20}
      (3L, 10L), (3L, 30L)  // order 3: {10,30}
    ).toDF("g", "m")
    val e = Triangles.coOccurrenceEdges(pairs, "g", "m", minSupport = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e === Set((10L, 20L))) // (10,30) support 1 — pruned
  }

  test("pareto frontier keeps exactly the non-dominated points") {
    val pts = Seq(
      (1L, 10, 0.9), // frontier (highest y)
      (2L, 20, 0.7), // frontier
      (3L, 30, 0.5), // frontier (highest x among y>=0.5)
      (4L, 20, 0.6), // dominated by 2 (same x, lower y)
      (5L, 10, 0.7), // dominated by 2 (lower x, same y)
      (6L, 30, 0.5)  // duplicate of 3 — kept (no strict dominator)
    ).toDF("id", "x", "y")
    val out = Pareto.frontier(pts, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L, 6L))
  }

  test("semanticDedup drops planted in-cluster dups, keeps min id") {
    // Two well-separated directions; ids 1,2 near-identical, 3 a
    // same-cluster non-dup, 4,5 near-identical in the other cluster.
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f)), (2L, Array(1.0f, 0.011f)),
      (3L, Array(0.6f, 0.8f)),
      (4L, Array(-1.0f, 0.0f)), (5L, Array(-1.0f, 0.005f))
    ).toDF("id", "v")
    val out = Similarity
      .semanticDedup(vecs, nClusters = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(out(1L) && !out(2L), "min id 1 kept, dup 2 dropped")
    assert(out(3L), "non-dup cluster member kept")
    assert(out(4L) && !out(5L), "min id 4 kept, dup 5 dropped")
  }

  test("hard negatives exclude same-label vectors and rank by cosine") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),  // same label as query — excluded
      (3L, Array(0.8f, 0.6f), 1),
      (4L, Array(0.0f, 1.0f), 1)
    ).toDF("id", "v", "label")
    val queries = Seq((1L, Array(1.0f, 0.0f), 0))
      .toDF("qid", "qv", "qlabel")
    val out = Similarity.hardNegatives(corpus, queries, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq === Seq((3L, 1), (4L, 2)))
  }
}
