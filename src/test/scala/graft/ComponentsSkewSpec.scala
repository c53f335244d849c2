package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, Skew}

class ComponentsSkewSpec extends SparkSpec {
  import spark.implicits._

  test("cached components equal the uncached fixpoint; key isolation") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val plain = Components.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cached = Components.connectedComponentsCached(pairs, "spec-key-a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cached === plain)
    // repeated call with the same key returns the memoized result
    val again = Components.connectedComponentsCached(pairs, "spec-key-a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === plain)
    // a DIFFERENT key computes from its own input, not the memo
    val other = Seq((10L, 11L)).toDF("id_a", "id_b")
    val otherLabels = Components.connectedComponentsCached(other, "spec-key-b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(otherLabels === Set((10L, 10L), (11L, 10L)))
  }

  test("connected components: empty pairs and string ids work") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.connectedComponents(empty).count() === 0)
    // corpus unchanged when there are no near-dups (the common case)
    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    assert(Components.dedupCorpus(docs, "doc_id", empty).count() === 2)

    val strPairs = Seq(("uuid-b", "uuid-a"), ("uuid-b", "uuid-c"))
      .toDF("id_a", "id_b")
    val comps = Components.connectedComponents(strPairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps.values.toSet === Set("uuid-a"))
  }

  test("connected components: chain and clique collapse, singleton kept apart") {
    // chain 1-2-3, pair 10-11, isolated 20 not in pairs at all
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Components.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) === 1L && comps(2L) === 1L && comps(3L) === 1L)
    assert(comps(10L) === 10L && comps(11L) === 10L)
    assert(!comps.contains(20L))
  }

  test("connected components converge on a long chain (transitive closure)") {
    val pairs = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Components.connectedComponents(pairs).collect()
    assert(comps.forall(_.getLong(1) == 1L))
  }

  test("dedupCorpus keeps canonical member + unpaired docs") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "a''"), (10L, "b"),
      (11L, "b'"), (20L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Components.dedupCorpus(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 10L, 20L))
  }

  test("canonicalByScore keeps the best-scoring cluster member, " +
    "ties break to min id, unpaired docs survive") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a'", 30L), (3L, "a''", 30L), // cluster A
      (10L, "b", 5L), (11L, "b'", 4L),                   // cluster B
      (20L, "c", 1L)                                     // unpaired
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Components.canonicalByScore(docs, "doc_id", "score", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // cluster A: 2 and 3 tie at 30 → 2 wins; cluster B: 10 wins on score
    assert(kept === Set(2L, 10L, 20L))
  }

  test("salted aggregate equals plain groupBy on skewed data") {
    // 90% of rows share one key — the salted plan spreads it
    val df = (1 to 10000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble))
      .toDF("k", "v")
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", salts = 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (s, c)) =>
      assert(math.abs(s - plain(k)._1) < 1e-6 && c === plain(k)._2, k)
    }
  }
}
