package graft

import org.apache.spark.sql.functions._
import graft.operators.{ZoneMaps, ZOrder}

/** Lexical diversity, zone-map pruning, band histogram, matryoshka
  * recall (q115–q118).
  */
class ZoneMapsLexSpec extends SparkSpec {
  import spark.implicits._

  test("lexical diversity: hand-computed TTR / hapax / concentration") {
    val docs = Seq((1L, "a a a b c"), (2L, "x y")).toDF("doc_id", "text")
    // same two-level aggregate as q115, on a hand-checkable fixture
    val tf = docs
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("t"))
      .filter($"t" =!= "").groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val stats = tf.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"),
        max("c").as("max_c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(stats(1L) === ((5L, 3L, 2L, 3L))) // a×3 b c → 5 tok, 3 types
    assert(stats(2L) === ((2L, 2L, 2L, 1L)))
  }

  test("zone maps: z-ordered layout prunes, random layout does not") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id",
        floor($"value" / 10).as("vbin"),
        ZOrder.interleave($"user_id", floor($"value" / 10), bits = 16)
          .as("zkey"))
    val ranges = Seq(("user_id", 1L, 5L), ("vbin", 2L, 5L))
    val zordered = ZoneMaps.statsAndPrune(ev,
      Seq(col("zkey"), col("event_id")), files = 16, ranges)
    val random = ZoneMaps.statsAndPrune(ev,
      Seq(col("event_id")), files = 16, ranges)
    val zSkipped = zordered.filter(!col("would_scan")).count()
    val rSkipped = random.filter(!col("would_scan")).count()
    assert(zSkipped > 0,
      "z-ordered layout must make some files skippable")
    assert(rSkipped === 0L,
      "arrival-order layout has full-range zone maps: nothing prunes")
    // soundness: every matching row lives in a would-scan file
    val matches = ev.filter($"user_id".between(1, 5) &&
      $"vbin".between(2, 5)).count()
    val scannedMatches = ev
      .withColumn("file_id", ntile(16).over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"zkey", $"event_id")))
      .join(zordered.filter(col("would_scan")).select("file_id"), "file_id")
      .filter($"user_id".between(1, 5) && $"vbin".between(2, 5))
      .count()
    assert(scannedMatches === matches, "pruning must never drop a match")
  }

  test("band histogram: bands partition the rows near-equally") {
    val out = SparkEntry.queries("q117_band_histogram")(
        spark, "/root/testdata/sf0.001")
      .orderBy("band").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    val counts = out.map(_.getLong(1))
    val total = counts.sum
    counts.foreach(c => assert(math.abs(c - total / 4.0) < total * 0.02,
      s"equi-depth bands must be within 2%: ${counts.mkString(",")}"))
    // bands tile the value space in order
    val maxes = out.map(_.getLong(3)); val mins = out.map(_.getLong(2))
    (0 to 2).foreach(i => assert(maxes(i) <= mins(i + 1)))
  }

  test("matryoshka: full-dim recall of itself is 1; truncated recall " +
    "in (0, 1]") {
    val rec = SparkEntry.queries("q118_matryoshka_recall")(
        spark, "/root/testdata/sf0.001")
      .select("recall").as[Double].collect()
    assert(rec.length === 8)
    rec.foreach(r => assert(r >= 0.0 && r <= 1.0))
    assert(rec.max > 0.0, "16 of 64 dims should retain SOME neighbors")
  }
}
