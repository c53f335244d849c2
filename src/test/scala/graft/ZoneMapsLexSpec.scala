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

  test("bloom skip: no false negatives ever; absent keys prune most " +
    "files; saturated filter admits everything") {
    val rows = (0L until 400L).map(i => s"k$i").toDF("k")
    val present = (0L until 400L by 10).map(i => s"k$i").toDF("probe_key")
    val absent = (0L until 30L).map(i => s"absent$i").toDF("probe_key")
    val out = graft.operators.BloomSkip.sidecarAndProbe(
        rows, Seq(md5($"k")), files = 8, keyCol = "k",
        probes = present.union(absent), probeCol = "probe_key")
      .collect().map(r => r.getAs[String]("probe_key") ->
        ((r.getAs[Long]("n_scan"), r.getAs[Long]("n_true"),
          r.getAs[Long]("n_false_pos")))).toMap
    assert(out.size === 70)
    // soundness: every present key's true file is admitted (n_true=1
    // and n_scan >= 1); distinct keys live in exactly one file here
    present.collect().map(_.getString(0)).foreach { k =>
      val (scan, tru, fp) = out(k)
      assert(tru === 1L, s"$k: its containing file must be admitted")
      assert(scan >= 1L && fp === scan - tru)
    }
    // pruning: absent keys skip MOST of the 8 files (m=256,k=2 at
    // ~50 keys/file ≈ 13% fill → fp rate well under half per file)
    val absScans = absent.collect().map(r => out(r.getString(0))._1)
    assert(absScans.forall(_ <= 8L))
    assert(absScans.sum < 8L * 30L / 2,
      s"absent keys should prune more than half the file visits: " +
        s"${absScans.sum}")
    // saturation: m=4 bits can't discriminate — everything admits,
    // nothing is ever missed (soundness survives saturation)
    val sat = graft.operators.BloomSkip.sidecarAndProbe(
        rows, Seq(md5($"k")), files = 4, keyCol = "k",
        probes = present, probeCol = "probe_key", mBits = 4, kHashes = 2)
      .collect()
    sat.foreach(r => assert(r.getAs[Long]("n_scan") === 4L &&
      r.getAs[Long]("n_true") === 1L))
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
