package graft

import java.nio.file.Files

import graft.operators.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  // keys sized to plan 1, 2, and 3 files at target 100 bytes
  // (row overhead 16 + text bytes)
  private def docs = Seq(
    (1L, "a", "x" * 30), (2L, "a", "x" * 30),          // a: 92 B  → 1
    (3L, "b", "x" * 60), (4L, "b", "x" * 60),          // b: 152 B → 2
    (5L, "c", "x" * 80), (6L, "c", "x" * 80),
    (7L, "c", "x" * 80)                                // c: 288 B → 3
  ).toDF("doc_id", "key", "text")

  test("plan: per-key byte estimate, file count, cumulative offsets") {
    val p = Compaction.plan(docs, "key", "text", targetFileBytes = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(p("a") === ((2L, 92L, 1L, 0L)))
    assert(p("b") === ((2L, 152L, 2L, 1L)))
    assert(p("c") === ((3L, 288L, 3L, 3L)))
  }

  test("plan: empty-text rows still cost the row overhead; tiny keys " +
    "get exactly one file") {
    val d = Seq((1L, "k", "")).toDF("doc_id", "key", "text")
    val p = Compaction.plan(d, "key", "text", 1000L).head()
    assert(p.getAs[Long]("est_bytes") === 16L)
    assert(p.getAs[Long]("n_files") === 1L)
  }

  test("writeCompacted places the planned number of parquet files " +
    "per key (all buckets hit at realistic rows-per-file) and loses " +
    "no rows") {
    // 36 rows/key of 100 B at target 600 B → 7 files/key, ~5 rows per
    // bucket: every bucket deterministically non-empty
    val big = (0L until 108L).map(i =>
      (i, Seq("a", "b", "c")(  (i % 3).toInt ), "x" * 84))
      .toDF("doc_id", "key", "text")
    val out = Files.createTempDirectory("graft_compact_").toString
    val p = Compaction.writeCompacted(big, "key", "doc_id", "text",
      targetFileBytes = 600L, outPath = out)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    def filesOf(k: String): Int =
      new java.io.File(s"$out/key=$k").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    assert(p.values.toSet === Set(6L)) // 36*(84+16)=3600 B → 6 files
    assert(filesOf("a") === 6)
    assert(filesOf("b") === 6)
    assert(filesOf("c") === 6)
    val back = spark.read.parquet(out)
    assert(back.count() === 108L)
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ===
      (0L until 108L).toSet)
  }
}
