package graft

import org.apache.spark.sql.functions._

class GraftFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("dedupFuzzy: transitive near-dup cluster collapses to canonical doc") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (9L, "completely different content about distributed query engines")
    ).toDF("doc_id", "text")
    val kept = Graft.dedupFuzzy(docs, "text", "doc_id", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 9L))
  }

  test("facade weather slice: flatten -> quality -> upsert") {
    val raw = Fixtures.standardBatch(spark)
    val staged = Graft.flattenWeather(raw, "b1")
    val report = Graft.qualityCheck(staged, "b1")
    assert(report.passed)
    val dir = tmpDir("facade") + "/wh"
    Graft.upsert(spark, dir, staged, Seq("city", "ts_utc"))
    Graft.upsert(spark, dir, staged, Seq("city", "ts_utc")) // idempotent
    assert(spark.read.parquet(dir).count() === 9)
  }

  test("withLanguage/withTextQuality attach columns") {
    val docs = Seq((1L, "the cat and the dog of the house is in that garden"))
      .toDF("doc_id", "text")
    val out = Graft.withLanguage(
      Graft.withTextQuality(docs, "text"), "text", "doc_id").head()
    assert(out.getAs[String]("detected_lang") === "en")
    assert(out.getAs[Double]("quality_score") === 1.0)
  }
}
