package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import graft.sources.FileSources

class FileSourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def write(dir: String, name: String, lines: Seq[String]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, String.join("\n", lines: _*).getBytes("UTF-8"))
    p.toString
  }

  test("JSONL: malformed lines captured, well-formed rows typed; " +
    "no bytes lost") {
    val dir = tmpDir("jsonl")
    val f = write(dir, "in.jsonl", Seq(
      """{"id": 1, "name": "ok", "score": 0.5}""",
      """{"id": 2, "name": "also ok"}""",          // missing field -> null
      """{"id": "not a long", "name": "bad type"}""",
      """{broken json"""))
    val df = FileSources.readJsonl(spark, f, schema)
    val (good, bad) = FileSources.partitioned(df)
    assert(good.count() === 2)
    assert(bad.count() === 2)
    assert(good.schema.fieldNames.toSeq === Seq("id", "name", "score"))
    val byId = good.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(2) === 0.5)
    assert(byId(2L).isNullAt(2))
    // corrupt rows keep the RAW line for quarantine/debugging
    val raw = bad.select(FileSources.CorruptCol).collect()
      .map(_.getString(0)).toSet
    assert(raw.exists(_.contains("broken json")))
    assert(raw.exists(_.contains("not a long")))
  }

  test("CSV: type-mismatched and ragged rows captured; delimiter and " +
    "header honored") {
    val dir = tmpDir("csv")
    val f = write(dir, "in.csv", Seq(
      "id|name|score",
      "1|alpha|2.5",
      "oops|beta|1.0", // bad id type
      "3|gamma|not_a_double"))
    val df = FileSources.readCsv(spark, f, schema,
      header = true, delimiter = "|")
    val (good, bad) = FileSources.partitioned(df)
    assert(good.count() === 1)
    assert(good.head.getLong(0) === 1L)
    assert(bad.count() === 2)
  }
}
