package graft

import graft.operators.Observability

class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "long enough document body", Option("en"), 120L),
    (2L, "short", Option.empty[String], 5L),
    (3L, "another long document", Option("de"), 80L),
    (4L, "tiny", Option("en"), 49L),
    (5L, "edge exactly at threshold", Option.empty[String], 50L)
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("observe-gate metrics equal a dedicated aggregation pass") {
    val m = Observability.gateWithMetrics(docs, minChars = 50L).head()
    assert(m.getAs[Long]("n_docs") === 5L)
    assert(m.getAs[Long]("total_chars") === 304L)
    assert(m.getAs[Long]("min_chars") === 5L)
    assert(m.getAs[Long]("max_chars") === 120L)
    assert(m.getAs[Long]("null_lang") === 2L)
    assert(m.getAs[Long]("n_short") === 2L)
    assert(m.getAs[Long]("n_kept") === 3L) // 120, 80, and the 50 edge
  }

  test("metrics are partitioning-invariant (exact aggregates only)") {
    val one = Observability.gateWithMetrics(docs.repartition(1)).head()
    val many = Observability.gateWithMetrics(docs.repartition(7)).head()
    assert(one === many)
  }
}
