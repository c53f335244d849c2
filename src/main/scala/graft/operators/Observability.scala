package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline observability via `Dataset.observe`.
  *
  * A 100 TB quality gate cannot afford a second scan just to report
  * what it saw: `observe` accumulates aggregates ON THE EXECUTORS as
  * rows flow through the main job, so the data-quality report is a
  * by-product of the pass that was already running (the same idea as
  * the reference's quality-report sink, but with zero extra reads).
  *
  * Only EXACT, order-insensitive aggregates are observed (count / sum
  * / min / max over integers): those are deterministic under any
  * partitioning, which keeps the metrics oracle-replayable. Floating
  * means are derived from the exact sums afterwards, never observed
  * directly.
  */
object Observability {

  /** Runs the corpus length gate (keep docs with ≥ `minChars` chars)
    * and returns the one-row metrics report collected during that
    * single pass: input counts, char totals/extremes, null-language
    * and too-short counts, and the kept count. A fresh [[Observation]]
    * is created per call — Spark binds one observation instance to one
    * action.
    */
  def gateWithMetrics(docs: DataFrame, minChars: Long = 50L): DataFrame = {
    val spark = docs.sparkSession
    val obs = Observation(s"corpus_gate_${System.nanoTime()}")
    val observed = docs.observe(obs,
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      count(when(col("lang").isNull, 1)).as("null_lang"),
      count(when(col("n_chars") < minChars, 1)).as("n_short"))
    // the main job: the gate itself. Metrics ride this action.
    val nKept = observed.filter(col("n_chars") >= minChars).count()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_docs").asInstanceOf[Long],
      m("total_chars").asInstanceOf[Long],
      m("min_chars").asInstanceOf[Long],
      m("max_chars").asInstanceOf[Long],
      m("null_lang").asInstanceOf[Long],
      m("n_short").asInstanceOf[Long],
      nKept))
      .toDF("n_docs", "total_chars", "min_chars", "max_chars",
        "null_lang", "n_short", "n_kept")
  }
}
