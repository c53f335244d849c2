package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination by exact n-gram collision — the Brown et
  * al. (GPT-3, appendix C) / Gao et al. (Pile) eval-overlap scan: a
  * training document sharing enough word n-grams with an eval suite
  * is contaminated and must be dropped or flagged before training.
  * (Reference scope: the weather stack has no eval sets; this is part
  * of the 100 TB training-data extension surface, §2-extension.)
  *
  * Scale shape: suites are tiny, the corpus is not — both forms
  * aggregate the suites to a postings table FIRST and join the raw
  * corpus gram stream ONCE on the gram key. [[matrix]] is the
  * multi-suite form: N benchmarks decontaminate in one corpus pass
  * (suite postings union into a single (suite, g) table), where the
  * per-suite-sequential form rescans 100 TB once per benchmark.
  * Fuzzy (near-match) decontamination is the near-dup probe instead:
  * [[NearDupIndex.probe]] with the suite as the batch.
  */
object Decontam {

  /** Per-corpus-doc overlap with ONE benchmark: (doc_id,
    * n_shared_grams, first_bench_hit) for docs sharing ≥1 word
    * n-gram with `bench`. Raw gram streams (no per-(id,g) distinct):
    * countDistinct and min are insensitive to join multiplicity, but
    * the bench side is deduped to postings so corpus-side duplicates
    * never multiply against bench-side duplicates.
    */
  def overlap(corpus: DataFrame, bench: DataFrame, textCol: String,
              idCol: String, n: Int = 4): DataFrame = {
    val postings = Dedup.shingleRowsRaw(bench, textCol, idCol, n)
      .groupBy("g").agg(min(col("id")).as("bench_id"))
    Dedup.shingleRowsRaw(corpus, textCol, idCol, n)
      .select(col("id").as("doc_id"), col("g"))
      .join(postings, "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        min("bench_id").as("first_bench_hit"))
  }

  /** Multi-suite decontamination MATRIX: per (corpus doc, suite),
    * shared-gram count and earliest hit. `suites` carries the suite
    * docs with a `suiteCol` label; all suites' postings union into
    * ONE (suite, g) table so the corpus gram stream is joined once —
    * adding a benchmark adds postings rows, never a corpus rescan.
    * Output: (doc_id, suite, n_shared_grams, first_bench_hit).
    */
  def matrix(corpus: DataFrame, suites: DataFrame, textCol: String,
             idCol: String, suiteCol: String, n: Int = 4): DataFrame = {
    val postings = Dedup.shingleRowsRaw(suites, textCol, idCol, n)
      .join(suites.select(col(idCol).as("id"), col(suiteCol)), "id")
      .select(col(suiteCol).as("suite"), col("g"),
        col("id").as("bench_id"))
      .groupBy("suite", "g").agg(min("bench_id").as("bh"))
    Dedup.shingleRowsRaw(corpus, textCol, idCol, n)
      .select(col("id").as("doc_id"), col("g"))
      .join(postings, "g")
      .groupBy("doc_id", "suite")
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        min("bh").as("first_bench_hit"))
  }
}
