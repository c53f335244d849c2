package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate detection (the CCNet/C4-style cleanup
  * signal): word n-grams that recur across MANY documents — headers,
  * footers, cookie banners, license blurbs — and the fraction of each
  * document made of them. Line-level dedup (q83) catches verbatim
  * repeated lines; this catches shared phrasing that survives line
  * edits.
  *
  * Physical shape (what matters at 100 TB): distinct doc-grams come
  * from the codegen shingle pass ([[Dedup.shingleRows]] — explode +
  * window, no interpreted HOFs); document frequency is ONE
  * hash-aggregate keyed by gram with map-side partial counts; the
  * per-doc rollup joins grams to their frequency on the gram key and
  * re-aggregates by doc — two shuffles total, each on a key whose
  * cardinality grows with the corpus (no broadcast of the gram
  * dictionary, which at corpus scale does NOT fit on one executor).
  */
object Boilerplate {

  /** Per-document boilerplate stats: of the doc's distinct `n`-grams,
    * how many occur in ≥ `minDocs` documents corpus-wide.
    * Returns (doc_id, n_grams, n_boiler, boiler_frac).
    */
  def stats(docs: DataFrame, textCol: String, idCol: String,
            n: Int = 3, minDocs: Int = 5): DataFrame = {
    val grams = Dedup.shingleRows(docs, textCol, idCol, n) // id, g, n_sh
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams.join(dfreq, "g")
      .groupBy(col("id").as("doc_id"))
      .agg(
        first(col("n_sh")).as("n_grams"),
        sum(when(col("df") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
      // exact IEEE division of two small ints — bit-identical in any
      // engine, so no rounding (round-half at the 4th decimal is NOT
      // engine-portable for ratios like k/32)
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_grams").cast("double"))
  }
}
