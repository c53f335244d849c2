package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus line-level deduplication — the C4/CCNet/RefinedWeb
  * cleaning step: a line (or paragraph) that occurs verbatim in many
  * documents is boilerplate (navigation chrome, cookie banners,
  * license headers) and is dropped from EVERY document, while each
  * document's unique lines survive and the document is reassembled in
  * original line order.
  *
  * Reference scope: the reference engine's dedup surface is row-level
  * (`transformation/clean_data.py:128-139` drops whole duplicate
  * records); this operator is the sub-document extension of the same
  * idea for LLM corpus prep.
  *
  * Scale shape (100 TB): three shuffles, all on narrow keys —
  *   1. line-frequency aggregate keyed by `md5(line)` (32-char key,
  *      never the line text; two-phase count-distinct of doc ids),
  *   2. lines ⋈ frequency equi-join on the same md5 key,
  *   3. per-document reassembly keyed by doc id.
  * Nothing is ever all-pairs and no step needs the corpus on one
  * node. The md5 keying means two distinct lines colliding would be
  * counted together — probability ~n²/2¹²⁸, ignorable and
  * non-adversarial here (use a 256-bit hash if an adversary controls
  * the corpus).
  *
  * Semantics:
  *  - lines = `split(text, delim)`; order within a doc is preserved;
  *  - a line is ELIGIBLE for dedup iff `length(trim(line)) >=
  *    minLineLen` — blank/short lines are structure, kept verbatim;
  *  - an eligible line is dropped from all docs iff it occurs in more
  *    than `maxDocs` DISTINCT documents (within-doc repeats don't
  *    count — they're the repetition score's business, q73);
  *  - every input doc appears in the output, with `clean_text = ""`
  *    when all its lines are dropped.
  *
  * Output: (id, clean_text, n_lines, n_dropped).
  */
object LineDedup {

  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 delim: String = "\n", maxDocs: Int = 1,
                 minLineLen: Int = 1): DataFrame = {
    val lines = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
          .as(Seq("ln", "line")))
      .withColumn("eligible", length(trim(col("line"))) >= minLineLen)

    val freq = lines.filter(col("eligible"))
      .groupBy(md5(col("line")).as("h"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") > maxDocs)

    // anti-join against the (typically much smaller) boilerplate set:
    // only lines whose hash is over-threshold are dropped
    val kept = lines
      .join(freq, md5(col("line")) === freq("h"), "left_anti")

    val rebuilt = kept.groupBy("id")
      .agg(
        concat_ws(delim,
          transform(array_sort(collect_list(struct(col("ln"), col("line")))),
            s => s.getField("line"))).as("clean_text"),
        count(lit(1)).as("n_kept"))

    val totals = lines.groupBy("id").agg(count(lit(1)).as("n_lines"))

    totals.join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
