package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-crawl corpora (the Common-Crawl-style
  * front door of an LLM data pipeline: WARC/WET payloads arrive as
  * markup; everything downstream — dedup, quality, language ID —
  * operates on extracted text).
  *
  * Implementation is a fixed chain of codegen'd `regexp_replace` /
  * `replace` steps (no UDF, no per-row interpreter): strip
  * script/style/comment blocks first (their CONTENT is not text),
  * then all remaining tags, then decode the six most common entities,
  * then collapse whitespace. Every pattern is written in the common
  * Java-regex ∩ RE2 dialect — inline `(?is)` flags, lazy `.*?`, no
  * backreferences — so an external engine replays the chain verbatim
  * (q109's DuckDB oracle runs the identical patterns).
  *
  * Scale: one narrow projection pass, fully inside whole-stage
  * codegen; no shuffle, no state. At 100 TB this is a map-only stage
  * that pushes the text-column projection into the scan.
  */
object Html {

  /** Entity decode order: named entities first, `&amp;` LAST — so
    * `&amp;lt;` decodes to the literal text `&lt;` (one level), never
    * double-decodes to `<`. Deterministic and engine-portable.
    */
  private val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** Extract visible text from an HTML column. */
  def extractText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = entities.foldLeft(noTags) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Deterministic synthetic HTML wrapper used by the q109 fixture:
    * the test corpus has no markup column, so the query derives one
    * from `documents` IN BOTH ENGINES (same concat in the oracle SQL)
    * and then proves extraction inverts it. Includes the adversarial
    * bits real markup has: a script with a `<` comparison and quotes,
    * a style block, a comment, attributes, and encoded entities.
    */
  def wrapAsHtml(text: Column, source: Column, docId: Column): Column =
    concat(
      lit("<html><head><title>"), source,
      lit("</title><style type=\"text/css\">p { margin: 0; }</style>" +
        "</head><body><h1 class=\"t\">"), source,
      lit("</h1><!-- doc "), docId.cast("string"),
      lit(" --><p>"), replace(text, lit(" and "), lit(" &amp; ")),
      lit("</p><script>if (1 < 2) { x = \"a&b\"; }</script></body></html>"))
}
