package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact emails, US
  * phone numbers, and IPv4 addresses, keeping per-document counts so
  * downstream filtering can drop PII-dense documents instead of just
  * masking them (the usual curation policy: redact a little, drop a
  * lot).
  *
  * Everything is `regexp_count`/`regexp_replace` over codegen'd native
  * expressions — no UDFs — so the scrub runs inside whole-stage
  * codegen in one pass over the corpus, and the patterns are written
  * in the regex subset (character classes, bounded repetition, `\b`)
  * that Java regex and RE2-family engines interpret identically, which
  * is what lets the DuckDB oracle replay the scrub verbatim.
  *
  * Counts are taken on the ORIGINAL text per pattern independently,
  * then replacements are applied email → phone → IPv4 (phones and
  * IPv4s can't overlap — dots vs dashes — and neither matches inside
  * an already-redacted `<EMAIL>` token).
  */
object Redaction {

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")),
      lit(Ipv4Re), lit("<IP>"))

  /** Adds `n_emails`, `n_phones`, `n_ips`, and `redacted` to `df`. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Re)))
      .withColumn("redacted", redactText(t))
  }
}
