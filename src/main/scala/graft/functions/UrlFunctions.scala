package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl curation: per-domain corpus mixing,
  * URL-level dedup, and blocklist joins all need one canonical form
  * per page, not the dozen raw spellings crawls actually contain
  * (scheme variants, `www.`, tracking params, fragments, trailing
  * slashes, host case).
  *
  * Built on `regexp_extract`/`regexp_replace` rather than Spark's
  * `parse_url` so the exact same expressions replay in the SQL oracle
  * (RE2-compatible patterns), and everything stays inside whole-stage
  * codegen. Canonical form: `host/path` — lowercased host, `www.` and
  * port stripped, query/fragment dropped, trailing slash removed.
  */
object UrlFunctions {

  /** Hostname: authority between `scheme://` and the first `/?#`,
    * lowercased, with any `:port` and leading `www.` stripped.
    */
  def urlHost(u: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
        lit(":\\d+$"), lit("")),
      lit("^www\\."), lit(""))

  /** Path with query/fragment dropped and any trailing slash removed. */
  def urlPath(u: Column): Column =
    regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      lit("/+$"), lit(""))

  /** Canonical `host/path` form used as the URL-dedup key. */
  def normalizeUrl(u: Column): Column = concat(urlHost(u), urlPath(u))

  /** Registered domain ≈ the last two host labels. (A real crawl
    * pipeline consults the public-suffix list for co.uk-style suffixes;
    * the two-label fallback is the standard approximation when that
    * table isn't loaded.)
    */
  def registeredDomain(u: Column): Column =
    regexp_extract(urlHost(u), "([^.]+\\.[^.]+)$", 1)
}
