package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL extraction + canonicalization for web-corpus curation (north-star
  * surface beside [[TextSanitize]]): pull URLs out of document text,
  * normalize them to a canonical form so syntactic variants collapse,
  * and derive the host/domain for per-domain corpus policies (source
  * caps, blocklists, provenance stats — the URL-dedup step every
  * published web pipeline applies before text dedup, e.g. C4 §2.1 /
  * RefinedWeb §3.1).
  *
  * Canonical form (the common subset of published URL-normalization
  * rules, RFC 3986 §6 syntax-based normalization):
  *   - scheme and host lowercased; userinfo (`user:pw@`) dropped;
  *   - leading `www.` and scheme-default ports (`:80` http, `:443`
  *     https) dropped;
  *   - fragment (`#…`) dropped;
  *   - tracking query params (`utm_*`, `gclid`, `fbclid`, `ref`)
  *     dropped, remaining params sorted for order-insensitivity;
  *   - trailing `/` on the path dropped (path CASE IS KEPT — paths are
  *     case-sensitive per RFC 3986).
  *
  * Everything is pure `Column` regex/array algebra inside the Java∩RE2
  * dialect ([[TextSanitize]] rules), so the whole pipeline replays in
  * DuckDB for the `doc_url_domains` oracle — and stays codegen'd, scan-
  * local, zero-shuffle until the final domain aggregation.
  */
object UrlOps {

  /** Matches a URL in running text (scheme case-insensitively); trailing
    * sentence punctuation is trimmed by [[canonicalizeUrl]], not here. */
  val UrlPattern: String = "(?i)" + TextSanitize.UrlPattern // https?://[^\s]+

  /** All URLs in a text column, in order of appearance. */
  def extractUrls(c: Column): Column =
    regexp_extract_all(c, lit(UrlPattern), lit(0))

  private val TrackingParam = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)(=.*)?$"

  /** RFC 3986 §6 syntax-based canonicalization of a single URL column. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // strip scheme, then fragment, then trailing sentence punctuation
    val rest = regexp_replace(
      regexp_replace(regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", ""), "#.*$", ""),
      "[.,;:!?)\\]]+$", "")
    val hostport = regexp_extract(rest, "^([^/?]+)", 1)
    val pathq = regexp_replace(rest, "^[^/?]+", "")
    val hostNoUser = regexp_replace(hostport, "^[^@/]*@", "")
    val hostNoPort = when(scheme === "http", regexp_replace(lower(hostNoUser), ":80$", ""))
      .when(scheme === "https", regexp_replace(lower(hostNoUser), ":443$", ""))
      .otherwise(lower(hostNoUser))
    val host = regexp_replace(hostNoPort, "^www\\.", "")
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(TrackingParam))), "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** Host of a canonical (or raw) URL — the per-domain policy key. */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "://([^/?#]+)", 1)),
        "^[^@/]*@", ""),
      "^www\\.|:[0-9]+$", "")
}
