package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII masking + boilerplate stripping for training-data curation
  * (north-star surface alongside [[TextAnalysis]]): mask emails, URLs,
  * IPv4 addresses and phone numbers behind typed placeholder tokens,
  * and drop boilerplate lines (copyright banners, cookie/ToS notices)
  * before a document enters dedup/embedding.
  *
  * All pure `Column` expressions over `regexp_replace`/`filter` —
  * codegen'd, no UDFs. Patterns deliberately stay inside the common
  * subset of `java.util.regex` (Spark) and RE2 (the DuckDB oracle and
  * most non-JVM engines): no backreferences, no lookaround, ASCII
  * character classes — so the masking semantics are portable and
  * oracle-checkable (`doc_pii_scrub`).
  *
  * Masking order matters and is fixed: URLs first (they may embed `@`
  * and dotted digits), then emails, then IPv4, then phones — callers
  * composing the individual maskers differently would double-mask.
  */
object TextSanitize {

  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+\\d[\\d() -]{6,}\\d"

  def maskUrls(c: Column): Column = regexp_replace(c, UrlPattern, "<URL>")
  def maskEmails(c: Column): Column = regexp_replace(c, EmailPattern, "<EMAIL>")
  def maskIpv4(c: Column): Column = regexp_replace(c, Ipv4Pattern, "<IP>")
  def maskPhones(c: Column): Column = regexp_replace(c, PhonePattern, "<PHONE>")

  /** All four PII maskers in the canonical order. Idempotent: the
    * placeholder tokens match none of the patterns. */
  def maskPii(c: Column): Column =
    maskPhones(maskIpv4(maskEmails(maskUrls(c))))

  /** Case-insensitive boilerplate line markers (partial match). */
  val BoilerplatePattern: String =
    "(?i)(copyright|all rights reserved|cookie policy|terms of service|" +
      "click here to|subscribe to our newsletter)"

  /** Drop lines matching [[BoilerplatePattern]], preserving the order
    * and separators of the surviving lines. */
  def stripBoilerplate(c: Column): Column =
    array_join(filter(split(c, "\n"), l => !l.rlike(BoilerplatePattern)), "\n")

  /** Full sanitize pass: boilerplate lines out, then PII masked. */
  def sanitize(c: Column): Column = maskPii(stripBoilerplate(c))
}
