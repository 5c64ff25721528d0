package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions P1–P12 from SURVEY.md §2.2 — every per-row
  * helper the reference implements as a Python function, re-expressed as
  * built-in (codegen'd) Column expressions. Zero UDFs in this file.
  *
  * Reference behaviors mirrored (file:line cites are into /root/reference):
  *  - P1 non-empty filter: `scripts/parsers/docx_parser.py:68-70`
  *  - P2 heading predicate: `scripts/parsers/docx_parser.py:72-73`
  *  - P3 caption predicate: `scripts/parsers/docx_parser.py:98-104`
  *  - P4 caption-kind classifier: `scripts/parsers/docx_parser.py:107-111`
  *  - P5 filename sanitizer: `scripts/parsers/docx_parser.py:114-117`
  *  - P6 whitespace normalizer: `scripts/docx_etl.py:168`
  *  - P7 embed-key concat: `scripts/services/qdrant_service.py:33`
  *  - P9 deterministic id (uuid in ref, `qdrant_service.py:32`)
  *  - P11 ext/mime resolution: `scripts/docx_etl.py:152`
  *  - P12 fuzzy match (rapidfuzz declared, never used — built as levenshtein)
  */
object Functions {

  /** P1: true when the trimmed text is non-empty. */
  def nonEmptyText(c: Column): Column = length(trim(c)) > 0

  /** P2: paragraph style marks a heading (`style.startswith(prefix)`). */
  def isHeading(style: Column, prefix: String = "Heading"): Column =
    style.startsWith(prefix)

  /** Caption prefixes from `docx_parser.py:24-26` (lowercased match). */
  val FigurePrefixes: Seq[String] = Seq("рис", "figure", "рисунок")
  val TablePrefixes: Seq[String]  = Seq("таблица", "table")

  /** P3: caption iff style == Caption OR lowercase text starts with any
    * known figure/table prefix. */
  def isCaption(style: Column, text: Column): Column = {
    val prefixHit = (FigurePrefixes ++ TablePrefixes)
      .map(p => lower(text).startsWith(p))
      .reduce(_ || _)
    (style === "Caption") || prefixHit
  }

  /** P4: "table" if text starts with a table prefix, else "figure". */
  def captionKind(text: Column): Column = {
    val isTable = TablePrefixes.map(p => lower(text).startsWith(p)).reduce(_ || _)
    when(isTable, lit("table")).otherwise(lit("figure"))
  }

  /** P5: sanitize a caption into a filename: whitespace→`_`, non-word→`_`,
    * strip leading/trailing `.`/`_`, cap at 128 chars, fallback "asset". */
  def sanitizeName(c: Column): Column = {
    val collapsed = regexp_replace(regexp_replace(c, "\\s+", "_"), "[^\\w\\-.]", "_")
    val trimmed   = regexp_replace(regexp_replace(collapsed, "^[._]+", ""), "[._]+$", "")
    val capped    = substring(trimmed, 1, 128)
    coalesce(nullif(capped, lit("")), lit("asset"))
  }

  /** P6: collapse internal whitespace runs to a single space. */
  def normalizeWs(c: Column): Column = regexp_replace(c, "\\s+", " ")

  /** P7: embedding input key `"{title}: {text}"`. */
  def embedKey(title: Column, text: Column): Column =
    concat(title, lit(": "), text)

  /** P9: deterministic content id — sha2 over the natural key instead of
    * the reference's uuid4 (`qdrant_service.py:32`), so tests and
    * re-ingests are reproducible and idempotent. */
  def contentId(cols: Column*): Column = sha2(concat_ws("", cols: _*), 256)

  /** P11: file extension from a filename, else a mime-mapped guess,
    * else ".bin". */
  def fileExt(filename: Column, mime: Column): Column = {
    val fromName = regexp_extract(filename, "(\\.[A-Za-z0-9]{1,5})$", 1)
    val fromMime = element_at(
      map(
        lit("image/png"), lit(".png"),
        lit("image/jpeg"), lit(".jpg"),
        lit("image/gif"), lit(".gif"),
        lit("image/bmp"), lit(".bmp"),
        lit("image/tiff"), lit(".tif"),
        lit("image/x-emf"), lit(".emf"),
        lit("image/x-wmf"), lit(".wmf")),
      mime)
    coalesce(nullif(fromName, lit("")), fromMime, lit(".bin"))
  }

  /** P12: normalized levenshtein similarity in [0,1]:
    * `1 - dist / greatest(len(a), len(b))`. */
  def fuzzyRatio(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") /
      greatest(length(a), length(b)).cast("double")

  /** P12: phonetic match — true when both strings share a Soundex
    * code. */
  def soundsLike(a: Column, b: Column): Column = soundex(a) === soundex(b)
}
