package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.StringType

/** HTML → text extraction — the first step of every web-corpus
  * pipeline that starts from crawled pages rather than pre-extracted
  * WET text (RefinedWeb and its descendants run trafilatura over WARC;
  * C4's cleaner assumes this step already happened). Pure-JVM
  * single-pass state machine, no DOM and no library:
  *
  *  - raw-text elements (`script`, `style`, `noscript`, `template`,
  *    `textarea`) are dropped WHOLE — their content is code, not
  *    prose, and the classic extractor bug is JS leaking into training
  *    text;
  *  - comments (`<!-- -->`), CDATA sections, doctypes and processing
  *    instructions are dropped;
  *  - tag scanning is quote-aware: a `>` inside a quoted attribute
  *    value (onclick handlers, JSON payloads) does not end the tag;
  *  - block-level boundaries (`p`, `div`, `br`, `li`, headings,
  *    `tr`, …) become newlines so sentence/paragraph structure
  *    survives for the downstream chunker/sanitizer; inline tags
  *    vanish without inserting whitespace (`<b>bold</b>text` must not
  *    split words);
  *  - character references are decoded: the HTML named core
  *    (`&amp; &lt; &gt; &quot; &apos; &nbsp;` and the common
  *    punctuation set) plus decimal/hex numeric references, invalid
  *    ones passed through literally;
  *  - whitespace is collapsed per line and blank lines drop (one
  *    newline per block boundary); the `<title>` is captured
  *    separately.
  *
  * The downstream pipeline stages ([[graft.ops.TextSanitize]]
  * boilerplate lines, quality/Gopher gates, dedup) expect exactly this
  * shape. Scale: scan-local per document — one `mapPartitions`
  * projection, no shuffle.
  */
object HtmlText {

  private val RawText = Set("script", "style", "noscript", "template", "textarea")
  private val Block = Set(
    "p", "div", "br", "li", "ul", "ol", "tr", "table", "h1", "h2", "h3",
    "h4", "h5", "h6", "blockquote", "pre", "section", "article", "header",
    "footer", "aside", "nav", "form", "hr", "figure", "figcaption", "dd", "dt")

  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "rsquo" -> "’", "lsquo" -> "‘",
    "rdquo" -> "”", "ldquo" -> "“", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "deg" -> "°",
    "middot" -> "·", "bull" -> "•", "laquo" -> "«",
    "raquo" -> "»", "times" -> "×", "shy" -> "")

  /** Extracted page: the `<title>` content and the block-structured
    * body text. */
  final case class Extracted(title: String, text: String)

  def extract(html: String): Extracted = {
    if (html == null) return Extracted("", "")
    val n = html.length
    val out = new StringBuilder
    val title = new StringBuilder
    var inTitle = false
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val end = html.indexOf("]]>", i + 9)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          // doctype / processing instruction
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else {
          val (name, closing, tagEnd) = scanTag(html, i)
          if (tagEnd < 0) { i = n } // unterminated tag: drop the tail
          else {
            val lower = name
            if (!closing && RawText(lower)) {
              // raw-text element: skip to the matching close tag
              val close = findCloseTag(html, tagEnd, lower)
              i = close
            } else {
              if (lower == "title") inTitle = !closing
              if (Block(lower)) out.append('\n')
              i = tagEnd
            }
          }
        }
      } else if (c == '&') {
        val (s, next) = entity(html, i)
        if (inTitle) title.append(s) else out.append(s)
        i = next
      } else {
        if (inTitle) title.append(c) else out.append(c)
        i += 1
      }
    }
    Extracted(collapseWs(title.toString), collapseLines(out.toString))
  }

  /** Scan a tag from `<`: returns (lowercased name, isClosing, index
    * after `>`), quote-aware so `>` inside attribute values does not
    * end the tag. tagEnd −1 = unterminated. */
  private def scanTag(html: String, start: Int): (String, Boolean, Int) = {
    val n = html.length
    var i = start + 1
    val closing = i < n && html.charAt(i) == '/'
    if (closing) i += 1
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit)) i += 1
    val name = html.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
    var quote: Char = 0
    var end = -1
    while (i < n && end < 0) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') end = i + 1
      i += 1
    }
    (name, closing, end)
  }

  /** Index just after `</name ... >` (case-insensitive), or end of
    * input when unclosed — the whole raw-text element is dropped
    * either way. */
  private def findCloseTag(html: String, from: Int, name: String): Int = {
    val n = html.length
    val needle = "</" + name
    var i = from
    // case-insensitive regionMatches scan — no whole-document lowercase
    // copies (that would be O(n²) across a script-heavy page)
    while (i <= n - needle.length) {
      if (html.regionMatches(true, i, needle, 0, needle.length)) {
        val after = i + needle.length
        // must be followed by whitespace or '>' (reject "</scriptx")
        if (after < n && (html.charAt(after) == '>' || html.charAt(after).isWhitespace)) {
          val end = html.indexOf('>', after)
          return if (end < 0) n else end + 1
        }
      }
      i += 1
    }
    n
  }

  /** Decode one character reference at `&`; invalid references pass
    * through literally. Returns (decoded, next index). */
  private def entity(html: String, start: Int): (String, Int) = {
    val n = html.length
    val semi = html.indexOf(';', start + 1)
    if (semi < 0 || semi - start > 12) return ("&", start + 1)
    val body = html.substring(start + 1, semi)
    if (body.startsWith("#")) {
      val num = body.substring(1)
      val cp =
        try {
          if (num.startsWith("x") || num.startsWith("X")) Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num, 10)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp) && cp != 0)
        (new String(Character.toChars(cp)), semi + 1)
      else ("&", start + 1)
    } else Named.get(body) match {
      case Some(s) => (s, semi + 1)
      case None => ("&", start + 1)
    }
  }

  private def collapseWs(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** Per-line whitespace collapse; blank lines drop — one newline per
    * block boundary, the shape the line-based sanitizer expects. */
  private def collapseLines(s: String): String =
    s.split("\n").iterator
      .map(_.replaceAll("[\\s ]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")

  /** Column-level plumbing: replace `htmlCol` with extracted `title` +
    * `text` columns. One scan-local projection. */
  def withText(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.filterNot(_.name == htmlCol))
      .add("title", StringType).add("text", StringType)
    val enc = RowEncoder.encoderFor(schema)
    val htmlIdx = df.schema.fieldIndex(htmlCol)
    val keep = df.schema.indices.filterNot(_ == htmlIdx)
    df.mapPartitions { rows =>
      rows.map { r =>
        val e = extract(r.getString(htmlIdx))
        Row.fromSeq(keep.map(r.get) ++ Seq(e.title, e.text))
      }
    }(enc)
  }
}
