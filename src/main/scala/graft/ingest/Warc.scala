package graft.ingest

import java.io.{BufferedInputStream, ByteArrayInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC / WET ingestion — the container format web corpora actually
  * arrive in (Common Crawl publishes WARC response captures, WAT
  * metadata and WET pre-extracted text; every published web pipeline
  * starts by reading one of these). Pure-JVM ISO 28500 record parser:
  *
  *  - a record = `WARC/1.x` version line, header lines to a blank
  *    line, exactly `Content-Length` payload bytes, a blank-line
  *    separator — parsed byte-exact, so binary payloads (images,
  *    gzipped bodies) survive;
  *  - `.gz` inputs stream through `GZIPInputStream`, which reads the
  *    MULTI-MEMBER files Common Crawl ships (one gzip member per
  *    record) as one concatenated stream;
  *  - malformed tails fail loudly per file (a truncated fetch should
  *    not silently drop the rest of a shard).
  *
  * `read` rides `binaryFiles` — one task per WARC file, the natural
  * parallelism of a crawl dump (files are ~1 GB; a 100 TB crawl is
  * ~100k files, scheduled like any other file source). `pages`
  * composes the response-record filter with HTTP-envelope stripping
  * and hands `html` straight to [[HtmlText.withText]]; WET text
  * records come out of `read` directly with `content_type`
  * `text/plain`. Together: WARC → [[HtmlText]] → curation →
  * [[graft.pipeline.WebDataset]] is the full published-pipeline path.
  */
object Warc {

  /** One WARC record: type, target URI, date, payload content type,
    * raw payload bytes. */
  final case class Record(
      warcType: String, uri: String, date: String,
      contentType: String, payload: Array[Byte])

  val schema: StructType = StructType(Seq(
    StructField("file", StringType), StructField("warc_type", StringType),
    StructField("uri", StringType), StructField("date", StringType),
    StructField("content_type", StringType), StructField("payload", BinaryType)))

  /** Read one CRLF- (or LF-) terminated ISO-8859-1 header line; null
    * at clean EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') sb.append(b.toChar)
      b = in.read()
    }
    sb.toString
  }

  /** Lazily parse a WARC stream into records. */
  def parse(in0: InputStream): Iterator[Record] = {
    val in = new DataInputStream(new BufferedInputStream(in0, 1 << 16))
    new Iterator[Record] {
      private var nextRec: Record = _
      private var done = false
      private def advance(): Unit = {
        // skip blank separator lines between records
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { done = true; return }
        require(line.startsWith("WARC/"),
          s"not a WARC record header: '${line.take(40)}'")
        var wtype = ""; var uri = ""; var date = ""; var ctype = ""; var len = -1L
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) {
            val k = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
            val v = h.substring(i + 1).trim
            k match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "content-type" => ctype = v
              case "content-length" => len = v.toLong
              case _ => ()
            }
          }
          h = readLine(in)
        }
        require(len >= 0, s"WARC record without Content-Length (type=$wtype uri=$uri)")
        require(len <= Int.MaxValue, s"oversized WARC record: $len")
        val payload = new Array[Byte](len.toInt)
        in.readFully(payload) // byte-exact: binary payloads survive
        nextRec = Record(wtype, uri, date, ctype, payload)
      }
      def hasNext: Boolean = {
        if (nextRec == null && !done) {
          try advance()
          catch { case _: EOFException =>
            throw new IllegalStateException("truncated WARC record (EOF inside payload)") }
        }
        nextRec != null
      }
      def next(): Record = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Read WARC/WET files (plain or `.gz`, incl. Common Crawl's
    * multi-member gzip) as `(file, warc_type, uri, date, content_type,
    * payload)` rows — one task per file. */
  def read(spark: SparkSession, glob: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(glob).flatMap { case (file, pds) =>
      val raw: InputStream = pds.open()
      val in = if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
      parse(in).map(r =>
        Row(file, r.warcType, r.uri, r.date, r.contentType, r.payload))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Strip the HTTP envelope of a `response` record payload: bytes
    * after the first CRLFCRLF (or LFLF). Returns the input when no
    * envelope is present. */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      if (payload(i) == '\n' && payload(i + 1) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 2, payload.length)
      i += 1
    }
    payload
  }

  /** Response captures as `(url, date, html)` — the HTTP envelope
    * stripped and the body decoded UTF-8 (lossy for other charsets:
    * the downstream language-ID/quality gates are the arbiter, the
    * same pragmatic rule the C4/CCNet pipelines apply). Feed straight
    * into [[HtmlText.withText]]. */
  def pages(spark: SparkSession, glob: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val bodyUdf = udf((p: Array[Byte]) =>
      new String(httpBody(p), StandardCharsets.UTF_8))
    read(spark, glob)
      .filter(col("warc_type") === "response")
      .select(col("uri").as("url"), col("date"),
        bodyUdf(col("payload")).as("html"))
  }

  /** WET extracted-text records as `(url, date, text)`. Bytes→string is
    * the codegen'd `decode(payload, 'UTF-8')` built-in — no UDF on the
    * hot text path (the HTTP-envelope parse in [[pages]] keeps its UDF
    * because no built-in splits an HTTP message). */
  def wetText(spark: SparkSession, glob: String): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, glob)
      .filter(col("warc_type") === "conversion")
      .select(col("uri").as("url"), col("date"),
        decode(col("payload"), "UTF-8").as("text"))
  }
}
