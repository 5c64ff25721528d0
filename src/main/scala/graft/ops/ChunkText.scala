package graft.ops

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O-CHUNK — recursive character text splitter.
  *
  * The reference chunks each section with langchain's
  * `RecursiveCharacterTextSplitter(chunk_size=700, chunk_overlap=200)`
  * (`scripts/services/chunk_splitter_service.py:15`, langchain-text-
  * splitters 1.0.0 pinned in the reference lockfile). This is a pure-Scala
  * implementation of that public algorithm: recursive descent over the
  * separator list `["\n\n", "\n", " ", ""]`, separators kept at the start
  * of the following split, greedy merge of splits up to `chunkSize` chars,
  * a `chunkOverlap`-char tail re-seeded into the next chunk, and final
  * whitespace strip (empty chunks dropped).
  *
  * Exposed two ways: `splitText` for `Dataset.flatMap` / unit tests, and
  * [[chunksCol]] — a pure Column expression (codegen'd `split` +
  * `transform`) usable where only the simple single-separator case is
  * needed. The general path is the Scala function via `flatMap` /
  * `explode(udf)` (see [[explodeChunks]]).
  */
object ChunkText {

  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")
  val DefaultChunkSize  = 700
  val DefaultOverlap    = 200

  /** Split `text` into chunks of at most `chunkSize` chars (except single
    * unsplittable tokens longer than that), consecutive chunks sharing up
    * to `chunkOverlap` trailing chars. Deterministic, no regex state. */
  def splitText(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      chunkOverlap: Int = DefaultOverlap,
      separators: Seq[String] = DefaultSeparators): Seq[String] = {
    require(chunkOverlap < chunkSize, "overlap must be smaller than chunk size")
    if (text == null) Seq.empty else split(text, separators, chunkSize, chunkOverlap)
  }

  private def split(text: String, seps: Seq[String], size: Int, overlap: Int): Seq[String] = {
    // pick the first separator present in the text; "" always matches
    var sep = seps.lastOption.getOrElse("")
    var rest: Seq[String] = Seq.empty
    var i = 0
    var found = false
    while (i < seps.length && !found) {
      val s = seps(i)
      if (s.isEmpty || text.contains(s)) { sep = s; rest = seps.drop(i + 1); found = true }
      i += 1
    }

    val splits = splitKeepSep(text, sep)
    val out = ArrayBuffer.empty[String]
    val good = ArrayBuffer.empty[String]
    for (s <- splits) {
      if (s.length < size) good += s
      else {
        if (good.nonEmpty) { out ++= merge(good.toSeq, size, overlap); good.clear() }
        if (rest.isEmpty) out += s
        else out ++= split(s, rest, size, overlap)
      }
    }
    if (good.nonEmpty) out ++= merge(good.toSeq, size, overlap)
    out.toSeq
  }

  /** Split on a literal separator, attaching the separator to the start of
    * the following fragment; "" splits into single characters. Empty
    * fragments are dropped. */
  private[ops] def splitKeepSep(text: String, sep: String): Seq[String] = {
    if (sep.isEmpty) return text.map(_.toString)
    val parts = ArrayBuffer.empty[String]
    var from = 0
    var idx = text.indexOf(sep, from)
    var first = true
    while (idx >= 0) {
      if (first) { parts += text.substring(0, idx); first = false }
      val next = text.indexOf(sep, idx + sep.length)
      val end = if (next >= 0) next else text.length
      parts += text.substring(idx, end) // separator + following content
      from = idx + sep.length
      idx = next
    }
    if (first) parts += text // separator absent
    parts.filter(_.nonEmpty).toSeq
  }

  /** Greedy merge with overlap carry — the public `_merge_splits` loop:
    * accumulate fragments while total ≤ size; on overflow emit the joined
    * chunk, then drop head fragments until total ≤ overlap (also ensuring
    * the incoming fragment fits). Joined chunks are whitespace-stripped;
    * empty results dropped. */
  private def merge(splits: Seq[String], size: Int, overlap: Int): Seq[String] = {
    val docs = ArrayBuffer.empty[String]
    var cur = ArrayBuffer.empty[String]
    var total = 0
    def emit(): Unit = {
      val joined = cur.mkString("").trim
      if (joined.nonEmpty) docs += joined
    }
    for (d <- splits) {
      val len = d.length
      if (total + len > size && cur.nonEmpty) {
        emit()
        while (total > overlap || (total + len > size && total > 0)) {
          total -= cur.head.length
          cur = cur.drop(1)
        }
      }
      cur += d
      total += len
    }
    if (cur.nonEmpty) emit()
    docs.toSeq
  }

  private val splitUdf =
    udf((text: String, size: Int, overlap: Int) => splitText(text, size, overlap))

  /** Column of `ARRAY<STRING>` chunks for a text column. */
  def chunksCol(text: Column, size: Int = DefaultChunkSize, overlap: Int = DefaultOverlap): Column =
    splitUdf(text, lit(size), lit(overlap))

  /** 1→N expansion: adds `chunk_idx` and `chunk_text` columns via
    * `posexplode`, keeping all other columns. */
  def explodeChunks(
      df: DataFrame,
      textCol: String,
      size: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): DataFrame = {
    df.select(col("*"), posexplode(chunksCol(col(textCol), size, overlap))
      .as(Seq("chunk_idx", "chunk_text")))
  }
}
