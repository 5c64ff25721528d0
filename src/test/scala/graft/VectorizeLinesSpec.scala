package graft

import java.nio.file.Files

import graft.embed.HashingEmbedder
import graft.pipeline.VectorizeLines

/** The vectorize_out.py entry path: lines → dense ids → embeddings →
  * JSON records (S2, P1, P10, O-EMB, O-LIMIT, S6). */
class VectorizeLinesSpec extends SparkSpec {
  import spark.implicits._

  test("lines load trimmed, non-empty, densely indexed in file order") {
    val f = Files.createTempFile("lines", ".txt")
    Files.writeString(f, "first line\n\n  \nsecond line  \nthird\n")
    val got = VectorizeLines.loadLines(spark, f.toString)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, "first line"), (1L, "second line"), (2L, "third")))
  }

  test("vectorize caps with limit and emits D5 records; run writes JSON") {
    val f = Files.createTempFile("lines2", ".txt")
    Files.writeString(f, (1 to 10).map(i => s"line number $i").mkString("\n"))
    val out = Files.createTempDirectory("vec-out").toString + "/o"
    val n = VectorizeLines.run(spark, f.toString, out,
      HashingEmbedder(64), limit = Some(4))
    assert(n == 4)
    val back = spark.read.json(out)
    assert(back.columns.sorted.toSeq == Seq("embedding", "id", "model", "text"))
    assert(back.count() == 4)
    assert(back.select("model").distinct().as[String].head() == "hashing-1024")
  }

  test("parsed-document JSON shape is nested and section-ordered") {
    val blocks = Seq(
      (1L, 1L, "Heading 1", "B title"), (1L, 2L, "Normal", "b body"),
      (1L, 3L, "Heading 1", "A title"), (1L, 4L, "Normal", "a body"))
      .map { case (d, s, st, t) => (d.toString, s, st, t) }
      .toDF("doc_id", "seq", "style", "text")
    val parsed = graft.pipeline.Extract.toParsedDocument(blocks, 50, 10)
    val row = parsed.head()
    assert(row.getString(0) == "1")
    val paras = row.getSeq[org.apache.spark.sql.Row](1)
    // section order (by sec_id), not title order
    assert(paras.map(_.getString(0)) == Seq("B title", "A title"))
    assert(paras.head.getString(1) == "b body")
    assert(paras.head.getSeq[String](2) == Seq("b body"))
  }
}
