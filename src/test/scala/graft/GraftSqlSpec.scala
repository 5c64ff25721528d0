package graft

/** The plain-SQL surface: registered tables + custom functions through
  * `spark.sql` only. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("registered tables and functions answer pure SQL end-to-end") {
    Graft.registerAll(spark)
    Graft.registerTables(spark, sf0001)

    val rev = spark.sql(
      """SELECT r_name, COUNT(*) AS n
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
      .as[(String, Long)].collect()
    assert(rev.length == 5 && rev.map(_._2).sum == 6000)

    val knn = spark.sql(
      """SELECT v.vec_id,
        |  cosine_similarity(v.embedding, q.embedding) AS score
        |FROM embeddings v
        |JOIN embeddings q ON q.vec_id = 0 AND v.vec_id <> 0
        |ORDER BY score DESC, v.vec_id LIMIT 3""".stripMargin)
      .as[(Long, Double)].collect()
    assert(knn.length == 3)
    assert(knn.map(_._2).toSeq == knn.map(_._2).sortBy(-_).toSeq)

    val chunks = spark.sql(
      """SELECT doc_id, COUNT(*) AS n_chunks
        |FROM documents
        |LATERAL VIEW split_text(text, 200, 50) c AS chunk_idx, chunk
        |WHERE doc_id < 10 GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      .as[(Long, Long)].collect()
    assert(chunks.nonEmpty && chunks.forall(_._2 >= 1))

    val events = spark.sql(
      "SELECT COUNT(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01'")
      .as[Long].head()
    assert(events == 1000L)
  }
}
