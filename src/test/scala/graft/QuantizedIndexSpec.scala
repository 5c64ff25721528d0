package graft

import org.apache.spark.sql.functions._

import graft.index.VectorIndex

/** int8 scalar quantization of the vector index: 4× smaller payloads,
  * integer scoring kernel, recall measured against the exact float
  * path. */
class QuantizedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val query = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray

  test("quantized payload is 4x smaller and reconstructs within 1/127") {
    val q = VectorIndex.withQuantized(
      VectorIndex.withNormalized(emb.limit(50)))
    val r = q.select("embedding", "qembedding", "qscale").head()
    val v = r.getSeq[Double](0)
    val qv = r.getAs[Array[Byte]](1)
    val scale = r.getDouble(2)
    assert(qv.length == v.length, "one byte per dimension")
    // element-wise reconstruction error is bounded by half a step
    v.zip(qv).foreach { case (x, b) =>
      assert(math.abs(x - b * scale / 127.0) <= scale / 127.0 + 1e-12)
    }
    assert(scale > 0.0 && scale <= 1.0) // normalized input
  }

  test("quantized search recall@10 vs exact search is high, scores close") {
    val base = VectorIndex.withNormalized(emb.filter(col("vec_id") =!= 0))
    val qIndex = VectorIndex.withQuantized(base)

    val exact = VectorIndex.search(base, query, k = 10, threshold = -1.0,
      normalizedInput = true)
      .select("vec_id", "score").as[(Long, Double)].collect()
    val approx = VectorIndex.searchQuantized(qIndex, query, k = 10,
      threshold = -1.0)
      .select("vec_id", "score").as[(Long, Double)].collect()

    val exactIds = exact.map(_._1).toSet
    val approxIds = approx.map(_._1).toSet
    val recall = exactIds.intersect(approxIds).size.toDouble / exactIds.size
    assert(recall >= 0.8, s"recall@10 = $recall")

    // per-id score agreement within quantization error budget
    val approxById = approx.toMap
    exact.filter(e => approxById.contains(e._1)).foreach { case (id, s) =>
      assert(math.abs(s - approxById(id)) < 0.03, s"vec $id: $s vs ${approxById(id)}")
    }
    // the top-1 neighbor survives quantization
    assert(approx.head._1 == exact.head._1)
  }

  test("two-tier rerank equals exact brute-force search bit-for-bit") {
    val exact = SparkEntry.queries("knn_top5")(spark, sf0001)
      .as[(Long, Double)].collect().toSeq
    val reranked = SparkEntry.queries("knn_quantized_rerank_top5")(spark, sf0001)
      .as[(Long, Double)].collect().toSeq
    assert(reranked == exact, s"rerank $reranked vs exact $exact")
  }

  test("binary signature packs exactly the sign bits; hamming estimates the angle") {
    val idx = VectorIndex.withBinary(VectorIndex.withNormalized(emb.limit(50)))
      .select("vec_id", "embedding", "bsig")
    val rows = idx.selectExpr("vec_id", "CAST(embedding AS array<double>)", "bsig")
      .as[(Long, Seq[Double], Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, e, sig) =>
      val want = e.zipWithIndex.foldLeft(0L) { case (acc, (x, j)) =>
        if (x > 0.0) acc | (1L << j) else acc
      }
      assert(sig == want, s"vec $id: packed $sig want $want")
    }
    // hamming-angle estimate: for random pairs, |cos(pi*h/64) - cosine| small-ish
    val ps = rows.take(10).flatMap(a => rows.drop(10).take(10).map(b => (a, b)))
    ps.foreach { case ((_, ea, sa), (_, eb, sb)) =>
      val cos = ea.zip(eb).map { case (x, y) => x * y }.sum /
        (math.sqrt(ea.map(x => x * x).sum) * math.sqrt(eb.map(x => x * x).sum))
      val h = java.lang.Long.bitCount(sa ^ sb)
      val est = math.cos(math.Pi * h / 64.0)
      assert(math.abs(est - cos) < 0.45, s"h=$h est=$est cos=$cos")
    }
  }

  test("binary two-tier rerank equals exact brute-force search bit-for-bit") {
    val exact = SparkEntry.queries("knn_top5")(spark, sf0001)
      .as[(Long, Double)].collect().toSeq
    val reranked = SparkEntry.queries("knn_binary_rerank_top5")(spark, sf0001)
      .as[(Long, Double)].collect().toSeq
    assert(reranked == exact, s"binary rerank $reranked vs exact $exact")
  }

  test("byte dot kernel matches the float dot after dequantization") {
    val q = VectorIndex.withQuantized(VectorIndex.withNormalized(emb.limit(20)))
      .select("vec_id", "embedding", "qembedding", "qscale")
    val pairs = q.as("a").crossJoin(q.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        graft.expr.VectorExpressions.dot(col("a.embedding"), col("b.embedding")).as("fd"),
        (graft.expr.VectorExpressions.byteDot(col("a.qembedding"), col("b.qembedding")) *
          col("a.qscale") * col("b.qscale") / lit(127.0 * 127.0)).as("qd"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (fd, qd) =>
      assert(math.abs(fd - qd) < 0.05, s"$fd vs $qd")
    }
  }
}
