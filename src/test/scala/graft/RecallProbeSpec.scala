package graft

import org.apache.spark.sql.functions._

/** [[RecallProbe]] — the published recall/cost frontier must hold its
  * documented floors (VERDICT r8 ask #5):
  *
  *  - the production EXACTNESS settings — the two-tier re-ranks
  *    (int8 overfetch and certified PQ) — deliver recall@5 ≥ 0.95 on
  *    ANY corpus geometry (they are exact by construction);
  *  - IVF at nprobe=4/nlist=16 delivers ≥ 0.95 on a CLUSTERABLE
  *    corpus (the geometry IVF exists for);
  *  - on the driver's isotropic (structureless) embeddings, IVF
  *    recall is ≈ the probed fraction — a DATA property the probe
  *    exists to surface, pinned here as a band so the published
  *    frontier table stays honest.
  */
class RecallProbeSpec extends SparkSpec {

  private lazy val iso =
    RecallProbe.frontier(spark, "/root/testdata/sf0.01", k = 5, nQueries = 8)
      .map(t => t.name -> t).toMap

  /** A clusterable corpus: 16 near-orthogonal directions in 64-d with
    * per-row wobble — the geometry whose cells IVF prunes well. */
  private lazy val clustered = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-recall")
    dir.toFile.deleteOnExit()
    val rows = (0L until 480L).map { i =>
      val g = (i % 16).toInt
      val b = Array.fill(64)(0.02f)
      b(g) = 1.0f
      b(16 + ((i / 16) % 48).toInt) += 0.01f * ((i % 7) + 1)
      (i, b.toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .write.parquet(dir.resolve("embeddings.parquet").toString)
    RecallProbe.frontier(spark, dir.toString, k = 5, nQueries = 8)
      .map(t => t.name -> t).toMap
  }

  test("exact tier is its own oracle: recall 1.0") {
    assert(iso("exact").recall == 1.0)
  }

  test("re-rank tiers hold the production recall@5 >= 0.95 floor on isotropic data") {
    assert(iso("rerank_int8").recall >= 0.95,
      s"two-tier int8 re-rank recall ${iso("rerank_int8").recall}")
    assert(iso("rerank_pq_cert").recall == 1.0,
      s"certified PQ re-rank recall ${iso("rerank_pq_cert").recall}")
  }

  test("IVF recall is monotone non-decreasing in nprobe") {
    val rs = Seq("ivf@1", "ivf@2", "ivf@4", "ivf@8").map(iso(_).recall)
    assert(rs == rs.sorted, s"ivf recall must not decrease with nprobe: $rs")
  }

  test("on isotropic embeddings, IVF recall tracks the probed fraction — the data, not a bug") {
    // nprobe/nlist = 4/16 = 0.25 of cells probed; on structureless
    // vectors the neighbors are spread uniformly over cells, so recall
    // lands in a band around that fraction instead of near 1.0
    val r = iso("ivf@4").recall
    assert(r > 0.1 && r < 0.9,
      s"isotropic ivf@4 recall $r outside the uniform-spread band")
  }

  test("on a clusterable corpus, ivf@4 holds the recall@5 >= 0.95 floor") {
    assert(clustered("ivf@4").recall >= 0.95,
      s"clustered ivf@4 recall ${clustered("ivf@4").recall}")
    assert(clustered("exact").recall == 1.0)
    assert(clustered("rerank_pq_cert").recall == 1.0)
    // the composed production tier (IVF probe + int8 scan + exact
    // re-rank) must hold the same floor where the probe geometry does
    assert(clustered("ivf4_int8_rerank").recall >= 0.95,
      s"clustered ivf4_int8_rerank recall ${clustered("ivf4_int8_rerank").recall}")
  }
}
