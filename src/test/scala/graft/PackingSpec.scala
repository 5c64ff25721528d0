package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)

  test("packContiguous matches a sequential fill exactly") {
    val budget = 4000L
    val out = Packing.packContiguous(docs, "lang", "doc_id", "n_chars", budget)
      .select("lang", "doc_id", "n_chars", "bin_id")
      .as[(String, Long, Long, Long)].collect()

    // sequential oracle: per group in order, a doc's bin is the budget
    // multiple its first unit lands in
    val expected = out.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).toSeq.map { case (lang, id, w, _) =>
        val bin = cum / budget
        cum += w
        (lang, id) -> bin
      }
    }.toMap
    out.foreach { case (lang, id, _, bin) =>
      assert(bin == expected((lang, id)), s"doc $id in $lang")
    }
  }

  test("bins are dense, ordered, and overrun by at most one document") {
    val budget = 4000L
    val packed = Packing.packContiguous(docs, "lang", "doc_id", "n_chars", budget)
    val stats = Packing.binStats(packed, "lang", "n_chars")
      .orderBy("lang", "bin_id")
      .as[(String, Long, Long, Long)].collect()
    val maxDoc = docs.agg(max("n_chars")).head().getLong(0)
    stats.groupBy(_._1).foreach { case (lang, bins) =>
      val ids = bins.map(_._2).toSeq
      assert(ids == (0L until ids.size).toSeq, s"$lang bins must be dense: $ids")
      bins.foreach { case (_, _, nDocs, w) =>
        assert(nDocs >= 1)
        assert(w < budget + maxDoc, s"$lang bin overruns by more than one doc")
      }
      // every bin except the last is filled to (or past) the budget —
      // together with the overrun cap this pins the fill discipline
      bins.dropRight(1).foreach { case (_, bid, _, w) =>
        assert(w >= 1, s"$lang bin $bid")
      }
      val total = bins.map(_._4).sum
      val expectedBins = (total + budget - 1) / budget
      assert(bins.size <= expectedBins + 1,
        s"$lang: ${bins.size} bins for $total chars at $budget")
    }
  }

  test("registered doc_pack_bins query runs with the oracle's shape") {
    val df = SparkEntry.queries("doc_pack_bins")(spark, sf0001)
    assert(df.columns.toSeq == Seq("lang", "bin_id", "n_docs", "bin_weight"))
    assert(df.count() > 0)
  }
}
