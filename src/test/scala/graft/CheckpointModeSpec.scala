package graft

import graft.ops.{Bpe, Graph}

/** [[graft.ops.Checkpointing]] — reliable (`checkpoint` against a dir)
  * and executor-local (`localCheckpoint`) lineage truncation must be
  * interchangeable for VALUES: the mode buys fault-tolerance at 100 TB,
  * never a different answer. Proven on both iterative trainers.
  */
class CheckpointModeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-ckpt-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("pageRank: reliable checkpoint produces bit-identical ranks") {
    // ring + chords + a dangling sink, enough structure for 6 rounds
    val edges = Seq.tabulate(40)(i => (i.toLong, ((i + 1) % 40).toLong)) ++
      Seq((0L, 20L), (5L, 25L), (10L, 30L), (3L, 41L)) // 41 is dangling
    val df = edges.toDF("src", "dst")
    val local = Graph.pageRank(df, iterations = 6)
      .as[(Long, Long)].collect().toMap
    val reliable = Graph.pageRank(df, iterations = 6,
        checkpointDir = Some(tmpDir("pr")))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)
    assert(local.nonEmpty)
  }

  test("BPE train: reliable checkpoint learns the identical merge list") {
    val docs = Seq(
      "low lower lowest slow slower slowest",
      "new newer newest flow flower flows",
      "low low lower newest newest slow").toDF("text")
    val local = Bpe.train(docs, numMerges = 12)
    val reliable = Bpe.train(docs, numMerges = 12,
      checkpointDir = Some(tmpDir("bpe")))
    assert(reliable == local)
    assert(local.nonEmpty)
  }
}
