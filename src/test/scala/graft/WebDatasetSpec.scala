package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.WebDataset

/** WebDataset tar-shard export/import. The ustar writer is pinned two
  * ways: the engine's own reader round-trips every byte, and the
  * SYSTEM tar (GNU tar, an independent implementation) lists and
  * extracts the shards — so the format claim does not rest on
  * self-parity. */
class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    (f"sample$i%04d", s"text body of document $i",
      if (i % 5 == 4) null else Array.tabulate[Byte](10 + i % 50)(j => (i + j).toByte))
  }

  private def write(rows: Seq[(String, String, Array[Byte])], parts: Int,
      maxBytes: Long = 1L << 30): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("graft-wds").toString
    val df = rows.toDF("key", "txt", "media").repartition(parts, col("key"))
      .sortWithinPartitions("key")
    val manifest = WebDataset.writeShards(
      df, dir, Seq("txt" -> "txt", "media" -> "bin"), maxShardBytes = maxBytes)
    (dir, manifest)
  }

  test("round trip: every field of every sample comes back byte-identical; null fields are absent") {
    val rows = corpus(37)
    val (dir, manifest) = write(rows, parts = 3)
    assert(manifest.agg(sum("samples")).head.getLong(0) === 37L)
    val back = WebDataset.readShards(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getAs[Array[Byte]](3).toSeq).toMap
    rows.foreach { case (key, txt, media) =>
      assert(back((key, "txt")) === txt.getBytes("UTF-8").toSeq)
      if (media == null) assert(!back.contains((key, "bin")), s"$key null field must be absent")
      else assert(back((key, "bin")) === media.toSeq)
    }
    assert(back.size === 37 + rows.count(_._3 != null))
  }

  test("system tar (independent implementation) lists and extracts the shards") {
    import scala.sys.process._
    val rows = corpus(8)
    val (dir, _) = write(rows, parts = 1)
    val shard = Files.list(Paths.get(dir)).iterator().next().toString
    val listed = Seq("tar", "-tf", shard).!!.trim.split("\n").toSeq
    // adjacency: each sample's fields are consecutive, samples in
    // partition (key) order
    val expected = rows.sortBy(_._1).flatMap { case (k, _, m) =>
      Seq(s"$k.txt") ++ (if (m == null) Nil else Seq(s"$k.bin")) }
    assert(listed === expected)
    // .!! is line-buffered and appends a trailing newline of its own
    val extracted = Seq("tar", "-xOf", shard, "sample0003.txt").!!
    assert(extracted.stripLineEnd === "text body of document 3")
  }

  test("output bytes are deterministic for a fixed row stream") {
    val rows = corpus(20)
    val (d1, _) = write(rows, parts = 1)
    val (d2, _) = write(rows, parts = 1)
    def bytes(d: String) = {
      val f = Files.list(Paths.get(d)).iterator().next()
      Files.readAllBytes(f).toSeq
    }
    assert(bytes(d1) === bytes(d2))
  }

  test("maxShardBytes rolls shards without splitting a sample") {
    val rows = corpus(40)
    val (dir, manifest) = write(rows, parts = 2, maxBytes = 4096)
    val shards = manifest.collect()
    assert(shards.length > 2, s"expected rollover, got ${shards.length} shards")
    assert(shards.map(_.getLong(1)).sum === 40L)
    // every sample's fields live in ONE shard
    val perShard = WebDataset.readShards(spark, dir).collect()
      .groupBy(r => r.getString(1)).map { case (k, es) => k -> es.map(_.getString(0)).distinct }
    perShard.foreach { case (k, ss) => assert(ss.length === 1, s"$k split across $ss") }
    // and the manifest byte counts match the files on disk
    shards.foreach { s =>
      assert(Files.size(Paths.get(s.getString(0))) === s.getLong(2), s.getString(0)) }
  }

  test("guards: oversized names, non-string keys, unsupported field types fail fast") {
    val dir = Files.createTempDirectory("graft-wds").toString
    val long = Seq(("k" * 101, "t")).toDF("key", "txt")
    val ex = intercept[Exception] {
      WebDataset.writeShards(long, dir, Seq("txt" -> "txt")) }
    assert(ex.getMessage.contains("100 bytes") || ex.getCause != null)
    val badKey = Seq((1L, "t")).toDF("key", "txt")
    assert(intercept[IllegalArgumentException] {
      WebDataset.writeShards(badKey, dir, Seq("txt" -> "txt"))
    }.getMessage.contains("must be string"))
    val badField = Seq(("k", 42L)).toDF("key", "num")
    val ex2 = intercept[Exception] {
      WebDataset.writeShards(badField, dir, Seq("num" -> "num")) }
    assert(ex2.getMessage.contains("string or binary") || ex2.getCause != null)
  }

  test("multimodal export: dHash-dedup'd image assets ship as binary webdataset shards") {
    import java.awt.image.BufferedImage
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def img(seed: Int): Array[Byte] = {
      val im = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val g = 40 + ((x / 4 * 31 + y / 4 * 17 + seed * 13) % 150)
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }
    val schema = StructType(Seq(
      StructField("asset_id", StringType), StructField("kind", StringType),
      StructField("media", BinaryType), StructField("caption", StringType)))
    // a2 duplicates a1's pixels (re-encoded) — the sweep must drop one
    val rows = Seq(
      Row("a1", "image", img(1), "first"), Row("a2", "image", img(1), "dup of first"),
      Row("b1", "image", img(9), "different"))
    val assets = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val hashed = graft.multimodal.PerceptualHash.withDHash(assets)
    val deduped = graft.multimodal.PerceptualHash.dropNearDups(hashed)
    val dir = Files.createTempDirectory("graft-wds-img").toString
    val manifest = WebDataset.writeShards(
      deduped.withColumnRenamed("asset_id", "key"), dir,
      Seq("media" -> "png", "caption" -> "txt"))
    assert(manifest.agg(sum("samples")).head.getLong(0) === 2L, "near-dup must not ship")
    val back = WebDataset.readShards(spark, dir)
      .filter(col("ext") === "png").collect()
      .map(r => r.getString(1) -> r.getAs[Array[Byte]](3)).toMap
    assert(back.keySet === Set("a1", "b1"))
    // the shipped bytes decode to the SAME perceptual content
    assert(graft.multimodal.PerceptualHash.dHash64(back("a1")).get ===
      graft.multimodal.PerceptualHash.dHash64(img(1)).get)
  }
}
