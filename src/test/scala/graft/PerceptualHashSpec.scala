package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.multimodal.PerceptualHash
import graft.ops.Dedup

/** dHash perceptual fingerprints + the exact pigeonhole-banded pair
  * join — the image-corpus near-dup sweep. Images are synthesized
  * in-memory (JDK BufferedImage/ImageIO: the same codecs the decoder
  * uses), so every pin is deterministic. */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  /** Block-structured image: 8×8 blocks, gray level from a seeded
    * function — JPEG-robust content with real luma structure. */
  private def blockImage(side: Int, seed: Int, shift: Int = 0): BufferedImage = {
    val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
    val blocks = 8
    for (y <- 0 until side; x <- 0 until side) {
      val bx = x * blocks / side; val by = y * blocks / side
      val g0 = 50 + ((bx * 31 + by * 17 + seed * 13) % 130)
      val g = math.min(255, g0 + shift)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("hash survives a lossless PNG round trip bit-for-bit") {
    val img = blockImage(128, seed = 1)
    val direct = PerceptualHash.dHash64(img)
    val roundTrip = PerceptualHash.dHash64(encode(img, "png")).get
    assert(roundTrip === direct)
  }

  test("uniform brightness shift leaves the hash unchanged") {
    // gray levels stay within 50..180+40 — no clipping, differences intact
    val a = PerceptualHash.dHash64(blockImage(128, seed = 2))
    val b = PerceptualHash.dHash64(blockImage(128, seed = 2, shift = 40))
    assert(a === b)
  }

  test("resolution change of the same content stays within a small hamming ball") {
    // both images render the SAME 8×8 block function; cell means agree
    // up to integer cell-boundary rounding, so near-tie bits may flip
    // but the hash must stay in the dedup ball
    val a = PerceptualHash.dHash64(blockImage(128, seed = 3))
    val b = PerceptualHash.dHash64(blockImage(64, seed = 3))
    assert(java.lang.Long.bitCount(a ^ b) <= 3)
  }

  test("lossy JPEG re-encode stays within a small hamming ball; distinct content stays far") {
    val img = blockImage(128, seed = 4)
    val direct = PerceptualHash.dHash64(img)
    val jpeg = PerceptualHash.dHash64(encode(img, "jpg")).get
    val jpegDist = java.lang.Long.bitCount(direct ^ jpeg)
    assert(jpegDist <= 6, s"JPEG moved the hash by $jpegDist bits")
    val other = PerceptualHash.dHash64(blockImage(128, seed = 9))
    assert(java.lang.Long.bitCount(direct ^ other) > 10, "distinct content must be far")
  }

  test("withDHash hashes images, nulls non-images and undecodable bytes") {
    val schema = StructType(Seq(
      StructField("asset_id", StringType), StructField("kind", StringType),
      StructField("media", BinaryType)))
    val png = encode(blockImage(64, seed = 5), "png")
    val rows = Seq(
      Row("ok", "image", png),
      Row("corrupt", "image", Array[Byte](1, 2, 3)),
      Row("audio", "audio", png))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = PerceptualHash.withDHash(df)
      .select("asset_id", "dhash").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("ok") === Some(PerceptualHash.dHash64(png).get))
    assert(got("corrupt") === None)
    assert(got("audio") === None)
  }

  test("fingerprintPairs64 equals brute force (exact, no false negatives) and stays non-cartesian") {
    val rnd = new scala.util.Random(7)
    // clustered fingerprints: 60 seeds, each with a few ≤3-bit-flip
    // variants, plus uniform noise — the shape banding must not lose
    val seeds = Seq.fill(60)(rnd.nextLong())
    val variants = seeds.flatMap { s =>
      Seq.fill(3) {
        val k = rnd.nextInt(4)
        (0 until k).foldLeft(s)((h, _) => h ^ (1L << rnd.nextInt(64)))
      }
    }
    val hashes = (seeds ++ variants ++ Seq.fill(120)(rnd.nextLong())).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val df = hashes.toDF("id", "h").repartition(5)
    val got = Dedup.fingerprintPairs64(df, "id", "h", maxHamming = 3)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture must produce close pairs")
    val plan = Dedup.fingerprintPairs64(df, "id", "h", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "banding must keep the join keyed")
  }

  test("dropNearDups keeps one representative per hash cluster and all singletons") {
    val base = 0x0123456789abcdefL
    val rows = Seq(
      ("a1", base), ("a2", base ^ 1L), ("a3", base ^ 6L), // one cluster (≤3 bits apart pairwise via a1)
      ("b1", ~base), ("c1", 0x5555555555555555L))
    val df = rows.toDF("asset_id", "dhash")
    val kept = PerceptualHash.dropNearDups(df)
      .select("asset_id").as[String].collect().toSet
    assert(kept === Set("a1", "b1", "c1"))
  }
}
