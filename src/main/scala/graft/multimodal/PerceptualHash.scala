package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Perceptual image fingerprints for image-corpus dedup — the
  * LAION-style near-duplicate sweep a multimodal training pipeline
  * runs before pairing images with text (the reference stores media
  * blobs untouched; this is north-star surface).
  *
  * The fingerprint is dHash (difference hash, Krawetz): the image is
  * reduced to a 9×8 grid of exact per-cell luma means and each of the
  * 64 bits records whether a cell is brighter than its right
  * neighbor. Properties the spec pins:
  *
  *  - invariant to uniform brightness/contrast shifts (only *adjacent
  *    differences* are kept) and to lossless re-encoding;
  *  - stable under resizing and mild lossy re-encoding (JPEG): cell
  *    means are area statistics, not pixel samples;
  *  - integer-exact and deterministic: cells are compared by
  *    cross-multiplied luma SUMS (no floating division), luma is the
  *    integer Rec.601 weighting 299r+587g+114b.
  *
  * Near-dup pairs come from [[graft.ops.Dedup.fingerprintPairs64]] —
  * pigeonhole-banded and therefore EXACT for the hamming bound, not
  * probabilistic. Cluster dedup composes with the shared
  * `Dedup.connectedComponents`/`dropNearDups` machinery, same as the
  * text near-dup family.
  *
  * 100 TB shape: hashing is scan-local (one pass over media bytes,
  * 8 bytes out per asset); the pair join shuffles only
  * (band, 12-byte key) rows. The decode step uses the JDK ImageIO
  * codecs (PNG/JPEG/GIF/BMP — the real decoders already backing
  * [[Multimodal.ImageIoDecoder]]); undecodable or non-image assets
  * yield a null hash and never pair.
  */
object PerceptualHash {

  private val GridCols = 9
  private val GridRows = 8

  /** 64-bit dHash of a decoded image. Exact integer arithmetic
    * end-to-end; for images past ~16M pixels a deterministic
    * dimension-derived stride caps per-cell work (the hash stays a
    * pure function of the byte content). */
  def dHash64(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    // stride bounds total sampled pixels to ~2^24; derived from the
    // dimensions only, so equal images always sample equal pixels
    val stride = math.max(1L, math.round(math.sqrt(
      w.toDouble * h.toDouble / (1 << 24)))).toInt
    val sums = new Array[Long](GridCols * GridRows)
    val counts = new Array[Long](GridCols * GridRows)
    var gy = 0
    while (gy < GridRows) {
      var gx = 0
      while (gx < GridCols) {
        val x0 = gx * w / GridCols; val x1 = math.max(x0 + 1, (gx + 1) * w / GridCols)
        val y0 = gy * h / GridRows; val y1 = math.max(y0 + 1, (gy + 1) * h / GridRows)
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            n += 1
            x += stride
          }
          y += stride
        }
        val cell = gy * GridCols + gx
        sums(cell) = s; counts(cell) = n
        gx += 1
      }
      gy += 1
    }
    var fp = 0L
    var bit = 0
    gy = 0
    while (gy < GridRows) {
      var gx = 0
      while (gx < GridCols - 1) {
        val l = gy * GridCols + gx
        val r = l + 1
        // meanL > meanR  ⇔  sumL·nR > sumR·nL (exact in longs: sums are
        // ≤ 255000·2^24 ≈ 2^42, counts ≤ 2^24 after the stride cap)
        if (sums(l) * counts(r) > sums(r) * counts(l)) fp |= (1L << bit)
        bit += 1
        gx += 1
      }
      gy += 1
    }
    fp
  }

  /** Hash raw image bytes; None when the bytes do not decode. */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None else Some(dHash64(img))
  }

  /** Append a nullable `dhash` column to a binary asset frame
    * (`kind`, `media` columns as in [[Multimodal.assetSchema]]).
    * Non-image kinds and undecodable bytes hash to null. Batched per
    * partition like [[Multimodal.withFeatures]]. */
  def withDHash(df: DataFrame): DataFrame = {
    val schema = df.schema.add("dhash", LongType, nullable = true)
    val enc = RowEncoder.encoderFor(schema)
    val kindIdx = df.schema.fieldIndex("kind")
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.map { r =>
        val hash =
          if (r.getString(kindIdx) != "image") None
          else dHash64(r.getAs[Array[Byte]](mediaIdx))
        Row.fromSeq(r.toSeq :+ hash.map(Long.box).orNull)
      }
    }(enc)
  }

  /** Exact near-duplicate image pairs: `(id_a, id_b, hamming)` with
    * hamming ≤ `maxHamming` over the dHash fingerprints. */
  def nearDupPairs(
      df: DataFrame,
      idCol: String = "asset_id",
      hashCol: String = "dhash",
      maxHamming: Int = 3): DataFrame =
    graft.ops.Dedup.fingerprintPairs64(df, idCol, hashCol, maxHamming)

  /** Keep one representative per near-dup cluster (minimum id), the
    * image-corpus analog of the text `dropNearDups`. */
  def dropNearDups(
      df: DataFrame,
      idCol: String = "asset_id",
      hashCol: String = "dhash",
      maxHamming: Int = 3): DataFrame =
    graft.ops.Dedup.dropNearDups(
      df, nearDupPairs(df, idCol, hashCol, maxHamming), idCol)
}
