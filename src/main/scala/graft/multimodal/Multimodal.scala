package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing as batched `mapPartitions` stages.
  *
  * The actual codec step is STUBBED behind [[MediaDecoder]] — no
  * image/audio libraries exist in this environment — with a
  * deterministic fake ([[StubDecoder]]) so the Spark-side contract
  * (schema, batching, partitioning, row shapes) is real and tested. A
  * production deployment plugs a JNI/JavaCV-backed decoder into the same
  * trait; nothing else changes.
  *
  * Scale notes: media bytes ride executor-side only (no driver collect);
  * feature extraction is per-partition batched so a decoder can amortize
  * model/codec init; downstream joins on `asset_id` are hash-partitioned
  * by the narrow key, never the binary payload.
  */
object Multimodal {

  /** The canonical assets schema (S8 + north-star multimodal columns). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("mime", StringType, nullable = true),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Decoded per-asset features. */
  case class MediaFeatures(
      width: Int, height: Int, nFrames: Int, features: Array[Float])

  /** The codec seam. Implementations must be deterministic per byte
    * content (idempotent re-ingest). */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    /** Decode media bytes → features. STUB POINT: a real implementation
      * calls an image/audio codec here. */
    def decode(kind: String, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake decoder: derives pseudo-dimensions and a
    * pseudo-feature vector from a rolling hash of the bytes. Keeps every
    * pipeline stage runnable and reproducible offline. */
  final case class StubDecoder(featureDim: Int = 64) extends MediaDecoder {
    def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      val b = if (bytes == null) Array.empty[Byte] else bytes
      var h = 1125899906842597L
      var i = 0
      while (i < b.length) { h = 31 * h + b(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      val nf = if (kind == "video") 1 + math.floorMod(h >> 20, 32).toInt else 1
      val feats = new Array[Float](featureDim)
      var j = 0
      var s = h
      while (j < featureDim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        feats(j) = ((s >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      MediaFeatures(w, ht, nf, feats)
    }
  }

  /** Attach decoded metadata + feature vector to a binary asset frame.
    * Batched per partition; binary column is consumed, features appended.
    * Input needs `asset_id`, `kind`, `media` columns. */
  def withFeatures(df: DataFrame, decoder: MediaDecoder = StubDecoder()): DataFrame = {
    val schema = df.schema
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("n_frames", IntegerType))
      .add(StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = RowEncoder.encoderFor(schema)
    val kindIdx = df.schema.fieldIndex("kind")
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      // per-partition init seam: a real decoder opens its codec once here
      rows.map { r =>
        val f = decoder.decode(r.getString(kindIdx), r.getAs[Array[Byte]](mediaIdx))
        Row.fromSeq(r.toSeq ++ Seq(f.width, f.height, f.nFrames, f.features.toSeq))
      }
    }(enc)
  }

  /** Frame-sample plumbing for video assets: 1→N expansion to
    * `(asset_id, frame_idx)` rows with an every-k stride. The decoded
    * frame payload is the stub's feature slice — the row shape and
    * partitioning are what a real frame extractor would produce. */
  def sampleFrames(
      df: DataFrame,
      stride: Int = 2,
      decoder: MediaDecoder = StubDecoder()): DataFrame = {
    val withF = withFeatures(df, decoder)
    withF
      .filter(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"),
        col("features"))
      .select(col("asset_id"), col("frame_idx"),
        // deterministic per-frame feature: rotate the asset features
        expr("concat(slice(features, frame_idx % size(features) + 1, size(features)), " +
          "slice(features, 1, frame_idx % size(features)))").as("frame_features"))
  }

  /** Resize contract: records target dims alongside the asset — the
    * metadata transform of a resize stage (payload untouched by the
    * stub). */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame =
    withFeatures(df).withColumn("scale",
      least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
}
