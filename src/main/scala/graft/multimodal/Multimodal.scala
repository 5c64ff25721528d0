package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing as batched `mapPartitions` stages.
  *
  * All three codecs are real and JDK-only (no external libraries):
  * [[ImageIoDecoder]] decodes PNG/JPEG/GIF/BMP through `javax.imageio`
  * (exercised against the reference manual's actual media parts in
  * `ReferenceDocxSpec`), [[AudioWavDecoder]] decodes WAV/AIFF/AU PCM
  * through `javax.sound.sampled`, and [[VideoFrameDecoder]] +
  * [[extractFrames]] decode animated GIF and MJPEG-in-AVI containers
  * through [[VideoFrames]]. Containers the JDK cannot decode (MP4/H.264
  * video, MP3/OGG audio) degrade to the deterministic [[StubDecoder]]
  * behind the same [[MediaDecoder]] trait; a production deployment
  * plugs a JNI/JavaCV-backed decoder into the trait and nothing else
  * changes.
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

  /** Real image decoder on the JDK's built-in codecs (`javax.imageio`:
    * PNG, JPEG, GIF, BMP). Features: a `grid`×`grid` cell map of mean
    * RGB in [0,1] (`grid²·3` floats) — the classic color-layout
    * descriptor, computed with a pixel stride that caps per-image work.
    * Kinds without a JDK codec (audio/video) and undecodable bytes fall
    * back to the deterministic stub at the same feature dimension. */
  final case class ImageIoDecoder(grid: Int = 4) extends MediaDecoder {
    val featureDim: Int = grid * grid * 3
    private val fallback = StubDecoder(featureDim)

    def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      if (kind != "image" || bytes == null || bytes.isEmpty)
        return fallback.decode(kind, bytes)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) return fallback.decode(kind, bytes)
      MediaFeatures(img.getWidth, img.getHeight, 1, gridFeatures(img, grid))
    }
  }

  /** `grid`×`grid` mean-RGB color-layout descriptor of an image in
    * [0,1] (`grid²·3` floats), with a pixel stride that caps per-cell
    * work. Shared by the image and video feature paths. */
  private[multimodal] def gridFeatures(
      img: java.awt.image.BufferedImage, grid: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val feats = new Array[Float](grid * grid * 3)
    var gy = 0
    while (gy < grid) {
      var gx = 0
      while (gx < grid) {
        val x0 = gx * w / grid; val x1 = math.max(x0 + 1, (gx + 1) * w / grid)
        val y0 = gy * h / grid; val y1 = math.max(y0 + 1, (gy + 1) * h / grid)
        val step = math.max(1, math.min(x1 - x0, y1 - y0) / 8)
        var r = 0L; var g = 0L; var b = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
            n += 1
            x += step
          }
          y += step
        }
        val base = (gy * grid + gx) * 3
        feats(base) = (r.toDouble / n / 255.0).toFloat
        feats(base + 1) = (g.toDouble / n / 255.0).toFloat
        feats(base + 2) = (b.toDouble / n / 255.0).toFloat
        gx += 1
      }
      gy += 1
    }
    feats
  }

  /** Real audio decoder on the JDK's `javax.sound.sampled` (WAV, AIFF,
    * AU — PCM). Meta mapping for audio: `width` = sample rate, `height`
    * = channels, `nFrames` = PCM frame count. Features: `featureDim`
    * equal-width RMS energy windows over the mono mix in [0,1] — a real
    * loudness profile. Non-audio kinds and undecodable bytes fall back
    * to the stub. */
  final case class AudioWavDecoder(featureDim: Int = 16) extends MediaDecoder {
    private val fallback = StubDecoder(featureDim)

    def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      if (kind != "audio" || bytes == null || bytes.isEmpty)
        return fallback.decode(kind, bytes)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        val data = ais.readAllBytes()
        ais.close()
        val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
        val channels = math.max(1, fmt.getChannels)
        val frameBytes = bytesPerSample * channels
        val nFrames = data.length / frameBytes
        if (nFrames == 0 || bytesPerSample != 2)
          return fallback.decode(kind, bytes) // contract covers 16-bit PCM
        val feats = new Array[Float](featureDim)
        var w = 0
        while (w < featureDim) {
          val f0 = w * nFrames / featureDim
          val f1 = math.max(f0 + 1, (w + 1) * nFrames / featureDim)
          var sumSq = 0.0
          var f = f0
          while (f < f1) {
            // mono mix of the frame's channels
            var ch = 0
            var mix = 0.0
            while (ch < channels) {
              val o = f * frameBytes + ch * 2
              val s =
                if (fmt.isBigEndian) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
                else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
              mix += s / 32768.0
              ch += 1
            }
            mix /= channels
            sumSq += mix * mix
            f += 1
          }
          feats(w) = math.sqrt(sumSq / (f1 - f0)).toFloat
          w += 1
        }
        MediaFeatures(fmt.getSampleRate.toInt, channels, nFrames, feats)
      } catch { case _: Exception => fallback.decode(kind, bytes) }
    }
  }

  /** Container-level video frame extraction on JDK-only codecs — no
    * external libraries. Two real containers are decoded:
    *
    *  - **animated GIF** (`GIF87a`/`GIF89a`): `javax.imageio`'s GIF
    *    reader iterates the image sequence; each frame's left/top
    *    offset (from the per-frame `ImageDescriptor` metadata) is
    *    composited onto a persistent canvas sized by the logical
    *    screen, which is the draw-over disposal model (the dominant
    *    case; `restoreToPrevious` is approximated by draw-over).
    *  - **MJPEG-in-AVI** (`RIFF....AVI `): the RIFF chunk tree is
    *    walked to the `movi` LIST and every `##dc`/`##db` stream chunk
    *    is decoded through the same `javax.imageio` JPEG codec;
    *    non-JPEG chunks are skipped.
    *
    * Other containers (MP4/H.264 etc. — no JDK codec exists) return
    * empty, and callers fall back to the deterministic stub. */
  object VideoFrames {
    import java.awt.image.BufferedImage

    private def isGif(b: Array[Byte]): Boolean =
      b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F'
    private def isAvi(b: Array[Byte]): Boolean =
      b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

    /** All frames of a supported container, in stream order, as a LAZY
      * iterator — at most one decoded frame (plus the GIF compositing
      * canvas) is live at a time, so a long video never materializes
      * `nFrames × canvas` heap inside a task. Empty when the container
      * is unsupported or undecodable; never throws (decode errors end
      * the iteration). */
    def frames(bytes: Array[Byte]): Iterator[BufferedImage] = {
      if (bytes == null || bytes.isEmpty) Iterator.empty
      else if (isGif(bytes)) gifFrames(bytes)
      else if (isAvi(bytes)) aviFrames(bytes)
      else Iterator.empty
    }

    private def gifFrames(bytes: Array[Byte]): Iterator[BufferedImage] = {
      var iis: javax.imageio.stream.ImageInputStream = null
      def closeQuietly(): Unit =
        if (iis != null) { try iis.close() catch { case _: Exception => () }; iis = null }
      try {
        iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { closeQuietly(); return Iterator.empty }
        val reader = readers.next()
        reader.setInput(iis, false, false)
        val n = reader.getNumImages(true)
        if (n <= 0) { closeQuietly(); return Iterator.empty }
        // Logical screen from stream metadata; fall back to frame 0 dims.
        val first = reader.read(0)
        var (sw, sh) = (first.getWidth, first.getHeight)
        try {
          val sm = reader.getStreamMetadata
          if (sm != null) {
            val root = sm.getAsTree("javax_imageio_gif_stream_1.0")
              .asInstanceOf[org.w3c.dom.Element]
            val lsd = root.getElementsByTagName("LogicalScreenDescriptor")
            if (lsd.getLength > 0) {
              val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
              sw = math.max(sw, e.getAttribute("logicalScreenWidth").toInt)
              sh = math.max(sh, e.getAttribute("logicalScreenHeight").toInt)
            }
          }
        } catch { case _: Exception => () }
        val canvas = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_RGB)
        val g2 = canvas.createGraphics()
        // Pre-decoding iterator: hasNext buffers the next composited
        // frame and returns false when a mid-stream frame fails to
        // decode (truncated/corrupt GIF) — next() never throws after a
        // true hasNext, which keeps the "never throws, decode errors
        // end the iteration" contract under flatMap/foreach consumers.
        // Resources (reader, stream, canvas graphics) are released as
        // soon as the LAST frame is buffered, not on consumption; a
        // consumer that abandons the iterator mid-stream leaves only
        // heap objects for GC (the source is an in-memory byte array —
        // no OS handles are held).
        new Iterator[BufferedImage] {
          private var i = 0
          private var done = false
          private var pending: BufferedImage = null
          private def finish(): Unit = if (!done) {
            done = true
            try { g2.dispose(); reader.dispose() } catch { case _: Exception => () }
            closeQuietly()
          }
          def hasNext: Boolean = pending != null || advance()
          private def advance(): Boolean = {
            if (done || i >= n) { finish(); return false }
            try {
              val frame = if (i == 0) first else reader.read(i)
              var (ox, oy) = (0, 0)
              try {
                val md = reader.getImageMetadata(i)
                val root = md.getAsTree("javax_imageio_gif_image_1.0")
                  .asInstanceOf[org.w3c.dom.Element]
                val desc = root.getElementsByTagName("ImageDescriptor")
                if (desc.getLength > 0) {
                  val e = desc.item(0).asInstanceOf[org.w3c.dom.Element]
                  ox = e.getAttribute("imageLeftPosition").toInt
                  oy = e.getAttribute("imageTopPosition").toInt
                }
              } catch { case _: Exception => () }
              g2.drawImage(frame, ox, oy, null)
              val snap = new BufferedImage(sw, sh, BufferedImage.TYPE_INT_RGB)
              val sg = snap.createGraphics()
              sg.drawImage(canvas, 0, 0, null)
              sg.dispose()
              i += 1
              pending = snap
              if (i >= n) finish() // snap is an independent copy; free eagerly
              true
            } catch {
              case _: Exception => finish(); false
            }
          }
          def next(): BufferedImage = {
            if (!hasNext) throw new NoSuchElementException("gif frames")
            val out = pending
            pending = null
            out
          }
        }
      } catch { case _: Exception => closeQuietly(); Iterator.empty }
    }

    private def aviFrames(bytes: Array[Byte]): Iterator[BufferedImage] = {
      // Pass 1 (cheap, no decode): walk the RIFF tree and collect the
      // movi stream-chunk ranges. Depth-capped — a crafted file of
      // nothing but nested LIST headers would otherwise recurse
      // bytes/12 deep and StackOverflowError past every handler.
      val chunks = Seq.newBuilder[(Int, Int)]
      try {
        // RIFF/LIST headers are 12 bytes (4CC + le32 size + formType);
        // plain chunks are 8 (4CC + le32 size), payload padded to even.
        def le32(o: Int): Long =
          (bytes(o) & 0xffL) | (bytes(o + 1) & 0xffL) << 8 |
            (bytes(o + 2) & 0xffL) << 16 | (bytes(o + 3) & 0xffL) << 24
        def fourCC(o: Int): String =
          new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        def walk(start: Int, end: Int, inMovi: Boolean, depth: Int): Unit = {
          if (depth > 32) return // real AVI nests 2-3 levels
          var p = start
          var ok = true
          while (ok && p + 8 <= end) {
            val id = fourCC(p)
            val size = le32(p + 4) // unsigned — never negative, may exceed Int
            val payload = p + 8
            // A crafted/corrupt size must not stall or rewind the walk:
            // clamp the declared extent to the enclosing chunk, and
            // bail out unless the cursor strictly advances (size
            // arithmetic is done in Long, so 0xFFFFFFF8-style values
            // can't wrap to a smaller/equal Int offset).
            val pEnd = math.min(end.toLong, payload.toLong + size).toInt
            if (id == "RIFF" || id == "LIST") {
              val form = if (payload + 4 <= end) fourCC(payload) else ""
              walk(payload + 4, pEnd, inMovi || form == "movi", depth + 1)
            } else if (inMovi && id.length == 4 &&
                (id.endsWith("dc") || id.endsWith("db")) &&
                size > 0 && pEnd > payload) {
              chunks += ((payload, pEnd - payload))
            }
            val pNew = payload.toLong + size + (size & 1L) // pad to even
            if (pNew <= p || pNew > Int.MaxValue) ok = false
            else p = pNew.toInt
          }
        }
        walk(0, bytes.length, inMovi = false, depth = 0)
      } catch { case _: Exception => return Iterator.empty }
      // Pass 2: decode lazily, one chunk at a time; bad chunks skip.
      chunks.result().iterator.flatMap { case (off, len) =>
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, len)))
        catch { case _: Exception => None }
      }
    }
  }

  /** Real video decoder over [[VideoFrames]] (animated GIF, MJPEG-AVI).
    * Meta: `width`/`height` = canvas dims, `nFrames` = decoded frame
    * count. Features: the per-frame `grid`×`grid` color-layout
    * descriptors averaged across frames — a real global color profile
    * of the clip. Unsupported containers (no JDK codec) and non-video
    * kinds fall back to the deterministic stub. */
  final case class VideoFrameDecoder(grid: Int = 4) extends MediaDecoder {
    val featureDim: Int = grid * grid * 3
    private val fallback = StubDecoder(featureDim)

    def decode(kind: String, bytes: Array[Byte]): MediaFeatures = {
      if (kind != "video") return fallback.decode(kind, bytes)
      val fs = VideoFrames.frames(bytes)
      // streaming fold: one frame live at a time, never the whole clip
      val acc = new Array[Float](featureDim)
      var count = 0
      var w = 0
      var h = 0
      fs.foreach { f =>
        if (count == 0) { w = f.getWidth; h = f.getHeight }
        val g = gridFeatures(f, grid)
        var i = 0
        while (i < featureDim) { acc(i) += g(i); i += 1 }
        count += 1
      }
      if (count == 0) return fallback.decode(kind, bytes)
      var i = 0
      while (i < featureDim) { acc(i) /= count; i += 1 }
      MediaFeatures(w, h, count, acc)
    }
  }

  /** Kind-routing composite: image → [[ImageIoDecoder]], audio →
    * [[AudioWavDecoder]], video → [[VideoFrameDecoder]] (GIF/MJPEG-AVI;
    * other containers degrade to the deterministic stub). All routes
    * must agree on `featureDim` so the output column is uniform. */
  final case class RoutingDecoder(
      routes: Map[String, MediaDecoder],
      default: MediaDecoder) extends MediaDecoder {
    val featureDim: Int = default.featureDim
    require(routes.values.forall(_.featureDim == featureDim),
      "all routed decoders must share featureDim")
    def decode(kind: String, bytes: Array[Byte]): MediaFeatures =
      routes.getOrElse(kind, default).decode(kind, bytes)
  }

  /** The best offline decoder this JVM can offer: real image, audio and
    * video (GIF/MJPEG-AVI) codecs. featureDim 48 (= 4×4 RGB grid). */
  def jdkDecoder(): MediaDecoder = RoutingDecoder(
    Map("image" -> ImageIoDecoder(grid = 4), "audio" -> AudioWavDecoder(48),
      "video" -> VideoFrameDecoder(grid = 4)),
    StubDecoder(48))

  /** Real resize stage: decode → bilinear `Graphics2D` scale to fit
    * `maxSide` → re-encode PNG, replacing the `media` payload and
    * appending the output dims. Non-image rows (and undecodable bytes)
    * pass through with null dims and an untouched payload. Per-partition
    * batched like every codec stage. */
  def resizeImages(df: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide > 0)
    val schema = df.schema
      .add(StructField("out_width", IntegerType))
      .add(StructField("out_height", IntegerType))
    val enc = RowEncoder.encoderFor(schema)
    val kindIdx = df.schema.fieldIndex("kind")
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(kindIdx)
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val img =
          if (kind != "image" || bytes == null || bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
        else {
          val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
          val ow = math.max(1, math.round(img.getWidth * scale).toInt)
          val oh = math.max(1, math.round(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(ow, oh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, ow, oh, null)
          g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Row.fromSeq(r.toSeq.updated(mediaIdx, bos.toByteArray) ++ Seq(ow, oh))
        }
      }
    }(enc)
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

  /** Real frame sampling: decode each video container ([[VideoFrames]]:
    * animated GIF, MJPEG-AVI) and emit one IMAGE row per strided frame —
    * `(asset_id, frame_idx, kind="image", mime="image/png", width,
    * height, media=<PNG bytes>)`. The output composes directly with the
    * image stages ([[withFeatures]] + [[ImageIoDecoder]],
    * [[resizeImages]]), which is how a training pipeline consumes
    * frames. Videos in a container with no JDK codec produce no rows.
    * Batched per partition; frame bytes never touch the driver. All
    * frames are decoded even when strided (GIF frames are delta-coded
    * against the canvas, so skipping decode would corrupt later
    * frames); stride only bounds what is re-encoded and emitted. */
  def extractFrames(df: DataFrame, stride: Int = 1): DataFrame = {
    require(stride > 0)
    val schema = StructType(Seq(
      StructField("asset_id", StringType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("media", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val idIdx = df.schema.fieldIndex("asset_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.getString(kindIdx) != "video") Iterator.empty
        else {
          val id = r.getString(idIdx)
          // lazy frame iterator: all frames decode (GIF deltas demand
          // it) but only strided ones re-encode, one at a time
          VideoFrames.frames(r.getAs[Array[Byte]](mediaIdx)).zipWithIndex
            .collect { case (img, i) if i % stride == 0 =>
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              Row(id, i, "image", "image/png", img.getWidth, img.getHeight,
                bos.toByteArray)
            }
        }
      }
    }(enc)
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
