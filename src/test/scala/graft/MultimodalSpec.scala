package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val assets = Seq(
    ("a1", "image", Array[Byte](1, 2, 3, 4)),
    ("a2", "video", Array[Byte](9, 8, 7, 6, 5)),
    ("a3", "audio", Array[Byte](0, 0, 1))).toDF("asset_id", "kind", "media")

  test("withFeatures appends deterministic decoded columns, keeps rows") {
    val out = Multimodal.withFeatures(assets)
    assert(out.count() == 3)
    assert(out.columns.toSeq ==
      Seq("asset_id", "kind", "media", "width", "height", "n_frames", "features"))
    val f1 = out.filter(col("asset_id") === "a1").select("features").head().getSeq[Float](0)
    val f1again = Multimodal.withFeatures(assets)
      .filter(col("asset_id") === "a1").select("features").head().getSeq[Float](0)
    assert(f1 == f1again, "stub decoder must be deterministic")
    assert(f1.length == 64)
    // video assets expand to multiple frames; others get exactly one
    val frames = out.select("asset_id", "n_frames").as[(String, Int)].collect().toMap
    assert(frames("a1") == 1 && frames("a3") == 1 && frames("a2") >= 1)
  }

  test("sampleFrames expands only videos, strided") {
    val frames = Multimodal.sampleFrames(assets, stride = 2)
    val byAsset = frames.groupBy("asset_id").count().as[(String, Long)].collect().toMap
    assert(byAsset.keySet == Set("a2"))
    val idxs = frames.select("frame_idx").as[Int].collect().toSeq.sorted
    assert(idxs == idxs.distinct && idxs.forall(_ % 2 == 0))
    // every frame carries a feature vector of the decoder's dim
    assert(frames.select(size(col("frame_features"))).as[Int].collect().forall(_ == 64))
  }

  test("resizeMeta computes clamped scale and output dims") {
    val out = Multimodal.resizeMeta(assets, maxSide = 128)
    out.select("width", "height", "scale", "out_width", "out_height")
      .collect().foreach { r =>
        val (w, h, s) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        assert(s <= 1.0 && s > 0.0)
        assert(math.max(r.getInt(3), r.getInt(4)) <= 128 ||
          s == 1.0 && math.max(w, h) <= 128)
      }
  }

  /** A w×h PNG whose left half is pure red and right half pure blue. */
  private def halfPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder really decodes: true dims and color-layout features") {
    val png = halfPng(64, 32)
    val df = Seq(("p1", "image", png), ("a1", "audio", Array[Byte](1, 2)))
      .toDF("asset_id", "kind", "media")
    val out = Multimodal.withFeatures(df, Multimodal.ImageIoDecoder(grid = 2))
    val p = out.filter(col("asset_id") === "p1").head()
    assert(p.getAs[Int]("width") == 64 && p.getAs[Int]("height") == 32)
    val f = p.getSeq[Float](p.fieldIndex("features"))
    assert(f.length == 12) // 2×2 grid × RGB
    // left cells ≈ red (r≈1, b≈0), right cells ≈ blue
    val (tlR, tlB) = (f(0), f(2))
    val (trR, trB) = (f(3), f(5))
    assert(tlR > 0.9f && tlB < 0.1f, s"top-left should be red: $f")
    assert(trB > 0.9f && trR < 0.1f, s"top-right should be blue: $f")
    // non-image kinds fall back to the stub at the same dim
    val a = out.filter(col("asset_id") === "a1").head()
    assert(a.getSeq[Float](a.fieldIndex("features")).length == 12)
  }

  test("resizeImages re-encodes a truly scaled PNG payload") {
    val df = Seq(("p1", "image", halfPng(100, 50)),
      ("t1", "audio", Array[Byte](7))).toDF("asset_id", "kind", "media")
    val out = Multimodal.resizeImages(df, maxSide = 32).cache()
    val p = out.filter(col("asset_id") === "p1").head()
    assert(p.getAs[Int]("out_width") == 32 && p.getAs[Int]("out_height") == 16)
    // the payload itself was replaced: re-decoding it yields the new dims
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(p.getAs[Array[Byte]]("media")))
    assert(resized.getWidth == 32 && resized.getHeight == 16)
    // and the color layout survives the scale
    assert((resized.getRGB(4, 8) >> 16 & 0xff) > 200) // left still red
    assert((resized.getRGB(28, 8) & 0xff) > 200) // right still blue
    // non-image rows pass through untouched
    val t = out.filter(col("asset_id") === "t1").head()
    assert(t.isNullAt(t.fieldIndex("out_width")))
    assert(t.getAs[Array[Byte]]("media").toSeq == Seq[Byte](7))
  }

  /** 16-bit mono PCM WAV: first half silence, second half full-scale
    * square wave at the given rate. */
  private def halfLoudWav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- nSamples / 2 until nSamples) {
      val v: Short = if (i % 2 == 0) 30000 else -30000
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioWavDecoder really decodes: rate, channels, RMS profile") {
    val wav = halfLoudWav(8000, 4000)
    val df = Seq(("w1", "audio", wav)).toDF("asset_id", "kind", "media")
    val out = Multimodal.withFeatures(df, Multimodal.AudioWavDecoder(8))
    val r = out.head()
    assert(r.getAs[Int]("width") == 8000) // sample rate
    assert(r.getAs[Int]("height") == 1) // channels
    assert(r.getAs[Int]("n_frames") == 4000)
    val f = r.getSeq[Float](r.fieldIndex("features"))
    assert(f.length == 8)
    // silent first half, loud second half
    assert(f.take(4).forall(_ < 0.01f), s"silent half: $f")
    assert(f.drop(4).forall(_ > 0.5f), s"loud half: $f")
  }

  test("jdkDecoder routes kinds: real image/audio/video, stub fallback") {
    val df = Seq(
      ("i", "image", halfPng(32, 32)),
      ("a", "audio", halfLoudWav(8000, 800)),
      ("v", "video", animatedGif(24, 24, Seq(0xff0000, 0x0000ff))),
      ("x", "video", Array[Byte](1, 2, 3))).toDF("asset_id", "kind", "media")
    val out = Multimodal.withFeatures(df, Multimodal.jdkDecoder()).cache()
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("i").getAs[Int]("width") == 32) // real decode
    assert(byId("a").getAs[Int]("width") == 8000) // real decode
    assert(byId("v").getAs[Int]("width") == 24 &&
      byId("v").getAs[Int]("n_frames") == 2) // real video decode
    out.collect().foreach(r =>
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 48))
  }

  /** An animated GIF of solid-color full-canvas frames. */
  private def animatedGif(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = img.createGraphics()
      g2.setColor(new java.awt.Color(c))
      g2.fillRect(0, 0, w, h)
      g2.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** A minimal MJPEG-in-AVI: RIFF('AVI ') → LIST('movi') → 00dc JPEG
    * chunks. Exactly the container shape VideoFrames.aviFrames walks. */
  private def mjpegAvi(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def jpeg(c: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = img.createGraphics()
      g2.setColor(new java.awt.Color(c)); g2.fillRect(0, 0, w, h); g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val movi = "movi".getBytes("US-ASCII") ++
      colors.toArray.flatMap(c => chunk("00dc", jpeg(c)))
    val list = "LIST".getBytes("US-ASCII") ++ le32(movi.length) ++ movi
    val riffPayload = "AVI ".getBytes("US-ASCII") ++ list
    "RIFF".getBytes("US-ASCII") ++ le32(riffPayload.length) ++ riffPayload
  }

  test("VideoFrames really decodes an animated GIF frame sequence") {
    val gif = animatedGif(40, 20, Seq(0xff0000, 0x00ff00, 0x0000ff))
    val fs = Multimodal.VideoFrames.frames(gif).toSeq
    assert(fs.length == 3)
    assert(fs.forall(f => f.getWidth == 40 && f.getHeight == 20))
    def dominant(f: java.awt.image.BufferedImage): (Int, Int, Int) = {
      val rgb = f.getRGB(20, 10)
      ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    }
    assert(dominant(fs(0))._1 > 200 && dominant(fs(0))._3 < 50, "frame 0 red")
    assert(dominant(fs(1))._2 > 200, "frame 1 green")
    assert(dominant(fs(2))._3 > 200 && dominant(fs(2))._1 < 50, "frame 2 blue")
  }

  test("VideoFrames really decodes MJPEG-in-AVI chunks") {
    val avi = mjpegAvi(32, 16, Seq(0xff0000, 0x0000ff))
    val fs = Multimodal.VideoFrames.frames(avi).toSeq
    assert(fs.length == 2)
    assert(fs.forall(f => f.getWidth == 32 && f.getHeight == 16))
    assert(((fs(0).getRGB(16, 8) >> 16) & 0xff) > 180, "frame 0 red (jpeg-lossy)")
    assert((fs(1).getRGB(16, 8) & 0xff) > 180, "frame 1 blue (jpeg-lossy)")
    // unsupported containers yield no frames, never throw
    assert(Multimodal.VideoFrames.frames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.VideoFrames.frames(Array.empty[Byte]).isEmpty)
  }

  test("VideoFrameDecoder: real frame count and cross-frame color profile") {
    val gif = animatedGif(24, 24, Seq(0xff0000, 0x0000ff)) // red, blue
    val out = Multimodal.withFeatures(
      Seq(("v1", "video", gif)).toDF("asset_id", "kind", "media"),
      Multimodal.VideoFrameDecoder(grid = 2))
    val r = out.head()
    assert(r.getAs[Int]("width") == 24 && r.getAs[Int]("height") == 24)
    assert(r.getAs[Int]("n_frames") == 2)
    val f = r.getSeq[Float](r.fieldIndex("features"))
    assert(f.length == 12)
    // averaged over a pure-red and a pure-blue frame: r≈b≈0.5, g≈0
    assert(math.abs(f(0) - 0.5f) < 0.1f, s"mean red: $f")
    assert(f(1) < 0.1f, s"mean green: $f")
    assert(math.abs(f(2) - 0.5f) < 0.1f, s"mean blue: $f")
  }

  test("extractFrames emits strided real PNG image rows that compose on") {
    val gif = animatedGif(20, 10, Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    val df = Seq(
      ("v1", "video", gif),
      ("i1", "image", halfPng(8, 8)), // non-video: no frame rows
      ("vx", "video", Array[Byte](9, 9))) // undecodable: no frame rows
      .toDF("asset_id", "kind", "media")
    val frames = Multimodal.extractFrames(df, stride = 2).cache()
    assert(frames.columns.toSeq == Seq("asset_id", "frame_idx", "kind",
      "mime", "width", "height", "media"))
    val rows = frames.collect().sortBy(_.getInt(1))
    assert(rows.map(_.getString(0)).toSeq == Seq("v1", "v1"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2))
    // the payload is a real PNG of the decoded frame
    val img0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rows(0).getAs[Array[Byte]]("media")))
    assert(img0.getWidth == 20 && img0.getHeight == 10)
    assert(((img0.getRGB(10, 5) >> 16) & 0xff) > 200, "frame 0 is the red frame")
    // frame rows are image rows: the image feature stage runs on them as-is
    val feats = Multimodal.withFeatures(frames, Multimodal.ImageIoDecoder(grid = 1))
    val f2 = feats.filter(col("frame_idx") === 2).head()
    val v = f2.getSeq[Float](f2.fieldIndex("features"))
    assert(v(2) > 0.9f && v(0) < 0.1f, s"frame 2 decodes blue through ImageIoDecoder: $v")
  }

  test("truncated/corrupt GIFs end iteration cleanly, never throw") {
    val gif = animatedGif(40, 20, Seq(0xff0000, 0x00ff00, 0x0000ff))
    val whole = Multimodal.VideoFrames.frames(gif).toSeq
    assert(whole.length == 3)
    // every truncation point: some prefix of the frames (possibly none),
    // no exception from hasNext/next even under full drain
    (1 until gif.length by 7).foreach { cut =>
      val fs = Multimodal.VideoFrames.frames(gif.take(cut)).toSeq
      assert(fs.length <= 3, s"cut=$cut")
    }
    // random byte corruption mid-stream: same contract
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { trial =>
      val mutated = gif.clone()
      (0 until 5).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      Multimodal.VideoFrames.frames(mutated).foreach(_ => ()) // must not throw
      assert(true, s"trial=$trial")
    }
    // a decode failure surfaced through hasNext also ends the
    // flatMap-driven extractFrames path without failing the task
    val truncated = gif.take(gif.length * 2 / 3)
    val df = Seq(("vt", "video", truncated)).toDF("asset_id", "kind", "media")
    Multimodal.extractFrames(df).collect() // must not throw
  }

  test("corrupt AVI chunk sizes cannot stall or rewind the RIFF walk") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def avi(moviBody: Array[Byte]): Array[Byte] = {
      val movi = "movi".getBytes("US-ASCII") ++ moviBody
      val list = "LIST".getBytes("US-ASCII") ++ le32(movi.length) ++ movi
      val payload = "AVI ".getBytes("US-ASCII") ++ list
      "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload
    }
    // size 0xFFFFFFF8: as a signed Int this is -8, which used to make
    // the cursor not advance (p_new == p) — an infinite loop, no throw
    val stall = avi("00dc".getBytes("US-ASCII") ++ le32(0xFFFFFFF8L) ++
      Array.fill[Byte](64)(0))
    assert(Multimodal.VideoFrames.frames(stall).isEmpty)
    // size that rewinds the cursor (larger wrap)
    val rewind = avi("00dc".getBytes("US-ASCII") ++ le32(0xFFFFFF00L) ++
      Array.fill[Byte](64)(0))
    assert(Multimodal.VideoFrames.frames(rewind).isEmpty)
    // declared size overruns the file: clamped to the enclosing chunk,
    // the (undecodable) clamped payload is skipped, no throw
    val overrun = avi("00dc".getBytes("US-ASCII") ++ le32(1 << 30) ++
      Array.fill[Byte](16)(0))
    assert(Multimodal.VideoFrames.frames(overrun).isEmpty)
    // random header corruption of a real file: always terminates
    val good = mjpegAvi(16, 8, Seq(0xff0000, 0x0000ff))
    val rnd = new scala.util.Random(7)
    (0 until 100).foreach { _ =>
      val mutated = good.clone()
      (0 until 4).foreach { _ =>
        mutated(rnd.nextInt(math.min(64, mutated.length))) = rnd.nextInt(256).toByte
      }
      Multimodal.VideoFrames.frames(mutated).foreach(_ => ()) // must not throw/hang
    }
  }

  test("asset schema round-trips through parquet with binary payload") {
    val dir = java.nio.file.Files.createTempDirectory("graft-assets").toString + "/t"
    val rows = java.util.Arrays.asList(
      Row("x1", "image", "image/png", Array[Byte](5, 5), Row(10, 20, null)))
    spark.createDataFrame(rows, Multimodal.assetSchema)
      .write.parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet round-trip relaxes nullability; compare names and types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.assetSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = back.head()
    assert(r.getAs[Array[Byte]]("media").toSeq == Seq[Byte](5, 5))
    assert(r.getAs[Row]("meta").getInt(1) == 20)
  }
}
