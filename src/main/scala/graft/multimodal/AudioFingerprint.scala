package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Landmark audio fingerprinting — the constellation-hash design of
  * Wang, "An Industrial-Strength Audio Search Algorithm" (ISMIR 2003,
  * the published Shazam algorithm), pure JDK:
  *
  *  1. decode 16-bit PCM (WAV/AIFF/AU via `javax.sound.sampled`, the
  *     same codec surface as [[Multimodal.AudioWavDecoder]]) to a mono
  *     stream;
  *  2. STFT: 1024-sample Hann-windowed frames, hop 512, iterative
  *     radix-2 FFT;
  *  3. constellation: per frame, the loudest bin in each of 6
  *     logarithmic bands (local peaks robust to wideband noise);
  *  4. landmarks: each peak pairs with peaks 1..16 frames ahead within
  *     a frequency window; `hash = f1:9 | f2:9 | dt:5` bits packed in
  *     a LONG, emitted with the anchor frame time.
  *
  * Matching is pure relational algebra ([[matchTracks]]): hash
  * equi-join query↔index, histogram of time-offset deltas per track,
  * top vote count wins — a genuine subsegment aligns at ONE offset
  * and scores ~linearly in its length, noise spreads across offsets.
  *
  * 100 TB shape: fingerprint extraction is scan-local (one UDF pass
  * per file, ~30 landmarks/s of audio — the index is thousands of
  * times smaller than the PCM); matching is an equi-join on the hash
  * (shuffle carries landmark rows, never audio) + a partial-aggregated
  * offset histogram. Exactly the Dedup-banding cost model applied to
  * audio. `AudioFingerprintSpec` pins: subsegment queries hit their
  * source track at the right offset, distinct tracks don't collide,
  * extraction is deterministic.
  */
object AudioFingerprint {

  private val FrameSize = 1024
  private val Hop = 512
  private val Bands = 6
  private val MaxDt = 16
  private val FreqWindow = 64 // |f2 - f1| bound for pairing

  /** In-place iterative radix-2 FFT (re, im of length 2^k). */
  private[multimodal] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT size must be a power of two, got $n")
    // bit reversal
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** 16-bit PCM bytes → mono [-1,1] samples, or None if undecodable. */
  private def monoPcm(bytes: Array[Byte]): Option[Array[Double]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      ais.close()
      if (fmt.getSampleSizeInBits != 16) return None
      val channels = math.max(1, fmt.getChannels)
      val frameBytes = 2 * channels
      val nFrames = data.length / frameBytes
      if (nFrames == 0) return None
      val out = new Array[Double](nFrames)
      var f = 0
      while (f < nFrames) {
        var ch = 0; var mix = 0.0
        while (ch < channels) {
          val o = f * frameBytes + ch * 2
          val s =
            if (fmt.isBigEndian) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
            else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
          mix += s / 32768.0
          ch += 1
        }
        out(f) = mix / channels
        f += 1
      }
      Some(out)
    } catch { case _: Exception => None }

  /** Landmark hashes of one clip: (hash, anchorFrame) pairs.
    * Deterministic — pure function of the PCM content. */
  private[graft] def landmarks(bytes: Array[Byte]): Seq[(Long, Int)] = {
    val pcm = monoPcm(bytes).getOrElse(return Seq.empty)
    val nFrames = math.max(0, (pcm.length - FrameSize) / Hop + 1)
    if (nFrames == 0) return Seq.empty
    val hann = Array.tabulate(FrameSize)(i =>
      0.5 * (1 - math.cos(2 * math.Pi * i / (FrameSize - 1))))
    // per-frame band peaks
    val half = FrameSize / 2
    val bandEdges = Array.tabulate(Bands + 1)(b =>
      math.max(1, math.round(math.pow(half.toDouble, b.toDouble / Bands)).toInt))
    val peaks = Array.ofDim[Int](nFrames, Bands)
    var t = 0
    while (t < nFrames) {
      val re = new Array[Double](FrameSize)
      val im = new Array[Double](FrameSize)
      var i = 0
      while (i < FrameSize) { re(i) = pcm(t * Hop + i) * hann(i); i += 1 }
      fft(re, im)
      var b = 0
      while (b < Bands) {
        var best = bandEdges(b); var bestMag = -1.0
        var f = bandEdges(b)
        while (f < math.min(bandEdges(b + 1), half)) {
          val mag = re(f) * re(f) + im(f) * im(f)
          if (mag > bestMag) { bestMag = mag; best = f }
          f += 1
        }
        peaks(t)(b) = best
        b += 1
      }
      t += 1
    }
    // pair anchors with target-zone peaks
    val out = Seq.newBuilder[(Long, Int)]
    t = 0
    while (t < nFrames) {
      var b1 = 0
      while (b1 < Bands) {
        val f1 = peaks(t)(b1)
        var dt = 1
        while (dt <= MaxDt && t + dt < nFrames) {
          var b2 = 0
          while (b2 < Bands) {
            val f2 = peaks(t + dt)(b2)
            if (math.abs(f2 - f1) <= FreqWindow) {
              val h = (f1.toLong << 14) | (f2.toLong << 5) | dt.toLong
              out += ((h, t))
            }
            b2 += 1
          }
          dt += 1
        }
        b1 += 1
      }
      t += 1
    }
    out.result()
  }

  private val landmarksUdf =
    udf((bytes: Array[Byte]) => landmarks(bytes).map { case (h, t) => (h, t) })

  /** Fingerprint a corpus of audio clips: `(idCol, hash LONG, t INT)`,
    * one row per landmark — scan-local, no shuffle. */
  def fingerprints(
      df: DataFrame, binaryCol: String = "data",
      idCol: String = "media_id"): DataFrame =
    df.select(col(idCol), explode(landmarksUdf(col(binaryCol))).as("lm"))
      .select(col(idCol), col("lm._1").as("hash"), col("lm._2").as("t"))

  /** Match query clips against a fingerprint index: hash equi-join →
    * per-(query, track) offset histogram → best-aligned offset's vote
    * count as the score, top `k` tracks per query. Ties break on
    * (track, offset) for determinism. */
  def matchTracks(
      queryFps: DataFrame, indexFps: DataFrame, k: Int = 1,
      queryId: String = "query_id", trackId: String = "track_id"): DataFrame = {
    val q = queryFps.select(col(queryId), col("hash"), col("t").as("qt"))
    val ix = indexFps.select(col(trackId), col("hash"), col("t").as("it"))
    val votes = q.join(ix, "hash")
      .groupBy(col(queryId), col(trackId), (col("it") - col("qt")).as("offset"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("votes").desc, col(trackId), col("offset"))
    votes.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(trackId), col("offset"), col("votes"), col("rank"))
  }
}
