package graft

import org.apache.spark.sql.functions._

import graft.multimodal.AudioFingerprint

/** [[graft.multimodal.AudioFingerprint]] — landmark (constellation)
  * hashing over real PCM WAVs: a subsegment query must identify its
  * source track at the correct time offset, distinct tracks must not
  * collide, and extraction must be deterministic. */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val SampleRate = 44100f

  /** Mono 16-bit little-endian WAV of a seeded tone sequence: one
    * sine segment per 200 ms, frequency drawn from the seed — a
    * distinctive, deterministic "melody". */
  private def toneWav(seed: Long, seconds: Double): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val n = (SampleRate * seconds).toInt
    val segment = (SampleRate * 0.2).toInt
    val freqs = Array.fill(n / segment + 1)(300.0 + rnd.nextInt(3000))
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val f = freqs(i / segment)
      val s = (math.sin(2 * math.Pi * f * i / SampleRate) * 12000).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Cut a subsegment [fromSec, toSec) out of a mono 16-bit WAV. */
  private def cutWav(bytes: Array[Byte], fromSec: Double, toSec: Double): Array[Byte] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val data = ais.readAllBytes(); ais.close()
    val from = (SampleRate * fromSec).toInt * 2
    val to = math.min(data.length, (SampleRate * toSec).toInt * 2)
    val pcm = java.util.Arrays.copyOfRange(data, from, to)
    val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
    val out = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      out, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("a subsegment query identifies its source track at the right offset") {
    val trackA = toneWav(seed = 1L, seconds = 2.4)
    val trackB = toneWav(seed = 2L, seconds = 2.4)
    val query = cutWav(trackA, 0.8, 1.6)

    val index = AudioFingerprint.fingerprints(
      Seq(("A", trackA), ("B", trackB)).toDF("media_id", "data"))
      .withColumnRenamed("media_id", "track_id")
    val qfps = AudioFingerprint.fingerprints(
      Seq(("q1", query)).toDF("media_id", "data"))
      .withColumnRenamed("media_id", "query_id")

    val top = AudioFingerprint.matchTracks(qfps, index, k = 2)
      .orderBy("rank").collect()
    assert(top.nonEmpty, "no match rows at all")
    val best = top.head
    assert(best.getAs[String]("track_id") == "A",
      s"query cut from A must match A: ${top.mkString(", ")}")
    // the cut starts at 0.8 s = 0.8*44100/512 ≈ 69 hop frames
    val offset = best.getAs[Int]("offset")
    assert(math.abs(offset - 69) <= 2, s"offset should be ~69 frames, got $offset")
    // and the aligned vote count dwarfs any accidental B agreement
    val bVotes = top.find(_.getAs[String]("track_id") == "B")
      .map(_.getAs[Long]("votes")).getOrElse(0L)
    assert(best.getAs[Long]("votes") >= 5 * math.max(1L, bVotes),
      s"A alignment must dominate: ${top.mkString(", ")}")
  }

  test("extraction is deterministic and non-trivial") {
    val wav = toneWav(seed = 7L, seconds = 1.0)
    val a = AudioFingerprint.landmarks(wav)
    val b = AudioFingerprint.landmarks(wav)
    assert(a == b)
    assert(a.size > 50, s"expected a real landmark stream, got ${a.size}")
    // undecodable bytes yield no landmarks, loudly nothing — not garbage
    assert(AudioFingerprint.landmarks("not audio".getBytes).isEmpty)
  }
}
