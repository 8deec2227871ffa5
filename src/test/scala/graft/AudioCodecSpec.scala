package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** The REAL audio codec path (JDK javax.sound.sampled): decode
  * recovers true sample rate / channels / duration and amplitude
  * features from genuine WAV payloads, and junk bytes degrade to no
  * row instead of failing the job — the audio twin of ImageCodecSpec.
  */
class AudioCodecSpec extends SparkSpec {

  /** A real PCM-16 WAV: `seconds` of a sine at `hz`, given amplitude. */
  private def wav(sampleRate: Int, channels: Int, seconds: Double,
                  hz: Double, amplitude: Double): Array[Byte] = {
    val nFrames = (sampleRate * seconds).toInt
    val bytes = new Array[Byte](nFrames * 2 * channels)
    var f = 0
    while (f < nFrames) {
      val s = (amplitude * math.sin(2 * math.Pi * hz * f / sampleRate) * 32767).toInt
      var c = 0
      while (c < channels) {
        val off = (f * channels + c) * 2
        bytes(off) = (s & 0xff).toByte
        bytes(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, 2 * channels, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio: true rate/channels/duration + sine RMS; junk yields no row") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "audio", wav(16000, 1, 0.5, 440.0, 0.8)),
      MediaRow(2L, "audio", wav(8000, 2, 0.25, 220.0, 0.5)),
      MediaRow(3L, "audio", "definitely not audio".getBytes("UTF-8"))
    ).toDS()
    val got = Multimodal.decodeAudio(media).collect()
      .map(d => d.media_id -> d).toMap
    assert(got.keySet === Set(1L, 2L)) // junk row degrades gracefully
    assert((got(1L).sample_rate, got(1L).channels) === ((16000, 1)))
    assert(got(1L).n_frames === 8000L)
    assert(got(1L).duration_ms === 500L)
    // a sine of amplitude A has RMS A/√2 and peak A
    assert(math.abs(got(1L).rms - 0.8 / math.sqrt(2)) < 0.01,
      s"rms ${got(1L).rms}")
    assert(math.abs(got(1L).peak - 0.8) < 0.01, s"peak ${got(1L).peak}")
    assert((got(2L).sample_rate, got(2L).channels) === ((8000, 2)))
    assert(got(2L).n_frames === 2000L)
    assert(got(2L).duration_ms === 250L)
    assert(math.abs(got(2L).rms - 0.5 / math.sqrt(2)) < 0.01)
  }

  test("silence decodes to zero RMS and zero peak") {
    import spark.implicits._
    val media = Seq(MediaRow(7L, "audio", wav(8000, 1, 0.1, 100.0, 0.0))).toDS()
    val d = Multimodal.decodeAudio(media).collect().head
    assert(d.rms === 0.0f)
    assert(d.peak === 0.0f)
    assert(d.n_frames === 800L)
  }

  test("8-bit unsigned WAV converts through the PCM16 path") {
    import spark.implicits._
    // hand-build an 8-bit unsigned mono WAV (constant half-amplitude)
    val sampleRate = 8000
    val nFrames = 400
    val bytes = Array.fill[Byte](nFrames)((128 + 64).toByte)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val d = Multimodal.decodeAudio(
      Seq(MediaRow(9L, "audio", bos.toByteArray)).toDS()).collect().head
    assert(d.sample_rate === 8000)
    assert(d.channels === 1)
    assert(d.n_frames === 400L)
    // constant +0.5 signal: RMS == peak == 0.5 (8-bit quantization slack)
    assert(math.abs(d.rms - 0.5) < 0.01, s"rms ${d.rms}")
    assert(math.abs(d.peak - 0.5) < 0.01, s"peak ${d.peak}")
  }

  test("audioFeatures: sine physics — zero crossings = 2·f·t, RMS = A/√2, peak = A") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "audio", wav(8000, 1, 1.0, 440.0, 0.8)),
      MediaRow(2L, "audio", wav(8000, 1, 0.5, 100.0, 0.3)),
      MediaRow(3L, "audio", "junk".getBytes("UTF-8"))).toDS()
    val got = Multimodal.audioFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(got.keySet === Set(1L, 2L), "junk degrades to no row")
    val a = got(1L)
    assert(a.sample_rate === 8000 && a.n_samples === 8000L && a.duration_ms === 1000L)
    // a 440 Hz sine crosses zero twice per period: 880 ± boundary
    assert(math.abs(a.zero_crossings - 880L) <= 2, s"zc ${a.zero_crossings}")
    assert(math.abs(a.rms - 0.8 / math.sqrt(2)) < 0.005, s"rms ${a.rms}")
    assert(math.abs(a.peak / 32767.0 - 0.8) < 0.01, s"peak ${a.peak}")
    val b = got(2L)
    assert(math.abs(b.zero_crossings - 100L) <= 2, "100 Hz over 0.5 s → 100 crossings")
    assert(math.abs(b.rms - 0.3 / math.sqrt(2)) < 0.005)
  }

  test("audioFeatures: header-inconsistent (truncated) WAV yields no row") {
    import spark.implicits._
    val whole = wav(8000, 1, 1.0, 440.0, 0.8)
    // chop the tail off the data section: the header still claims 8000
    // frames but the stream delivers fewer — decoded-sample accounting
    // must reject it rather than silently skew RMS/duration
    val truncated = whole.take(whole.length - 1000)
    val media = Seq(
      MediaRow(1L, "audio", whole),
      MediaRow(2L, "audio", truncated)).toDS()
    val got = Multimodal.audioFeatures(media).collect()
    assert(got.map(_.media_id).toSet === Set(1L),
      "truncated payload is dropped, intact one survives")
  }

  test("audioSpectral: Goertzel probe bank finds the played tone, not its neighbours") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "audio", wav(8000, 1, 1.0, 440.0, 0.8)),   // concert A
      MediaRow(2L, "audio", wav(8000, 1, 1.0, 1760.0, 0.5)),  // two octaves up
      MediaRow(3L, "audio", wav(8000, 1, 1.0, 110.0, 0.9)),   // low A
      MediaRow(4L, "audio", "junk".getBytes("UTF-8"))).toDS()
    val got = Multimodal.audioSpectral(media).collect()
      .map(s => s.media_id -> s).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L).dominant_hz === 440)
    assert(got(2L).dominant_hz === 1760)
    assert(got(3L).dominant_hz === 110)
    // a unit-amplitude sine reads ~A²/4 at its own bin; 0.8² / 4 = 0.16
    assert(math.abs(got(1L).dominant_power - 0.16) < 0.01,
      s"power ${got(1L).dominant_power}")
    // off-bin leakage stays well under the tone's own bin
    val offBins = got(1L).powers.sorted.dropRight(1)
    assert(offBins.forall(_ < got(1L).dominant_power / 10))
  }

  test("audioSpectral: two-tone mix ranks the stronger component first") {
    import spark.implicits._
    // sum two sines by mixing amplitudes in one buffer via two decodes
    // is overkill — build the mixed PCM directly
    val sampleRate = 8000
    val n = 8000
    val bytes = new Array[Byte](n * 2)
    var f = 0
    while (f < n) {
      val s = ((0.6 * math.sin(2 * math.Pi * 220 * f / sampleRate)
        + 0.2 * math.sin(2 * math.Pi * 880 * f / sampleRate)) * 32767).toInt
      bytes(f * 2) = (s & 0xff).toByte
      bytes(f * 2 + 1) = ((s >> 8) & 0xff).toByte
      f += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    import spark.implicits._
    val got = Multimodal.audioSpectral(
      Seq(MediaRow(7L, "audio", bos.toByteArray)).toDS()).collect().head
    assert(got.dominant_hz === 220)
    val p880 = got.powers(Multimodal.spectralProbesHz.indexOf(880))
    assert(p880 > got.powers(Multimodal.spectralProbesHz.indexOf(1760)),
      "the real second tone outranks a silent bin")
  }

  test("audioFeatureIndex parity: decoded features equal direct md5 arithmetic") {
    // spot-check one synthesized doc end-to-end without the codec:
    // block digests → LE int16 samples → integer features
    val dir = "/root/testdata/sf0.001"
    val row = Multimodal.audioFeatureIndex(spark, dir)
      .filter(org.apache.spark.sql.functions.col("media_id") === 3L)
      .collect().head
    val text = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 3L)
      .select("text").collect().head.getString(0)
    val k = (8L + 3L % 5L).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val samples = (0 until k).flatMap { j =>
      val d = md.digest(s"$text@$j".getBytes("UTF-8"))
      (0 until 8).map(i => (((d(2 * i) & 0xff) | (d(2 * i + 1) << 8)).toShort).toInt)
    }
    assert(row.getAs[Long]("n_samples") === samples.length.toLong)
    assert(row.getAs[Int]("peak") === samples.map(math.abs).max)
    val zc = samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
    assert(row.getAs[Long]("zero_crossings") === zc.toLong)
    val sumSq = samples.map(v => v.toLong * v).sum
    val rms = BigDecimal(math.sqrt(sumSq.toDouble / samples.length) / 32768.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("rms") === rms)
  }
}
