package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal

/** r19 envelope proof for the two-real-frames-per-complex-FFT change
  * (NearestHypotSpec pattern): the paired path's FP deviation from the
  * single-frame path must sit orders of magnitude inside the tolerances
  * the oracle's pipe_audio booleans and dominant-bin outputs rely on.
  * No Spark session — the kernels are plain functions. */
class AudioFftEnvelopeSpec extends AnyFunSuite {

  private def lcg(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L

  test("fftInPlace matches a naive DFT to 1e-9 of the spectrum scale") {
    val n = 256
    var s = 42L
    val xs = Array.fill(n) { s = lcg(s); (s >>> 20).toDouble / (1L << 43).toDouble - 0.5 }
    val re = xs.clone(); val im = new Array[Double](n)
    Multimodal.fftInPlace(re, im)
    var maxErr = 0.0; var scale = 0.0
    (0 until n).foreach { k =>
      var sr = 0.0; var si = 0.0
      (0 until n).foreach { j =>
        val a = -2.0 * math.Pi * k * j / n
        sr += xs(j) * math.cos(a); si += xs(j) * math.sin(a)
      }
      maxErr = math.max(maxErr, math.max(math.abs(re(k) - sr), math.abs(im(k) - si)))
      scale = math.max(scale, math.hypot(sr, si))
    }
    assert(maxErr <= 1e-9 * scale, s"fft deviates from DFT: $maxErr vs scale $scale")
  }

  test("paired real-frame path stays inside the single-frame envelope") {
    val rate = 8192
    def withSingle[T](f: => T): T = {
      sys.props("graft.audio.pairfft.probeOff") = "true"
      try f finally sys.props.remove("graft.audio.pairfft.probeOff")
    }
    def sine(freqs: Seq[(Double, Double)], nSamples: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * nSamples)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // minimal PCM16 mono WAV header
      bb.put("RIFF".getBytes); bb.putInt(36 + 2 * nSamples); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
      bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(2 * nSamples)
      var i = 0
      while (i < nSamples) {
        var v = 0.0
        freqs.foreach { case (f, a) => v += a * math.sin(2 * math.Pi * f * i / rate) }
        bb.putShort(math.max(-32768.0, math.min(32767.0, v)).toShort)
        i += 1
      }
      bb.array()
    }
    def noise(nSamples: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * nSamples)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + 2 * nSamples); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
      bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(2 * nSamples)
      var s = 7L; var i = 0
      while (i < nSamples) {
        s = lcg(s); bb.putShort(((s >>> 40) - 8388608L).toShort)
        i += 1
      }
      bb.array()
    }
    val frame = 1024
    val fixtures: Seq[(String, Array[Byte])] = Seq(
      // bin-aligned tone, even frame count (all frames paired)
      "aligned-8fr" -> sine(Seq((768.0, 12000.0)), rate),
      // NON-bin-aligned tone (leakage everywhere) — the adversarial case
      "offbin-8fr" -> sine(Seq((777.7, 12000.0)), rate),
      // two tones, odd frame count (pairs + single tail frame)
      "mix-3fr" -> sine(Seq((768.0, 9000.0), (1280.0, 6000.0)), 3 * frame),
      // single frame (pure single path — must be bit-identical)
      "one-frame" -> sine(Seq((768.0, 12000.0)), frame),
      // broadband noise, even frames
      "noise-4fr" -> noise(4 * frame))
    val binHz = rate.toDouble / frame
    fixtures.foreach { case (name, wav) =>
      val p = Multimodal.spectralFeatures(wav, frame).get
      val sg = withSingle(Multimodal.spectralFeatures(wav, frame).get)
      // frame-layout-independent fields: bit-identical by construction
      assert(p.durationSec === sg.durationSec, name)
      assert(p.rms === sg.rms, name)
      assert(p.zcrHz === sg.zcrHz, name)
      // the dominant bin must never flip — the oracle's dominant_hz and
      // the streaming door's integer dominant sums ride on it
      assert(p.dominantHz === sg.dominantHz, s"$name dominant flipped")
      // power-weighted stats: paired-vs-single deviation is FP noise —
      // pin it 6+ orders under the oracle's 4 Hz centroid tolerance
      assert(math.abs(p.centroidHz - sg.centroidHz) <= 1e-6 * math.max(1.0, sg.centroidHz),
        s"$name centroid ${p.centroidHz} vs ${sg.centroidHz}")
      assert(math.abs(p.bandwidthHz - sg.bandwidthHz) <= 1e-6 * math.max(1.0, sg.bandwidthHz),
        s"$name bandwidth ${p.bandwidthHz} vs ${sg.bandwidthHz}")
      // rolloff is a discrete bin edge: allow one knife-edge bin flip
      assert(math.abs(p.rolloffHz - sg.rolloffHz) <= binHz + 1e-9,
        s"$name rolloff ${p.rolloffHz} vs ${sg.rolloffHz}")
      if (name == "one-frame") {
        // single frame never pairs: both paths are the same code path
        assert(p === sg, "one-frame fixture must be bit-identical")
      }
    }
  }
}
