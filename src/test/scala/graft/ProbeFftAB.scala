package graft

import graft.pipeline.Multimodal

/** Probe (r19): kernel-level A/B of the paired real-frame FFT vs the
  * single-frame path — pure JVM timing of spectralFeatures, no Spark.
  * A = -Dgraft.audio.pairfft.probeOff (pre-r19), B = paired (r19). */
object ProbeFftAB {
  def main(args: Array[String]): Unit = {
    val rate = 8192; val frame = 1024
    val nSamples = rate // 8 frames, the bench shape
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + 2 * nSamples); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(2 * nSamples)
    var i = 0
    while (i < nSamples) {
      bb.putShort((12000 * math.sin(2 * math.Pi * 768.0 * i / rate)).toShort); i += 1
    }
    val wav = bb.array()
    def timeIt(label: String, single: Boolean): Double = {
      if (single) sys.props("graft.audio.pairfft.probeOff") = "true"
      else sys.props.remove("graft.audio.pairfft.probeOff")
      // warm
      (1 to 2000).foreach(_ => Multimodal.spectralFeatures(wav, frame))
      val t0 = System.nanoTime()
      (1 to 10000).foreach(_ => Multimodal.spectralFeatures(wav, frame))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-12s ${sec}%6.3f s / 10k calls")
      sec
    }
    // alternate to cancel drift
    val a1 = timeIt("single", single = true)
    val b1 = timeIt("paired", single = false)
    val a2 = timeIt("single", single = true)
    val b2 = timeIt("paired", single = false)
    sys.props.remove("graft.audio.pairfft.probeOff")
    println(f"[probe] paired/single = ${(b1 + b2) / (a1 + a2)}%5.3f")
  }
}
