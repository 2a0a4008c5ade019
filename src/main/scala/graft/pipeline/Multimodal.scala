package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs.
  *
  * Three planes, two of them REAL with zero external dependencies:
  *  - header metadata (PNG/JPEG/GIF/WAV): hand-rolled byte parsers below;
  *  - pixel/sample plane: the JDK itself ships image codecs
  *    (`javax.imageio` reads/writes PNG, JPEG, GIF, BMP) and WAV PCM is a
  *    flat little-endian sample array — so decode, per-channel statistics,
  *    resize (decode → scale → re-encode) and thumbnail-grid feature
  *    extraction are real implementations, exercised by an exact oracle
  *    query on solid-color fixtures;
  *  - video plane: REAL for MJPEG-in-AVI (RIFF walk to the 'movi' LIST,
  *    per-frame JPEG decode through the JDK codec) — header metadata,
  *    evenly-spaced frame sampling and frame decode are actual
  *    implementations; non-MJPEG codecs (H.26x/VP9) have no JVM decoder
  *    and fall back to a clearly-labeled deterministic stub.
  */
object Multimodal {

  /** Metadata convention carried next to each media column. */
  val imageMetaFields: Seq[String] = Seq("width", "height", "channels", "format")

  // ------------------------------------------------- REAL header decode

  /** Pure-JVM image header parse: PNG (IHDR), JPEG (SOFn scan), GIF
    * (logical screen descriptor) → (width, height, channels, format).
    * This is a real decoder for the metadata plane — no image libraries
    * needed, no pixel work; [[decodeImageMeta]] adds the full-decode
    * fallback for formats this fast path doesn't know. */
  def parseImageHeader(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i).toLong << 24 | u8(i + 1) << 16 | u8(i + 2) << 8 | u8(i + 3)).toInt
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (b.length >= 26 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R') {
      // PNG: sig(8) + IHDR chunk: len(4) type(4) width(4) height(4) depth(1) color(1)
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 3
      }
      Some((be32(16), be32(20), channels, "png"))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn frame header
      var i = 2
      var out: Option[(Int, Int, Int, String)] = None
      while (out.isEmpty && i + 9 < b.length) {
        if (u8(i) != 0xff) return None // desynced — not a valid JPEG stream
        val marker = u8(i + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
        else if ((marker >= 0xc0 && marker <= 0xcf) && marker != 0xc4 &&
                 marker != 0xc8 && marker != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2) components(1)
          out = Some((be16(i + 7), be16(i + 5), u8(i + 9), "jpeg"))
        } else i += 2 + be16(i + 2)
      }
      out
    } else if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F') {
      Some((le16(6), le16(8), 3, "gif"))
    } else None
  }

  /** Image header decode: binary → struct(width, height, channels, format);
    * null for unrecognized bytes. */
  val decodeImage = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else parseImageHeader(bytes))

  /** Pure-JVM WAV (RIFF) header parse → (channels, sampleRate,
    * bitsPerSample, durationMs). Walks RIFF chunks to fmt + data. */
  def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = (u8(i).toLong | u8(i + 1).toLong << 8 |
      u8(i + 2).toLong << 16 | u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) = s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var dataLen = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
      val sz = le32(i + 4)
      if (tag(i, "fmt ") && i + 24 <= b.length)
        fmt = Some((le16(i + 10), le32(i + 12).toInt, le16(i + 22)))
      else if (tag(i, "data")) dataLen = sz
      // a crafted size >= 2^31 truncates negative and would stall the
      // walk forever — treat it as malformed and stop
      if (sz > Int.MaxValue - 16) i = b.length
      else i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    fmt.map { case (ch, rate, bits) =>
      val bytesPerSec = rate.toLong * ch * (bits / 8)
      val ms = if (dataLen >= 0 && bytesPerSec > 0) dataLen * 1000 / bytesPerSec else 0L
      (ch, rate, bits, ms)
    }
  }

  /** Audio header decode: binary → struct(channels, sample_rate, bits,
    * duration_ms); null for unrecognized bytes. */
  val decodeAudio = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else parseWavHeader(bytes))

  /** Minimal WAV header bytes for given params + payload length (fixture
    * generator; no samples, data length only). */
  val makeWavHeader = udf((channels: Int, sampleRate: Int, bits: Int, dataLen: Int) => {
    val out = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.array()
  })

  /** Minimal valid-header PNG bytes for a given size (test/query fixture
    * generator — deterministic, parseable by [[decodeImage]] and any real
    * PNG reader's header stage; CRC left zeroed, no pixel data). */
  val makePngHeader = udf((w: Int, h: Int) => {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC placeholder
    out.array()
  })

  // ---------------------------------------- REAL pixel plane (JDK codecs)

  /** Decompression-bomb bound for full-raster decodes: a few-KB PNG can
    * claim 60000×60000 and expand to ~14 GB of raster, OOMing an executor.
    * 50 MPix ≈ 200 MB of INT_RGB — large enough for any sane training
    * image, small enough to never kill a task. At 100 TB of crawled bytes,
    * adversarial headers are a certainty, not a tail risk. */
  val MaxDecodePixels: Long = 50L * 1000 * 1000

  /** Decode via the JDK's ImageIO codec registry (PNG/JPEG/GIF/BMP readers
    * ship with every JVM); None when no codec applies, when the bytes are
    * corrupt/truncated (readers THROW on recognized-but-damaged streams —
    * one bad blob in a billion-row corpus must not fail the stage), or
    * when the header-declared raster exceeds `maxPixels` (checked via the
    * reader's header stage BEFORE any pixel allocation). */
  def readImage(bytes: Array[Byte],
      maxPixels: Long = MaxDecodePixels): Option[java.awt.image.BufferedImage] =
    try {
      // memory-cache stream, NOT createImageInputStream: the default
      // file-cache variant opens a temp file + RandomAccessFile per call —
      // a per-row UDF would leak handles/tmp-disk between GCs at scale
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            // getWidth/getHeight read only the header — no raster work yet
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > maxPixels) None
            else Option(reader.read(0))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL pixel decode: binary → (width, height, channels) from the
    * decoded raster (not the header). Channel convention: alpha COUNTS
    * (`getNumComponents`), matching [[parseImageHeader]]'s PNG type-6 → 4.
    * NOTE the two planes answer different questions by design: the header
    * reports the ENCODED layout (a palette GIF/PNG is 1 index channel —
    * the header parser prints the palette's color arity instead), this op
    * reports the DECODED raster layout (that same palette image expands
    * to 3, or 4 with a transparent index). */
  val decodePixels = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else readImage(bytes).map(i =>
      (i.getWidth, i.getHeight, i.getColorModel.getNumComponents)))

  /** REAL per-channel means over every decoded pixel, normalized to [0,1]:
    * array(meanR, meanG, meanB). */
  val channelMeans = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else readImage(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Seq(r.toDouble / n / 255.0, g.toDouble / n / 255.0, b.toDouble / n / 255.0)
    })

  /** REAL resize: decode → bilinear scale on a Graphics2D raster →
    * PNG re-encode. Output is a decodable PNG of exactly (w, h). */
  val resizeImage = udf((bytes: Array[Byte], w: Int, h: Int) =>
    if (bytes == null) None
    else readImage(bytes).map { src =>
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(src, 0, 0, w, h, null)
      g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    })

  /** REAL thumbnail-grid feature extraction: gridSide² cells × 3 channel
    * means, row-major, [r,g,b] per cell — the classic tiny-thumbnail
    * embedding used for near-duplicate image mining (dim = gridSide²·3). */
  def extractImageFeatures(gridSide: Int) = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else readImage(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Double](gridSide * gridSide * 3)
      var cy = 0
      while (cy < gridSide) {
        val y0 = cy * h / gridSide; val y1 = math.max((cy + 1) * h / gridSide, y0 + 1)
        var cx = 0
        while (cx < gridSide) {
          val x0 = cx * w / gridSide; val x1 = math.max((cx + 1) * w / gridSide, x0 + 1)
          var r = 0L; var g = 0L; var b = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val p = img.getRGB(x, y)
              r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = math.max((math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0), 1L)
          val base = (cy * gridSide + cx) * 3
          out(base) = r.toDouble / n / 255.0
          out(base + 1) = g.toDouble / n / 255.0
          out(base + 2) = b.toDouble / n / 255.0
          cx += 1
        }
        cy += 1
      }
      out.toSeq
    })

  /** (dataOff, end) byte bounds of the first RIFF `data` chunk — the one
    * chunk walk every PCM reader shares (hardened against ≥2³¹ sizes). */
  private def dataChunkBounds(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def le32(i: Int) = (u8(i).toLong | u8(i + 1).toLong << 8 |
      u8(i + 2).toLong << 16 | u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) = s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var dataOff = -1; var dataLen = 0L
    while (i + 8 <= b.length && dataOff < 0) {
      val sz = le32(i + 4)
      if (tag(i, "data")) { dataOff = i + 8; dataLen = sz }
      else if (sz > Int.MaxValue - 16) i = b.length // malformed size: stop
      else i += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (dataOff < 0) None
    else Some((dataOff, math.min(dataOff + dataLen, b.length.toLong).toInt))
  }

  /** Mono PCM16 WAV assembly: 44-byte header, `fill` writes the `n`
    * 16-bit samples — the one header writer every fixture shares. */
  private def monoWav16(rate: Int, n: Int)(
      fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(rate)
      .putInt(rate * 2).putShort(2.toShort).putShort(16.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    fill(out)
    out.array()
  }

  /** REAL PCM statistics from the WAV data chunk (16-bit LE signed
    * samples): (rms, peak, mean), each normalized by 2¹⁵. */
  def pcmStats(b: Array[Byte]): Option[(Double, Double, Double)] = {
    def u8(i: Int) = b(i) & 0xff
    val bounds = dataChunkBounds(b)
    if (bounds.isEmpty) return None
    val (dataOff, end) = bounds.get
    val n = (end - dataOff) / 2
    if (n <= 0) return Some((0.0, 0.0, 0.0))
    var sum = 0L; var sumSq = 0L; var peak = 0L
    var j = dataOff
    while (j + 1 < end) {
      val s = ((u8(j) | (u8(j + 1) << 8)).toShort).toLong
      sum += s; sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      j += 2
    }
    Some((math.sqrt(sumSq.toDouble / n) / 32768.0,
      peak.toDouble / 32768.0, sum.toDouble / n / 32768.0))
  }

  val audioStats = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else pcmStats(bytes))

  // ------------------------------------- REAL spectral audio plane (DSP)

  /** Mono float samples from a 16-bit LE PCM WAV (channels averaged) +
    * sample rate — the decode step spectral features build on. */
  def pcmSamples(b: Array[Byte]): Option[(Int, Array[Double])] = {
    parseWavHeader(b).flatMap { case (channels, rate, bits, _) =>
      if (bits != 16 || channels < 1) None
      else {
        def u8(i: Int) = b(i) & 0xff
        dataChunkBounds(b).map { case (dataOff, end) =>
          val frames = (end - dataOff) / (2 * channels)
          val mono = new Array[Double](frames)
          var f = 0
          while (f < frames) {
            var c = 0; var acc = 0.0
            while (c < channels) {
              val off = dataOff + 2 * (f * channels + c)
              acc += ((u8(off) | (u8(off + 1) << 8)).toShort).toDouble
              c += 1
            }
            mono(f) = acc / channels / 32768.0
            f += 1
          }
          (rate, mono)
        }
      }
    }
  }

  /** In-repo iterative radix-2 FFT (Cooley-Tukey, bit-reversal order):
    * re/im modified in place; lengths must be equal powers of two. No
    * DSP dependency — ~30 lines beat shipping one. */
  def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"fft: length $n not a power of 2")
    // bit reversal
    var j = 0
    var i = 0
    while (i < n) {
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      var m = n >> 1
      while (m >= 1 && j >= m) { j -= m; m >>= 1 }
      j += m
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k; val bIdx = base + k + len / 2
          val xr = re(bIdx) * cr - im(bIdx) * ci
          val xi = re(bIdx) * ci + im(bIdx) * cr
          re(bIdx) = re(a) - xr; im(bIdx) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Spectral feature vector of a PCM16 WAV: Hann-windowed
    * non-overlapping frames, power spectra averaged across frames.
    * All frequencies in Hz:
    *  - `dominantHz`: argmax bin (DC excluded) — for a pure tone at a
    *    bin-aligned frequency this is EXACT;
    *  - `centroidHz` / `bandwidthHz`: power-weighted mean / stddev of
    *    bin frequencies (Hann leakage is symmetric, so a pure tone's
    *    centroid stays on the tone);
    *  - `rolloffHz`: lowest frequency below which 85% of power lies;
    *  - `zcrHz`: zero-crossing rate / 2 (= fundamental for a tone);
    *  - `rms` amplitude (full scale = 1), `durationSec`.
    * Quality filters cut on these the way text filters cut on
    * stopword/punctuation ratios: silence → rms≈0; hum → dominant at
    * mains frequency; clipped/noisy → bandwidth and rolloff blow up. */
  final case class AudioSpectral(durationSec: Double, rms: Double,
      zcrHz: Double, dominantHz: Double, centroidHz: Double,
      bandwidthHz: Double, rolloffHz: Double)

  private val hannCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  def spectralFeatures(b: Array[Byte], frameSize: Int = 1024): Option[AudioSpectral] =
    pcmSamples(b).map { case (rate, mono) =>
      val n = mono.length
      val durationSec = n.toDouble / rate
      var sumSq = 0.0
      var crossings = 0
      var i = 0
      while (i < n) {
        sumSq += mono(i) * mono(i)
        if (i > 0 && (mono(i) >= 0) != (mono(i - 1) >= 0)) crossings += 1
        i += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      val zcrHz = if (durationSec == 0) 0.0 else crossings / (2.0 * durationSec)
      // averaged Hann power spectrum (zero-pad a short tail-less signal);
      // the window is cached per frameSize and the FFT scratch is reused
      // across frames — this runs per ROW in a scan
      val nBins = frameSize / 2
      val power = new Array[Double](nBins)
      val hann = hannCache.computeIfAbsent(frameSize, fs =>
        Array.tabulate(fs)(j => 0.5 * (1 - math.cos(2 * math.Pi * j / (fs - 1)))))
      val frames = math.max(1, n / frameSize)
      val re = new Array[Double](frameSize)
      val im = new Array[Double](frameSize)
      // TWO real frames per complex FFT (r19): the input is real, so a
      // complex transform of (frame0 + i·frame1) carries both spectra —
      // X0(k) = (Z(k) + conj(Z(N−k)))/2, X1(k) = −i(Z(k) − conj(Z(N−k)))/2
      // (the classic two-for-one real-FFT trick) — halving the butterfly
      // work of the scan's dominant kernel. The untangle is O(N) adds
      // and exact halvings; the FP deviation vs the one-frame-per-FFT
      // path is machine-epsilon-scale (AudioFftEnvelopeSpec pins it to
      // ≤1e-9 relative per bin against a naive DFT and the single-frame
      // path), far inside the oracle's Hz-scale tolerance booleans and
      // the dominant bin's leakage gap. An odd final frame runs the
      // plain single-frame path (bit-identical to pre-r19 for it).
      // Probe toggle: -Dgraft.audio.pairfft.probeOff=true.
      val pairOff = java.lang.Boolean.getBoolean("graft.audio.pairfft.probeOff")
      var fr = 0
      while (fr < frames) {
        val paired = !pairOff && fr + 1 < frames
        var j = 0
        while (j < frameSize) {
          val i0 = fr * frameSize + j
          re(j) = (if (i0 < n) mono(i0) else 0.0) * hann(j)
          im(j) =
            if (!paired) 0.0
            else {
              val i1 = (fr + 1) * frameSize + j
              (if (i1 < n) mono(i1) else 0.0) * hann(j)
            }
          j += 1
        }
        fftInPlace(re, im)
        var k = 0
        if (paired) {
          while (k < nBins) {
            val kn = if (k == 0) 0 else frameSize - k
            val x0r = 0.5 * (re(k) + re(kn)); val x0i = 0.5 * (im(k) - im(kn))
            val x1r = 0.5 * (im(k) + im(kn)); val x1i = 0.5 * (re(kn) - re(k))
            power(k) += x0r * x0r + x0i * x0i + x1r * x1r + x1i * x1i
            k += 1
          }
        } else {
          while (k < nBins) { power(k) += re(k) * re(k) + im(k) * im(k); k += 1 }
        }
        fr += (if (paired) 2 else 1)
      }
      val binHz = rate.toDouble / frameSize
      var total = 0.0
      var k = 1
      while (k < nBins) { total += power(k); k += 1 } // DC excluded
      if (total <= 0)
        AudioSpectral(durationSec, rms, zcrHz, 0.0, 0.0, 0.0, 0.0)
      else {
        var best = 1; var centNum = 0.0
        k = 1
        while (k < nBins) {
          if (power(k) > power(best)) best = k
          centNum += k * binHz * power(k)
          k += 1
        }
        val centroid = centNum / total
        var varNum = 0.0
        k = 1
        while (k < nBins) {
          val d = k * binHz - centroid
          varNum += d * d * power(k)
          k += 1
        }
        var cum = 0.0
        var roll = 1
        k = 1
        while (k < nBins && cum < 0.85 * total) { cum += power(k); roll = k; k += 1 }
        AudioSpectral(durationSec, rms, zcrHz, best * binHz, centroid,
          math.sqrt(varNum / total), roll * binHz)
      }
    }

  def audioSpectral(frameSize: Int = 1024) = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else spectralFeatures(bytes, frameSize))

  /** Sample-wise sum of two PCM16 mono WAVs (same rate; length = the
    * shorter), clipped to 16-bit — superposition fixtures for the
    * spectral plane. */
  val pcmMix = udf((a: Array[Byte], b: Array[Byte]) => {
    (pcmSamples(a), pcmSamples(b)) match {
      case (Some((ra, xa)), Some((rb, xb))) if ra == rb =>
        val n = math.min(xa.length, xb.length)
        monoWav16(ra, n) { out =>
          var i = 0
          while (i < n) {
            val s = math.max(-32768.0, math.min(32767.0, (xa(i) + xb(i)) * 32768.0))
            out.putShort(math.round(s).toShort)
            i += 1
          }
        }
      case _ => null
    }
  })

  /** Fixture: mono 16-bit WAV sine — `amp`·sin(2π·freq·t) at
    * `sampleRate` for `n` samples. A bin-aligned `freq`
    * (= m·rate/frameSize) makes `dominantHz` exact. */
  val makeWavSine = udf((n: Int, sampleRate: Int, freq: Double, amp: Int) =>
    monoWav16(sampleRate, n) { out =>
      var i = 0
      while (i < n) {
        out.putShort(math.round(amp * math.sin(2 * math.Pi * freq * i / sampleRate)).toShort)
        i += 1
      }
    })

  /** Fixture: solid-color RGB image through the REAL encoder
    * (`fmt` = "png" | "jpg" | "gif" | "bmp"). */
  val makeImage = udf((w: Int, h: Int, r: Int, g: Int, b: Int, fmt: String) => {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    encodeImg(img, fmt)
  })

  /** Shared fixture kernels: one gradient-raster formula (a fix here fixes
    * every gradient fixture — image and video planes must not drift) and
    * one encode idiom. */
  private def gradFrame(w: Int, h: Int, fr: Int, fg: Int, fb: Int,
      phase: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * fr + y + phase) % 256
        val g = (y * fg + x + phase) % 256
        val b = ((x + y) * fb + phase) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeImg(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Fixture: deterministic NON-solid gradient raster (per-channel spatial
    * frequencies `fr`/`fg`/`fb`), losslessly representable in PNG and BMP.
    * Distinct frequency triples give distinct pooled-feature vectors where
    * solid colors could alias (two grays are parallel in grid space). */
  val makeGradImage = udf((w: Int, h: Int, fr: Int, fg: Int, fb: Int, fmt: String) =>
    encodeImg(gradFrame(w, h, fr, fg, fb, 0), fmt))

  /** Fixture: mono 16-bit WAV with `n` constant-amplitude samples —
    * rms = peak = mean = amp/2¹⁵ exactly. */
  val makeWavConst = udf((n: Int, sampleRate: Int, amp: Int) =>
    monoWav16(sampleRate, n) { out =>
      var i = 0
      while (i < n) { out.putShort(amp.toShort); i += 1 }
    })

  // ------------------------------------- REAL video plane (MJPEG-in-AVI)
  // AVI is a RIFF container; Motion-JPEG stores each frame as a complete
  // JPEG inside '00dc' chunks of the 'movi' LIST, so the JDK's JPEG codec
  // decodes sampled frames with no external video library. Other codecs
  // (H.26x etc.) have no JVM decoder — those fall through to the labeled
  // stub below, which is the documented remaining gap.

  /** AVI main header: walk RIFF to LIST/hdrl/avih → (width, height,
    * totalFrames, microSecPerFrame). */
  def parseAviHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def le32(i: Int) = (u8(i).toLong | u8(i + 1).toLong << 8 |
      u8(i + 2).toLong << 16 | u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) = s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (b.length < 64 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var i = 12
    while (i + 8 <= b.length) {
      val sz = le32(i + 4).toInt
      if (sz < 0) return None // size >= 2^31: malformed, would stall
      if (tag(i, "LIST") && i + 12 <= b.length && tag(i + 8, "hdrl")) {
        // avih is the first chunk of hdrl: 'avih' size then the header body
        val a = i + 12
        if (a + 8 + 40 <= b.length && tag(a, "avih"))
          return Some((le32(a + 8 + 32).toInt, le32(a + 8 + 36).toInt,
            le32(a + 8 + 16).toInt, le32(a + 8).toInt))
        return None
      }
      i += 8 + sz + (sz & 1)
    }
    None
  }

  /** All video frame payloads ('NNdc'/'NNdb' chunks of the 'movi' LIST),
    * in stream order. For MJPEG each payload is a standalone JPEG. */
  def aviFramePayloads(b: Array[Byte]): Seq[Array[Byte]] = {
    def u8(i: Int) = b(i) & 0xff
    def le32(i: Int) = (u8(i).toLong | u8(i + 1).toLong << 8 |
      u8(i + 2).toLong << 16 | u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) = s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var i = 12
    while (i + 8 <= b.length) {
      val sz = le32(i + 4).toInt
      if (sz < 0) return out.toSeq // malformed size: stop the walk
      if (tag(i, "LIST") && i + 12 <= b.length && tag(i + 8, "movi")) {
        var j = i + 12
        val end = math.min(i + 8 + sz, b.length)
        while (j + 8 <= end) {
          val csz = le32(j + 4).toInt
          if (csz < 0) { j = end } // malformed chunk size: stop
          else {
            val isFrame = u8(j + 2) == 'd' && (u8(j + 3) == 'c' || u8(j + 3) == 'b')
            if (isFrame && csz > 0 && j + 8 + csz <= end)
              out += java.util.Arrays.copyOfRange(b, j + 8, j + 8 + csz)
            j += 8 + csz + (csz & 1)
          }
        }
      }
      i += 8 + sz + (sz & 1)
    }
    out.toSeq
  }

  /** REAL frame sampling for MJPEG AVI: n evenly spaced frames (indexes
    * floor(i·total/n)), each a standalone decodable JPEG. Non-AVI bytes →
    * None (callers may fall back to [[frameSampleStub]]). */
  def sampleAviFrames(bytes: Array[Byte], n: Int): Option[Seq[Array[Byte]]] = {
    val frames = aviFramePayloads(bytes)
    if (frames.isEmpty) None
    else Some((0 until n).map(i => frames(i * frames.length / math.max(n, 1))))
  }

  def frameSample(n: Int) = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else sampleAviFrames(bytes, n))

  /** Video metadata decode: binary → (width, height, n_frames, fps). */
  val decodeVideo = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else parseAviHeader(bytes).map { case (w, h, frames, uspf) =>
      (w, h, frames, if (uspf > 0) 1e6 / uspf else 0.0)
    })

  /** Fixture: a real MJPEG AVI — RIFF('AVI ' LIST(hdrl avih
    * LIST(strl strh strf)) LIST(movi '00dc'×n)), each frame a solid-color
    * JPEG from the JDK encoder; colors stride by `colorStep` from
    * (r0,g0,b0). Playable layout per the public AVI/RIFF spec. */
  val makeMjpegAvi = udf((w: Int, h: Int, nFrames: Int, r0: Int, g0: Int,
      b0: Int, colorStep: Int) =>
    muxMjpegAvi(w, h, (0 until nFrames).map { idx =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (((r0 + idx * colorStep) & 0xff) << 16) |
        (((g0 + idx * colorStep) & 0xff) << 8) | ((b0 + idx * colorStep) & 0xff)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      encodeImg(img, "jpg")
    }))

  /** Fixture: MJPEG AVI of GRADIENT frames (per-channel spatial
    * frequencies + a per-frame phase walk, `phase0` offsetting every
    * pixel value) — structurally distinct per frequency triple where
    * solid frames alias (two solid videos with proportional RGB have
    * PARALLEL pooled features), and robust to a ±1 phase shift, which
    * makes `phase0`/`phase0+1` pairs the "lightly transcoded twin"
    * fixture for video near-dup. */
  val makeGradMjpegAvi = udf((w: Int, h: Int, nFrames: Int, fr: Int, fg: Int,
      fb: Int, phase0: Int) =>
    muxMjpegAvi(w, h, (0 until nFrames).map(idx =>
      encodeImg(gradFrame(w, h, fr, fg, fb, phase0 + idx * 4), "jpg"))))

  /** REAL MJPEG transcode: decode every frame through the JDK codec,
    * re-encode, re-mux — the "same video, re-uploaded" transformation
    * (double JPEG quantization, fresh container bytes). None when the
    * container isn't AVI or no frame decodes. Pixel-space video features
    * survive this where any byte hash changes completely. */
  val transcodeMjpegAvi = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else parseAviHeader(bytes).flatMap { case (w, h, _, _) =>
      val frames = aviFramePayloads(bytes).flatMap(f => readImage(f))
        .map(encodeImg(_, "jpg"))
      if (frames.isEmpty) None else Some(muxMjpegAvi(w, h, frames))
    })

  /** The RIFF/AVI container build shared by the MJPEG fixtures: RIFF('AVI '
    * LIST(hdrl avih LIST(strl strh strf)) LIST(movi '00dc'×n)), playable
    * layout per the public AVI spec. */
  private def muxMjpegAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val nFrames = frames.length
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      out.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40000) // µs per frame (25 fps)
        .putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h)
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(25) // rate 25/1
        .putInt(0).putInt(nFrames).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val strf = { // BITMAPINFOHEADER
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
        .put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  // ------------------------------------- REAL image meta + feature plane

  /** REAL image metadata with a full-decoder fallback: the header fast
    * path (PNG/JPEG/GIF byte parsers — no pixel work) first, then an
    * actual `ImageIO` decode for anything else the JDK codecs read (BMP,
    * WBMP, header-damaged-but-decodable streams). None when no codec
    * applies — dimensions are never fabricated. Both paths count alpha as
    * a channel (header: PNG type 6 → 4; fallback: `getNumComponents`).
    * The formats with a header fast path (PNG/JPEG/GIF) ALWAYS take it,
    * so a given format's channel convention is stable; the decode
    * fallback only ever serves formats the fast path doesn't know. */
  val decodeImageMeta = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else parseImageHeader(bytes) match {
      case Some((w, h, c, _)) => Some((w, h, c))
      case None => readImage(bytes).map(i =>
        (i.getWidth, i.getHeight, i.getColorModel.getNumComponents))
    })

  /** REAL pixel-space image embedding of exactly `dim` dims: a
    * side²·3-dim pooled RGB thumbnail grid (side = ⌊√(dim/3)⌋) plus a
    * grayscale histogram over the remaining `dim − side²·3` buckets
    * (pixel-count normalized). Deterministic and offline, and — unlike
    * any byte-hash fake — stable under RE-ENCODING: the same picture as
    * PNG/JPEG/BMP or after a resize lands within codec noise, which is
    * exactly what image SemDeDup / embedding near-dup mining needs.
    * None when no JDK codec decodes the bytes (a vision-ENCODER
    * embedding stays the one labeled stub, [[visionEmbeddingStub]]). */
  def imageFeatures(dim: Int) = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else imageFeatureVec(bytes, dim))

  /** [[imageFeatures]]' kernel as a plain function — shared with the
    * per-frame video plane ([[videoFeatures]]). */
  def imageFeatureVec(bytes: Array[Byte], dim: Int): Option[Seq[Float]] =
    readImage(bytes).map { img =>
      val side = math.floor(math.sqrt(dim / 3.0)).toInt
      val gridDims = side * side * 3
      val histDims = dim - gridDims
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Float](dim)
      val hist = new Array[Long](math.max(histDims, 1))
      // one pass: accumulate per-cell RGB sums and the gray histogram
      val sums = new Array[Long](math.max(gridDims, 1))
      val counts = new Array[Long](math.max(side * side, 1))
      var y = 0
      while (y < h) {
        val cy = math.min(if (side > 0) y * side / h else 0, side - 1)
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          if (side > 0) {
            val cx = math.min(x * side / w, side - 1)
            val cell = cy * side + cx
            sums(cell * 3) += r; sums(cell * 3 + 1) += g; sums(cell * 3 + 2) += b
            counts(cell) += 1
          }
          if (histDims > 0) hist(((r + g + b) / 3) * histDims / 256) += 1
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < side * side) {
        val n = math.max(counts(c), 1L)
        out(c * 3) = (sums(c * 3).toDouble / n / 255.0).toFloat
        out(c * 3 + 1) = (sums(c * 3 + 1).toDouble / n / 255.0).toFloat
        out(c * 3 + 2) = (sums(c * 3 + 2).toDouble / n / 255.0).toFloat
        c += 1
      }
      val nPix = math.max(w.toLong * h, 1L)
      var k = 0
      while (k < histDims) {
        out(gridDims + k) = (hist(k).toDouble / nPix).toFloat
        k += 1
      }
      out.toSeq
    }

  /** REAL video-level embedding: sample `nFrames` evenly from an MJPEG
    * AVI, extract per-frame pixel-space [[imageFeatureVec]]s, mean-pool
    * across frames — the temporal pooling used for video near-dup mining
    * (re-muxed / lightly-transcoded copies land close; different content
    * does not). None when the container isn't AVI or no frame decodes. */
  def videoFeatures(dim: Int, nFrames: Int = 4) = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else sampleAviFrames(bytes, nFrames).flatMap { frames =>
      val feats = frames.flatMap(f => imageFeatureVec(f, dim))
      if (feats.isEmpty) None
      else {
        val out = new Array[Float](dim)
        feats.foreach { f =>
          var i = 0
          while (i < dim) { out(i) += f(i); i += 1 }
        }
        var i = 0
        while (i < dim) { out(i) /= feats.length; i += 1 }
        Some(out.toSeq)
      }
    })

  // ------------------------------------------------------------- STUBS
  // Deterministic fakes standing in for actual decoders. ??? -> real impl.
  // As of round 12 this boundary is ONLY what genuinely cannot run on a
  // bare JVM: vision-ENCODER embeddings (no offline weights) and
  // non-MJPEG video codecs (no JVM decoder). Image resize, pixel decode,
  // metadata fallback and pixel-space features are all real above.

  /** STUB vision-encoder embedding: binary → dense vector of `dim`.
    * A real build runs a vision encoder (CLIP-class weights — none can
    * ship offline); the fake hashes byte windows. For a real, offline,
    * re-encoding-robust image vector use [[imageFeatures]] instead. */
  def visionEmbeddingStub(dim: Int) = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else {
      // ??? real: vision-encoder embedding
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val w = if (bytes.isEmpty) i else bytes(i % bytes.length).toInt
        out(i) = ((w * 2654435761L + i * 40503L) % 1000L) / 1000.0f
        i += 1
      }
      Some(out.toSeq)
    })

  /** Video frame sampling. MJPEG AVI takes the REAL path
    * ([[sampleAviFrames]]); other containers (H.26x/VP9) have no JVM
    * decoder, and by default (`strict = true`) yield null — a row of
    * fabricated byte-slice "frames" carries no runtime signal that it
    * isn't video, so the fake is an explicit opt-in, never a silent
    * fallback. `strict = false` restores the STUB byte slices for
    * plumbing tests that only exercise shape, not content. */
  def frameSampleStub(n: Int, strict: Boolean = true) = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else sampleAviFrames(bytes, n).orElse {
      if (strict) None
      else {
        // ??? real: ffmpeg keyframe extraction for non-MJPEG codecs
        val step = math.max(1, bytes.length / math.max(n, 1))
        Some((0 until n).map(i => bytes.slice(i * step, math.min((i + 1) * step, bytes.length))))
      }
    })

  // ------------------------------------------------- real Spark plumbing

  /** Attach decoded image metadata + pixel-space features to a binary
    * column, with partition sizing appropriate for heavy per-row decode
    * work (many small tasks beat few huge ones when each row costs ~ms).
    * Both columns are REAL decoders now: undecodable bytes give null
    * meta/features rather than fabricated values. */
  def withImageFeatures(df: DataFrame, binCol: String, featureDim: Int = 64,
      partitions: Int = 0): DataFrame = {
    val sized = if (partitions > 0) df.repartition(partitions) else df
    sized
      .withColumn("image_meta", decodeImageMeta(col(binCol)))
      .withColumn("image_meta", struct(
        col("image_meta._1").as("width"),
        col("image_meta._2").as("height"),
        col("image_meta._3").as("channels")))
      .withColumn("features", imageFeatures(featureDim)(col(binCol)))
  }

  /** Explode sampled video frames into one row per frame, preserving the
    * parent id — the shape a frame-level training pipeline consumes.
    * MJPEG AVI frames decode for real; by default (`strict = true`)
    * undecodable containers drop out honestly (posexplode of a null
    * sample list emits no rows). `strict = false` opts into the
    * byte-slice stub for shape-only plumbing tests. */
  def explodeFrames(df: DataFrame, idCol: String, binCol: String, n: Int,
      strict: Boolean = true): DataFrame =
    df.select(col(idCol),
      posexplode(frameSampleStub(n, strict)(col(binCol))).as(Seq("frame_idx", "frame")))

  /** Distributed image near-duplicate mining, end to end: decode →
    * pixel-space [[imageFeatures]] → sign-LSH embedding near-dup
    * ([[Dedup.nearDupEmbedding]]: per-table bucket equi-join with
    * hot-bucket caps, exact-cosine verify — never all-pairs). Because the
    * features are computed from PIXELS, the same picture re-encoded
    * (PNG↔BMP, or resized) collides, which a byte-hash never could.
    * Undecodable/corrupt bytes yield null features and are dropped — they
    * cannot be near anything. Returns (id_a, id_b, cosine). */
  def nearDupImages(df: DataFrame, idCol: String, binCol: String,
      threshold: Double, dim: Int = 64, bits: Int = 0,
      tables: Int = 0): DataFrame =
    Dedup.nearDupEmbedding(
      df.select(col(idCol), imageFeatures(dim)(col(binCol)).as("__feat"))
        .filter(col("__feat").isNotNull),
      idCol, "__feat", threshold, bits, tables)

  /** Distributed VIDEO near-duplicate mining: [[videoFeatures]] (sampled
    * frames → pooled pixel features) through the same sign-LSH bucketed
    * path as [[nearDupImages]]. Non-AVI / undecodable rows drop out. */
  def nearDupVideos(df: DataFrame, idCol: String, binCol: String,
      threshold: Double, dim: Int = 64, nFrames: Int = 4, bits: Int = 0,
      tables: Int = 0): DataFrame =
    Dedup.nearDupEmbedding(
      df.select(col(idCol), videoFeatures(dim, nFrames)(col(binCol)).as("__feat"))
        .filter(col("__feat").isNotNull),
      idCol, "__feat", threshold, bits, tables)
}
