package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs.
  *
  * The Spark-side machinery — schema convention, batch shape, partition
  * sizing, null handling — is real and tested. The media *decoding* itself
  * is STUBBED (no image/audio libraries in this container): each `*Stub`
  * UDF derives a deterministic fake from the bytes, clearly marked, with
  * the exact signature a real decoder (e.g. a JNI libjpeg/ffmpeg binding or
  * a Pandas UDF in PySpark) would have. Swapping in a real decoder touches
  * only the function body.
  */
object Multimodal {

  /** Metadata convention carried next to each media column. */
  val imageMetaFields: Seq[String] = Seq("width", "height", "channels", "format")

  // ------------------------------------------------- REAL header decode

  /** Pure-JVM image header parse: PNG (IHDR), JPEG (SOFn scan), GIF
    * (logical screen descriptor) → (width, height, channels, format).
    * This is a real decoder for the metadata plane — no image libraries
    * needed; pixel decode stays stubbed below. */
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
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
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

  // ------------------------------------------------------------- STUBS
  // Deterministic fakes standing in for actual decoders. ??? -> real impl.

  /** STUB image decode fallback: binary → (width, height, channels) when
    * the real header parse is not applicable. Deterministic fake. */
  val decodeImageStub = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else parseImageHeader(bytes) match {
      case Some((w, h, c, _)) => Some((w, h, c))
      case None =>
        // ??? real: full pixel decode via libjpeg/libpng JNI
        val w = 64 + (math.abs(java.util.Arrays.hashCode(bytes)) % 960)
        val h = 64 + (math.abs(java.util.Arrays.hashCode(bytes) * 31) % 960)
        Some((w, h, 3))
    })

  /** STUB feature extraction: binary → dense feature vector of `dim`.
    * A real build runs a vision encoder; the fake hashes byte windows. */
  def extractFeaturesStub(dim: Int) = udf((bytes: Array[Byte]) =>
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

  /** STUB resize: returns the original bytes with the target size recorded;
    * a real build re-encodes. */
  val resizeStub = udf((bytes: Array[Byte], w: Int, h: Int) =>
    if (bytes == null) None else Some(bytes)) // ??? real: decode+scale+encode

  /** STUB video frame sampling: binary → n byte slices standing in for
    * decoded frames (a real build would ffmpeg-seek). */
  def frameSampleStub(n: Int) = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else {
      // ??? real: ffmpeg keyframe extraction
      val step = math.max(1, bytes.length / math.max(n, 1))
      Some((0 until n).map(i => bytes.slice(i * step, math.min((i + 1) * step, bytes.length))))
    })

  // ------------------------------------------------- real Spark plumbing

  /** Attach decoded image metadata + features to a binary column, with
    * partition sizing appropriate for heavy per-row decode work (many
    * small tasks beat few huge ones when each row costs ~ms). */
  def withImageFeatures(df: DataFrame, binCol: String, featureDim: Int = 64,
      partitions: Int = 0): DataFrame = {
    val sized = if (partitions > 0) df.repartition(partitions) else df
    sized
      .withColumn("image_meta", decodeImageStub(col(binCol)))
      .withColumn("image_meta", struct(
        col("image_meta._1").as("width"),
        col("image_meta._2").as("height"),
        col("image_meta._3").as("channels")))
      .withColumn("features", extractFeaturesStub(featureDim)(col(binCol)))
  }

  /** Explode sampled video frames into one row per frame, preserving the
    * parent id — the shape a frame-level training pipeline consumes. */
  def explodeFrames(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame =
    df.select(col(idCol), posexplode(frameSampleStub(n)(col(binCol))).as(Seq("frame_idx", "frame")))
}
