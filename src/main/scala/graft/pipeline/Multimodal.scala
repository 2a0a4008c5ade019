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

  // ------------------------------------------------------------- STUBS
  // Deterministic fakes standing in for actual decoders. ??? -> real impl.

  /** STUB image decode: binary → (width, height, channels). A real build
    * decodes the header (PNG/JPEG). The fake derives plausible dimensions
    * from the byte length and first bytes, deterministically. */
  val decodeImageStub = udf((bytes: Array[Byte]) =>
    if (bytes == null) None
    else {
      // ??? real: ImageIO/libjpeg header parse
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
