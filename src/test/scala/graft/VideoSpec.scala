package graft

import graft.pipeline.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** REAL MJPEG-in-AVI video plane: container build/parse, frame sampling,
  * per-frame JPEG decode accuracy. */
class VideoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def makeAvi(w: Int, h: Int, n: Int, r0: Int, step: Int): Array[Byte] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(1).toDF("x").select(Multimodal.makeMjpegAvi(
      lit(w), lit(h), lit(n), lit(r0), lit(r0), lit(r0), lit(step)).as("avi"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  test("AVI header parse and frame chunk walk") {
    val avi = makeAvi(32, 24, 5, 100, 10)
    assert(Multimodal.parseAviHeader(avi).contains((32, 24, 5, 40000)))
    val frames = Multimodal.aviFramePayloads(avi)
    assert(frames.length == 5)
    // each payload is a standalone JPEG (SOI marker) the JDK can decode
    frames.foreach { f =>
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)
      val img = Multimodal.readImage(f)
      assert(img.exists(i => i.getWidth == 32 && i.getHeight == 24))
    }
    assert(Multimodal.parseAviHeader(Array.fill[Byte](100)(7)).isEmpty)
    assert(Multimodal.aviFramePayloads("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("evenly spaced sampling picks frames 0,2,4 of 6") {
    val avi = makeAvi(16, 16, 6, 40, 20) // greys 40,60,...,140
    val sampled = Multimodal.sampleAviFrames(avi, 3).get
    assert(sampled.length == 3)
    val greys = sampled.map { f =>
      val img = Multimodal.readImage(f).get
      (img.getRGB(8, 8) >> 16) & 0xff
    }
    // frames 0, 2, 4 → greys 40, 80, 120 (JPEG-lossy, small tolerance)
    assert(math.abs(greys(0) - 40) < 3 && math.abs(greys(1) - 80) < 3 &&
      math.abs(greys(2) - 120) < 3, s"got $greys")
  }

  test("solid-grey JPEG decode error stays within the oracle tolerance") {
    // sweep the grey range the pipe_video oracle uses (r0 in [0,200),
    // frame colors up to r0+40): max |decoded - encoded| must stay < 3
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val maxErr = spark.range(0, 240, 8).toDF("grey")
      .select(col("grey"), Multimodal.makeImage(
        lit(16), lit(16), col("grey").cast("int"), col("grey").cast("int"),
        col("grey").cast("int"), lit("jpg")).as("jpg"))
      .select(col("grey"), Multimodal.channelMeans(col("jpg")).as("m"))
      .select(abs(element_at(col("m"), 1) * 255 - col("grey")).as("err"))
      .agg(max(col("err"))).collect()(0).getDouble(0)
    assert(maxErr < 3.0, s"max JPEG grey error $maxErr")
  }

  test("explodeFrames yields one decodable row per sampled frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(1, 2).toDF("id")
      .select(col("id"), Multimodal.makeMjpegAvi(lit(8), lit(8), lit(4),
        col("id") * 50, col("id") * 50, col("id") * 50, lit(5)).as("v"))
    val rows = Multimodal.explodeFrames(df, "id", "v", 2).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => Multimodal.readImage(r.getAs[Array[Byte]]("frame")).isDefined))
  }

  test("crafted chunk sizes >= 2^31 terminate the RIFF walkers (no hang)") {
    // a size field of 0xFFFFFFF8 truncates to a negative Int; before the
    // guards the walk step became <= 0 and the task spun forever
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val evil = 0xFFFFFFF8L
    val wav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(evil) ++ new Array[Byte](64)
    val avi = "RIFF".getBytes ++ le32(100) ++ "AVI ".getBytes ++
      "junk".getBytes ++ le32(evil) ++ new Array[Byte](64)
    // completes (returns None / empty) instead of hanging
    assert(Multimodal.parseWavHeader(wav).isEmpty)
    assert(Multimodal.parseAviHeader(avi).isEmpty)
    assert(Multimodal.aviFramePayloads(avi).isEmpty)
    // movi LIST with a malformed inner chunk size also terminates
    val movi = "RIFF".getBytes ++ le32(200) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ le32(80) ++ "movi".getBytes ++
      "00dc".getBytes ++ le32(evil) ++ new Array[Byte](64)
    assert(Multimodal.aviFramePayloads(movi).isEmpty)
  }
}
