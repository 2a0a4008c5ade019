package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off margin probe for the pipe_video_dedup fixture: twin min
  * cosine vs cross max cosine, to pick a threshold with a wide margin.
  * Run: Test/runMain graft.ProbeVideoDedup */
object ProbeVideoDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{Multimodal, Similarity}
    val base = spark.range(500).select(col("id").as("doc_id"))
      .withColumn("fr", (col("doc_id") % 8 + 1).cast("int"))
      .withColumn("fg", ((col("doc_id") / 8) % 8 + 1).cast("int"))
      .withColumn("fb", ((col("doc_id") / 64) % 8 + 1).cast("int"))
    val a = base.select(col("doc_id").as("vid_id"),
      Multimodal.makeGradMjpegAvi(lit(24), lit(16), lit(6),
        col("fr"), col("fg"), col("fb"), lit(0)).as("avi"))
    val b = a.select((col("vid_id") + 10000).as("vid_id"),
      Multimodal.transcodeMjpegAvi(col("avi")).as("avi"))
    val feats = a.unionAll(b).select(col("vid_id"),
      Multimodal.videoFeatures(64, 3)(col("avi")).cast("array<double>").as("v"))
    val l = feats.select(col("vid_id").as("ia"), col("v").as("va"))
    val r = feats.select(col("vid_id").as("ib"), col("v").as("vb"))
    val pairs = l.join(r, col("ia") < col("ib"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .withColumn("twin", col("ib") - col("ia") === 10000)
    pairs.groupBy("twin").agg(min("cos").as("min_cos"), max("cos").as("max_cos"),
      count(lit(1)).as("n")).orderBy("twin").show(false)
    spark.stop()
  }
}
