package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.functions._

/** Probe (r18): per-stage decomposition of the spatial-join bench keys. */
object ProbeJoinStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()

    @volatile var lines = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val tm = si.taskMetrics
        lines ::= f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=${ms / 1000.0}%7.2fs " +
          f"cpu=${tm.executorCpuTime / 1e9}%7.2fs run=${tm.executorRunTime / 1e3}%7.2fs " +
          f"gc=${tm.jvmGCTime / 1e3}%6.2fs fetch=${tm.shuffleReadMetrics.fetchWaitTime / 1e3}%6.2fs " +
          f"deser=${tm.executorDeserializeTime / 1e3}%6.2fs " +
          f"shW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%7.2fMB shR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%7.2fMB"
      }
    })

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect(); ()
    }
    def run(tag: String)(df: => DataFrame): Unit = {
      force(df) // warm
      lines = Nil
      val t0 = System.nanoTime()
      force(df)
      println(f"[probe] ==== $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      Thread.sleep(400)
      lines.reverse.foreach(l => println("[probe] " + l))
    }

    def k = col("k")
    def xmin = (k % 1000000).cast("double") * 16.0
    def ymin = (k % 16).cast("double") * 16.0
    def w = lit(1.0) + (k % 13).cast("double") / 4.0
    def h = lit(1.0) + (k % 11).cast("double") / 4.0
    def rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    def pt = st_point(xmin + w / 2, ymin + h / 2)
    def nnLx = k.cast("double") * 16.0
    def nnLy = (k % 16).cast("double") * 16.0
    val dir = "/root/testdata/sf0.1"
    def orders0 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))

    run("geo_sjoin (broadcast STRtree)") {
      val left = orders0.select(k.as("lk"), rect.as("geometry"))
      val right = orders0.select(k.as("rk"), pt.as("geometry"))
      graft.join.SpatialJoin.sjoin(left, right, "contains", "inner")
        .agg(count(lit(1)).as("n"))
    }
    run("geo_sjoin_grid") {
      val left = orders0.select(k.as("lk"), rect.as("geometry"))
      val right = orders0.select(k.as("rk"), pt.as("geometry"))
      graft.join.SpatialJoin.sjoinPartitioned(left, right, cellSize = 64.0,
        predicate = "contains").agg(count(lit(1)).as("n"))
    }
    run("geo_sjoin_quadtree") {
      val left = orders0.select(k.as("lk"), rect.as("geometry"))
      val right = orders0.select(k.as("rk"), pt.as("geometry"))
      graft.join.SpatialJoin.sjoinQuadtree(left, right, predicate = "contains")
        .agg(count(lit(1)).as("n"))
    }
    run("geo_sjoin_nearest (partitioned)") {
      val left = orders0.select(k.as("lk"),
        st_point(nnLx + w / 2, nnLy + h / 2).as("geometry"))
      val right = orders0.select(k.as("rk"),
        st_point(nnLx + w, nnLy + h).as("geometry"))
      graft.join.SpatialJoin.sjoinNearestPartitioned(left, right, k = 2,
          maxDistance = 8.0, distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    run("geo_sjoin_nearest_unbounded") {
      val left = orders0.select(k.as("lk"),
        st_point(nnLx + w / 2, nnLy + h / 2).as("geometry"))
      val right = orders0.select(k.as("rk"),
        st_point(nnLx + w, nnLy + h).as("geometry"))
      graft.join.SpatialJoin.sjoinNearestUnbounded(left, right, k = 2,
          distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    spark.stop()
  }
}
