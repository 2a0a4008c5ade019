package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import graft.functions._

/** Probe (r18): per-stage wall/CPU decomposition of geo_union_groups. */
object ProbeUnionGroups2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()

    @volatile var lines = List.empty[String]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val tm = si.taskMetrics
        lines ::= f"stage ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${ms / 1000.0}%7.2fs " +
          f"cpu=${tm.executorCpuTime / 1e9}%7.2fs run=${tm.executorRunTime / 1e3}%7.2fs " +
          f"deser=${tm.executorDeserializeTime / 1e3}%6.2fs shW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB " +
          f"shR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB  ${si.name.take(40)}"
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect(); ()
    }

    def k = col("k")
    def xmin = (k % 1000000).cast("double") * 16.0
    def ymin = (k % 16).cast("double") * 16.0
    def w = lit(1.0) + (k % 13).cast("double") / 4.0
    def h = lit(1.0) + (k % 11).cast("double") / 4.0
    def rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    val dir = "/root/testdata/sf0.1"
    def orders0 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))

    def ug(src: DataFrame): DataFrame =
      src.select((k % 1024).as("grp"), rect.as("g"))
        .groupBy(col("grp")).agg(st_area(st_union_all(col("g"))).as("area"))

    def run(tag: String)(df: => DataFrame): Unit = {
      force(df) // warm
      lines = Nil
      val t0 = System.nanoTime()
      force(df)
      println(f"[probe] $tag forced run: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      Thread.sleep(500)
      lines.reverse.foreach(l => println("[probe] " + l))
    }
    run("as-is")(ug(orders0))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
    run("minPartitionSize=16k")(ug(orders0))
    // and with the map side spread too
    val par = spark.sparkContext.defaultParallelism
    run("spread + 16k")(ug(orders0.repartition(par)))
    spark.stop()
  }
}
