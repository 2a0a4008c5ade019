package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe: where does the 10× geo_sjoin auto tier spend time?
  * Run: Test/runMain graft.ProbeSjoin10x /tmp/graft_scale10_r11 */
object ProbeSjoin10x {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale10_r11")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def orders = spark.read.parquet(s"$dir/orders.parquet")
    def k = col("o_orderkey")
    def xmin = (k % 1000000).cast("double") * 16.0
    def ymin = (k % 16).cast("double") * 16.0
    def w = lit(1.0) + (k % 13).cast("double") / 4.0
    def h = lit(1.0) + (k % 11).cast("double") / 4.0
    def rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    def pt = st_point(xmin + w / 2, ymin + h / 2)
    def left = orders.select(k.as("lk"), rect.as("geometry"))
    def right = orders.select(k.as("rk"), pt.as("geometry"))

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm
    left.agg(count(lit(1))).collect()
    right.agg(count(lit(1))).collect()

    (1 to 3).foreach { i =>
      time(s"autoCellSize(left) #$i") {
        graft.join.SpatialJoin.autoCellSize(left, "geometry")
      }
    }
    (1 to 2).foreach { i =>
      time(s"sjoin auto (guarded) #$i") {
        graft.join.SpatialJoin.sjoin(left, right, "contains", "inner")
          .agg(count(lit(1))).collect()
      }
      time(s"sjoinPartitioned c=64 #$i") {
        graft.join.SpatialJoin.sjoinPartitioned(left, right, cellSize = 64.0,
          predicate = "contains").agg(count(lit(1))).collect()
      }
    }
    spark.stop()
  }
}
