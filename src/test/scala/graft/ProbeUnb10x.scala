package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe (r17): isolate the unbounded nearest keys at the 10×
  * synthetic scale (BenchScale read geo_sjoin_nearest_unbounded at
  * 27.6 s vs the 16.5 s PERF.md r16 records, in a calib-quiet window) —
  * one key per fresh JVM, no preceding keys' cache pressure, so a full
  * BenchScale ordering artifact can't masquerade as a regression.
  *
  * Run: SPARK_GRAFT_SCALE_DIR=/tmp/graft_scale10 Test/runMain graft.ProbeUnb10x
  */
object ProbeUnb10x {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
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
    val fn = Bench.benchQueries("geo_sjoin_nearest_unbounded")
    val (med, spread, noisy, mn) = Bench.timeWarm(fn(spark, dir))
    println(f"[ProbeUnb10x] geo_sjoin_nearest_unbounded (isolated, $dir): " +
      f"med $med%.2f spread $spread%.2f noisy $noisy min $mn%.2f")
    spark.stop()
  }
}
