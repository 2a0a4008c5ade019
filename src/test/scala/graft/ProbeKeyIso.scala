package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe (r17): measure ONE bench key in a fresh JVM with
  * nothing run before it — the full bench runs 29 keys in one session,
  * and ProbeUnb10x showed that late-running keys can read up to ~1.6×
  * their isolated cost from accumulated cache/ordering pressure. The
  * r17 "environment cluster" (pipe_audio / pipe_ann_ivfpq /
  * geo_scan_overlay at 1.15–1.45× their r15 levels in calib-quiet
  * windows) needs the same adjudication: isolated ≈ r15 → bench
  * ordering pressure; isolated still high → genuinely the box.
  *
  * Run: SPARK_GRAFT_KEY=pipe_audio [SPARK_GRAFT_SF_DIR=…]
  *      Test/runMain graft.ProbeKeyIso
  */
object ProbeKeyIso {
  def main(args: Array[String]): Unit = {
    val key = sys.env.getOrElse("SPARK_GRAFT_KEY", "pipe_audio")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the same parallelism knob Bench.main honors — an isolated reading
    // at different parallelism would be incomparable to the bench run
    // it adjudicates (review r17)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()
    val fn = Bench.benchQueries(key)
    val pinUnfused = key.endsWith("_udf") || key.endsWith("_unfused")
    if (pinUnfused) spark.conf.set("spark.graft.fuse", "false")
    val (med, spread, noisy, mn) = Bench.timeWarm(fn(spark, dir))
    println(f"[ProbeKeyIso] $key (isolated, $dir): med $med%.2f " +
      f"spread $spread%.2f noisy $noisy min $mn%.2f")
    spark.stop()
  }
}
