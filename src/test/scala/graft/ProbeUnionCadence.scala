package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe: time the wide-group union key alone on a (scaled) sf
  * dir — `GRAFT_AGGS_COMPACT_AT=256 Test/runMain graft.ProbeUnionCadence
  * /tmp/graft_scale10`. Prints the timeWarm triple median + spread. */
object ProbeUnionCadence {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8192")
      // the documented wide-group memory knob: smaller input splits →
      // partial-agg buffers flush at partition end (PERF.md 50× section)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()
    val (sec, spread, noisy) =
      Bench.timeWarm(Bench.benchQueries("geo_union_groups")(spark, dir))
    println(f"compactAt=${sys.env.getOrElse("GRAFT_AGGS_COMPACT_AT", "default")}%s " +
      f"median=$sec%.2f s spread=$spread%.2f noisy=$noisy")
    spark.stop()
  }
}
