package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe + scale-regression guard for the wide-group union key.
  *
  * Probe mode — time the key alone on a (scaled) sf dir with env
  * overrides: `GRAFT_AGGS_COMPACT_AT=256 GRAFT_OHA_FALLBACK=8192
  * GRAFT_USE_OHA=false GRAFT_MAX_PARTITION_BYTES=2097152
  * Test/runMain graft.ProbeUnionCadence /tmp/graft_scale50`.
  *
  * Guard mode — `Test/runMain graft.ProbeUnionCadence <dir> guard`: runs
  * the key AUTO (session defaults — Spark's 128-key ObjectHashAggregate
  * fallback, no graft overrides) and then with the manual 2 MiB
  * input-split knob, and FAILS unless auto ≤ 1.25× knob (headroom for
  * box noise over the measured r11 ratio of ~1.09×). This pins the r11
  * decision that removed the old session-wide fallbackThreshold=8192
  * override: wide-group memory is bounded by Spark's own count-capped
  * map + sort-based fallback, which became cheap when GeoAggs switched
  * its buffer encoders from kryo to catalyst array-of-binary (PERF.md
  * "wide-group aggregation without the knob"). Run on
  * /tmp/graft_scale50 to reproduce the scale numbers; on sf0.1 it
  * verifies no narrow-scale inversion. */
object ProbeUnionCadence {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10"
    val guard = args.length > 1 && args(1) == "guard"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_OHA_FALLBACK", "128"))
      .config("spark.sql.execution.useObjectHashAggregateExec",
        sys.env.getOrElse("GRAFT_USE_OHA", "true"))
      // the (now optional) wide-group memory knob: smaller input splits →
      // partial-agg buffers flush at partition end (PERF.md 50× section)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()
    def run(): (Double, Double, Boolean, Double) =
      Bench.timeWarm(Bench.benchQueries("geo_union_groups")(spark, dir))
    if (guard) {
      val (auto, aSp, _, _) = run()
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2097152")
      val (knob, kSp, _, _) = try run()
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
      println(f"guard: auto=$auto%.2f s (spread $aSp%.2f) " +
        f"knob=$knob%.2f s (spread $kSp%.2f) ratio=${auto / knob}%.3f")
      assert(auto <= 1.25 * knob,
        f"wide-group auto regression: auto $auto%.2f s > 1.25x knob $knob%.2f s — " +
          "the no-knob path (default OHA fallback + catalyst buffer " +
          "encoders) has lost its bound; see PERF.md r11 sweep")
    } else {
      val (sec, spread, noisy, _) = run()
      println(f"compactAt=${sys.env.getOrElse("GRAFT_AGGS_COMPACT_AT", "default")}%s " +
        f"median=$sec%.2f s spread=$spread%.2f noisy=$noisy")
    }
    spark.stop()
  }
}
