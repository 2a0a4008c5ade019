package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deployment defaults for graft sessions — the engine-owned home of two
  * levers that previously lived only in the bench harness (r19, VERDICT
  * r18 #6): library users should not have to rediscover them from
  * Bench.scala.
  *
  * 1. **AQE partition-coalescing floor.** Adaptive coalescing prices
  *    post-shuffle partitions by BYTES
  *    (`spark.sql.adaptive.advisoryPartitionSizeInBytes`, 64 MB default
  *    target), but geometry and signature rows here are ~30-100 bytes
  *    each while carrying micro- to milliseconds of kernel CPU: a
  *    kernel-bound stage whose whole input is a few MB coalesces to a
  *    handful of tasks and runs serial (measured: a 1024-group
  *    `st_union_all` final stage at 3 tasks over 8.3 CPU-seconds — 4.6 s
  *    wall → 1.4 s with the floor at 16k). Flooring
  *    `coalescePartitions.minPartitionSize` at 16k keeps
  *    parallelism-first coalescing ON (tiny tails still merge) while
  *    stopping the byte-costing from serializing compute-dense stages.
  *    At cluster scale post-shuffle partitions dwarf the floor, so the
  *    setting self-neutralizes exactly where it should.
  *
  * 2. **Unsplittable-input spreading** ([[spreadUnsplittable]]): a
  *    parquet ROW GROUP is the atomic split unit — no file-split conf
  *    can parallelize a single-row-group file, and Spark's byte-range
  *    planner happily reports ~cores splits of which all but one are
  *    EMPTY. A scan-shaped query over such an input runs its whole
  *    per-row compute in one task. The fix is one round-robin exchange
  *    of the narrow input, applied ONLY when the file count is below the
  *    session's parallelism (many-file inputs — the cluster-scale shape —
  *    pass through untouched).
  *
  * Both are conventions, not magic: `builder()` returns a plain
  * `SparkSession.Builder`, so every setting remains overridable by the
  * caller or spark-submit conf.
  */
object GraftSession {

  /** The AQE coalescing floor rationale above, as the conf pair. */
  val CoalesceFloorKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
  val CoalesceFloorDefault = "16k"

  /** A session builder with graft's extensions (spatial planner strategy,
    * bbox/fusion/bucketed-join rules, SQL function registration) and the
    * kernel-aware AQE floor pre-applied. Timezone is pinned to UTC — the
    * temporal functions' oracle-parity convention. */
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config(CoalesceFloorKey,
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", CoalesceFloorDefault))
      .config("spark.sql.session.timeZone", "UTC")

  /** Round-robin-repartition a scan whose file count is below the
    * session's default parallelism — the documented recipe for
    * single-large-unsplittable-file inputs (one row group, gzip text,
    * a single shard). The exchange moves the narrow input once and buys
    * cores× on every downstream per-row kernel; on multi-file inputs
    * (≥ parallelism files) it is a no-op, so the call is safe to leave
    * in scale-varying pipelines. Frames with no file-based leaves (in
    * memory, generated) pass through — their parallelism is already
    * whatever the producer chose. */
  def spreadUnsplittable(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files > 0 && files < par) df.repartition(par) else df
  }
}
