package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r14, VERDICT r13 item 5): price a deterministic-default
  * `difference_all`.
  *
  * The verdict's candidate — folding in `monotonically_increasing_id()`
  * order by default — cannot be a drop-in: Spark's analyzer rejects
  * nondeterministic expressions inside aggregate-function arguments, so
  * `st_difference_all(g)` cannot inject the id at the agg site; the id
  * must be stamped by a `withColumn` BEFORE the aggregation (this probe
  * verifies the rejection too). What CAN be priced is that explicit
  * two-step (`withColumn("_mid", monotonically_increasing_id())` →
  * `st_difference_all_ordered(g, _mid)`) against the plain unordered
  * default, on the geo_union_groups workload shape (1024 wide groups at
  * sf0.1; arg-selectable 10× dir), ALTERNATING in-run.
  *
  * Run: Test/runMain graft.ProbeDiffDefault [sfDir]
  */
object ProbeDiffDefault {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = col("k")
    val xmin = (k % 1000000).cast("double") * 16.0
    val ymin = (k % 16).cast("double") * 16.0
    val w = lit(1.0) + (k % 13).cast("double") / 4.0
    val h = lit(1.0) + (k % 11).cast("double") / 4.0
    val rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    def base = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .select((k % 1024).as("grp"), rect.as("g"))

    // the analyzer rejection that forecloses the drop-in default
    val rejected =
      try {
        base.groupBy(col("grp"))
          .agg(st_difference_all_ordered(col("g"), monotonically_increasing_id()))
          .queryExecution.analyzed
        false
      } catch { case _: org.apache.spark.sql.AnalysisException => true }
    println(s"[probe] nondeterministic id inside agg args rejected by analyzer: $rejected")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def plain(): Unit = base.groupBy(col("grp"))
      .agg(st_area(st_difference_all(col("g"))).as("a"))
      .agg(sum(col("a"))).collect()
    def ordered(): Unit = base
      .withColumn("_mid", monotonically_increasing_id())
      .groupBy(col("grp"))
      .agg(st_area(st_difference_all_ordered(col("g"), col("_mid"))).as("a"))
      .agg(sum(col("a"))).collect()

    plain(); ordered() // warm
    val (p, o) = (1 to 3).map(_ => (time(plain()), time(ordered()))).unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(1)
    println(f"[probe] dir=$dir plain median=${med(p)}%.3f s " +
      f"(${p.map(x => f"$x%.3f").mkString(", ")}) | ordered(mid) median=${med(o)}%.3f s " +
      f"(${o.map(x => f"$x%.3f").mkString(", ")}) | ratio=${med(o) / med(p)}%.3f")
    spark.stop()
  }
}
