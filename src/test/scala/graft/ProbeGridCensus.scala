package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r14): what does the grid tier's pair-split RIGHT census
  * cost on a workload with NO hot cells? sjoinPartitioned's pair-split
  * default adds one counting pass over the right extraction per join —
  * pure planning tax when nothing is hot (the bench geo_sjoin_grid
  * shape: ~1 row per cell). Alternates pairsPerTask = default (census
  * on) vs Long.MaxValue (pre-r14 shape) on the Bench grid fixture at
  * the given sf dir.
  *
  * Run: Test/runMain graft.ProbeGridCensus [sfDir]
  */
object ProbeGridCensus {
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
    def orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
    val left = orders.select(k.as("lk"),
      st_rectangle(xmin, ymin, xmin + w, ymin + h).as("geometry"))
    val right = orders.select(k.as("rk"),
      st_point(xmin + w / 2, ymin + h / 2).as("geometry"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def joinOnce(ppt: Long): Long = graft.join.SpatialJoin.sjoinPartitioned(
      left, right, 16.0, "contains", pairsPerTask = ppt).count()

    val warmOn = joinOnce(graft.join.SpatialJoin.GridPairsPerTask)
    val warmOff = joinOnce(Long.MaxValue)
    assert(warmOn == warmOff)
    val (onS, offS) = (1 to 3).map { _ =>
      (time(joinOnce(graft.join.SpatialJoin.GridPairsPerTask))._2,
        time(joinOnce(Long.MaxValue))._2)
    }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(1)
    println(f"[probe] dir=$dir pairs=$warmOn census-on median=${med(onS)}%.3f s " +
      f"(${onS.map(x => f"$x%.3f").mkString(", ")}) | census-off median=${med(offS)}%.3f s " +
      f"(${offS.map(x => f"$x%.3f").mkString(", ")}) | tax=${med(onS) - med(offS)}%.3f s")
    spark.stop()
  }
}
