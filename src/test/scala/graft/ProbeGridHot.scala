package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r14): does pair-count-driven 2-D salting pay in the
  * GRID tier's cogroup path? The tier parses each row once per
  * (cell, salts) task (STRtree + prepared predicates — no per-pair EWKB
  * re-parse like the bucketed refinement), so the failure mode here is
  * purely the single-task straggler: a hot cell below the 1M build-row
  * bound but with tens of millions of tree probes. A/B alternates the
  * shipped default (GridPairsPerTask = 2M) against pairsPerTask =
  * Long.MaxValue (pair split disabled; memory split only), same fixture
  * as ProbeBucketHot's hot cell.
  *
  * Run: Test/runMain graft.ProbeGridHot [nInner]
  */
object ProbeGridHot {
  def main(args: Array[String]): Unit = {
    val nInner = args.headOption.map(_.toInt).getOrElse(8192)
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nOuter = 4096
    val nBackground = 100000
    def subRect(k: org.apache.spark.sql.Column) = st_rectangle(
      (k % 128).cast("double") / 256.0,
      ((k / lit(128)) % 128).cast("double") / 256.0,
      (k % 128).cast("double") / 256.0 + 0.6,
      ((k / lit(128)) % 128).cast("double") / 256.0 + 0.6)
    def bgRect(k: org.apache.spark.sql.Column, off: Double) = st_rectangle(
      k.cast("double") * 4.0 + lit(100.0 + off),
      (k % 64).cast("double") * 4.0 + lit(100.0 + off),
      k.cast("double") * 4.0 + lit(100.5 + off),
      (k % 64).cast("double") * 4.0 + lit(100.5 + off))
    val left = spark.range(nOuter).select(col("id").as("lk"),
        subRect(col("id") % nInner).as("geometry"))
      .union(spark.range(nBackground).select((col("id") + 1000000).as("lk"),
        bgRect(col("id"), 0.0).as("geometry")))
    val right = spark.range(nInner).select(col("id").as("rk"),
        subRect(col("id")).as("geometry"))
      .union(spark.range(nBackground).select((col("id") + 1000000).as("rk"),
        bgRect(col("id"), 0.25).as("geometry")))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def joinOnce(ppt: Long): Long = graft.join.SpatialJoin.sjoinPartitioned(
      left, right, 1.0, "intersects", pairsPerTask = ppt).count()

    val warmOff = joinOnce(Long.MaxValue)
    val warmOn = joinOnce(graft.join.SpatialJoin.GridPairsPerTask)
    assert(warmOn == warmOff, s"pair-split changed the result: $warmOn != $warmOff")
    val (offS, onS) = (1 to 3).map { _ =>
      (time(joinOnce(Long.MaxValue))._2,
        time(joinOnce(graft.join.SpatialJoin.GridPairsPerTask))._2)
    }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(1)
    println(f"[probe] pairs=$warmOn nInner=$nInner " +
      f"mem-split-only median=${med(offS)}%.3f s (${offS.map(x => f"$x%.3f").mkString(", ")}) | " +
      f"pair-split median=${med(onS)}%.3f s (${onS.map(x => f"$x%.3f").mkString(", ")})")
    spark.stop()
  }
}
