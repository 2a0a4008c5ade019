package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r16): what does the persisted probe census
  * ([[graft.join.SpatialJoin.censusProbe]] + the `probeCensus` door on
  * `sjoinNearestBucketed`) save a REPEATED-join workload?
  *
  * ProbeNearestHot priced the per-call census at ~0.6 s; the door's
  * claim is that a probe frame joined n times pays it once. Fixture:
  * the same hot-cell regime (4096 store × 4096 probe points in one
  * cell over a uniform background) joined at the production-default
  * bound. A/B alternating (box drift can't masquerade as the delta):
  * fresh (census recomputed inside every call) vs persisted (one
  * censusProbe up front, passed into every call); the up-front census
  * is timed too, so the break-even join count is visible.
  *
  * Run: Test/runMain graft.ProbeNearestCensus [warehouseDir]
  */
object ProbeNearestCensus {
  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse("/tmp/graft_probe_nncensus")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(warehouse))
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cellSize = 1.0
    val nHot = 4096
    val nBackground = 50000
    // floor(k/64), NOT k/64 — Divide on longs is true division in Spark
    def hotPt(k: org.apache.spark.sql.Column, off: Double) = st_point(
      (k % 64).cast("double") / 64.0 + lit(off),
      (floor(k / lit(64)) % 64).cast("double") / 64.0 + lit(off))
    def bgPt(k: org.apache.spark.sql.Column, off: Double) = st_point(
      k.cast("double") * 4.0 + lit(100.0 + off),
      (k % 64).cast("double") * 4.0 + lit(100.0 + off))
    val store = spark.range(nHot).select(col("id").as("bid"),
        hotPt(col("id"), 0.001).as("geometry"))
      .union(spark.range(nBackground).select((col("id") + 1000000).as("bid"),
        bgPt(col("id"), 0.25).as("geometry")))
    val probes = spark.range(nHot).select(col("id").as("pid"),
        hotPt(col("id"), 0.004).as("geometry"))
      .union(spark.range(nBackground).select((col("id") + 1000000).as("pid"),
        bgPt(col("id"), 0.3).as("geometry")))
    graft.join.SpatialJoin.writeSpatialBucketed(store, "nnc_store", cellSize)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val maxD = 0.3
    val (census, censusSec) = time(
      graft.join.SpatialJoin.censusProbe(probes, "geometry", cellSize, maxD))
    println(f"censusProbe up-front cost: $censusSec%.2f s " +
      s"(${census.hist.cells.size} heavy cells)")

    def joinOnce(pc: Option[graft.join.SpatialJoin.ProbeCensus]): Long =
      graft.join.SpatialJoin.sjoinNearestBucketed(spark, probes, "nnc_store",
        cellSize, k = 3, maxDistance = maxD, probeCensus = pc).count()
    val variants: Seq[(String, () => Long)] = Seq(
      "fresh    " -> (() => joinOnce(None)),
      "persisted" -> (() => joinOnce(Some(census))))
    val warm = variants.map { case (n, f) => n -> f() }
    assert(warm.map(_._2).distinct.size == 1, s"row mismatch: $warm")
    println(s"rows: ${warm.head._2}")
    val samples: Seq[Seq[Double]] = (1 to 4).map { _ =>
      variants.map { case (_, f) => time(f())._2 }
    }
    variants.map(_._1).zipWithIndex.foreach { case (n, i) =>
      val xs = samples.map(_(i))
      println(f"$n%-10s min ${xs.min}%.2f  runs ${xs.map(s => f"$s%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
