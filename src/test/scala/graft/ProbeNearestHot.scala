package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r15): what does hot-cell salting buy the bucketed
  * NEAREST tier? The predicate tier's number (ProbeBucketHot: 10.3× at
  * 33.7M pairs) doesn't transfer automatically — the nearest kernel's
  * per-pair work (two parses + envelope + distance) differs from the
  * predicate kernel's, and the pairs that survive flow into a rank()
  * window the predicate tier doesn't have.
  *
  * Fixture: one hot cell with 4096 store points × 4096 probe points
  * (16.7M kernel evaluations; ~all probes find in-range neighbors at
  * maxDistance=0.3) over a one-row-per-cell background. A/B alternating
  * (box drift can't masquerade as the delta): salted
  * (hotPairsBound=65536 → per-task pairs 16384) vs unsalted
  * (saltHotCells=false → the whole cell is ONE SMJ group in one task).
  *
  * Run: Test/runMain graft.ProbeNearestHot [warehouseDir]
  */
object ProbeNearestHot {
  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse("/tmp/graft_probe_nnhot")
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

    // hot points on a 64×64 sub-lattice of the unit cell (all within
    // maxDistance of many others); background one point per distant cell.
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
    graft.join.SpatialJoin.writeSpatialBucketed(store, "nn_store", cellSize)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // four regimes, decomposing the salted path's cost: (a) salting off
    // (no census, the whole hot cell is one SMJ task); (b) census only
    // (bound unreachable — prices the per-call probe census tax); (c)
    // the production default bound (16.7M pairs cross 8M → MILD salt:
    // q=4, p=3, 12 groups); (d) a shrunk aggressive bound (1024 groups —
    // the over-splitting regime ProbeSaltCap flagged for the predicate
    // tier).
    def joinOnce(salt: Boolean, bound: Long, slice: Int): Long =
      graft.join.SpatialJoin.sjoinNearestBucketed(spark, probes, "nn_store",
        cellSize, k = 3, maxDistance = 0.3, saltHotCells = salt,
        hotPairsBound = bound, saltSliceRows = slice).count()
    val variants: Seq[(String, () => Long)] = Seq(
      "unsalted " -> (() => joinOnce(false, 8000000L, 1024)),
      "censusOnly" -> (() => joinOnce(true, Long.MaxValue - 1, 1024)),
      "defaultSalt" -> (() => joinOnce(true, 8000000L, 1024)),
      "aggressive" -> (() => joinOnce(true, 65536L, 32)))

    val warm = variants.map { case (n, f) => n -> f() }
    assert(warm.map(_._2).distinct.size == 1, s"row mismatch: $warm")
    println(s"rows: ${warm.head._2}")
    val samples: Seq[Seq[Double]] = (1 to 3).map { _ =>
      variants.map { case (_, f) => time(f())._2 }
    }
    variants.map(_._1).zipWithIndex.foreach { case (n, i) =>
      val xs = samples.map(_(i))
      println(f"$n%-12s min ${xs.min}%.2f  runs ${xs.map(s => f"$s%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
