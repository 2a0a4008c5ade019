package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r13, VERDICT r12 item 5b / r11 item 6): does per-pair
  * EWKB parse thrash in the bucketed refinement justify a per-cell-group
  * parse cache?
  *
  * [[graft.plans.GeoNative.bucketedMatch]] parses BOTH sides per PAIR:
  * a hot cell with N outers × M distinct inners re-parses each inner's
  * bytes N times. This probe builds a deliberately pathological store —
  * one cell holding every row (M=256 distinct inners, N=4096 outers →
  * ~1M pairs, ~2.1M parses) plus a uniform background — times the
  * bucketed join end-to-end, independently measures the raw per-parse
  * cost of the same byte payloads, and reports parse time as a share of
  * join wall-clock. Decision rule from the verdict: build the cache only
  * if the share exceeds 10%.
  *
  * Run: Test/runMain graft.ProbeBucketHot
  */
object ProbeBucketHot {
  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse("/tmp/graft_probe_buckethot")
    // fresh-metastore JVM + leftover warehouse dir = LOCATION_ALREADY_EXISTS
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
    import spark.implicits._

    val cellSize = 1.0
    val nInner = 256   // distinct inner polygons, all inside cell (0,0)
    val nOuter = 4096  // outers overlapping the same cell
    val nBackground = 100000

    // hot cell: dyadic sub-rectangles of the unit cell so every pair's
    // envelope test and predicate really run (all intersect)
    def subRect(k: org.apache.spark.sql.Column) = st_rectangle(
      (k % 16).cast("double") / 32.0,
      ((k / lit(16)) % 16).cast("double") / 32.0,
      (k % 16).cast("double") / 32.0 + 0.6,
      ((k / lit(16)) % 16).cast("double") / 32.0 + 0.6)
    val hotInner = spark.range(nInner).select(col("id").as("ik"),
      subRect(col("id")).as("geometry"))
    val hotOuter = spark.range(nOuter).select(col("id").as("ok"),
      subRect(col("id") % nInner).as("geometry"))
    // background: one small rect per distant cell (no hot spots)
    def bgRect(k: org.apache.spark.sql.Column, off: Double) = st_rectangle(
      k.cast("double") * 4.0 + lit(100.0 + off),
      (k % 64).cast("double") * 4.0 + lit(100.0 + off),
      k.cast("double") * 4.0 + lit(100.5 + off),
      (k % 64).cast("double") * 4.0 + lit(100.5 + off))
    val bgInner = spark.range(nBackground).select((col("id") + 1000000).as("ik"),
      bgRect(col("id"), 0.0).as("geometry"))
    val bgOuter = spark.range(nBackground).select((col("id") + 1000000).as("ok"),
      bgRect(col("id"), 0.25).as("geometry"))

    graft.join.SpatialJoin.writeSpatialBucketed(
      hotInner.union(bgInner).withColumn("geometry", st_aswkb(col("geometry"))),
      "probe_inner", cellSize)
    graft.join.SpatialJoin.writeSpatialBucketed(
      hotOuter.union(bgOuter).withColumn("geometry", st_aswkb(col("geometry"))),
      "probe_outer", cellSize)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def joinOnce(): Long = graft.join.SpatialJoin.sjoinBucketed(
      spark, "probe_outer", "probe_inner", cellSize, "intersects",
      leftGeom = "geometry", rightGeom = "geometry").count()

    val warm = joinOnce() // codegen + page-cache warm
    val joinSecs = (1 to 3).map(_ => time(joinOnce())._2).sorted
    val joinSec = joinSecs(1)
    println(f"[probe] pairs=$warm join median=${joinSec}%.3f s (runs: ${joinSecs.map(s => f"$s%.3f").mkString(", ")})")

    // EWKB.read already carries a 64-entry per-thread LRU — the question
    // is what THRASH costs when a cell group cycles >64 distinct
    // geometries (every lookup misses AND pays map overhead) vs the hit
    // cost when it fits. Measure both on the SAME payload shapes.
    val payloads = hotInner.select(st_aswkb(col("geometry"))).as[Array[Byte]].collect()
    var blackhole = 0.0
    def cycle(n: Int, reps: Int): Double = {
      val sub = payloads.take(n)
      (1 to 200).foreach(_ =>
        sub.foreach(b => blackhole += graft.serde.EWKB.read(b).getNumPoints)) // JIT warm
      val (_, secs) = time {
        var i = 0
        while (i < reps) {
          sub.foreach(b => blackhole += graft.serde.EWKB.read(b).getNumPoints)
          i += 1
        }
      }
      secs * 1e9 / (reps.toLong * n)
    }
    val hitNs = cycle(32, 16000)     // fits the 64-entry LRU → hits
    val thrashNs = cycle(256, 2000)  // 256 distinct cycled → 100% miss

    // parses the refinement performs: 2 per cell-cogrouped candidate pair;
    // the hot cell contributes nOuter×nInner of them
    val nParses = 2L * (nOuter.toLong * nInner + nBackground)
    val thrashSec = nParses * thrashNs / 1e9
    val hitSec = nParses * hitNs / 1e9
    println(f"[probe] per-lookup: hit=${hitNs}%.0f ns, thrash=${thrashNs}%.0f ns; " +
      f"refinement lookups≈$nParses%,d")
    println(f"[probe] thrash-mode parse ≈ ${thrashSec}%.3f s = ${thrashSec / joinSec * 100}%.1f%% of join; " +
      f"a perfect cache saves ≤ ${(thrashSec - hitSec) / joinSec * 100}%.1f%%")
    println(if ((thrashSec - hitSec) / joinSec > 0.10)
      "[probe] DECISION INPUT: >10% — a scan-resistant/bigger parse cache would pay"
    else
      "[probe] DECISION INPUT: ≤10% — LRU thrash does not justify a cache change")
    println(s"[probe] (blackhole=$blackhole)") // observe the sum: JIT can't elide the loop
    spark.stop()
  }
}
