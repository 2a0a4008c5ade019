package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r13, VERDICT r12 item 5b / r11 item 6): does per-pair
  * EWKB parse thrash in the bucketed refinement justify a (further)
  * cache change?
  *
  * [[graft.plans.GeoNative.bucketedMatch]] parses BOTH sides per PAIR:
  * a hot cell with N outers × M distinct inners re-parses each inner's
  * bytes N times unless the per-thread parse cache absorbs the cycle.
  * History: at the original 64-entry LRU this probe's 256-inner hot
  * cell measured 864 ns/lookup (LRU hit rate under a longer-than-capacity
  * cycle is exactly 0) vs 196 ns hitting, join median 1.70 s. r13 first
  * moved to a 1024-entry/2 MiB-budget LRU (this fixture → 1.01 s), then
  * — because a 2048-distinct cell put LRU back at zero hits — to a
  * DIRECT-MAPPED 4096-slot tier for ≤512 B values whose cyclic hit rate
  * degrades statistically (~(1−1/slots)^(N−1)) instead: the 2048-inner
  * join dropped 9.5 → 6.0 s. The microbench reports per-lookup cost at
  * cycle lengths 512/2048/8192 against whatever cache is current;
  * `args(1)` sets the hot cell's distinct-inner count. Decision rule
  * from the verdict: act only if the recoverable share exceeds 10% of
  * join wall-clock.
  *
  * Run: Test/runMain graft.ProbeBucketHot [warehouseDir] [nInner]
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
    // distinct inner polygons, all inside cell (0,0); raise past the
    // cache's reach (≫4096) to reproduce live near-zero-hit joins
    val nInner = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val nOuter = 4096  // outers overlapping the same cell
    val nBackground = 100000

    // hot cell: dyadic sub-rectangles of the unit cell so every pair's
    // envelope test and predicate really run (all intersect); 128×128
    // distinct corners keep payloads unique up to 16384 ids
    def subRect(k: org.apache.spark.sql.Column) = st_rectangle(
      (k % 128).cast("double") / 256.0,
      ((k / lit(128)) % 128).cast("double") / 256.0,
      (k % 128).cast("double") / 256.0 + 0.6,
      ((k / lit(128)) % 128).cast("double") / 256.0 + 0.6)
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
    def joinOnce(salt: Boolean): Long = graft.join.SpatialJoin.sjoinBucketed(
      spark, "probe_outer", "probe_inner", cellSize, "intersects",
      leftGeom = "geometry", rightGeom = "geometry",
      saltHotCells = salt).count()

    // ALTERNATING salted/unsalted (r14 hot-cell mitigation A/B): same
    // ambient, interleaved, so box drift cannot masquerade as a delta
    val warm = joinOnce(salt = false) // codegen + page-cache warm
    val warmSalted = joinOnce(salt = true)
    assert(warmSalted == warm, s"salted pairs $warmSalted != unsalted $warm")
    val (plainSecs, saltSecs) = (1 to 3).map { _ =>
      (time(joinOnce(salt = false))._2, time(joinOnce(salt = true))._2)
    }.unzip
    val joinSec = plainSecs.sorted.apply(1)
    println(f"[probe] pairs=$warm unsalted median=${joinSec}%.3f s " +
      f"(runs: ${plainSecs.map(s => f"$s%.3f").mkString(", ")}) | " +
      f"salted median=${saltSecs.sorted.apply(1)}%.3f s " +
      f"(runs: ${saltSecs.map(s => f"$s%.3f").mkString(", ")})")

    // Per-lookup EWKB.read cost vs cycle length, against the CURRENT
    // cache (r13: direct-mapped 4096 slots for ≤512 B values — cyclic
    // access degrades STATISTICALLY, ≈(1−1/slots)^(N−1) hit rate, not to
    // LRU's hard zero). Three regimes: fits-everything, within-slots
    // statistical, beyond-slots worst case. The microbench synthesizes
    // its own payloads so it measures regardless of the fixture's nInner.
    val benchPayloads = spark.range(8192)
      .select(st_aswkb(subRect(col("id"))).as("b")).as[Array[Byte]].collect()
    var blackhole = 0.0
    def cycle(n: Int, reps: Int): Double = {
      val sub = benchPayloads.take(n)
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
    val fitNs = cycle(512, 1000)      // well inside every tier → hits
    val statNs = cycle(2048, 250)     // within slots → statistical hits
    val worstNs = cycle(8192, 64)     // beyond slots → near-full misses

    // parses the refinement performs: 2 per cell-cogrouped candidate pair;
    // the hot cell contributes nOuter×nInner of them
    val nParses = 2L * (nOuter.toLong * nInner + nBackground)
    val curNs = if (nInner <= 512) fitNs else if (nInner <= 4096) statNs else worstNs
    // recoverable = THIS fixture's lookups at THIS fixture's per-lookup
    // cost vs the all-hits floor — never mix one regime's per-lookup with
    // another regime's join time
    val recoverableShare = nParses * (curNs - fitNs) / 1e9 / joinSec
    println(f"[probe] per-lookup by cycle: 512→${fitNs}%.0f ns, 2048→${statNs}%.0f ns, " +
      f"8192→${worstNs}%.0f ns (beyond-slots worst/floor = ${worstNs / fitNs}%.1fx); " +
      f"refinement lookups≈$nParses%,d")
    println(f"[probe] current-fixture parse ≈ ${nParses * curNs / 1e9}%.3f s = " +
      f"${nParses * curNs / 1e9 / joinSec * 100}%.1f%% of join; " +
      f"cache-recoverable ≈ ${recoverableShare * 100}%.1f%%")
    println(if (recoverableShare > 0.10)
      "[probe] DECISION INPUT: >10% recoverable at this fixture — more cache " +
        "reach would pay on the UNSALTED plan; since r14 sjoinBucketed " +
        "salts cells past the pair bound (the salted median above is the " +
        "production path), so act only if the SALTED join still pays it"
    else
      "[probe] DECISION INPUT: ≤10% recoverable at this fixture — parse cost " +
        "does not justify further cache work (raise nInner to probe worse regimes)")
    println(s"[probe] (blackhole=$blackhole)") // observe the sum: JIT can't elide the loop
    spark.stop()
  }
}
