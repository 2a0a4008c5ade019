package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r15, VERDICT r14 #6): what does the 64×64 salt cap COST
  * when it binds — i.e. when a single cell is so hot on BOTH sides that
  * `pairs / (maxSalt²)` still exceeds the per-task pair target?
  *
  * The production defaults never cap below ~8.2G pairs in one cell
  * (maxSalt² × hotPairsBound/4 = 4096 × 2M), which is unreachable in a
  * local fixture — so the probe shrinks the knobs instead and measures
  * the SHAPE of the penalty: one 4096×4096 cell (16.7M pairs) joined at
  * hotPairsBound=65536 / saltSliceRows=32, once with maxSalt=8
  * (per-task pairs 16× the target — the saturated regime) and once with
  * maxSalt=256 (sized exactly to target). Alternating A/B so box drift
  * can't masquerade as the delta. The measured ratio calibrates the
  * formula `penalty ≈ pairs / (maxSalt² · ppt)` that PERF.md's standing
  * decision on whether maxSalt should scale with
  * spark.sql.shuffle.partitions rests on.
  *
  * Run: Test/runMain graft.ProbeSaltCap [warehouseDir]
  */
object ProbeSaltCap {
  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse("/tmp/graft_probe_saltcap")
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
    val nHot = 4096    // per side, one cell → 16.7M potential pairs
    val nBackground = 50000

    // dyadic sub-rectangles of the unit cell: every pair's envelope test
    // and predicate really run. Extent +0.5 (not ProbeBucketHot's +0.6):
    // origins reach 0.496, so +0.6 would cross the 1.0 cell boundary for
    // ~20% of rows and split the "one hot cell" fixture into two cells
    // in different saturation regimes (review r15 #7)
    // floor(k/128), NOT k/128: Divide on longs is TRUE division in Spark
    // (returns double) — without the floor the y origins were k/32768 in
    // [0, 0.125), not the documented 128-step sub-lattice (round-review
    // r15; the one-hot-cell A/B conclusion was unaffected — all rows
    // stayed in cell (0,0) either way — but the fixture must be what its
    // comment says)
    def subRect(k: org.apache.spark.sql.Column) = st_rectangle(
      (k % 128).cast("double") / 256.0,
      (floor(k / lit(128)) % 128).cast("double") / 256.0,
      (k % 128).cast("double") / 256.0 + 0.5,
      (floor(k / lit(128)) % 128).cast("double") / 256.0 + 0.5)
    def bgRect(k: org.apache.spark.sql.Column, off: Double) = st_rectangle(
      k.cast("double") * 4.0 + lit(100.0 + off),
      (k % 64).cast("double") * 4.0 + lit(100.0 + off),
      k.cast("double") * 4.0 + lit(100.5 + off),
      (k % 64).cast("double") * 4.0 + lit(100.5 + off))
    val inner = spark.range(nHot).select(col("id").as("ik"),
        subRect(col("id")).as("geometry"))
      .union(spark.range(nBackground).select((col("id") + 1000000).as("ik"),
        bgRect(col("id"), 0.0).as("geometry")))
    val outer = spark.range(nHot).select(col("id").as("ok"),
        subRect(col("id")).as("geometry"))
      .union(spark.range(nBackground).select((col("id") + 1000000).as("ok"),
        bgRect(col("id"), 0.25).as("geometry")))
    graft.join.SpatialJoin.writeSpatialBucketed(
      inner.withColumn("geometry", st_aswkb(col("geometry"))), "cap_inner", cellSize)
    graft.join.SpatialJoin.writeSpatialBucketed(
      outer.withColumn("geometry", st_aswkb(col("geometry"))), "cap_outer", cellSize)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // hotPairsBound 65536 → ppt 16384. maxSalt=8: q=8, p=8, per-task
    // pairs 262144 (16× target — saturated). maxSalt=256: q=128, p=8,
    // per-task 16384 (on target).
    def joinOnce(maxSalt: Int): Long = graft.join.SpatialJoin.sjoinBucketed(
      spark, "cap_outer", "cap_inner", cellSize, "intersects",
      hotPairsBound = 65536L, saltSliceRows = 32, maxSalt = maxSalt).count()

    val warmCapped = joinOnce(8)
    val warmSized = joinOnce(256)
    assert(warmCapped == warmSized, s"pair mismatch: $warmCapped vs $warmSized")
    val (cappedSecs, sizedSecs) = (1 to 3).map { _ =>
      (time(joinOnce(8))._2, time(joinOnce(256))._2)
    }.unzip
    val cMed = cappedSecs.sorted.apply(1)
    val sMed = sizedSecs.sorted.apply(1)
    println(f"[probe] pairs=$warmCapped%,d hot-cell potential=${nHot.toLong * nHot}%,d")
    println(f"[probe] CAPPED (maxSalt=8, per-task 16x target): median=$cMed%.3f s " +
      f"(runs ${cappedSecs.map(s => f"$s%.3f").mkString(", ")})")
    println(f"[probe] SIZED (maxSalt=256, per-task on target):  median=$sMed%.3f s " +
      f"(runs ${sizedSecs.map(s => f"$s%.3f").mkString(", ")})")
    println(f"[probe] saturation penalty = ${cMed / sMed}%.2fx at a 16x per-task " +
      "pair overshoot — compare against the linear model pairs/(maxSalt^2*ppt)")
    println("[probe] production cap binds only past maxSalt^2*ppt = 4096 * " +
      "hotPairsBound/4 pairs in ONE cell (~8.2G at defaults)")
    spark.stop()
  }
}
