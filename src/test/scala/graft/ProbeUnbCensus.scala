package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r17, VERDICT r16 #6): would round-over-round census
  * reuse pay inside the unbounded nearest tier's `exclusive` escalation
  * loop?
  *
  * Each escalation round runs [[graft.join.SpatialJoin]]'s
  * saltedCogroup, which censuses BOTH sides' exploded cells for hot-cell
  * sizing. The build side's cells are identical across rounds (persisted
  * once), so its census is the reusable candidate; the probe side
  * shrinks and RE-PADS each round (bounds grow with the anchor target),
  * so its census is not reusable as-is. This probe sizes the opportunity
  * before any implementation:
  *
  *  - A: `sjoinNearestUnbounded(exclusive = true)` on a fixture whose
  *    duplicate pressure forces several escalation rounds (D
  *    topologically-equal build rows stacked on every probe location —
  *    the anchor target must escalate past D before a probe resolves).
  *  - B: the identical join `exclusive = false` (one round, same pass
  *    machinery) — so (A − B)/(rounds − 1) bounds the WHOLE marginal
  *    cost of an extra round: census + explosion + cogroup + rank.
  *  - C: one standalone census of the build side's exploded cells
  *    ([[graft.join.SpatialJoin.censusProbe]] — the same one-pass
  *    aggregate shape saltedCogroup runs), i.e. the per-round cost a
  *    build-census cache could actually remove.
  *
  * Reuse can save at most C per extra round; if C is a small slice of
  * the per-round marginal (A − B)/(rounds − 1), the cache cannot move
  * the key and the decision is NO — recorded in PERF.md either way.
  * A/B/C alternate 3× so box drift can't masquerade as the delta.
  *
  * RESULT (r17, PERF.md): D ≈ 0.65 s ≈ the whole 0.67 s/round marginal
  * — but implementing BOTH build-census reuse and per-round probe
  * persistence moved A by nothing (5.78 → 6.00 min, inside noise): at
  * this scale every per-round job (two censuses, resolution aggregate,
  * two lineage checkpoints, persist materialization) is dominated by
  * the same fixed per-job overhead, so removing one job's WORK doesn't
  * remove its floor. Both changes are kept anyway: at cluster scale the
  * censuses are real passes over the (arbitrarily large) cells
  * datasets, and skipping one per round is a pass eliminated — the
  * small-scale measurement just says the win is invisible here, not
  * that it's absent at 100 TB. Equality pinned by the escalation cases
  * in NearestUnboundedSpec / NearestBucketedUnboundedSpec.
  *
  * Run: Test/runMain graft.ProbeUnbCensus
  */
object ProbeUnbCensus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // lattice of probe locations; the build side stacks D exact copies
    // of every probe point (topologically equal → consume the exclusive
    // anchor budget) plus one true neighbor half a cell away (what the
    // escalated pass must eventually find)
    val n = 20000L
    val dup = 32 // ~log2(32)+1 ≈ 6 escalation rounds from a k-sized start
    def px(k: org.apache.spark.sql.Column) = k.cast("double") * 16.0
    def py(k: org.apache.spark.sql.Column) = (k % 16).cast("double") * 16.0
    val probe = spark.range(n).select(col("id").as("pid"),
      st_point(px(col("id")), py(col("id"))).as("geometry"))
    val build = spark.range(n * dup).select((col("id") % n).as("bk"),
        (col("id")).as("bid"))
      .select(col("bid"), st_point(px(col("bk")), py(col("bk"))).as("geometry"))
      .union(spark.range(n).select((col("id") + 10000000).as("bid"),
        st_point(px(col("id")) + 8.0, py(col("id")) + 8.0).as("geometry")))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(count(lit(1))).collect(); ()
    }

    // warm-up (codegen + JIT), untimed
    force(graft.join.SpatialJoin.sjoinNearestUnbounded(
      probe.limit(1000), build.limit(1000), k = 1))

    val rounds = (math.log(dup.toDouble) / math.log(2.0)).ceil.toInt + 1
    // D's fixture: the IN-JOIN census shape — the escalation loop holds
    // its exploded build cells PERSISTED across rounds (the r16 design),
    // so each round's build census is a count aggregate over a cached
    // dataset, not a from-source recompute like C
    val cellsDf = build.select(
      (floor(st_x(col("geometry")) / 32.0).cast("long") * 100000L +
        floor(st_y(col("geometry")) / 32.0).cast("long")).as("cell")).persist()
    force(cellsDf)
    var (ta, tb, tc, td) = (List.empty[Double], List.empty[Double],
      List.empty[Double], List.empty[Double])
    for (_ <- 1 to 3) {
      ta ::= time(force(graft.join.SpatialJoin.sjoinNearestUnbounded(
        probe, build, k = 1, exclusive = true)))
      tb ::= time(force(graft.join.SpatialJoin.sjoinNearestUnbounded(
        probe, build, k = 1, exclusive = false)))
      // C: a from-source census over the build side (upper bound)
      tc ::= time {
        graft.join.SpatialJoin.censusProbe(build, "geometry",
          cellSize = 32.0, pad = 0.0); ()
      }
      // D: the in-join shape — aggregate over the persisted cells
      td ::= time {
        cellsDf.groupBy(col("cell")).agg(count(lit(1)))
          .agg(count(lit(1))).collect(); ()
      }
    }
    def mn(l: List[Double]) = l.min
    def fmt(l: List[Double]) =
      l.reverse.map(v => f"$v%.2f").mkString(" ") + f" s (min ${l.min}%.2f)"
    val marginal = (mn(ta) - mn(tb)) / math.max(1, rounds - 1)
    println(f"[ProbeUnbCensus] n=$n dup=$dup est_rounds=$rounds")
    println(s"[ProbeUnbCensus] A exclusive (multi-round): ${fmt(ta)}")
    println(s"[ProbeUnbCensus] B non-exclusive (1 round): ${fmt(tb)}")
    println(s"[ProbeUnbCensus] C census from source     : ${fmt(tc)}")
    println(s"[ProbeUnbCensus] D census, persisted cells: ${fmt(td)}")
    println(f"[ProbeUnbCensus] marginal/round ≈ $marginal%.2f s; reusable " +
      f"slice (D) ≈ ${100 * mn(td) / math.max(1e-9, marginal)}%.0f%% of it")
    println("[ProbeUnbCensus] decide: implement build-census reuse only if " +
      "D is a dominant slice of the per-round marginal")
    cellsDf.unpersist()
    spark.stop()
  }
}
