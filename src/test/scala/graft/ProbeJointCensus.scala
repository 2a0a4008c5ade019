package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe (r18, VERDICT r17 #6): is the EAGER joint-cap census
  * worth folding into the candidates join?
  *
  * Every `*CandidatesAgainstStore` call runs `capBucketsJoint` at call
  * time: batch-bands census + store census (rides the store's
  * bucketing) + inner join + localCheckpoint + a dropped-group `count()`
  * that feeds the skip WARNING. Cheap at sf0.1; at cluster scale it is
  * one extra driver-blocking job per ingest batch. The foldable slice is
  * ONLY the separate `count()` — the census materialization itself is
  * what the two semi-joins consume (un-snapping it re-runs the batch
  * census per consumer, the exact r16 regression PERF.md records), and
  * the batch signature pass is eagerly snapped either way.
  *
  *  - A: the full minhash store door, default cap (census + count + semi
  *    joins), on the sf0.1 documents corpus vs a same-sized batch.
  *  - B: the identical door with `maxBucketSize = 0` — capBucketsJoint
  *    disabled entirely, so (A − B) bounds EVERYTHING the census
  *    machinery costs (pairs are identical on this healthy store).
  *  - C: a `count()` over an already-localCheckpointed census-sized
  *    frame — the per-job floor that folding the dropped-count into the
  *    materialization job could actually remove.
  *
  * Decide: fold only if C is a meaningful slice of A. A/B/C alternate
  * 3× so box drift can't masquerade as the delta. Decision recorded in
  * PERF.md either way.
  *
  * Run: Test/runMain graft.ProbeJointCensus
  */
object ProbeJointCensus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val table = "graft_probe_jc_store"
    graft.pipeline.Dedup.dropMinhashStore(spark, table)
    graft.pipeline.Dedup.writeMinhashStore(docs, table)
    val batch = docs.select((col("doc_id") + 10000000L).as("doc_id"), col("text"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def door(cap: Int): Unit = {
      graft.pipeline.Dedup.minhashCandidatesAgainstStore(spark, batch, table,
          maxBucketSize = cap)
        .agg(count(lit(1))).collect()
      ()
    }
    // C's fixture: a checkpointed frame the size of a typical joint
    // census (one row per jointly-present bucket)
    val censusSized = spark.range(2000)
      .select(col("id").as("band"), (col("id") * 31).as("bucket"),
        (col("id") % 97 + 2).as("__tot"))
      .localCheckpoint(true)

    door(100000); door(0) // warm-up, untimed
    var (ta, tb, tc) = (List.empty[Double], List.empty[Double], List.empty[Double])
    for (_ <- 1 to 3) {
      ta ::= time(door(100000))
      tb ::= time(door(0))
      tc ::= time { censusSized.filter(col("__tot") > 100000).count(); () }
    }
    def fmt(l: List[Double]) =
      l.reverse.map(v => f"$v%.3f").mkString(" ") + f" s (min ${l.min}%.3f)"
    println(s"[ProbeJointCensus] A door with census : ${fmt(ta)}")
    println(s"[ProbeJointCensus] B door, cap off    : ${fmt(tb)}")
    println(s"[ProbeJointCensus] C count-only floor : ${fmt(tc)}")
    println(f"[ProbeJointCensus] census machinery ≈ ${ta.min - tb.min}%.3f s " +
      f"(${100 * (ta.min - tb.min) / math.max(1e-9, ta.min)}%.0f%% of A); " +
      f"foldable count slice ≈ ${tc.min}%.3f s " +
      f"(${100 * tc.min / math.max(1e-9, ta.min)}%.1f%% of A)")
    println("[ProbeJointCensus] decide: fold the dropped-count into the " +
      "census materialization only if C is a meaningful slice of A")
    graft.pipeline.Dedup.dropMinhashStore(spark, table)
    spark.stop()
  }
}
