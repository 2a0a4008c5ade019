package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe (r18): what does the compaction + sibling-vacuum door
  * cost at sf0.1 store scale, and how much dead weight does it remove?
  *
  * Fixture: the sf0.1 documents corpus indexed once, then the same
  * 1/5-sized batch appended TWICE (the retried-ingest shape — duplicate
  * slim and sig rows) — the store `compactMinhashStore` is built to
  * repair. Reports table row counts before/after and the door's
  * wall-clock, so PERF.md can carry a concrete "what a compaction pass
  * costs relative to the write" number.
  *
  * Run: Test/runMain graft.ProbeCompact
  */
object ProbeCompact {
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
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val table = "graft_probe_compact_store"
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    graft.pipeline.Dedup.dropMinhashStore(spark, table)
    val tWrite = time(graft.pipeline.Dedup.writeMinhashStore(docs, table))
    val tApp = time {
      graft.pipeline.Dedup.writeMinhashStore(batch, table, mode = "append")
      graft.pipeline.Dedup.writeMinhashStore(batch, table, mode = "append")
    }
    def counts() = (spark.table(table).count(),
      spark.table(table + graft.pipeline.Dedup.MinhashSigTableSuffix).count())
    val (slimBefore, sigBefore) = counts()
    val tCompact = time(graft.pipeline.Dedup.compactMinhashStore(spark, table))
    val (slimAfter, sigAfter) = counts()
    println(f"[ProbeCompact] write corpus: $tWrite%.1f s; double-append: $tApp%.1f s")
    println(f"[ProbeCompact] compact+vacuum: $tCompact%.1f s " +
      f"(${100 * tCompact / tWrite}%.0f%% of the corpus write)")
    println(s"[ProbeCompact] slim rows $slimBefore -> $slimAfter; " +
      s"sig rows $sigBefore -> $sigAfter")
    graft.pipeline.Dedup.dropMinhashStore(spark, table)
    spark.stop()
  }
}
