package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe (r19, VERDICT r18 #3): settle whether the 16k AQE
  * minPartitionSize floor hurts the many-tiny-stage pipeline keys
  * (pipe_ann_ivfpq regressed 0.80×, pipe_topk 0.78× in the driver's r18
  * numbers, under a calib_alloc-flagged contended window). Alternating
  * A/B toggling the runtime conf per sample: A = Spark default (1m
  * floor), B = the 16k floor. The queries are the bench's own lambdas,
  * stores built once untimed (the bench's model). */
object ProbeFloorAB {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()

    val FloorKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect(); ()
    }
    val qs = Bench.benchQueries
    def ab(name: String): Unit = {
      val mk = qs(name)
      def sample(floor: String): Double = {
        spark.conf.set(FloorKey, floor)
        val t0 = System.nanoTime()
        force(mk(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      sample("1m"); sample("16k") // warm both (also builds the stores once)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 6).foreach { _ => as += sample("1m"); bs += sample("16k") }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[probe] $name%-16s A(1m) med=${med(as.toSeq)}%6.3f (${as.map(t => f"$t%.2f").mkString(",")})  " +
        f"B(16k) med=${med(bs.toSeq)}%6.3f (${bs.map(t => f"$t%.2f").mkString(",")})  B/A=${med(bs.toSeq) / med(as.toSeq)}%5.2f")
    }
    ab("pipe_topk")
    ab("pipe_ann_ivfpq")
    ab("geo_union_groups") // the floor's motivating key — sanity anchor
    spark.stop()
  }
}
