package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Probe (r18): alternated A/Bs for the store-tier bench keys (spread the
  * probe/batch side?) and the fused-vs-unfused overlay sanity check. */
object ProbeStoreAB {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect(); ()
    }
    def ab(tag: String)(a: => DataFrame)(b: => DataFrame): Unit = {
      force(a); force(b)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 4).foreach { _ =>
        var t0 = System.nanoTime(); force(a); as += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); force(b); bs += (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[probe] $tag%-26s A med=${med(as.toSeq)}%6.3f (${as.map(t => f"$t%.2f").mkString(",")})  " +
        f"B med=${med(bs.toSeq)}%6.3f (${bs.map(t => f"$t%.2f").mkString(",")})  B/A=${med(bs.toSeq) / med(as.toSeq)}%5.2f")
    }

    def k = col("k")
    def xmin = (k % 1000000).cast("double") * 16.0
    def ymin = (k % 16).cast("double") * 16.0
    def w = lit(1.0) + (k % 13).cast("double") / 4.0
    def h = lit(1.0) + (k % 11).cast("double") / 4.0
    def rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    def nnLx = k.cast("double") * 16.0
    def nnLy = (k % 16).cast("double") * 16.0
    val par = spark.sparkContext.defaultParallelism
    def orders0 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
    def sp(df: DataFrame) = df.repartition(par)

    // bucketed nearest store (as in Bench BktSetup)
    graft.join.SpatialJoin.dropBucketedTable(spark, "graft_probe_bkt_nn")
    graft.join.SpatialJoin.writeSpatialBucketed(
      orders0.select(k.as("rk"),
        st_point(nnLx + w / 2, nnLy + h / 2).as("geometry")),
      "graft_probe_bkt_nn", 16.0, 32)
    graft.join.SpatialJoin.stampCellSummary(spark, "graft_probe_bkt_nn")

    def nnBkt(prep: DataFrame => DataFrame, maxD: Double): DataFrame = {
      val probe = prep(orders0).select(k.as("lk"),
        st_point(nnLx + w, nnLy + h).as("geometry"))
      graft.join.SpatialJoin.sjoinNearestBucketed(spark, probe,
          "graft_probe_bkt_nn", 16.0, k = 2, maxDistance = maxD,
          distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    ab("nn_bucketed probe-spread")(nnBkt(identity, 8.0))(nnBkt(sp, 8.0))
    ab("unb_bkt probe-spread")(nnBkt(identity, Double.PositiveInfinity))(
      nnBkt(sp, Double.PositiveInfinity))

    // minhash store: spread the batch side?
    graft.pipeline.Dedup.dropMinhashStore(spark, "graft_probe_mh2")
    graft.pipeline.Dedup.writeMinhashStore(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")), "graft_probe_mh2")
    def mhStore(prep: DataFrame => DataFrame): DataFrame = {
      val batch = prep(spark.read.parquet(s"$dir/documents.parquet")
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      graft.pipeline.Dedup.minhashCandidatesAgainstStore(spark, batch,
          "graft_probe_mh2")
        .agg(count(lit(1)).as("n"), sum(col("jaccard_est")).as("sj"))
    }
    ab("mh_store batch-spread")(mhStore(identity))(mhStore(sp))

    // fused vs unfused overlay, alternated (inversion sanity check)
    def overlay(src: DataFrame) = src
      .select(rect.as("a"), st_translate(rect, w / 2, lit(0.0)).as("c"))
      .select(st_area(st_intersection(col("a"), col("c"))).as("ia"),
        st_area(st_buffer(col("a"), lit(0.5))).as("ba"))
    def fusedRun: DataFrame = { spark.conf.set("spark.graft.fuse", "true"); overlay(sp(orders0)) }
    def unfusedRun: DataFrame = { spark.conf.set("spark.graft.fuse", "false"); overlay(sp(orders0)) }
    try ab("overlay fused-vs-unfused")(fusedRun)(unfusedRun)
    finally spark.conf.set("spark.graft.fuse", "true")

    spark.stop()
  }
}
