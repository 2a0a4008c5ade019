package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Probe (r18): ALTERNATING A/B (A,B,A,B,...) for the shuffle-tier join
  * keys so box-level contention drift cancels pairwise — the plain
  * 3-sample probes disagreed across windows. */
object ProbeJoinAB {
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
      force(a); force(b) // warm both
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 4).foreach { _ =>
        var t0 = System.nanoTime(); force(a); as += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); force(b); bs += (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[probe] $tag%-22s A med=${med(as.toSeq)}%6.3f (${as.map(t => f"$t%.2f").mkString(",")})  " +
        f"B med=${med(bs.toSeq)}%6.3f (${bs.map(t => f"$t%.2f").mkString(",")})  B/A=${med(bs.toSeq) / med(as.toSeq)}%5.2f")
    }

    def k = col("k")
    def xmin = (k % 1000000).cast("double") * 16.0
    def ymin = (k % 16).cast("double") * 16.0
    def w = lit(1.0) + (k % 13).cast("double") / 4.0
    def h = lit(1.0) + (k % 11).cast("double") / 4.0
    def rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    def pt = st_point(xmin + w / 2, ymin + h / 2)
    def nnLx = k.cast("double") * 16.0
    def nnLy = (k % 16).cast("double") * 16.0
    val par = spark.sparkContext.defaultParallelism
    def orders0 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
    def id(df: DataFrame) = df
    def sp(df: DataFrame) = df.repartition(par)

    def grid(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"), rect.as("geometry"))
      val right = prep(orders0).select(k.as("rk"), pt.as("geometry"))
      graft.join.SpatialJoin.sjoinPartitioned(left, right, cellSize = 64.0,
        predicate = "contains").agg(count(lit(1)).as("n"))
    }
    def withProp[T](v: String)(f: => T): T = {
      sys.props("graft.join.indexSpread.probeOff") = v
      try f finally sys.props.remove("graft.join.indexSpread.probeOff")
    }
    def abProp(tag: String)(mk: => DataFrame): Unit = {
      def a = withProp("true")(mk)   // pre-r18 withStableIndex
      def b = mk                      // r18 spread form
      // force rebuilds the frame lazily INSIDE the prop scope per sample
      force(withProp("true")(mk)); force(mk)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 4).foreach { _ =>
        var t0 = System.nanoTime(); force(withProp("true")(mk)); as += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); force(mk); bs += (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[probe] $tag%-22s off=${med(as.toSeq)}%6.3f (${as.map(t => f"$t%.2f").mkString(",")})  " +
        f"on=${med(bs.toSeq)}%6.3f (${bs.map(t => f"$t%.2f").mkString(",")})  on/off=${med(bs.toSeq) / med(as.toSeq)}%5.2f")
    }
    abProp("grid idxSpread")(grid(id))
    abProp("quad idxSpread")(quad(id))
    abProp("nearest idxSpread")(nearest(id))
    abProp("unb idxSpread")(unb(id))
    ab("grid as-is vs spread")(grid(id))(grid(sp))

    def quad(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"), rect.as("geometry"))
      val right = prep(orders0).select(k.as("rk"), pt.as("geometry"))
      graft.join.SpatialJoin.sjoinQuadtree(left, right, predicate = "contains")
        .agg(count(lit(1)).as("n"))
    }
    ab("quad as-is vs spread")(quad(id))(quad(sp))

    def nearest(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"),
        st_point(nnLx + w / 2, nnLy + h / 2).as("geometry"))
      val right = prep(orders0).select(k.as("rk"),
        st_point(nnLx + w, nnLy + h).as("geometry"))
      graft.join.SpatialJoin.sjoinNearestPartitioned(left, right, k = 2,
          maxDistance = 8.0, distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    ab("nearest as-is vs spread")(nearest(id))(nearest(sp))

    def unb(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"),
        st_point(nnLx + w / 2, nnLy + h / 2).as("geometry"))
      val right = prep(orders0).select(k.as("rk"),
        st_point(nnLx + w, nnLy + h).as("geometry"))
      graft.join.SpatialJoin.sjoinNearestUnbounded(left, right, k = 2,
          distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    ab("unb as-is vs spread")(unb(id))(unb(sp))

    spark.stop()
  }
}
