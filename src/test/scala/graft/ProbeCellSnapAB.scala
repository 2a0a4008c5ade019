package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Probe (r19): alternating A/B for the saltedCogroup cells snapshot
  * (VERDICT r18 #4 — fold the census's second explode evaluation).
  * A = -Dgraft.join.cellSnap.probeOff=true (r18 double evaluation),
  * B = lazy localCheckpoint of censused sides (r19). */
object ProbeCellSnapAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
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
    def withProp[T](v: String)(f: => T): T = {
      sys.props("graft.join.cellSnap.probeOff") = v
      try f finally sys.props.remove("graft.join.cellSnap.probeOff")
    }
    def ab(tag: String)(mk: => DataFrame): Unit = {
      def a = withProp("true")(mk)
      def b = mk
      force(a); force(b)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 6).foreach { _ =>
        var t0 = System.nanoTime(); force(a); as += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); force(b); bs += (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[probe] $tag%-10s A(off) med=${med(as.toSeq)}%6.3f (${as.map(t => f"$t%.2f").mkString(",")})  " +
        f"B(snap) med=${med(bs.toSeq)}%6.3f (${bs.map(t => f"$t%.2f").mkString(",")})  B/A=${med(bs.toSeq) / med(as.toSeq)}%5.2f")
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
    def orders0 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))

    if (sys.env.get("PROBE_ONLY").forall(_ == "grid")) ab("grid") {
      graft.join.SpatialJoin.sjoinPartitioned(
        orders0.select(k.as("lk"), rect.as("geometry")),
        orders0.select(k.as("rk"), pt.as("geometry")),
        cellSize = 64.0, predicate = "contains").agg(count(lit(1)).as("n"))
    }
    if (sys.env.get("PROBE_ONLY").forall(_ == "quadtree")) ab("quadtree") {
      graft.join.SpatialJoin.sjoinQuadtree(
        orders0.select(k.as("lk"), rect.as("geometry")),
        orders0.select(k.as("rk"), pt.as("geometry")),
        predicate = "contains").agg(count(lit(1)).as("n"))
    }
    if (sys.env.get("PROBE_ONLY").forall(_ == "nearest")) ab("nearest") {
      graft.join.SpatialJoin.sjoinNearestPartitioned(
        orders0.repartition(32).select(k.as("lk"),
          st_point(nnLx + w / 2, nnLy + h / 2).as("geometry")),
        orders0.repartition(32).select(k.as("rk"),
          st_point(nnLx + w, nnLy + h).as("geometry")),
        k = 2, maxDistance = 8.0, distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    if (sys.env.get("PROBE_ONLY").forall(_ == "unbounded")) ab("unbounded") {
      graft.join.SpatialJoin.sjoinNearestUnbounded(
        orders0.select(k.as("lk"),
          st_point(nnLx + w / 2, nnLy + h / 2).as("geometry")),
        orders0.select(k.as("rk"),
          st_point(nnLx + w, nnLy + h).as("geometry")),
        k = 2, distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    spark.stop()
  }
}
