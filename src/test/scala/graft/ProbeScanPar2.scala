package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Probe (r18 optimization), part 2: the spatial-join bench keys build
  * BOTH sides from the single-row-group orders scan, so geometry
  * construction + cell assignment run in one task before the join's own
  * shuffle. A/B: as-is vs repartition(defaultParallelism) on each side.
  */
object ProbeScanPar2 {
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

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      ()
    }
    def time3(tag: String)(df: => DataFrame): Unit = {
      force(df)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); force(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-30s med=${ts.sorted.apply(1)}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
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

    def sjoin(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"), rect.as("geometry"))
      val right = prep(orders0).select(k.as("rk"), pt.as("geometry"))
      graft.join.SpatialJoin.sjoin(left, right, "contains", "inner")
        .agg(count(lit(1)).as("n"))
    }
    time3("sjoin AS-IS")(sjoin(id))
    time3("sjoin repart")(sjoin(sp))

    def grid(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"), rect.as("geometry"))
      val right = prep(orders0).select(k.as("rk"), pt.as("geometry"))
      graft.join.SpatialJoin.sjoinPartitioned(left, right, cellSize = 64.0,
        predicate = "contains")
        .agg(count(lit(1)).as("n"))
    }
    time3("sjoin_grid AS-IS")(grid(id))
    time3("sjoin_grid repart")(grid(sp))

    def quad(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"), rect.as("geometry"))
      val right = prep(orders0).select(k.as("rk"), pt.as("geometry"))
      graft.join.SpatialJoin.sjoinQuadtree(left, right, predicate = "contains")
        .agg(count(lit(1)).as("n"))
    }
    time3("sjoin_quadtree AS-IS")(quad(id))
    time3("sjoin_quadtree repart")(quad(sp))

    def nearest(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"),
        st_point(nnLx + w / 2, nnLy + h / 2).as("geometry"))
      val right = prep(orders0).select(k.as("rk"),
        st_point(nnLx + w, nnLy + h).as("geometry"))
      graft.join.SpatialJoin.sjoinNearestPartitioned(left, right, k = 2,
          maxDistance = 8.0, distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    time3("sjoin_nearest AS-IS")(nearest(id))
    time3("sjoin_nearest repart")(nearest(sp))

    def nearestUnb(prep: DataFrame => DataFrame): DataFrame = {
      val left = prep(orders0).select(k.as("lk"),
        st_point(nnLx + w / 2, nnLy + h / 2).as("geometry"))
      val right = prep(orders0).select(k.as("rk"),
        st_point(nnLx + w, nnLy + h).as("geometry"))
      graft.join.SpatialJoin.sjoinNearestUnbounded(left, right, k = 2,
          distanceCol = Some("d"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    }
    time3("nearest_unbounded AS-IS")(nearestUnb(id))
    time3("nearest_unbounded repart")(nearestUnb(sp))

    spark.stop()
  }
}
