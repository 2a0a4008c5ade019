package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
object DriveJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val boxes = spark.range(100).select($"id".as("box_id"),
      st_rectangle(($"id" % 10).cast("double") * 4.0, ($"id" % 7).cast("double") * 4.0,
        ($"id" % 10).cast("double") * 4.0 + lit(3.0), ($"id" % 7).cast("double") * 4.0 + lit(3.0)).as("geometry"))
    val pts = spark.range(300).select($"id".as("pt_id"),
      st_point(($"id" % 43).cast("double"), ($"id" % 29).cast("double")).as("geometry"))
    println("== broadcast sjoin ==")
    val j = graft.join.SpatialJoin.sjoin(boxes, pts, "contains")
    println("match pairs: " + j.count())
    j.select($"box_id", $"pt_id", st_aswkt($"geometry_right").as("pt")).show(3, false)
    println("== partitioned sjoin (same result?) ==")
    val jp = graft.join.SpatialJoin.sjoinPartitioned(boxes, pts, 8.0, "contains")
    println("match pairs: " + jp.count())
    println("== probe: bad predicate name ==")
    try graft.join.SpatialJoin.sjoin(boxes, pts, "touches_maybe").count()
    catch { case e: Throwable => println("raises: " + (if (e.getCause != null) e.getCause.getMessage else e.getMessage).take(60)) }
    println("== probe: how=cross rejected ==")
    try graft.join.SpatialJoin.sjoin(boxes, pts, "intersects", how = "cross")
    catch { case e: Throwable => println("raises: " + e.getMessage.take(70)) }
    spark.stop()
  }
}
