package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** Empirical probe for set_precision oracle constants (run once, bake). */
object Probe7 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val k = col("id") * 7 + 1
    val xmin = (k % 1000000).cast("double") * 16.0
    val ymin = (k % 16).cast("double") * 16.0
    val w = lit(1.0) + (k % 13).cast("double") / 4.0
    val h = lit(1.0) + (k % 11).cast("double") / 4.0
    val rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    val df = spark.range(40).select(k.as("k"),
      st_area(st_set_precision(rect, lit(0.25))).as("sp_area"),
      (st_area(st_set_precision(rect, lit(0.25))) === w * h).as("area_eq"),
      st_is_empty(st_set_precision(rect, lit(64.0))).as("sp_empty"),
      st_geometrytype(st_set_precision(rect, lit(64.0))).as("sp_gt"),
      graft.functions.st_count_coordinates(
        st_set_precision(rect, lit(0.25), lit("no_topo"))).as("sp_n"),
      st_geometrytype(st_set_precision(rect, lit(64.0), lit("keep_collapsed"))).as("sp_kc_gt"),
      st_aswkt(st_set_precision(rect, lit(64.0), lit("keep_collapsed"))).as("sp_kc_wkt"))
    df.show(40, truncate = false)
    println(df.groupBy("area_eq", "sp_empty", "sp_gt", "sp_n", "sp_kc_gt").count().collect().mkString("\n"))
    spark.stop()
  }
}
