package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** Scratch: show the physical plan of a bbox-rule-refined spatial filter. */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val path = "/tmp/graft_probe_bbox"
    val df = (1 to 1000).toDF("k")
      .select(col("k"), st_rectangle(col("k") * 10.0, lit(0.0),
        col("k") * 10.0 + 5.0, lit(5.0)).as("geometry"))
    graft.io.GeoIO.writeGeoParquet(df, path)
    val q = spark.read.parquet(path)
      .filter(st_intersects(col("geometry"),
        graft.functions.st_geomfromtext(lit("POLYGON ((100 0, 125 0, 125 5, 100 5, 100 0))"))))
    q.explain("formatted")
    println("rows: " + q.count())
    spark.stop()
  }
}
