package graft
import org.apache.spark.sql.SparkSession
/** Manual end-to-end drive of the public surface (SQL + entry). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Geo.registerAll(spark)
    println("== SQL surface ==")
    spark.sql("SELECT st_aswkt(st_centroid(st_rectangle(0.0d, 0.0d, 4.0d, 2.0d))) AS c, st_area(st_rectangle(0.0d,0.0d,4.0d,2.0d)) AS a").show(false)
    spark.sql("SELECT st_asewkt(st_geomfromewkt('SRID=4326;POINT (3 7)')) AS ewkt, st_x(st_geomfromtext('POINT (3 7)')) AS x").show(false)
    println("== probe: null + non-point x + predicate ==")
    spark.sql("SELECT st_aswkt(st_geomfromtext(NULL)) AS null_in, st_x(st_geomfromtext('LINESTRING (0 0, 1 1)')) AS x_nonpoint, st_intersects(st_point(0.5d,0.5d), st_rectangle(0.0d,0.0d,1.0d,1.0d)) AS hit").show(false)
    println("== probe: union_all over all-null input ==")
    spark.sql("SELECT st_aswkt(st_union_all(g)) AS u FROM (SELECT st_geomfromtext(CAST(NULL AS STRING)) AS g FROM range(3))").show(false)
    println("== probe: invalid WKT ==")
    try spark.sql("SELECT st_geomfromtext('NOT A GEOM')").collect()
    catch { case e: Throwable => println("error surfaced: " + e.getClass.getName) }
    println("== entry() flagship ==")
    SparkEntry.entry(spark).show(5, false)
    spark.stop()
  }
}
