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
    println("== scalar surface via SQL ==")
    spark.sql("""SELECT
      st_aswkt(st_buffer(st_point(0.0d,0.0d), 1.0d, 1, 'square', 'round', 5.0d, false)) AS buf,
      st_area(st_convex_hull(st_geomfromtext('MULTIPOINT ((0 0), (4 0), (0 4))'))) AS hull_area,
      st_geometrytype(st_geomfromtext('GEOMETRYCOLLECTION (POINT (0 0))')) AS gt,
      st_relate(st_geomfromtext('POINT (1 1)'), st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS de9im,
      st_dwithin(st_point(0.0d,0.0d), st_point(3.0d,4.0d), 5.0d) AS strictly_lt,
      st_aswkt(st_to_srid(st_set_srid(st_point(0.0d,0.0d), 4326), 3857)) AS reproj
    """).show(false)
    println("== probe: GC overlay + empty relate + curved cast error ==")
    spark.sql("""SELECT
      st_area(st_intersection(st_geomfromtext('GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))'),
                              st_geomfromtext('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS gc_ovl,
      st_relate(st_geomfromtext('GEOMETRYCOLLECTION EMPTY'), st_geomfromtext('POINT (1 1)')) AS rel_empty
    """).show(false)
    try spark.sql("SELECT st_cast(st_point(1.0d,2.0d), 'CircularString')").collect()
    catch { case e: Throwable => println("curved cast raises: " + e.getCause.getMessage.take(70)) }
    println("== probe: voronoi + delaunay agg via SQL group by ==")
    spark.sql("""SELECT grp, st_geometrytype(st_voronoi_polygons(g)) AS vor,
                        st_geometrytype(st_delaunay_triangles(g)) AS del
      FROM (SELECT id % 2 AS grp, st_point(CAST(id AS DOUBLE), CAST(id*id AS DOUBLE)) AS g FROM range(10))
      GROUP BY grp ORDER BY grp""").show(false)
    println("== entry() flagship ==")
    SparkEntry.entry(spark).show(2, false)
    spark.stop()
  }
}
