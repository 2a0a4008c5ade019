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
    println("== probe: fused chain via SQL (plan + values + null-in-null-out) ==")
    val fusedQ = spark.sql("""SELECT
      st_bounds(st_buffer(st_geomfromtext(w), 0.5d, 8, 'round', 'round', 5.0d, false)) AS bb,
      st_aswkt(st_get_point(st_exterior_ring(st_envelope(st_geomfromtext(w))), 1)) AS p1,
      st_x(st_geomfromwkb(st_aswkb(st_centroid(st_geomfromtext(w)), 2, false, false))) AS rt_x
      FROM VALUES ('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), (NULL) AS t(w)""")
    fusedQ.show(false)
    // VALUES sources constant-fold to LocalRelation before optimizer rules
    // run; a range-backed frame shows the fusion rule firing in a session
    // built WITHOUT GraftExtensions (retrofit via Geo.registerAll)
    val rangePlan = spark.sql("""SELECT
      st_area(st_intersection(st_rectangle(CAST(id AS DOUBLE), 0.0d, id + 3.0d, 3.0d),
                              st_rectangle(id + 1.0d, 1.0d, id + 5.0d, 4.0d))) AS ia
      FROM range(8)""").queryExecution.optimizedPlan.toString
    println("fusion fired in extension-less SQL session: " + rangePlan.contains("st_geo_fused"))
    println("== probe: PII scrub via Column API ==")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pii = Seq(
      ("mail a@b.io, server 10.0.0.1, call +44-20-7946-0958, see https://EX.com/x", 1),
      ("clean row", 2), (null: String, 3)).toDF("text", "id")
    pii.select($"id",
      graft.pipeline.Scrub.redactPii($"text").as("red"),
      graft.pipeline.Scrub.urlDomains($"text").as("dom"),
      graft.pipeline.Scrub.hasPii($"text").as("flag")).show(false)
    println("== entry() flagship ==")
    SparkEntry.entry(spark).show(2, false)
    spark.stop()
  }
}
