package graft

import org.apache.spark.sql.SparkSession

/** SQL-name registration for the full `ST_*` surface, the Spark analog of
  * the reference's plugin registration (`/root/reference/polars_st/
  * geoexpr.py:35-58`). Call once per session. */
object Geo {
  def registerAll(spark: SparkSession): Unit = {
    import graft.functions.GeoUDFs._
    val r = spark.udf
    r.register("st_geomfromtext", geomFromWkt)
    r.register("st_geomfromewkt", geomFromEwkt)
    r.register("st_geomfromwkb", geomFromWkb)
    r.register("st_point", point)
    r.register("st_rectangle", rectangle)
    r.register("st_area", area)
    r.register("st_length", length)
    r.register("st_x", x)
    r.register("st_y", y)
    r.register("st_intersects", intersects)
    r.register("st_centroid", centroid)
    r.register("st_envelope", envelope)
    r.register("st_aswkt", asWkt)
    r.register("st_asewkt", asEwkt)
    r.register("st_union_all", graft.aggs.GeoAggs.unionAll)
    r.register("st_total_bounds", graft.aggs.GeoAggs.totalBounds)
  }
}
