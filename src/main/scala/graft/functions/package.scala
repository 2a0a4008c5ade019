package graft

import org.apache.spark.sql.Column

/** Sugar API mirroring the reference's top-level `st.*` module
  * (`/root/reference/polars_st/sugar.py`): `st_area($"geometry")` etc. */
package object functions {

  import GeoUDFs._

  // constructors
  def st_geomfromtext(wkt: Column): Column = geomFromWkt(wkt)
  def st_geomfromewkt(ewkt: Column): Column = geomFromEwkt(ewkt)
  def st_geomfromwkb(wkb: Column): Column = geomFromWkb(wkb)
  def st_point(x: Column, y: Column): Column = point(x, y)
  def st_rectangle(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    rectangle(xmin, ymin, xmax, ymax)

  // measurement
  def st_area(g: Column): Column = area(g)
  def st_length(g: Column): Column = length(g)
  def st_x(g: Column): Column = x(g)
  def st_y(g: Column): Column = y(g)

  // predicates
  def st_intersects(a: Column, b: Column): Column = intersects(a, b)

  // constructive
  def st_centroid(g: Column): Column = centroid(g)
  def st_envelope(g: Column): Column = envelope(g)

  // serialization
  def st_aswkt(g: Column): Column = asWkt(g)
  def st_asewkt(g: Column): Column = asEwkt(g)

  // aggregations
  def st_union_all(g: Column): Column = graft.aggs.GeoAggs.unionAll(g)
  def st_total_bounds(g: Column): Column = graft.aggs.GeoAggs.totalBounds(g)
}
