package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit
import graft.functions._

/** `st` namespace API mirroring the reference's `Expr.st` accessor
  * (`/root/reference/polars_st/geoexpr.py:61-75`, casting helper
  * `casting.py:30-33`):
  *
  * {{{
  * import graft.api._
  * df.select($"geometry".st.area, $"geometry".st.buffer(1.0).st.asWkt)
  * }}}
  *
  * Every method lowers to the corresponding [[graft.functions]] wrapper, so
  * `col.st.area` ≡ `st_area(col)`; the sugar module equivalence the
  * reference tests by reflection (`tests/test_consistency.py:36-77`) holds
  * by construction. Optional parameters take the reference's defaults.
  */
package object api {

  implicit final class GeoColumnOps(private val c: Column) extends AnyVal {
    def st: GeoNamespace = new GeoNamespace(c)
  }

  implicit final class GeoDataFrameOps(private val df: DataFrame) extends AnyVal {
    /** Frame-level sjoin sugar (reference `geodataframe.py:185-230`).
      * `validate`/`nullsEqual`/`coalesce` match the reference's kwargs —
      * see [[graft.join.SpatialJoin.sjoin]] for their exact semantics. */
    def sjoin(other: DataFrame, predicate: String = "intersects",
        how: String = "inner", leftGeom: String = "geometry",
        rightGeom: String = "geometry", suffix: String = "_right",
        validate: String = "m:m", nullsEqual: Boolean = false,
        coalesce: Option[Boolean] = None): DataFrame =
      graft.join.SpatialJoin.sjoin(df, other, predicate, how, leftGeom,
        rightGeom, suffix, validate = validate, nullsEqual = nullsEqual,
        coalesce = coalesce)

    /** Frame-level nearest-join sugar mirroring the public geopandas
      * `sjoin_nearest` argument surface (beyond the reference, which has
      * only the row-wise `nearest_points` kernel). Delegates to the
      * tiered door [[graft.join.SpatialJoin.sjoinNearest]]: broadcast
      * kNN under the guards, the cell tier for finite `maxDistance`,
      * [[graft.join.SpatialJoin.sjoinNearestUnbounded]]'s per-probe
      * bound discovery otherwise. */
    def sjoinNearest(other: DataFrame, k: Int = 1,
        maxDistance: Double = Double.PositiveInfinity, how: String = "inner",
        leftGeom: String = "geometry", rightGeom: String = "geometry",
        suffix: String = "_right", distanceCol: Option[String] = None,
        exclusive: Boolean = false): DataFrame =
      graft.join.SpatialJoin.sjoinNearest(df, other, k, maxDistance, how,
        leftGeom, rightGeom, suffix, distanceCol, exclusive)

    /** The frame's geometry columns: the named ones, or (like the
      * reference's default) every binary column when none are given. */
    private def geometryCols(cols: Seq[String]): Seq[String] =
      if (cols.nonEmpty) cols
      else df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.BinaryType).map(_.name).toSeq

    private def mapGeomCols(cols: Seq[String], f: Column => Column): DataFrame =
      geometryCols(cols).foldLeft(df)((d, n) => d.withColumn(n, f(d(n))))

    /** Frame-level serializers (reference `geodataframe.py:232-299`):
      * replace each geometry column by its serialized form, all other
      * columns untouched. No columns named → every binary column. */
    def stToWkt(cols: String*): DataFrame = mapGeomCols(cols, st_aswkt(_))
    def stToEwkt(cols: String*): DataFrame = mapGeomCols(cols, st_asewkt(_))
    def stToWkb(cols: String*): DataFrame = mapGeomCols(cols, st_aswkb(_))
    def stToGeoJson(cols: String*): DataFrame = mapGeomCols(cols, st_asgeojson(_))
  }

  final class GeoNamespace(private val c: Column) {
    // parsing / construction from this column
    def fromWkt: Column = st_geomfromtext(c)
    def fromEwkt: Column = st_geomfromewkt(c)
    def fromWkb: Column = st_geomfromwkb(c)
    def fromGeoJson: Column = st_geomfromgeojson(c)
    /** coords column → CircularString EWKB (curved; see [[linearize]]). */
    def circularString: Column = st_circularstring(c)
    /** arcs → chords; non-curved passes through. */
    def linearize: Column = st_linearize(c)
    def linearize(segsPerQuadrant: Column): Column = st_linearize(c, segsPerQuadrant)

    // accessors
    def geometryType: Column = st_geometrytype(c)
    def dimensions: Column = st_dimensions(c)
    def coordinateDimension: Column = st_coordinatedimension(c)
    def srid: Column = st_srid(c)
    def x: Column = st_x(c)
    def y: Column = st_y(c)
    def z: Column = st_z(c)
    def m: Column = st_m(c)
    def countCoordinates: Column = st_count_coordinates(c)
    def coordinates: Column = st_coordinates(c)
    def coordinates(outputDimension: Column): Column = st_coordinates(c, outputDimension)
    def exteriorRing: Column = st_exterior_ring(c)
    def interiorRings: Column = st_interior_rings(c)
    def countInteriorRings: Column = st_count_interior_rings(c)
    def getInteriorRing(i: Column): Column = st_get_interior_ring(c, i)
    def countGeometries: Column = st_count_geometries(c)
    def getGeometry(i: Column): Column = st_get_geometry(c, i)
    def countPoints: Column = st_count_points(c)
    def getPoint(i: Column): Column = st_get_point(c, i)
    def parts: Column = st_parts(c)
    def precision: Column = st_precision(c)
    def setPrecision(gridSize: Column, mode: String = "valid_output"): Column =
      st_set_precision(c, gridSize, lit(mode))
    def bounds: Column = st_bounds(c)

    // measurement
    def area: Column = st_area(c)
    def length: Column = st_length(c)
    def distance(other: Column): Column = st_distance(c, other)
    def hausdorffDistance(other: Column): Column = st_hausdorff_distance(c, other)
    def hausdorffDistance(other: Column, densify: Column): Column =
      st_hausdorff_distance(c, other, densify)
    def frechetDistance(other: Column): Column = st_frechet_distance(c, other)
    def frechetDistance(other: Column, densify: Column): Column =
      st_frechet_distance(c, other, densify)
    def minimumClearance: Column = st_minimum_clearance(c)

    // unary predicates
    def hasZ: Column = st_has_z(c)
    def hasM: Column = st_has_m(c)
    def hasArc: Column = st_has_arc(c)
    def isCcw: Column = st_is_ccw(c)
    def isClosed: Column = st_is_closed(c)
    def isEmpty: Column = st_is_empty(c)
    def isRing: Column = st_is_ring(c)
    def isSimple: Column = st_is_simple(c)
    def isValid: Column = st_is_valid(c)
    def isValidReason: Column = st_is_valid_reason(c)

    // binary predicates
    def intersects(other: Column): Column = st_intersects(c, other)
    def crosses(other: Column): Column = st_crosses(c, other)
    def contains(other: Column): Column = st_contains(c, other)
    def containsProperly(other: Column): Column = st_contains_properly(c, other)
    def coveredBy(other: Column): Column = st_covered_by(c, other)
    def covers(other: Column): Column = st_covers(c, other)
    def disjoint(other: Column): Column = st_disjoint(c, other)
    def overlaps(other: Column): Column = st_overlaps(c, other)
    def touches(other: Column): Column = st_touches(c, other)
    def within(other: Column): Column = st_within(c, other)
    def equalsTopo(other: Column): Column = st_equals(c, other)
    def equalsIdentical(other: Column): Column = st_equals_identical(c, other)
    def equalsExact(other: Column, tolerance: Column): Column =
      st_equals_exact(c, other, tolerance)
    def dwithin(other: Column, d: Column): Column = st_dwithin(c, other, d)
    def relate(other: Column): Column = st_relate(c, other)
    def relatePattern(other: Column, pattern: Column): Column =
      st_relate_pattern(c, other, pattern)
    def intersectsXY(px: Column, py: Column): Column = st_intersects_xy(c, px, py)
    def containsXY(px: Column, py: Column): Column = st_contains_xy(c, px, py)

    // overlay
    def union(other: Column): Column = st_union(c, other)
    def union(other: Column, gridSize: Column): Column = st_union(c, other, gridSize)
    def intersection(other: Column): Column = st_intersection(c, other)
    def intersection(other: Column, gridSize: Column): Column =
      st_intersection(c, other, gridSize)
    def difference(other: Column): Column = st_difference(c, other)
    def difference(other: Column, gridSize: Column): Column =
      st_difference(c, other, gridSize)
    def symmetricDifference(other: Column): Column = st_symmetric_difference(c, other)
    def symmetricDifference(other: Column, gridSize: Column): Column =
      st_symmetric_difference(c, other, gridSize)
    def unaryUnion: Column = st_unary_union(c)
    def disjointSubsetUnion: Column = st_disjoint_subset_union(c)
    def coverageUnion: Column = st_coverage_union(c)

    // constructive
    def boundary: Column = st_boundary(c)
    def buffer(distance: Column): Column = st_buffer(c, distance)
    def buffer(distance: Double): Column = st_buffer(c, lit(distance))
    def bufferWith(distance: Column, quadSegs: Column, capStyle: Column,
        joinStyle: Column, mitreLimit: Column, singleSided: Column): Column =
      st_buffer(c, distance, quadSegs, capStyle, joinStyle, mitreLimit, singleSided)
    def offsetCurve(distance: Column): Column = st_offset_curve(c, distance)
    def centroid: Column = st_centroid(c)
    def center: Column = st_center(c)
    def clipByRect(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
      st_clip_by_rect(c, xmin, ymin, xmax, ymax)
    def convexHull: Column = st_convex_hull(c)
    def concaveHull: Column = st_concave_hull(c)
    def concaveHull(ratio: Column): Column = st_concave_hull(c, ratio)
    def concaveHull(ratio: Column, allowHoles: Column): Column =
      st_concave_hull(c, ratio, allowHoles)
    def segmentize(maxSegmentLength: Column): Column = st_segmentize(c, maxSegmentLength)
    def envelope: Column = st_envelope(c)
    def extractUniquePoints: Column = st_extract_unique_points(c)
    def buildArea: Column = st_build_area(c)
    def makeValid: Column = st_make_valid(c)
    def normalize: Column = st_normalize(c)
    def node: Column = st_node(c)
    def pointOnSurface: Column = st_point_on_surface(c)
    def removeRepeatedPoints(tolerance: Column): Column =
      st_remove_repeated_points(c, tolerance)
    def reverse: Column = st_reverse(c)
    def simplify(tolerance: Column): Column = st_simplify(c, tolerance)
    def simplify(tolerance: Column, preserveTopology: Column): Column =
      st_simplify(c, tolerance, preserveTopology)
    def force2d: Column = st_force_2d(c)
    def force3d: Column = st_force_3d(c)
    def force3d(z: Column): Column = st_force_3d(c, z)
    def flipCoordinates: Column = st_flip_coordinates(c)
    def minimumRotatedRectangle: Column = st_minimum_rotated_rectangle(c)
    def snap(other: Column, tolerance: Column): Column = st_snap(c, other, tolerance)
    def shortestLine(other: Column): Column = st_shortest_line(c, other)
    def sharedPaths(other: Column): Column = st_shared_paths(c, other)
    def cast(into: Column): Column = st_cast(c, into)
    def cast(into: String): Column = st_cast(c, lit(into))
    def multi: Column = st_multi(c)

    // affine / linear referencing
    def affineTransform(matrix: Column): Column = st_affine_transform(c, matrix)
    def translate(dx: Column, dy: Column): Column = st_translate(c, dx, dy)
    def translate(dx: Column, dy: Column, dz: Column): Column = st_translate(c, dx, dy, dz)
    def rotate(angleDeg: Column): Column = st_rotate(c, angleDeg)
    def rotate(angleDeg: Column, origin: Column): Column = st_rotate(c, angleDeg, origin)
    def scale(sx: Column, sy: Column): Column = st_scale(c, sx, sy)
    def scale(sx: Column, sy: Column, sz: Column, origin: Column): Column =
      st_scale(c, sx, sy, sz, origin)
    def skew(xDeg: Column, yDeg: Column): Column = st_skew(c, xDeg, yDeg)
    def skew(xDeg: Column, yDeg: Column, origin: Column): Column =
      st_skew(c, xDeg, yDeg, origin)
    def skew(xDeg: Column, yDeg: Column, zDeg: Column, origin: Column): Column =
      st_skew(c, xDeg, yDeg, zDeg, origin)
    def interpolate(distance: Column): Column = st_interpolate(c, distance)
    def interpolate(distance: Column, normalized: Column): Column =
      st_interpolate(c, distance, normalized)
    def project(other: Column): Column = st_project(c, other)
    def project(other: Column, normalized: Column): Column = st_project(c, other, normalized)
    def lineMerge: Column = st_line_merge(c)
    def lineMerge(directed: Column): Column = st_line_merge(c, directed)

    // CRS
    def setSrid(srid: Column): Column = st_set_srid(c, srid)
    def toSrid(srid: Column): Column = st_to_srid(c, srid)

    // serialization
    def asWkt: Column = st_aswkt(c)
    def asWkt(precision: Column): Column = st_aswkt(c, precision)
    def asWkt(precision: Int, trim: Boolean, outputDimension: Int = 3,
        old3d: Boolean = false): Column =
      st_aswkt(c, lit(precision), lit(trim), lit(outputDimension), lit(old3d))
    def asEwkt: Column = st_asewkt(c)
    def asEwkt(precision: Int, trim: Boolean, outputDimension: Int = 3,
        old3d: Boolean = false): Column =
      st_asewkt(c, lit(precision), lit(trim), lit(outputDimension), lit(old3d))
    def asWkb: Column = st_aswkb(c)
    def asWkb(outputDimension: Column, bigEndian: Column, includeSrid: Column): Column =
      st_aswkb(c, outputDimension, bigEndian, includeSrid)
    def asGeoJson: Column = st_asgeojson(c)
    def asGeoJson(indent: Int): Column = st_asgeojson(c, lit(indent))

    // aggregations over this column
    def unionAll: Column = st_union_all(c)
    def unionAll(gridSize: Double): Column = st_union_all(c, gridSize)
    def totalBounds: Column = st_total_bounds(c)
    def collect: Column = st_collect(c)
    def intersectionAll: Column = st_intersection_all(c)
    def intersectionAll(gridSize: Double): Column = st_intersection_all(c, gridSize)
    def differenceAll: Column = st_difference_all(c)
    def differenceAll(gridSize: Double): Column = st_difference_all(c, gridSize)
    def differenceAllOrdered(order: Column): Column = st_difference_all_ordered(c, order)
    def differenceAllOrdered(order: Column, gridSize: Double): Column =
      st_difference_all_ordered(c, order, gridSize)
    def symmetricDifferenceAll: Column = st_symmetric_difference_all(c)
    def symmetricDifferenceAll(gridSize: Double): Column =
      st_symmetric_difference_all(c, gridSize)
    def coverageUnionAll: Column = st_coverage_union_all(c)
    def polygonize: Column = st_polygonize(c)
    def voronoiPolygons: Column = st_voronoi_polygons(c)
    def voronoiPolygons(tolerance: Double, onlyEdges: Boolean = false,
        extendTo: Seq[Double] = null): Column =
      st_voronoi_polygons(c, tolerance, onlyEdges, extendTo)
    def delaunayTriangles: Column = st_delaunay_triangles(c)
    def delaunayTriangles(tolerance: Double, onlyEdges: Boolean): Column =
      st_delaunay_triangles(c, tolerance, onlyEdges)
  }
}
