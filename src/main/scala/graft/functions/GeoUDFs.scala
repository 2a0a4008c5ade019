package graft.functions

import graft.serde.{EWKB, GeoCodec}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.locationtech.jts.geom._

/** Scalar geometry function surface, phase-0 slice.
  *
  * Each op is a null-safe Scala UDF over EWKB bytes (parse → JTS compute →
  * serialize, the same per-op cost model the reference accepts,
  * `/root/reference/README.md:44`). Column wrappers give the Scala API;
  * [[graft.Geo.registerAll]] registers the `ST_*` SQL names.
  */
object GeoUDFs {

  // ------------------------------------------------------- null-safe lifts

  /** unary geometry → geometry (propagates input SRID to the result, like
    * GEOS ops do in the reference kernels). */
  private[functions] def uG(f: Geometry => Geometry): Array[Byte] => Array[Byte] =
    b => if (b == null) null
    else {
      val g = EWKB.read(b)
      val r = f(g)
      if (r == null) null
      else {
        if (r.getSRID == 0 && g.getSRID != 0) r.setSRID(g.getSRID)
        EWKB.write(r)
      }
    }

  private[functions] def uD(f: Geometry => Double): Array[Byte] => Option[Double] =
    b => if (b == null) None else Some(f(EWKB.read(b)))

  private[functions] def uS(f: Geometry => String): Array[Byte] => String =
    b => if (b == null) null else f(EWKB.read(b))

  private[functions] def bB(f: (Geometry, Geometry) => Boolean)
      : (Array[Byte], Array[Byte]) => Option[Boolean] =
    (a, b) => if (a == null || b == null) None else Some(f(EWKB.read(a), EWKB.read(b)))

  // ---------------------------------------------------------- constructors

  val geomFromWkt: UserDefinedFunction = udf((s: String) =>
    if (s == null) null else EWKB.write(GeoCodec.fromWkt(s)))

  val geomFromEwkt: UserDefinedFunction = udf((s: String) =>
    if (s == null) null else EWKB.write(GeoCodec.fromEwkt(s)))

  /** WKB/EWKB bytes → normalized EWKB (reference `from_wkb`). */
  val geomFromWkb: UserDefinedFunction = udf((b: Array[Byte]) =>
    if (b == null) null else EWKB.write(EWKB.read(b)))

  val point: UserDefinedFunction = udf((x: Double, y: Double) =>
    EWKB.write(EWKB.geometryFactory.createPoint(new Coordinate(x, y))))

  /** `[xmin,ymin,xmax,ymax]` → Polygon box (reference `rectangle`,
    * `/root/reference/polars_st/parsing.py:250-282`). */
  val rectangle: UserDefinedFunction =
    udf((xmin: Double, ymin: Double, xmax: Double, ymax: Double) => {
      val f = EWKB.geometryFactory
      EWKB.write(f.createPolygon(Array(
        new Coordinate(xmin, ymin), new Coordinate(xmax, ymin),
        new Coordinate(xmax, ymax), new Coordinate(xmin, ymax),
        new Coordinate(xmin, ymin))))
    })

  // ----------------------------------------------------------- measurement

  val area: UserDefinedFunction = udf(uD(_.getArea))
  val length: UserDefinedFunction = udf(uD(_.getLength))

  /** NaN (not null) for non-Point/empty, reference `functions.rs:445-457`. */
  val x: UserDefinedFunction = udf(uD {
    case p: Point if !p.isEmpty => p.getX
    case _ => Double.NaN
  })
  val y: UserDefinedFunction = udf(uD {
    case p: Point if !p.isEmpty => p.getY
    case _ => Double.NaN
  })

  // ------------------------------------------------------------ predicates

  val intersects: UserDefinedFunction = udf(bB(_ intersects _))

  // ---------------------------------------------------------- constructive

  val centroid: UserDefinedFunction = udf(uG(_.getCentroid))
  val envelope: UserDefinedFunction = udf(uG(_.getEnvelope))

  // --------------------------------------------------------- serialization

  val asWkt: UserDefinedFunction = udf(uS(GeoCodec.toWkt(_)))
  val asEwkt: UserDefinedFunction = udf(uS(GeoCodec.toEwkt(_)))
}
