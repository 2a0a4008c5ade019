package graft.serde

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKTReader, WKTWriter}

/** Text-format geometry codecs (WKT / EWKT), thread-local JTS readers.
  * Mirrors the reference parsing surface `/root/reference/polars_st/parsing.py`
  * and serialization `/root/reference/src/functions.rs:703-732`. */
object GeoCodec {

  private val wktReaderTL = new ThreadLocal[WKTReader] {
    override def initialValue(): WKTReader = {
      val r = new WKTReader(EWKB.geometryFactory)
      r.setIsOldJtsCoordinateSyntaxAllowed(false)
      r
    }
  }

  def fromWkt(s: String): Geometry = wktReaderTL.get().read(s)

  /** `SRID=n;WKT` → geometry with SRID (reference `functions.rs:266-284`). */
  def fromEwkt(s: String): Geometry = {
    val t = s.trim
    if (t.regionMatches(true, 0, "SRID=", 0, 5)) {
      val semi = t.indexOf(';')
      require(semi > 0, s"invalid EWKT: $s")
      val srid = t.substring(5, semi).trim.toInt
      val g = fromWkt(t.substring(semi + 1))
      g.setSRID(srid)
      g
    } else fromWkt(t)
  }

  /** WKT writer matching reference defaults: rounding_precision=6, trim=true,
    * output_dimension=3 (`/root/reference/polars_st/geoexpr.py:348-369`). */
  def toWkt(g: Geometry, precision: Int = 6, trim: Boolean = true,
      outputDimension: Int = 3): String = {
    // JTS WKTWriter always trims trailing zeros (the reference's trim=True
    // default); trim=false (fixed-decimal output) is not supported by JTS —
    // documented divergence.
    val w = new WKTWriter(outputDimension)
    if (precision >= 0) w.setPrecisionModel(new PrecisionModel(math.pow(10, precision)))
    // JTS writes "POINT Z(1 2 3)"; GEOS/the reference write "POINT Z (1 2 3)"
    w.write(g).replace("Z(", "Z (").replace("M(", "M (")
  }

  def toEwkt(g: Geometry, precision: Int = 6, trim: Boolean = true,
      outputDimension: Int = 3): String = {
    val wkt = toWkt(g, precision, trim, outputDimension)
    if (g.getSRID != 0) s"SRID=${g.getSRID};$wkt" else wkt
  }

  /** Canonical empty result for geometry aggregations over empty input
    * (`/root/reference/tests/test_expressions.py:293-307`). */
  def emptyCollection: Geometry =
    EWKB.geometryFactory.createGeometryCollection()
}
