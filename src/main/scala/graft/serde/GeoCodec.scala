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

  /** `SRID=n;WKT` → (srid, wkt); (0, trimmed input) when unprefixed. The
    * ONE EWKT-prefix parse — the UDF and fusion-kernel curved branches
    * share it so prefix edge cases cannot drift between tiers. */
  def splitEwkt(s: String): (Int, String) = {
    val t = s.trim
    if (t.regionMatches(true, 0, "SRID=", 0, 5)) {
      val semi = t.indexOf(';')
      require(semi > 0, s"invalid EWKT: $s")
      (t.substring(5, semi).trim.toInt, t.substring(semi + 1))
    } else (0, t)
  }

  /** `SRID=n;WKT` → geometry with SRID (reference `functions.rs:266-284`). */
  def fromEwkt(s: String): Geometry = {
    val (srid, rest) = splitEwkt(s)
    val g = fromWkt(rest)
    if (srid != 0) g.setSRID(srid)
    g
  }

  private val NumToken = "-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?".r

  /** Rewrite every ordinate token to exactly-`p`-decimal form. JTS's writer
    * can neither fix the decimal count nor round at a given decimal (its
    * PrecisionModel maps to significant digits, off by one) — so the full-
    * precision output is reparsed per token and formatted via BigDecimal
    * with HALF_EVEN, which is bit-identical to GEOS's C `%.*f` on the same
    * double. `trim` then strips trailing zeros (GEOS trim=true). */
  private[graft] def formatOrdinates(wkt: String, p: Int, trim: Boolean): String =
    NumToken.replaceAllIn(wkt, m => {
      val bd = new java.math.BigDecimal(m.matched.toDouble)
        .setScale(p, java.math.RoundingMode.HALF_EVEN)
      val out = if (trim) {
        val t = bd.stripTrailingZeros
        if (t.scale < 0) t.setScale(0).toPlainString else t.toPlainString
      } else bd.toPlainString
      java.util.regex.Matcher.quoteReplacement(out)
    })

  /** WKT writer matching reference defaults: rounding_precision=6, trim=true,
    * output_dimension=3, old_3d=false
    * (`/root/reference/polars_st/geoexpr.py:349-355`).
    * `trim=false` → fixed-decimal ordinates (GEOS `%.*f` style; 16 decimals
    * when precision < 0 i.e. "full"). `old3d=true` → the pre-SFA tagless 3D
    * form ("POINT (1 2 3)" instead of "POINT Z (1 2 3)"). */
  def toWkt(g: Geometry, precision: Int = 6, trim: Boolean = true,
      outputDimension: Int = 3, old3d: Boolean = false): String = {
    val w = new WKTWriter(outputDimension)
    // JTS writes "POINT Z(1 2 3)"; GEOS/the reference write "POINT Z (1 2 3)"
    var s = w.write(g).replace("Z(", "Z (").replace("M(", "M (")
    if (precision >= 0 || !trim)
      s = formatOrdinates(s, if (precision >= 0) precision else 16, trim)
    if (old3d) s = s.replace(" ZM ", " M ").replace(" Z ", " ")
    s
  }

  def toEwkt(g: Geometry, precision: Int = 6, trim: Boolean = true,
      outputDimension: Int = 3, old3d: Boolean = false): String = {
    val wkt = toWkt(g, precision, trim, outputDimension, old3d)
    if (g.getSRID != 0) s"SRID=${g.getSRID};$wkt" else wkt
  }

  /** Canonical empty result for geometry aggregations over empty input
    * (`/root/reference/tests/test_expressions.py:293-307`). */
  def emptyCollection: Geometry =
    EWKB.geometryFactory.createGeometryCollection()
}
