package graft.functions

import graft.serde.EWKB
import org.locationtech.jts.geom._
import org.locationtech.jts.linearref.LengthIndexedLine
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._
import scala.collection.mutable

/** GeoJSON codec (reference `from_geojson`/`to_geojson`,
  * `/root/reference/src/functions.rs:286-288,748-754`). jts-io-common is
  * not on the classpath, so this is a small self-contained implementation
  * over Jackson (which ships with Spark). Reads Geometry, Feature (geometry
  * member) and FeatureCollection (→ GeometryCollection). */
object GeoJson {

  private def fact: GeometryFactory = EWKB.geometryFactory
  private val mapper = new ObjectMapper()

  def read(s: String): Geometry = readNode(mapper.readTree(s))

  private def readNode(n: JsonNode): Geometry = {
    val t = Option(n.get("type")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("GeoJSON missing type"))
    def member(name: String): JsonNode = {
      val m = n.get(name)
      if (m == null) throw new IllegalArgumentException(
        s"GeoJSON $t missing '$name'")
      m
    }
    t match {
      case "Feature" =>
        // RFC 7946: "geometry": null is a valid unlocated Feature
        val g = n.get("geometry")
        if (g == null || g.isNull) fact.createGeometryCollection()
        else readNode(g)
      case "FeatureCollection" =>
        val gs = member("features").elements().asScala.map(readNode).toArray
        fact.createGeometryCollection(gs)
      case "GeometryCollection" =>
        val gs = member("geometries").elements().asScala.map(readNode).toArray
        fact.createGeometryCollection(gs)
      case "Point" =>
        // our own writer emits coordinates:[] for POINT EMPTY
        val c = member("coordinates")
        if (!c.elements().hasNext) fact.createPoint()
        else fact.createPoint(coord(c))
      case "MultiPoint" =>
        fact.createMultiPoint(arr(n.get("coordinates")).map(c => fact.createPoint(coord(c))).toArray)
      case "LineString" => fact.createLineString(coords(n.get("coordinates")))
      case "MultiLineString" =>
        fact.createMultiLineString(arr(n.get("coordinates")).map(l => fact.createLineString(coords(l))).toArray)
      case "Polygon" => polygonOf(n.get("coordinates"))
      case "MultiPolygon" =>
        fact.createMultiPolygon(arr(n.get("coordinates")).map(polygonOf).toArray)
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
    }
  }

  private def arr(n: JsonNode): Seq[JsonNode] = n.elements().asScala.toSeq

  private def coord(n: JsonNode): Coordinate = {
    val vs = arr(n).map(_.asDouble())
    if (vs.length >= 3) new Coordinate(vs(0), vs(1), vs(2)) else new Coordinate(vs(0), vs(1))
  }

  private def coords(n: JsonNode): Array[Coordinate] = arr(n).map(coord).toArray

  private def polygonOf(n: JsonNode): Polygon = {
    val rings = arr(n).map(r => fact.createLinearRing(coords(r)))
    if (rings.isEmpty) fact.createPolygon()
    else fact.createPolygon(rings.head, rings.tail.toArray)
  }

  def write(g: Geometry): String = {
    val sb = new StringBuilder(64)
    writeGeom(sb, g)
    sb.toString()
  }

  /** `indent >= 0` → pretty-printed (reference `to_geojson(indent)`,
    * `functions.rs:748-754`): 0 inserts newlines only, n indents n spaces
    * per level. Exact whitespace layout follows Jackson's pretty printer
    * (documented divergence from GEOS's formatter — same JSON value). */
  def write(g: Geometry, indent: Int): String = {
    val compact = write(g)
    if (indent < 0) compact
    else {
      val printer = new com.fasterxml.jackson.core.util.DefaultPrettyPrinter()
      val ind = new com.fasterxml.jackson.core.util.DefaultIndenter(" " * indent, "\n")
      printer.indentObjectsWith(ind)
      printer.indentArraysWith(ind)
      mapper.writer(printer).writeValueAsString(mapper.readTree(compact))
    }
  }

  private def num(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def writeCoord(sb: StringBuilder, cs: CoordinateSequence, i: Int): Unit = {
    sb += '['
    sb ++= num(cs.getX(i)); sb += ','; sb ++= num(cs.getY(i))
    if (cs.hasZ && !cs.getZ(i).isNaN) { sb += ','; sb ++= num(cs.getZ(i)) }
    sb += ']'
  }

  private def writeSeq(sb: StringBuilder, cs: CoordinateSequence): Unit = {
    sb += '['
    var i = 0
    while (i < cs.size()) {
      if (i > 0) sb += ','
      writeCoord(sb, cs, i)
      i += 1
    }
    sb += ']'
  }

  private def writeGeom(sb: StringBuilder, g: Geometry): Unit = g match {
    case p: Point =>
      sb ++= "{\"type\":\"Point\",\"coordinates\":"
      if (p.isEmpty) sb ++= "[]" else writeCoord(sb, p.getCoordinateSequence, 0)
      sb += '}'
    case l: LineString =>
      sb ++= "{\"type\":\"LineString\",\"coordinates\":"
      writeSeq(sb, l.getCoordinateSequence)
      sb += '}'
    case p: Polygon =>
      sb ++= "{\"type\":\"Polygon\",\"coordinates\":["
      if (!p.isEmpty) {
        writeSeq(sb, p.getExteriorRing.getCoordinateSequence)
        for (i <- 0 until p.getNumInteriorRing) {
          sb += ','
          writeSeq(sb, p.getInteriorRingN(i).getCoordinateSequence)
        }
      }
      sb ++= "]}"
    case m: MultiPoint =>
      sb ++= "{\"type\":\"MultiPoint\",\"coordinates\":["
      for (i <- 0 until m.getNumGeometries) {
        if (i > 0) sb += ','
        writeCoord(sb, m.getGeometryN(i).asInstanceOf[Point].getCoordinateSequence, 0)
      }
      sb ++= "]}"
    case m: MultiLineString =>
      sb ++= "{\"type\":\"MultiLineString\",\"coordinates\":["
      for (i <- 0 until m.getNumGeometries) {
        if (i > 0) sb += ','
        writeSeq(sb, m.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence)
      }
      sb ++= "]}"
    case m: MultiPolygon =>
      sb ++= "{\"type\":\"MultiPolygon\",\"coordinates\":["
      for (i <- 0 until m.getNumGeometries) {
        if (i > 0) sb += ','
        val p = m.getGeometryN(i).asInstanceOf[Polygon]
        sb += '['
        if (!p.isEmpty) {
          writeSeq(sb, p.getExteriorRing.getCoordinateSequence)
          for (j <- 0 until p.getNumInteriorRing) {
            sb += ','
            writeSeq(sb, p.getInteriorRingN(j).getCoordinateSequence)
          }
        }
        sb += ']'
      }
      sb ++= "]}"
    case c: GeometryCollection =>
      sb ++= "{\"type\":\"GeometryCollection\",\"geometries\":["
      for (i <- 0 until c.getNumGeometries) {
        if (i > 0) sb += ','
        writeGeom(sb, c.getGeometryN(i))
      }
      sb ++= "]}"
    case other => throw new IllegalArgumentException(
      s"unsupported geometry type for GeoJSON: ${other.getGeometryType}")
  }
}

/** GEOS SharedPaths / directed line-merge analogs (JTS has neither).
  * Reference `functions.rs:1757-1763` and `line_merge(directed=True)`. */
object SharedPathsImpl {

  private def fact: GeometryFactory = EWKB.geometryFactory

  private def linealOr(g: Geometry, name: String): Geometry = g match {
    case _: LineString | _: MultiLineString => g
    case _ => throw new IllegalArgumentException(
      s"$name requires lineal geometry, got ${g.getGeometryType}")
  }

  /** Shared linework of a and b split by direction agreement:
    * GEOMETRYCOLLECTION(MULTILINESTRING forward, MULTILINESTRING backward). */
  def sharedPaths(a: Geometry, b: Geometry): Geometry = {
    linealOr(a, "shared_paths"); linealOr(b, "shared_paths")
    val shared = a.intersection(b)
    val lines = org.locationtech.jts.geom.util.LinearComponentExtracter
      .getLines(shared).asScala.toSeq.map(_.asInstanceOf[LineString]).filter(!_.isEmpty)
    // index builds are O(input) — once per call, not once per component
    val la = new LengthIndexedLine(a)
    val lb = new LengthIndexedLine(b)
    val (fw, bw) = lines.partition { l =>
      val p0 = l.getCoordinateN(0)
      val p1 = l.getCoordinateN(1)
      val dirA = la.indexOf(p1) >= la.indexOf(p0)
      val dirB = lb.indexOf(p1) >= lb.indexOf(p0)
      dirA == dirB
    }
    fact.createGeometryCollection(Array(
      fact.createMultiLineString(fw.toArray),
      fact.createMultiLineString(bw.toArray)))
  }

  /** Merge lines only where directions agree (chains through nodes with
    * in-degree 1 and out-degree 1), GEOS line_merge_directed analog. */
  def directedLineMerge(g: Geometry): Geometry = {
    val lines = org.locationtech.jts.geom.util.LinearComponentExtracter
      .getLines(g).asScala.toSeq.map(_.asInstanceOf[LineString]).filter(!_.isEmpty)
    if (lines.isEmpty) return fact.createGeometryCollection()

    case class Key(x: Double, y: Double)
    def keyOf(c: Coordinate) = Key(c.x, c.y)

    val outBy = mutable.Map.empty[Key, mutable.Buffer[Int]]
    val inBy = mutable.Map.empty[Key, mutable.Buffer[Int]]
    lines.zipWithIndex.foreach { case (l, i) =>
      outBy.getOrElseUpdate(keyOf(l.getCoordinateN(0)), mutable.Buffer()) += i
      inBy.getOrElseUpdate(keyOf(l.getCoordinateN(l.getNumPoints - 1)), mutable.Buffer()) += i
    }
    val used = Array.fill(lines.length)(false)
    val merged = mutable.Buffer.empty[LineString]
    for (start <- lines.indices if !used(start)) {
      // walk back to the chain head
      var head = start
      var guard = 0
      var continue = true
      while (continue && guard <= lines.length) {
        guard += 1
        val k = keyOf(lines(head).getCoordinateN(0))
        (inBy.getOrElse(k, Nil).toList, outBy.getOrElse(k, Nil).toList) match {
          case (List(prev), List(_)) if !used(prev) && prev != head && keyOf(
            lines(prev).getCoordinateN(0)) != k => head = prev
          case _ => continue = false
        }
      }
      // walk forward collecting
      val coords = mutable.Buffer.empty[Coordinate]
      var cur = head
      var walking = true
      while (walking) {
        used(cur) = true
        val cs = lines(cur).getCoordinates
        if (coords.isEmpty) coords ++= cs else coords ++= cs.drop(1)
        val k = keyOf(cs.last)
        (outBy.getOrElse(k, Nil).toList, inBy.getOrElse(k, Nil).toList) match {
          case (List(nxt), List(_)) if !used(nxt) => cur = nxt
          case _ => walking = false
        }
      }
      merged += fact.createLineString(coords.toArray)
    }
    if (merged.size == 1) merged.head
    else fact.createMultiLineString(merged.toArray)
  }
}

/** Typed geometry cast (reference `functions.rs:61-177`; valid matrix at
  * `geoexpr.py:446-468`). Curved types (CircularString, MultiCurve,
  * MultiSurface, CurvePolygon) are not supported by JTS — casting to them
  * raises (documented divergence, SURVEY.md §7). */
object CastImpl {

  private def fact: GeometryFactory = EWKB.geometryFactory

  def cast(g: Geometry, into: String): Geometry = {
    val target = into.trim.toLowerCase.replace("_", "").replace(" ", "")
    val from = g.getGeometryType.toLowerCase
    if (from == target) {
      // shed any curved-source marker: this path returns the PARSED
      // (= linearized) geometry, same as the unfused serialize would
      val c = g.copy(); c.setUserData(null); return c
    }
    (g, target) match {
      case (_, "geometrycollection") =>
        g match {
          case c: GeometryCollection =>
            fact.createGeometryCollection(
              Array.tabulate(c.getNumGeometries)(c.getGeometryN(_).copy()))
          case _ => fact.createGeometryCollection(Array(g.copy()))
        }
      case (p: Point, "multipoint") =>
        if (p.isEmpty) fact.createMultiPoint()
        else fact.createMultiPoint(Array(p.copy().asInstanceOf[Point]))
      case (l: LineString, "multipoint") =>
        fact.createMultiPoint(
          Array.tabulate(l.getNumPoints)(i => l.getPointN(i)))
      case (m: MultiPoint, "linestring") =>
        val coords = (0 until m.getNumGeometries)
          .map(m.getGeometryN(_).asInstanceOf[Point])
          .filter(!_.isEmpty).map(_.getCoordinate)
        fact.createLineString(coords.toArray)
      case (l: LineString, "multilinestring") =>
        if (l.isEmpty) fact.createMultiLineString()
        else fact.createMultiLineString(Array(l.copy().asInstanceOf[LineString]))
      case (m: MultiLineString, "polygon") =>
        if (m.getNumGeometries == 0) fact.createPolygon()
        else {
          val rings = (0 until m.getNumGeometries).map(i =>
            fact.createLinearRing(
              m.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence))
          fact.createPolygon(rings.head, rings.tail.toArray)
        }
      case (p: Polygon, "multipolygon") =>
        if (p.isEmpty) fact.createMultiPolygon()
        else fact.createMultiPolygon(Array(p.copy().asInstanceOf[Polygon]))
      case (_, "circularstring" | "compoundcurve" | "curvepolygon" | "multicurve" |
               "multisurface" | "curve" | "surface") =>
        throw new UnsupportedOperationException(
          s"curved geometry type '$into' is not supported by JTS")
      case _ =>
        throw new IllegalArgumentException(
          s"invalid cast from ${g.getGeometryType} to $into")
    }
  }
}

/** Offline CRS transforms (reference `to_srid`, `functions.rs:1868-1939`,
  * backed there by proj4rs + an embedded EPSG database). This environment
  * is zero-egress with no proj library on the classpath, so the projections
  * needed in practice are implemented closed-form from the published
  * formulas (Snyder, *Map Projections — A Working Manual*, USGS PP 1395):
  *
  * - EPSG:4326 (WGS84 lon/lat) — the hub; all transforms route through it
  * - EPSG:3857 spherical pseudo-Mercator (web mercator)
  * - EPSG:3395 ellipsoidal World Mercator
  * - EPSG:3035 ETRS89-LAEA Europe (Snyder §24)
  * - EPSG:2154 Lambert-93 France / EPSG:3978 Canada Atlas (Lambert
  *   Conformal Conic 2SP, Snyder §15)
  * - EPSG:5070 Conus Albers / EPSG:3577 Australian Albers (Albers equal-area
  *   conic, Snyder §14)
  * - EPSG:3413 Arctic / EPSG:3031 Antarctic polar stereographic (variant B,
  *   Snyder §21)
  * - EPSG:32601-32660 / 32701-32760 — WGS84 UTM zones N/S (ellipsoidal
  *   Transverse Mercator, Snyder §8 series; sub-mm round-trip accuracy)
  *
  * Other pairs raise (documented gap, SURVEY.md §7). */
object CrsImpl {

  private val R = 6378137.0            // WGS84 semi-major
  private val F = 1.0 / 298.257223563  // WGS84 flattening
  private val E2 = F * (2 - F)
  private val E = math.sqrt(E2)
  private val EP2 = E2 / (1 - E2)
  private val K0 = 0.9996              // UTM scale factor

  private def isUtmNorth(srid: Int) = srid >= 32601 && srid <= 32660
  private def isUtmSouth(srid: Int) = srid >= 32701 && srid <= 32760
  /** Codes handled by the original closed-form families (kept on their own
    * code paths so long-standing results stay bit-identical). */
  private def isClosedForm(srid: Int): Boolean =
    srid == 4326 || srid == 3857 || srid == 3395 || srid == 3035 ||
      LccSpecs.contains(srid) || AlbersSpecs.contains(srid) ||
      PolarSpecs.contains(srid) || isUtmNorth(srid) || isUtmSouth(srid)
  def isSupported(srid0: Int): Boolean = {
    val srid = EsriAliases.getOrElse(srid0, srid0)
    isClosedForm(srid) || EpsgDb.isSupported(srid)
  }

  // --------------------- Lambert Conformal Conic 2SP (Snyder §15, ellipsoid)
  // EPSG:2154 RGF93 / Lambert-93 (France): lat1=49, lat2=44, lat0=46.5,
  //   lon0=3, FE=700000, FN=6600000 (GRS80 ≈ WGS84, same note as LAEA;
  //   validated: Paris forward matches the published grid to centimeters,
  //   round trip < 1e-13°).
  // EPSG:3978 NAD83 / Canada Atlas Lambert: lat1=49, lat2=77, lat0=49,
  //   lon0=-95, FE=0, FN=0.
  private final class Lcc(lat1Deg: Double, lat2Deg: Double, lat0Deg: Double,
      lon0Deg: Double, fe: Double, fn: Double) {
    private val lon0 = math.toRadians(lon0Deg)
    private def mOf(phi: Double) = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - E2 * s * s)
    }
    private def tOf(phi: Double) = {
      val esin = E * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - esin) / (1 + esin), E / 2)
    }
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val n = (math.log(mOf(phi1)) - math.log(mOf(phi2))) /
      (math.log(tOf(phi1)) - math.log(tOf(phi2)))
    private val f = mOf(phi1) / (n * math.pow(tOf(phi1), n))
    private val rho0 = R * f * math.pow(tOf(math.toRadians(lat0Deg)), n)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = R * f * math.pow(tOf(math.toRadians(latDeg)), n)
      val theta = n * (math.toRadians(lonDeg) - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }
    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val sg = math.signum(n) // Snyder: reverse x/y/ρ signs when n < 0
      val x = x0 - fe; val y = rho0 - (y0 - fn)
      val rho = sg * math.sqrt(x * x + y * y)
      val t = math.pow(rho / (R * f), 1 / n)
      val theta = math.atan2(sg * x, sg * y)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 8) { // fixed-point (Snyder 7-9), converges in ~4 iterations
        val esin = E * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - esin) / (1 + esin), E / 2))
        i += 1
      }
      (math.toDegrees(theta / n + lon0), math.toDegrees(phi))
    }
  }

  private val LccSpecs: Map[Int, Lcc] = Map(
    2154 -> new Lcc(49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),
    3978 -> new Lcc(49.0, 77.0, 49.0, -95.0, 0.0, 0.0))

  // ----------------------- Albers Equal-Area Conic 2SP (Snyder §14, ellipsoid)
  // EPSG:5070 NAD83 / Conus Albers: lat1=29.5, lat2=45.5, lat0=23, lon0=-96,
  //   FE=0, FN=0 (GRS80 ≈ WGS84, same flattening note as LAEA).
  // EPSG:3577 GDA94 / Australian Albers: lat1=-18, lat2=-36, lat0=0,
  //   lon0=132, FE=0, FN=0.
  private final class Albers(lat1Deg: Double, lat2Deg: Double, lat0Deg: Double,
      lon0Deg: Double, fe: Double, fn: Double) {
    private val lon0 = math.toRadians(lon0Deg)
    private def mOf(phi: Double) = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - E2 * s * s)
    }
    private def qOf(phi: Double): Double = {
      val esin = E * math.sin(phi)
      (1 - E2) * (math.sin(phi) / (1 - esin * esin) -
        (1 / (2 * E)) * math.log((1 - esin) / (1 + esin)))
    }
    private val m1 = mOf(math.toRadians(lat1Deg))
    private val m2 = mOf(math.toRadians(lat2Deg))
    private val q1 = qOf(math.toRadians(lat1Deg))
    private val q2 = qOf(math.toRadians(lat2Deg))
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1) // Snyder 14-14
    private val c = m1 * m1 + n * q1                // Snyder 14-13
    private val rho0 = R * math.sqrt(c - n * qOf(math.toRadians(lat0Deg))) / n

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = R * math.sqrt(c - n * qOf(math.toRadians(latDeg))) / n // 14-12
      val theta = n * (math.toRadians(lonDeg) - lon0)                  // 14-4
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }
    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val sg = math.signum(n) // Snyder p.101: reverse signs when n < 0
      val x = x0 - fe; val y = rho0 - (y0 - fn)
      val rho = sg * math.sqrt(x * x + y * y)
      val theta = math.atan2(sg * x, sg * y)
      val q = (c - rho * rho * n * n / (R * R)) / n // Snyder 14-19
      // φ from q by fixed-point iteration (Snyder 3-16)
      var phi = math.asin(math.max(-1, math.min(1, q / 2)))
      var i = 0
      while (i < 10) {
        val sinP = math.sin(phi)
        val esin = E * sinP
        val one = 1 - esin * esin
        phi += one * one / (2 * math.cos(phi)) * (q / (1 - E2) -
          sinP / one + (1 / (2 * E)) * math.log((1 - esin) / (1 + esin)))
        i += 1
      }
      (math.toDegrees(theta / n + lon0), math.toDegrees(phi))
    }
  }

  private val AlbersSpecs: Map[Int, Albers] = Map(
    5070 -> new Albers(29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    3577 -> new Albers(-18.0, -36.0, 0.0, 132.0, 0.0, 0.0))

  // ------------------- Polar Stereographic variant B (Snyder §21, ellipsoid)
  // EPSG:3413 WGS84 / NSIDC Sea Ice Polar Stereographic North: lat_ts=70,
  //   lon0=-45, FE=0, FN=0.
  // EPSG:3031 WGS84 / Antarctic Polar Stereographic: lat_ts=-71, lon0=0,
  //   FE=0, FN=0.
  private final class PolarStereo(latTsDeg: Double, lon0Deg: Double,
      fe: Double, fn: Double) {
    private val north = latTsDeg >= 0
    private val lon0 = math.toRadians(lon0Deg)
    // Snyder 15-9: t(φ) for the north aspect (south mirrors φ and y)
    private def tOf(phi: Double) = {
      val esin = E * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - esin) / (1 + esin), E / 2)
    }
    private def mOf(phi: Double) = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - E2 * s * s)
    }
    private val phiTs = math.toRadians(math.abs(latTsDeg))
    private val kTs = R * mOf(phiTs) / tOf(phiTs) // ρ = kTs · t  (Snyder 21-34)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(if (north) latDeg else -latDeg)
      val dLam = math.toRadians(lonDeg) - lon0
      val rho = kTs * tOf(phi)
      // EPSG variant B: E = FE + ρ sin(λ−λ0); N is FN − ρcos (north aspect)
      // or FN + ρcos (south aspect)
      val x = rho * math.sin(dLam)
      val y = if (north) -rho * math.cos(dLam) else rho * math.cos(dLam)
      (fe + x, fn + y)
    }
    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe; val y = y0 - fn
      val rho = math.hypot(x, y)
      if (rho < 1e-12)
        return (math.toDegrees(lon0), if (north) 90.0 else -90.0)
      val t = rho / kTs
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 10) { // Snyder 7-9
        val esin = E * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - esin) / (1 + esin), E / 2))
        i += 1
      }
      val lam = lon0 + (if (north) math.atan2(x, -y) else math.atan2(x, y))
      // full-longitude domain → normalize into (-180, 180]
      val lamDeg = math.toDegrees(lam)
      val norm = lamDeg - 360.0 * math.floor((lamDeg + 180.0) / 360.0)
      val lamOut = if (norm == -180.0) 180.0 else norm
      (lamOut, math.toDegrees(if (north) phi else -phi))
    }
  }

  private val PolarSpecs: Map[Int, PolarStereo] = Map(
    3413 -> new PolarStereo(70.0, -45.0, 0.0, 0.0),
    3031 -> new PolarStereo(-71.0, 0.0, 0.0, 0.0))

  // ------------------------- EPSG:3035 ETRS89-LAEA (Snyder §24, ellipsoid)
  // Lambert azimuthal equal-area, lat0=52, lon0=10, FE=4321000, FN=3210000.
  // WGS84 ellipsoid parameters are used for the offline build (ETRS89/GRS80
  // differs from WGS84 by <1e-9 in flattening — far below our tolerance).
  // a proper object, not an anonymous structural type: structural member
  // access goes through reflection, and this sits on the per-COORDINATE
  // hot path of every 3035 transform
  private object Laea {
    val lat0 = math.toRadians(52.0); val lon0 = math.toRadians(10.0)
    val fe = 4321000.0; val fn = 3210000.0
    def qOf(phi: Double): Double = {
      val esin = E * math.sin(phi)
      (1 - E2) * (math.sin(phi) / (1 - esin * esin) -
        (1 / (2 * E)) * math.log((1 - esin) / (1 + esin)))
    }
    val qp = qOf(math.Pi / 2)
    val q0 = qOf(lat0)
    val beta0 = math.asin(q0 / qp)
    val rq = R * math.sqrt(qp / 2)
    val d = R * (math.cos(lat0) / math.sqrt(1 - E2 * math.pow(math.sin(lat0), 2))) /
      (rq * math.cos(beta0))
  }

  private def laeaForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    import Laea._
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val beta = math.asin(qOf(phi) / qp)
    val b = rq * math.sqrt(2 / (1 + math.sin(beta0) * math.sin(beta) +
      math.cos(beta0) * math.cos(beta) * math.cos(lam - lon0)))
    (fe + b * d * math.cos(beta) * math.sin(lam - lon0),
      fn + (b / d) * (math.cos(beta0) * math.sin(beta) -
        math.sin(beta0) * math.cos(beta) * math.cos(lam - lon0)))
  }

  private def laeaInverse(x0: Double, y0: Double): (Double, Double) = {
    import Laea._
    val x = x0 - fe; val y = y0 - fn
    val rho = math.sqrt(math.pow(x / d, 2) + math.pow(d * y, 2))
    if (rho < 1e-12) return (math.toDegrees(lon0), math.toDegrees(lat0))
    val ce = 2 * math.asin(rho / (2 * rq))
    val betaP = math.asin(math.cos(ce) * math.sin(beta0) +
      (d * y * math.sin(ce) * math.cos(beta0)) / rho)
    val lam = lon0 + math.atan2(x * math.sin(ce),
      d * rho * math.cos(beta0) * math.cos(ce) - d * d * y * math.sin(beta0) * math.sin(ce))
    // beta → phi by series (Snyder 3-18)
    val e4 = E2 * E2; val e6 = e4 * E2
    val phi = betaP + (E2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * betaP) +
      (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * betaP) +
      (761 * e6 / 45360) * math.sin(6 * betaP)
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** Meridian arc length M(φ) (Snyder 3-21). */
  private def meridianArc(phi: Double): Double =
    R * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * phi
      - (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * phi)
      + (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * phi)
      - (35 * E2 * E2 * E2 / 3072) * math.sin(6 * phi))

  /** Forward ellipsoidal Transverse Mercator (Snyder 8-9..8-13). */
  private def tmForward(lonDeg: Double, latDeg: Double, lon0Deg: Double,
      falseNorthing: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val lam0 = math.toRadians(lon0Deg)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = R / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = EP2 * cosP * cosP
    val a = (lam - lam0) * cosP
    val m = meridianArc(phi)
    val x = K0 * n * (a + (1 - t + c) * a * a * a / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * math.pow(a, 5) / 120) + 500000.0
    val y = K0 * (m + n * tanP * (a * a / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(a, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * math.pow(a, 6) / 720)) + falseNorthing
    (x, y)
  }

  /** Inverse ellipsoidal Transverse Mercator (Snyder 8-18..8-25). */
  private def tmInverse(x0: Double, y0: Double, lon0Deg: Double,
      falseNorthing: Double): (Double, Double) = {
    val x = x0 - 500000.0
    val y = y0 - falseNorthing
    val m = y / K0
    val mu = m / (R * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = EP2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = R / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = R * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = x / (n1 * K0)
    val phi = phi1 - (n1 * tanP / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lam = (d - (1 + 2 * t1 + c1) * d * d * d / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cosP
    (lon0Deg + math.toDegrees(lam), math.toDegrees(phi))
  }

  /** Forward from 4326 lon/lat into `dst`. */
  private def fromWgs84(lon: Double, lat: Double, dst: Int): (Double, Double) = dst match {
    case 4326 => (lon, lat)
    case 3857 =>
      (R * math.toRadians(lon),
        R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)))
    case 3395 =>
      val phi = math.toRadians(lat)
      val esin = E * math.sin(phi)
      (R * math.toRadians(lon),
        R * math.log(math.tan(math.Pi / 4 + phi / 2) *
          math.pow((1 - esin) / (1 + esin), E / 2)))
    case 3035 => laeaForward(lon, lat)
    case z if LccSpecs.contains(z) => LccSpecs(z).forward(lon, lat)
    case z if AlbersSpecs.contains(z) => AlbersSpecs(z).forward(lon, lat)
    case z if PolarSpecs.contains(z) => PolarSpecs(z).forward(lon, lat)
    case z if isUtmNorth(z) => tmForward(lon, lat, -183.0 + 6 * (z - 32600), 0.0)
    case z if isUtmSouth(z) => tmForward(lon, lat, -183.0 + 6 * (z - 32700), 1e7)
    case _ => throw new UnsupportedOperationException(s"to_srid: unsupported target EPSG:$dst")
  }

  /** Inverse into 4326 lon/lat from `src`. */
  private def toWgs84(x: Double, y: Double, src: Int): (Double, Double) = src match {
    case 4326 => (x, y)
    case 3857 =>
      (math.toDegrees(x / R),
        math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2))
    case 3395 =>
      val t = math.exp(-y / R)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 8) { // fixed-point iteration (Snyder 7-9/7-10)
        val esin = E * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), E / 2))
        i += 1
      }
      (math.toDegrees(x / R), math.toDegrees(phi))
    case 3035 => laeaInverse(x, y)
    case z if LccSpecs.contains(z) => LccSpecs(z).inverse(x, y)
    case z if AlbersSpecs.contains(z) => AlbersSpecs(z).inverse(x, y)
    case z if PolarSpecs.contains(z) => PolarSpecs(z).inverse(x, y)
    case z if isUtmNorth(z) => tmInverse(x, y, -183.0 + 6 * (z - 32600), 0.0)
    case z if isUtmSouth(z) => tmInverse(x, y, -183.0 + 6 * (z - 32700), 1e7)
    case _ => throw new UnsupportedOperationException(s"to_srid: unsupported source EPSG:$src")
  }

  /** Inverse into the WGS84 hub through whichever engine owns the code:
    * the original closed-form family (bit-identical legacy results) or the
    * embedded EPSG parameter table ([[EpsgDb]]). */
  private def toWgs84Any(x: Double, y: Double, src: Int): (Double, Double) =
    if (isClosedForm(src)) toWgs84(x, y, src) else EpsgDb.toWgs84(x, y, src)

  private def fromWgs84Any(lon: Double, lat: Double, dst: Int): (Double, Double) =
    if (isClosedForm(dst)) fromWgs84(lon, lat, dst) else EpsgDb.fromWgs84(lon, lat, dst)

  /** ESRI numeric codes that are exact aliases of EPSG definitions —
    * ArcGIS-authored data commonly carries these (102100 is ubiquitous).
    * Only identities we're certain of; canonicalized at the transform
    * entry so every family path serves them. */
  private val EsriAliases: Map[Int, Int] = Map(
    102100 -> 3857, // WGS_1984_Web_Mercator_Auxiliary_Sphere
    102039 -> 5070) // USA_Contiguous_Albers_Equal_Area_Conic_USGS_version

  private def canonical(srid: Int): Int = EsriAliases.getOrElse(srid, srid)

  def toSrid(g: Geometry, target0: Int): Geometry = {
    val target = canonical(target0)
    val src = canonical(g.getSRID)
    // same-SRID and EMPTY inputs no-op WITHOUT validating the codes —
    // reference semantics (functions.rs:1868: "no-op if same SRID/empty"),
    // deliberately kept even though it means an unsupported code only
    // errors once a non-empty row reaches it
    if (src == target || g.isEmpty) {
      g.getUserData match {
        // curved source: rewrite the marker's SRID by byte surgery (the
        // same path st_set_srid takes) so a no-op reprojection keeps the
        // curved representation instead of shedding it to the
        // linearization; EWKB.read re-attaches the updated marker
        case cb: Array[Byte] =>
          return EWKB.read(graft.serde.Curved.withSrid(cb, target0))
        case _ =>
          // JTS copy() preserves userData; plain path must not carry one
          val c = g.copy(); c.setUserData(null); c.setSRID(target0); return c
      }
    }
    require(isSupported(src) && isSupported(target),
      s"to_srid($src -> $target): supported EPSG codes are the closed-form " +
        "families (4326, 3857, 3395, 3035, 2154, 3978, 5070, 3577, 3413, 3031, " +
        s"UTM 326xx/327xx) plus the ${EpsgDb.table.size} codes in the embedded " +
        "EPSG parameter table (graft.functions.EpsgDb); other codes can be " +
        "added from their WKT or PROJ.4 definition via " +
        "graft.functions.registerCrs or the spark.graft.crs.wkt conf " +
        "(graft.functions.CrsRegistry)")
    val out = graft.serde.GeomUtil.mapCoords(g, (x, y, z) => {
      val (lon, lat) = toWgs84Any(x, y, src)
      val (ox, oy) = fromWgs84Any(lon, lat, target)
      (ox, oy, z)
    })
    out.setSRID(target0) // the caller's code, alias or canonical
    out
  }

  /** Parse a CRS definition to (authority, code) — reference
    * `src/crs.rs:11-18`. Accepts "EPSG:4326", "urn:ogc:def:crs:EPSG::4326",
    * bare integers, and WKT with AUTHORITY["EPSG","4326"] / ID["EPSG",4326]. */
  def crsAuthority(defn: String): Option[(String, Int)] = {
    val s = defn.trim
    val auth = "(?i)^([A-Za-z]+):(\\d+)$".r
    val urn = "(?i)^urn:ogc:def:crs:([A-Za-z]+)::?(\\d+)$".r
    val bare = "^(\\d+)$".r
    s match {
      case auth(a, c) => Some((a.toUpperCase, c.toInt))
      case urn(a, c) => Some((a.toUpperCase, c.toInt))
      case bare(c) => Some(("EPSG", c.toInt))
      case _ =>
        // last AUTHORITY/ID entry in a WKT string names the whole CRS
        val wkt = "(?i)(?:AUTHORITY|ID)\\s*\\[\\s*\"([A-Za-z]+)\"\\s*,\\s*\"?(\\d+)\"?\\s*\\]".r
        wkt.findAllMatchIn(s).toSeq.lastOption.map(m => (m.group(1).toUpperCase, m.group(2).toInt))
    }
  }

  /** EPSG code → CRS WKT (reference `src/crs.rs:20-26`, which reads an
    * embedded database; here a small table of the codes this build can
    * transform, plus synthesized UTM definitions). */
  def crsFromCode(srid: Int): Option[String] = srid match {
    case 4326 => Some("""GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]""")
    case 3857 => Some("""PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],PARAMETER["scale_factor",1],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","3857"]]""")
    case 3395 => Some("""PROJCS["WGS 84 / World Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Mercator_2SP"],PARAMETER["standard_parallel_1",0],PARAMETER["central_meridian",0],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","3395"]]""")
    case 3035 => Some("""PROJCS["ETRS89-extended / LAEA Europe",GEOGCS["ETRS89",DATUM["European_Terrestrial_Reference_System_1989",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Lambert_Azimuthal_Equal_Area"],PARAMETER["latitude_of_center",52],PARAMETER["longitude_of_center",10],PARAMETER["false_easting",4321000],PARAMETER["false_northing",3210000],UNIT["metre",1],AUTHORITY["EPSG","3035"]]""")
    case 2154 => Some("""PROJCS["RGF93 v1 / Lambert-93",GEOGCS["RGF93 v1",DATUM["Reseau_Geodesique_Francais_1993_v1",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic_2SP"],PARAMETER["latitude_of_origin",46.5],PARAMETER["central_meridian",3],PARAMETER["standard_parallel_1",49],PARAMETER["standard_parallel_2",44],PARAMETER["false_easting",700000],PARAMETER["false_northing",6600000],UNIT["metre",1],AUTHORITY["EPSG","2154"]]""")
    case 3978 => Some("""PROJCS["NAD83 / Canada Atlas Lambert",GEOGCS["NAD83",DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic_2SP"],PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-95],PARAMETER["standard_parallel_1",49],PARAMETER["standard_parallel_2",77],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","3978"]]""")
    case 5070 => Some("""PROJCS["NAD83 / Conus Albers",GEOGCS["NAD83",DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Albers_Conic_Equal_Area"],PARAMETER["latitude_of_center",23],PARAMETER["longitude_of_center",-96],PARAMETER["standard_parallel_1",29.5],PARAMETER["standard_parallel_2",45.5],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","5070"]]""")
    case 3577 => Some("""PROJCS["GDA94 / Australian Albers",GEOGCS["GDA94",DATUM["Geocentric_Datum_of_Australia_1994",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Albers_Conic_Equal_Area"],PARAMETER["latitude_of_center",0],PARAMETER["longitude_of_center",132],PARAMETER["standard_parallel_1",-18],PARAMETER["standard_parallel_2",-36],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","3577"]]""")
    case 3413 => Some("""PROJCS["WGS 84 / NSIDC Sea Ice Polar Stereographic North",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Polar_Stereographic"],PARAMETER["latitude_of_origin",70],PARAMETER["central_meridian",-45],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","3413"]]""")
    case 3031 => Some("""PROJCS["WGS 84 / Antarctic Polar Stereographic",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Polar_Stereographic"],PARAMETER["latitude_of_origin",-71],PARAMETER["central_meridian",0],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","3031"]]""")
    case z if isUtmNorth(z) || isUtmSouth(z) =>
      val zone = if (isUtmNorth(z)) z - 32600 else z - 32700
      val hemi = if (isUtmNorth(z)) "N" else "S"
      val fn = if (isUtmNorth(z)) 0 else 10000000
      val cm = -183 + 6 * zone
      Some(s"""PROJCS["WGS 84 / UTM zone $zone$hemi",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",$cm],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$z"]]""")
    case _ => EpsgDb.wkt(srid)
  }
}
