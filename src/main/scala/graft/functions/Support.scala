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
    t match {
      case "Feature" => readNode(n.get("geometry"))
      case "FeatureCollection" =>
        val gs = n.get("features").elements().asScala.map(readNode).toArray
        fact.createGeometryCollection(gs)
      case "GeometryCollection" =>
        val gs = n.get("geometries").elements().asScala.map(readNode).toArray
        fact.createGeometryCollection(gs)
      case "Point" => fact.createPoint(coord(n.get("coordinates")))
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
    val (fw, bw) = lines.partition { l =>
      val la = new LengthIndexedLine(a)
      val lb = new LengthIndexedLine(b)
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
    if (from == target) return g.copy()
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
  * is zero-egress with no proj library on the classpath, so only the
  * spherical-Mercator pair EPSG:4326 ↔ EPSG:3857 is implemented
  * closed-form; other pairs raise (documented gap, SURVEY.md §7). */
object CrsImpl {

  private val R = 6378137.0

  def toSrid(g: Geometry, target: Int): Geometry = {
    val src = g.getSRID
    if (src == target || g.isEmpty) {
      val c = g.copy(); c.setSRID(target); return c
    }
    val out = (src, target) match {
      case (4326, 3857) =>
        graft.serde.GeomUtil.mapCoords(g, (lon, lat, z) => {
          val x = R * math.toRadians(lon)
          val y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
          (x, y, z)
        })
      case (3857, 4326) =>
        graft.serde.GeomUtil.mapCoords(g, (x, y, z) => {
          val lon = math.toDegrees(x / R)
          val lat = math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)
          (lon, lat, z)
        })
      case _ => throw new UnsupportedOperationException(
        s"to_srid($src -> $target): only 4326<->3857 supported in this offline build")
    }
    out.setSRID(target)
    out
  }
}
