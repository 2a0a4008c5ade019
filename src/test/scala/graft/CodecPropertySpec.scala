package graft

import graft.io.{Dxf, Gml, Gpx, Kml, MapInfo}
import graft.serde.EWKB
import org.locationtech.jts.geom._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck round-trip properties for the pure-JVM interchange codecs
  * (KML, GML, GPX, MIF, DXF): for ANY valid geometry from the generator,
  * write → parse returns an equal geometry (WKT equality — coordinates
  * are dyadic rationals, so serialization is exact and comparison needs
  * no tolerance). Codec-level (no Spark session): the generators bias
  * toward the shapes each format is allowed to carry, and the documented
  * lossy mappings (DXF polygon → closed boundary polylines, GPX line →
  * one-trkseg MultiLineString) are asserted AS their mapping rather than
  * skipped. */
object CodecPropertySpec extends Properties("graft-codecs") {

  private val fact = EWKB.geometryFactory
  private def wkt(g: Geometry): String =
    new org.locationtech.jts.io.WKTWriter(3).write(g)

  // dyadic coordinate grid: k/4 over a bounded range — exact in double,
  // exact in every decimal serializer
  private val ord: Gen[Double] = Gen.chooseNum(-2000, 2000).map(_ / 4.0)
  private val coord: Gen[Coordinate] = for (x <- ord; y <- ord) yield new Coordinate(x, y)

  private def distinctCoords(min: Int, max: Int): Gen[Array[Coordinate]] =
    Gen.chooseNum(min, max).flatMap(n => Gen.listOfN(n, coord))
      .map(_.distinctBy(c => (c.x, c.y)).toArray)
      .suchThat(_.length >= min)

  private val pointGen: Gen[Point] = coord.map(fact.createPoint)

  private val lineGen: Gen[LineString] =
    distinctCoords(2, 8).map(fact.createLineString)

  private val multiLineGen: Gen[MultiLineString] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, lineGen))
      .map(ls => fact.createMultiLineString(ls.toArray))

  private val multiPointGen: Gen[MultiPoint] =
    distinctCoords(1, 6).map(fact.createMultiPointFromCoords)

  /** Axis-aligned rectangle polygon with 0-2 rectangular holes strictly
    * inside — valid by construction, holes contained (what MIF's
    * containment semantics and every writer can carry). */
  private val polyGen: Gen[Polygon] = for {
    x <- ord; y <- ord
    w <- Gen.chooseNum(8, 40).map(_ / 4.0 * 4) // 8..40 quarter-units wide
    h <- Gen.chooseNum(8, 40).map(_ / 4.0 * 4)
    nHoles <- Gen.chooseNum(0, 2)
  } yield {
    def ring(x0: Double, y0: Double, ww: Double, hh: Double): LinearRing =
      fact.createLinearRing(Array(
        new Coordinate(x0, y0), new Coordinate(x0 + ww, y0),
        new Coordinate(x0 + ww, y0 + hh), new Coordinate(x0, y0 + hh),
        new Coordinate(x0, y0)))
    val shell = ring(x, y, w, h)
    // disjoint holes in the left/right halves, strictly interior
    val holes = (0 until nHoles).map { i =>
      ring(x + w / 4 + i * w / 2, y + h / 4, w / 8, h / 4)
    }
    fact.createPolygon(shell, holes.toArray)
  }

  private val multiPolyGen: Gen[MultiPolygon] = for {
    n <- Gen.chooseNum(1, 3)
    base <- polyGen
  } yield {
    // disjoint translates of one polygon: valid multipolygon
    val env = base.getEnvelopeInternal
    val dx = env.getWidth + 4.0
    val parts = (0 until n).map { i =>
      val t = new org.locationtech.jts.geom.util.AffineTransformation()
        .translate(i * dx, 0)
      t.transform(base).asInstanceOf[Polygon]
    }
    fact.createMultiPolygon(parts.toArray)
  }

  private val anyGeom: Gen[Geometry] = Gen.oneOf(
    pointGen.map(_.asInstanceOf[Geometry]), lineGen.map(_.asInstanceOf[Geometry]),
    multiPointGen.map(_.asInstanceOf[Geometry]),
    multiLineGen.map(_.asInstanceOf[Geometry]),
    polyGen.map(_.asInstanceOf[Geometry]),
    multiPolyGen.map(_.asInstanceOf[Geometry]))

  property("kml round trip preserves every geometry class") =
    forAll(anyGeom) { g =>
      g.setSRID(4326)
      val bytes = Kml.write(Iterator((g, "n", null, Seq("k" -> "1"))), "d")
      val back = Kml.readFeatures(bytes)
      back.length == 1 && wkt(back.head.geom) == wkt(g) &&
        back.head.geom.getSRID == 4326 && back.head.data("k") == "1"
    }

  property("gml round trip preserves every geometry class") =
    forAll(anyGeom) { g =>
      g.setSRID(4326)
      val bytes = Gml.write(Iterator((g, Seq("k" -> "1"))), "f")
      val back = Gml.readFeatures(bytes)
      back.length == 1 && wkt(back.head.geom) == wkt(g) &&
        back.head.geom.getSRID == 4326
    }

  property("mif round trip preserves point/line/polygon classes") =
    forAll(Gen.oneOf(pointGen.map(_.asInstanceOf[Geometry]),
      lineGen.map(_.asInstanceOf[Geometry]),
      multiLineGen.map(_.asInstanceOf[Geometry]),
      multiPointGen.map(_.asInstanceOf[Geometry]),
      polyGen.map(_.asInstanceOf[Geometry]),
      multiPolyGen.map(_.asInstanceOf[Geometry]))) { g =>
      val (mif, mid) = MapInfo.write(Seq(MapInfo.MifColumn("id", "Integer")),
        Iterator((g, Array("7"))), 4326)
      val parsed = MapInfo.readMif(mif, Some(mid))
      // Region carries no single-vs-multi distinction: a one-part
      // MultiPolygon reads back as the Polygon containment implies
      val expected = g match {
        case m: MultiPolygon if m.getNumGeometries == 1 => wkt(m.getGeometryN(0))
        case other => wkt(other)
      }
      parsed.geoms.length == 1 && wkt(parsed.geoms.head) == expected &&
        parsed.rows.head(0) == "7"
    }

  property("gpx: points → wpt, lines → one-trkseg multilines") =
    forAll(Gen.oneOf(pointGen.map(_.asInstanceOf[Geometry]),
      lineGen.map(_.asInstanceOf[Geometry]),
      multiLineGen.map(_.asInstanceOf[Geometry]))) { g =>
      g.setSRID(4326)
      val bytes = Gpx.write(Iterator((g, "n")), "t")
      val doc = Gpx.read(bytes)
      g match {
        case p: Point =>
          doc.waypoints.length == 1 && doc.tracks.isEmpty &&
            wkt(Gpx.pointGeom(doc.waypoints.head)) == wkt(p)
        case l: LineString =>
          doc.tracks.length == 1 &&
            wkt(Gpx.trackGeom(doc.tracks.head)) ==
              wkt(fact.createMultiLineString(Array(l)))
        case m: MultiLineString =>
          doc.tracks.length == 1 && wkt(Gpx.trackGeom(doc.tracks.head)) == wkt(m)
      }
    }

  property("dxf: points exact; lines exact; polygons → closed ring lines") =
    forAll(Gen.oneOf(pointGen.map(_.asInstanceOf[Geometry]),
      lineGen.map(_.asInstanceOf[Geometry]),
      polyGen.map(_.asInstanceOf[Geometry]))) { g =>
      val text = Dxf.write(Iterator((g, "L")))
      val ents = Dxf.readEntities(text)
      g match {
        case p: Point =>
          ents.length == 1 && wkt(ents.head.geom) == wkt(p) &&
            ents.head.layer == "L"
        case l: LineString =>
          ents.length == 1 && wkt(ents.head.geom) == wkt(l)
        case poly: Polygon =>
          // boundary export: one closed polyline per ring, same coords
          val expect = (poly.getExteriorRing +:
            (0 until poly.getNumInteriorRing).map(poly.getInteriorRingN))
            .map(r => wkt(fact.createLineString(r.getCoordinates)))
          ents.length == expect.length &&
            ents.map(e => wkt(e.geom)) == expect
      }
    }
}
