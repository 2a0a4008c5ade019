package graft

import org.locationtech.jts.geom._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.serde.{EWKB, GeoCodec, GeomUtil}

/** ScalaCheck properties over the serde/kernel layer (the SURVEY §5 test
  * plan's property-test leg): EWKB round trips, header consistency, CRS
  * inverse transforms, coordinate-rebuild identities. Pure JVM — no Spark
  * session, so thousands of cases run in milliseconds. */
object PropertySpec extends Properties("graft-kernel") {

  private val fact = EWKB.geometryFactory

  private val coordGen: Gen[Coordinate] = for {
    x <- Gen.chooseNum(-1e6, 1e6)
    y <- Gen.chooseNum(-1e6, 1e6)
  } yield new Coordinate(x, y)

  private val pointGen: Gen[Geometry] = coordGen.map(fact.createPoint)

  private val lineGen: Gen[Geometry] = for {
    n <- Gen.chooseNum(2, 12)
    cs <- Gen.listOfN(n, coordGen)
  } yield fact.createLineString(cs.toArray)

  private val boxGen: Gen[Geometry] = for {
    x <- Gen.chooseNum(-1e6, 1e6)
    y <- Gen.chooseNum(-1e6, 1e6)
    w <- Gen.chooseNum(0.1, 1000.0)
    h <- Gen.chooseNum(0.1, 1000.0)
  } yield fact.toGeometry(new Envelope(x, x + w, y, y + h))

  private val multiPointGen: Gen[Geometry] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, coordGen)
  } yield fact.createMultiPoint(cs.map(fact.createPoint).toArray)

  private val geomGen: Gen[Geometry] =
    Gen.oneOf(pointGen, lineGen, boxGen, multiPointGen)

  private val sridGen: Gen[Int] = Gen.oneOf(0, 4326, 3857, 32633)

  property("EWKB write/read round trip is identity") = forAll(geomGen, sridGen) {
    (g, srid) =>
      g.setSRID(srid)
      val back = EWKB.read(EWKB.write(g))
      GeomUtil.equalsIdentical(g, back) && back.getSRID == srid
  }

  property("header matches geometry without a full parse") = forAll(geomGen, sridGen) {
    (g, srid) =>
      g.setSRID(srid)
      val h = EWKB.header(EWKB.write(g))
      h.srid == srid && !h.hasZ && !h.hasM &&
        EWKB.typeName(h.typeCode) == (g.getGeometryType match {
          case "LinearRing" => "LineString"
          case t => t
        })
  }

  property("WKT round trip preserves structure") = forAll(geomGen) { g =>
    val back = GeoCodec.fromWkt(GeoCodec.toWkt(g, precision = -1))
    GeomUtil.equalsIdentical(g.norm(), back.norm())
  }

  property("EWKT carries the SRID") = forAll(geomGen, Gen.chooseNum(1, 999999)) {
    (g, srid) =>
      g.setSRID(srid)
      GeoCodec.fromEwkt(GeoCodec.toEwkt(g, precision = -1)).getSRID == srid
  }

  property("mapCoords identity transform is identity") = forAll(geomGen) { g =>
    GeomUtil.equalsIdentical(g, GeomUtil.mapCoords(g, (x, y, z) => (x, y, z)))
  }

  property("translate then inverse-translate is near-identity") =
    forAll(geomGen, Gen.chooseNum(-1e5, 1e5), Gen.chooseNum(-1e5, 1e5)) {
      (g, dx, dy) =>
        val rt = GeomUtil.mapCoords(
          GeomUtil.mapCoords(g, (x, y, z) => (x + dx, y + dy, z)),
          (x, y, z) => (x - dx, y - dy, z))
        val a = g.getCoordinates; val b = rt.getCoordinates
        a.length == b.length && a.zip(b).forall { case (ca, cb) =>
          math.abs(ca.x - cb.x) < 1e-6 && math.abs(ca.y - cb.y) < 1e-6
        }
    }

  private val lonLatGen: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-179.0, 179.0)
    lat <- Gen.chooseNum(-84.0, 84.0)
  } yield (lon, lat)

  property("3857 reprojection round trip") = forAll(lonLatGen) { case (lon, lat) =>
    val p = fact.createPoint(new Coordinate(lon, lat))
    p.setSRID(4326)
    val back = graft.functions.CrsImpl.toSrid(
      graft.functions.CrsImpl.toSrid(p, 3857), 4326)
    val c = back.getCoordinate
    math.abs(c.x - lon) < 1e-9 && math.abs(c.y - lat) < 1e-9
  }

  private val utmGen: Gen[(Double, Double, Int)] = for {
    zone <- Gen.chooseNum(1, 60)
    dLon <- Gen.chooseNum(-2.5, 2.5)
    lat <- Gen.chooseNum(-79.0, 83.0)
  } yield (-183.0 + 6 * zone + dLon, lat, if (lat >= 0) 32600 + zone else 32700 + zone)

  property("UTM reprojection round trip (in-zone, sub-mm)") = forAll(utmGen) {
    case (lon, lat, epsg) =>
      val p = fact.createPoint(new Coordinate(lon, lat))
      p.setSRID(4326)
      val prj = graft.functions.CrsImpl.toSrid(p, epsg)
      val back = graft.functions.CrsImpl.toSrid(prj, 4326)
      val c = back.getCoordinate
      math.abs(c.x - lon) < 1e-8 && math.abs(c.y - lat) < 1e-8
  }

  property("union area is commutative and >= max input (boxes)") =
    forAll(boxGen, boxGen) { (a, b) =>
      val ab = a.union(b).getArea
      val ba = b.union(a).getArea
      math.abs(ab - ba) < 1e-6 * math.max(ab, 1.0) &&
        ab >= math.max(a.getArea, b.getArea) - 1e-9
    }

  property("intersection area <= min input and symmetric (boxes)") =
    forAll(boxGen, boxGen) { (a, b) =>
      val i = a.intersection(b).getArea
      i <= math.min(a.getArea, b.getArea) + 1e-9 &&
        math.abs(i - b.intersection(a).getArea) < 1e-9
    }

  private val laeaGen: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-10.0, 30.0)
    lat <- Gen.chooseNum(35.0, 70.0)
  } yield (lon, lat)

  property("LAEA Europe (3035) round trip + false origin") = forAll(laeaGen) {
    case (lon, lat) =>
      val p = fact.createPoint(new Coordinate(lon, lat))
      p.setSRID(4326)
      val prj = graft.functions.CrsImpl.toSrid(p, 3035)
      val back = graft.functions.CrsImpl.toSrid(prj, 4326).getCoordinate
      val origin = fact.createPoint(new Coordinate(10.0, 52.0))
      origin.setSRID(4326)
      val o = graft.functions.CrsImpl.toSrid(origin, 3035).getCoordinate
      math.abs(back.x - lon) < 1e-7 && math.abs(back.y - lat) < 1e-7 &&
        math.abs(o.x - 4321000.0) < 1e-6 && math.abs(o.y - 3210000.0) < 1e-6
  }

  property("crsAuthority parses every generated from_code WKT") =
    forAll(Gen.oneOf(Gen.const(4326), Gen.const(3857), Gen.const(3395),
      Gen.const(3035), Gen.const(2154), Gen.const(3978), Gen.const(5070),
      Gen.const(3577), Gen.const(3413), Gen.const(3031),
      Gen.chooseNum(32601, 32660), Gen.chooseNum(32701, 32760))) { code =>
      val wkt = graft.functions.CrsImpl.crsFromCode(code)
      wkt.isDefined &&
        graft.functions.CrsImpl.crsAuthority(wkt.get).contains(("EPSG", code))
    }

  private def roundTrip(lon: Double, lat: Double, epsg: Int, tol: Double): Boolean = {
    val p = fact.createPoint(new Coordinate(lon, lat))
    p.setSRID(4326)
    val back = graft.functions.CrsImpl.toSrid(
      graft.functions.CrsImpl.toSrid(p, epsg), 4326).getCoordinate
    math.abs(back.x - lon) < tol && math.abs(back.y - lat) < tol
  }

  /** local E-W scale factor of `epsg` at (lon, lat) by central finite
    * difference against the ellipsoid parallel arc R·m(φ)·Δλ. */
  private def ewScale(lon: Double, lat: Double, epsg: Int): Double = {
    val d = 1e-4 // degrees
    def fwd(ln: Double) = {
      val p = fact.createPoint(new Coordinate(ln, lat))
      p.setSRID(4326)
      graft.functions.CrsImpl.toSrid(p, epsg).getCoordinate
    }
    val (a, b) = (fwd(lon - d), fwd(lon + d))
    val proj = math.hypot(b.x - a.x, b.y - a.y)
    val phi = math.toRadians(lat)
    val m = math.cos(phi) / math.sqrt(1 - 0.00669437999014 * math.pow(math.sin(phi), 2))
    proj / (6378137.0 * m * math.toRadians(2 * d))
  }

  private val conusGen: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-124.0, -67.0)
    lat <- Gen.chooseNum(24.0, 49.0)
  } yield (lon, lat)

  property("Conus Albers (5070) round trip; unit scale on standard parallels") =
    forAll(conusGen) { case (lon, lat) =>
      roundTrip(lon, lat, 5070, 1e-7) &&
        math.abs(ewScale(-96.0, 29.5, 5070) - 1.0) < 1e-6 &&
        math.abs(ewScale(-80.0, 45.5, 5070) - 1.0) < 1e-6
    }

  private val ausGen: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(113.0, 154.0)
    lat <- Gen.chooseNum(-44.0, -10.0)
  } yield (lon, lat)

  property("Australian Albers (3577, n<0) round trip; unit scale on parallels") =
    forAll(ausGen) { case (lon, lat) =>
      roundTrip(lon, lat, 3577, 1e-7) &&
        math.abs(ewScale(132.0, -18.0, 3577) - 1.0) < 1e-6 &&
        math.abs(ewScale(145.0, -36.0, 3577) - 1.0) < 1e-6
    }

  private val arcticGen: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-179.0, 179.0)
    lat <- Gen.chooseNum(55.0, 89.5)
  } yield (lon, lat)

  property("Arctic polar stereo (3413): round trip, pole at origin, true scale at 70N") =
    forAll(arcticGen) { case (lon, lat) =>
      val pole = fact.createPoint(new Coordinate(0.0, 90.0))
      pole.setSRID(4326)
      val pc = graft.functions.CrsImpl.toSrid(pole, 3413).getCoordinate
      roundTrip(lon, lat, 3413, 1e-7) &&
        math.abs(pc.x) < 1e-6 && math.abs(pc.y) < 1e-6 &&
        math.abs(ewScale(10.0, 70.0, 3413) - 1.0) < 1e-6
    }

  private val antarcticGen: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-179.0, 179.0)
    lat <- Gen.chooseNum(-89.5, -55.0)
  } yield (lon, lat)

  property("Antarctic polar stereo (3031): round trip, pole at origin, true scale at 71S") =
    forAll(antarcticGen) { case (lon, lat) =>
      val pole = fact.createPoint(new Coordinate(0.0, -90.0))
      pole.setSRID(4326)
      val pc = graft.functions.CrsImpl.toSrid(pole, 3031).getCoordinate
      roundTrip(lon, lat, 3031, 1e-7) &&
        math.abs(pc.x) < 1e-6 && math.abs(pc.y) < 1e-6 &&
        math.abs(ewScale(45.0, -71.0, 3031) - 1.0) < 1e-6
    }
}
