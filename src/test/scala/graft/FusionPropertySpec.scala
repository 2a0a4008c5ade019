package graft

import graft.functions.GeoKernels
import graft.serde.EWKB
import org.locationtech.jts.geom._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property for the fusion tier's central semantic claim: for
  * ANY chain of registered kernels, running the whole chain on in-memory
  * JTS geometries (one parse, one serialize — what `STGeoFused` does)
  * yields byte-identical results to round-tripping EWKB between every op
  * (what the ScalaUDF tier does). This is exactly the invariant that lets
  * `GeoFusionRule` drop interior serialization: `EWKB.write` canonicalizes
  * Z/M on NaN ordinates and srid inheritance is per-op `keepSrid`, so
  * neither path can observe the difference. Pure JVM — no Spark session.
  */
object FusionPropertySpec extends Properties("graft-fusion") {

  private val fact = EWKB.geometryFactory

  private val coordGen: Gen[Coordinate] = for {
    x <- Gen.chooseNum(-1e6, 1e6)
    y <- Gen.chooseNum(-1e6, 1e6)
  } yield new Coordinate(x, y)

  private val coordZGen: Gen[Coordinate] = for {
    x <- Gen.chooseNum(-1e6, 1e6)
    y <- Gen.chooseNum(-1e6, 1e6)
    z <- Gen.chooseNum(-1e3, 1e3)
  } yield new Coordinate(x, y, z)

  private def ptG(cg: Gen[Coordinate]): Gen[Geometry] = cg.map(fact.createPoint)
  private def lineG(cg: Gen[Coordinate]): Gen[Geometry] = for {
    n <- Gen.chooseNum(2, 10)
    cs <- Gen.listOfN(n, cg)
  } yield fact.createLineString(cs.toArray)
  private val boxG: Gen[Geometry] = for {
    x <- Gen.chooseNum(-1e6, 1e6); y <- Gen.chooseNum(-1e6, 1e6)
    w <- Gen.chooseNum(0.1, 1000.0); h <- Gen.chooseNum(0.1, 1000.0)
  } yield fact.toGeometry(new Envelope(x, x + w, y, y + h))
  private val mpG: Gen[Geometry] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, coordGen)
  } yield fact.createMultiPoint(cs.map(fact.createPoint).toArray)

  private val geomGen: Gen[Geometry] = for {
    g <- Gen.oneOf(ptG(coordGen), ptG(coordZGen), lineG(coordGen),
      lineG(coordZGen), boxG, mpG)
    srid <- Gen.oneOf(0, 4326, 3857)
  } yield { g.setSRID(srid); g }

  /** No-arg geometry→geometry kernels that accept every geometry type. */
  private val UnaryOps = Seq(
    "st_centroid", "st_envelope", "st_convex_hull", "st_boundary",
    "st_reverse", "st_normalize", "st_make_valid", "st_multi",
    "st_force_2d", "st_flip_coordinates", "st_point_on_surface",
    "st_unary_union", "st_extract_unique_points")

  /** Geometry-rooted terminals plus scalar terminals, any-type safe. */
  private val TerminalOps = Seq(
    "st_area", "st_length", "st_is_valid", "st_is_empty", "st_is_simple",
    "st_aswkt", "st_asewkt", "st_asgeojson", "st_count_geometries",
    "st_dimensions", "st_is_valid_reason")

  private val chainGen: Gen[List[String]] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, Gen.oneOf(UnaryOps)))

  private def keepSrid(in: Geometry, out: Geometry): Geometry = {
    if (out.getSRID == 0 && in.getSRID != 0) out.setSRID(in.getSRID)
    out
  }

  /** One kernel step the way `STGeoFused` runs it: kernel, then the
    * LinearRing→LineString canonicalization (the one lossy step of the
    * EWKB round trip, replicated so e.g. `st_aswkt(st_boundary(box))`
    * prints LINESTRING in both tiers), then keepSrid. In the round-trip
    * emulation the subsequent write→read performs the same
    * canonicalization naturally, so sharing this helper is exact. */
  private def applyK(name: String, g: Geometry): Geometry = {
    val r = GeoKernels.table(name).fn(Array[Any](g)).asInstanceOf[Geometry]
    if (r == null) null else keepSrid(g, graft.plans.GeoFusion.canonical(r))
  }

  /** ScalaUDF-tier emulation: EWKB round trip between every op. */
  private def roundTripped(chain: List[String], terminal: String,
      bytes: Array[Byte]): Any = {
    var b = bytes
    chain.foreach { n =>
      val r = applyK(n, EWKB.read(b))
      b = if (r == null) null else EWKB.write(r)
      if (b == null) return null
    }
    GeoKernels.table(terminal).fn(Array[Any](EWKB.read(b)))
  }

  /** Fused-tier emulation: stay in memory, serialize only scalar-free
    * geometry results at the very end. */
  private def inMemory(chain: List[String], terminal: String,
      bytes: Array[Byte]): Any = {
    var g = EWKB.read(bytes)
    chain.foreach { n =>
      if (g != null) g = applyK(n, g)
    }
    if (g == null) null else GeoKernels.table(terminal).fn(Array[Any](g))
  }

  private def sameResult(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y) == 0
    case (x, y) => x == y
  }

  property("chains agree with and without interior EWKB round trips") =
    forAll(geomGen, chainGen, Gen.oneOf(TerminalOps)) { (g, chain, terminal) =>
      val bytes = EWKB.write(g)
      sameResult(roundTripped(chain, terminal, bytes),
        inMemory(chain, terminal, bytes))
    }

  property("geometry-rooted chains serialize to identical EWKB") =
    forAll(geomGen, chainGen) { (g, chain) =>
      val bytes = EWKB.write(g)
      val rt = {
        var b = bytes
        chain.foreach { n => if (b != null) {
          val r = applyK(n, EWKB.read(b))
          b = if (r == null) null else EWKB.write(r)
        }}
        b
      }
      val mem = {
        var gg = EWKB.read(bytes)
        chain.foreach { n => if (gg != null) gg = applyK(n, gg) }
        if (gg == null) null else EWKB.write(gg)
      }
      (rt == null && mem == null) || java.util.Arrays.equals(rt, mem)
    }
}
