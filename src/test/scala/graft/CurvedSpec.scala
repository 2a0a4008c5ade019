package graft

import graft.serde.{Curved, EWKB}
import org.scalatest.funsuite.AnyFunSuite

class CurvedSpec extends AnyFunSuite {

  test("circularstring EWKB round trip, 2D and Z") {
    val b = Curved.writeCircularString(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0, 0.0)), 4326)
    val h = EWKB.header(b)
    assert(h.typeCode == 8 && h.srid == 4326 && !h.hasZ)
    assert(EWKB.typeName(h.typeCode) == "CircularString")
    val (h2, pts) = Curved.readCircularString(b)
    assert(h2.srid == 4326)
    assert(pts.map(_.toSeq).toSeq == Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0, 0.0)))

    val bz = Curved.writeCircularString(
      Seq(Seq(0.0, 0.0, 5.0), Seq(1.0, 1.0, 6.0), Seq(2.0, 0.0, 7.0)), 0)
    assert(EWKB.header(bz).hasZ)
    val (_, ptsZ) = Curved.readCircularString(bz)
    assert(ptsZ.map(_.toSeq).toSeq ==
      Seq(Seq(0.0, 0.0, 5.0), Seq(1.0, 1.0, 6.0), Seq(2.0, 0.0, 7.0)))
  }

  test("point-count validation") {
    intercept[IllegalArgumentException] {
      Curved.writeCircularString(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), 0)
    }
    intercept[IllegalArgumentException] {
      Curved.writeCircularString(
        Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0, 0.0), Seq(3.0, 1.0)), 0)
    }
    assert(Curved.writeCircularString(Nil, 0).nonEmpty) // empty is legal
  }

  test("semicircle linearization: endpoints exact, length ~ pi*r") {
    val r = 2.0
    val b = Curved.writeCircularString(
      Seq(Seq(0.0, 0.0), Seq(r, r), Seq(2 * r, 0.0)), 31370)
    val line = Curved.linearize(b, 32)
    assert(line.getSRID == 31370)
    assert(line.getNumPoints == 65) // 2 quadrants x 32 + 1
    assert(line.getCoordinateN(0).x == 0.0 && line.getCoordinateN(0).y == 0.0)
    assert(line.getCoordinateN(64).x == 2 * r && line.getCoordinateN(64).y == 0.0)
    assert(math.abs(line.getLength - math.Pi * r) < 0.001 * r)
    // the arc bulges upward (p1 above the chord)
    assert(line.getCoordinateN(32).y > r * 0.99)
  }

  test("clockwise arc and full circle") {
    // clockwise semicircle: p1 below the chord
    val cw = Curved.linearize(Curved.writeCircularString(
      Seq(Seq(0.0, 0.0), Seq(1.0, -1.0), Seq(2.0, 0.0)), 0), 32)
    assert(cw.getCoordinateN(32).y < -0.99)
    // two arcs closing a full circle of radius 1 around (1,0)
    val full = Curved.linearize(Curved.writeCircularString(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0, 0.0),
        Seq(1.0, -1.0), Seq(0.0, 0.0)), 0), 32)
    assert(full.isClosed)
    assert(math.abs(full.getLength - 2 * math.Pi) < 0.01)
    // r9 sweep: the SQL-MM THREE-point full-circle form (first == last,
    // middle diametrically opposite) — its determinant is exactly 0, so
    // the collinear branch used to flatten it to a straight line of
    // length 4 instead of a circle of circumference 2π
    val circle3 = Curved.linearize(Curved.writeCircularString(
      Seq(Seq(0.0, 0.0), Seq(2.0, 0.0), Seq(0.0, 0.0)), 0), 32)
    assert(circle3.isClosed)
    assert(math.abs(circle3.getLength - 2 * math.Pi) < 0.01,
      s"full circle flattened: length ${circle3.getLength}")
    // degenerate: all points identical → 2-point degenerate line, not a
    // JTS single-coordinate crash
    val dot = Curved.linearize(Curved.writeCircularString(
      Seq(Seq(1.0, 1.0), Seq(1.0, 1.0), Seq(1.0, 1.0)), 0), 32)
    assert(dot.getNumPoints == 2 && dot.getLength == 0.0)
  }

  test("collinear triple degrades to straight segments") {
    val line = Curved.linearize(Curved.writeCircularString(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0, 2.0)), 0), 32)
    assert(line.getNumPoints == 3)
    assert(math.abs(line.getLength - 2 * math.sqrt(2)) < 1e-12)
  }

  test("z interpolation along an arc") {
    val b = Curved.writeCircularString(
      Seq(Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0), Seq(2.0, 0.0, 2.0)), 0)
    val line = Curved.linearize(b, 4) // 8 segments
    assert(line.getNumPoints == 9)
    assert(line.getCoordinateN(0).getZ == 0.0)
    assert(math.abs(line.getCoordinateN(4).getZ - 1.0) < 1e-12)
    assert(line.getCoordinateN(8).getZ == 2.0)
  }

  test("withSrid byte surgery with and without existing flag") {
    val withFlag = Curved.writeCircularString(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0, 0.0)), 1111)
    assert(EWKB.header(Curved.withSrid(withFlag, 2222)).srid == 2222)
    // ISO-style bytes without the SRID flag: strip it first
    val noFlag = withFlag.clone()
    val bb = java.nio.ByteBuffer.wrap(noFlag).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1, 8) // plain type code, no flags
    val stripped = noFlag.take(5) ++ noFlag.drop(9)
    val restored = Curved.withSrid(stripped, 3333)
    val h = EWKB.header(restored)
    assert(h.srid == 3333 && h.typeCode == 8)
    assert(Curved.readCircularString(restored)._2.length == 3)
  }
}
