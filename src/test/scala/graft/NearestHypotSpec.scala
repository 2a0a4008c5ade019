package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bit-identity the nearest-join oracle rows lean on.
  *
  * JTS point distance (`Coordinate.distance`, reached via
  * `Geometry.distance` inside the join's radius search) routes through
  * `Math.hypot`, which the JVM spec guarantees only to 1 ulp — while the
  * DuckDB oracle (and the queries' recomputed hashed column) use
  * correctly-rounded `sqrt(dx*dx + dy*dy)`. Membership (`d <= maxDistance`)
  * and ties-inclusive ranks therefore agree with the oracle only where
  * hypot == sqrt BITWISE on the fixture's reachable offsets. That holds on
  * every half-integer lattice offset the geo_sjoin_nearest fixtures can
  * produce (dyadic coordinates, |dx|,|dy| bounded by the cluster extent) —
  * this spec sweeps a superset so a JDK whose hypot drifts by 1 ulp on any
  * in-range value fails HERE, loudly, instead of as a mysterious oracle
  * hash mismatch. */
class NearestHypotSpec extends AnyFunSuite {

  test("Math.hypot == Math.sqrt bitwise on every half-integer offset the " +
      "nearest oracle fixture can reach") {
    // fixture reachables: dx ∈ [-5.5, 9.0], dy ∈ [-3.5, 5.0], step 0.5;
    // swept superset: [-16, 16] both axes (covers any maxDistance ≤ 16
    // variant of the fixture, and the bench key's same-cell offsets)
    var mismatches = List.empty[(Double, Double)]
    var i = -32
    while (i <= 32) {
      var j = -32
      while (j <= 32) {
        val dx = i * 0.5
        val dy = j * 0.5
        val h = java.lang.Double.doubleToRawLongBits(Math.hypot(dx, dy))
        val s = java.lang.Double.doubleToRawLongBits(Math.sqrt(dx * dx + dy * dy))
        if (h != s) mismatches ::= ((dx, dy))
        j += 1
      }
      i += 1
    }
    assert(mismatches.isEmpty,
      s"hypot != sqrt bitwise at ${mismatches.take(5)} — this JDK's hypot " +
        "diverges on the oracle fixture lattice; geo_sjoin_nearest tie/" +
        "membership decisions may no longer match DuckDB's")
  }

  test("JTS point distance actually routes through the hypot value") {
    // guards the premise: if a JTS upgrade switches Coordinate.distance
    // to plain sqrt, the spec above keeps passing vacuously — this case
    // pins that the join's measured distance equals hypot on a probe
    // where both are (today) equal, and documents the dependency
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val a = gf.createPoint(new org.locationtech.jts.geom.Coordinate(0.0, 0.0))
    val b = gf.createPoint(new org.locationtech.jts.geom.Coordinate(1.5, 2.0))
    assert(java.lang.Double.doubleToRawLongBits(a.distance(b)) ===
      java.lang.Double.doubleToRawLongBits(Math.hypot(1.5, 2.0)))
  }
}
