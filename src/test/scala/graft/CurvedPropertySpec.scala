package graft

import graft.serde.CurvedGeom
import graft.serde.CurvedGeom.{CG, CLine, CCompound, CPoly, CMulti, CPoint}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the curved-geometry model:
  *
  *  - WKB and WKT round trips are lossless for ANY model value the
  *    generators can build (all five curved types, nesting, Z, either
  *    byte order), so serde-preserving ops cannot corrupt curves;
  *  - the exact closed forms agree with the linearization IN THE LIMIT:
  *    chordal length increases toward the exact arc length as
  *    segs-per-quadrant grows (monotone convergence is the physical
  *    sanity check that the closed form measures the same curve the
  *    chords approximate);
  *  - exact bounds CONTAIN the linearized bounds at any tolerance
  *    (chords never leave the arc's envelope);
  *  - control-point transforms commute with measurement for rigid
  *    motions (translate preserves exact length bit-for-tolerance).
  *
  * Model-level (no Spark session). Coordinates are dyadic rationals so
  * byte round trips compare exactly.
  */
object CurvedPropertySpec extends Properties("graft-curved") {

  private val ord: Gen[Double] = Gen.chooseNum(-2000, 2000).map(_ / 4.0)

  private def pt2: Gen[Array[Double]] = for (x <- ord; y <- ord) yield Array(x, y)
  private def pt3: Gen[Array[Double]] =
    for (x <- ord; y <- ord; z <- ord) yield Array(x, y, z)

  /** Odd-count (2k+1, k>=1) control points with consecutive points
    * distinct — a structurally valid CircularString. */
  private def circGen(z: Boolean): Gen[CLine] = for {
    k <- Gen.chooseNum(1, 3)
    pts <- Gen.listOfN(2 * k + 1, if (z) pt3 else pt2)
  } yield {
    // nudge consecutive duplicates apart on the dyadic grid (degenerate
    // zero-length arcs are legal but make convergence assertions vacuous)
    val arr = pts.toArray
    var i = 1
    while (i < arr.length) {
      if (arr(i)(0) == arr(i - 1)(0) && arr(i)(1) == arr(i - 1)(1))
        arr(i) = arr(i).updated(0, arr(i)(0) + 0.25)
      i += 1
    }
    CLine(arr, circular = true, z, m = false)
  }

  private def lineGen(z: Boolean): Gen[CLine] = for {
    n <- Gen.chooseNum(2, 6)
    pts <- Gen.listOfN(n, if (z) pt3 else pt2)
  } yield CLine(pts.toArray, circular = false, z, m = false)

  private def compoundGen(z: Boolean): Gen[CCompound] = for {
    n <- Gen.chooseNum(1, 3)
    segs <- Gen.listOfN(n, Gen.oneOf(circGen(z), lineGen(z)))
  } yield {
    // chain endpoints so the compound is connected like real data
    val chained = segs.scanLeft(Option.empty[CLine]) { (prevOpt, seg) =>
      prevOpt match {
        case Some(prev) if prev.pts.nonEmpty && seg.pts.nonEmpty =>
          val glued = seg.pts.clone()
          glued(0) = prev.pts.last
          Some(seg.copy(pts = glued))
        case _ => Some(seg)
      }
    }.flatten
    CCompound(chained.toVector, z, m = false)
  }

  /** Closed curved ring: a full circle through two dyadic points. */
  private def circleRing(z: Boolean): Gen[CLine] = for {
    p0 <- if (z) pt3 else pt2
    r <- Gen.chooseNum(1, 64).map(_ / 4.0)
  } yield {
    val p1 = p0.clone(); p1(0) = p0(0) + 2 * r
    CLine(Array(p0, p1, p0), circular = true, z, m = false)
  }

  private def curvePolyGen(z: Boolean): Gen[CPoly] =
    circleRing(z).map(r => CPoly(Vector(r), curve = true, z, m = false))

  private def multiCurveGen(z: Boolean): Gen[CMulti] = for {
    n <- Gen.chooseNum(1, 3)
    parts <- Gen.listOfN(n, Gen.oneOf[CG](circGen(z), lineGen(z), compoundGen(z)))
  } yield CMulti(11, parts.toVector, z, m = false)

  private def multiSurfaceGen(z: Boolean): Gen[CMulti] = for {
    n <- Gen.chooseNum(1, 2)
    parts <- Gen.listOfN(n, curvePolyGen(z))
  } yield CMulti(12, parts.toVector, z, m = false)

  private val anyCurved: Gen[(CG, Int)] = for {
    z <- Gen.oneOf(true, false)
    g <- Gen.oneOf[CG](circGen(z), compoundGen(z), curvePolyGen(z),
      multiCurveGen(z), multiSurfaceGen(z))
    srid <- Gen.oneOf(0, 4326, 3857)
  } yield (g, srid)

  private def modelEq(a: CG, b: CG): Boolean = (a, b) match {
    case (x: CPoint, y: CPoint) => x.c.sameElements(y.c) && x.z == y.z && x.m == y.m
    case (x: CLine, y: CLine) =>
      x.circular == y.circular && x.z == y.z && x.m == y.m &&
        x.pts.length == y.pts.length &&
        x.pts.zip(y.pts).forall { case (p, q) => p.sameElements(q) }
    case (x: CCompound, y: CCompound) =>
      x.segs.length == y.segs.length && x.segs.zip(y.segs).forall(t => modelEq(t._1, t._2))
    case (x: CPoly, y: CPoly) =>
      x.curve == y.curve && x.rings.length == y.rings.length &&
        x.rings.zip(y.rings).forall(t => modelEq(t._1, t._2))
    case (x: CMulti, y: CMulti) =>
      x.code == y.code && x.parts.length == y.parts.length &&
        x.parts.zip(y.parts).forall(t => modelEq(t._1, t._2))
    case _ => false
  }

  property("EWKB round trip is lossless, both byte orders") =
    forAll(anyCurved, Gen.oneOf(true, false)) { case ((g, srid), big) =>
      val bytes = CurvedGeom.write(g, srid, bigEndian = big)
      val (srid2, g2) = CurvedGeom.parse(bytes)
      srid2 == srid && modelEq(g, g2)
    }

  property("WKT round trip is lossless") = forAll(anyCurved) { case (g, _) =>
    modelEq(g, CurvedGeom.parseWkt(CurvedGeom.toWkt(g)))
  }

  property("chordal length converges to the exact length from below") =
    forAll(anyCurved) { case (g, srid) =>
      val exact = CurvedGeom.length(g)
      val l32 = CurvedGeom.linearize(g, srid, 32).getLength
      val l128 = CurvedGeom.linearize(g, srid, 128).getLength
      // chords never exceed the arc; 128 segs is at least as close as 32
      l32 <= exact + 1e-9 * math.max(exact, 1.0) &&
        l128 <= exact + 1e-9 * math.max(exact, 1.0) &&
        l128 >= l32 - 1e-9 * math.max(exact, 1.0) &&
        (exact == 0.0 || (exact - l128) <= (exact - l32) + 1e-9 * exact)
    }

  property("exact bounds contain the linearized bounds") =
    forAll(anyCurved) { case (g, srid) =>
      val bb = CurvedGeom.bounds(g)
      if (bb(0).isNaN) true
      else {
        val env = CurvedGeom.linearize(g, srid, 64).getEnvelopeInternal
        val eps = 1e-9 * math.max(1.0, math.max(bb(2) - bb(0), bb(3) - bb(1)))
        bb(0) <= env.getMinX + eps && bb(1) <= env.getMinY + eps &&
          bb(2) >= env.getMaxX - eps && bb(3) >= env.getMaxY - eps
      }
    }

  /** (Σ r·|sweep|, Σ r²·|sweep|) over the geometry's true arcs (collinear
    * triples take the straight-chord branch in BOTH tiers, so they
    * contribute zero chordal error and are excluded by arcParams=None). */
  private def arcTerms(g: CG): (Double, Double) = {
    var s1 = 0.0; var s2 = 0.0
    def walkLine(l: CLine): Unit = if (l.circular) {
      var i = 0
      while (i + 2 < l.pts.length) {
        CurvedGeom.arcParams(l.pts(i), l.pts(i + 1), l.pts(i + 2)).foreach {
          case (_, _, r, sweep) =>
            s1 += r * math.abs(sweep); s2 += r * r * math.abs(sweep)
        }
        i += 2
      }
    }
    def walk(g: CG): Unit = g match {
      case _: CPoint =>
      case l: CLine => walkLine(l)
      case c: CCompound => c.segs.foreach(walkLine)
      case CPoly(rings, _, _, _) => rings.foreach(walk)
      case CMulti(_, parts, _, _) => parts.foreach(walk)
    }
    walk(g); (s1, s2)
  }

  // The documented contract of tier 3 (auto-linearize at 32 segs/quadrant):
  // each chord spans δ ≤ (π/2)/32, and the standard chordal bounds give
  //   |arcLen − chordLen| = r·θ·(1 − sin(δ/2)/(δ/2)) ≤ r·θ·δ²/24
  //   |segArea per chord| = (r²/2)(δ − sin δ), summed ≤ r²·θ·δ²/12
  // — so the TOTAL linearization error is bounded by the geometry's
  // Σ r·|sweep| (length) and Σ r²·|sweep| (area) times δ²/24 and δ²/12.
  property("32-seg linearization error is within the published chordal bound") =
    forAll(anyCurved) { case (g, srid) =>
      val delta = (math.Pi / 2) / 32
      val (rTheta, r2Theta) = arcTerms(g)
      val lin = CurvedGeom.linearize(g, srid, 32)
      val exactLen = CurvedGeom.length(g)
      val lenBound = rTheta * delta * delta / 24 +
        1e-9 * math.max(1.0, exactLen) // fp slop on huge-radius arcs
      val lenOk = math.abs(exactLen - lin.getLength) <= lenBound
      val areaOk = g match {
        case _: CPoly | CMulti(12, _, _, _) =>
          val exactArea = CurvedGeom.area(g)
          val areaBound = r2Theta * delta * delta / 12 +
            1e-9 * math.max(1.0, exactArea)
          math.abs(exactArea - lin.getArea) <= areaBound
        case _ => true
      }
      lenOk && areaOk
    }

  property("translate preserves exact length and type") =
    forAll(anyCurved, ord, ord) { case ((g, _), dx, dy) =>
      val moved = CurvedGeom.mapControlPoints(g, (x, y, z) => (x + dx, y + dy, z))
      moved.code == g.code &&
        math.abs(CurvedGeom.length(moved) - CurvedGeom.length(g)) <=
          1e-9 * math.max(CurvedGeom.length(g), 1.0)
    }

  property("reverse preserves exact length and reverses endpoints") =
    forAll(circGen(z = false)) { l =>
      val r = CurvedGeom.reverseG(l).asInstanceOf[CLine]
      r.pts.head.sameElements(l.pts.last) && r.pts.last.sameElements(l.pts.head) &&
        math.abs(CurvedGeom.length(r) - CurvedGeom.length(l)) <=
          1e-9 * math.max(CurvedGeom.length(l), 1.0)
    }
}
