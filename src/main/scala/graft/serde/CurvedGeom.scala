package graft.serde

import org.locationtech.jts.geom.{Coordinate, Geometry}

/** Full curved-geometry model over EWKB types 8-12 (CircularString,
  * CompoundCurve, CurvePolygon, MultiCurve, MultiSurface — the type table
  * the reference recognizes, `/root/reference/src/wkb.rs:47-68`).
  *
  * JTS has no curved geometry classes, so the engine keeps curves at the
  * byte/model level and defines the compute contract in three tiers:
  *
  *  1. '''Serde-preserving''': WKT/EWKB parse + write, header accessors,
  *     structure accessors (`count_geometries`, `get_geometry`,
  *     `exterior_ring`, `coordinates` …) operate on this model and keep
  *     the curved representation intact.
  *  2. '''Exact closed forms''': `length` (Σ r·|sweep| per arc) and `area`
  *     (chord-polygon shoelace + circular-segment corrections,
  *     `(r²/2)(θ - sin θ)` per arc) — matching the semantics GEOS-main
  *     gives the reference on curved input, with no chordal error.
  *     `bounds` is likewise exact (arc axis-extreme points included).
  *  3. '''Auto-linearize''': every other compute op parses curved bytes
  *     into the PostGIS `ST_CurveToLine` linearization (32 segments per
  *     quadrant — [[Curved.linearize]]'s convention) via [[EWKB.read]],
  *     so buffers, predicates, overlay, affine ops … all work on curved
  *     input with documented chordal approximation. `st_linearize` stays
  *     the explicit, tolerance-controlled escape.
  *
  * Layout facts come from the WKB spec: container children are full WKB
  * geometries (byte-order byte + type word each, own Z/M flags, either
  * byte order), unlike Polygon rings which are bare point lists.
  */
object CurvedGeom {

  // ----------------------------------------------------------------- model

  /** Coordinate arrays are length `2 + (z?1:0) + (m?1:0)`, order x,y,z,m. */
  sealed trait CG { def z: Boolean; def m: Boolean; def code: Int }
  /** WKB type 1 (appears as a member of curved collections). */
  final case class CPoint(c: Array[Double], z: Boolean, m: Boolean) extends CG {
    def code = 1
  }
  /** WKB type 2 (circular=false) or 8 (circular=true). */
  final case class CLine(pts: Array[Array[Double]], circular: Boolean,
      z: Boolean, m: Boolean) extends CG {
    def code: Int = if (circular) 8 else 2
  }
  /** WKB type 9; members are LineString or CircularString segments. */
  final case class CCompound(segs: Vector[CLine], z: Boolean, m: Boolean) extends CG {
    def code = 9
  }
  /** WKB type 3 (curve=false) or 10 (curve=true); rings are [[CLine]] or
    * [[CCompound]], exterior first. */
  final case class CPoly(rings: Vector[CG], curve: Boolean,
      z: Boolean, m: Boolean) extends CG {
    def code: Int = if (curve) 10 else 3
  }
  /** WKB types 4/5/6/7/11/12 — homogeneous or mixed collections. */
  final case class CMulti(code: Int, parts: Vector[CG], z: Boolean, m: Boolean) extends CG

  /** Top-level type code is curved (8-12)? Cheap pre-parse test. */
  def isCurvedBytes(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      Curved.isCurvedCode(EWKB.topTypeCode(bytes)) // allocation-free peek:
      // this sits on the per-row native area/length hot path

  /** Curved for the serde-preserving tier: top-level curved (8-12) OR a
    * GeometryCollection carrying curved members — the same set of inputs
    * [[EWKB.read]] linearizes-with-marker, so the bytes-level UDF branches
    * and the marker-driven fusion kernels route identically. The code-7
    * deep scan runs only on collections (rare in hot paths; linear,
    * allocation-free). */
  def isCurvedSource(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 && {
      val code = EWKB.topTypeCode(bytes)
      Curved.isCurvedCode(code) || (code == 7 && containsCurved(bytes))
    }

  /** Deep scan: does any nested type word name a curved type? Only called
    * on the JTS-parse-failure path for GeometryCollections, so it may
    * re-walk the bytes. */
  def containsCurved(bytes: Array[Byte]): Boolean =
    try {
      val cur = new Cursor(bytes)
      scanCurved(cur)
    } catch { case _: Exception => false }

  private def scanCurved(cur: Cursor): Boolean = {
    val (code, _, dims) = cur.readHead()
    if (Curved.isCurvedCode(code)) return true
    code match {
      case 1 => cur.skipDoubles(dims); false
      case 2 => val n = cur.readInt(); cur.skipDoubles(n * dims); false
      case 3 =>
        val nr = cur.readInt()
        var i = 0
        while (i < nr) { val np = cur.readInt(); cur.skipDoubles(np * dims); i += 1 }
        false
      case 4 | 5 | 6 | 7 =>
        val n = cur.readInt()
        var i = 0
        while (i < n) { if (scanCurved(cur)) return true; i += 1 }
        false
      case other => throw new IllegalArgumentException(
        s"unsupported WKB type $other")
    }
  }

  // ----------------------------------------------------------------- parse

  /** Byte cursor handling per-geometry byte order. */
  private final class Cursor(val bytes: Array[Byte]) {
    var pos: Int = 0
    private var little: Boolean = true
    def readInt(): Int = {
      val b = bytes; val p = pos; pos += 4
      if (little)
        (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
          ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
      else
        ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
          ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    }
    def readDouble(): Double = {
      val b = bytes; val p = pos; pos += 8
      var bits = 0L
      if (little) {
        var i = 7
        while (i >= 0) { bits = (bits << 8) | (b(p + i) & 0xffL); i -= 1 }
      } else {
        var i = 0
        while (i < 8) { bits = (bits << 8) | (b(p + i) & 0xffL); i += 1 }
      }
      java.lang.Double.longBitsToDouble(bits)
    }
    def skipDoubles(n: Int): Unit = pos += 8 * n
    /** Read one geometry header: order byte + type word (EWKB flags and
      * ISO thousands both accepted — same hybrid rule as [[EWKB.header]]);
      * skips a nested SRID word if flagged. Returns (code, (z, m), dims). */
    def readHead(): (Int, (Boolean, Boolean), Int) = {
      little = bytes(pos) == 1
      pos += 1
      val raw = readInt()
      var hasZ = (raw & EWKB.FlagZ) != 0
      var hasM = (raw & EWKB.FlagM) != 0
      var code = raw & 0x0fffffff
      val isoDim = code / 1000
      if (isoDim == 1) { hasZ = true; code -= 1000 }
      else if (isoDim == 2) { hasM = true; code -= 2000 }
      else if (isoDim == 3) { hasZ = true; hasM = true; code -= 3000 }
      if ((raw & EWKB.FlagSrid) != 0) { lastSrid = readInt() }
      (code, (hasZ, hasM), 2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0))
    }
    var lastSrid: Int = 0
  }

  /** Parse any WKB/EWKB geometry (types 1-12) into the model.
    * Returns (srid, geometry); srid comes from the top-level header. */
  def parse(bytes: Array[Byte]): (Int, CG) = {
    val cur = new Cursor(bytes)
    val g = readGeom(cur)
    (cur.lastSrid, g)
  }

  private def readGeom(cur: Cursor): CG = {
    val (code, (z, m), dims) = cur.readHead()
    // `lastSrid` now holds THIS level's SRID (or the inherited outer value
    // when this header carried no SRID word). Children may overwrite it with
    // their own nested SRID words; we restore it unconditionally below so a
    // nested SRID can never be promoted past its own level — in particular a
    // top header WITHOUT an SRID word keeps srid 0 even when a child is
    // EWKB-flagged.
    val sridHere = cur.lastSrid
    val g: CG = code match {
      case 1 =>
        val c = new Array[Double](dims)
        var d = 0
        while (d < dims) { c(d) = cur.readDouble(); d += 1 }
        CPoint(c, z, m)
      case 2 | 8 => readLine(cur, code == 8, z, m, dims)
      case 3 =>
        val nr = cur.readInt()
        val rings = Vector.newBuilder[CG]
        var i = 0
        while (i < nr) {
          val np = cur.readInt()
          val pts = new Array[Array[Double]](np)
          var j = 0
          while (j < np) {
            val c = new Array[Double](dims)
            var d = 0
            while (d < dims) { c(d) = cur.readDouble(); d += 1 }
            pts(j) = c
            j += 1
          }
          rings += CLine(pts, circular = false, z, m)
          i += 1
        }
        CPoly(rings.result(), curve = false, z, m)
      case 9 =>
        val n = cur.readInt()
        val segs = Vector.newBuilder[CLine]
        var i = 0
        while (i < n) {
          readGeom(cur) match {
            case l: CLine => segs += l
            case other => throw new IllegalArgumentException(
              s"CompoundCurve segment must be LineString or CircularString, got code ${other.code}")
          }
          i += 1
        }
        CCompound(segs.result(), z, m)
      case 10 =>
        val n = cur.readInt()
        val rings = Vector.newBuilder[CG]
        var i = 0
        while (i < n) {
          readGeom(cur) match {
            case r @ (_: CLine | _: CCompound) => rings += r
            case other => throw new IllegalArgumentException(
              s"CurvePolygon ring must be a curve, got code ${other.code}")
          }
          i += 1
        }
        CPoly(rings.result(), curve = true, z, m)
      case 4 | 5 | 6 | 7 | 11 | 12 =>
        val n = cur.readInt()
        val parts = Vector.newBuilder[CG]
        var i = 0
        while (i < n) { parts += readGeom(cur); i += 1 }
        CMulti(code, parts.result(), z, m)
      case other => throw new IllegalArgumentException(
        s"unsupported WKB type $other")
    }
    cur.lastSrid = sridHere
    g
  }

  private def readLine(cur: Cursor, circular: Boolean, z: Boolean, m: Boolean,
      dims: Int): CLine = {
    val n = cur.readInt()
    val pts = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val c = new Array[Double](dims)
      var d = 0
      while (d < dims) { c(d) = cur.readDouble(); d += 1 }
      pts(i) = c
      i += 1
    }
    CLine(pts, circular, z, m)
  }

  // ----------------------------------------------------------------- write

  /** Serialize the model to EWKB — little-endian with the SRID word always
    * present at the top level (the [[EWKB.write]] normal form; value 0
    * when unset). `includeSrid = false` omits flag and word entirely (the
    * `to_wkb` plain-WKB contract). `forceDims`: Some(2) drops Z/M, Some(3)
    * keeps Z drops M (the `to_wkb(output_dimension)` contract); None
    * preserves. `bigEndian` flips every byte-order marker (children
    * included). */
  def write(g: CG, srid: Int, bigEndian: Boolean = false,
      includeSrid: Boolean = true, forceDims: Option[Int] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    writeGeom(out, g, srid, bigEndian, forceDims, topSrid = includeSrid)
    out.toByteArray
  }

  private def dimsOf(g: CG, forceDims: Option[Int]): (Boolean, Boolean) =
    forceDims match {
      case Some(2) => (false, false)
      case Some(3) => (g.z, if (g.z) false else g.m)
      case _ => (g.z, g.m)
    }

  private def writeGeom(out: java.io.ByteArrayOutputStream, g: CG, srid: Int,
      big: Boolean, forceDims: Option[Int], topSrid: Boolean): Unit = {
    def i32(v: Int): Unit =
      if (big) { out.write(v >>> 24); out.write(v >>> 16); out.write(v >>> 8); out.write(v) }
      else { out.write(v); out.write(v >>> 8); out.write(v >>> 16); out.write(v >>> 24) }
    def f64(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      if (big) { var i = 7; while (i >= 0) { out.write((bits >>> (8 * i)).toInt); i -= 1 } }
      else { var i = 0; while (i < 8) { out.write((bits >>> (8 * i)).toInt); i += 1 } }
    }
    val (z, m) = dimsOf(g, forceDims)
    def coord(c: Array[Double], srcZ: Boolean, srcM: Boolean): Unit = {
      f64(c(0)); f64(c(1))
      if (z) f64(if (srcZ && c.length > 2) c(2) else Double.NaN)
      if (m) f64 {
        val mi = 2 + (if (srcZ) 1 else 0)
        if (srcM && c.length > mi) c(mi) else Double.NaN
      }
    }
    out.write(if (big) 0 else 1)
    var t = g.code
    if (z) t |= EWKB.FlagZ
    if (m) t |= EWKB.FlagM
    if (topSrid) t |= EWKB.FlagSrid
    i32(t)
    if (topSrid) i32(srid)
    g match {
      case CPoint(c, sz, sm) => coord(c, sz, sm)
      case CLine(pts, _, sz, sm) =>
        i32(pts.length); pts.foreach(coord(_, sz, sm))
      case CPoly(rings, false, _, _) =>
        i32(rings.length)
        rings.foreach {
          case CLine(pts, _, sz, sm) => i32(pts.length); pts.foreach(coord(_, sz, sm))
          case other => throw new IllegalArgumentException(
            s"Polygon ring must be linear, got code ${other.code}")
        }
      case CPoly(rings, true, _, _) =>
        i32(rings.length)
        rings.foreach(writeGeom(out, _, 0, big, forceDims, topSrid = false))
      case CCompound(segs, _, _) =>
        i32(segs.length)
        segs.foreach(writeGeom(out, _, 0, big, forceDims, topSrid = false))
      case CMulti(_, parts, _, _) =>
        i32(parts.length)
        parts.foreach(writeGeom(out, _, 0, big, forceDims, topSrid = false))
    }
  }

  // ------------------------------------------------------------- linearize

  /** Model → JTS geometry, arcs chorded at `segsPerQuadrant` (PostGIS
    * `ST_CurveToLine` convention). CircularString → LineString,
    * CompoundCurve → LineString, CurvePolygon → Polygon,
    * MultiCurve → MultiLineString, MultiSurface → MultiPolygon. */
  def linearize(g: CG, srid: Int, segsPerQuadrant: Int): Geometry = {
    val f = EWKB.geometryFactory
    val out: Geometry = g match {
      case CPoint(c, z, _) =>
        if (c(0).isNaN && c(1).isNaN) f.createPoint()
        else f.createPoint(mkCoord(c, z))
      case l: CLine => f.createLineString(lineCoords(l, segsPerQuadrant))
      case c: CCompound => f.createLineString(compoundCoords(c, segsPerQuadrant))
      case CPoly(rings, _, _, _) =>
        if (rings.isEmpty) f.createPolygon()
        else {
          val rs = rings.map(r => f.createLinearRing(closeRing(ringCoords(r, segsPerQuadrant))))
          f.createPolygon(rs.head, rs.tail.toArray)
        }
      case CMulti(code, parts, _, _) =>
        val ls = parts.map(linearize(_, 0, segsPerQuadrant))
        code match {
          case 4 => f.createMultiPoint(ls.map(_.asInstanceOf[org.locationtech.jts.geom.Point]).toArray)
          case 5 | 11 => f.createMultiLineString(ls.map(_.asInstanceOf[org.locationtech.jts.geom.LineString]).toArray)
          case 6 | 12 => f.createMultiPolygon(ls.map(_.asInstanceOf[org.locationtech.jts.geom.Polygon]).toArray)
          case _ => f.createGeometryCollection(ls.toArray)
        }
    }
    if (srid != 0) out.setSRID(srid)
    out
  }

  /** Linearize straight from bytes; SRID carried from the header. Entry
    * point for [[EWKB.read]]'s curved branch. */
  def linearizeBytes(bytes: Array[Byte], segsPerQuadrant: Int): Geometry = {
    val (srid, g) = parse(bytes)
    linearize(g, srid, segsPerQuadrant)
  }

  /** THE curved-source marker idiom, in one place: the 32-seg/quadrant
    * linearization of `g` carrying its normalized curved EWKB as
    * `userData`, so curved-aware consumers ([[areaOfBytes]], the fusion
    * kernels, the fused root serializer) can branch back to the exact
    * curved semantics. Every tier that attaches the marker goes through
    * here — the convention cannot drift between call sites. */
  def linearizedWithSource(g: CG, srid: Int): Geometry = {
    val out = linearize(g, srid, 32)
    out.setUserData(write(g, srid))
    out
  }

  private def mkCoord(c: Array[Double], z: Boolean): Coordinate =
    if (z && c.length > 2) new Coordinate(c(0), c(1), c(2))
    else new Coordinate(c(0), c(1))

  private def lineCoords(l: CLine, spq: Int): Array[Coordinate] = {
    if (!l.circular) return l.pts.map(mkCoord(_, l.z))
    val buf = new scala.collection.mutable.ArrayBuffer[Coordinate]()
    def same(a: Coordinate, b: Coordinate): Boolean =
      a.x == b.x && a.y == b.y && (a.getZ == b.getZ || (a.getZ.isNaN && b.getZ.isNaN))
    def add(c: Coordinate): Unit = if (buf.isEmpty || !same(buf.last, c)) buf += c
    require(l.pts.isEmpty || (l.pts.length >= 3 && l.pts.length % 2 == 1),
      s"circularstring: invalid point count ${l.pts.length} (need odd >= 3)")
    var i = 0
    while (i + 2 < l.pts.length) {
      Curved.arcChordCoords(l.pts(i), l.pts(i + 1), l.pts(i + 2), spq).foreach(add)
      i += 2
    }
    if (buf.length == 1) buf += new Coordinate(buf.head)
    buf.toArray
  }

  private def compoundCoords(c: CCompound, spq: Int): Array[Coordinate] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Coordinate]()
    def add(co: Coordinate): Unit =
      if (buf.isEmpty || buf.last.x != co.x || buf.last.y != co.y) buf += co
    c.segs.foreach(s => lineCoords(s, spq).foreach(add))
    if (buf.length == 1) buf += new Coordinate(buf.head)
    buf.toArray
  }

  private def ringCoords(r: CG, spq: Int): Array[Coordinate] = r match {
    case l: CLine => lineCoords(l, spq)
    case c: CCompound => compoundCoords(c, spq)
    case other => throw new IllegalArgumentException(
      s"ring must be a curve, got code ${other.code}")
  }

  private def closeRing(cs: Array[Coordinate]): Array[Coordinate] = {
    if (cs.isEmpty) return cs
    val closed =
      if (cs.head.x != cs.last.x || cs.head.y != cs.last.y) cs :+ new Coordinate(cs.head)
      else cs
    // JTS LinearRing needs >= 4 points; degenerate rings (all control
    // points identical dedup to 1-2 coords) pad in place
    if (closed.length >= 4) closed
    else closed ++ Array.fill(4 - closed.length)(new Coordinate(closed.head))
  }

  // ---------------------------------------------------------- exact length

  /** Arc through (p0, p1, p2): (cx, cy, r, signedSweep); None if collinear
    * (straight chord). The SQL-MM full-circle form (p0 == p2, distinct p1)
    * yields sweep +2π, drawn counterclockwise — the same convention as
    * [[Curved.linearize]]. */
  /** |(dx, dy)| — exact when one component is 0 (keeps dyadic-coordinate
    * circles bit-reproducible against closed-form oracles). */
  private def dist(dx: Double, dy: Double): Double =
    if (dy == 0) math.abs(dx)
    else if (dx == 0) math.abs(dy)
    else math.hypot(dx, dy)

  def arcParams(p0: Array[Double], p1: Array[Double], p2: Array[Double])
      : Option[(Double, Double, Double, Double)] = {
    val (x0, y0) = (p0(0), p0(1)); val (x1, y1) = (p1(0), p1(1)); val (x2, y2) = (p2(0), p2(1))
    if (x0 == x2 && y0 == y2 && (x0 != x1 || y0 != y1)) {
      val cx = (x0 + x1) / 2; val cy = (y0 + y1) / 2
      return Some((cx, cy, dist(x0 - cx, y0 - cy), 2 * math.Pi))
    }
    val d = 2.0 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
    val scale = math.max(math.abs(x0 - x2) + math.abs(y0 - y2), 1.0)
    if (math.abs(d) < 1e-12 * scale * scale) return None
    val s0 = x0 * x0 + y0 * y0; val s1 = x1 * x1 + y1 * y1; val s2 = x2 * x2 + y2 * y2
    val cx = (s0 * (y1 - y2) + s1 * (y2 - y0) + s2 * (y0 - y1)) / d
    val cy = (s0 * (x2 - x1) + s1 * (x0 - x2) + s2 * (x1 - x0)) / d
    val r = dist(x0 - cx, y0 - cy)
    val a0 = math.atan2(y0 - cy, x0 - cx)
    val a2 = math.atan2(y2 - cy, x2 - cx)
    val ccw = d > 0
    val twoPi = 2 * math.Pi
    val sweep =
      if (ccw) { val s = (a2 - a0) % twoPi; if (s <= 0) s + twoPi else s }
      else { val s = (a2 - a0) % twoPi; if (s >= 0) s - twoPi else s }
    Some((cx, cy, r, sweep))
  }

  private def lineLength(l: CLine): Double = {
    var total = 0.0
    if (l.circular) {
      var i = 0
      while (i + 2 < l.pts.length) {
        arcParams(l.pts(i), l.pts(i + 1), l.pts(i + 2)) match {
          case Some((_, _, r, sweep)) => total += r * math.abs(sweep)
          case None =>
            total += dist(l.pts(i + 1)(0) - l.pts(i)(0), l.pts(i + 1)(1) - l.pts(i)(1)) +
              dist(l.pts(i + 2)(0) - l.pts(i + 1)(0), l.pts(i + 2)(1) - l.pts(i + 1)(1))
        }
        i += 2
      }
    } else {
      var i = 1
      while (i < l.pts.length) {
        total += dist(l.pts(i)(0) - l.pts(i - 1)(0), l.pts(i)(1) - l.pts(i - 1)(1))
        i += 1
      }
    }
    total
  }

  /** Exact length: arcs contribute r·|sweep|, straight segments their
    * chord length; polygons their ring perimeters (JTS `getLength`
    * semantics); points 0. */
  def length(g: CG): Double = g match {
    case _: CPoint => 0.0
    case l: CLine => lineLength(l)
    case c: CCompound => c.segs.map(lineLength).sum
    case CPoly(rings, _, _, _) => rings.map(length).sum
    case CMulti(_, parts, _, _) => parts.map(length).sum
  }

  // ------------------------------------------------------------ exact area

  /** Signed area of one closed curved ring: shoelace over the arc-endpoint
    * chord polygon plus `(r²/2)(s - sin s)` per arc with signed sweep `s`
    * (CCW positive). The formula holds for major arcs and the full-circle
    * form (chord degenerate, term = πr²). */
  private def signedRingArea(r: CG): Double = {
    var shoelace = 0.0
    var segments = 0.0
    var px = Double.NaN; var py = Double.NaN
    var first: Array[Double] = null
    def visit(x: Double, y: Double): Unit = {
      if (first == null) first = Array(x, y)
      else shoelace += px * y - x * py
      px = x; py = y
    }
    def walkLine(l: CLine): Unit =
      if (l.circular) {
        var i = 0
        while (i + 2 < l.pts.length) {
          val (p0, p1, p2) = (l.pts(i), l.pts(i + 1), l.pts(i + 2))
          if (first == null) visit(p0(0), p0(1))
          arcParams(p0, p1, p2) match {
            case Some((_, _, rr, sweep)) =>
              segments += rr * rr / 2 * (sweep - math.sin(sweep))
              visit(p2(0), p2(1))
            case None =>
              visit(p1(0), p1(1)); visit(p2(0), p2(1))
          }
          i += 2
        }
      } else l.pts.foreach(p => visit(p(0), p(1)))
    r match {
      case l: CLine => walkLine(l)
      case c: CCompound => c.segs.foreach(walkLine)
      case other => throw new IllegalArgumentException(
        s"ring must be a curve, got code ${other.code}")
    }
    // close the chord polygon back to the first vertex
    if (first != null && (px != first(0) || py != first(1)))
      shoelace += px * first(1) - first(0) * py
    shoelace / 2 + segments
  }

  /** Exact area: polygons = |exterior| − Σ|holes| (JTS convention, ring
    * orientation ignored); curves and points 0; collections sum. */
  def area(g: CG): Double = g match {
    case CPoly(rings, _, _, _) =>
      if (rings.isEmpty) 0.0
      else math.max(0.0,
        math.abs(signedRingArea(rings.head)) -
          rings.tail.map(r => math.abs(signedRingArea(r))).sum)
    case CMulti(_, parts, _, _) => parts.map(area).sum
    case _ => 0.0
  }

  // ---------------------------------------------------------- exact bounds

  /** Exact (xmin, ymin, xmax, ymax): arc spans include the axis-extreme
    * angles (0, π/2, π, 3π/2) crossed by the sweep — a chordal bbox would
    * clip the bulge. NaN×4 for empties ([[graft.serde.GeomUtil]]'s empty
    * convention). */
  def bounds(g: CG): Array[Double] = {
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    var any = false
    def pt(x: Double, y: Double): Unit = {
      if (!x.isNaN && !y.isNaN) {
        any = true
        if (x < xmin) xmin = x; if (x > xmax) xmax = x
        if (y < ymin) ymin = y; if (y > ymax) ymax = y
      }
    }
    def walkLine(l: CLine): Unit =
      if (l.circular) {
        var i = 0
        while (i + 2 < l.pts.length) {
          val (p0, p1, p2) = (l.pts(i), l.pts(i + 1), l.pts(i + 2))
          pt(p0(0), p0(1)); pt(p2(0), p2(1))
          arcParams(p0, p1, p2) match {
            case Some((cx, cy, r, sweep)) =>
              val a0 = math.atan2(p0(1) - cy, p0(0) - cx)
              var q = math.ceil(a0 / (math.Pi / 2)) * (math.Pi / 2)
              val aEnd = a0 + sweep
              if (sweep >= 0) {
                while (q <= aEnd) { pt(cx + r * math.cos(q), cy + r * math.sin(q)); q += math.Pi / 2 }
              } else {
                q = math.floor(a0 / (math.Pi / 2)) * (math.Pi / 2)
                while (q >= aEnd) { pt(cx + r * math.cos(q), cy + r * math.sin(q)); q -= math.Pi / 2 }
              }
            case None => pt(p1(0), p1(1))
          }
          i += 2
        }
        // odd tail (single remaining point) is impossible in valid input;
        // empty input contributes nothing
      } else l.pts.foreach(p => pt(p(0), p(1)))
    def walk(g: CG): Unit = g match {
      case CPoint(c, _, _) => pt(c(0), c(1))
      case l: CLine => walkLine(l)
      case c: CCompound => c.segs.foreach(walkLine)
      case CPoly(rings, _, _, _) => rings.foreach(walk)
      case CMulti(_, parts, _, _) => parts.foreach(walk)
    }
    walk(g)
    if (!any) Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    else Array(xmin, ymin, xmax, ymax)
  }

  /** Exact-arc envelope of curved EWKB as a JTS geometry, mirroring the
    * shape conventions of JTS `getEnvelope` (empty → empty point, single
    * point → point, zero-width/height → 2-point line, else the CCW
    * rectangle) but built from [[bounds]]' arc-extreme box — so
    * `st_envelope` and `st_bounds` agree on curved input instead of
    * differing by the chord sagitta of the 32-seg linearization. */
  def envelopeGeom(bytes: Array[Byte]): Geometry = {
    val (srid, g) = parse(bytes)
    val b = bounds(g)
    val f = EWKB.geometryFactory
    val out: Geometry =
      if (b(0).isNaN) f.createPoint()
      else if (b(0) == b(2) && b(1) == b(3))
        f.createPoint(new Coordinate(b(0), b(1)))
      else if (b(0) == b(2) || b(1) == b(3))
        f.createLineString(Array(new Coordinate(b(0), b(1)), new Coordinate(b(2), b(3))))
      else f.createPolygon(Array(
        new Coordinate(b(0), b(1)), new Coordinate(b(2), b(1)),
        new Coordinate(b(2), b(3)), new Coordinate(b(0), b(3)),
        new Coordinate(b(0), b(1))))
    if (srid != 0) out.setSRID(srid)
    out
  }

  /** Bytes-level exact area: the branch compute tiers take BEFORE an
    * [[EWKB.read]] would linearize — curved input gets the closed form,
    * everything else the JTS kernel. Shared by the UDF and native tiers
    * so they cannot drift. */
  def areaOfBytes(b: Array[Byte]): Double =
    if (isCurvedBytes(b)) area(parse(b)._2)
    else {
      val g = EWKB.read(b)
      g.getUserData match {
        // curve-bearing GeometryCollection: read() linearized it and left
        // the curved source on userData — stay exact
        case src: Array[Byte] => area(parse(src)._2)
        case _ => g.getArea
      }
    }

  /** Bytes-level exact length — see [[areaOfBytes]]. */
  def lengthOfBytes(b: Array[Byte]): Double =
    if (isCurvedBytes(b)) length(parse(b)._2)
    else {
      val g = EWKB.read(b)
      g.getUserData match {
        case src: Array[Byte] => length(parse(src)._2)
        case _ => g.getLength
      }
    }

  // ------------------------------------------------- control-point mapping

  /** Transform CONTROL POINTS, keeping the curved type — the GEOS affine-
    * on-curves semantics (the arc through the transformed points: exact
    * for rigid motions and uniform scaling, GEOS's accepted approximation
    * for anisotropic maps). `forceDim`: 2 strips Z/M, 3 ensures Z and
    * drops M (mirroring [[GeomUtil.mapCoords]]), 0 keeps the node's dims
    * (M ordinates pass through untouched). */
  def mapControlPoints(g: CG,
      f: (Double, Double, Double) => (Double, Double, Double),
      forceDim: Int = 0): CG = {
    def flags(z: Boolean, m: Boolean): (Boolean, Boolean) = forceDim match {
      case 2 => (false, false)
      case 3 => (true, false)
      case _ => (z, m)
    }
    def mapPts(pts: Array[Array[Double]], z: Boolean, m: Boolean): Array[Array[Double]] = {
      val (oz, om) = flags(z, m)
      pts.map { c =>
        val zIn = if (z && c.length > 2) c(2) else Double.NaN
        val (x2, y2, z2) = f(c(0), c(1), zIn)
        val out = new Array[Double](2 + (if (oz) 1 else 0) + (if (om) 1 else 0))
        out(0) = x2; out(1) = y2
        var i = 2
        if (oz) { out(i) = z2; i += 1 }
        if (om) {
          val mi = 2 + (if (z) 1 else 0)
          out(i) = if (m && c.length > mi) c(mi) else Double.NaN
        }
        out
      }
    }
    g match {
      case CPoint(c, z, m) =>
        val (oz, om) = flags(z, m)
        CPoint(mapPts(Array(c), z, m).head, oz, om)
      case l: CLine =>
        val (oz, om) = flags(l.z, l.m)
        CLine(mapPts(l.pts, l.z, l.m), l.circular, oz, om)
      case c: CCompound =>
        val (oz, om) = flags(c.z, c.m)
        CCompound(c.segs.map(s => mapControlPoints(s, f, forceDim).asInstanceOf[CLine]), oz, om)
      case p: CPoly =>
        val (oz, om) = flags(p.z, p.m)
        CPoly(p.rings.map(mapControlPoints(_, f, forceDim)), p.curve, oz, om)
      case mu: CMulti =>
        val (oz, om) = flags(mu.z, mu.m)
        CMulti(mu.code, mu.parts.map(mapControlPoints(_, f, forceDim)), oz, om)
    }
  }

  /** Reverse traversal order, keeping the curved type: each curve's
    * control points reverse (an odd-count CircularString stays valid),
    * compound segments reverse in order AND internally, rings reverse,
    * collection part order is kept (JTS `reverse()` semantics). */
  def reverseG(g: CG): CG = g match {
    case p: CPoint => p
    case l: CLine => l.copy(pts = l.pts.reverse)
    case c: CCompound =>
      c.copy(segs = c.segs.reverse.map(s => s.copy(pts = s.pts.reverse)))
    case p: CPoly => p.copy(rings = p.rings.map(reverseG))
    case mu: CMulti => mu.copy(parts = mu.parts.map(reverseG))
  }

  // ------------------------------------------------------------- accessors

  /** Control-point count (what `count_coordinates` reports — arcs are NOT
    * densified). */
  def countCoordinates(g: CG): Int = g match {
    case CPoint(c, _, _) => if (c(0).isNaN && c(1).isNaN) 0 else 1
    case l: CLine => l.pts.length
    case c: CCompound => c.segs.map(_.pts.length).sum
    case CPoly(rings, _, _, _) => rings.map(countCoordinates).sum
    case CMulti(_, parts, _, _) => parts.map(countCoordinates).sum
  }

  /** Flat control-point rows (x, y[, z]) with the same dim-override
    * semantics as [[GeomUtil.coordinateRows]]. */
  def coordinateRows(g: CG, dim: Option[Int]): Seq[Seq[Double]] = {
    val buf = Seq.newBuilder[Seq[Double]]
    def emit(c: Array[Double], z: Boolean): Unit = {
      val hasZ = z && c.length > 2
      buf += (dim.getOrElse(if (hasZ) 3 else 2) match {
        case 2 => Seq(c(0), c(1))
        case _ => Seq(c(0), c(1), if (hasZ) c(2) else Double.NaN)
      })
    }
    def walk(g: CG): Unit = g match {
      case CPoint(c, z, _) => if (!(c(0).isNaN && c(1).isNaN)) emit(c, z)
      case l: CLine => l.pts.foreach(emit(_, l.z))
      case c: CCompound => c.segs.foreach(s => s.pts.foreach(emit(_, s.z)))
      case CPoly(rings, _, _, _) => rings.foreach(walk)
      case CMulti(_, parts, _, _) => parts.foreach(walk)
    }
    walk(g)
    buf.result()
  }

  /** Closed iff non-empty and first point == last point IN X/Y ONLY
    * (compound curves chain across segments). Mirrors JTS `isClosed`,
    * which compares endpoints with `equals2D` — Z/M deltas don't count,
    * so the curved tier and the post-linearize JTS tier agree. */
  def isClosed(g: CG): Boolean = {
    def eq2d(a: Array[Double], b: Array[Double]): Boolean =
      a(0) == b(0) && a(1) == b(1)
    g match {
      case l: CLine =>
        l.pts.nonEmpty && eq2d(l.pts.head, l.pts.last)
      case c: CCompound =>
        c.segs.nonEmpty && c.segs.head.pts.nonEmpty && c.segs.last.pts.nonEmpty &&
          eq2d(c.segs.head.pts.head, c.segs.last.pts.last)
      case CMulti(11, parts, _, _) => parts.nonEmpty && parts.forall(isClosed)
      case _ => false
    }
  }

  /** Direct members for `count_geometries` / `get_geometry` / `parts`:
    * collection types expose parts, atomic curved types themselves. */
  def members(g: CG): Vector[CG] = g match {
    case CMulti(_, parts, _, _) => parts
    case other => Vector(other)
  }

  def isEmptyG(g: CG): Boolean = g match {
    case CPoint(c, _, _) => c(0).isNaN && c(1).isNaN
    case l: CLine => l.pts.isEmpty
    case c: CCompound => c.segs.forall(_.pts.isEmpty)
    case CPoly(rings, _, _, _) => rings.isEmpty
    case CMulti(_, parts, _, _) => parts.forall(isEmptyG)
  }

  // ------------------------------------------------------------------- WKT

  private def fmt(d: Double): String =
    org.locationtech.jts.io.OrdinateFormat.DEFAULT.format(d)

  private def coordText(c: Array[Double], z: Boolean, m: Boolean): String = {
    val sb = new StringBuilder(fmt(c(0))).append(' ').append(fmt(c(1)))
    var i = 2
    if (z && c.length > i) { sb.append(' ').append(fmt(c(i))); i += 1 }
    if (m && c.length > i) sb.append(' ').append(fmt(c(i)))
    sb.toString
  }

  private def zmTag(g: CG): String =
    (if (g.z) "Z" else "") + (if (g.m) "M" else "")

  /** WKT for the model — curved tags per SQL-MM / PostGIS: bare
    * parenthesized lists mean LineString segments/rings inside
    * COMPOUNDCURVE / CURVEPOLYGON / MULTICURVE / MULTISURFACE. */
  def toWkt(g: CG): String = {
    def ptsText(pts: Array[Array[Double]], z: Boolean, m: Boolean): String =
      if (pts.isEmpty) "EMPTY" else pts.map(coordText(_, z, m)).mkString("(", ", ", ")")
    def lineBody(l: CLine): String = ptsText(l.pts, l.z, l.m)
    def segText(l: CLine): String =
      if (l.circular) "CIRCULARSTRING " + lineBody(l) else lineBody(l)
    def compBody(c: CCompound): String =
      if (c.segs.isEmpty) "EMPTY" else c.segs.map(segText).mkString("(", ", ", ")")
    def ringText(r: CG): String = r match {
      case l: CLine if !l.circular => lineBody(l)
      case l: CLine => "CIRCULARSTRING " + lineBody(l)
      case c: CCompound => "COMPOUNDCURVE " + compBody(c)
      case other => throw new IllegalArgumentException(s"bad ring code ${other.code}")
    }
    def top(g: CG): String = g match {
      case l: CLine if l.circular =>
        s"CIRCULARSTRING ${tagSp(l)}${lineBody(l)}"
      case l: CLine => s"LINESTRING ${tagSp(l)}${lineBody(l)}"
      case c: CCompound => s"COMPOUNDCURVE ${tagSp(c)}${compBody(c)}"
      case p @ CPoly(rings, true, _, _) =>
        val body = if (rings.isEmpty) "EMPTY" else rings.map(ringText).mkString("(", ", ", ")")
        s"CURVEPOLYGON ${tagSp(p)}$body"
      case p @ CPoly(rings, false, _, _) =>
        val body = if (rings.isEmpty) "EMPTY"
        else rings.map { case l: CLine => lineBody(l); case r => ringText(r) }
          .mkString("(", ", ", ")")
        s"POLYGON ${tagSp(p)}$body"
      case mu @ CMulti(11, parts, _, _) =>
        val body = if (parts.isEmpty) "EMPTY" else parts.map {
          case l: CLine if !l.circular => lineBody(l)
          case l: CLine => "CIRCULARSTRING " + lineBody(l)
          case c: CCompound => "COMPOUNDCURVE " + compBody(c)
          case other => throw new IllegalArgumentException(s"bad MultiCurve member ${other.code}")
        }.mkString("(", ", ", ")")
        s"MULTICURVE ${tagSp(mu)}$body"
      case mu @ CMulti(12, parts, _, _) =>
        val body = if (parts.isEmpty) "EMPTY" else parts.map {
          case CPoly(rings, false, z, m) =>
            rings.map { case l: CLine => ptsText(l.pts, z, m); case r => ringText(r) }
              .mkString("(", ", ", ")")
          case p: CPoly => "CURVEPOLYGON " + (
            if (p.rings.isEmpty) "EMPTY" else p.rings.map(ringText).mkString("(", ", ", ")"))
          case other => throw new IllegalArgumentException(s"bad MultiSurface member ${other.code}")
        }.mkString("(", ", ", ")")
        s"MULTISURFACE ${tagSp(mu)}$body"
      case CPoint(c, z, m) =>
        if (c(0).isNaN && c(1).isNaN) "POINT EMPTY"
        else s"POINT ${if (z || m) zmTag(g) + " " else ""}(${coordText(c, z, m)})"
      // curve-bearing GeometryCollections reach the curved WKT writer via
      // the fused serializer kernels (code-7 source markers); linear
      // multi types can appear as their members — cover the full model
      case mu @ CMulti(7, parts, _, _) =>
        val body = if (parts.isEmpty) "EMPTY" else parts.map(top).mkString("(", ", ", ")")
        s"GEOMETRYCOLLECTION ${tagSp(mu)}$body"
      case mu @ CMulti(4, parts, _, _) =>
        val body = if (parts.isEmpty) "EMPTY" else parts.map {
          case CPoint(c, z, m) =>
            if (c(0).isNaN && c(1).isNaN) "EMPTY" else s"(${coordText(c, z, m)})"
          case other => throw new IllegalArgumentException(
            s"toWkt: bad MultiPoint member ${other.code}")
        }.mkString("(", ", ", ")")
        s"MULTIPOINT ${tagSp(mu)}$body"
      case mu @ CMulti(5, parts, _, _) =>
        val body = if (parts.isEmpty) "EMPTY" else parts.map {
          case l: CLine if !l.circular => lineBody(l)
          case other => throw new IllegalArgumentException(
            s"toWkt: bad MultiLineString member ${other.code}")
        }.mkString("(", ", ", ")")
        s"MULTILINESTRING ${tagSp(mu)}$body"
      case mu @ CMulti(6, parts, _, _) =>
        val body = if (parts.isEmpty) "EMPTY" else parts.map {
          case CPoly(rings, false, z, m) =>
            rings.map { case l: CLine => ptsText(l.pts, z, m); case r => ringText(r) }
              .mkString("(", ", ", ")")
          case other => throw new IllegalArgumentException(
            s"toWkt: bad MultiPolygon member ${other.code}")
        }.mkString("(", ", ", ")")
        s"MULTIPOLYGON ${tagSp(mu)}$body"
      case mu: CMulti => throw new IllegalArgumentException(
        s"toWkt: unexpected collection code ${mu.code} in curved writer")
    }
    def tagSp(g: CG): String = { val t = zmTag(g); if (t.isEmpty) "" else t + " " }
    top(g)
  }

  // ------------------------------------------------------------- WKT parse

  private val CurvedTags =
    Set("CIRCULARSTRING", "COMPOUNDCURVE", "CURVEPOLYGON", "MULTICURVE", "MULTISURFACE")

  /** Single forward case-insensitive scan for any curved tag — no
    * uppercase copy of (potentially multi-KB) WKT on the per-row
    * constructor hot path. */
  private def hasCurvedTag(s: String, from: Int): Boolean = {
    var i = from
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == 'C' || ch == 'c') {
        if (s.regionMatches(true, i, "CIRCULARSTRING", 0, 14) ||
            s.regionMatches(true, i, "COMPOUNDCURVE", 0, 13) ||
            s.regionMatches(true, i, "CURVEPOLYGON", 0, 12)) return true
      } else if (ch == 'M' || ch == 'm') {
        if (s.regionMatches(true, i, "MULTICURVE", 0, 10) ||
            s.regionMatches(true, i, "MULTISURFACE", 0, 12)) return true
      }
      i += 1
    }
    false
  }

  /** Does the WKT string need the curved parser: a curved top tag, or a
    * GEOMETRYCOLLECTION that mentions a curved tag anywhere (JTS's reader
    * rejects curved members). Used by `from_wkt` to route to [[parseWkt]]. */
  def isCurvedWkt(s: String): Boolean = {
    var i = 0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    var j = i
    while (j < s.length && s.charAt(j).isLetter) j += 1
    val tag = s.substring(i, j).toUpperCase(java.util.Locale.ROOT)
    CurvedTags.contains(tag) ||
      (tag == "GEOMETRYCOLLECTION" && hasCurvedTag(s, j))
  }

  /** Recursive-descent parser for curved WKT (the five tags above, nested
    * LineString/ring shorthand, Z/M/ZM, EMPTY). Returns the model. */
  def parseWkt(s: String): CG = {
    val p = new WktCursor(s)
    val g = p.geometry()
    p.skipWs()
    require(p.eof, s"trailing characters in WKT at offset ${p.pos}")
    g
  }

  private final class WktCursor(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    def peek: Char = s.charAt(pos)
    def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at offset $pos in: $s")
      pos += 1
    }
    def word(): String = {
      skipWs()
      val st = pos
      while (!eof && s.charAt(pos).isLetter) pos += 1
      s.substring(st, pos).toUpperCase(java.util.Locale.ROOT)
    }
    def number(): Double = {
      skipWs()
      val st = pos
      while (!eof && { val c = s.charAt(pos)
        c.isDigit || c == '-' || c == '+' || c == '.' || c == 'e' || c == 'E' }) pos += 1
      require(pos > st, s"expected number at offset $st in: $s")
      s.substring(st, pos).toDouble
    }
    /** (z, m) from an optional dimension tag; also accepts EMPTY lookahead
      * handled by callers. */
    def dimTag(): (Boolean, Boolean) = {
      skipWs()
      val save = pos
      val w = word()
      w match {
        case "Z" => (true, false)
        case "M" => (false, true)
        case "ZM" => (true, true)
        case _ => pos = save; (false, false)
      }
    }
    def isEmptyWord(): Boolean = {
      skipWs()
      val save = pos
      if (word() == "EMPTY") true else { pos = save; false }
    }
    /** Point list with free ordinate counts (2-4 per point); returns the
      * points plus the widest count seen, so the caller can infer
      * dimensions from untagged 3D/4D WKT the way JTS's reader does. */
    def coordsFree(): (Array[Array[Double]], Int) = {
      expect('(')
      val buf = scala.collection.mutable.ArrayBuffer[Array[Double]]()
      var maxN = 2
      var done = false
      while (!done) {
        val c = scala.collection.mutable.ArrayBuffer[Double](number(), number())
        skipWs()
        while (!eof && peek != ',' && peek != ')') { c += number(); skipWs() }
        require(c.length <= 4, s"coordinate has ${c.length} ordinates (max 4)")
        if (c.length > maxN) maxN = c.length
        buf += c.toArray
        skipWs()
        if (!eof && peek == ',') pos += 1 else done = true
      }
      expect(')')
      (buf.toArray, maxN)
    }
    /** Untagged 3rd ordinate is Z, 4th is M (the JTS/PostGIS reader
      * convention) — unless an explicit M tag claims the 3rd. */
    def inferFlags(z0: Boolean, m0: Boolean, n: Int): (Boolean, Boolean) =
      if (n >= 4) (true, true)
      else if (n == 3) { if (m0 && !z0) (false, true) else (true, m0) }
      else (z0, m0)
    def lineBody(circular: Boolean, z0: Boolean, m0: Boolean): CLine =
      if (isEmptyWord()) CLine(Array.empty, circular, z0, m0)
      else {
        val (pts0, maxN) = coordsFree()
        val (z, m) = inferFlags(z0, m0, maxN)
        val dims = 2 + (if (z) 1 else 0) + (if (m) 1 else 0)
        // strict like JTS: every point carries exactly the line's dims —
        // silent NaN padding would emit WKT no reader can parse back
        pts0.foreach(c => require(c.length == dims,
          s"coordinate has ${c.length} ordinates, expected $dims"))
        CLine(pts0, circular, z, m)
      }
    /** One compound segment: CIRCULARSTRING tag or bare parenthesized
      * LineString point list. */
    def segment(z: Boolean, m: Boolean): CLine = {
      skipWs()
      if (peek == '(') lineBody(circular = false, z, m)
      else {
        val w = word()
        require(w == "CIRCULARSTRING", s"bad compound segment tag $w")
        val (zz, mm) = dimTag()
        lineBody(circular = true, z || zz, m || mm)
      }
    }
    def compoundBody(z: Boolean, m: Boolean): CCompound =
      if (isEmptyWord()) CCompound(Vector.empty, z, m)
      else {
        expect('(')
        val segs = Vector.newBuilder[CLine]
        var done = false
        while (!done) {
          segs += segment(z, m)
          skipWs()
          if (!eof && peek == ',') pos += 1 else done = true
        }
        expect(')')
        CCompound(segs.result(), z, m)
      }
    def ring(z: Boolean, m: Boolean): CG = {
      skipWs()
      if (peek == '(') lineBody(circular = false, z, m)
      else word() match {
        case "CIRCULARSTRING" =>
          val (zz, mm) = dimTag(); lineBody(circular = true, z || zz, m || mm)
        case "COMPOUNDCURVE" =>
          val (zz, mm) = dimTag(); compoundBody(z || zz, m || mm)
        case w => throw new IllegalArgumentException(s"bad ring tag $w")
      }
    }
    def polyBody(z: Boolean, m: Boolean): CPoly =
      if (isEmptyWord()) CPoly(Vector.empty, curve = false, z, m)
      else {
        expect('(')
        val rings = Vector.newBuilder[CG]
        var done = false
        while (!done) {
          rings += lineBody(circular = false, z, m)
          skipWs()
          if (!eof && peek == ',') pos += 1 else done = true
        }
        expect(')')
        val rs = rings.result()
        // lift inferred ring dims to the polygon: writeGeom's bare-ring
        // branch gates ordinate output on the POLYGON's flags, so an
        // untagged-3D ring would silently lose Z without this
        CPoly(rs, curve = false,
          z || rs.exists(_.z), m || rs.exists(_.m))
      }
    def curvePolyBody(z: Boolean, m: Boolean): CPoly =
      if (isEmptyWord()) CPoly(Vector.empty, curve = true, z, m)
      else {
        expect('(')
        val rings = Vector.newBuilder[CG]
        var done = false
        while (!done) {
          rings += ring(z, m)
          skipWs()
          if (!eof && peek == ',') pos += 1 else done = true
        }
        expect(')')
        CPoly(rings.result(), curve = true, z, m)
      }
    def geometry(): CG = {
      val tag = word()
      val (z, m) = dimTag()
      tag match {
        case "CIRCULARSTRING" => lineBody(circular = true, z, m)
        case "COMPOUNDCURVE" => compoundBody(z, m)
        case "CURVEPOLYGON" => curvePolyBody(z, m)
        case "MULTICURVE" =>
          if (isEmptyWord()) CMulti(11, Vector.empty, z, m)
          else {
            expect('(')
            val parts = Vector.newBuilder[CG]
            var done = false
            while (!done) {
              parts += ring(z, m) // same grammar: bare list | CIRCULARSTRING | COMPOUNDCURVE
              skipWs()
              if (!eof && peek == ',') pos += 1 else done = true
            }
            expect(')')
            CMulti(11, parts.result(), z, m)
          }
        case "MULTISURFACE" =>
          if (isEmptyWord()) CMulti(12, Vector.empty, z, m)
          else {
            expect('(')
            val parts = Vector.newBuilder[CG]
            var done = false
            while (!done) {
              skipWs()
              if (peek == '(') {
                // bare polygon: (ring, ring...)
                expect('(')
                val rings = Vector.newBuilder[CG]
                var rdone = false
                while (!rdone) {
                  rings += ring(z, m)
                  skipWs()
                  if (!eof && peek == ',') pos += 1 else rdone = true
                }
                expect(')')
                parts += CPoly(rings.result(), curve = false, z, m)
              } else {
                val w = word()
                require(w == "CURVEPOLYGON", s"bad MultiSurface member tag $w")
                val (zz, mm) = dimTag()
                parts += curvePolyBody(z || zz, m || mm)
              }
              skipWs()
              if (!eof && peek == ',') pos += 1 else done = true
            }
            expect(')')
            CMulti(12, parts.result(), z, m)
          }
        // linear types appear as GEOMETRYCOLLECTION members of curve-
        // bearing collections (the only route into this parser for them)
        case "POINT" =>
          if (isEmptyWord()) CPoint(Array(Double.NaN, Double.NaN), z, m)
          else {
            val l = lineBody(circular = false, z, m)
            require(l.pts.length == 1, s"POINT needs 1 coordinate, got ${l.pts.length}")
            CPoint(l.pts.head, l.z, l.m)
          }
        case "LINESTRING" => lineBody(circular = false, z, m)
        case "POLYGON" => polyBody(z, m)
        case "MULTIPOINT" =>
          if (isEmptyWord()) CMulti(4, Vector.empty, z, m)
          else {
            expect('(')
            val parts = Vector.newBuilder[CG]
            var done = false
            while (!done) {
              skipWs()
              // both MULTIPOINT ((0 0), (1 1)) and MULTIPOINT (0 0, 1 1),
              // plus JTS-style EMPTY members
              if (isEmptyWord())
                parts += CPoint(Array(Double.NaN, Double.NaN), z, m)
              else if (peek == '(') {
                val l = lineBody(circular = false, z, m)
                require(l.pts.length == 1,
                  s"MULTIPOINT member needs 1 coordinate, got ${l.pts.length}")
                parts += CPoint(l.pts.head, l.z, l.m)
              } else {
                val buf = scala.collection.mutable.ArrayBuffer[Double](number(), number())
                skipWs()
                while (!eof && peek != ',' && peek != ')') { buf += number(); skipWs() }
                require(buf.length <= 4, s"coordinate has ${buf.length} ordinates (max 4)")
                val (pz, pm) = inferFlags(z, m, buf.length)
                parts += CPoint(buf.toArray, pz, pm)
              }
              skipWs()
              if (!eof && peek == ',') pos += 1 else done = true
            }
            expect(')')
            CMulti(4, parts.result(), z, m)
          }
        case "MULTILINESTRING" =>
          if (isEmptyWord()) CMulti(5, Vector.empty, z, m)
          else {
            expect('(')
            val parts = Vector.newBuilder[CG]
            var done = false
            while (!done) {
              parts += lineBody(circular = false, z, m)
              skipWs()
              if (!eof && peek == ',') pos += 1 else done = true
            }
            expect(')')
            CMulti(5, parts.result(), z, m)
          }
        case "MULTIPOLYGON" =>
          if (isEmptyWord()) CMulti(6, Vector.empty, z, m)
          else {
            expect('(')
            val parts = Vector.newBuilder[CG]
            var done = false
            while (!done) {
              parts += polyBody(z, m)
              skipWs()
              if (!eof && peek == ',') pos += 1 else done = true
            }
            expect(')')
            CMulti(6, parts.result(), z, m)
          }
        case "GEOMETRYCOLLECTION" =>
          if (isEmptyWord()) CMulti(7, Vector.empty, z, m)
          else {
            expect('(')
            val parts = Vector.newBuilder[CG]
            var done = false
            while (!done) {
              parts += geometry()
              skipWs()
              if (!eof && peek == ',') pos += 1 else done = true
            }
            expect(')')
            CMulti(7, parts.result(), z, m)
          }
        case w => throw new IllegalArgumentException(s"unsupported curved WKT tag $w")
      }
    }
  }
}
