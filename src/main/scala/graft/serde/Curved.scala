package graft.serde

import org.locationtech.jts.geom.{Coordinate, LineString}

/** CircularString support at the EWKB byte level.
  *
  * JTS has no curved geometry model (SURVEY.md §7), but the EWKB encoding of
  * a CircularString (type code 8, `/root/reference/src/wkb.rs:58`) is just a
  * LineString-shaped coordinate list, so the engine can (a) construct curved
  * EWKB directly from coordinates — the reference `circularstring`
  * constructor (`/root/reference/polars_st/parsing.py:163-189`) — (b) run
  * header/structure accessors on the raw bytes, and (c) **linearize** arcs
  * into a JTS LineString for every compute op, the same strategy the
  * reference documents for OGR import of curved sources
  * (`/root/reference/polars_st/input.py:49-50`).
  *
  * An arc triple (p0, p1, p2) is the circle arc from p0 through p1 to p2; a
  * CircularString with 2k+1 points chains k arcs sharing endpoints.
  */
object Curved {

  val CircularStringCode = 8

  /** Curved type codes 8-12 (CircularString, CompoundCurve, CurvePolygon,
    * MultiCurve, MultiSurface). */
  def isCurvedCode(code: Int): Boolean = code >= 8 && code <= 12

  def isCircularString(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      EWKB.header(bytes).typeCode == CircularStringCode

  // ------------------------------------------------------------------ write

  /** coords (each [x,y] or [x,y,z]) → CircularString EWKB (little-endian,
    * SRID always included at top level like [[EWKB.write]]). Point count
    * must be 0 or an odd number ≥ 3 (chained arc triples). */
  def writeCircularString(coords: Seq[Seq[Double]], srid: Int): Array[Byte] = {
    val n = coords.length
    require(n == 0 || (n >= 3 && n % 2 == 1),
      s"circularstring: point count must be 0 or odd >= 3, got $n")
    val hasZ = coords.exists(_.length >= 3)
    val out = java.nio.ByteBuffer.allocate(9 + 4 + n * (if (hasZ) 24 else 16))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(1.toByte)
    var t = CircularStringCode | EWKB.FlagSrid
    if (hasZ) t |= EWKB.FlagZ
    out.putInt(t)
    out.putInt(srid)
    out.putInt(n)
    coords.foreach { c =>
      require(c.length == 2 || c.length == 3,
        s"coordinate must have 2 or 3 values, got ${c.length}")
      out.putDouble(c(0)); out.putDouble(c(1))
      if (hasZ) out.putDouble(if (c.length >= 3) c(2) else Double.NaN)
    }
    out.array()
  }

  // ------------------------------------------------------------------- read

  /** CircularString EWKB → (header, n×dim coordinate array); dim is 2 or 3
    * following the Z flag. Handles either byte order and ISO type codes —
    * all header/layout facts (including the ISO-code-plus-flag hybrid)
    * come from the single decoder, [[EWKB.header]]. */
  def readCircularString(bytes: Array[Byte]): (EWKB.Header, Array[Array[Double]]) = {
    val h = EWKB.header(bytes)
    require(h.typeCode == CircularStringCode,
      s"not a CircularString: ${EWKB.typeName(h.typeCode)}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order(if (h.littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    var pos = h.payloadOffset
    val n = bb.getInt(pos); pos += 4
    val dims = h.dims
    val keep = if (h.hasZ) 3 else 2
    val out = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val c = new Array[Double](keep)
      var d = 0
      while (d < dims) {
        val v = bb.getDouble(pos); pos += 8
        if (d < keep) c(d) = v
        d += 1
      }
      out(i) = c
      i += 1
    }
    (h, out)
  }

  // -------------------------------------------------------------- linearize

  /** Linearize CircularString EWKB into a JTS LineString: each arc triple
    * becomes ceil(sweep / (π/2)) × `segsPerQuadrant` chords (PostGIS
    * `ST_CurveToLine` convention, default 32 per quadrant); arc endpoints
    * are emitted exactly; collinear triples degrade to straight segments.
    * Z is interpolated linearly along each arc. */
  def linearize(bytes: Array[Byte], segsPerQuadrant: Int = 32): LineString = {
    val (h, pts) = readCircularString(bytes)
    val coords = new scala.collection.mutable.ArrayBuffer[Coordinate]()
    def same(a: Coordinate, b: Coordinate): Boolean =
      a.x == b.x && a.y == b.y &&
        (a.getZ == b.getZ || (a.getZ.isNaN && b.getZ.isNaN))
    def add(c: Coordinate): Unit =
      if (coords.isEmpty || !same(coords.last, c)) coords += c
    // the writer enforces the SQL-MM shape (odd count ≥ 3, or 0); accept
    // only the same from foreign bytes — silently dropping the tail of an
    // even-count curve would truncate geometry without a trace
    require(pts.isEmpty || (pts.length >= 3 && pts.length % 2 == 1),
      s"circularstring: invalid point count ${pts.length} (need odd ≥ 3)")
    var i = 0
    while (i + 2 < pts.length) {
      arcChords(pts(i), pts(i + 1), pts(i + 2), segsPerQuadrant).foreach(add)
      i += 2
    }
    // all points identical: the dedup collapses to ONE coordinate, which
    // JTS rejects — degrade to a 2-point degenerate line at the location
    // (append directly; add() would dedup it away again)
    if (coords.length == 1) coords += new Coordinate(coords.head)
    val ls = EWKB.geometryFactory.createLineString(coords.toArray)
    ls.setSRID(h.srid)
    ls
  }

  private def coord(p: Array[Double]): Coordinate =
    if (p.length >= 3) new Coordinate(p(0), p(1), p(2))
    else new Coordinate(p(0), p(1))

  /** All chord points of the arc p0→p1→p2, endpoints exact. Shared with
    * [[CurvedGeom.linearize]] (the full curved-type model). */
  private[serde] def arcChordCoords(p0: Array[Double], p1: Array[Double],
      p2: Array[Double], segsPerQuadrant: Int): Seq[Coordinate] =
    arcChords(p0, p1, p2, segsPerQuadrant)

  private def arcChords(p0: Array[Double], p1: Array[Double], p2: Array[Double],
      segsPerQuadrant: Int): Seq[Coordinate] = {
    val (x0, y0) = (p0(0), p0(1)); val (x1, y1) = (p1(0), p1(1)); val (x2, y2) = (p2(0), p2(1))
    // SQL-MM FULL CIRCLE form: first == last with a distinct middle point
    // (diametrically opposite). The determinant is exactly 0 there, so
    // the collinear branch would flatten the circle to a straight line —
    // handle it first: center = midpoint(p0, p1), sweep = 2π.
    if (x0 == x2 && y0 == y2 && (x0 != x1 || y0 != y1)) {
      val cx = (x0 + x1) / 2; val cy = (y0 + y1) / 2
      val r = math.hypot(x0 - cx, y0 - cy)
      val a0 = math.atan2(y0 - cy, x0 - cx)
      val n = math.max(4 * segsPerQuadrant, 4)
      val z0 = if (p0.length >= 3) p0(2) else Double.NaN
      return (0 to n).map { k =>
        if (k == 0 || k == n) coord(p0) // endpoints exact
        else {
          val a = a0 + 2 * math.Pi * k / n
          val c = new Coordinate(cx + r * math.cos(a), cy + r * math.sin(a))
          if (!z0.isNaN) c.setZ(z0)
          c
        }
      }
    }
    val d = 2.0 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
    val scale = math.max(math.abs(x0 - x2) + math.abs(y0 - y2), 1.0)
    if (math.abs(d) < 1e-12 * scale * scale) // collinear → straight chords
      return Seq(coord(p0), coord(p1), coord(p2))
    val s0 = x0 * x0 + y0 * y0; val s1 = x1 * x1 + y1 * y1; val s2 = x2 * x2 + y2 * y2
    val cx = (s0 * (y1 - y2) + s1 * (y2 - y0) + s2 * (y0 - y1)) / d
    val cy = (s0 * (x2 - x1) + s1 * (x0 - x2) + s2 * (x1 - x0)) / d
    val r = math.hypot(x0 - cx, y0 - cy)
    val a0 = math.atan2(y0 - cy, x0 - cx)
    val a2 = math.atan2(y2 - cy, x2 - cx)
    val ccw = d > 0
    val twoPi = 2 * math.Pi
    // signed sweep from a0 to a2 in the arc's orientation; the arc through
    // three distinct points is exactly the one traversed in that orientation
    val sweep =
      if (ccw) { val s = (a2 - a0) % twoPi; if (s <= 0) s + twoPi else s }
      else { val s = (a2 - a0) % twoPi; if (s >= 0) s - twoPi else s }
    val z0 = if (p0.length >= 3) p0(2) else Double.NaN
    val z2 = if (p2.length >= 3) p2(2) else Double.NaN
    val nSeg = math.max(1,
      math.ceil(math.abs(sweep) / (math.Pi / 2) * segsPerQuadrant).toInt)
    val out = new scala.collection.mutable.ArrayBuffer[Coordinate](nSeg + 1)
    out += coord(p0)
    var k = 1
    while (k < nSeg) {
      val a = a0 + sweep * k / nSeg
      val z = if (z0.isNaN || z2.isNaN) Double.NaN else z0 + (z2 - z0) * k / nSeg
      out += new Coordinate(cx + r * math.cos(a), cy + r * math.sin(a), z)
      k += 1
    }
    out += coord(p2)
    out.toSeq
  }

  /** Rewrite the top-level SRID of any EWKB value by byte surgery — works
    * for curved types that JTS cannot parse. Layout facts (byte order,
    * SRID-word presence) come from [[EWKB.header]]; only the type word's
    * raw bits are re-read, to OR the SRID flag in while preserving
    * whatever ISO/EWKB encoding the value already uses. */
  def withSrid(bytes: Array[Byte], srid: Int): Array[Byte] = {
    val h = EWKB.header(bytes)
    val order = if (h.littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    if (h.hasSridField) {
      val out = bytes.clone()
      java.nio.ByteBuffer.wrap(out).order(order).putInt(5, srid)
      out
    } else {
      val raw = java.nio.ByteBuffer.wrap(bytes).order(order).getInt(1)
      val out = new Array[Byte](bytes.length + 4)
      out(0) = bytes(0)
      val ob = java.nio.ByteBuffer.wrap(out).order(order)
      ob.putInt(1, raw | EWKB.FlagSrid)
      ob.putInt(5, srid)
      System.arraycopy(bytes, 5, out, 9, bytes.length - 5)
      out
    }
  }
}
