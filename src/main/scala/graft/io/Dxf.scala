package graft.io

import org.locationtech.jts.geom.{Coordinate, Geometry}
import scala.collection.mutable

/** Minimal AutoCAD DXF (ASCII) codec — the ENTITIES-section subset the
  * OGR DXF driver exposes to the reference's `read_file`
  * (`/root/reference/polars_st/input.py:30-153`). DXF is a public
  * tag/value text format: alternating group-code and value lines.
  *
  * Read: POINT, LINE, LWPOLYLINE (closed flag honored), POLYLINE/VERTEX/
  * SEQEND, CIRCLE and ARC (linearized at `arcSegments` chords), each
  * feature carrying its `layer` (group 8) as an attribute — the one
  * attribute the format has. Closed polylines come back as closed
  * LINESTRINGs (OGR semantics: DXF polylines are curves, not surfaces).
  * Everything else (TEXT, HATCH, INSERT, 3DFACE, blocks) is skipped.
  *
  * Write: Point → POINT, LineString → LWPOLYLINE (closed flag when the
  * ring closes), MultiLineString → one LWPOLYLINE per part, Polygon →
  * one closed LWPOLYLINE per ring (boundary export — DXF has no simple
  * polygon entity; documented lossy, reads back as closed linestrings).
  * DXF has no CRS concept: SRIDs are neither written nor read.
  */
private[graft] object Dxf {

  final case class Entity(geom: Geometry, layer: String)

  private def factory = graft.serde.EWKB.geometryFactory

  /** Parse the ENTITIES section. `arcSegments` = chords per full circle
    * when linearizing CIRCLE/ARC. */
  def readEntities(text: String, arcSegments: Int = 64): Seq[Entity] = {
    val lines = text.split("\r?\n")
    // (code, value) pair stream
    val pairs = mutable.ArrayBuffer[(Int, String)]()
    var i = 0
    while (i + 1 < lines.length) {
      val code = try lines(i).trim.toInt catch { case _: NumberFormatException => -999 }
      if (code != -999) pairs += ((code, lines(i + 1).trim))
      i += 2
    }
    val out = mutable.ArrayBuffer[Entity]()
    var p = 0
    def isEntityStart(j: Int): Boolean = pairs(j)._1 == 0
    // advance to ENTITIES section
    var inEntities = false
    while (p < pairs.length && !inEntities) {
      if (pairs(p) == ((0, "SECTION")) && p + 1 < pairs.length &&
          pairs(p + 1) == ((2, "ENTITIES"))) inEntities = true
      p += 1
    }
    if (!inEntities) return Seq.empty
    p += 1 // past the (2, ENTITIES) pair
    // collect the groups of one entity: from its (0, NAME) up to the next 0
    def groupsOf(start: Int): (Map[Int, List[String]], Int) = {
      val m = mutable.HashMap[Int, List[String]]().withDefaultValue(Nil)
      var j = start + 1
      while (j < pairs.length && !isEntityStart(j)) {
        m(pairs(j)._1) = m(pairs(j)._1) :+ pairs(j)._2
        j += 1
      }
      (m.toMap.withDefault(_ => Nil), j)
    }
    def d(m: Map[Int, List[String]], code: Int, dflt: Double = 0.0): Double =
      m(code).headOption.map(_.toDouble).getOrElse(dflt)
    def layerOf(m: Map[Int, List[String]]): String =
      m(8).headOption.getOrElse("0")
    def arcCoords(cx: Double, cy: Double, r: Double, a0Deg: Double,
        a1Deg: Double): Array[Coordinate] = {
      val a0 = math.toRadians(a0Deg)
      // DXF arcs run counterclockwise from 50 to 51
      val a1r = math.toRadians(a1Deg)
      val sweep = if (a1r >= a0) a1r - a0 else a1r - a0 + 2 * math.Pi
      val n = math.max(2, math.ceil(arcSegments * sweep / (2 * math.Pi)).toInt)
      Array.tabulate(n + 1) { k =>
        val a = a0 + sweep * k / n
        new Coordinate(cx + r * math.cos(a), cy + r * math.sin(a))
      }
    }
    while (p < pairs.length) {
      if (isEntityStart(p)) {
        val name = pairs(p)._2
        name match {
          case "ENDSEC" | "EOF" => p = pairs.length
          case "POINT" =>
            val (m, next) = groupsOf(p)
            // group 30 is mandatory on POINT: an explicit z (even 0.0) keeps
            // the Z dimension; only an absent group reads as 2D
            val z = d(m, 30, Double.NaN)
            val c = if (java.lang.Double.isNaN(z))
              new Coordinate(d(m, 10), d(m, 20))
            else new Coordinate(d(m, 10), d(m, 20), z)
            out += Entity(factory.createPoint(c), layerOf(m))
            p = next
          case "LINE" =>
            val (m, next) = groupsOf(p)
            out += Entity(factory.createLineString(Array(
              new Coordinate(d(m, 10), d(m, 20)),
              new Coordinate(d(m, 11), d(m, 21)))), layerOf(m))
            p = next
          case "LWPOLYLINE" =>
            val (m, next) = groupsOf(p)
            val xs = m(10).map(_.toDouble)
            val ys = m(20).map(_.toDouble)
            val closed = m(70).headOption.exists(f => (f.toInt & 1) == 1)
            var cs = xs.zip(ys).map { case (x, y) => new Coordinate(x, y) }.toArray
            if (closed && cs.nonEmpty && !cs.head.equals2D(cs.last))
              cs = cs :+ new Coordinate(cs.head)
            // CAD exports contain degenerate one-vertex polylines; JTS
            // rejects 1-coordinate lines — degrade to zero-length
            if (cs.length == 1) cs = cs :+ new Coordinate(cs.head)
            out += Entity(factory.createLineString(cs), layerOf(m))
            p = next
          case "POLYLINE" =>
            val (m, afterHeader) = groupsOf(p)
            val closed = m(70).headOption.exists(f => (f.toInt & 1) == 1)
            val layer = layerOf(m)
            val cs = mutable.ArrayBuffer[Coordinate]()
            var j = afterHeader
            var done = false
            while (j < pairs.length && !done) {
              if (isEntityStart(j)) pairs(j)._2 match {
                case "VERTEX" =>
                  val (vm, vNext) = groupsOf(j)
                  cs += new Coordinate(d(vm, 10), d(vm, 20))
                  j = vNext
                case "SEQEND" =>
                  val (_, sNext) = groupsOf(j)
                  j = sNext; done = true
                case _ => done = true
              } else j += 1
            }
            var arr = cs.toArray
            if (closed && arr.nonEmpty && !arr.head.equals2D(arr.last))
              arr = arr :+ new Coordinate(arr.head)
            if (arr.length == 1) arr = arr :+ new Coordinate(arr.head)
            out += Entity(factory.createLineString(arr), layer)
            p = j
          case "CIRCLE" =>
            val (m, next) = groupsOf(p)
            val cs = arcCoords(d(m, 10), d(m, 20), d(m, 40), 0, 360)
            cs(cs.length - 1) = new Coordinate(cs(0)) // exact closure
            out += Entity(factory.createPolygon(cs), layerOf(m))
            p = next
          case "ARC" =>
            val (m, next) = groupsOf(p)
            out += Entity(factory.createLineString(
              arcCoords(d(m, 10), d(m, 20), d(m, 40), d(m, 50), d(m, 51))),
              layerOf(m))
            p = next
          case _ =>
            val (_, next) = groupsOf(p)
            p = next
        }
      } else p += 1
    }
    out.toSeq
  }

  // ------------------------------------------------------------------ write

  private def num(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (s.endsWith(".0")) s.dropRight(2) else s
  }

  private def pair(b: StringBuilder, code: Int, v: String): Unit = {
    b.append(code).append('\n').append(v).append('\n')
  }

  private def lwpolyline(b: StringBuilder, cs: Array[Coordinate],
      layer: String): Unit = {
    val closed = cs.length >= 2 && cs.head.equals2D(cs.last)
    val pts = if (closed) cs.dropRight(1) else cs
    pair(b, 0, "LWPOLYLINE"); pair(b, 8, layer)
    pair(b, 90, pts.length.toString)
    pair(b, 70, if (closed) "1" else "0")
    pts.foreach { c => pair(b, 10, num(c.x)); pair(b, 20, num(c.y)) }
  }

  private def entityBlocks(g: Geometry, layer: String, b: StringBuilder): Unit =
    g match {
      case p: org.locationtech.jts.geom.Point if p.isEmpty =>
        () // POINT EMPTY has no coordinates to serialize — skip
      case p: org.locationtech.jts.geom.Point =>
        pair(b, 0, "POINT"); pair(b, 8, layer)
        pair(b, 10, num(p.getX)); pair(b, 20, num(p.getY))
        val z = p.getCoordinate.getZ
        if (!java.lang.Double.isNaN(z)) pair(b, 30, num(z))
      case l: org.locationtech.jts.geom.LineString =>
        lwpolyline(b, l.getCoordinates, layer)
      case p: org.locationtech.jts.geom.Polygon =>
        lwpolyline(b, p.getExteriorRing.getCoordinates, layer)
        (0 until p.getNumInteriorRing).foreach(i =>
          lwpolyline(b, p.getInteriorRingN(i).getCoordinates, layer))
      case m => // Multi* / collections: one entity per part
        (0 until m.getNumGeometries).foreach(i =>
          entityBlocks(m.getGeometryN(i), layer, b))
    }

  /** Serialize one minimal DXF document (ENTITIES section only — accepted
    * by OGR and CAD importers). `rows`: (geometry, layer). */
  def write(rows: Iterator[(Geometry, String)]): String = {
    val b = new StringBuilder
    pair(b, 0, "SECTION"); pair(b, 2, "ENTITIES")
    rows.foreach { case (g, layer) =>
      if (g != null) entityBlocks(g, if (layer == null) "0" else layer, b)
    }
    pair(b, 0, "ENDSEC"); pair(b, 0, "EOF")
    b.toString
  }
}
