package graft.io

import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, Polygon}
import scala.collection.mutable

/** Minimal MapInfo Interchange Format (MIF/MID) codec — the plain-text
  * pair the OGR "MapInfo File" driver reads for the reference's
  * `read_file` (`/root/reference/polars_st/input.py:30-153`). Public
  * format: a `.mif` header (Version/Delimiter/CoordSys/Columns) plus
  * geometry blocks, and a `.mid` delimiter-separated attribute file with
  * one row per geometry.
  *
  * Supported: Point, Line, Pline (incl. `Multiple`), Region (rings
  * assigned shell/hole by containment, MapInfo semantics), Multipoint,
  * None; Columns types Integer/Smallint/Float/Decimal/Char/Logical/Date;
  * quoted MID fields; the ubiquitous `CoordSys Earth Projection 1, 104`
  * (lon/lat WGS84 → SRID 4326). Styling clauses (Pen/Brush/Symbol/
  * Smooth/Center) are skipped. Text objects and non-earth/projected
  * CoordSys declarations yield SRID 0.
  */
private[graft] object MapInfo {

  final case class MifColumn(name: String, typ: String)
  final case class MifFile(columns: Seq[MifColumn], delimiter: Char, srid: Int,
      geoms: Seq[Geometry], rows: Seq[Array[String]])

  private def factory = graft.serde.EWKB.geometryFactory

  def sparkType(c: MifColumn): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val t = c.typ.toLowerCase
    if (t.startsWith("integer")) LongType
    else if (t.startsWith("smallint")) IntegerType
    else if (t.startsWith("float") || t.startsWith("decimal")) DoubleType
    else if (t.startsWith("logical")) BooleanType
    else StringType // char, date, time, ...
  }

  def parseValue(c: MifColumn, s: String): Any = {
    if (s == null || s.isEmpty) return null
    val t = c.typ.toLowerCase
    try {
      if (t.startsWith("integer")) s.trim.toLong
      else if (t.startsWith("smallint")) s.trim.toInt
      else if (t.startsWith("float") || t.startsWith("decimal")) s.trim.toDouble
      else if (t.startsWith("logical")) s.trim.equalsIgnoreCase("T") ||
        s.trim.equalsIgnoreCase("true")
      else s
    } catch { case _: NumberFormatException => null }
  }

  /** One MID line → fields (delimiter-separated, double-quote quoting). */
  private[io] def splitMid(line: String, delim: Char): Array[String] = {
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQuote) {
        if (ch == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQuote = false
        } else sb.append(ch)
      } else if (ch == '"') inQuote = true
      else if (ch == delim) { out += sb.toString; sb.clear() }
      else sb.append(ch)
      i += 1
    }
    out += sb.toString
    out.toArray
  }

  /** Assign region rings shell/hole by containment (MapInfo semantics:
    * a ring inside another ring is that ring's hole). */
  private def regionGeometry(rings: Seq[LinearRing]): Geometry = {
    if (rings.isEmpty) return factory.createPolygon()
    val polys = rings.map(factory.createPolygon)
    val isHole = Array.fill(rings.length)(-1)
    for (i <- rings.indices) {
      var best = -1
      var bestArea = Double.MaxValue
      for (j <- rings.indices if j != i) {
        if (polys(j).contains(polys(i)) && polys(j).getArea < bestArea &&
            polys(j).getArea > polys(i).getArea) {
          best = j; bestArea = polys(j).getArea
        }
      }
      isHole(i) = best
    }
    // a hole of a hole is a shell again (odd nesting depth = hole)
    def depth(i: Int): Int = if (isHole(i) < 0) 0 else 1 + depth(isHole(i))
    val shells = rings.indices.filter(depth(_) % 2 == 0)
    val out = shells.map { si =>
      val holes = rings.indices
        .filter(hi => depth(hi) % 2 == 1 && isHole(hi) == si)
        .map(rings(_)).toArray
      factory.createPolygon(rings(si), holes)
    }
    if (out.length == 1) out.head else factory.createMultiPolygon(out.toArray)
  }

  def readMif(mif: String, mid: Option[String]): MifFile = {
    val lines = mif.split("\r?\n")
    var delim = '\t' // MIF default delimiter is tab
    var srid = 0
    val columns = mutable.ArrayBuffer[MifColumn]()
    var i = 0
    // ---- header
    var inData = false
    while (i < lines.length && !inData) {
      val l = lines(i).trim
      val lower = l.toLowerCase
      if (lower.startsWith("delimiter")) {
        val q = l.indexOf('"')
        if (q >= 0 && q + 1 < l.length) delim = l.charAt(q + 1)
      } else if (lower.startsWith("coordsys")) {
        // the ubiquitous lon/lat WGS84 declaration; anything else → 0
        val c = lower.replaceAll("\\s+", " ")
        if (c.contains("earth projection 1, 104") ||
            c.contains("earth projection 1,104")) srid = 4326
      } else if (lower.startsWith("columns")) {
        val n = l.split("\\s+").last.toInt
        (1 to n).foreach { j =>
          val parts = lines(i + j).trim.split("\\s+", 2)
          columns += MifColumn(parts(0), if (parts.length > 1) parts(1) else "char")
        }
        i += n
      } else if (lower == "data") inData = true
      i += 1
    }
    // ---- geometry blocks
    val geoms = mutable.ArrayBuffer[Geometry]()
    def coordLine(s: String): Coordinate = {
      val p = s.trim.split("\\s+")
      new Coordinate(p(0).toDouble, p(1).toDouble)
    }
    def nextNonEmpty(): String = {
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) lines(i).trim else null
    }
    val styleWords = Set("pen", "brush", "symbol", "smooth", "center", "font")
    while (i < lines.length) {
      val l = nextNonEmpty()
      if (l == null) { i = lines.length }
      else {
        val w = l.split("\\s+")
        val kw = w(0).toLowerCase
        kw match {
          case "point" =>
            geoms += factory.createPoint(new Coordinate(w(1).toDouble, w(2).toDouble))
            i += 1
          case "line" =>
            geoms += factory.createLineString(Array(
              new Coordinate(w(1).toDouble, w(2).toDouble),
              new Coordinate(w(3).toDouble, w(4).toDouble)))
            i += 1
          case "pline" =>
            val isMultiple = w.length >= 3 && w(1).equalsIgnoreCase("multiple")
            val sections = if (isMultiple) w(2).toInt else 1
            // single-section count may be on the same line or the next —
            // but "Pline Multiple 1" is still the multiple form, whose
            // per-section counts always live on their own lines
            var firstCount = -1
            if (!isMultiple && w.length >= 2) firstCount = w(1).toInt
            i += 1
            val parts = (0 until sections).map { s =>
              val n =
                if (s == 0 && firstCount >= 0) firstCount
                else { val c = nextNonEmpty().toInt; i += 1; c }
              val cs = Array.fill(n) { val c = coordLine(lines(i)); i += 1; c }
              factory.createLineString(cs)
            }
            // the Multiple form stays a MultiLineString even with one
            // section (OGR's mapping); a bare Pline is a LineString
            geoms += (if (!isMultiple && parts.length == 1) parts.head
              else factory.createMultiLineString(parts.toArray))
          case "region" =>
            val nRings = w(1).toInt
            i += 1
            val rings = (0 until nRings).map { _ =>
              val n = nextNonEmpty().toInt; i += 1
              val cs = Array.fill(n) { val c = coordLine(lines(i)); i += 1; c }
              val closed = if (cs.head.equals2D(cs.last)) cs
                else cs :+ new Coordinate(cs.head)
              factory.createLinearRing(closed)
            }
            geoms += regionGeometry(rings)
          case "multipoint" =>
            val n = w(1).toInt
            i += 1
            val cs = Array.fill(n) { val c = coordLine(lines(i)); i += 1; c }
            geoms += factory.createMultiPointFromCoords(cs)
          case "none" =>
            geoms += factory.createGeometryCollection()
            i += 1
          case s if styleWords.contains(s) => i += 1 // styling clause
          case _ => i += 1 // unknown clause — skip line
        }
      }
    }
    if (srid != 0) geoms.foreach(_.setSRID(srid))
    val rows: Seq[Array[String]] = mid match {
      case Some(text) =>
        // drop only TRAILING blank lines: an interior empty line is a
        // legal one-column row with an empty unquoted value — filtering
        // it would shift every later row against the geometry list
        val all = text.split("\r?\n").toSeq
        all.take(all.lastIndexWhere(_.nonEmpty) + 1).map(splitMid(_, delim))
      case None => Seq.empty
    }
    MifFile(columns.toSeq, delim, srid, geoms.toSeq, rows)
  }

  // ------------------------------------------------------------------ write

  private def num(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.endsWith(".0")) s.dropRight(2) else s
  }

  private def geometryBlock(g: Geometry, b: StringBuilder): Unit = g match {
    case p if p.isEmpty =>
      b.append("None\n") // empty geometry: the MIF geometry-less row
    case p: org.locationtech.jts.geom.Point =>
      b.append(s"Point ${num(p.getX)} ${num(p.getY)}\n")
    case l: org.locationtech.jts.geom.LineString =>
      b.append(s"Pline ${l.getNumPoints}\n")
      l.getCoordinates.foreach(c => b.append(s"${num(c.x)} ${num(c.y)}\n"))
    case m: org.locationtech.jts.geom.MultiLineString =>
      b.append(s"Pline Multiple ${m.getNumGeometries}\n")
      (0 until m.getNumGeometries).foreach { i =>
        val l = m.getGeometryN(i)
        b.append(s"${l.getNumPoints}\n")
        l.getCoordinates.foreach(c => b.append(s"${num(c.x)} ${num(c.y)}\n"))
      }
    case p: Polygon =>
      val rings = (p.getExteriorRing +:
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN)).toSeq
      b.append(s"Region ${rings.length}\n")
      rings.foreach { r =>
        b.append(s"${r.getNumPoints}\n")
        r.getCoordinates.foreach(c => b.append(s"${num(c.x)} ${num(c.y)}\n"))
      }
    case m: org.locationtech.jts.geom.MultiPolygon =>
      val rings = (0 until m.getNumGeometries).flatMap { i =>
        val p = m.getGeometryN(i).asInstanceOf[Polygon]
        p.getExteriorRing +: (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
      }
      b.append(s"Region ${rings.length}\n")
      rings.foreach { r =>
        b.append(s"${r.getNumPoints}\n")
        r.getCoordinates.foreach(c => b.append(s"${num(c.x)} ${num(c.y)}\n"))
      }
    case m: org.locationtech.jts.geom.MultiPoint =>
      b.append(s"Multipoint ${m.getNumGeometries}\n")
      m.getCoordinates.foreach(c => b.append(s"${num(c.x)} ${num(c.y)}\n"))
    case _ => b.append("None\n")
  }

  /** Serialize (mif, mid). `columns` must match each row's field order;
    * Char fields are quoted in the MID.
    *
    * Null coercion (documented divergence): MID is a positional CSV with no
    * null literal, so null fields serialize as the empty value and read back
    * as "" (Char) / null (numeric via parse failure). Null vs "" is not
    * distinguishable across a MIF/MID round trip — inherent to the format. */
  def write(columns: Seq[MifColumn], rows: Iterator[(Geometry, Array[String])],
      srid: Int): (String, String) = {
    val mif = new StringBuilder
    mif.append("Version 300\nCharset \"Neutral\"\nDelimiter \",\"\n")
    if (srid == 4326) mif.append("CoordSys Earth Projection 1, 104\n")
    mif.append(s"Columns ${columns.length}\n")
    columns.foreach(c => mif.append(s"  ${c.name} ${c.typ}\n"))
    mif.append("Data\n\n")
    val mid = new StringBuilder
    rows.foreach { case (g, fields) =>
      geometryBlock(if (g == null) factory.createGeometryCollection() else g, mif)
      mid.append(columns.indices.map { ci =>
        val v = if (ci < fields.length && fields(ci) != null) fields(ci) else ""
        if (sparkType(columns(ci)) == org.apache.spark.sql.types.StringType)
          // MID has no escape for newlines inside a field; a raw one
          // would split this row across two lines and shift every later
          // row against the geometry list — coerce to spaces (documented
          // lossy mapping, like the other interchange coercions)
          "\"" + v.replace("\r", " ").replace("\n", " ")
            .replace("\"", "\"\"") + "\""
        else v
      }.mkString(",")).append('\n')
    }
    (mif.toString, mid.toString)
  }
}
