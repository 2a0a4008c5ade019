package graft.io

import org.locationtech.jts.geom.Geometry

import scala.collection.mutable.ArrayBuffer

/** GeoPackage (OGC 12-128r19, geopackage.org) feature-table support on
  * top of the [[Sqlite]] codec: the gpkg geometry BLOB encoding, the
  * required metadata tables, and CREATE TABLE column parsing — mirroring
  * the reference's OGR-backed `.gpkg` path
  * (`/root/reference/polars_st/input.py:30-153`, `geodataframe.py:462`).
  */
object GeoPackage {

  /** Parsed column of a feature table. `sqlType` is the DECLARED type
    * uppercased; `ipk` marks INTEGER PRIMARY KEY (value lives in the
    * rowid, record stores NULL). */
  case class GpkgColumn(name: String, sqlType: String, ipk: Boolean)

  case class Layer(table: String, geometryColumn: String, srid: Int,
      geometryType: String, columns: Seq[GpkgColumn])

  // ------------------------------------------------- gpkg geometry blobs

  /** GeoPackageBinary → JTS geometry with SRID applied; null for the
    * `empty` flag bit. Returns the parsed envelope too (when present) so
    * bbox reads can skip WKB parsing. */
  def readGeometryBlob(b: Array[Byte]): (Geometry, Array[Double]) = {
    require(b.length >= 8 && b(0) == 'G' && b(1) == 'P',
      "gpkg: bad geometry blob magic")
    val flags = b(3) & 0xff
    require((flags & 0x20) == 0, "gpkg: ExtendedGeoPackageBinary not supported")
    val little = (flags & 0x01) == 1
    val envInd = (flags >> 1) & 0x07
    require(envInd <= 4, s"gpkg: invalid envelope indicator $envInd")
    val srid = readInt32(b, 4, little)
    // envelope sizes: 0→0, 1→4 (xy), 2→6 (xyz), 3→6 (xym), 4→8 (xyzm)
    val nEnv = envInd match { case 0 => 0; case 1 => 4; case 2 | 3 => 6; case 4 => 8 }
    val env = new Array[Double](nEnv)
    var i = 0
    while (i < nEnv) {
      env(i) = java.lang.Double.longBitsToDouble(readInt64(b, 8 + 8 * i, little))
      i += 1
    }
    val wkbOff = 8 + 8 * nEnv
    if ((flags & 0x10) != 0) { // empty-geometry flag
      // GDAL still writes the TYPED WKB body (e.g. POINT EMPTY) with the
      // flag set — parse it when present so the geometry type survives;
      // only a truly absent body degrades to GEOMETRYCOLLECTION EMPTY
      val g =
        if (b.length > wkbOff)
          graft.serde.EWKB.read(
            java.util.Arrays.copyOfRange(b, wkbOff, b.length)).copy()
        else graft.serde.EWKB.geometryFactory.createGeometryCollection()
      g.setSRID(srid)
      return (g, env)
    }
    val wkb = java.util.Arrays.copyOfRange(b, wkbOff, b.length)
    val g = graft.serde.EWKB.read(wkb).copy() // cache-shared → copy before setSRID
    g.setSRID(srid)
    (g, env)
  }

  /** JTS geometry → GeoPackageBinary (version 0, little-endian, XY
    * envelope for non-empty geometries, ISO WKB body). */
  def writeGeometryBlob(g: Geometry, srid: Int): Array[Byte] = {
    val empty = g == null || g.isEmpty
    val out = ArrayBuffer.empty[Byte]
    out += 'G'.toByte; out += 'P'.toByte; out += 0.toByte
    val flags = (if (empty) 0x10 else 0x02) | 0x01 // [envelope] + little-endian
    out += flags.toByte
    putInt32(out, srid, little = true)
    if (!empty) {
      val e = g.getEnvelopeInternal
      Seq(e.getMinX, e.getMaxX, e.getMinY, e.getMaxY).foreach(d =>
        putInt64(out, java.lang.Double.doubleToLongBits(d), little = true))
    }
    // keep the TYPED body for empty geometries too (GDAL convention):
    // POINT EMPTY must read back as a point, not a collection
    val body = if (g == null) graft.serde.EWKB.geometryFactory.createGeometryCollection()
      else g
    // plain WKB (no SRID — it travels in the blob header). XY bytes are
    // identical under ISO and extended conventions; Z uses JTS's
    // extended flag, which GDAL/GEOS readers accept.
    val dims = if (graft.serde.EWKB.hasZ(body)) 3 else 2
    out ++= new org.locationtech.jts.io.WKBWriter(dims,
      org.locationtech.jts.io.ByteOrderValues.LITTLE_ENDIAN, false).write(body)
    out.toArray
  }

  private def readInt32(b: Array[Byte], off: Int, little: Boolean): Int = {
    if (little)
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    else
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  }
  private def readInt64(b: Array[Byte], off: Int, little: Boolean): Long =
    if (little)
      (readInt32(b, off, little) & 0xffffffffL) |
        ((readInt32(b, off + 4, little) & 0xffffffffL) << 32)
    else
      ((readInt32(b, off, little) & 0xffffffffL) << 32) |
        (readInt32(b, off + 4, little) & 0xffffffffL)
  private def putInt32(out: ArrayBuffer[Byte], v: Int, little: Boolean): Unit = {
    val s = if (little) Seq(0, 8, 16, 24) else Seq(24, 16, 8, 0)
    s.foreach(sh => out += ((v >> sh) & 0xff).toByte)
  }
  private def putInt64(out: ArrayBuffer[Byte], v: Long, little: Boolean): Unit = {
    val s = if (little) 0 until 64 by 8 else 56 to 0 by -8
    s.foreach(sh => out += ((v >> sh) & 0xff).toByte)
  }

  // ------------------------------------------------- CREATE TABLE parsing

  /** Column names + declared types from a CREATE TABLE statement. Handles
    * quoted identifiers ("x", [x], `x`, 'x'), skips table-level
    * constraints, flags INTEGER PRIMARY KEY. */
  def parseCreateTable(sql: String): Seq[GpkgColumn] = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    require(open >= 0 && close > open, s"gpkg: cannot parse CREATE TABLE: $sql")
    val body = sql.substring(open + 1, close)
    // split on top-level commas (parens from e.g. CHECK(...), NUMERIC(10,2))
    val parts = ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var inQuote: Char = 0
    var i = 0
    while (i < body.length) {
      val c = body(i)
      if (inQuote != 0) {
        if (c == inQuote) inQuote = 0
      } else c match {
        case '\'' | '"' | '`' => inQuote = c
        case '[' => inQuote = ']'
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => parts += body.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += body.substring(start)
    val constraintHead =
      Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    parts.map(_.trim).filter(_.nonEmpty).flatMap { colDef =>
      val (name, rest) =
        if ("\"'`[".contains(colDef.head.toString)) {
          val closer = if (colDef.head == '[') ']' else colDef.head
          val end = colDef.indexOf(closer, 1)
          (colDef.substring(1, end), colDef.substring(end + 1).trim)
        } else {
          val end = colDef.indexWhere(_.isWhitespace) match {
            case -1 => colDef.length; case e => e
          }
          (colDef.substring(0, end), colDef.substring(end).trim)
        }
      if (constraintHead.contains(name.toUpperCase)) None
      else {
        val typeTok = rest.split("\\s+").takeWhile(t =>
          !Set("PRIMARY", "NOT", "NULL", "UNIQUE", "DEFAULT", "CHECK",
            "REFERENCES", "AUTOINCREMENT", "COLLATE", "GENERATED")
            .contains(t.toUpperCase)).mkString(" ")
        val up = rest.toUpperCase
        val ipk = up.contains("INTEGER") && up.contains("PRIMARY KEY")
        Some(GpkgColumn(name, typeTok.toUpperCase, ipk))
      }
    }.toSeq
  }

  // ------------------------------------------------------ layer discovery

  /** Feature layers declared in `gpkg_contents`/`gpkg_geometry_columns`,
    * with each table's parsed schema. */
  def layers(db: Sqlite.SqliteDb): Seq[Layer] = {
    val master = db.master
    def rootOf(table: String): Option[Int] =
      master.find(m => m.typ == "table" && m.name == table).map(_.rootPage)
    def sqlOf(table: String): Option[String] =
      master.find(m => m.typ == "table" && m.name == table).map(_.sql)
    val geomColsRoot = rootOf("gpkg_geometry_columns").getOrElse(
      throw new java.io.IOException("gpkg: no gpkg_geometry_columns table"))
    val geomColsSchema = parseCreateTable(sqlOf("gpkg_geometry_columns").get)
    def ord(schema: Seq[GpkgColumn], name: String): Int = {
      val i = schema.indexWhere(_.name.equalsIgnoreCase(name))
      require(i >= 0, s"gpkg: column $name missing"); i
    }
    val tOrd = ord(geomColsSchema, "table_name")
    val cOrd = ord(geomColsSchema, "column_name")
    val gOrd = ord(geomColsSchema, "geometry_type_name")
    val sOrd = ord(geomColsSchema, "srs_id")
    db.tableRows(geomColsRoot).map { case (_, r) =>
      val table = r(tOrd).asInstanceOf[String]
      val sql = sqlOf(table).getOrElse(
        throw new java.io.IOException(s"gpkg: feature table $table missing"))
      Layer(table,
        r(cOrd).asInstanceOf[String],
        r(sOrd) match { case null => 0; case v: Long => v.toInt },
        r(gOrd) match { case null => "GEOMETRY"; case s: String => s },
        parseCreateTable(sql))
    }.toSeq
  }

  /** The `definition` WKT for `srsId` from `gpkg_spatial_ref_sys`, if the
    * table and row exist — lets a non-EPSG srs_id (ESRI-authored packages)
    * register its CRS for reprojection. */
  def srsDefinition(db: Sqlite.SqliteDb, srsId: Int): Option[String] = {
    val master = db.master
    val entry = master.find(m => m.typ == "table" && m.name == "gpkg_spatial_ref_sys")
    entry.flatMap { m =>
      val schema = parseCreateTable(m.sql)
      val idOrd = schema.indexWhere(_.name.equalsIgnoreCase("srs_id"))
      val defOrd = schema.indexWhere(_.name.equalsIgnoreCase("definition"))
      if (idOrd < 0 || defOrd < 0) None
      else db.tableRows(m.rootPage).collectFirst {
        case (_, r) if (r(idOrd) match {
          case v: Long => v.toInt == srsId
          case _ => false
        }) => r(defOrd) match { case s: String => s; case _ => null }
      }.filter(s => s != null && s.nonEmpty && !s.equalsIgnoreCase("undefined"))
    }
  }
}
