package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.serde.EWKB
import org.locationtech.jts.algorithm.{Orientation, PointLocation}
import org.locationtech.jts.geom._

/** ESRI Shapefile (.shp / .shx / .dbf / .prj) encode/decode in pure JVM —
  * the most common geo interchange format the reference reads through
  * pyogrio/OGR (`/root/reference/polars_st/input.py:30-153`). Implemented
  * from the public spec ("ESRI Shapefile Technical Description", July 1998)
  * plus the dBase III .dbf layout; no GDAL.
  *
  * Supported shapes: Null, Point(Z), MultiPoint(Z), PolyLine(Z),
  * Polygon(Z) — M values (shape types 21-28 and trailing M blocks on Z
  * shapes) are parsed-over and DROPPED (JTS measures are not plumbed
  * through this codec; same class of caveat as the reference's curve
  * linearization note, `input.py:49-50`). Polygon rings follow the spec
  * convention (outer CW, holes CCW); holes are assigned to the smallest
  * enclosing shell on read.
  *
  * Attributes: dBase III field types C (string, UTF-8 bytes), N
  * (integer when decimals==0, else double), F (double), L (boolean),
  * D (yyyymmdd string). DBF has no NULL — blank numerics read as null,
  * blank strings as "".
  *
  * CRS: a `.prj` sidecar holding WKT; the writer emits it from the
  * geometry SRID via the embedded EPSG db, the reader extracts the EPSG
  * code from the WKT's trailing AUTHORITY clause (the same crs→srid
  * recovery the reference does in `utils/srid.py`).
  *
  * The format itself caps each file at 2 GB (31-bit offsets in 16-bit
  * words) — writers buffer the record body in memory and back-patch the
  * header, which the cap makes safe; shapefile is an EXPORT/interchange
  * format here, not a cluster-scale sink (that's GeoParquet).
  */
object Shapefile {

  // Shape type codes (spec p.4).
  val StNull = 0
  val StPoint = 1; val StPolyLine = 3; val StPolygon = 5; val StMultiPoint = 8
  val StPointZ = 11; val StPolyLineZ = 13; val StPolygonZ = 15; val StMultiPointZ = 18
  val StPointM = 21; val StPolyLineM = 23; val StPolygonM = 25; val StMultiPointM = 28

  final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

  /** Sentinel emitted by [[readShpGeometries]] for records pruned by the
    * bbox filter — the geometry is never deserialized. */
  case object Skipped

  private def factory = EWKB.geometryFactory

  // =========================================================== .shp reading

  /** Decode the .shp byte stream. Returns the header shape type and one
    * entry per record: a `Geometry` (null for Null shapes) or [[Skipped]]
    * when `bbox` is set and the record's stored bounding box (read before
    * any point data) does not intersect it — the bbox pushdown analog of
    * `read_file(bbox=...)`. */
  def readShpGeometries(data: Array[Byte],
      bbox: Option[(Double, Double, Double, Double)] = None,
      skip: Long = 0L): (Int, Iterator[AnyRef]) = {
    require(data.length >= 100, "shapefile: truncated header")
    // NB: absolute gets on a FULL wrap — wrap(array, offset, len) does not
    // shift absolute indices, so offset wraps + getInt(0) silently read the
    // array start.
    val whole = ByteBuffer.wrap(data)
    require(whole.getInt(0) == 9994, "shapefile: bad magic (file code != 9994)")
    val shapeType = whole.order(ByteOrder.LITTLE_ENDIAN).getInt(32)
    whole.order(ByteOrder.BIG_ENDIAN)
    val fileLenBytes = math.min(whole.getInt(24) * 2L, data.length).toInt
    // scan-level skip: hop record headers (8 bytes each) without touching
    // any point data — skipped records cost one length read + a jump
    var start = 100
    var toSkip = skip
    while (toSkip > 0 && start + 8 <= fileLenBytes) {
      start += 8 + whole.getInt(start + 4) * 2
      toSkip -= 1
    }
    val it = new Iterator[AnyRef] {
      private var off = start
      def hasNext: Boolean = off + 8 <= fileLenBytes
      def next(): AnyRef = {
        val contentWords = whole.getInt(off + 4)
        val content = ByteBuffer.wrap(data, off + 8, contentWords * 2)
          .order(ByteOrder.LITTLE_ENDIAN)
        off += 8 + contentWords * 2
        readRecord(content, bbox)
      }
    }
    (shapeType, it)
  }

  private def readRecord(b: ByteBuffer,
      bbox: Option[(Double, Double, Double, Double)]): AnyRef = {
    val st = b.getInt
    if (st == StNull) return null
    val base = st % 10
    val hasZ = st >= StPointZ && st < StPointM
    val hasM = st >= StPointM
    base match {
      case StPoint =>
        val x = b.getDouble; val y = b.getDouble
        bbox match {
          case Some((x0, y0, x1, y1)) if x < x0 || x > x1 || y < y0 || y > y1 => Skipped
          case _ =>
            val c = if (hasZ) new Coordinate(x, y, b.getDouble) else new Coordinate(x, y)
            factory.createPoint(c)
        }
      case StMultiPoint =>
        if (boxMisses(b, bbox)) return Skipped
        val n = b.getInt
        val coords = Array.fill(n)(new Coordinate(b.getDouble, b.getDouble))
        if (hasZ) { skipMinMax(b); var i = 0; while (i < n) { coords(i).setZ(b.getDouble); i += 1 } }
        factory.createMultiPointFromCoords(coords)
      case StPolyLine | StPolygon =>
        if (boxMisses(b, bbox)) return Skipped
        val numParts = b.getInt; val numPoints = b.getInt
        val parts = Array.fill(numParts)(b.getInt)
        val coords = Array.fill(numPoints)(new Coordinate(b.getDouble, b.getDouble))
        if (hasZ) {
          skipMinMax(b)
          var i = 0; while (i < numPoints) { coords(i).setZ(b.getDouble); i += 1 }
        }
        // trailing M block (also optionally present on Z shapes) is dropped
        val rings = (0 until numParts).map { p =>
          val from = parts(p)
          val until = if (p + 1 < numParts) parts(p + 1) else numPoints
          java.util.Arrays.copyOfRange(coords.asInstanceOf[Array[AnyRef]], from, until)
            .asInstanceOf[Array[Coordinate]]
        }
        if (base == StPolyLine) {
          val lines = rings.map(factory.createLineString)
          if (lines.length == 1) lines.head else factory.createMultiLineString(lines.toArray)
        } else assemblePolygons(rings)
      case other =>
        throw new IllegalArgumentException(s"shapefile: unsupported shape type $other")
    }
  }

  /** Reads the record's 4-double box; true when it misses `bbox` (point
    * data is then never touched). */
  private def boxMisses(b: ByteBuffer,
      bbox: Option[(Double, Double, Double, Double)]): Boolean = {
    val xmin = b.getDouble; val ymin = b.getDouble
    val xmax = b.getDouble; val ymax = b.getDouble
    bbox.exists { case (x0, y0, x1, y1) =>
      xmin > x1 || xmax < x0 || ymin > y1 || ymax < y0
    }
  }

  private def skipMinMax(b: ByteBuffer): Unit = { b.getDouble; b.getDouble }

  /** Spec convention: outer rings CW, holes CCW; each hole belongs to the
    * smallest-area shell that contains it. Rings are closed defensively
    * (some writers drop the closing vertex). */
  private def assemblePolygons(ringCoords: Seq[Array[Coordinate]]): Geometry = {
    def closed(cs: Array[Coordinate]): Array[Coordinate] =
      if (cs.length >= 3 && cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
    val rings = ringCoords.filter(_.length >= 3).map(closed)
      .filter(_.length >= 4) // a closed 3-point ring (2 distinct vertices) is degenerate
      .map(factory.createLinearRing)
    val (holes, shells) = rings.partition(r => Orientation.isCCW(r.getCoordinateSequence))
    val effShells = if (shells.isEmpty) rings else shells
    if (effShells.isEmpty) return factory.createPolygon()
    val polys = effShells.map(s => (s, scala.collection.mutable.ArrayBuffer.empty[LinearRing]))
    if (shells.nonEmpty) holes.foreach { h =>
      val p = h.getCoordinateN(0)
      val candidates = polys.filter { case (s, _) =>
        s.getEnvelopeInternal.contains(h.getEnvelopeInternal) &&
          PointLocation.isInRing(p, s.getCoordinates)
      }
      val target =
        if (candidates.nonEmpty) Some(candidates.minBy(c => factory.createPolygon(c._1).getArea))
        else polys.headOption // orphan hole: keep the data, attach to first shell
      target.foreach(_._2 += h)
    }
    val built = polys.map { case (s, hs) => factory.createPolygon(s, hs.toArray) }
    if (built.length == 1) built.head else factory.createMultiPolygon(built.toArray)
  }

  // =========================================================== .dbf reading

  /** Decode a dBase III .dbf: (fields, record iterator). Deleted records
    * (flag 0x2A) are skipped — callers zipping with .shp records should
    * read with [[readFeatures]], which keeps the two streams aligned. */
  def readDbf(data: Array[Byte],
      skip: Long = 0L): (Seq[DbfField], Iterator[Array[Any]]) = {
    val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = b.getInt(4)
    val headerSize = b.getShort(8) & 0xffff
    val recordSize = b.getShort(10) & 0xffff
    val fields = scala.collection.mutable.ArrayBuffer.empty[DbfField]
    var off = 32
    while (off + 32 <= headerSize && data(off) != 0x0d) {
      val nameEnd0 = (off until off + 11).indexWhere(i => data(i) == 0)
      val nameLen = if (nameEnd0 < 0) 11 else nameEnd0
      val name = new String(data, off, nameLen, StandardCharsets.US_ASCII)
      fields += DbfField(name, data(off + 11).toChar, data(off + 16) & 0xff, data(off + 17) & 0xff)
      off += 32
    }
    val fs = fields.toSeq
    // dbf records are fixed-size: skipping is pure index arithmetic.
    // numRecords fits in Int (the file is an in-memory array), so a Long
    // skip clamps safely — no Int wrap for >2^31 windows
    val it = (math.min(skip, numRecords.toLong).toInt until numRecords).iterator.map { r =>
      val base = headerSize + r.toLong * recordSize
      // truncated or deleted (flag 0x2A) records yield a null-FILLED
      // array, never a null array: callers index attributes positionally
      // and the .shp stream stays aligned
      if (base + recordSize > data.length) Array.fill[Any](fs.length)(null)
      else if (data(base.toInt) == 0x2a) Array.fill[Any](fs.length)(null)
      else {
        var p = base.toInt + 1
        fs.map { f =>
          val raw = new String(data, p, f.length, StandardCharsets.UTF_8)
          p += f.length
          parseDbfValue(f, raw)
        }.toArray[Any]
      }
    }
    (fs, it)
  }

  private def parseDbfValue(f: DbfField, raw: String): Any = f.ftype match {
    case 'C' => raw.replaceAll("\\s+$", "")
    case 'N' | 'F' =>
      val t = raw.trim
      if (t.isEmpty || t.forall(_ == '*')) null // '*'-filled = overflow marker
      else if (f.ftype == 'N' && f.decimals == 0) java.lang.Long.valueOf(t.toLong)
      else java.lang.Double.valueOf(t.toDouble)
    case 'L' => raw.head match {
      case 'T' | 't' | 'Y' | 'y' => java.lang.Boolean.TRUE
      case 'F' | 'f' | 'N' | 'n' => java.lang.Boolean.FALSE
      case _ => null
    }
    case 'D' => val t = raw.trim; if (t.isEmpty) null else t
    case _ => raw.trim
  }

  /** Spark-side field type: N/dec==0 → long, N/F → double, L → boolean,
    * everything else string. */
  def sparkType(f: DbfField): org.apache.spark.sql.types.DataType = f.ftype match {
    case 'N' if f.decimals == 0 => org.apache.spark.sql.types.LongType
    case 'N' | 'F' => org.apache.spark.sql.types.DoubleType
    case 'L' => org.apache.spark.sql.types.BooleanType
    case _ => org.apache.spark.sql.types.StringType
  }

  // ========================================================= joint reading

  /** Zip .shp geometries with .dbf attribute rows, applying the bbox
    * pushdown (records pruned by bbox are skipped WITHOUT geometry
    * deserialization; their dbf rows are skipped in lockstep).
    *
    * `skip`/`take` window the feature sequence (pyogrio's
    * `skip_features`/`max_features`). With no bbox the skip is
    * scan-level — record headers are hopped and dbf offsets jumped, no
    * geometry or attribute decode for skipped records. With a bbox the
    * window applies AFTER the filter (pyogrio semantics), so skipped
    * matches still pay their (cheap, header-only) bbox test. */
  def readFeatures(shp: Array[Byte], dbf: Option[Array[Byte]],
      bbox: Option[(Double, Double, Double, Double)] = None,
      srid: Int = 0, skip: Long = 0L,
      take: Long = Long.MaxValue): Iterator[(Geometry, Array[Any])] =
    readFeaturesWithFids(shp, dbf, bbox, srid, skip, take)
      .map { case (_, g, a) => (g, a) }

  /** [[readFeatures]] carrying each feature's 0-based IN-FILE record
    * index (its OGR FID): records pruned by the bbox still consume an
    * index, so the fid matches what a full-scan numbering — or a
    * [[readFeaturesByFids]] random access — would assign. */
  def readFeaturesWithFids(shp: Array[Byte], dbf: Option[Array[Byte]],
      bbox: Option[(Double, Double, Double, Double)] = None,
      srid: Int = 0, skip: Long = 0L,
      take: Long = Long.MaxValue): Iterator[(Long, Geometry, Array[Any])] = {
    val scanSkip = if (bbox.isEmpty) skip else 0L
    val (_, geoms) = readShpGeometries(shp, bbox, scanSkip)
    val attrs: Iterator[Array[Any]] = dbf match {
      case Some(d) => readDbf(d, scanSkip)._2
      case None => Iterator.continually(Array.empty[Any])
    }
    // zipWithIndex BEFORE the bbox-skip collect: pruned records consume
    // an index, keeping fids scan-position-true
    val zipped = geoms.zip(attrs).zipWithIndex.collect {
      case ((g: Geometry, a), i) =>
        if (srid != 0) g.setSRID(srid)
        (scanSkip + i, g, a)
      case ((null, a), i) => (scanSkip + i, null: Geometry, a)
    }
    // Long-counting post-filter window (Iterator.drop/take truncate at
    // Int.MaxValue, which would mis-slice a >2^31 window)
    val windowed =
      if (bbox.isEmpty || skip <= 0) zipped
      else { var n = skip; zipped.filter(_ => if (n > 0) { n -= 1; false } else true) }
    if (take == Long.MaxValue) windowed
    else { var n = take; windowed.takeWhile(_ => if (n > 0) { n -= 1; true } else false) }
  }

  /** Random access by 0-based record index (OGR's shapefile FID): the
    * fixed-size .shx gives each record's byte offset directly and the
    * .dbf is fixed-stride, so each requested feature costs O(1) decode —
    * nothing else in the file is touched. Unknown indexes are skipped
    * (pyogrio `fids=` semantics). */
  def readFeaturesByFids(shp: Array[Byte], shx: Array[Byte],
      dbf: Option[Array[Byte]], fids: Seq[Long],
      srid: Int = 0): Iterator[(Geometry, Array[Any])] =
    readFeaturesByFidsWithIds(shp, shx, dbf, fids, srid)
      .map { case (_, g, a) => (g, a) }

  /** [[readFeaturesByFids]] carrying the resolved fid per feature (the
    * requested index that produced the row — unknown indexes are
    * dropped, so callers needing fid alignment must read it here). */
  def readFeaturesByFidsWithIds(shp: Array[Byte], shx: Array[Byte],
      dbf: Option[Array[Byte]], fids: Seq[Long],
      srid: Int = 0): Iterator[(Long, Geometry, Array[Any])] = {
    val whole = ByteBuffer.wrap(shp) // big-endian for record headers
    val fileLenBytes = math.min(whole.getInt(24) * 2L, shp.length).toInt
    val nRec = recordCountFromShx(shx.length.toLong)
    val fields = dbf.map(d => readDbf(d)._1).getOrElse(Seq.empty)
    val dbfHeaderSize = dbf.map(d =>
      ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN).getShort(8) & 0xffff).getOrElse(0)
    val dbfRecordSize = dbf.map(d =>
      ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN).getShort(10) & 0xffff).getOrElse(0)
    val shxBuf = ByteBuffer.wrap(shx)
    fids.iterator.filter(i => i >= 0 && i < nRec).flatMap { i =>
      val off = shxBuf.getInt(100 + 8 * i.toInt) * 2
      if (off + 8 > fileLenBytes) None
      else {
        val contentWords = whole.getInt(off + 4)
        val content = ByteBuffer.wrap(shp, off + 8, contentWords * 2)
          .order(ByteOrder.LITTLE_ENDIAN)
        val geom = readRecord(content, None) match {
          case g: Geometry => if (srid != 0) g.setSRID(srid); g
          case _ => null
        }
        val attrs: Array[Any] = dbf match {
          case Some(d) =>
            val base = dbfHeaderSize + i * dbfRecordSize
            if (base + dbfRecordSize > d.length || d(base.toInt) == 0x2a)
              Array.fill[Any](fields.length)(null)
            else {
              var p = base.toInt + 1
              fields.map { f =>
                val raw = new String(d, p, f.length, StandardCharsets.UTF_8)
                p += f.length
                parseDbfValue(f, raw)
              }.toArray[Any]
            }
          case None => Array.empty[Any]
        }
        Some((i, geom, attrs))
      }
    }
  }

  /** Record count without decoding: from the fixed-size .shx when
    * present ((len-100)/8), else by hopping .shp record headers. */
  def recordCountFromShx(shxLen: Long): Long = (shxLen - 100L) / 8L

  def recordCount(shp: Array[Byte]): Long = {
    val whole = ByteBuffer.wrap(shp)
    val fileLenBytes = math.min(whole.getInt(24) * 2L, shp.length).toInt
    var off = 100
    var n = 0L
    while (off + 8 <= fileLenBytes) {
      off += 8 + whole.getInt(off + 4) * 2
      n += 1
    }
    n
  }

  // ================================================================ writing

  /** In-memory shapefile writer (see class doc for why buffering is safe:
    * the format caps files at 2 GB). Produces the .shp/.shx/.dbf byte
    * arrays plus an optional .prj WKT. One shape class per file (spec):
    * the type is fixed by the first non-null geometry; later geometries
    * must match (Polygon and MultiPolygon share a shape type, ditto
    * lines/points). */
  final class Writer(fields: Seq[DbfField]) {
    private val shpBody = new ByteArrayOutputStream()
    private val shxBody = new ByteArrayOutputStream()
    private val dbfBody = new ByteArrayOutputStream()
    private var shapeType = -1
    private var hasZ = false
    private var recNum = 0
    private var xmin = Double.MaxValue; private var ymin = Double.MaxValue
    private var xmax = -Double.MaxValue; private var ymax = -Double.MaxValue
    private var zmin = Double.MaxValue; private var zmax = -Double.MaxValue

    private def shapeTypeOf(g: Geometry, z: Boolean): Int = {
      val base = g match {
        case _: Point => StPoint
        case _: MultiPoint => StMultiPoint
        case _: LineString | _: MultiLineString => StPolyLine
        case _: Polygon | _: MultiPolygon => StPolygon
        case other => throw new IllegalArgumentException(
          s"shapefile: unsupported geometry ${other.getGeometryType} (no GeometryCollection)")
      }
      if (z) base + 10 else base
    }

    def write(g: Geometry, attrs: Array[Any]): Unit = {
      recNum += 1
      val content: Array[Byte] =
        if (g == null || g.isEmpty) le(4) { b => b.putInt(StNull) }
        else {
          if (shapeType < 0) { hasZ = EWKB.hasZ(g); shapeType = shapeTypeOf(g, hasZ) }
          else require(shapeTypeOf(g, hasZ) == shapeType,
            s"shapefile: mixed shape types (${g.getGeometryType} in a type-$shapeType file)")
          val e = g.getEnvelopeInternal
          xmin = math.min(xmin, e.getMinX); ymin = math.min(ymin, e.getMinY)
          xmax = math.max(xmax, e.getMaxX); ymax = math.max(ymax, e.getMaxY)
          encodeShape(g)
        }
      val recHead = ByteBuffer.allocate(8)
      recHead.putInt(recNum).putInt(content.length / 2)
      val offsetWords = (100 + shpBody.size()) / 2
      shpBody.write(recHead.array()); shpBody.write(content)
      val shxRec = ByteBuffer.allocate(8)
      shxRec.putInt(offsetWords).putInt(content.length / 2)
      shxBody.write(shxRec.array())
      writeDbfRecord(attrs)
    }

    private def le(n: Int)(f: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
      f(b); b.array()
    }

    private def allCoords(g: Geometry): Array[Coordinate] = g.getCoordinates

    private def trackZ(cs: Array[Coordinate]): Unit = if (hasZ) cs.foreach { c =>
      val z = if (c.getZ.isNaN) 0.0 else c.getZ
      zmin = math.min(zmin, z); zmax = math.max(zmax, z)
    }

    private def encodeShape(g: Geometry): Array[Byte] = g match {
      case p: Point =>
        trackZ(allCoords(p))
        le(4 + 16 + (if (hasZ) 8 else 0)) { b =>
          b.putInt(shapeType).putDouble(p.getX).putDouble(p.getY)
          if (hasZ) b.putDouble(zOf(p.getCoordinate))
        }
      case mp: MultiPoint =>
        val cs = allCoords(mp); trackZ(cs)
        le(4 + 32 + 4 + 16 * cs.length + (if (hasZ) 16 + 8 * cs.length else 0)) { b =>
          b.putInt(shapeType); putBox(b, mp)
          b.putInt(cs.length)
          cs.foreach(c => b.putDouble(c.x).putDouble(c.y))
          if (hasZ) putZBlock(b, cs)
        }
      case _ =>
        // (multi)lines and (multi)polygons share the parts/points layout
        val parts: Seq[Array[Coordinate]] = g match {
          case l: LineString => Seq(l.getCoordinates)
          case ml: MultiLineString =>
            (0 until ml.getNumGeometries).map(ml.getGeometryN(_).getCoordinates)
          case poly: Polygon => polygonRings(poly)
          case mpoly: MultiPolygon =>
            (0 until mpoly.getNumGeometries)
              .flatMap(i => polygonRings(mpoly.getGeometryN(i).asInstanceOf[Polygon]))
          case other => throw new IllegalArgumentException(other.getGeometryType)
        }
        val cs = parts.toArray.flatten; trackZ(cs)
        le(4 + 32 + 8 + 4 * parts.length + 16 * cs.length +
            (if (hasZ) 16 + 8 * cs.length else 0)) { b =>
          b.putInt(shapeType); putBox(b, g)
          b.putInt(parts.length).putInt(cs.length)
          var acc = 0
          parts.foreach { p => b.putInt(acc); acc += p.length }
          cs.foreach(c => b.putDouble(c.x).putDouble(c.y))
          if (hasZ) putZBlock(b, cs)
        }
    }

    /** Shell first (forced CW per spec), then holes (forced CCW). */
    private def polygonRings(p: Polygon): Seq[Array[Coordinate]] = {
      def oriented(cs: Array[Coordinate], wantCCW: Boolean): Array[Coordinate] =
        if (Orientation.isCCW(cs) == wantCCW) cs else cs.reverse
      oriented(p.getExteriorRing.getCoordinates, wantCCW = false) +:
        (0 until p.getNumInteriorRing)
          .map(i => oriented(p.getInteriorRingN(i).getCoordinates, wantCCW = true))
    }

    private def zOf(c: Coordinate): Double = if (c.getZ.isNaN) 0.0 else c.getZ

    private def putBox(b: ByteBuffer, g: Geometry): Unit = {
      val e = g.getEnvelopeInternal
      b.putDouble(e.getMinX).putDouble(e.getMinY).putDouble(e.getMaxX).putDouble(e.getMaxY)
    }

    private def putZBlock(b: ByteBuffer, cs: Array[Coordinate]): Unit = {
      val zs = cs.map(zOf)
      b.putDouble(if (zs.isEmpty) 0.0 else zs.min)
      b.putDouble(if (zs.isEmpty) 0.0 else zs.max)
      zs.foreach(b.putDouble)
    }

    private def writeDbfRecord(attrs: Array[Any]): Unit = {
      require(attrs.length == fields.length,
        s"shapefile: ${attrs.length} attributes for ${fields.length} dbf fields")
      dbfBody.write(' ')
      fields.zip(attrs).foreach { case (f, v) =>
        val s = formatDbfValue(f, v)
        val bytes = s.getBytes(StandardCharsets.UTF_8)
        val out = new Array[Byte](f.length)
        java.util.Arrays.fill(out, ' '.toByte)
        if (f.ftype == 'C' || f.ftype == 'L')
          System.arraycopy(bytes, 0, out, 0, math.min(bytes.length, f.length))
        else if (bytes.length > f.length)
          // an overflowing numeric must NOT be truncated (keeping the
          // last f.length bytes silently drops the sign and leading
          // digits) — write the dBase overflow marker, which reads back
          // as null
          java.util.Arrays.fill(out, '*'.toByte)
        else // numerics right-justified
          System.arraycopy(bytes, 0, out, f.length - bytes.length, bytes.length)
        dbfBody.write(out)
      }
    }

    private def formatDbfValue(f: DbfField, v: Any): String = (f.ftype, v) match {
      case (_, null) => ""
      case ('L', b: java.lang.Boolean) => if (b) "T" else "F"
      case ('N', x) if f.decimals == 0 => x.toString
      case ('N' | 'F', x: java.lang.Double) => f"%%.${f.decimals}f".format(x.doubleValue)
      case ('N' | 'F', x: java.lang.Float) => f"%%.${f.decimals}f".format(x.doubleValue)
      case ('N' | 'F', x) => x.toString
      case (_, x) => x.toString
    }

    /** Final file images. */
    def result(): ShapefileBytes = {
      if (shapeType < 0) shapeType = StNull
      // no record ever extended the box (empty file OR all-null
      // geometries): ±Double.MaxValue would be a garbage header extent
      if (xmin > xmax || ymin > ymax) { xmin = 0; ymin = 0; xmax = 0; ymax = 0 }
      val shp = withMainHeader(shpBody.toByteArray)
      val shx = withMainHeader(shxBody.toByteArray)
      ShapefileBytes(shp, shx, dbfBytes())
    }

    private def withMainHeader(body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(100 + body.length)
      b.putInt(9994); b.position(24); b.putInt((100 + body.length) / 2)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000).putInt(shapeType)
      b.putDouble(xmin).putDouble(ymin).putDouble(xmax).putDouble(ymax)
      b.putDouble(if (hasZ && recNum > 0) zmin else 0.0)
      b.putDouble(if (hasZ && recNum > 0) zmax else 0.0)
      b.putDouble(0.0).putDouble(0.0) // M range (unused)
      b.position(100); b.put(body)
      b.array()
    }

    private def dbfBytes(): Array[Byte] = {
      val headerSize = 32 + 32 * fields.length + 1
      val recordSize = 1 + fields.map(_.length).sum
      val head = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
      head.put(0x03.toByte)
      head.put(126.toByte).put(1.toByte).put(1.toByte) // fixed date: deterministic output
      head.putInt(recNum)
      head.putShort(headerSize.toShort).putShort(recordSize.toShort)
      head.position(32)
      fields.foreach { f =>
        val fd = ByteBuffer.allocate(32)
        val nameBytes = f.name.getBytes(StandardCharsets.US_ASCII)
        require(nameBytes.length <= 10, s"shapefile: dbf field name too long: ${f.name}")
        fd.put(nameBytes); fd.position(11)
        fd.put(f.ftype.toByte)
        fd.position(16); fd.put(f.length.toByte).put(f.decimals.toByte)
        head.put(fd.array())
      }
      head.put(0x0d.toByte)
      val out = new ByteArrayOutputStream()
      out.write(head.array())
      dbfBody.writeTo(out)
      out.write(0x1a)
      out.toByteArray
    }
  }

  final case class ShapefileBytes(shp: Array[Byte], shx: Array[Byte], dbf: Array[Byte])

  // ================================================================== .prj

  /** EPSG code from a .prj's WKT: the LAST AUTHORITY clause is the
    * top-level CRS authority (inner ones belong to datum/spheroid). */
}
