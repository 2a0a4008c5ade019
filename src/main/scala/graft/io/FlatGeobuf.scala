package graft.io

import java.io.{DataOutputStream, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import graft.serde.EWKB
import org.locationtech.jts.geom._

/** FlatGeobuf (FGB) encode/decode in pure JVM — closes the reference's
  * `read_file`/`write_file` OGR-format gap for the one cloud-native binary
  * vector format that needs no GDAL (spec: flatgeobuf.org, file layout
  * `MAGIC | u32 headerSize | Header fb | [packed Hilbert R-tree] |
  * (u32 featureSize | Feature fb)*`; the reference reads it through pyogrio,
  * `/root/reference/polars_st/input.py:30-153`).
  *
  * Supported: geometry types Point/LineString/Polygon/MultiPoint/
  * MultiLineString/MultiPolygon/GeometryCollection (2D + Z), property
  * columns of the scalar/string/binary ColumnTypes, header CRS (EPSG code →
  * SRID on every read geometry), and the packed Hilbert R-tree index on
  * BOTH sides: [[writeIndexed]] emits spec-layout indexed files
  * (Hilbert-sorted features, 40-byte LE nodes) and bbox reads are
  * index-driven (tree search + random-access decode of only the hits);
  * plain [[write]] emits index_node_size=0 files, and unindexed reads
  * fall back to a sequential filtered scan.
  */
object FlatGeobuf {

  /** `fgb\x03fgb\x00` — spec version 3. */
  val Magic: Array[Byte] = Array[Byte]('f', 'g', 'b', 3, 'f', 'g', 'b', 0)

  // GeometryType enum — identical codes to WKB (spec header.fbs).
  private val GtUnknown = 0
  private val GtPoint = 1
  private val GtLineString = 2
  private val GtPolygon = 3
  private val GtMultiPoint = 4
  private val GtMultiLineString = 5
  private val GtMultiPolygon = 6
  private val GtGeometryCollection = 7

  // ColumnType enum (spec header.fbs).
  val CtByte = 0; val CtUByte = 1; val CtBool = 2; val CtShort = 3
  val CtUShort = 4; val CtInt = 5; val CtUInt = 6; val CtLong = 7
  val CtULong = 8; val CtFloat = 9; val CtDouble = 10; val CtString = 11
  val CtJson = 12; val CtDateTime = 13; val CtBinary = 14

  final case class Col(name: String, colType: Int)
  final case class Header(geometryType: Int, hasZ: Boolean, columns: Seq[Col],
      featuresCount: Long, indexNodeSize: Int, srid: Int)

  final case class Feature(geometry: Geometry, properties: Array[Any])

  private def factory = EWKB.geometryFactory

  // ----------------------------------------------------------------- header

  /** Parse the header flatbuffer (fields per header.fbs: 0 name,
    * 1 envelope, 2 geometry_type, 3 has_z, 4 has_m, 5 has_t, 6 has_tm,
    * 7 columns, 8 features_count, 9 index_node_size, 10 crs, ...). */
  def readHeader(headerBytes: Array[Byte]): Header = {
    val (r, root) = FlatBuf.reader(headerBytes)
    val gt = r.byteField(root, 2, GtUnknown)
    val hasZ = r.boolField(root, 3, default = false)
    val cols = r.tableVector(root, 7).toSeq.map { cp =>
      Col(r.stringField(cp, 0), r.byteField(cp, 1, CtString))
    }
    val count = r.longField(root, 8, 0L)
    val nodeSize = r.shortField(root, 9, 16)
    val crsPos = r.tableField(root, 10)
    val srid = if (crsPos < 0) 0 else r.intField(crsPos, 1, 0)
    Header(gt, hasZ, cols, count, nodeSize, srid)
  }

  private def buildHeader(h: Header, name: String): Array[Byte] = {
    val b = new FlatBuf.Builder(256)
    val colOffs = h.columns.map { c =>
      val n = b.createString(c.name)
      b.startTable(11)
      b.addOffsetField(0, n)
      b.addByteField(1, c.colType, -1) // always store the type explicitly
      b.endTable()
    }.toArray
    val colsVec = if (colOffs.isEmpty) 0 else b.createOffsetVector(colOffs)
    val crsOff = if (h.srid == 0) 0 else {
      val org = b.createString("EPSG")
      b.startTable(6)
      b.addOffsetField(0, org)
      b.addIntField(1, h.srid, 0)
      b.endTable()
    }
    val nameOff = b.createString(name)
    b.startTable(11)
    b.addOffsetField(0, nameOff)
    b.addByteField(2, h.geometryType, GtUnknown)
    b.addBoolField(3, h.hasZ, default = false)
    b.addOffsetField(7, colsVec)
    b.addLongField(8, h.featuresCount, 0L)
    b.addShortField(9, h.indexNodeSize, 16)
    b.addOffsetField(10, crsOff)
    b.finish(b.endTable())
  }

  /** Byte size of the packed Hilbert R-tree (spec: 40-byte nodes, levels of
    * ceil(n/nodeSize) up to the root). */
  def indexSize(featuresCount: Long, nodeSize: Int): Long = {
    if (nodeSize <= 0 || featuresCount == 0) return 0L
    var n = featuresCount
    var total = n
    while (n != 1) {
      n = (n + nodeSize - 1) / nodeSize
      total += n
    }
    total * 40L
  }

  // ------------------------------------------- packed Hilbert R-tree index

  /** The spec's spatial index (flatgeobuf.org `spec.md` + the reference
    * `packedrtree` implementations): a bottom-up-packed R-tree over the
    * features in Hilbert order, serialized ROOT LEVEL FIRST as 40-byte
    * little-endian nodes (minX, minY, maxX, maxY: f64; offset: u64).
    * Leaf nodes carry the feature's byte offset within the features
    * section; internal nodes carry the absolute node INDEX of their
    * first child. Any consistent feature order yields a valid file —
    * Hilbert order is the locality optimization the spec prescribes. */
  object PackedRTree {
    final case class Node(minX: Double, minY: Double, maxX: Double,
      maxY: Double, offset: Long)

    /** Order-16 Hilbert curve position of a grid cell (the classic
      * rotate-and-interleave xy→d walk). */
    def hilbert(x: Int, y: Int): Long = {
      var rx = 0; var ry = 0; var d = 0L
      var xx = x; var yy = y
      var s = 1 << 15
      while (s > 0) {
        rx = if ((xx & s) > 0) 1 else 0
        ry = if ((yy & s) > 0) 1 else 0
        d += s.toLong * s.toLong * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { xx = s - 1 - xx; yy = s - 1 - yy }
          val t = xx; xx = yy; yy = t
        }
        s >>= 1
      }
      d
    }

    /** Per-level [start, end) node-index bounds, LEAF LEVEL FIRST (the
      * storage order puts the root at node 0, leaves at the end). */
    def levelBounds(numItems: Long, nodeSize: Int): Seq[(Long, Long)] = {
      require(numItems > 0 && nodeSize >= 2)
      var n = numItems
      val sizes = scala.collection.mutable.ArrayBuffer(n)
      while (n != 1) { n = (n + nodeSize - 1) / nodeSize; sizes += n }
      val numNodes = sizes.sum
      var acc = numNodes
      sizes.map { size => acc -= size; (acc, acc + size) }.toSeq
    }

    /** Pack the tree over leaf items (already in storage order) and
      * serialize all levels. */
    def build(leaves: Array[Node], nodeSize: Int): Array[Byte] = {
      val bounds = levelBounds(leaves.length.toLong, nodeSize)
      val numNodes = bounds.map { case (a, b) => b - a }.sum.toInt
      val nodes = new Array[Node](numNodes)
      val (leafStart, _) = bounds.head
      var i = 0
      while (i < leaves.length) { nodes(leafStart.toInt + i) = leaves(i); i += 1 }
      // bottom-up: each parent unions up to nodeSize children and points
      // at the first one's absolute node index
      var level = 0
      while (level < bounds.length - 1) {
        val (cStart, cEnd) = bounds(level)
        val (pStart, _) = bounds(level + 1)
        var child = cStart
        var parent = pStart
        while (child < cEnd) {
          val end = math.min(child + nodeSize, cEnd)
          var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
          var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
          var c = child
          while (c < end) {
            val n = nodes(c.toInt)
            if (n.minX < minX) minX = n.minX
            if (n.minY < minY) minY = n.minY
            if (n.maxX > maxX) maxX = n.maxX
            if (n.maxY > maxY) maxY = n.maxY
            c += 1
          }
          nodes(parent.toInt) = Node(minX, minY, maxX, maxY, child)
          parent += 1
          child = end
        }
        level += 1
      }
      val out = ByteBuffer.allocate(numNodes * 40).order(ByteOrder.LITTLE_ENDIAN)
      nodes.foreach { n =>
        out.putDouble(n.minX).putDouble(n.minY)
          .putDouble(n.maxX).putDouble(n.maxY).putLong(n.offset)
      }
      out.array()
    }

    /** Query the serialized tree: byte offsets (within the features
      * section) of every feature whose stored envelope intersects the
      * bbox, ascending for sequential IO. */
    def search(index: Array[Byte], indexBase: Int, numItems: Long,
        nodeSize: Int, xmin: Double, ymin: Double, xmax: Double,
        ymax: Double): Seq[Long] =
      searchWithIndex(index, indexBase, numItems, nodeSize,
        xmin, ymin, xmax, ymax).map(_._2)

    /** [[search]] carrying each hit's feature ORDINAL (its position in
      * the file's feature order = `leafIndex - leafStart`, since leaves
      * are built in feature-storage order) alongside the byte offset —
      * the fid an OGR sequential read would assign. Sorted by offset for
      * sequential IO. */
    def searchWithIndex(index: Array[Byte], indexBase: Int, numItems: Long,
        nodeSize: Int, xmin: Double, ymin: Double, xmax: Double,
        ymax: Double): Seq[(Long, Long)] = {
      val bb = ByteBuffer.wrap(index).order(ByteOrder.LITTLE_ENDIAN)
      def node(i: Long): Node = {
        val p = indexBase + i.toInt * 40
        Node(bb.getDouble(p), bb.getDouble(p + 8), bb.getDouble(p + 16),
          bb.getDouble(p + 24), bb.getLong(p + 32))
      }
      val bounds = levelBounds(numItems, nodeSize)
      val (leafStart, _) = bounds.head
      val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      // (first node index, level) — root is the single node of the top level
      val queue = scala.collection.mutable.Queue((bounds.last._1, bounds.length - 1))
      while (queue.nonEmpty) {
        val (first, level) = queue.dequeue()
        val levelEnd = bounds(level)._2
        val end = math.min(first + nodeSize, levelEnd)
        var i = first
        while (i < end) {
          val n = node(i)
          val hit = !(n.minX > xmax || n.maxX < xmin || n.minY > ymax || n.maxY < ymin)
          if (hit) {
            if (i >= leafStart) results += ((i - leafStart, n.offset))
            else queue.enqueue((n.offset, level - 1))
          }
          i += 1
        }
      }
      results.sortBy(_._2).toSeq
    }
  }

  /** Buffered indexed write (spec layout: magic | header | packed
    * Hilbert R-tree | features): features are Hilbert-sorted on their
    * envelope centers within the dataset extent, so bbox reads seek to
    * a handful of contiguous ranges. Features WITHOUT a geometry get an
    * inverted (never-intersecting) box — a bbox read is a spatial
    * predicate, so they drop there but still appear in full scans. */
  def writeIndexed(out: OutputStream, columns: Seq[Col], srid: Int,
      features: Iterator[(Geometry, Array[Any])],
      nodeSize: Int = 16, name: String = "graft"): Unit = {
    val encoded = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], org.locationtech.jts.geom.Envelope)]
    features.foreach { case (g, props) =>
      encoded += encodeFeature(g, props, columns)
    }
    writeIndexedEncoded(out, columns, srid, encoded, nodeSize, name)
  }

  /** One feature → (flatbuffer bytes, envelope-or-null) — the encoded
    * form [[writeIndexedEncoded]] consumes. Exposed so buffering sinks
    * ([[IndexedStreamWriter]]) can encode features AS THEY ARRIVE and
    * drop the JTS geometry + boxed properties immediately, instead of
    * holding both the raw and encoded forms at commit. */
  def encodeFeature(g: Geometry, props: Array[Any],
      columns: Seq[Col]): (Array[Byte], org.locationtech.jts.geom.Envelope) = {
    val b = new FlatBuf.Builder(512)
    val bytes = buildFeature(b, g, writeProperties(props, columns))
    (bytes, if (g == null || g.isEmpty) null else g.getEnvelopeInternal)
  }

  /** The index-building back half of [[writeIndexed]] over pre-encoded
    * features. Closes `out`. */
  def writeIndexedEncoded(out: OutputStream, columns: Seq[Col], srid: Int,
      encoded: scala.collection.mutable.ArrayBuffer[(Array[Byte], org.locationtech.jts.geom.Envelope)],
      nodeSize: Int = 16, name: String = "graft"): Unit = {
    val dos = new DataOutputStream(out)
    def u32(v: Int): Unit = {
      dos.write(v & 0xff); dos.write((v >>> 8) & 0xff)
      dos.write((v >>> 16) & 0xff); dos.write((v >>> 24) & 0xff)
    }
    dos.write(Magic)
    if (encoded.isEmpty) {
      // an empty indexed file degenerates to an empty unindexed one
      val header = buildHeader(
        Header(GtUnknown, hasZ = false, columns, 0L, indexNodeSize = 0, srid), name)
      u32(header.length); dos.write(header); dos.close()
      return
    }
    // dataset extent over real envelopes → order-16 Hilbert sort keys
    var eMinX = Double.PositiveInfinity; var eMinY = Double.PositiveInfinity
    var eMaxX = Double.NegativeInfinity; var eMaxY = Double.NegativeInfinity
    encoded.foreach { case (_, env) =>
      if (env != null) {
        if (env.getMinX < eMinX) eMinX = env.getMinX
        if (env.getMinY < eMinY) eMinY = env.getMinY
        if (env.getMaxX > eMaxX) eMaxX = env.getMaxX
        if (env.getMaxY > eMaxY) eMaxY = env.getMaxY
      }
    }
    val w = math.max(eMaxX - eMinX, java.lang.Double.MIN_NORMAL)
    val h = math.max(eMaxY - eMinY, java.lang.Double.MIN_NORMAL)
    val sorted = encoded.sortBy { case (_, env) =>
      if (env == null) Long.MaxValue // geometry-less features sort last
      else PackedRTree.hilbert(
        (((env.getMinX + env.getMaxX) / 2 - eMinX) / w * 0xffff).toInt,
        (((env.getMinY + env.getMaxY) / 2 - eMinY) / h * 0xffff).toInt)
    }
    var off = 0L
    val leaves = sorted.map { case (bytes, env) =>
      val n =
        if (env == null)
          PackedRTree.Node(Double.PositiveInfinity, Double.PositiveInfinity,
            Double.NegativeInfinity, Double.NegativeInfinity, off)
        else PackedRTree.Node(env.getMinX, env.getMinY, env.getMaxX,
          env.getMaxY, off)
      off += 4 + bytes.length
      n
    }.toArray
    val header = buildHeader(
      Header(GtUnknown, hasZ = false, columns, encoded.length.toLong,
        indexNodeSize = nodeSize, srid), name)
    u32(header.length); dos.write(header)
    dos.write(PackedRTree.build(leaves, nodeSize))
    sorted.foreach { case (bytes, _) => u32(bytes.length); dos.write(bytes) }
    dos.close()
  }

  /** Index-driven candidate offsets for a bbox read: None when the file
    * carries no index (callers fall back to a filtered scan). */
  def searchOffsets(bytes: Array[Byte], xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): Option[Seq[Long]] =
    searchHits(bytes, xmin, ymin, xmax, ymax).map(_.map(_._2))

  /** [[searchOffsets]] with each hit's feature ordinal (fid): None when
    * the file carries no index. */
  def searchHits(bytes: Array[Byte], xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): Option[Seq[(Long, Long)]] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = bb.getInt(8)
    val header = readHeader(java.util.Arrays.copyOfRange(bytes, 12, 12 + headerSize))
    if (header.indexNodeSize <= 0 || header.featuresCount == 0) None
    else Some(PackedRTree.searchWithIndex(bytes, 12 + headerSize,
      header.featuresCount, header.indexNodeSize, xmin, ymin, xmax, ymax))
  }

  /** Decode the features at the given byte offsets (within the features
    * section) — the random-access half of an indexed bbox read. */
  def readFeaturesAt(bytes: Array[Byte], offsets: Seq[Long]): Iterator[Feature] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = bb.getInt(8)
    val header = readHeader(java.util.Arrays.copyOfRange(bytes, 12, 12 + headerSize))
    val base = 12 + headerSize + indexSize(header.featuresCount, header.indexNodeSize).toInt
    offsets.iterator.map { off =>
      val pos = base + off.toInt
      val size = bb.getInt(pos)
      readFeature(java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + size), header)
    }
  }

  // --------------------------------------------------------------- geometry

  /** Feature-level Geometry table (feature.fbs: 0 ends, 1 xy, 2 z, 3 m,
    * 4 t, 5 tm, 6 type, 7 parts) → JTS. `ends` are cumulative vertex
    * counts; xy is the flat coordinate pair array. */
  private def readGeometry(r: FlatBuf.Reader, pos: Int, defaultType: Int): Geometry = {
    val gt = {
      val t = r.byteField(pos, 6, GtUnknown)
      if (t != GtUnknown) t else defaultType
    }
    val partsPos = r.fieldPos(pos, 7)
    if (partsPos >= 0) {
      val parts = r.tableVector(pos, 7).map(p => readGeometry(r, p, GtUnknown))
      return gt match {
        case GtMultiPolygon =>
          factory.createMultiPolygon(parts.map(_.asInstanceOf[Polygon]))
        case GtMultiLineString =>
          factory.createMultiLineString(parts.map(_.asInstanceOf[LineString]))
        case GtMultiPoint =>
          factory.createMultiPoint(parts.map(_.asInstanceOf[Point]))
        case _ => factory.createGeometryCollection(parts)
      }
    }
    val xy = r.doubleVector(pos, 1)
    val z = r.doubleVector(pos, 2)
    val ends = r.uintVector(pos, 0)
    val hasZ = z.nonEmpty
    def seq(fromVertex: Int, toVertex: Int): CoordinateSequence = {
      val n = toVertex - fromVertex
      val dims = if (hasZ) 3 else 2
      val s = factory.getCoordinateSequenceFactory.create(n, dims, 0)
      var i = 0
      while (i < n) {
        s.setOrdinate(i, 0, xy(2 * (fromVertex + i)))
        s.setOrdinate(i, 1, xy(2 * (fromVertex + i) + 1))
        if (hasZ) s.setOrdinate(i, 2, z(fromVertex + i))
        i += 1
      }
      s
    }
    val nVertices = xy.length / 2
    def rings: Array[LinearRing] = {
      val bounds = if (ends.isEmpty) Array(nVertices) else ends
      var from = 0
      bounds.map { e => val ring = factory.createLinearRing(seq(from, e)); from = e; ring }
    }
    gt match {
      case GtPoint =>
        if (nVertices == 0) factory.createPoint()
        else factory.createPoint(seq(0, 1))
      case GtLineString => factory.createLineString(seq(0, nVertices))
      case GtPolygon =>
        if (nVertices == 0) factory.createPolygon()
        else {
          val rs = rings
          factory.createPolygon(rs.head, rs.tail)
        }
      case GtMultiPoint =>
        factory.createMultiPoint(
          (0 until nVertices).map(i => factory.createPoint(seq(i, i + 1))).toArray)
      case GtMultiLineString =>
        val bounds = if (ends.isEmpty) Array(nVertices) else ends
        var from = 0
        factory.createMultiLineString(bounds.map { e =>
          val l = factory.createLineString(seq(from, e)); from = e; l
        })
      case GtMultiPolygon => // single-part flat encoding
        if (nVertices == 0) factory.createMultiPolygon(Array.empty[Polygon])
        else {
          val rs = rings
          factory.createMultiPolygon(Array(factory.createPolygon(rs.head, rs.tail)))
        }
      case GtGeometryCollection => factory.createGeometryCollection(Array.empty)
      case other => throw new IllegalArgumentException(
        s"flatgeobuf: unsupported geometry type code $other (curved types " +
          "have no JTS representation — documented divergence, SURVEY.md §7)")
    }
  }

  private def geometryTypeCode(g: Geometry): Int = g match {
    case _: Point => GtPoint
    case _: LineString => GtLineString
    case _: Polygon => GtPolygon
    case _: MultiPoint => GtMultiPoint
    case _: MultiLineString => GtMultiLineString
    case _: MultiPolygon => GtMultiPolygon
    case _: GeometryCollection => GtGeometryCollection
    case other => throw new IllegalArgumentException(
      s"flatgeobuf: cannot encode ${other.getGeometryType}")
  }

  /** Flatten a simple (non-multi-polygon, non-collection) geometry into
    * (xy, z or null, ends or null). */
  private def flatten(g: Geometry): (Array[Double], Array[Double], Array[Int]) = {
    val withZ = EWKB.hasZ(g)
    val coords = new scala.collection.mutable.ArrayBuffer[Double]()
    val zs = new scala.collection.mutable.ArrayBuffer[Double]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var vertices = 0
    def addSeq(seq: CoordinateSequence): Unit = {
      var i = 0
      while (i < seq.size()) {
        coords += seq.getX(i); coords += seq.getY(i)
        if (withZ) zs += seq.getZ(i)
        i += 1
      }
      vertices += seq.size()
      ends += vertices
    }
    g match {
      case p: Point => if (!p.isEmpty) addSeq(p.getCoordinateSequence)
      case l: LineString => addSeq(l.getCoordinateSequence)
      case poly: Polygon =>
        if (!poly.isEmpty) {
          addSeq(poly.getExteriorRing.getCoordinateSequence)
          (0 until poly.getNumInteriorRing)
            .foreach(i => addSeq(poly.getInteriorRingN(i).getCoordinateSequence))
        }
      case mp: MultiPoint =>
        (0 until mp.getNumGeometries).foreach { i =>
          val p = mp.getGeometryN(i).asInstanceOf[Point]
          if (!p.isEmpty) addSeq(p.getCoordinateSequence)
        }
      case ml: MultiLineString =>
        (0 until ml.getNumGeometries).foreach { i =>
          addSeq(ml.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence)
        }
      case other => throw new IllegalArgumentException(
        s"flatgeobuf: ${other.getGeometryType} must be encoded via parts")
    }
    // ends are only meaningful for multi-ring/multi-part flat encodings
    val endsOut =
      if (ends.length > 1) ends.toArray
      else null
    (coords.toArray, if (withZ && zs.nonEmpty) zs.toArray else null, endsOut)
  }

  private def buildGeometry(b: FlatBuf.Builder, g: Geometry): Int = {
    val gt = geometryTypeCode(g)
    gt match {
      case GtMultiPolygon | GtGeometryCollection =>
        val parts = (0 until g.getNumGeometries)
          .map(i => buildGeometry(b, g.getGeometryN(i))).toArray
        val partsVec = if (parts.isEmpty) 0 else b.createOffsetVector(parts)
        b.startTable(8)
        b.addByteField(6, gt, GtUnknown)
        b.addOffsetField(7, partsVec)
        b.endTable()
      case _ =>
        val (xy, z, ends) = flatten(g)
        val xyVec = if (xy.nonEmpty) b.createDoubleVector(xy) else 0
        val zVec = if (z != null) b.createDoubleVector(z) else 0
        val endsVec = if (ends != null) b.createUIntVector(ends) else 0
        b.startTable(8)
        b.addOffsetField(0, endsVec)
        b.addOffsetField(1, xyVec)
        b.addOffsetField(2, zVec)
        b.addByteField(6, gt, GtUnknown)
        b.endTable()
    }
  }

  // ------------------------------------------------------------- properties

  /** Decode the properties blob: repeated `u16 columnIndex | value`, value
    * layout fixed by the column type; strings/binaries are u32-length
    * prefixed. Missing columns stay null. */
  def readProperties(blob: Array[Byte], columns: Seq[Col]): Array[Any] = {
    val out = new Array[Any](columns.length)
    if (blob == null || blob.isEmpty) return out
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() >= 2) {
      val idx = bb.getShort() & 0xffff
      val ct = columns(idx).colType
      out(idx) = ct match {
        case CtBool => bb.get() != 0
        case CtByte => bb.get()
        case CtUByte => (bb.get() & 0xff).toShort
        case CtShort => bb.getShort()
        case CtUShort => bb.getShort() & 0xffff
        case CtInt => bb.getInt()
        case CtUInt => bb.getInt().toLong & 0xffffffffL
        case CtLong | CtULong => bb.getLong()
        case CtFloat => bb.getFloat()
        case CtDouble => bb.getDouble()
        case CtString | CtJson | CtDateTime =>
          val len = bb.getInt()
          val bytes = new Array[Byte](len); bb.get(bytes)
          new String(bytes, "UTF-8")
        case CtBinary =>
          val len = bb.getInt()
          val bytes = new Array[Byte](len); bb.get(bytes)
          bytes
        case other => throw new IllegalArgumentException(
          s"flatgeobuf: unsupported column type $other")
      }
    }
    out
  }

  def writeProperties(values: Array[Any], columns: Seq[Col]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    def u16(v: Int): Unit = { dos.write(v & 0xff); dos.write((v >>> 8) & 0xff) }
    def u32(v: Int): Unit = {
      dos.write(v & 0xff); dos.write((v >>> 8) & 0xff)
      dos.write((v >>> 16) & 0xff); dos.write((v >>> 24) & 0xff)
    }
    def u64(v: Long): Unit = { u32(v.toInt); u32((v >>> 32).toInt) }
    var i = 0
    while (i < columns.length) {
      val v = values(i)
      if (v != null) {
        u16(i)
        columns(i).colType match {
          case CtBool => dos.write(if (v.asInstanceOf[Boolean]) 1 else 0)
          case CtByte => dos.write(v.asInstanceOf[Byte].toInt)
          case CtShort => val s = v.asInstanceOf[Short].toInt; dos.write(s & 0xff); dos.write((s >>> 8) & 0xff)
          case CtInt => u32(v.asInstanceOf[Int])
          case CtLong => u64(v.asInstanceOf[Long])
          case CtFloat => u32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
          case CtDouble => u64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
          case CtString | CtJson | CtDateTime =>
            val bytes = v.toString.getBytes("UTF-8")
            u32(bytes.length); dos.write(bytes)
          case CtBinary =>
            val bytes = v.asInstanceOf[Array[Byte]]
            u32(bytes.length); dos.write(bytes)
          case other => throw new IllegalArgumentException(
            s"flatgeobuf: unsupported column type $other")
        }
      }
      i += 1
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- feature

  private def buildFeature(b: FlatBuf.Builder, geom: Geometry,
      props: Array[Byte]): Array[Byte] = {
    val propsVec = if (props.nonEmpty) b.createByteVector(props) else 0
    val geomOff = if (geom == null) 0 else buildGeometry(b, geom)
    b.startTable(3)
    b.addOffsetField(0, geomOff)
    b.addOffsetField(1, propsVec)
    b.finish(b.endTable())
  }

  /** Parse one Feature flatbuffer (feature.fbs: 0 geometry, 1 properties). */
  def readFeature(bytes: Array[Byte], header: Header): Feature = {
    val (r, root) = FlatBuf.reader(bytes)
    val geomPos = r.tableField(root, 0)
    val geom =
      if (geomPos < 0) null
      else {
        val g = readGeometry(r, geomPos, header.geometryType)
        g.setSRID(header.srid)
        g
      }
    val props = r.byteVector(root, 1)
    Feature(geom, readProperties(props, header.columns))
  }

  // ------------------------------------------------------------ file format

  /** Streaming writer over any OutputStream. Header is written on `start`;
    * each `write` appends one size-prefixed feature. */
  final class Writer(out: OutputStream, columns: Seq[Col], srid: Int,
      name: String = "graft", featuresCount: Long = 0L) {
    private val dos = new DataOutputStream(out)
    locked()
    private def locked(): Unit = {
      dos.write(Magic)
      val header = buildHeader(
        Header(GtUnknown, hasZ = false, columns, featuresCount,
          indexNodeSize = 0, srid), name)
      writeU32(header.length)
      dos.write(header)
    }
    private def writeU32(v: Int): Unit = {
      dos.write(v & 0xff); dos.write((v >>> 8) & 0xff)
      dos.write((v >>> 16) & 0xff); dos.write((v >>> 24) & 0xff)
    }
    def write(geom: Geometry, props: Array[Any]): Unit = {
      val b = new FlatBuf.Builder(512)
      val bytes = buildFeature(b, geom, writeProperties(props, columns))
      writeU32(bytes.length)
      dos.write(bytes)
    }
    def close(): Unit = dos.close()
  }

  /** The header-SRID protocol shared by EVERY streaming FGB sink (the
    * single-file writer, the partitioned writer's per-task streams, the
    * DSv2 DataWriter): the file header carries the SRID and is written at
    * [[Writer]] creation, so rows arriving BEFORE the first non-null
    * geometry are buffered (null geometries carry only their property
    * arrays — tiny); the first real geometry decides the header SRID;
    * any later geometry with a DIFFERENT SRID raises (the reference
    * rejects mixed SRIDs, `geodataframe.py:385-491`); an all-null or
    * empty stream flushes with SRID 0 at [[close]]. One implementation —
    * the three sinks previously carried drifting copies of this logic. */
  final class StreamWriter(out: OutputStream, columns: Seq[Col]) {
    private var writer: Writer = null
    private var srid = -1
    private var leading: scala.collection.mutable.ArrayBuffer[Array[Any]] = null

    private def ensure(headerSrid: Int): Unit = {
      writer = new Writer(out, columns, math.max(headerSrid, 0))
      if (leading != null) {
        leading.foreach(writer.write(null, _))
        leading = null
      }
    }

    def write(geom: Geometry, props: Array[Any]): Unit = {
      if (geom != null) {
        if (srid == -1) srid = geom.getSRID
        else if (geom.getSRID != srid) throw new IllegalArgumentException(
          s"flatgeobuf: mixed SRIDs are not supported ($srid vs ${geom.getSRID})")
      }
      if (writer == null) {
        if (geom == null) {
          if (leading == null)
            leading = new scala.collection.mutable.ArrayBuffer[Array[Any]]()
          leading += props
          return
        }
        ensure(srid)
      }
      writer.write(geom, props)
    }

    /** Close the underlying stream; an empty/all-null stream gets its
      * (SRID 0) header here. */
    def close(): Unit = {
      if (writer == null) ensure(0)
      writer.close()
    }

    /** Close WITHOUT flushing buffered rows or writing a header — for
      * abort paths that will delete the output anyway. */
    def abortClose(): Unit =
      if (writer != null) writer.close() else out.close()
  }

  /** [[StreamWriter]]'s indexed sibling — the same header-SRID protocol
    * (first non-null geometry decides, mixed SRIDs raise), but features
    * are ENCODED as they arrive (flatbuffer bytes + envelope; the JTS
    * geometry and boxed properties are dropped immediately) and the
    * packed-Hilbert-R-tree file is emitted at [[close]], which is when
    * the sort and header can first be written. Memory held = one encoded
    * copy of the partition, not raw + encoded. */
  final class IndexedStreamWriter(out: OutputStream, columns: Seq[Col],
      nodeSize: Int = 16) {
    private val encoded = scala.collection.mutable.ArrayBuffer
      .empty[(Array[Byte], org.locationtech.jts.geom.Envelope)]
    private var srid = -1

    def write(geom: Geometry, props: Array[Any]): Unit = {
      if (geom != null) {
        if (srid == -1) srid = geom.getSRID
        else if (geom.getSRID != srid) throw new IllegalArgumentException(
          s"flatgeobuf: mixed SRIDs are not supported ($srid vs ${geom.getSRID})")
      }
      encoded += encodeFeature(geom, props, columns)
    }

    def close(): Unit =
      try writeIndexedEncoded(out, columns, math.max(srid, 0), encoded, nodeSize)
      catch {
        case e: Throwable =>
          // close the stream without masking the root failure
          try out.close() catch { case scala.util.control.NonFatal(_) => () }
          throw e
      }

    /** For abort paths that will delete the output anyway. */
    def abortClose(): Unit = out.close()
  }

  /** Parse a whole .fgb byte array → (header, features iterator).
    * `skip` hops that many size-prefixed feature records without
    * decoding their flatbuffers (scan-level skip_features). */
  def read(bytes: Array[Byte], skip: Long = 0L): (Header, Iterator[Feature]) = {
    // bytes 3 and 7 are spec version / patch level and may vary
    require(bytes.length >= 12 && Seq(0, 1, 2, 4, 5, 6).forall(i => bytes(i) == Magic(i)),
      "not a FlatGeobuf file (bad magic)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = bb.getInt(8)
    val headerBytes = java.util.Arrays.copyOfRange(bytes, 12, 12 + headerSize)
    val header = readHeader(headerBytes)
    var pos = 12 + headerSize + indexSize(header.featuresCount, header.indexNodeSize).toInt
    var toSkip = skip
    while (toSkip > 0 && pos + 4 <= bytes.length) {
      pos += 4 + bb.getInt(pos)
      toSkip -= 1
    }
    val it = new Iterator[Feature] {
      override def hasNext: Boolean = pos + 4 <= bytes.length
      override def next(): Feature = {
        val size = bb.getInt(pos)
        val fb = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + size)
        pos += 4 + size
        readFeature(fb, header)
      }
    }
    (header, it)
  }

  /** Feature count by hopping size prefixes — no flatbuffer decode; used
    * when the header's featuresCount is 0 (writer didn't know it). */
  def recordCount(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = bb.getInt(8)
    val header = readHeader(java.util.Arrays.copyOfRange(bytes, 12, 12 + headerSize))
    var pos = 12 + headerSize + indexSize(header.featuresCount, header.indexNodeSize).toInt
    var n = 0L
    while (pos + 4 <= bytes.length) {
      pos += 4 + bb.getInt(pos)
      n += 1
    }
    n
  }

  /** Read just the header from a stream (first bytes of a file). */
  def readHeaderFrom(in: InputStream): Header = {
    val magic = in.readNBytes(8)
    require(magic.length == 8 && magic(0) == 'f' && magic(1) == 'g' && magic(2) == 'b',
      "not a FlatGeobuf file (bad magic)")
    val sz = in.readNBytes(4)
    val headerSize = ByteBuffer.wrap(sz).order(ByteOrder.LITTLE_ENDIAN).getInt
    readHeader(in.readNBytes(headerSize))
  }
}
