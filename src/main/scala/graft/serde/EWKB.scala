package graft.serde

import java.io.ByteArrayOutputStream
import org.locationtech.jts.geom._
import org.locationtech.jts.io.WKBReader

/** EWKB (PostGIS extended WKB) codec.
  *
  * Geometry columns in this engine are `BinaryType` holding EWKB bytes, the
  * same convention as the reference (polars-st `README.md:42-44`). The header
  * layout follows `/root/reference/src/wkb.rs:14-45`: byte-order byte, u32
  * type id with flag bits Z=0x8000_0000, M=0x4000_0000, SRID=0x2000_0000,
  * then an i32 SRID when the SRID flag is set.
  *
  * Reading uses JTS `WKBReader` (handles both EWKB flag bits and ISO type
  * codes). Writing is a hand-rolled little-endian writer so the byte output
  * is fully deterministic: SRID flag + value always written at the top level
  * (like GEOS `WKBWriter::set_include_SRID(true)`,
  * `/root/reference/src/functions.rs:54-58`), Z flag per actual coordinate
  * dimensionality, children of multi-geometries and collections carry Z/M
  * flags but no SRID (PostGIS convention).
  */
object EWKB {

  val FlagZ: Int = 0x80000000
  val FlagM: Int = 0x40000000
  val FlagSrid: Int = 0x20000000

  /** Parsed EWKB header: base geometry type code (1..17), flags, srid —
    * plus the raw-layout facts every other byte-level consumer needs, so
    * the ISO-code-plus-EWKB-flag hybrid nuance is decoded in EXACTLY one
    * place ([[header]]): `hasSridField` says whether a 4-byte SRID word
    * follows the type word (drives [[payloadOffset]]); `littleEndian` is
    * the value's byte order. */
  final case class Header(typeCode: Int, hasZ: Boolean, hasM: Boolean, srid: Int,
      hasSridField: Boolean, littleEndian: Boolean) {
    /** Byte offset of the geometry body (after byte-order byte, type word
      * and the optional SRID word). */
    def payloadOffset: Int = if (hasSridField) 9 else 5
    /** Stored coordinate dimensionality. */
    def dims: Int = 2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)
  }

  /** 18-type name table, `/root/reference/src/wkb.rs:47-68`. Index = code. */
  private val typeNames: Array[String] = Array(
    "Unknown", "Point", "LineString", "Polygon", "MultiPoint",
    "MultiLineString", "MultiPolygon", "GeometryCollection",
    "CircularString", "CompoundCurve", "CurvePolygon", "MultiCurve",
    "MultiSurface", "Curve", "Surface", "PolyhedralSurface", "Tin",
    "Triangle")

  def typeName(code: Int): String =
    if (code >= 0 && code < typeNames.length) typeNames(code) else "Unknown"

  /** Parse just the EWKB/ISO WKB header without a full geometry parse
    * (fast path for geometry_type / srid / has_z — like the reference's
    * header-only kernels, `functions.rs:410-443`). */
  def header(bytes: Array[Byte]): Header = {
    require(bytes != null && bytes.length >= 5, "invalid WKB: too short")
    val littleEndian = bytes(0) == 1
    def u32(off: Int): Int = {
      if (littleEndian)
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
          ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
      else
        ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    }
    val raw = u32(1)
    val hasSrid = (raw & FlagSrid) != 0
    require(!hasSrid || bytes.length >= 9, "invalid WKB: too short")
    var hasZ = (raw & FlagZ) != 0
    var hasM = (raw & FlagM) != 0
    var code = raw & 0x0fffffff
    // ISO type codes: 1001=PointZ, 2001=PointM, 3001=PointZM, etc.
    val isoDim = code / 1000
    if (isoDim == 1) { hasZ = true; code -= 1000 }
    else if (isoDim == 2) { hasM = true; code -= 2000 }
    else if (isoDim == 3) { hasZ = true; hasM = true; code -= 3000 }
    val srid = if (hasSrid) u32(5) else 0
    Header(code, hasZ, hasM, srid, hasSrid, littleEndian)
  }

  // ---------------------------------------------------------------- read

  private val factory = new GeometryFactory(new PrecisionModel())

  private val readerTL = new ThreadLocal[WKBReader] {
    override def initialValue(): WKBReader = new WKBReader(factory)
  }

  // Per-thread parse cache: chained geometry expressions (st_area(st_buffer(g)))
  // and multi-use of one column (area(g), length(g), centroid(g)) otherwise
  // re-parse identical bytes per op — the round-trip cost model inherited
  // from the reference (README.md:44). Keyed on byte content; geometries
  // returned from read() are treated as immutable everywhere (mutating ops
  // copy first — see GeoUDFs.setSrid). Oversized values skip the cache.
  //
  // Sizing (r13, ProbeBucketHot): the cache was a 64-entry LRU, which the
  // bucketed spatial join's hot cells THRASH — a cell group cycling more
  // distinct inner geometries than capacity misses on EVERY lookup (LRU's
  // hit rate under a cycle longer than capacity is exactly 0) while still
  // paying map overhead (measured 864 ns/lookup thrashing vs 196 ns
  // hitting on ~100-byte polygons; a 4096×256 hot cell's single task
  // spent ~100% of the join wall-clock re-parsing). Two tiers now:
  //
  //  - SMALL values (≤512 B — points, rectangles, small polygons: the
  //    high-cardinality row classes the bucketed join cycles): a
  //    DIRECT-MAPPED 4096-slot table. Cyclic access degrades to
  //    statistical hits (≈(1−1/slots)^(N−1), ~60% at N=2048) instead of
  //    LRU's zero, and lookups are an index + byte compare (no
  //    linked-list maintenance). Worst-case retained memory: 4096 ×
  //    512 B = 2 MiB of keys — the same ceiling as the LRU tier's byte
  //    budget — plus the retained JTS geometries at ~3-5× the bytes
  //    (~10 MiB/thread worst, typical far lower: slots hold actual
  //    sizes, and the dominant small rows are ~100 B).
  //  - LARGER values (512 B..256 KiB): the access-order LRU, 1024
  //    entries under a 2 MiB per-thread key-byte budget (keyed bytes as
  //    proxy for geometry heap), eviction amortized O(1).
  //  - >256 KiB: uncached (unchanged).
  private val ParseCacheEntries = 1024
  private val ParseCacheMaxBytes = 256 * 1024
  private val ParseCacheBudgetBytes = 2L * 1024 * 1024
  private val ParseCacheSmallMax = 512
  private val ParseCacheSlots = 4096 // power of two (slot mask)
  private final class ParseCache {
    private val keys = new Array[Array[Byte]](ParseCacheSlots)
    private val vals = new Array[Geometry](ParseCacheSlots)
    private var bytes = 0L
    private val m = new java.util.LinkedHashMap[java.nio.ByteBuffer, Geometry](
      256, 0.75f, true)
    private def slotOf(k: Array[Byte]): Int =
      java.util.Arrays.hashCode(k) & (ParseCacheSlots - 1)
    def get(k: Array[Byte]): Geometry =
      if (k.length <= ParseCacheSmallMax) {
        val s = slotOf(k)
        if (keys(s) != null && java.util.Arrays.equals(keys(s), k)) vals(s) else null
      } else m.get(java.nio.ByteBuffer.wrap(k))
    def put(k: Array[Byte], g: Geometry): Unit =
      if (k.length <= ParseCacheSmallMax) {
        val s = slotOf(k)
        keys(s) = k
        vals(s) = g
      } else {
        val kb = java.nio.ByteBuffer.wrap(k)
        if (m.put(kb, g) == null) bytes += k.length
        while (m.size > ParseCacheEntries || bytes > ParseCacheBudgetBytes) {
          val it = m.entrySet().iterator() // head = least-recently-used
          val e = it.next()
          bytes -= e.getKey.capacity
          it.remove()
        }
      }
  }
  private val parseCacheTL = new ThreadLocal[ParseCache] {
    override def initialValue() = new ParseCache
  }

  /** One EWKB/WKB parse, with the curved-geometry contract: curved types
    * 8-12 (and GeometryCollections that contain them) auto-linearize at 32
    * segments per quadrant — the [[CurvedGeom]] tier-3 rule, so every
    * compute op works on curved input with documented chordal
    * approximation. Serde-preserving ops branch on the raw bytes BEFORE
    * calling read (their isCurved guards), so curves survive where the
    * representation matters. */
  /** Curved bytes → linearized JTS geometry carrying the NORMALIZED curved
    * EWKB as `userData`. Curved-aware consumers (exact length/area/bounds,
    * structure accessors, the fused-chain root serializer) branch on that
    * marker, so curved semantics survive even where the value has already
    * been parsed — the fused and unfused tiers cannot drift. */
  private def linearizeWithSource(bytes: Array[Byte]): Geometry = {
    val (srid, cg) = CurvedGeom.parse(bytes)
    CurvedGeom.linearizedWithSource(cg, srid)
  }

  /** Allocation-free top-level type code peek (ISO thousands folded) for
    * the per-parse curved check — parse0 sits on every compute hot path. */
  private[serde] def topTypeCode(bytes: Array[Byte]): Int = {
    if (bytes.length < 5) return -1
    val raw =
      if (bytes(0) == 1)
        (bytes(1) & 0xff) | ((bytes(2) & 0xff) << 8) |
          ((bytes(3) & 0xff) << 16) | ((bytes(4) & 0xff) << 24)
      else
        ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
          ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val code = raw & 0x0fffffff
    if (code >= 1000) code % 1000 else code
  }

  private def parse0(bytes: Array[Byte]): Geometry = {
    val code = topTypeCode(bytes)
    if (code >= 8 && code <= 12) linearizeWithSource(bytes)
    else
      try readerTL.get().read(bytes)
      catch {
        case e: Exception if code == 7 && CurvedGeom.containsCurved(bytes) =>
          linearizeWithSource(bytes)
      }
  }

  /** EWKB/WKB bytes → JTS Geometry (SRID carried on the geometry). The
    * result is SHARED via a per-thread cache: callers must not mutate it. */
  def read(bytes: Array[Byte]): Geometry = {
    if (bytes.length > ParseCacheMaxBytes) return parse0(bytes)
    val m = parseCacheTL.get()
    var g = m.get(bytes)
    if (g == null) {
      g = parse0(bytes)
      m.put(bytes, g)
    }
    g
  }

  def geometryFactory: GeometryFactory = factory

  // --------------------------------------------------------------- write

  /** True if any coordinate sequence in the geometry carries Z. */
  def hasZ(g: Geometry): Boolean = {
    var z = false
    g.apply(new CoordinateSequenceFilter {
      private var stop = false
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        if (seq.hasZ && !java.lang.Double.isNaN(seq.getZ(i))) { z = true; stop = true }
      }
      override def isDone: Boolean = stop
      override def isGeometryChanged: Boolean = false
    })
    z
  }

  /** True if any coordinate sequence in the geometry carries M. */
  def hasM(g: Geometry): Boolean = {
    var m = false
    g.apply(new CoordinateSequenceFilter {
      private var stop = false
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        if (seq.hasM && !java.lang.Double.isNaN(seq.getM(i))) { m = true; stop = true }
      }
      override def isDone: Boolean = stop
      override def isGeometryChanged: Boolean = false
    })
    m
  }

  /** (hasZ, hasM) in ONE coordinate pass, early-stopping when both are
    * found — write() sits on every serialization hot path and separate
    * hasZ/hasM calls walked large geometries twice. */
  private def zmFlags(g: Geometry): (Boolean, Boolean) = {
    var z = false; var m = false
    g.apply(new CoordinateSequenceFilter {
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        if (!z && seq.hasZ && !java.lang.Double.isNaN(seq.getZ(i))) z = true
        if (!m && seq.hasM && !java.lang.Double.isNaN(seq.getM(i))) m = true
      }
      override def isDone: Boolean = z && m
      override def isGeometryChanged: Boolean = false
    })
    (z, m)
  }

  /** JTS Geometry → EWKB bytes (little-endian, SRID always included at the
    * top level, Z/M flags from actual coordinate content). */
  def write(g: Geometry): Array[Byte] = {
    val out = new LEOut(64)
    val (z, m) = zmFlags(g)
    writeGeometry(out, g, g.getSRID, topLevel = true, z, m)
    out.toByteArray
  }

  private def typeCodeOf(g: Geometry): Int = g match {
    case _: Point              => 1
    case _: LinearRing         => 2 // serialized as LineString
    case _: LineString         => 2
    case _: Polygon            => 3
    case _: MultiPoint         => 4
    case _: MultiLineString    => 5
    case _: MultiPolygon       => 6
    case _: GeometryCollection => 7
    case other => throw new IllegalArgumentException(
      s"unsupported geometry type: ${other.getGeometryType}")
  }

  private def writeGeometry(out: LEOut, g: Geometry, srid: Int,
      topLevel: Boolean, z: Boolean, m: Boolean): Unit = {
    out.byte(1) // little endian
    var t = typeCodeOf(g)
    if (z) t |= FlagZ
    if (m) t |= FlagM
    if (topLevel) t |= FlagSrid
    out.int(t)
    if (topLevel) out.int(srid)
    g match {
      case p: Point =>
        if (p.isEmpty) { // convention: empty point = all-NaN coords
          out.double(Double.NaN); out.double(Double.NaN)
          if (z) out.double(Double.NaN)
          if (m) out.double(Double.NaN)
        } else writeCoords(out, p.getCoordinateSequence, z, m, skipCount = true)
      case l: LineString =>
        writeCoords(out, l.getCoordinateSequence, z, m, skipCount = false)
      case poly: Polygon =>
        if (poly.isEmpty) out.int(0)
        else {
          out.int(1 + poly.getNumInteriorRing)
          writeCoords(out, poly.getExteriorRing.getCoordinateSequence, z, m, skipCount = false)
          var i = 0
          while (i < poly.getNumInteriorRing) {
            writeCoords(out, poly.getInteriorRingN(i).getCoordinateSequence, z, m, skipCount = false)
            i += 1
          }
        }
      case coll: GeometryCollection =>
        out.int(coll.getNumGeometries)
        var i = 0
        while (i < coll.getNumGeometries) {
          writeGeometry(out, coll.getGeometryN(i), 0, topLevel = false, z, m)
          i += 1
        }
      case _ => ()
    }
  }

  private def writeCoords(out: LEOut, seq: CoordinateSequence,
      z: Boolean, m: Boolean, skipCount: Boolean): Unit = {
    val n = seq.size()
    if (!skipCount) out.int(n)
    val seqZ = seq.hasZ
    val seqM = seq.hasM
    var i = 0
    while (i < n) {
      out.double(seq.getX(i))
      out.double(seq.getY(i))
      if (z) out.double(if (seqZ) seq.getZ(i) else Double.NaN)
      if (m) out.double(if (seqM) seq.getM(i) else Double.NaN)
      i += 1
    }
  }

  /** Minimal growable little-endian byte sink. */
  private final class LEOut(initial: Int) {
    private var buf = new Array[Byte](initial)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        // overflow-checked doubling: past 2^30 the naive cap *= 2 wraps
        // negative and then sticks at 0 — an infinite loop on >1 GiB
        // geometries instead of a clean failure
        val needed = len.toLong + n
        require(needed <= Int.MaxValue - 8,
          s"EWKB: geometry serialization exceeds ${Int.MaxValue - 8} bytes")
        var cap = buf.length.toLong * 2
        while (cap < needed) cap *= 2
        buf = java.util.Arrays.copyOf(buf,
          math.min(cap, (Int.MaxValue - 8).toLong).toInt)
      }
    def byte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def int(v: Int): Unit = {
      ensure(4)
      buf(len) = v.toByte; buf(len + 1) = (v >>> 8).toByte
      buf(len + 2) = (v >>> 16).toByte; buf(len + 3) = (v >>> 24).toByte
      len += 4
    }
    def double(d: Double): Unit = {
      ensure(8)
      val v = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { buf(len + i) = (v >>> (8 * i)).toByte; i += 1 }
      len += 8
    }
    def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }
}
