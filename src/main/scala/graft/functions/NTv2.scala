package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** NTv2 grid-shift file (.gsb) codec + bilinear evaluator.
  *
  * The reference gets grid-based datum shifts (NADCON/NTv2) wherever proj
  * ships the grids; no grids can ship offline, so this is the SEAM the
  * VERDICT asked for: users register a .gsb they obtained themselves
  * ([[CrsRegistry.registerGridShift]]) and `st_to_srid` datum hops then
  * prefer the grid over the single-Helmert fallback wherever the grid
  * covers. Format per the published NTv2 specification (Natural
  * Resources Canada; the GDAL/proj implementations follow the same
  * layout):
  *
  *  - 11 overview records of 16 bytes (8-byte ASCII name + 8-byte
  *    value): NUM_OREC (i32+pad), NUM_SREC, NUM_FILE, GS_TYPE (only
  *    "SECONDS" supported), VERSION, SYSTEM_F/T, MAJOR/MINOR_F/T (f64).
  *  - Per sub-grid, 11 header records: SUB_NAME, PARENT, CREATED,
  *    UPDATED, S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC (f64,
  *    arc-seconds; LONGITUDES POSITIVE WEST), GS_COUNT (i32+pad).
  *  - GS_COUNT nodes of 4×f32: lat shift, lon shift (both arc-seconds,
  *    lon positive west), lat/lon accuracy. Row-major from S_LAT
  *    northward; within a row from E_LONG toward W_LONG (increasing
  *    west-positive longitude).
  *
  * Endianness is auto-detected from NUM_OREC (= 11 in the file's own
  * byte order). Shifts transform SOURCE datum → TARGET datum (for the
  * registered use: source = the CRS datum, target = WGS84-class). */
object NTv2 {

  final case class SubGrid(name: String, parent: String,
      sLat: Double, nLat: Double, eLong: Double, wLong: Double,
      latInc: Double, lonInc: Double,
      // flat row-major (south→north, east→west in west-positive lon):
      // per node (latShiftSec, lonShiftSecWestPositive)
      latShifts: Array[Float], lonShifts: Array[Float]) {
    val nCols: Int = math.round((wLong - eLong) / lonInc).toInt + 1
    val nRows: Int = math.round((nLat - sLat) / latInc).toInt + 1

    /** Point (lonDeg east-positive, latDeg) covered by this grid?
      * `marginSec` loosens the test by that many arc-seconds — the
      * inverse transform seeds at the TARGET position, which can sit a
      * shift-magnitude outside the source-frame coverage; interpolation
      * clamps to the edge cell there (bounded extrapolation), and the
      * final accept/reject is strict. */
    def covers(lonDeg: Double, latDeg: Double, marginSec: Double = 0.0): Boolean = {
      val latSec = latDeg * 3600.0
      val lonWSec = -lonDeg * 3600.0
      latSec >= sLat - 1e-9 - marginSec && latSec <= nLat + 1e-9 + marginSec &&
        lonWSec >= eLong - 1e-9 - marginSec && lonWSec <= wLong + 1e-9 + marginSec
    }

    /** Bilinear (latShiftSec, lonShiftSecWest) at an interior point. */
    def interpolate(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val latSec = latDeg * 3600.0
      val lonWSec = -lonDeg * 3600.0
      val fr = (latSec - sLat) / latInc
      val fc = (lonWSec - eLong) / lonInc
      val r0 = math.min(math.max(math.floor(fr).toInt, 0), nRows - 2)
      val c0 = math.min(math.max(math.floor(fc).toInt, 0), nCols - 2)
      // margin-tolerant callers can land slightly outside the grid:
      // constant edge extension (clamp the cell fractions) beats linear
      // extrapolation blowing up on fine grids
      val dr = math.min(math.max(fr - r0, 0.0), 1.0)
      val dc = math.min(math.max(fc - c0, 0.0), 1.0)
      def at(arr: Array[Float], r: Int, c: Int): Double = arr(r * nCols + c)
      def bilin(arr: Array[Float]): Double =
        at(arr, r0, c0) * (1 - dr) * (1 - dc) +
          at(arr, r0, c0 + 1) * (1 - dr) * dc +
          at(arr, r0 + 1, c0) * dr * (1 - dc) +
          at(arr, r0 + 1, c0 + 1) * dr * dc
      (bilin(latShifts), bilin(lonShifts))
    }
  }

  final case class GridFile(subGrids: Seq[SubGrid]) {
    // datum hops call this per ROW: a plain while over an array, no
    // filter/minBy allocation (agency files carry 100+ sub-grids)
    private val gridsArr: Array[SubGrid] = subGrids.toArray

    /** Finest covering sub-grid (children refine parents — proj picks the
      * densest too); None when the point is outside every grid. */
    def gridFor(lonDeg: Double, latDeg: Double,
        marginSec: Double = 0.0): Option[SubGrid] = {
      var best: SubGrid = null
      var bestArea = Double.MaxValue
      var i = 0
      while (i < gridsArr.length) {
        val g = gridsArr(i)
        if (g.covers(lonDeg, latDeg, marginSec)) {
          val area = g.latInc * g.lonInc
          if (area < bestArea) { best = g; bestArea = area }
        }
        i += 1
      }
      Option(best)
    }

    /** (dLatDeg, dLonDegEastPositive) of the SOURCE→TARGET datum shift at
      * the source-datum position; None outside coverage (loosened by
      * `marginSec` — interpolation clamps to the edge cell there). */
    def shift(lonDeg: Double, latDeg: Double,
        marginSec: Double = 0.0): Option[(Double, Double)] =
      gridFor(lonDeg, latDeg, marginSec).map { g =>
        val (dLatSec, dLonWSec) = g.interpolate(lonDeg, latDeg)
        // west-positive seconds → east-positive degrees is a sign flip
        (dLatSec / 3600.0, -dLonWSec / 3600.0)
      }
  }

  def read(bytes: Array[Byte]): GridFile = {
    require(bytes.length >= 11 * 16, "ntv2: truncated overview header")
    // endianness probe: NUM_OREC's i32 value is 11 in the file's order
    val le = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == 11
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(bytes).order(order)
    require(ByteBuffer.wrap(bytes, 8, 4).order(order).getInt == 11,
      "ntv2: bad NUM_OREC (not an NTv2 file?)")
    def name(off: Int): String =
      new String(bytes, off, 8, java.nio.charset.StandardCharsets.US_ASCII).trim
    def f64(off: Int): Double = bb.getDouble(off + 8)
    def i32(off: Int): Int = bb.getInt(off + 8)
    def str(off: Int): String =
      new String(bytes, off + 8, 8, java.nio.charset.StandardCharsets.US_ASCII).trim

    var off = 0
    var numFiles = 0
    var gsType = ""
    for (_ <- 0 until 11) {
      name(off) match {
        case "NUM_FILE" => numFiles = i32(off)
        case "GS_TYPE" => gsType = str(off)
        case _ => ()
      }
      off += 16
    }
    require(gsType == "SECONDS",
      s"ntv2: only GS_TYPE SECONDS is supported (got '$gsType')")
    require(numFiles >= 1, s"ntv2: NUM_FILE = $numFiles")

    val grids = (0 until numFiles).map { _ =>
      var subName = ""; var parent = ""
      var sLat = 0.0; var nLat = 0.0; var eLong = 0.0; var wLong = 0.0
      var latInc = 0.0; var lonInc = 0.0; var count = 0
      for (_ <- 0 until 11) {
        name(off) match {
          case "SUB_NAME" => subName = str(off)
          case "PARENT" => parent = str(off)
          case "S_LAT" => sLat = f64(off)
          case "N_LAT" => nLat = f64(off)
          case "E_LONG" => eLong = f64(off)
          case "W_LONG" => wLong = f64(off)
          case "LAT_INC" => latInc = f64(off)
          case "LONG_INC" => lonInc = f64(off)
          case "GS_COUNT" => count = i32(off)
          case _ => ()
        }
        off += 16
      }
      require(latInc > 0 && lonInc > 0, s"ntv2: $subName: non-positive increments")
      val nCols = math.round((wLong - eLong) / lonInc).toInt + 1
      val nRows = math.round((nLat - sLat) / latInc).toInt + 1
      // a 1-row or 1-column grid (nLat==sLat or wLong==eLong) can't be
      // bilinearly interpolated: interpolate() clamps the base node to
      // nRows-2 / nCols-2 = -1 and would index out of bounds
      require(nRows >= 2 && nCols >= 2,
        s"ntv2: $subName: degenerate grid ($nRows rows x $nCols cols); " +
          "bilinear interpolation needs at least a 2x2 node field")
      require(count == nCols * nRows,
        s"ntv2: $subName: GS_COUNT $count != $nRows rows x $nCols cols")
      val lat = new Array[Float](count)
      val lon = new Array[Float](count)
      var i = 0
      while (i < count) {
        lat(i) = bb.getFloat(off)
        lon(i) = bb.getFloat(off + 4)
        // 8..16: accuracies, not used
        off += 16
        i += 1
      }
      SubGrid(subName, parent, sLat, nLat, eLong, wLong, latInc, lonInc, lat, lon)
    }
    GridFile(grids)
  }

  /** Serialize a [[GridFile]] (little-endian). Exists so users can bake
    * programmatic correction fields and so the specs can pin the codec
    * against analytically-known shift surfaces. */
  def write(file: GridFile, systemF: String = "SOURCE",
      systemT: String = "TARGET"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val w = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    def rec(n: String, fill: ByteBuffer => Unit): Unit = {
      w.clear()
      w.put(String.format("%-8s", n).getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 8)
      fill(w)
      while (w.position() < 16) w.put(0.toByte)
      out.write(w.array(), 0, 16)
    }
    def recS(n: String, v: String): Unit = rec(n, _.put(
      String.format("%-8s", v).getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 8))
    def recI(n: String, v: Int): Unit = rec(n, _.putInt(v))
    def recD(n: String, v: Double): Unit = rec(n, _.putDouble(v))
    recI("NUM_OREC", 11)
    recI("NUM_SREC", 11)
    recI("NUM_FILE", file.subGrids.length)
    recS("GS_TYPE", "SECONDS")
    recS("VERSION", "NTv2.0")
    recS("SYSTEM_F", systemF)
    recS("SYSTEM_T", systemT)
    recD("MAJOR_F", 6378137.0)
    recD("MINOR_F", 6356752.314)
    recD("MAJOR_T", 6378137.0)
    recD("MINOR_T", 6356752.314)
    file.subGrids.foreach { g =>
      recS("SUB_NAME", g.name)
      recS("PARENT", if (g.parent.isEmpty) "NONE" else g.parent)
      recS("CREATED", "00000000")
      recS("UPDATED", "00000000")
      recD("S_LAT", g.sLat)
      recD("N_LAT", g.nLat)
      recD("E_LONG", g.eLong)
      recD("W_LONG", g.wLong)
      recD("LAT_INC", g.latInc)
      recD("LONG_INC", g.lonInc)
      recI("GS_COUNT", g.latShifts.length)
      val nb = ByteBuffer.allocate(16 * g.latShifts.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < g.latShifts.length) {
        nb.putFloat(g.latShifts(i)); nb.putFloat(g.lonShifts(i))
        nb.putFloat(0f); nb.putFloat(0f)
        i += 1
      }
      out.write(nb.array())
    }
    out.toByteArray
  }
}
