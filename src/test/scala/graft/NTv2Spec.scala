package graft

import graft.functions.{CrsRegistry, EpsgDb, NTv2}
import org.scalatest.funsuite.AnyFunSuite

/** NTv2 grid-shift seam: codec round trip, bilinear exactness on an
  * analytically-known shift surface, sub-grid refinement, and the
  * `st_to_srid` datum-hop integration (grid preferred inside coverage,
  * Helmert outside, inverse converges). The fixture grids are
  * hand-authored against the published NTv2 layout — no agency grids
  * ship with the library; this seam exists for users who have them. */
class NTv2Spec extends AnyFunSuite {

  /** One sub-grid over lat 40..42N, lon 100..98W (west-positive seconds
    * 352800..360000 east→west... E_LONG = 352800 (98W), W_LONG = 360000
    * (100W)), 0.5° cells, with a shift field BILINEAR in the node grid:
    * latShift = 1 + 0.1·r + 0.2·c, lonShiftWest = 2 + 0.05·r − 0.1·c. */
  private def fixture(latInc: Double = 1800.0, lonInc: Double = 1800.0,
      name: String = "MAIN", parent: String = "NONE",
      sLat: Double = 144000.0, nLat: Double = 151200.0,
      eLong: Double = 352800.0, wLong: Double = 360000.0): NTv2.SubGrid = {
    val nCols = math.round((wLong - eLong) / lonInc).toInt + 1
    val nRows = math.round((nLat - sLat) / latInc).toInt + 1
    val lat = new Array[Float](nRows * nCols)
    val lon = new Array[Float](nRows * nCols)
    for (r <- 0 until nRows; c <- 0 until nCols) {
      lat(r * nCols + c) = (1.0 + 0.1 * r * (latInc / 1800.0) +
        0.2 * c * (lonInc / 1800.0)).toFloat
      lon(r * nCols + c) = (2.0 + 0.05 * r * (latInc / 1800.0) -
        0.1 * c * (lonInc / 1800.0)).toFloat
    }
    NTv2.SubGrid(name, parent, sLat, nLat, eLong, wLong, latInc, lonInc, lat, lon)
  }

  /** The fixture's analytic field at (lonDeg, latDeg), in seconds. */
  private def analytic(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val r = (latDeg * 3600.0 - 144000.0) / 1800.0
    val c = (-lonDeg * 3600.0 - 352800.0) / 1800.0
    (1.0 + 0.1 * r + 0.2 * c, 2.0 + 0.05 * r - 0.1 * c)
  }

  test("codec round trip preserves headers and nodes; endianness detected") {
    val g = fixture()
    val bytes = NTv2.write(NTv2.GridFile(Seq(g)))
    val back = NTv2.read(bytes)
    assert(back.subGrids.length === 1)
    val b = back.subGrids.head
    assert(b.sLat === g.sLat && b.nLat === g.nLat &&
      b.eLong === g.eLong && b.wLong === g.wLong)
    assert(b.nRows === g.nRows && b.nCols === g.nCols)
    assert(b.latShifts.toSeq === g.latShifts.toSeq)
    assert(b.lonShifts.toSeq === g.lonShifts.toSeq)
    // big-endian variant of the same file: byte-swap every value field
    // (i32/f64/f32 payloads) and re-read — NUM_OREC drives the detection
    val be = java.nio.ByteBuffer.allocate(bytes.length)
    val leB = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // overview + subgrid headers: 22 records of (8 ascii + 8 value)
    val intRecords = Set(0, 1, 2, 21) // NUM_OREC, NUM_SREC, NUM_FILE, GS_COUNT
    val strRecords = Set(3, 4, 5, 6, 11, 12, 13, 14) // GS_TYPE..SYSTEM_T, SUB..UPDATED
    for (i <- 0 until 22) {
      val off = i * 16
      be.position(off)
      be.put(bytes, off, 8)
      if (strRecords(i)) be.put(bytes, off + 8, 8)
      else if (intRecords(i)) {
        be.order(java.nio.ByteOrder.BIG_ENDIAN).putInt(leB.getInt(off + 8))
        be.putInt(0)
      } else
        be.order(java.nio.ByteOrder.BIG_ENDIAN).putDouble(leB.getDouble(off + 8))
    }
    var off = 22 * 16
    while (off < bytes.length) {
      be.position(off).asInstanceOf[java.nio.ByteBuffer]
      for (j <- 0 until 4)
        be.order(java.nio.ByteOrder.BIG_ENDIAN).putFloat(leB.getFloat(off + 4 * j))
      off += 16
    }
    val beBack = NTv2.read(be.array())
    assert(beBack.subGrids.head.latShifts.toSeq === g.latShifts.toSeq)
    assert(beBack.subGrids.head.lonShifts.toSeq === g.lonShifts.toSeq)
  }

  test("bilinear interpolation is exact on the bilinear fixture field") {
    val file = NTv2.GridFile(Seq(fixture()))
    // arbitrary interior points (not on nodes)
    for ((lon, lat) <- Seq((-98.3, 40.21), (-99.71, 41.9), (-98.999, 40.001))) {
      val Some((dLat, dLon)) = file.shift(lon, lat)
      val (aLat, aLonW) = analytic(lon, lat)
      assert(math.abs(dLat * 3600.0 - aLat) < 1e-4,
        s"latShift at ($lon,$lat): ${dLat * 3600} vs $aLat")
      // east-positive degrees = −west seconds / 3600
      assert(math.abs(-dLon * 3600.0 - aLonW) < 1e-4,
        s"lonShift at ($lon,$lat): ${-dLon * 3600} vs $aLonW")
    }
    // outside coverage → None
    assert(file.shift(-97.0, 41.0).isEmpty)
    assert(file.shift(-99.0, 43.5).isEmpty)
  }

  test("finest covering sub-grid wins (child refines parent)") {
    // child covers the eastern half at 4x density with a DIFFERENT
    // constant field — a point in the child must read the child
    val parent = fixture()
    val nCols = 5; val nRows = 5
    val childLat = Array.fill((nCols + 1) * (nRows + 1))(7.5f)
    val childLon = Array.fill((nCols + 1) * (nRows + 1))(-3.25f)
    val child = NTv2.SubGrid("CHILD", "MAIN",
      sLat = 144000.0, nLat = 146250.0, eLong = 352800.0, wLong = 355050.0,
      latInc = 450.0, lonInc = 450.0, childLat, childLon)
    val file = NTv2.GridFile(Seq(parent, child))
    val Some((dLat, dLon)) = file.shift(-98.2, 40.2) // inside child
    assert(math.abs(dLat * 3600.0 - 7.5) < 1e-6)
    assert(math.abs(-dLon * 3600.0 - (-3.25)) < 1e-6)
    val Some((pLat, _)) = file.shift(-99.5, 41.5) // parent only
    val (aLat, _) = analytic(-99.5, 41.5)
    assert(math.abs(pLat * 3600.0 - aLat) < 1e-4)
  }

  test("st_to_srid datum hop prefers the registered grid inside coverage") {
    val gsb = NTv2.write(NTv2.GridFile(Seq(fixture())))
    try {
      CrsRegistry.registerGridShift("NAD27", gsb)
      // inside coverage: NAD27 geographic (4267) → WGS84 applies the
      // analytic field, NOT the Helmert
      val (lon0, lat0) = (-98.5, 40.5)
      val (lonW, latW) = EpsgDb.toWgs84(lon0, lat0, 4267)
      val (aLatSec, aLonWSec) = analytic(lon0, lat0)
      assert(math.abs(latW - (lat0 + aLatSec / 3600.0)) < 2e-7,
        s"grid lat shift not applied: $latW")
      assert(math.abs(lonW - (lon0 - aLonWSec / 3600.0)) < 2e-7,
        s"grid lon shift not applied: $lonW")
      // inverse round trip through the fixed-point iteration
      val (lonB, latB) = EpsgDb.fromWgs84(lonW, latW, 4267)
      assert(math.abs(lonB - lon0) < 1e-9 && math.abs(latB - lat0) < 1e-9,
        s"grid round trip: ($lonB, $latB)")
      // outside coverage: Helmert fallback — must match the unregistered
      // transform exactly
      CrsRegistry.unregisterGridShift("NAD27")
      val helmert = EpsgDb.toWgs84(-80.0, 35.0, 4267)
      CrsRegistry.registerGridShift("NAD27", gsb)
      assert(EpsgDb.toWgs84(-80.0, 35.0, 4267) === helmert)
      // a projected NAD27 CRS rides the same hop: UTM 14N covers 102..96W
      val (e1, n1) = EpsgDb.fromWgs84(lonW, latW, 26714)
      val (lonR, latR) = EpsgDb.toWgs84(e1, n1, 26714)
      assert(math.abs(lonR - lonW) < 1e-8 && math.abs(latR - latW) < 1e-8)
    } finally CrsRegistry.unregisterGridShift("NAD27")
  }

  test("edge band: forward and inverse pick the SAME path near coverage boundary") {
    // review r9: with an EASTWARD shift at the east edge, a source point
    // just inside coverage lands at a WGS84 position just OUTSIDE it —
    // the inverse must still take the grid (margin-tolerant iteration,
    // strict decision at the converged source estimate), or round trips
    // in the edge band silently degrade to the grid-vs-Helmert gap.
    val nCols = 5; val nRows = 5
    val lat = Array.fill(nRows * nCols)(0.5f)
    val lon = Array.fill(nRows * nCols)(-2.0f) // NEGATIVE west = eastward
    val g = NTv2.SubGrid("EDGE", "NONE", 144000.0, 151200.0, 352800.0, 360000.0,
      1800.0, 1800.0, lat, lon)
    val gsb = NTv2.write(NTv2.GridFile(Seq(g)))
    try {
      CrsRegistry.registerGridShift("NAD27", gsb)
      // source at the exact east edge: −98.0 (lonW = 352800)
      val (lon0, lat0) = (-98.0, 41.0)
      val (lonW, latW) = EpsgDb.toWgs84(lon0, lat0, 4267)
      assert(lonW > -98.0, "fixture failed to push the image outside coverage")
      val (lonB, latB) = EpsgDb.fromWgs84(lonW, latW, 4267)
      assert(math.abs(lonB - lon0) < 1e-9 && math.abs(latB - lat0) < 1e-9,
        s"edge-band round trip broke: ($lonB, $latB)")
      // a WGS84 point whose source pre-image is OUTSIDE coverage keeps
      // the Helmert on both legs (strict reject at the converged source)
      val farOut = EpsgDb.fromWgs84(-97.5, 41.0, 4267)
      CrsRegistry.unregisterGridShift("NAD27")
      assert(farOut === EpsgDb.fromWgs84(-97.5, 41.0, 4267))
    } finally CrsRegistry.unregisterGridShift("NAD27")
  }

  test("cluster seam: grids load lazily from the spark.graft.crs.gridshift conf") {
    // executors never see driver-side registerGridShift calls — the conf
    // key points at a .gsb on the shared filesystem and each JVM loads it
    // on first datum hop, like the WKT conf mechanism
    TestSpark.spark // SparkEnv exists only once a session is up
    val gsb = NTv2.write(NTv2.GridFile(Seq(fixture())))
    val f = java.nio.file.Files.createTempFile("graft_conf_grid", ".gsb")
    java.nio.file.Files.write(f, gsb)
    val conf = org.apache.spark.SparkEnv.get.conf
    try {
      CrsRegistry.unregisterGridShift("NAD27")
      conf.set(CrsRegistry.GridConfKey, s"NAD27=${f.toString}")
      CrsRegistry.reloadGridConfForTest()
      val (lon0, lat0) = (-98.5, 40.5)
      val (lonW, latW) = EpsgDb.toWgs84(lon0, lat0, 4267)
      val (aLatSec, _) = analytic(lon0, lat0)
      assert(math.abs(latW - (lat0 + aLatSec / 3600.0)) < 2e-7,
        s"conf-loaded grid not applied: $latW")
    } finally {
      conf.remove(CrsRegistry.GridConfKey)
      CrsRegistry.unregisterGridShift("NAD27")
      CrsRegistry.reloadGridConfForTest()
      java.nio.file.Files.deleteIfExists(f)
    }
  }

  test("registerGridShift rejects unknown and coincident datums") {
    val gsb = NTv2.write(NTv2.GridFile(Seq(fixture())))
    assertThrows[IllegalArgumentException] {
      CrsRegistry.registerGridShift("NOT_A_DATUM", gsb)
    }
    assertThrows[IllegalArgumentException] {
      CrsRegistry.registerGridShift("WGS84", gsb) // coincident: nothing to shift
    }
  }

  test("degenerate 1-row / 1-column sub-grids are rejected at parse time") {
    // nLat == sLat → nRows = 1: bilinear interpolation would clamp the
    // base row to -1 and index out of bounds on any covered point
    val oneRow = fixture(nLat = 144000.0) // sLat == nLat
    val oneCol = fixture(wLong = 352800.0) // eLong == wLong
    for (g <- Seq(oneRow, oneCol)) {
      val bytes = NTv2.write(NTv2.GridFile(Seq(g)))
      val e = intercept[IllegalArgumentException] { NTv2.read(bytes) }
      assert(e.getMessage.contains("degenerate"), e.getMessage)
    }
  }
}
