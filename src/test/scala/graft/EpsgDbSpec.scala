package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EpsgDb

/** Embedded EPSG parameter table: every registered code must round-trip
  * WGS84 → code → WGS84 on an in-domain point. Shift-free codes hold
  * 1e-8°; datum-shifted codes are capped by the h=0-convention residual
  * (~1-2e-8°, see geo_crs3's scaladoc) and get 1e-7°. */
class EpsgDbSpec extends AnyFunSuite {

  /** A representative in-domain (lon, lat) for each projection. */
  private def domainPoint(crs: EpsgDb.Crs): (Double, Double) = crs.proj match {
    case EpsgDb.Geographic(_) => (10.0, 50.0)
    case EpsgDb.TMerc(_, lat0, lon0, _, _, fn) =>
      val lat =
        if (lat0 != 0) lat0 + 1.0
        else if (fn >= 5e6) -35.0 // southern-hemisphere grid (MGA, NZTM)
        else 48.0
      // normalize to (−180, 180] for zones whose central meridian sits
      // past the antimeridian (Pulkovo GK zone 31 at 183°E): the WGS84
      // hub reports longitudes normalized
      val lon = {
        val d = (lon0 + 1.0) % 360.0
        if (d > 180.0) d - 360.0 else if (d <= -180.0) d + 360.0 else d
      }
      (lon, lat)
    case EpsgDb.Lcc2SP(_, lat1, lat2, _, lon0, _, _) =>
      (lon0 + 1.0, (lat1 + lat2) / 2)
    case EpsgDb.Lcc1SP(_, lat0, lon0, _, _, _) =>
      (lon0 + 1.0, lat0 + 0.5)
    case EpsgDb.AlbersConic(_, lat1, lat2, _, lon0, _, _) =>
      (lon0 + 1.0, (lat1 + lat2) / 2)
    case EpsgDb.PolarStereo(_, north, lon0, _, _, _, _) =>
      (lon0 + 30.0, if (north) 75.0 else -75.0)
    case EpsgDb.Mercator1SP(_, lon0, _, _, _) => (lon0 + 10.0, 10.0)
    case EpsgDb.Laea(_, lat0, lon0, _, _) =>
      if (lat0 >= 89.0) (lon0 + 35.0, 72.0)          // polar north aspect
      else if (lat0 <= -89.0) (lon0 + 35.0, -72.0)   // polar south aspect
      else (lon0 + 5.0, lat0 + 3.0)
    case EpsgDb.Cea(_, _, lon0, _, _) => (lon0 + 40.0, 23.0)
    case EpsgDb.Eqc(_, _, _, lon0, _, _) => (lon0 + 40.0, 23.0)
    case EpsgDb.ObliqueStereo(_, lat0, lon0, _, _, _) => (lon0 + 1.0, lat0 + 0.75)
    case EpsgDb.SwissOblique(_, lat0, lon0, _, _, _) => (lon0 + 1.5, lat0 + 0.5)
    case EpsgDb.Krovak(_, _, _, _, _, _) => (15.5, 49.75) // Czech interior
    case EpsgDb.HotineOblique(_, latC, lonC, _, _, _, _, _, _) =>
      (lonC + 0.8, latC + 0.6)
    case EpsgDb.Polyconic(_, lat0, lon0, _, _) =>
      (lon0 + 3.0, if (lat0 == 0.0) -10.25 else lat0 + 2.0)
    case EpsgDb.Nzmg(_, _) => (174.75, -41.25) // NZ interior
    case EpsgDb.UnitScaled(inner, _) => domainPoint(crs.copy(proj = inner))
  }

  test("every table code round-trips through the WGS84 hub") {
    assert(EpsgDb.table.size >= 90, s"table shrank: ${EpsgDb.table.size}")
    EpsgDb.table.foreach { case (code, crs) =>
      val (lon, lat) = domainPoint(crs)
      val (x, y) = EpsgDb.fromWgs84(lon, lat, code)
      assert(!x.isNaN && !y.isNaN, s"EPSG:$code produced NaN")
      val (lon2, lat2) = EpsgDb.toWgs84(x, y, code)
      val tol = if (crs.shift.isDefined) 1e-7 else 1e-8
      assert(math.abs(lon2 - lon) < tol && math.abs(lat2 - lat) < tol,
        s"EPSG:$code (${crs.name}): ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("known closed-form anchors") {
    // natural origin of a projected CRS maps to its false origin exactly
    // (pure projection math, no datum hop)
    val bng = EpsgDb.table(27700).proj.forward(-2.0, 49.0)
    assert(math.abs(bng._1 - 400000.0) < 1e-6 && math.abs(bng._2 + 100000.0) < 1e-6)
    val nz = EpsgDb.table(2193).proj.forward(173.0, 0.0)
    assert(math.abs(nz._1 - 1600000.0) < 1e-6 && math.abs(nz._2 - 1e7) < 1e-6)
    // RD New: the Amersfoort origin maps to (155000, 463000)
    val rd = EpsgDb.table(28992).proj.forward(5.38763888888889, 52.15616055555555)
    assert(math.abs(rd._1 - 155000.0) < 1e-6 && math.abs(rd._2 - 463000.0) < 1e-6, rd.toString)
    // LV95: the Bern origin maps to (2600000, 1200000)
    val lv = EpsgDb.table(2056).proj.forward(7.439583333333333, 46.95240555555556)
    assert(math.abs(lv._1 - 2600000.0) < 1e-6 && math.abs(lv._2 - 1200000.0) < 1e-6, lv.toString)
    // Lambert-93: natural origin (3E, 46.5N on GRS80) → (700000, 6600000)
    val l93 = EpsgDb.table(2154).proj.forward(3.0, 46.5)
    assert(math.abs(l93._1 - 700000.0) < 1e-6 && math.abs(l93._2 - 6600000.0) < 1e-6, l93.toString)
    // Conus Albers: (-96, 23) → (0, 0)
    val conus = EpsgDb.table(5070).proj.forward(-96.0, 23.0)
    assert(math.abs(conus._1) < 1e-6 && math.abs(conus._2) < 1e-6, conus.toString)
    // NTF Lambert zone II (LCC-1SP): Paris-meridian natural origin at
    // 46.8N → carto false origin (600000, 2200000)
    val lz2 = EpsgDb.table(27572).proj.forward(2.0 + 20.0 / 60 + 14.025 / 3600, 46.8)
    assert(math.abs(lz2._1 - 600000.0) < 1e-6 && math.abs(lz2._2 - 2200000.0) < 1e-6, lz2.toString)
    // JGD2011 zone IX: (139°50'E, 36N) → (0, 0)
    val jix = EpsgDb.table(6677).proj.forward(139.0 + 50.0 / 60, 36.0)
    assert(math.abs(jix._1) < 1e-6 && math.abs(jix._2) < 1e-6, jix.toString)
    // EOV / Austria Lambert: natural origin → false origin (projection
    // math only; both constructions anchor the origin by design)
    val eov = EpsgDb.table(23700).proj.forward(19.04857177777778, 47.14439372222222)
    assert(math.abs(eov._1 - 650000.0) < 1e-6 && math.abs(eov._2 - 200000.0) < 1e-6, eov.toString)
    val atl = EpsgDb.table(31287).proj.forward(13.0 + 20.0 / 60, 47.5)
    assert(math.abs(atl._1 - 400000.0) < 1e-6 && math.abs(atl._2 - 400000.0) < 1e-6, atl.toString)
    // Krovak: the EPSG method-9819 worked example — 50°12'32.4416"N,
    // 16°50'59.1790"E (Greenwich) on the Bessel/S-JTSK datum → southing
    // X = 1050538.63, westing Y = 568991.00; the East-North variant
    // (5514) negates both. Pure projection math, 1 cm tolerance.
    val kLat = 50.0 + 12.0 / 60 + 32.4416 / 3600
    val kLon = 16.0 + 50.0 / 60 + 59.1790 / 3600
    val kv = EpsgDb.table(5514).proj.forward(kLon, kLat)
    assert(math.abs(kv._1 - (-568991.00)) < 2e-2, kv.toString)
    assert(math.abs(kv._2 - (-1050538.63)) < 2e-2, kv.toString)
    // r9 tranche: natural-origin anchors
    // Poland CS2000 zone 6 (cm 18°E): origin → (6500000, 0)
    val pl6 = EpsgDb.table(2177).proj.forward(18.0, 0.0)
    assert(math.abs(pl6._1 - 6500000.0) < 1e-6 && math.abs(pl6._2) < 1e-6, pl6.toString)
    // Greek Grid: origin (24E, 0) → (500000, 0), projection math only
    val gr = EpsgDb.table(2100).proj.forward(24.0, 0.0)
    assert(math.abs(gr._1 - 500000.0) < 1e-6 && math.abs(gr._2) < 1e-6, gr.toString)
    // Korea Central Belt 2010: (127E, 38N) → (200000, 600000)
    val kc = EpsgDb.table(5186).proj.forward(127.0, 38.0)
    assert(math.abs(kc._1 - 200000.0) < 1e-6 && math.abs(kc._2 - 600000.0) < 1e-6, kc.toString)
    // Gauss-Boaga west: (9E, 0) → (1500000, 0)
    val gb = EpsgDb.table(3003).proj.forward(9.0, 0.0)
    assert(math.abs(gb._1 - 1500000.0) < 1e-6 && math.abs(gb._2) < 1e-6, gb.toString)
    // GA Lambert: (134E, 0) → (0, 0)
    val ga = EpsgDb.table(3112).proj.forward(134.0, 0.0)
    assert(math.abs(ga._1) < 1e-6 && math.abs(ga._2) < 1e-6, ga.toString)
    // EASE-Grid 2.0 Global: the published map half-width at the equator
    // line (x at ±180° = a·k0·π = 17 367 530.45 m, NSIDC grid constant)
    val easeX = EpsgDb.table(6933).proj.forward(180.0, 0.0)._1
    assert(math.abs(easeX - 17367530.45) < 1.0, easeX.toString)
    // EASE-Grid 2.0 North: pole → (0, 0); y is negative due south
    val easeP = EpsgDb.table(6931).proj.forward(37.0, 90.0)
    assert(math.abs(easeP._1) < 1e-6 && math.abs(easeP._2) < 1e-6, easeP.toString)

    // plain NTF Lambert zones = carto zones minus zone·10⁶ northing,
    // same cone (r9): the identity is structural, pin it at a real point
    for ((plain, carto, zone) <- Seq((27561, 27571, 1), (27562, 27572, 2),
        (27563, 27573, 3), (27564, 27574, 4))) {
      val (px, py) = EpsgDb.table(plain).proj.forward(2.5, 46.8)
      val (cx, cy) = EpsgDb.table(carto).proj.forward(2.5, 46.8)
      assert(math.abs(px - cx) < 1e-9 && math.abs((cy - py) - zone * 1e6) < 1e-6,
        s"zone $zone: plain ($px,$py) vs carto ($cx,$cy)")
    }
    // ESRI numeric aliases transform exactly like their EPSG canon
    val pt = { val g = new org.locationtech.jts.geom.GeometryFactory()
      .createPoint(new org.locationtech.jts.geom.Coordinate(2.5, 48.8))
      g.setSRID(4326); g }
    val viaAlias = graft.functions.CrsImpl.toSrid(pt, 102100)
    val viaEpsg = graft.functions.CrsImpl.toSrid(pt, 3857)
    assert(viaAlias.getCoordinate.equals2D(viaEpsg.getCoordinate))
    assert(viaAlias.getSRID === 102100) // caller's code preserved
    assert(graft.functions.CrsImpl.toSrid(viaAlias, 4326).getCoordinate
      .distance(pt.getCoordinate) < 1e-9)

    // US state planes: natural/false origin anchors, metres and the exact
    // published US-survey-foot values (ftUS = 1200/3937 m)
    val txm = EpsgDb.table(32139).proj.forward(-(100.0 + 20.0 / 60), 29.0 + 40.0 / 60)
    assert(math.abs(txm._1 - 700000.0) < 1e-6 && math.abs(txm._2 - 3000000.0) < 1e-6)
    val txf = EpsgDb.table(2277).proj.forward(-(100.0 + 20.0 / 60), 29.0 + 40.0 / 60)
    assert(math.abs(txf._1 - 2296583.333333333) < 1e-6
      && math.abs(txf._2 - 9842500.0) < 1e-6, txf.toString)
    val nyf = EpsgDb.table(2263).proj.forward(-74.0, 40.0 + 10.0 / 60)
    assert(math.abs(nyf._1 - 984250.0) < 1e-6 && math.abs(nyf._2) < 1e-6, nyf.toString)
    val caf = EpsgDb.table(2227).proj.forward(-120.5, 36.5)
    assert(math.abs(caf._1 - 6561666.666666667) < 1e-6
      && math.abs(caf._2 - 1640416.666666667) < 1e-6, caf.toString)
    val flf = EpsgDb.table(2236).proj.forward(-81.0, 24.0 + 20.0 / 60)
    assert(math.abs(flf._1 - 656166.6666666666) < 1e-6 && math.abs(flf._2) < 1e-6)
    // ETRS89 LCCs: false-origin anchors
    val lcceu = EpsgDb.table(3034).proj.forward(10.0, 52.0)
    assert(math.abs(lcceu._1 - 4000000.0) < 1e-6 && math.abs(lcceu._2 - 2800000.0) < 1e-6)
    val be08 = EpsgDb.table(3812).proj.forward(
      4.0 + 21.0 / 60 + 33.177 / 3600, 50.0 + 47.0 / 60 + 52.134 / 3600)
    assert(math.abs(be08._1 - 649328.0) < 1e-6 && math.abs(be08._2 - 665262.0) < 1e-6)
    val pt06 = EpsgDb.table(3763).proj.forward(-8.133108333333334, 39.66825833333333)
    assert(math.abs(pt06._1) < 1e-6 && math.abs(pt06._2) < 1e-6)
    // SIRGAS 2000 UTM 23S == WGS84 UTM 23S (closed-form) to sub-mm
    val (se, sn) = EpsgDb.fromWgs84(-44.5, -22.5, 31983)
    val sg = graft.serde.EWKB.geometryFactory.createPoint(
      new org.locationtech.jts.geom.Coordinate(-44.5, -22.5))
    sg.setSRID(4326)
    val sLegacy = graft.functions.CrsImpl.toSrid(sg, 32723).getCoordinate
    assert(math.abs(se - sLegacy.x) < 1e-3 && math.abs(sn - sLegacy.y) < 1e-3)
    // UTM consistency: ETRS89 UTM 32N == WGS84 UTM 32N to sub-mm
    // (GRS80 vs WGS84 flattenings differ in the 12th digit; the measured
    // northing delta is ~0.1 mm)
    val (e1, n1) = EpsgDb.fromWgs84(9.5, 50.0, 25832)
    val g = graft.serde.EWKB.geometryFactory.createPoint(
      new org.locationtech.jts.geom.Coordinate(9.5, 50.0))
    g.setSRID(4326)
    val viaLegacy = graft.functions.CrsImpl.toSrid(g, 32632).getCoordinate
    assert(math.abs(e1 - viaLegacy.x) < 1e-3, s"$e1 vs ${viaLegacy.x}")
    assert(math.abs(n1 - viaLegacy.y) < 1e-3, s"$n1 vs ${viaLegacy.y}")
    // Pulkovo 1942 / GK zone 7: natural origin (39E, 0N on Krassowsky)
    // → zone-prefixed false easting (7500000, 0); pure projection math
    val gk7 = EpsgDb.table(28407).proj.forward(39.0, 0.0)
    assert(math.abs(gk7._1 - 7500000.0) < 1e-6 && math.abs(gk7._2) < 1e-6, gk7.toString)
    // NAD83 / MTM zone 7: (70°30'W, 0N) → (304800, 0)
    val mtm7 = EpsgDb.table(32187).proj.forward(-70.5, 0.0)
    assert(math.abs(mtm7._1 - 304800.0) < 1e-6 && math.abs(mtm7._2) < 1e-6, mtm7.toString)
    // MGI / Austria M31: natural origin (13°20'E = Ferro 31°, 0N) →
    // (450000, -5000000); GK Central drops the false easting
    val m31 = EpsgDb.table(31285).proj.forward(13.0 + 20.0 / 60, 0.0)
    assert(math.abs(m31._1 - 450000.0) < 1e-6 && math.abs(m31._2 + 5000000.0) < 1e-6, m31.toString)
    val gkC = EpsgDb.table(31255).proj.forward(13.0 + 20.0 / 60, 0.0)
    assert(math.abs(gkC._1) < 1e-6 && math.abs(gkC._2 + 5000000.0) < 1e-6, gkC.toString)
    // geographic CRS on a WGS84-coincident datum is a passthrough
    assert(EpsgDb.fromWgs84(12.25, 47.5, 4258) == ((12.25, 47.5)))
    // datum-shifted geographic CRS moves coordinates by the expected
    // ~100 m (OSGB36 London offset is ~0.001-0.002 degrees)
    val (lo, la) = EpsgDb.fromWgs84(-0.125, 51.5, 4277)
    assert(math.abs(lo + 0.125) > 1e-4 && math.abs(lo + 0.125) < 5e-3)
    assert(math.abs(la - 51.5) > 1e-5 && math.abs(la - 51.5) < 5e-3)
  }

  test("EASE-Grid 2.0 trio: projected patch areas match the ellipsoidal element") {
    // the defining property of an equal-area CRS: the map area of a small
    // dλ×dφ quad equals the ellipsoidal patch area
    // a²(1−e²)cosφ/(1−e²sin²φ)² dλdφ — checked at several latitudes for
    // the cylindrical global grid and both polar LAEA aspects. A wrong k0,
    // series, or polar branch shows up as a systematic ratio offset.
    val a = 6378137.0; val e2 = 0.00669437999014132
    def ellArea(lonDeg: Double, latDeg: Double, d: Double): Double = {
      val phi = math.toRadians(latDeg + d / 2)
      val dl = math.toRadians(d)
      a * a * (1 - e2) * math.cos(phi) /
        math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 2) * dl * dl
    }
    def mapArea(code: Int, lonDeg: Double, latDeg: Double, d: Double): Double = {
      val p = graft.functions.EpsgDb.table(code).proj
      val corners = Seq((lonDeg, latDeg), (lonDeg + d, latDeg),
        (lonDeg + d, latDeg + d), (lonDeg, latDeg + d)).map((p.forward _).tupled)
      math.abs(corners.indices.map { i =>
        val (x1, y1) = corners(i); val (x2, y2) = corners((i + 1) % 4)
        x1 * y2 - x2 * y1
      }.sum / 2)
    }
    val d = 0.05
    for (lat <- Seq(-60.0, -30.0, 0.0, 25.0, 55.0); lon <- Seq(-120.0, 0.0, 95.0)) {
      val r = mapArea(6933, lon, lat, d) / ellArea(lon, lat, d)
      assert(math.abs(r - 1.0) < 1e-5, s"CEA area ratio at ($lon,$lat): $r")
    }
    for (lat <- Seq(45.0, 65.0, 84.0); lon <- Seq(-120.0, 0.0, 95.0)) {
      val rn = mapArea(6931, lon, lat, d) / ellArea(lon, lat, d)
      assert(math.abs(rn - 1.0) < 1e-5, s"LAEA-N area ratio at ($lon,$lat): $rn")
      val rs = mapArea(6932, lon, -lat - d, d) / ellArea(lon, -lat - d, d)
      assert(math.abs(rs - 1.0) < 1e-5, s"LAEA-S area ratio at ($lon,${-lat}): $rs")
    }
  }

  test("NZMG: origin anchor, round trips, conformal scale invariants") {
    val nzmg = EpsgDb.table(27200).proj
    // natural origin (173 E, 41 S) → false origin, exactly
    val o = nzmg.forward(173.0, -41.0)
    assert(math.abs(o._1 - 2510000.0) < 1e-6 && math.abs(o._2 - 6023150.0) < 1e-6,
      o.toString)
    // forward/inverse are exact fp inverses over a grid covering NZ
    for (lon <- 166 to 179; lat <- -47 to -34) {
      val (x, y) = nzmg.forward(lon, lat)
      val (lon2, lat2) = nzmg.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-10 && math.abs(lat2 - lat) < 1e-10,
        s"nzmg rt ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
    // independent checks of the published series (no external library
    // offline, so pin the projection's defining properties):
    // 1. meridian scale == parallel scale everywhere (the complex series
    //    is holomorphic, so this tests that the real series A is the
    //    isometric-latitude expansion — a typo'd coefficient breaks the
    //    equality at its own relative magnitude);
    // 2. both stay within NZMG's published ±0.05% design distortion over
    //    the NZ mainland (tests the overall B-series scaling).
    val ell = EpsgDb.table(27200).proj.ell
    def scales(lon: Double, lat: Double): (Double, Double) = {
      val d = 1e-6 // degrees; ~0.1 m
      val phi = math.toRadians(lat)
      val sin2 = math.sin(phi) * math.sin(phi)
      val w = math.sqrt(1 - ell.e2 * sin2)
      val rMer = ell.a * (1 - ell.e2) / (w * w * w) // meridian radius M
      val rPar = ell.a / w * math.cos(phi) // parallel radius ν cos φ
      val (x0, y0) = nzmg.forward(lon, lat)
      val (x1, y1) = nzmg.forward(lon + d, lat)
      val (x2, y2) = nzmg.forward(lon, lat + d)
      val rad = math.toRadians(d)
      (math.hypot(x2 - x0, y2 - y0) / (rMer * rad),
        math.hypot(x1 - x0, y1 - y0) / (rPar * rad))
    }
    for ((lon, lat) <- Seq((173.0, -41.0), (174.75, -36.85), (170.5, -45.87),
        (168.35, -46.4), (178.0, -38.65), (172.65, -43.5))) {
      val (kNS, kEW) = scales(lon, lat)
      assert(math.abs(kNS / kEW - 1.0) < 2e-5,
        s"anisotropy at ($lon,$lat): kNS=$kNS kEW=$kEW")
      assert(kNS > 0.9994 && kNS < 1.0006, s"scale at ($lon,$lat): $kNS")
    }
    // full CRS round trip through the datum shift
    val (x, y) = EpsgDb.fromWgs84(174.75, -41.25, 27200)
    val (lon2, lat2) = EpsgDb.toWgs84(x, y, 27200)
    assert(math.abs(lon2 - 174.75) < 1e-7 && math.abs(lat2 + 41.25) < 1e-7)
    // NZGD49 geographic: the datum shift moves NZ points by the expected
    // ~190 m (dominant ΔZ=187 m), i.e. a few 1e-3 degrees
    val (lo, la) = EpsgDb.fromWgs84(174.75, -41.25, 4272)
    assert(math.abs(lo - 174.75) > 1e-4 && math.abs(lo - 174.75) < 5e-3)
    assert(math.abs(la + 41.25) > 1e-4 && math.abs(la + 41.25) < 5e-3)
  }

  test("wkt synthesis carries the authority code and projection name") {
    val w = EpsgDb.wkt(27700).get
    assert(w.contains("""AUTHORITY["EPSG","27700"]"""))
    assert(w.contains("Transverse_Mercator"))
    assert(graft.functions.CrsImpl.crsFromCode(31370).exists(_.contains(
      "Lambert_Conformal_Conic_2SP")))
    assert(graft.functions.CrsImpl.crsAuthority(
      graft.functions.CrsImpl.crsFromCode(3995).get) == Some(("EPSG", 3995)))
  }

  test("Hotine Oblique Mercator: the EPSG variant-B worked example") {
    // EPSG Guidance Note 7-2, method 9815 (Timbalai 1948 / RSO Borneo):
    // 5°23'14.1129"N 115°48'19.8196"E → E 679245.73, N 596562.78 (2 cm)
    val lat = 5.0 + 23.0 / 60 + 14.1129 / 3600
    val lon = 115.0 + 48.0 / 60 + 19.8196 / 3600
    val (e, n) = EpsgDb.table(29873).proj.forward(lon, lat)
    assert(math.abs(e - 679245.73) < 2e-2, s"E=$e")
    assert(math.abs(n - 596562.78) < 2e-2, s"N=$n")
    val (lon2, lat2) = EpsgDb.table(29873).proj.inverse(e, n)
    assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    // Alaska zone 1 (variant A): tight round trip along the panhandle
    for ((lo, la) <- Seq((-134.4, 58.3), (-131.7, 55.3), (-135.5, 59.4))) {
      val (x, y) = EpsgDb.table(26931).proj.forward(lo, la)
      val (lo2, la2) = EpsgDb.table(26931).proj.inverse(x, y)
      assert(math.abs(lo2 - lo) < 1e-9 && math.abs(la2 - la) < 1e-9,
        s"AK1 ($lo,$la) -> ($x,$y) -> ($lo2,$la2)")
    }
  }

  test("SPCS83: every foot twin re-expresses its metre grid exactly") {
    // for each UnitScaled state-plane code, the foot coordinates times
    // the unit factor must equal the metre zone's coordinates at machine
    // precision for a spread of in-domain points — a wrong parameter in
    // EITHER twin breaks the identity only if they disagree, so the twin
    // pairs are located by name
    val metersByName = EpsgDb.table.collect {
      case (code, crs) if !crs.proj.isInstanceOf[EpsgDb.UnitScaled] =>
        crs.name -> (code, crs)
    }
    var checked = 0
    EpsgDb.table.foreach {
      case (fCode, fCrs) => fCrs.proj match {
        case EpsgDb.UnitScaled(inner, factor) =>
          val baseName = fCrs.name.stripSuffix(" (ftUS)").stripSuffix(" (ft)")
          val (mCode, mCrs) = metersByName.getOrElse(baseName,
            fail(s"no metre twin for $fCode (${fCrs.name})"))
          val (lon0, lat0) = domainPoint(mCrs)
          for (dLon <- Seq(-0.8, 0.0, 0.9); dLat <- Seq(-0.5, 0.0, 0.6)) {
            val (xm, ym) = EpsgDb.fromWgs84(lon0 + dLon, lat0 + dLat, mCode)
            val (xf, yf) = EpsgDb.fromWgs84(lon0 + dLon, lat0 + dLat, fCode)
            assert(math.abs(xf * factor - xm) < 1e-6 &&
              math.abs(yf * factor - ym) < 1e-6,
              s"twin mismatch $mCode/$fCode at (${lon0 + dLon},${lat0 + dLat})")
          }
          checked += 1
        case _ => ()
      }
    }
    assert(checked >= 75, s"expected the full foot-variant set, got $checked")
  }

  test("SPCS83 LCC zones: unit scale along both standard parallels") {
    // the defining property of the 2SP Lambert cone: distortion is
    // exactly 1 on each standard parallel. Checked numerically (ratio of
    // a small projected arc to the ellipsoidal parallel arc) for every
    // NAD83 state-plane LCC zone — a mis-recalled standard parallel,
    // origin latitude, or false origin would break this or the
    // round-trip/anchor suite
    val a = 6378137.0; val e2 = 0.0066943800229007876 // GRS80
    def parallelScale(crs: EpsgDb.Crs, latDeg: Double, lonDeg: Double): Double = {
      val dLon = 1e-4
      val (x0, y0) = crs.proj.forward(lonDeg, latDeg)
      val (x1, y1) = crs.proj.forward(lonDeg + dLon, latDeg)
      val phi = math.toRadians(latDeg)
      val rPar = a * math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      math.hypot(x1 - x0, y1 - y0) / (rPar * math.toRadians(dLon))
    }
    var zones = 0
    EpsgDb.table.foreach {
      case (code, crs) if code >= 3088 && crs.name.startsWith("NAD83 /") =>
        crs.proj match {
          case EpsgDb.Lcc2SP(_, latN, latS, _, lon0, _, _) =>
            for (p <- Seq(latN, latS)) {
              val k = parallelScale(crs, p, lon0 + 0.5)
              assert(math.abs(k - 1.0) < 1e-9,
                s"EPSG:$code (${crs.name}): scale $k at parallel $p")
            }
            // and genuinely < 1 between the parallels (cone dips inside)
            val mid = parallelScale(crs, (latN + latS) / 2, lon0 + 0.5)
            assert(mid < 1.0, s"EPSG:$code: k=$mid between parallels")
            zones += 1
          case _ => ()
        }
      case _ => ()
    }
    assert(zones >= 55, s"expected the full LCC state-plane set, got $zones")
  }

  test("Polyconic: Snyder example, true-scale parallels, Brazil round trips") {
    // Snyder (Map Projections — A Working Manual) §18 ellipsoidal
    // numerical example: Clarke 1866, φ0=30°, λ0=−96°, point 40°N 75°W →
    // x = 1 776 774.5 m, y = 1 319 657.8 m
    val snyder = EpsgDb.Polyconic(EpsgDb.table(26703).proj.ell, 30.0, -96.0, 0, 0)
    val (sx, sy) = snyder.forward(-75.0, 40.0)
    assert(math.abs(sx - 1776774.5) < 0.5, s"x=$sx")
    assert(math.abs(sy - 1319657.8) < 0.5, s"y=$sy")
    // the defining property: EVERY parallel is true to scale (the arc
    // along the projected parallel equals the ellipsoidal parallel arc)
    val br = EpsgDb.table(5880).proj
    val a = 6378137.0; val e2 = 0.0066943800229007876
    for (lat <- Seq(-30.0, -15.0, -5.0, 2.0); lon <- Seq(-70.0, -54.0, -40.0)) {
      val dLon = 1e-4
      val (x0, y0) = br.forward(lon, lat)
      val (x1, y1) = br.forward(lon + dLon, lat)
      val phi = math.toRadians(lat)
      val rPar = a * math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val kPar = math.hypot(x1 - x0, y1 - y0) / (rPar * math.toRadians(dLon))
      assert(math.abs(kPar - 1.0) < 1e-9, s"parallel scale at ($lon,$lat): $kPar")
    }
    // central meridian: x = FE exactly, equator maps to FN − M0 = FN
    val (cx, cy) = br.forward(-54.0, 0.0)
    assert(math.abs(cx - 5000000.0) < 1e-6 && math.abs(cy - 10000000.0) < 1e-6)
    // Newton inverse: tight round trips across the Brazilian domain,
    // including the datum-shifted SAD69 twin
    for ((lon, lat) <- Seq((-68.75, -9.75), (-47.9, -15.8), (-43.2, -22.9),
        (-60.0, 2.8), (-35.0, -8.0))) {
      val (x, y) = EpsgDb.fromWgs84(lon, lat, 5880)
      val (lon2, lat2) = EpsgDb.toWgs84(x, y, 5880)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"5880 ($lon,$lat)")
      val (xs, ys) = EpsgDb.fromWgs84(lon, lat, 29101)
      val (lon3, lat3) = EpsgDb.toWgs84(xs, ys, 29101)
      assert(math.abs(lon3 - lon) < 1e-7 && math.abs(lat3 - lat) < 1e-7,
        s"29101 ($lon,$lat)")
      // the datum shift moves the grid by tens of metres, not kilometres
      assert(math.hypot(xs - x, ys - y) > 5 && math.hypot(xs - x, ys - y) < 200,
        s"SAD69 offset ${math.hypot(xs - x, ys - y)}")
    }
  }

  test("NAD27 UTM zones: projection matches WGS84 UTM, datum shift applied") {
    // same TM parameters as the closed-form WGS84 UTM path, on Clarke
    // 1866 + the published mean translation: the pure projection part
    // must agree with the legacy path's formulas to sub-mm when run on
    // the same ellipsoid, and the full transform must move points by the
    // expected tens of metres
    val (lon, lat) = (-87.25, 41.75) // zone 16
    val (x27, y27) = EpsgDb.fromWgs84(lon, lat, 26716)
    val g = graft.serde.EWKB.geometryFactory.createPoint(
      new org.locationtech.jts.geom.Coordinate(lon, lat))
    g.setSRID(4326)
    val w84 = graft.functions.CrsImpl.toSrid(g, 32616).getCoordinate
    val d = math.hypot(x27 - w84.x, y27 - w84.y)
    assert(d > 10 && d < 300, s"NAD27-WGS84 separation $d m")
    val (lon2, lat2) = EpsgDb.toWgs84(x27, y27, 26716)
    assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
  }

  test("SPCS83 TM zones: central-meridian scale equals the published k0") {
    val a = 6378137.0; val e2 = 0.0066943800229007876
    var zones = 0
    EpsgDb.table.foreach {
      case (code, crs) if code >= 26929 && crs.name.startsWith("NAD83 /") =>
        crs.proj match {
          case EpsgDb.TMerc(_, lat0, lon0, k0, _, _) if lat0 > 15 =>
            // meridian scale at a point ON the central meridian: ratio of
            // projected northing delta to the ellipsoidal meridian arc
            val lat = lat0 + 1.0
            val dLat = 1e-4
            val (_, y0) = crs.proj.forward(lon0, lat)
            val (_, y1) = crs.proj.forward(lon0, lat + dLat)
            val phi = math.toRadians(lat + dLat / 2)
            val m = a * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
            val k = (y1 - y0) / (m * math.toRadians(dLat))
            assert(math.abs(k - k0) < 1e-9,
              s"EPSG:$code (${crs.name}): meridian scale $k != k0 $k0")
            zones += 1
          case _ => ()
        }
      case _ => ()
    }
    assert(zones >= 50, s"expected the full TM state-plane set, got $zones")
  }

  test("r10: Japan CS frames — JGD2000 == JGD2011, Tokyo offset by the datum shift") {
    for (i <- 0 until 19) {
      val jgd2000 = EpsgDb.table(2443 + i)
      val jgd2011 = EpsgDb.table(6669 + i)
      // the two JGD realizations share the projection (cm-level datum
      // difference is below this engine's tolerance): identical coords
      assert(jgd2000.proj == jgd2011.proj, s"zone ${i + 1} projections differ")
      // zone origin maps to (0, 0) — the GSI definition has no false origin
      val (lat0, lon0) = jgd2000.proj match {
        case EpsgDb.TMerc(_, la, lo, k0, fe, fn) =>
          assert(k0 == 0.9999 && fe == 0 && fn == 0); (la, lo)
        case other => fail(s"zone ${i + 1} not TM: $other")
      }
      val o = jgd2000.proj.forward(lon0, lat0)
      assert(math.abs(o._1) < 1e-6 && math.abs(o._2) < 1e-6, s"zone ${i + 1}: $o")
      // the Tokyo-datum twin places the same WGS84 point a datum-shift
      // away (published Tokyo→WGS84 translation ≈ 860 m geocentric →
      // hundreds of metres horizontally in Japan)
      val (xj, yj) = EpsgDb.fromWgs84(lon0 + 0.3, lat0 + 0.2, 2443 + i)
      val (xt, yt) = EpsgDb.fromWgs84(lon0 + 0.3, lat0 + 0.2, 30161 + i)
      val d = math.hypot(xt - xj, yt - yj)
      assert(d > 250 && d < 900, s"zone ${i + 1}: Tokyo offset $d m")
    }
    // cross-datum consistency: Tokyo geographic of a WGS84 point moves by
    // the same horizontal offset the projected twin showed
    val (lonT, latT) = EpsgDb.toWgs84(139.75, 35.68, 4301) // Tokyo datum → WGS84
    val d = math.hypot((lonT - 139.75) * 91000, (latT - 35.68) * 111000)
    assert(d > 250 && d < 900, s"Tokyo geographic hop moved $d m")
  }

  test("r10: WGS72/WGS72BE UTM — near the WGS84 grid but measurably apart") {
    // WGS84 UTM (326xx/327xx) lives on the closed-form CrsImpl path, so
    // build the reference grid directly from the projection machinery
    for ((wgs72Code, south) <- Seq((32210, false), (32331, true),
        (32410, false), (32531, true))) {
      val (lon, lat) = if (!south) (-123.3, 47.5) else (5.2, -33.4)
      val cm = EpsgDb.table(wgs72Code).proj match {
        case EpsgDb.TMerc(_, _, lon0, _, _, _) => lon0
        case other => fail(s"not TM: $other")
      }
      val ref = EpsgDb.TMerc(EpsgDb.Ellipsoid(6378137.0, 298.257223563),
        0, cm, 0.9996, 500000, if (south) 10000000 else 0)
      val (x72, y72) = EpsgDb.fromWgs84(lon, lat, wgs72Code)
      val (x84, y84) = ref.forward(lon, lat)
      val d = math.hypot(x72 - x84, y72 - y84)
      // the published WGS72→WGS84 is metre-level (4.5 m dz + 0.554" rz
      // ≈ 17 m of longitude rotation at most); same ballpark for 72BE
      assert(d > 0.5 && d < 40, s"EPSG:$wgs72Code vs WGS84 UTM: $d m apart")
      // round trip through the shifted frame at 1e-8°
      val (lon2, lat2) = EpsgDb.toWgs84(x72, y72, wgs72Code)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
        s"EPSG:$wgs72Code round trip: ($lon2, $lat2)")
    }
  }

  test("StereoClassic: Snyder sphere anchor, conformality, round trips, vs double") {
    // Published anchor — Snyder, Map Projections: A Working Manual
    // (USGS PP 1395), Appendix numerical example for the oblique
    // stereographic, SPHERE: R=1, k0=1, φ1=40°N, λ0=100°W; the point
    // 30°N 75°W maps to x=0.3807224, y=−0.1263802 with local scale
    // k=1.0402304. The ellipsoidal forms (21-27..21-39 on the conformal
    // latitude) reduce exactly at e→0 (χ=φ, m=cos φ); the engine's
    // sphere convention invF=1e12 leaves ~1e-12 relative residue.
    val sph = EpsgDb.StereoClassic(EpsgDb.Ellipsoid(1.0, 1e12),
      40.0, -100.0, 1.0, 0, 0)
    val (sx, sy) = sph.forward(-75.0, 30.0)
    assert(math.abs(sx - 0.3807224) < 5e-7, s"x=$sx")
    assert(math.abs(sy + 0.1263802) < 5e-7, s"y=$sy")
    // the published point scale, taken numerically along the meridian
    val dp = 1e-6
    val (sx2, sy2) = sph.forward(-75.0, 30.0 + dp)
    val kNum = math.hypot(sx2 - sx, sy2 - sy) / math.toRadians(dp)
    assert(math.abs(kNum - 1.0402304) < 1e-5, s"k=$kNum")
    val (bl, bp) = sph.inverse(sx, sy)
    assert(math.abs(bl + 75.0) < 1e-9 && math.abs(bp - 30.0) < 1e-9)

    // ellipsoid (GRS80), oblique center: the projection must be conformal
    // (meridian scale ≡ parallel scale everywhere) with scale k0 at the
    // natural origin — the defining invariants of the classic form
    val grs80 = EpsgDb.Ellipsoid(6378137.0, 298.257222101)
    val ob = EpsgDb.StereoClassic(grs80, 52.0, 10.0, 0.9999, 500000, 300000)
    val a = grs80.a; val e2 = grs80.e2
    def scales(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val w2 = 1 - e2 * math.sin(phi) * math.sin(phi)
      val rho = a * (1 - e2) / math.pow(w2, 1.5) // meridian radius
      val nu = a / math.sqrt(w2) // prime-vertical radius
      // step large enough that double-precision jitter in χ (~1e-9 m on
      // the projected values) vanishes against the ~1 m deltas, small
      // enough that scale curvature truncation stays ≪1e-12
      val d = 1e-5
      val (x0, y0) = ob.forward(lon, lat)
      val (xm, ym) = ob.forward(lon, lat + d)
      val (xp, yp) = ob.forward(lon + d, lat)
      (math.hypot(xm - x0, ym - y0) / (rho * math.toRadians(d)),
        math.hypot(xp - x0, yp - y0) / (nu * math.cos(phi) * math.toRadians(d)))
    }
    val (h0, k0s) = scales(10.0, 52.0)
    assert(math.abs(h0 - 0.9999) < 1e-7 && math.abs(k0s - 0.9999) < 1e-7,
      s"origin scale: h=$h0 k=$k0s")
    for ((lon, lat) <- Seq((2.0, 48.0), (25.0, 60.0), (10.0, 35.0), (-8.0, 55.0))) {
      val (h, kp) = scales(lon, lat)
      assert(math.abs(h / kp - 1.0) < 1e-6, s"conformality at ($lon,$lat): h=$h k=$kp")
      // tight round trip (conformal fixed point converges ≪1e-10°)
      val (x, y) = ob.forward(lon, lat)
      val (lon2, lat2) = ob.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"round trip ($lon,$lat)")
    }

    // classic vs EPSG 9809 double (Dutch RD parameters): identical at the
    // natural origin, measurably apart away from it — proves the oblique
    // stere dispatch is NOT the sterea family
    val bessel = EpsgDb.Ellipsoid(6377397.155, 299.1528128)
    val classic = EpsgDb.StereoClassic(bessel,
      52.15616055555555, 5.38763888888889, 0.9999079, 155000, 463000)
    val double_ = EpsgDb.ObliqueStereo(bessel,
      52.15616055555555, 5.38763888888889, 0.9999079, 155000, 463000)
    val (cx0, cy0) = classic.forward(5.38763888888889, 52.15616055555555)
    val (dx0, dy0) = double_.forward(5.38763888888889, 52.15616055555555)
    assert(math.hypot(cx0 - dx0, cy0 - dy0) < 1e-6)
    val (cx, cy) = classic.forward(6.9, 53.1)
    val (dx, dy) = double_.forward(6.9, 53.1)
    val apart = math.hypot(cx - dx, cy - dy)
    assert(apart > 0.01 && apart < 50, s"classic vs double at 1°: $apart m")

    // degenerate-parallel guards (fail-loudly policy): polar lat_0 here,
    // polar standard parallels in eqc/cea
    intercept[IllegalArgumentException] {
      EpsgDb.StereoClassic(grs80, 90.0, 0.0, 1.0, 0, 0)
    }
    intercept[IllegalArgumentException] {
      EpsgDb.Eqc(grs80, 90.0, 0.0, 0.0, 0, 0)
    }
    intercept[IllegalArgumentException] {
      EpsgDb.Cea(grs80, -90.0, 0.0, 0, 0)
    }
  }
}
