package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CrsRegistry, EpsgDb}

/** [[CrsRegistry]]: WKT1 parsing and user-registered CRS transforms.
  * Oracle strategy: register the published epsg.io-style WKT1 definition
  * of a CRS the embedded table already implements, under a SHIFTED code,
  * and require the registered engine to agree with the built-in engine to
  * sub-mm — same formulas, parameters arriving via the parser instead of
  * the table. */
class CrsRegistrySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Parser fidelity: registered engine vs built-in engine, both
    * directions, in metres. (NOT a round-trip test — the Helmert
    * round-trip budget ~1e-8° is inherent and identical in both.) */
  private def maxDelta(code: Int, fake: Int,
      pts: Seq[(Double, Double)]): Double =
    pts.map { case (lon, lat) =>
      val (bx, by) = EpsgDb.fromWgs84(lon, lat, code)
      val (rx, ry) = EpsgDb.fromWgs84(lon, lat, fake)
      val (blon, blat) = EpsgDb.toWgs84(bx, by, code)
      val (rlon, rlat) = EpsgDb.toWgs84(bx, by, fake)
      math.max(math.max(math.abs(bx - rx), math.abs(by - ry)),
        math.max(math.abs(blon - rlon), math.abs(blat - rlat)) * 111000)
    }.max

  test("TMerc + 7-param TOWGS84 (British National Grid WKT)") {
    CrsRegistry.register(927700,
      """PROJCS["OSGB36 / British National Grid",GEOGCS["OSGB36",
        |DATUM["Ordnance_Survey_of_Great_Britain_1936",
        |SPHEROID["Airy 1830",6377563.396,299.3249646],
        |TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],
        |PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
        |PROJECTION["Transverse_Mercator"],
        |PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],
        |PARAMETER["scale_factor",0.9996012717],
        |PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],
        |UNIT["metre",1],AUTHORITY["EPSG","27700"]]""".stripMargin.replace("\n", ""))
    assert(maxDelta(27700, 927700,
      Seq((-0.1276, 51.5072), (-3.19, 55.95), (-5.93, 54.6))) < 1e-4)
  }

  test("Lcc2SP + TOWGS84 (Belgian Lambert 72 WKT)") {
    CrsRegistry.register(931370,
      """PROJCS["BD72 / Belgian Lambert 72",GEOGCS["BD72",
        |DATUM["Reseau_National_Belge_1972",
        |SPHEROID["International 1924",6378388,297],
        |TOWGS84[-106.8686,52.2978,-103.7239,0.3366,-0.457,1.8422,-1.2747]],
        |PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
        |PROJECTION["Lambert_Conformal_Conic_2SP"],
        |PARAMETER["standard_parallel_1",51.16666723333333],
        |PARAMETER["standard_parallel_2",49.8333339],
        |PARAMETER["latitude_of_origin",90],
        |PARAMETER["central_meridian",4.367486666666666],
        |PARAMETER["false_easting",150000.013],
        |PARAMETER["false_northing",5400088.438],
        |UNIT["metre",1]]""".stripMargin.replace("\n", ""))
    assert(maxDelta(31370, 931370, Seq((4.35, 50.85), (5.57, 50.63))) < 1e-4)
  }

  test("Krovak (S-JTSK WKT)") {
    CrsRegistry.register(905514,
      """PROJCS["S-JTSK / Krovak East North",GEOGCS["S-JTSK",
        |DATUM["System_Jednotne_Trigonometricke_Site_Katastralni",
        |SPHEROID["Bessel 1841",6377397.155,299.1528128],
        |TOWGS84[589,76,480,0,0,0,0]],
        |PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
        |PROJECTION["Krovak"],
        |PARAMETER["latitude_of_center",49.5],
        |PARAMETER["longitude_of_center",24.83333333333333],
        |PARAMETER["azimuth",30.28813972527778],
        |PARAMETER["pseudo_standard_parallel_1",78.5],
        |PARAMETER["scale_factor",0.9999],
        |PARAMETER["false_easting",0],PARAMETER["false_northing",0],
        |UNIT["metre",1]]""".stripMargin.replace("\n", ""))
    assert(maxDelta(5514, 905514, Seq((14.42, 50.09), (17.25, 49.2))) < 0.01)
  }

  test("Polar Stereographic variants A and B") {
    CrsRegistry.register(903976,
      """PROJCS["WGS 84 / NSIDC Sea Ice Polar Stereographic South",
        |GEOGCS["WGS 84",DATUM["WGS_1984",
        |SPHEROID["WGS 84",6378137,298.257223563]],
        |PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
        |PROJECTION["Polar_Stereographic"],
        |PARAMETER["latitude_of_origin",-70],PARAMETER["central_meridian",0],
        |PARAMETER["false_easting",0],PARAMETER["false_northing",0],
        |UNIT["metre",1]]""".stripMargin.replace("\n", ""))
    assert(maxDelta(3976, 903976, Seq((10.0, -75.0), (-45.0, -80.0))) < 1e-4)
    CrsRegistry.register(932661,
      """PROJCS["WGS 84 / UPS North (N,E)",GEOGCS["WGS 84",
        |DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],
        |PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
        |PROJECTION["Polar_Stereographic"],
        |PARAMETER["latitude_of_origin",90],PARAMETER["central_meridian",0],
        |PARAMETER["scale_factor",0.994],
        |PARAMETER["false_easting",2000000],PARAMETER["false_northing",2000000],
        |UNIT["metre",1]]""".stripMargin.replace("\n", ""))
    assert(maxDelta(32661, 932661, Seq((30.0, 80.0), (-120.0, 85.0))) < 1e-4)
  }

  test("non-metre linear unit (US survey foot) via UnitScaled") {
    // same TM as Irish Transverse Mercator (2157) but declared in ftUS:
    // outputs must be the built-in metre outputs divided by the foot factor
    val ftUS = 0.3048006096012192
    CrsRegistry.register(902157,
      s"""PROJCS["ITM ftUS variant",GEOGCS["IRENET95",
         |DATUM["IRENET95",SPHEROID["GRS 1980",6378137,298.257222101]],
         |PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
         |PROJECTION["Transverse_Mercator"],
         |PARAMETER["latitude_of_origin",53.5],PARAMETER["central_meridian",-8],
         |PARAMETER["scale_factor",0.99982],
         |PARAMETER["false_easting",${600000 / ftUS}],
         |PARAMETER["false_northing",${750000 / ftUS}],
         |UNIT["US survey foot",$ftUS]]""".stripMargin.replace("\n", ""))
    val (bx, by) = EpsgDb.fromWgs84(-6.26, 53.35, 2157)
    val (fx, fy) = EpsgDb.fromWgs84(-6.26, 53.35, 902157)
    assert(math.abs(fx - bx / ftUS) < 1e-6 && math.abs(fy - by / ftUS) < 1e-6)
    val (lon, lat) = EpsgDb.toWgs84(fx, fy, 902157)
    // ~1e-4 m of double rounding through the unit scale → ~1e-9 deg
    assert(math.abs(lon - -6.26) < 1e-8 && math.abs(lat - 53.35) < 1e-8)
  }

  test("plain GEOGCS with TOWGS84 registers as a geographic CRS") {
    CrsRegistry.register(904277,
      """GEOGCS["OSGB36",DATUM["OSGB_1936",
        |SPHEROID["Airy 1830",6377563.396,299.3249646],
        |TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],
        |PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]"""
        .stripMargin.replace("\n", ""))
    assert(maxDelta(4277, 904277, Seq((-0.1276, 51.5072))) < 1e-4)
  }

  test("unsupported projection method raises a clear error") {
    val e = intercept[IllegalArgumentException] {
      CrsRegistry.register(999999,
        """PROJCS["x",GEOGCS["WGS 84",DATUM["WGS_1984",
          |SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],
          |UNIT["degree",0.0174532925199433]],
          |PROJECTION["Cassini_Soldner"],UNIT["metre",1]]"""
          .stripMargin.replace("\n", ""))
    }
    assert(e.getMessage.contains("Cassini_Soldner"))
    assert(!EpsgDb.isSupported(999999))
  }

  test("st_to_srid works end-to-end through a registered code") {
    val out = Seq((1L, "POINT (-0.1276 51.5072)")).toDF("id", "wkt")
      .select(graft.functions.st_to_srid(
        graft.functions.st_set_srid(
          graft.functions.st_geomfromtext(col("wkt")), lit(4326)),
        lit(927700)).as("g"))
      .select(graft.functions.st_x(col("g")), graft.functions.st_y(col("g")),
        graft.functions.st_srid(col("g")))
      .collect()(0)
    val (bx, by) = EpsgDb.fromWgs84(-0.1276, 51.5072, 27700)
    assert(math.abs(out.getDouble(0) - bx) < 1e-4)
    assert(math.abs(out.getDouble(1) - by) < 1e-4)
    assert(out.getInt(2) == 927700)
    // and the shapefile .prj writer picks up the registration's WKT
    assert(graft.functions.CrsImpl.crsFromCode(927700).exists(_.contains("OSGB36")))
  }

  /** ArcGIS .prj dialect: D_-prefixed datum, no TOWGS84, no AUTHORITY.
    * The datum-name table must recover the OSGB36 Helmert, so the ESRI
    * definition transforms identically to the embedded 27700 entry. */
  private val EsriBngPrj =
    """PROJCS["British_National_Grid",GEOGCS["GCS_OSGB_1936",
      |DATUM["D_OSGB_1936",SPHEROID["Airy_1830",6377563.396,299.3249646]],
      |PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],
      |PROJECTION["Transverse_Mercator"],
      |PARAMETER["False_Easting",400000.0],PARAMETER["False_Northing",-100000.0],
      |PARAMETER["Central_Meridian",-2.0],PARAMETER["Scale_Factor",0.9996012717],
      |PARAMETER["Latitude_Of_Origin",49.0],UNIT["Meter",1.0]]""".stripMargin.replace("\n", "")

  test("ESRI WKT1 dialect: datum-name Helmert recovery (no TOWGS84)") {
    CrsRegistry.register(937700, EsriBngPrj)
    assert(maxDelta(27700, 937700,
      Seq((-0.1276, 51.5072), (-3.19, 55.95), (-5.93, 54.6))) < 1e-4)
    // NAD27 by ESRI name gets the published shift (≠ identity: the same
    // point through a no-shift clone differs by tens of metres)
    CrsRegistry.register(938000,
      """GEOGCS["GCS_North_American_1927",DATUM["D_North_American_1927",
        |SPHEROID["Clarke_1866",6378206.4,294.9786982]],
        |PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""
        .stripMargin.replace("\n", ""))
    val (lon27, lat27) = EpsgDb.toWgs84(-98.0, 38.0, 938000)
    val d = math.hypot((lon27 + 98.0) * 111000, (lat27 - 38.0) * 111000)
    assert(d > 10 && d < 300, s"NAD27 shift magnitude off: $d m")
  }

  test("ESRI .prj infers its EPSG code from the embedded table") {
    assert(CrsRegistry.sridForWkt(EsriBngPrj) == 27700)
    // OGC WKT1 with AUTHORITY: the explicit code wins
    assert(CrsRegistry.sridForWkt(EpsgDb.wkt(25832).get) == 25832)
  }

  test("WKT2 PROJCRS parses: ETRS89 / UTM 32N matches the table entry") {
    CrsRegistry.register(925832,
      """PROJCRS["ETRS89 / UTM zone 32N",
        |BASEGEOGCRS["ETRS89",ENSEMBLE["European Terrestrial Reference System 1989 ensemble",
        |MEMBER["European Terrestrial Reference Frame 1989"],
        |ELLIPSOID["GRS 1980",6378137,298.257222101,LENGTHUNIT["metre",1]],
        |ENSEMBLEACCURACY[0.1]],PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],
        |ID["EPSG",4258]],
        |CONVERSION["UTM zone 32N",METHOD["Transverse Mercator",ID["EPSG",9807]],
        |PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],
        |PARAMETER["Longitude of natural origin",9,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],
        |PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1],ID["EPSG",8805]],
        |PARAMETER["False easting",500000,LENGTHUNIT["metre",1],ID["EPSG",8806]],
        |PARAMETER["False northing",0,LENGTHUNIT["metre",1],ID["EPSG",8807]]],
        |CS[Cartesian,2],
        |AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
        |AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]],
        |ID["EPSG",25832]]""".stripMargin.replace("\n", ""))
    assert(maxDelta(25832, 925832,
      Seq((9.0, 50.0), (7.25, 52.5), (11.5, 48.25))) < 1e-6)
  }

  test("WKT2 BOUNDCRS: abridged transformation equals the TOWGS84 twin") {
    CrsRegistry.register(947700,
      """BOUNDCRS[SOURCECRS[PROJCRS["OSGB36 / British National Grid",
        |BASEGEOGCRS["OSGB36",DATUM["Ordnance Survey of Great Britain 1936",
        |ELLIPSOID["Airy 1830",6377563.396,299.3249646,LENGTHUNIT["metre",1]]],
        |PRIMEM["Greenwich",0]],
        |CONVERSION["British National Grid",METHOD["Transverse Mercator"],
        |PARAMETER["Latitude of natural origin",49],
        |PARAMETER["Longitude of natural origin",-2],
        |PARAMETER["Scale factor at natural origin",0.9996012717],
        |PARAMETER["False easting",400000],PARAMETER["False northing",-100000]],
        |CS[Cartesian,2],AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
        |AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]],
        |TARGETCRS[GEOGCRS["WGS 84",ENSEMBLE["World Geodetic System 1984 ensemble",
        |MEMBER["World Geodetic System 1984 (Transit)"],
        |ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]],
        |ENSEMBLEACCURACY[2.0]],PRIMEM["Greenwich",0],CS[ellipsoidal,2],
        |AXIS["latitude",north,ORDER[1],ANGLEUNIT["degree",0.0174532925199433]],
        |AXIS["longitude",east,ORDER[2],ANGLEUNIT["degree",0.0174532925199433]],
        |ID["EPSG",4326]]],
        |ABRIDGEDTRANSFORMATION["Transformation from OSGB36 to WGS84",
        |METHOD["Position Vector transformation (geog2D domain)",ID["EPSG",9606]],
        |PARAMETER["X-axis translation",446.448],
        |PARAMETER["Y-axis translation",-125.157],
        |PARAMETER["Z-axis translation",542.06],
        |PARAMETER["X-axis rotation",0.1502],
        |PARAMETER["Y-axis rotation",0.247],
        |PARAMETER["Z-axis rotation",0.8421],
        |PARAMETER["Scale difference",0.9999795106]]]""".stripMargin.replace("\n", ""))
    assert(maxDelta(27700, 947700,
      Seq((-0.1276, 51.5072), (-3.19, 55.95))) < 1e-3)
  }

  test("unknown definition auto-registers under a stable synthetic code") {
    // a custom TM nobody has a code for (central meridian 3.125)
    val wkt =
      """PROJCS["Custom_TM",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",
        |SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],
        |UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],
        |PARAMETER["False_Easting",250000.0],PARAMETER["False_Northing",0.0],
        |PARAMETER["Central_Meridian",3.125],PARAMETER["Scale_Factor",0.9997],
        |PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]""".stripMargin.replace("\n", "")
    val code = CrsRegistry.sridForWkt(wkt)
    assert(code >= 990000 && code < 999999, s"synthetic code out of range: $code")
    assert(CrsRegistry.sridForWkt(wkt) == code) // stable on re-read
    // and it transforms end-to-end
    val (x, y) = EpsgDb.fromWgs84(3.125, 0.0, code)
    assert(math.abs(x - 250000.0) < 1e-6 && math.abs(y) < 1e-6)
  }

  test("r9 sweep: nested authority, grads+Paris, zero transformations, bad WKT") {
    // (1) parseable WKT with NO root EPSG authority must NOT inherit a
    // nested clause (the base GEOGCS's 4269 here) — that tagged Albers
    // metres as NAD83 degrees
    val noRootAuth =
      """PROJCS["USA_Albers",GEOGCS["GCS_North_American_1983",
        |DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],
        |PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433],
        |AUTHORITY["EPSG","4269"]],
        |PROJECTION["Albers"],PARAMETER["False_Easting",0.0],
        |PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",-96.0],
        |PARAMETER["Standard_Parallel_1",29.5],PARAMETER["Standard_Parallel_2",45.5],
        |PARAMETER["Latitude_Of_Origin",37.5],UNIT["Meter",1.0]]""".stripMargin
        .replaceAll("\n", "")
    val code = CrsRegistry.sridForWkt(noRootAuth)
    assert(code != 4269 && code != 9001, s"nested authority leaked: $code")
    assert(code >= 990000, s"expected an auto-registered synthetic code: $code")

    // (2) grads + Paris meridian geographic CRS: native coordinates are
    // (grads from Paris), so Paris itself reads back ~ (2.5969E, 48.8)
    val ntfParis =
      """GEOGCS["GCS_NTF_Paris",DATUM["D_NTF",
        |SPHEROID["Clarke_1880_IGN",6378249.2,293.4660212936265]],
        |PRIMEM["Paris",2.337229166666667],
        |UNIT["Grad",0.01570796326794897]]""".stripMargin.replaceAll("\n", "")
    CrsRegistry.register(990901, ntfParis)
    // Paris observatory: 2°20'14.025"E Greenwich = 0 grads from Paris
    val parisLonDeg = 2.0 + 20.0 / 60 + 14.025 / 3600
    val (gx, gy) = EpsgDb.fromWgs84(parisLonDeg, 45.0, 990901)
    // the NTF datum hop moves the point by ~100 m (~0.002 grads) — the
    // old bug was off by 0.26 grads (~23 km)
    assert(math.abs(gx) < 0.005, s"Paris should be ~0 grads from Paris: $gx")
    assert(math.abs(gy - 50.0) < 0.01, s"45 deg = 50 grads: $gy")
    val (lonB, latB) = EpsgDb.toWgs84(gx, gy, 990901)
    assert(math.abs(lonB - parisLonDeg) < 1e-7 && math.abs(latB - 45.0) < 1e-7)

    // (3) PROJCS over the Paris meridian: Central_Meridian 0 grads from
    // Paris = the Greenwich lon0 the embedded NTF zone entries bake in
    val lambert2 =
      """PROJCS["NTF_Paris_Lambert_II",GEOGCS["GCS_NTF_Paris",
        |DATUM["D_NTF",SPHEROID["Clarke_1880_IGN",6378249.2,293.4660212936265]],
        |PRIMEM["Paris",2.337229166666667],UNIT["Grad",0.01570796326794897]],
        |PROJECTION["Lambert_Conformal_Conic_1SP"],
        |PARAMETER["Central_Meridian",0.0],PARAMETER["Latitude_Of_Origin",52.0],
        |PARAMETER["Scale_Factor",0.99987742],
        |PARAMETER["False_Easting",600000.0],PARAMETER["False_Northing",2200000.0],
        |UNIT["Meter",1.0]]""".stripMargin.replaceAll("\n", "")
    CrsRegistry.register(990902, lambert2)
    // must agree with the embedded 27572 entry (same cone, Paris baked in)
    val viaWkt = EpsgDb.fromWgs84(2.5, 46.5, 990902)
    val viaTable = EpsgDb.fromWgs84(2.5, 46.5, 27572)
    assert(math.abs(viaWkt._1 - viaTable._1) < 0.01 &&
      math.abs(viaWkt._2 - viaTable._2) < 0.01,
      s"Paris-meridian PROJCS diverged: $viaWkt vs $viaTable")

    // (4) explicit all-zero ABRIDGEDTRANSFORMATION = declared coincidence
    // (must NOT resurrect the NAD27 datum-name Helmert)
    val zeroBound =
      """BOUNDCRS[SOURCECRS[GEOGCRS["NAD27",
        |DATUM["North American Datum 1927",
        |ELLIPSOID["Clarke 1866",6378206.4,294.978698213898]]]],
        |TARGETCRS[GEOGCRS["WGS 84",DATUM["WGS84",
        |ELLIPSOID["WGS 84",6378137,298.257223563]]]],
        |ABRIDGEDTRANSFORMATION["zero",METHOD["Geocentric translations"],
        |PARAMETER["X-axis translation",0],PARAMETER["Y-axis translation",0],
        |PARAMETER["Z-axis translation",0]]]""".stripMargin.replaceAll("\n", "")
    val zeroCrs = CrsRegistry.parseWkt(zeroBound)
    assert(zeroCrs.shift.isEmpty, s"zero transformation resurrected ${zeroCrs.shift}")

    // (5) truncated WKT raises IllegalArgumentException, not
    // StringIndexOutOfBounds
    assertThrows[IllegalArgumentException] {
      CrsRegistry.parseWkt("""PROJCS["truncated""")
    }
    assertThrows[IllegalArgumentException] {
      CrsRegistry.parseWkt("""GEOGCS["no closing bracket", DATUM["x"""")
    }
  }

  test("r10: unregister restores a ConfKey registration immediately") {
    // force a Spark env (TestSpark), plant a conf entry, shadow it with an
    // explicit registration, then unregister — the conf WKT must be back
    TestSpark.spark
    val confWkt = EpsgDb.wkt(32119).get.replace(""""EPSG","32119"""", """"EPSG","990777"""")
    val env = org.apache.spark.SparkEnv.get
    assert(env != null)
    val prev = env.conf.get(CrsRegistry.ConfKey, "")
    env.conf.set(CrsRegistry.ConfKey,
      (if (prev.isEmpty) "" else prev + ";;") + s"990777=$confWkt")
    try {
      val override_ = EpsgDb.wkt(27700).get.replace(""""EPSG","27700"""", """"EPSG","990777"""")
      CrsRegistry.register(990777, override_)
      assert(CrsRegistry.registeredWkt(990777).contains(override_))
      CrsRegistry.unregister(990777)
      assert(CrsRegistry.registeredWkt(990777).contains(confWkt),
        "conf-sourced registration not restored after unregister")
    } finally {
      CrsRegistry.unregister(990777)
      if (prev.isEmpty) env.conf.remove(CrsRegistry.ConfKey)
      else env.conf.set(CrsRegistry.ConfKey, prev)
      CrsRegistry.unregister(990777) // drop the conf copy too, now that the conf entry is gone
    }
  }

  test("r10: Hotine OM / Polyconic WKT parse; ESRI azimuth-90 is somerc") {
    // the engine's own synthesized WKT for the new r10 projections must
    // round-trip through the parser to the same transform — the contract
    // a .prj written by us (or by GDAL with these standard names) relies on
    for ((code, fake) <- Seq((26931, 926931), (29873, 929873), (5880, 905880))) {
      CrsRegistry.register(fake, EpsgDb.wkt(code).get
        .replace(s""""EPSG","$code"""", s""""EPSG","$fake""""))
      val pts = code match {
        case 26931 => Seq((-134.4, 58.3), (-131.7, 55.3))
        case 29873 => Seq((115.8, 5.4), (117.5, 4.2))
        case _ => Seq((-47.9, -15.8), (-60.0, 2.8))
      }
      assert(maxDelta(code, fake, pts) < 1e-4, s"code $code")
      CrsRegistry.unregister(fake)
    }
    // ESRI spells the Swiss Rosenmund grids with the Hotine azimuth-center
    // method name and azimuth = rectified angle = 90 — that exact case
    // must dispatch to the dedicated somerc family, matching LV95
    CrsRegistry.register(902056, EpsgDb.wkt(2056).get
      .replace(""""EPSG","2056"""", """"EPSG","902056""""))
    assert(maxDelta(2056, 902056, Seq((7.44, 46.95), (8.54, 47.38))) < 1e-4)
    CrsRegistry.unregister(902056)
    // a genuinely oblique azimuth through the same ESRI Azimuth_Center
    // name (29873's own synthesized spelling) stays HOM variant B
    val homB = CrsRegistry.parseWkt(EpsgDb.wkt(29873).get)
    assert(homB.proj.isInstanceOf[EpsgDb.HotineOblique])
    assert(homB.proj.asInstanceOf[EpsgDb.HotineOblique].variantB)
  }

  // ------------------------------------------------------ PROJ.4 front-end
  // Published proj4 strings (the exact text epsg.io serves) registered
  // under shifted codes, required to agree with the built-in engine.

  test("proj4: UTM via +proj=utm +zone +datum=WGS84") {
    // anchor: ETRS89 / UTM 33N (same TMerc; GRS80 vs WGS84 differs by
    // ~0.1 mm of flattening — sub-mm, inside the tolerance)
    CrsRegistry.register(942633,
      "+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs")
    assert(maxDelta(25833, 942633,
      Seq((15.0, 52.0), (12.5, 41.9), (17.9, 59.3))) < 1e-3)
    // +south adds exactly the 10,000 km false northing
    CrsRegistry.register(942733,
      "+proj=utm +zone=33 +south +datum=WGS84 +units=m +no_defs")
    val (nx, ny) = EpsgDb.fromWgs84(15.0, -25.0, 942633)
    val (sx, sy) = EpsgDb.fromWgs84(15.0, -25.0, 942733)
    assert(sx === nx && math.abs(sy - (ny + 1e7)) < 1e-9)
  }

  test("proj4: tmerc + 7-param +towgs84 datum hop (British National Grid)") {
    CrsRegistry.register(947700,
      "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
        "+y_0=-100000 +ellps=airy " +
        "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 " +
        "+units=m +no_defs")
    assert(maxDelta(27700, 947700,
      Seq((-0.1276, 51.5072), (-3.19, 55.95), (-5.93, 54.6))) < 0.02)
  }

  test("proj4: +datum=NAD27 shorthand recovers the published Helmert") {
    CrsRegistry.register(946714, "+proj=utm +zone=14 +datum=NAD27 +units=m +no_defs")
    assert(maxDelta(26714, 946714, Seq((-98.5, 39.8), (-97.0, 32.8))) < 1e-4)
  }

  test("proj4: lcc 2SP (RGF93 / Lambert-93)") {
    CrsRegistry.register(942154,
      "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 " +
        "+y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs")
    assert(maxDelta(2154, 942154, Seq((2.35, 48.85), (5.37, 43.3))) < 1e-4)
  }

  test("proj4: spherical web mercator via +a=+b and +nadgrids=@null") {
    CrsRegistry.register(943857,
      "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 " +
        "+k=1 +units=m +nadgrids=@null +wktext +no_defs")
    // anchor: the published EPSG 3857 spherical formulas
    for ((lon, lat) <- Seq((2.35, 48.85), (-74.0, 40.7))) {
      val ex = 6378137.0 * math.toRadians(lon)
      val ey = 6378137.0 * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
      // the engine encodes a sphere as invF=1e12 (the WKT web-mercator
      // path's own convention) — ~1e-5 m from the exact sphere formulas
      val (x, y) = EpsgDb.fromWgs84(lon, lat, 943857)
      assert(math.abs(x - ex) < 1e-4 && math.abs(y - ey) < 1e-4)
      val (blon, blat) = EpsgDb.toWgs84(x, y, 943857)
      assert(math.abs(blon - lon) < 1e-9 && math.abs(blat - lat) < 1e-9)
    }
  }

  test("proj4: somerc (CH1903+ / LV95) dispatches to the Swiss family") {
    CrsRegistry.register(942056,
      "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 " +
        "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel " +
        "+towgs84=674.374,15.056,405.346,0,0,0,0 +units=m +no_defs")
    assert(maxDelta(2056, 942056, Seq((7.44, 46.95), (8.54, 47.38))) < 1e-4)
    assert(CrsRegistry.parseProj4(
      "+proj=somerc +lat_0=46.95 +lon_0=7.44 +k_0=1 +ellps=bessel")
      .proj.isInstanceOf[EpsgDb.SwissOblique])
  }

  test("proj4: polar stereographic variant B via +lat_ts") {
    CrsRegistry.register(943976,
      "+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 +x_0=0 +y_0=0 " +
        "+datum=WGS84 +units=m +no_defs")
    assert(maxDelta(3976, 943976, Seq((10.0, -75.0), (-45.0, -80.0))) < 1e-4)
  }

  test("proj4: +units=us-ft scales output like the WKT UnitScaled path") {
    val ftUS = 1200.0 / 3937.0
    CrsRegistry.register(948157,
      "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=0.99982 " +
        s"+x_0=600000 +y_0=750000 +ellps=GRS80 +units=us-ft +no_defs")
    // PROJ keeps x_0/y_0 in METRES and converts output to the unit
    val (bx, by) = EpsgDb.fromWgs84(-6.26, 53.35, 2157)
    val (fx, fy) = EpsgDb.fromWgs84(-6.26, 53.35, 948157)
    assert(math.abs(fx - bx / ftUS) < 1e-6 && math.abs(fy - by / ftUS) < 1e-6)
    val (lon, lat) = EpsgDb.toWgs84(fx, fy, 948157)
    assert(math.abs(lon - -6.26) < 1e-8 && math.abs(lat - 53.35) < 1e-8)
  }

  test("proj4: +pm=paris shifts longitudes (NTF Lambert)") {
    // Paris-meridian geographic: lon 0 at the proj4 CRS = 2.3372°E Greenwich
    CrsRegistry.register(944807,
      "+proj=longlat +ellps=clrk80ign +pm=paris +no_defs")
    val (lon, _) = EpsgDb.toWgs84(0.0, 48.0, 944807)
    assert(math.abs(lon - 2.337229166666667) < 1e-9)
  }

  test("proj4: review-pinned edges (axis, lcc 1SP, terse krovak, sridForWkt)") {
    // non-default axis order must fail loudly, not register sign-flipped
    val ax = intercept[IllegalArgumentException] {
      CrsRegistry.parseProj4("+proj=tmerc +lon_0=25 +axis=wsu +ellps=WGS84")
    }
    assert(ax.getMessage.contains("+axis=wsu"))
    // lcc 1SP: distinct lat_0/lat_1 (PROJ offsets the northing) rejected;
    // the equal form parses
    intercept[IllegalArgumentException] {
      CrsRegistry.parseProj4("+proj=lcc +lat_1=33 +lat_0=25 +lon_0=-100 +ellps=WGS84")
    }
    assert(CrsRegistry.parseProj4(
      "+proj=lcc +lat_1=33 +lat_0=33 +k_0=1 +lon_0=-100 +ellps=WGS84")
      .proj.isInstanceOf[EpsgDb.Lcc1SP])
    // terse krovak is valid PROJ (every parameter hardcoded there) and
    // must land on S-JTSK, not a lat_0=0 projection a continent away
    CrsRegistry.register(945514, "+proj=krovak +ellps=bessel +towgs84=589,76,480")
    assert(maxDelta(5514, 945514, Seq((14.42, 50.09), (17.25, 49.2))) < 0.01)
    // the .prj/definition resolver accepts proj4 too: a definition whose
    // parameters match an embedded-table entry infers that code (smallest
    // matching code wins — 3006 SWEREF99 TM ≡ ETRS89/UTM 33N parameters)
    assert(CrsRegistry.sridForWkt(
      "+proj=utm +zone=33 +ellps=GRS80 +towgs84=0,0,0 +units=m +no_defs") === 3006)
    // no table twin → deterministic synthetic auto-registration that works
    val syn = CrsRegistry.sridForWkt("+proj=utm +zone=33 +datum=WGS84 +units=m")
    assert(syn >= 990000 && EpsgDb.isSupported(syn))
    val (x25833, y25833) = EpsgDb.fromWgs84(15.0, 52.0, 25833)
    val (xs, ys) = EpsgDb.fromWgs84(15.0, 52.0, syn)
    assert(math.abs(xs - x25833) < 1e-3 && math.abs(ys - y25833) < 1e-3)
  }

  test("equidistant cylindrical (EPSG 4087/4088): anchors, sphere reduction, proj4") {
    // published anchor: the WGS84 quarter meridian is 10 001 965.729 m —
    // EPSG 4087's northing at the pole IS that arc (method 1028)
    val (_, yPole) = EpsgDb.fromWgs84(0.0, 90.0, 4087)
    assert(math.abs(yPole - 10001965.729) < 0.01, s"quarter meridian: $yPole")
    // easting at the equator is exactly a·λ (ν₁cosφ₁ = a at φ₁ = 0)
    val (xEq, yEq) = EpsgDb.fromWgs84(90.0, 0.0, 4087)
    assert(math.abs(xEq - 6378137.0 * math.Pi / 2) < 1e-6 && yEq === 0.0)
    // round trip: the Snyder 3-26 inverse series truncates at ~2e-9°
    // (≈0.25 mm) — bound at 1e-8° (~1 mm)
    for ((lon, lat) <- Seq((2.35, 48.85), (-118.2, 34.05), (151.2, -33.87))) {
      val (x, y) = EpsgDb.fromWgs84(lon, lat, 4087)
      val (blon, blat) = EpsgDb.toWgs84(x, y, 4087)
      assert(math.abs(blon - lon) < 1e-8 && math.abs(blat - lat) < 1e-8)
    }
    // 4088 (authalic sphere, method 1029): x = Rλ, y = Rφ — the engine
    // encodes a sphere as invF=1e12 (same convention as web mercator),
    // leaving ~1e-5 m from the exact sphere forms
    val r = 6371007.181
    val (xs, ys) = EpsgDb.fromWgs84(45.0, 30.0, 4088)
    assert(math.abs(xs - r * math.toRadians(45)) < 1e-4 &&
      math.abs(ys - r * math.toRadians(30)) < 1e-4)
    // proj4 front door: the epsg.io string for 4087 transforms identically
    CrsRegistry.register(944087,
      "+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs")
    assert(maxDelta(4087, 944087, Seq((2.35, 48.85), (-118.2, 34.05))) < 1e-6)
    // WKT front door + synthesized-WKT round trip (also pins that wkt()
    // now synthesizes Eqc instead of throwing)
    CrsRegistry.register(954087, EpsgDb.wkt(4087).get
      .replace(""""EPSG","4087"""", """"EPSG","954087""""))
    assert(maxDelta(4087, 954087, Seq((2.35, 48.85))) < 1e-6)
  }

  test("wkt synthesis covers every embedded projection family (Cea regression)") {
    // 6933 (EASE-Grid 2.0 Global) is the table's one Cea — wkt() used to
    // MatchError on it; now it synthesizes and re-parses to the same CRS
    val w = EpsgDb.wkt(6933)
    assert(w.isDefined && w.get.contains("Cylindrical_Equal_Area"))
    CrsRegistry.register(956933, w.get
      .replace(""""EPSG","6933"""", """"EPSG","956933""""))
    assert(maxDelta(6933, 956933, Seq((10.0, 50.0), (-70.0, -20.0))) < 1e-4)
    // and the full table synthesizes without throwing
    EpsgDb.table.keys.foreach(c => EpsgDb.wkt(c))
  }

  test("proj4: non-polar +proj=stere is the classic oblique stereographic") {
    // dispatch: oblique lat_0 lands on the classic single-projection
    // family, NOT the sterea double (the two are distinct projections
    // that agree only at the natural origin)
    val rd = "+proj=stere +lat_0=52.15616055555555 +lon_0=5.38763888888889 " +
      "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel +units=m +no_defs"
    val classic = CrsRegistry.parseProj4(rd)
    assert(classic.proj.isInstanceOf[EpsgDb.StereoClassic])
    val sterea = CrsRegistry.parseProj4(rd.replace("+proj=stere ", "+proj=sterea "))
    assert(sterea.proj.isInstanceOf[EpsgDb.ObliqueStereo])
    val (cx, cy) = classic.proj.forward(6.9, 53.1)
    val (dx, dy) = sterea.proj.forward(6.9, 53.1)
    val apart = math.hypot(cx - dx, cy - dy)
    assert(apart > 0.01 && apart < 50, s"classic vs sterea: $apart m")
    // equatorial aspect is the same formula (lat_0 defaults to 0)
    assert(CrsRegistry.parseProj4("+proj=stere +lon_0=0 +ellps=GRS80")
      .proj.isInstanceOf[EpsgDb.StereoClassic])
    // polar aspects keep their dedicated dispatch
    assert(CrsRegistry.parseProj4("+proj=stere +lat_0=90 +k=0.994 +ellps=WGS84")
      .proj.isInstanceOf[EpsgDb.PolarStereo])
    // Snyder sphere anchor through the front door: +R=1 builds the unit
    // sphere; the published example point lands to 5e-7
    val sny = CrsRegistry.parseProj4("+proj=stere +lat_0=40 +lon_0=-100 +R=1")
    val (ax, ay) = sny.proj.forward(-75.0, 30.0)
    assert(math.abs(ax - 0.3807224) < 5e-7 && math.abs(ay + 0.1263802) < 5e-7,
      s"Snyder anchor via proj4: ($ax,$ay)")
    // +lat_ts only exists in the polar aspect — reject, don't drop it
    val ts = intercept[IllegalArgumentException] {
      CrsRegistry.parseProj4("+proj=stere +lat_0=52 +lat_ts=50 +ellps=WGS84")
    }
    assert(ts.getMessage.contains("lat_ts"))
    // end-to-end: registered classic oblique stere round-trips through
    // the WGS84 hub
    CrsRegistry.register(949999,
      "+proj=stere +lat_0=59 +lon_0=25 +k=1 +x_0=0 +y_0=0 " +
        "+ellps=GRS80 +towgs84=0,0,0 +units=m +no_defs")
    for ((lon, lat) <- Seq((24.94, 60.17), (28.0, 56.0))) {
      val (x, y) = EpsgDb.fromWgs84(lon, lat, 949999)
      val (lon2, lat2) = EpsgDb.toWgs84(x, y, 949999)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("proj4: merc rejects +lat_ts with a non-1 +k (keeps the legacy 3857 form)") {
    // modern PROJ: "k_0 and lat_ts can not both be specified" — a silent
    // drop would register a different scale than asked for
    val e = intercept[IllegalArgumentException] {
      CrsRegistry.parseProj4("+proj=merc +lat_ts=30 +k=0.98 +ellps=WGS84")
    }
    assert(e.getMessage.contains("lat_ts") && e.getMessage.contains("0.98"))
    // the legacy spherical-3857 string carries +lat_ts=0 +k=1 — still fine
    assert(CrsRegistry.parseProj4(
      "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 " +
        "+k=1 +units=m +nadgrids=@null +wktext +no_defs")
      .proj.isInstanceOf[EpsgDb.Mercator1SP])
    // degenerate polar standard parallels fail loudly at parse time too
    intercept[IllegalArgumentException] {
      CrsRegistry.parseProj4("+proj=eqc +lat_ts=90 +ellps=WGS84")
    }
    intercept[IllegalArgumentException] {
      CrsRegistry.parseProj4("+proj=cea +lat_ts=90 +ellps=WGS84")
    }
  }

  test("proj4: geographic + unknown family errors are actionable") {
    val g = CrsRegistry.parseProj4("+proj=longlat +datum=WGS84 +no_defs")
    assert(g.proj.isInstanceOf[EpsgDb.Geographic] && g.shift.isEmpty)
    val e = intercept[IllegalArgumentException] {
      CrsRegistry.parseProj4("+proj=robin +lon_0=0 +ellps=WGS84")
    }
    assert(e.getMessage.contains("+proj=robin") && e.getMessage.contains("supported"))
    val e2 = intercept[IllegalArgumentException] {
      CrsRegistry.parseProj4("+proj=tmerc +ellps=nonsense")
    }
    assert(e2.getMessage.contains("nonsense"))
  }
}
