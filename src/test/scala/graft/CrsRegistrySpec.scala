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
}
