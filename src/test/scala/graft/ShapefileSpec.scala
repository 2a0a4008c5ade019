package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shapefile (.shp/.shx/.dbf/.prj) round-trips through the pure-JVM codec
  * (`io/Shapefile.scala`), mirroring the reference's `read_file` surface
  * (`/root/reference/polars_st/input.py:30-153`): geometry + attributes,
  * CRS via .prj, bbox pushdown, column subsetting. */
class ShapefileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpShp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_shp").toString
    s"$d/$name.shp"
  }

  test("polygon round-trip: geometry, attributes, srid from .prj") {
    val df = (1 to 40).map { i =>
      val x = i * 2.0; val y = i * 3.0
      (i.toLong, s"row_$i", i % 2 == 0, i * 0.5,
        s"POLYGON (($x $y, ${x + 1} $y, ${x + 1} ${y + 1}, $x ${y + 1}, $x $y))")
    }.toDF("fid", "name", "flag", "score", "wkt")
      .select($"fid", $"name", $"flag", $"score",
        st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
    val path = tmpShp("poly")
    graft.io.GeoIO.writeShapefile(df, path)
    assert(new java.io.File(path).exists())
    assert(new java.io.File(path.replace(".shp", ".shx")).exists())
    assert(new java.io.File(path.replace(".shp", ".dbf")).exists())
    assert(new java.io.File(path.replace(".shp", ".prj")).exists())
    val back = graft.io.GeoIO.readShapefile(spark, path)
    assert(back.columns.toSeq ===
      Seq("geometry", "fid", "name", "flag", "score"))
    val rows = back.select($"fid", $"name", $"flag", $"score",
        st_area($"geometry").as("a"),
        graft.functions.st_srid($"geometry").as("srid"),
        st_x(st_centroid($"geometry")).as("cx"))
      .orderBy($"fid").collect()
    assert(rows.length === 40)
    rows.zipWithIndex.foreach { case (r, idx) =>
      val i = idx + 1
      assert(r.getLong(0) === i.toLong)
      assert(r.getString(1) === s"row_$i")
      assert(r.getBoolean(2) === (i % 2 == 0))
      assert(r.getDouble(3) === i * 0.5)
      assert(r.getDouble(4) === 1.0) // exact: unit squares on integers
      assert(r.getInt(5) === 4326)
      assert(r.getDouble(6) === i * 2.0 + 0.5)
    }
  }

  test("polygon with hole and multipolygon round-trip exactly") {
    val wkts = Seq(
      // shell + hole (orientation forced by the writer, reassembled on read)
      "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      // two disjoint shells
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 14 10, 14 14, 10 14, 10 10)))")
    val df = wkts.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("fid", "wkt")
      .select($"fid", st_geomfromtext($"wkt").as("geometry"))
    val path = tmpShp("holes")
    graft.io.GeoIO.writeShapefile(df, path)
    val back = graft.io.GeoIO.readShapefile(spark, path)
      .select($"fid", st_area($"geometry").as("a"),
        st_count_interior_rings($"geometry").as("nint"))
      .orderBy($"fid").collect()
    assert(back(0).getDouble(1) === 60.0) // 64 - 4
    assert(back(0).getInt(2) === 1)
    assert(back(1).getDouble(1) === 20.0) // 4 + 16
  }

  test("points, multipoints and lines round-trip; Z survives") {
    val pts = Seq((1L, "POINT Z (1 2 3)"), (2L, "POINT Z (4 5 6)"))
      .toDF("fid", "wkt").select($"fid", st_geomfromtext($"wkt").as("geometry"))
    val pPath = tmpShp("pts")
    graft.io.GeoIO.writeShapefile(pts, pPath)
    val pBack = graft.io.GeoIO.readShapefile(spark, pPath)
      .select($"fid", st_x($"geometry"), st_y($"geometry"), st_z($"geometry"))
      .orderBy($"fid").collect()
    assert(pBack(0).getDouble(1) === 1.0)
    assert(pBack(0).getDouble(3) === 3.0)
    assert(pBack(1).getDouble(3) === 6.0)

    val lines = Seq(
      (1L, "LINESTRING (0 0, 3 4)"),
      (2L, "MULTILINESTRING ((0 0, 1 0), (2 0, 2 5))"))
      .toDF("fid", "wkt").select($"fid", st_geomfromtext($"wkt").as("geometry"))
    val lPath = tmpShp("lines")
    graft.io.GeoIO.writeShapefile(lines, lPath)
    val lBack = graft.io.GeoIO.readShapefile(spark, lPath)
      .select($"fid", st_length($"geometry").as("len"))
      .orderBy($"fid").collect()
    assert(lBack(0).getDouble(1) === 5.0)
    assert(lBack(1).getDouble(1) === 6.0)
  }

  test("bbox pushdown prunes on the stored record box; columns subsetting") {
    val df = (1 to 100).map { i =>
      val x = i * 10.0
      (i.toLong, s"n$i", s"POLYGON (($x 0, ${x + 1} 0, ${x + 1} 1, $x 1, $x 0))")
    }.toDF("fid", "name", "wkt")
      .select($"fid", $"name", st_geomfromtext($"wkt").as("geometry"))
    val path = tmpShp("bbox")
    graft.io.GeoIO.writeShapefile(df, path)
    // bbox covering x in [0, 205] → fids 1..20 (x = 10..200)
    val hit = graft.io.GeoIO.readShapefile(spark, path,
      bbox = Some((0.0, 0.0, 205.0, 10.0)))
    assert(hit.count() === 20)
    // columns subset keeps dbf order and geometry
    val sub = graft.io.GeoIO.readShapefile(spark, path, columns = Some(Seq("name")))
    assert(sub.columns.toSeq === Seq("geometry", "name"))
    // readGeometry=false drops geometry (pyogrio read_geometry=False)
    val noGeo = graft.io.GeoIO.readShapefile(spark, path,
      columns = Some(Seq("fid")), readGeometry = false)
    assert(noGeo.columns.toSeq === Seq("fid"))
    assert(noGeo.agg(sum($"fid")).collect()(0).getLong(0) === 5050L)
    intercept[IllegalArgumentException] {
      graft.io.GeoIO.readShapefile(spark, path, columns = Some(Seq("nope")))
    }
  }

  test("null geometry and null attributes round-trip; empty frame") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("geometry",
        org.apache.spark.sql.types.BinaryType)))
    val wkb = Seq((1L, "POINT (1 1)"), (2L, "POINT (2 2)")).toDF("fid", "wkt")
      .select($"fid", st_aswkb(st_geomfromtext($"wkt")).as("g")).collect()
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "a", wkb(0).getAs[Array[Byte]](1)),
      org.apache.spark.sql.Row(2L, null, wkb(1).getAs[Array[Byte]](1)),
      org.apache.spark.sql.Row(3L, "c", null))
    val df = spark.createDataFrame(rows, schema)
    val path = tmpShp("nulls")
    graft.io.GeoIO.writeShapefile(df, path)
    val back = graft.io.GeoIO.readShapefile(spark, path).orderBy($"fid").collect()
    assert(back.length === 3)
    assert(back(1).getString(2) === "") // dbf has no NULL strings
    assert(back(2).isNullAt(0)) // null shape back as null geometry
  }

  test("multi-file directory read unions parts") {
    val d = java.nio.file.Files.createTempDirectory("graft_shp_dir").toString
    val mk = (from: Int, until: Int, name: String) => {
      val df = (from until until).map { i =>
        (i.toLong, s"POLYGON ((${i}.0 0, ${i + 1}.0 0, ${i + 1}.0 1, ${i}.0 1, ${i}.0 0))")
      }.toDF("fid", "wkt").select($"fid", st_geomfromtext($"wkt").as("geometry"))
      graft.io.GeoIO.writeShapefile(df, s"$d/$name.shp")
    }
    mk(0, 5, "part-0"); mk(5, 12, "part-1")
    val back = graft.io.GeoIO.readShapefile(spark, d)
    assert(back.count() === 12)
    assert(back.agg(sum($"fid")).collect()(0).getLong(0) === 66L)
  }

  test("ESRI-dialect .prj (no AUTHORITY): srid inferred, reprojection works") {
    // hand-author an ArcGIS-style sidecar next to a written shapefile
    val df = Seq((1L, "POINT (400000 -100000)"), (2L, "POINT (400100 -99900)"))
      .toDF("fid", "wkt").select($"fid", st_geomfromtext($"wkt").as("geometry"))
    val path = tmpShp("esri")
    graft.io.GeoIO.writeShapefile(df, path)
    val prj = new java.io.PrintWriter(path.replace(".shp", ".prj"))
    prj.print("""PROJCS["British_National_Grid",GEOGCS["GCS_OSGB_1936",DATUM["D_OSGB_1936",SPHEROID["Airy_1830",6377563.396,299.3249646]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",400000.0],PARAMETER["False_Northing",-100000.0],PARAMETER["Central_Meridian",-2.0],PARAMETER["Scale_Factor",0.9996012717],PARAMETER["Latitude_Of_Origin",49.0],UNIT["Meter",1.0]]""")
    prj.close()
    val back = graft.io.GeoIO.readShapefile(spark, path)
    val r = back.select(graft.functions.st_srid($"geometry").as("srid"),
        st_x(st_to_srid($"geometry", lit(4326))).as("lon"),
        st_y(st_to_srid($"geometry", lit(4326))).as("lat"))
      .orderBy($"lon").collect()
    assert(r(0).getInt(0) === 27700) // inferred from the ESRI definition
    // BNG false origin is (49N, 2W) pre-shift; OSGB36→WGS84 moves it ~120 m
    assert(math.abs(r(0).getDouble(1) + 2.0) < 0.01)
    assert(math.abs(r(0).getDouble(2) - 49.0) < 0.01)
  }
}
