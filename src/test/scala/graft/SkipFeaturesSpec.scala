package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `skip_features`/`max_features` windows on the file readers, mirroring
  * pyogrio's options on the reference's `read_file`
  * (`/root/reference/polars_st/input.py:123-138`): positional over the
  * (filename-ordered) feature sequence, applied AFTER a bbox filter when
  * one is given. Scan-level where the format allows it: shapefile counts
  * come from the .shx length and skips hop record headers; gpkg windows
  * prune whole leaf pages and jump the cell pointer array; fgb hops size
  * prefixes. */
class SkipFeaturesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** fid 1..n, point (i, i), sorted so write order == fid order. */
  private def pts(from: Int, to: Int) =
    (from to to).map(i => (i.toLong, i.toDouble))
      .toDF("fid", "x")
      .select($"fid",
        st_set_srid(st_point($"x", $"x"), lit(4326)).as("geometry"))
      .orderBy($"fid")

  private def fids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select($"fid").collect().map(_.getLong(0)).toSeq.sorted

  test("shapefile: single-file window, scan-level skip") {
    val d = tmpDir("graft_skip_shp")
    graft.io.GeoIO.writeShapefile(pts(1, 30), s"$d/t.shp")
    val w = graft.io.GeoIO.readShapefile(spark, s"$d/t.shp",
      skipFeatures = 10, maxFeatures = 5)
    assert(fids(w) === (11L to 15L))
    // open-ended skip and bare max
    assert(fids(graft.io.GeoIO.readShapefile(spark, s"$d/t.shp",
      skipFeatures = 27)) === (28L to 30L))
    assert(fids(graft.io.GeoIO.readShapefile(spark, s"$d/t.shp",
      maxFeatures = 4)) === (1L to 4L))
    // skip beyond EOF → empty
    assert(graft.io.GeoIO.readShapefile(spark, s"$d/t.shp",
      skipFeatures = 99).count() === 0L)
  }

  test("shapefile: multi-file window plans from .shx lengths and straddles") {
    val d = tmpDir("graft_skip_shp2")
    graft.io.GeoIO.writeShapefile(pts(1, 30), s"$d/a.shp")
    graft.io.GeoIO.writeShapefile(pts(31, 60), s"$d/b.shp")
    val w = graft.io.GeoIO.readShapefile(spark, d,
      skipFeatures = 25, maxFeatures = 10)
    assert(fids(w) === (26L to 35L))
    // window inside the second file only: a.shp never contributes
    assert(fids(graft.io.GeoIO.readShapefile(spark, d,
      skipFeatures = 40, maxFeatures = 3)) === (41L to 43L))
  }

  test("shapefile: window applies AFTER the bbox filter (pyogrio order)") {
    val d = tmpDir("graft_skip_shp3")
    graft.io.GeoIO.writeShapefile(pts(1, 30), s"$d/t.shp")
    // bbox keeps points 10..20; skip 3 of the matches → 13..20, max 5 → 13..17
    val w = graft.io.GeoIO.readShapefile(spark, s"$d/t.shp",
      bbox = Some((10.0, 10.0, 20.0, 20.0)),
      skipFeatures = 3, maxFeatures = 5)
    assert(fids(w) === (13L to 17L))
  }

  // the gpkg writer adds its own `fid` IPK column — use `pid` for ours
  private def gpkgPts = pts(1, 30).withColumnRenamed("fid", "pid")
  private def pids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("pid")).collect().map(_.getLong(0)).toSeq.sorted

  test("geopackage: leaf-page window, cell-pointer skip") {
    val d = tmpDir("graft_skip_gpkg")
    graft.io.GeoIO.writeGeoPackage(gpkgPts, s"$d/t.gpkg", tableName = "pts")
    val w = graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
      skipFeatures = 10, maxFeatures = 5)
    assert(pids(w) === (11L to 15L))
    assert(pids(graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
      skipFeatures = 28)) === (29L to 30L))
    assert(graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
      skipFeatures = 99).count() === 0L)
  }

  test("geopackage: window after bbox filter") {
    val d = tmpDir("graft_skip_gpkg2")
    graft.io.GeoIO.writeGeoPackage(gpkgPts, s"$d/t.gpkg", tableName = "pts")
    val w = graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
      bbox = Some((10.0, 10.0, 20.0, 20.0)),
      skipFeatures = 3, maxFeatures = 5)
    assert(pids(w) === (13L to 17L))
  }

  test("flatgeobuf: size-prefix hop window, multi-file via header counts") {
    val d = tmpDir("graft_skip_fgb")
    graft.io.GeoIO.writeFlatGeobuf(pts(1, 30), s"$d/parts/a.fgb")
    graft.io.GeoIO.writeFlatGeobuf(pts(31, 60), s"$d/parts/b.fgb")
    assert(fids(graft.io.GeoIO.readFlatGeobuf(spark, s"$d/parts/a.fgb",
      skipFeatures = 10, maxFeatures = 5)) === (11L to 15L))
    assert(fids(graft.io.GeoIO.readFlatGeobuf(spark, s"$d/parts",
      skipFeatures = 25, maxFeatures = 10)) === (26L to 35L))
  }

  test("kml + dxf: whole-document window") {
    val d = tmpDir("graft_skip_xml")
    val df = pts(1, 20).select(concat(lit("f"), $"fid".cast("string")).as("name"),
      $"geometry")
    graft.io.GeoIO.writeKml(df, s"$d/t.kml")
    val kml = graft.io.GeoIO.readKml(spark, s"$d/t.kml",
      skipFeatures = 5, maxFeatures = 3)
      .select(expr("cast(substring(name, 2) as long)").as("fid"))
    assert(fids(kml) === (6L to 8L))
    graft.io.GeoIO.writeDxf(df.select($"name".as("layer"), $"geometry"), s"$d/t.dxf")
    val dxf = graft.io.GeoIO.readDxf(spark, s"$d/t.dxf",
      skipFeatures = 15, maxFeatures = 99)
      .select(expr("cast(substring(layer, 2) as long)").as("fid"))
    assert(fids(dxf) === (16L to 20L))
  }

  test("kml + gpx: multi-file window straddles files (lazy chunked counts)") {
    val d = tmpDir("graft_skip_xml2")
    def named(from: Int, to: Int) = pts(from, to)
      .select(concat(lit("f"), $"fid".cast("string")).as("name"), $"geometry")
    graft.io.GeoIO.writeKml(named(1, 12), s"$d/a.kml")
    graft.io.GeoIO.writeKml(named(13, 24), s"$d/b.kml")
    val kml = graft.io.GeoIO.readKml(spark, d, skipFeatures = 10, maxFeatures = 5)
      .select(expr("cast(substring(name, 2) as long)").as("fid"))
    assert(fids(kml) === (11L to 15L))
    graft.io.GeoIO.writeGpx(named(1, 12), s"$d/a.gpx")
    graft.io.GeoIO.writeGpx(named(13, 24), s"$d/b.gpx")
    val gpx = graft.io.GeoIO.readGpx(spark, d, "waypoints",
      skipFeatures = 10, maxFeatures = 5)
      .select(expr("cast(substring(name, 2) as long)").as("fid"))
    assert(fids(gpx) === (11L to 15L))
  }

  test("shapefile: fids random access, where filter, force2D") {
    val d = tmpDir("graft_fids_shp")
    // 3D points so force2D is observable
    val df = (1 to 30).map(i => (i.toLong, i.toDouble)).toDF("fid", "x")
      .select($"fid", st_set_srid(
        st_point($"x", $"x", $"x" / 2.0), lit(4326)).as("geometry"))
      .orderBy($"fid")
    graft.io.GeoIO.writeShapefile(df, s"$d/a.shp")
    graft.io.GeoIO.writeShapefile(
      df.select($"fid" + 30 as "fid", $"geometry").orderBy($"fid"), s"$d/b.shp")
    // global 0-based fids across the filename-ordered pair: 2→fid 3,
    // 29→fid 30 (last of a), 30→fid 31 (first of b), 55→fid 56
    val got = graft.io.GeoIO.readShapefile(spark, d,
      fids = Some(Seq(2L, 29L, 30L, 55L)))
    assert(fids(got) === Seq(3L, 30L, 31L, 56L))
    // out-of-range fids are skipped, not errors
    assert(graft.io.GeoIO.readShapefile(spark, s"$d/a.shp",
      fids = Some(Seq(7L, 999L))).count() === 1L)
    // where: SQL over the attributes, Catalyst-applied
    val w = graft.io.GeoIO.readShapefile(spark, s"$d/a.shp",
      where = Some("fid % 10 = 0"))
    assert(fids(w) === Seq(10L, 20L, 30L))
    // force2D drops Z
    val z3 = graft.io.GeoIO.readShapefile(spark, s"$d/a.shp")
      .select(st_has_z($"geometry").as("hz")).distinct()
    assert(z3.collect().map(_.getBoolean(0)).toSeq === Seq(true))
    val z2 = graft.io.GeoIO.readShapefile(spark, s"$d/a.shp", force2D = true)
      .select(st_has_z($"geometry").as("hz")).distinct()
    assert(z2.collect().map(_.getBoolean(0)).toSeq === Seq(false))
    // pyogrio rule: fids excludes windows
    intercept[IllegalArgumentException] {
      graft.io.GeoIO.readShapefile(spark, s"$d/a.shp",
        fids = Some(Seq(1L)), skipFeatures = 1)
    }
  }

  test("geopackage: fids are b-tree point lookups") {
    val d = tmpDir("graft_fids_gpkg")
    graft.io.GeoIO.writeGeoPackage(gpkgPts, s"$d/t.gpkg", tableName = "pts")
    // gpkg fids are rowids (1-based write order here)
    val got = graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
      fids = Some(Seq(3L, 17L, 30L, 99L)))
    assert(pids(got) === Seq(3L, 17L, 30L))
    val w = graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
      where = Some("pid > 25"))
    assert(pids(w) === (26L to 30L))
    intercept[IllegalArgumentException] {
      graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
        fids = Some(Seq(1L)), maxFeatures = 5)
    }
  }

  test("return_fids: shapefile scan/bbox/window/fids numbering agrees") {
    // VERDICT r8 #5 (pyogrio's return_fids, input.py:45): the reader
    // surfaces the record number it already navigates by. The fid is the
    // 0-based record index, global across a filename-ordered directory
    // read, and INDEPENDENT of bbox/window shaping (a bbox read's fids
    // are the pre-filter record numbers — exactly what a later fids=
    // random access would accept).
    val d = tmpDir("graft_rfid_shp")
    graft.io.GeoIO.writeShapefile(pts(1, 30).withColumnRenamed("fid", "pid"),
      s"$d/a.shp")
    graft.io.GeoIO.writeShapefile(pts(31, 60).withColumnRenamed("fid", "pid"),
      s"$d/b.shp")
    def got(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("fid"), col("pid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // full directory scan: fid i-1 ↔ pid i (write order == record order)
    val all = graft.io.GeoIO.readShapefile(spark, d, returnFids = true)
    assert(got(all) === (1L to 60L).map(i => (i - 1, i)))
    // bbox read: fids are PRE-filter record numbers
    val bb = graft.io.GeoIO.readShapefile(spark, d,
      bbox = Some((40.0, 40.0, 45.0, 45.0)), returnFids = true)
    assert(got(bb) === (40L to 45L).map(i => (i - 1, i)))
    // window: fids reflect the window's absolute position
    val w = graft.io.GeoIO.readShapefile(spark, d,
      skipFeatures = 35, maxFeatures = 4, returnFids = true)
    assert(got(w) === (36L to 39L).map(i => (i - 1, i)))
    // fids random access returns the requested ids themselves
    val ra = graft.io.GeoIO.readShapefile(spark, d,
      fids = Some(Seq(0L, 33L, 59L, 999L)), returnFids = true)
    assert(got(ra) === Seq((0L, 1L), (33L, 34L), (59L, 60L)))
    // round trip: a bbox read's fids re-fetch the same rows
    val refetch = graft.io.GeoIO.readShapefile(spark, d,
      fids = Some(got(bb).map(_._1)), returnFids = true)
    assert(got(refetch) === got(bb))
  }

  test("return_fids: geopackage rowids and flatgeobuf ordinals") {
    val d = tmpDir("graft_rfid_rest")
    // gpkg: fid = sqlite rowid (the id fids= accepts). Our writer's IPK
    // column is itself named fid, so exclude it via columns= — with it
    // kept, returnFids raises the documented collision error
    graft.io.GeoIO.writeGeoPackage(gpkgPts, s"$d/t.gpkg", tableName = "pts")
    assertThrows[IllegalArgumentException] {
      graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg", returnFids = true)
    }
    val g = graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
      columns = Some(Seq("pid")), returnFids = true)
    val gp = g.select(col("fid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(gp.map(_._2) === (1L to 30L))
    val refetch = graft.io.GeoIO.readGeoPackage(spark, s"$d/t.gpkg",
      columns = Some(Seq("pid")), fids = Some(gp.take(5).map(_._1)),
      returnFids = true)
    assert(refetch.select(col("fid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted === gp.take(5))
    // fgb: fid = feature ordinal in file order; the INDEXED bbox read
    // (R-tree leaf indices) must agree with a full-scan manual filter
    val df = pts(1, 30).withColumnRenamed("fid", "pid")
    graft.io.GeoIO.writeFlatGeobuf(df, s"$d/t.fgb", spatialIndex = true)
    val full = graft.io.GeoIO.readFlatGeobuf(spark, s"$d/t.fgb", returnFids = true)
    val fullPairs = full.select(col("fid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fullPairs.keys.toSeq.sorted === (0L until 30L))
    val fbb = graft.io.GeoIO.readFlatGeobuf(spark, s"$d/t.fgb",
      bbox = Some((10.0, 10.0, 20.0, 20.0)), returnFids = true)
    val fbbPairs = fbb.select(col("fid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fbbPairs.map(_._2) === (10L to 20L).toSet)
    // each bbox hit carries the SAME fid the full scan assigned that row
    fbbPairs.foreach { case (fid, pid) =>
      assert(fullPairs(fid) === pid, s"fgb fid $fid maps to ${fullPairs(fid)}, not $pid")
    }
  }

  test("read_file dispatcher: extension routing, options, and the sql= path") {
    // VERDICT r8 #7: the reference's one-call read_file (input.py:30-153)
    // — extension dispatch, native pushdown where the codec has one,
    // order-correct Catalyst fallbacks elsewhere, and sql= as
    // register-view + Spark SQL (OGR dialects documented out).
    val d = tmpDir("graft_readfile")
    val df = pts(1, 30).withColumnRenamed("fid", "pid")
    graft.io.GeoIO.writeShapefile(df, s"$d/boxes.shp")
    // native pushdown route (shapefile window)
    val w = graft.io.GeoIO.readFile(spark, s"$d/boxes.shp",
      skipFeatures = 5, maxFeatures = 3)
    assert(w.select(col("pid")).collect().map(_.getLong(0)).sorted.toSeq === (6L to 8L))
    // sql= over the basename view
    val agg = graft.io.GeoIO.readFile(spark, s"$d/boxes.shp",
      sql = Some("SELECT count(*) AS n, sum(pid) AS s FROM boxes WHERE pid <= 10"))
    val row = agg.collect()(0)
    assert((row.getLong(0), row.getLong(1)) === (10L, 55L))
    // sql composes with reader options (columns pushdown feeds the view)
    val agg2 = graft.io.GeoIO.readFile(spark, s"$d/boxes.shp",
      columns = Some(Seq("pid")), readGeometry = false,
      sql = Some("SELECT max(pid) AS m FROM boxes"))
    assert(agg2.collect()(0).getLong(0) === 30L)
    // OGR dialects are not emulated
    assertThrows[IllegalArgumentException] {
      graft.io.GeoIO.readFile(spark, s"$d/boxes.shp",
        sql = Some("SELECT 1"), sqlDialect = Some("OGRSQL"))
    }
    // generic-bbox formats reject bbox+window (would reorder filter/window)
    graft.io.GeoIO.writeKml(df.select(col("pid").cast("string").as("name"),
      col("geometry")), s"$d/t.kml")
    assertThrows[IllegalArgumentException] {
      graft.io.GeoIO.readFile(spark, s"$d/t.kml",
        bbox = Some((0.0, 0.0, 10.0, 10.0)), skipFeatures = 2)
    }
    // but bare generic bbox works (post-read envelope filter)
    val kb = graft.io.GeoIO.readFile(spark, s"$d/t.kml",
      bbox = Some((10.0, 10.0, 20.0, 20.0)))
    assert(kb.count() === 11)
    // unknown extension → clear error
    assertThrows[IllegalArgumentException] {
      graft.io.GeoIO.readFile(spark, s"$d/boxes.tab")
    }
    // review r9: a DIRECTORY of shapefiles dispatches on the recognized
    // data extension, not whichever sidecar (.dbf/.prj/.shx) lists first
    val shpDir = tmpDir("graft_readfile_dir")
    graft.io.GeoIO.writeShapefile(df, s"$shpDir/only.shp")
    val dirRead = graft.io.GeoIO.readFile(spark, shpDir)
    assert(dirRead.count() === 30)
    // review r9: a pre-existing temp view with the target name is the
    // user's — collide loudly, and leave it intact
    spark.range(3).createOrReplaceTempView("boxes")
    try {
      assertThrows[IllegalArgumentException] {
        graft.io.GeoIO.readFile(spark, s"$d/boxes.shp", sql = Some("SELECT 1"))
      }
      assert(spark.table("boxes").count() === 3, "user view destroyed")
    } finally spark.catalog.dropTempView("boxes")
    // review r9: fgb columns= keeps the fid column return_fids asked for
    graft.io.GeoIO.writeFlatGeobuf(df, s"$d/t.fgb")
    val ff = graft.io.GeoIO.readFile(spark, s"$d/t.fgb",
      columns = Some(Seq("pid")), returnFids = true)
    assert(ff.columns.toSeq === Seq("fid", "geometry", "pid"))
    assert(ff.select(col("fid")).collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 30L))
    // review r9 round 2: listing geometry in columns= must not duplicate it
    val fg = graft.io.GeoIO.readFile(spark, s"$d/t.fgb",
      columns = Some(Seq("geometry", "pid")))
    assert(fg.columns.count(_ == "geometry") === 1)
    // where references a PRUNED column: OGR filters before selection
    val fw = graft.io.GeoIO.readFile(spark, s"$d/t.fgb",
      columns = Some(Seq("pid")), where = Some("pid <= 5"))
    assert(fw.count() === 5)
    val fw2 = graft.io.GeoIO.readFile(spark, s"$d/t.fgb",
      columns = Some(Seq()), where = Some("pid <= 5"), readGeometry = true)
    assert(fw2.count() === 5 && fw2.columns.toSeq === Seq("geometry"))
    // a directory whose NAME contains a dot still lists its contents
    val dotDir = tmpDir("graft_rf_dot") + "/run.2024"
    new java.io.File(dotDir).mkdirs()
    graft.io.GeoIO.writeShapefile(df, s"$dotDir/only.shp")
    assert(graft.io.GeoIO.readFile(spark, dotDir).count() === 30)
  }

  test("geojson: declarative posexplode window across files") {
    val d = tmpDir("graft_skip_gj")
    def fc(from: Int, to: Int): String =
      (from to to).map(i =>
        s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[$i,$i]},"properties":{"fid":$i}}""")
        .mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "a.json"),
      fc(1, 30).getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "b.json"),
      fc(31, 60).getBytes("UTF-8"))
    val w = graft.io.GeoIO.readGeoJson(spark, d,
      skipFeatures = 25, maxFeatures = 10)
    assert(w.select($"fid").collect().map(_.getLong(0)).toSeq.sorted === (26L to 35L))
    // unwindowed read unchanged
    assert(graft.io.GeoIO.readGeoJson(spark, d).count() === 60L)
  }
}
