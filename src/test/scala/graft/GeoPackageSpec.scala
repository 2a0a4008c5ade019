package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._
import graft.io.{GeoIO, GeoPackage, Sqlite}

/** Pure-JVM SQLite codec + GeoPackage round-trips. */
class GeoPackageSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- sqlite

  test("sqlite codec round-trips typed rows, many pages, overflow chains") {
    val w = new Sqlite.SqliteWriter(pageSize = 512) // tiny pages → multi-level tree
    val longText = "x" * 5000 // > usable → overflow chain
    val rows = (1L to 500L).map { i =>
      (i, Seq[Any](null, i * 1000003L, i / 4.0, s"row-$i",
        Array[Byte](1, 2, i.toByte), if (i == 77) longText else "t"))
    }
    w.addTable("t", "CREATE TABLE t (a INTEGER, b INTEGER, c REAL, d TEXT, e BLOB, f TEXT)", rows)
    val bytes = w.build()
    val db = new Sqlite.SqliteDb(new Sqlite.BytesAccess(bytes))
    val master = db.master
    assert(master.map(_.name) == Seq("t"))
    // multi-level: more than one leaf under the root
    assert(db.leafPages(master.head.rootPage).length > 1)
    val got = db.tableRows(master.head.rootPage).toVector
    assert(got.length == 500)
    assert(got.map(_._1) == (1L to 500L)) // rowid order
    val r77 = got(76)._2
    assert(r77(0) == null)
    assert(r77(1) == 77L * 1000003L)
    assert(r77(2) == 77 / 4.0)
    assert(r77(3) == "row-77")
    assert(r77(4).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 77))
    assert(r77(5) == longText) // overflow chain reassembled
  }

  test("sqlite IPK column: record stores NULL, reader recovers via rowid") {
    val w = new Sqlite.SqliteWriter()
    w.addTable("t", "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)",
      Seq((10L, Seq[Any](null, "a")), (20L, Seq[Any](null, "b"))), ipkOrdinal = 0)
    val db = new Sqlite.SqliteDb(new Sqlite.BytesAccess(w.build()))
    val got = db.tableRows(db.master.head.rootPage).toVector
    assert(got.map(_._1) == Seq(10L, 20L))
    assert(got.forall(_._2(0) == null)) // stored NULL; caller substitutes rowid
  }

  test("create-table parser: quoted names, constraints, IPK") {
    val cols = GeoPackage.parseCreateTable(
      """CREATE TABLE "my layer" (fid INTEGER PRIMARY KEY AUTOINCREMENT,
        | geom GEOMETRY, "weird name" TEXT NOT NULL, [brackets] REAL,
        | `ticks` BLOB, n NUMERIC(10,2),
        | CONSTRAINT pk PRIMARY KEY (fid), CHECK (n > 0))""".stripMargin)
    assert(cols.map(_.name) ==
      Seq("fid", "geom", "weird name", "brackets", "ticks", "n"))
    assert(cols.head.ipk)
    assert(!cols(1).ipk)
    assert(cols(3).sqlType == "REAL")
    assert(cols(5).sqlType == "NUMERIC(10,2)")
  }

  // --------------------------------------------------------- geopackage

  test("geopackage round trip: geometry, attributes, srid, layer metadata") {
    val df = (1 to 300).toDF("k").select(
      col("k").cast("long").as("k"),
      concat(lit("name-"), col("k")).as("name"),
      (col("k") / 4.0).as("score"),
      (col("k") % 2 === 0).as("flag"),
      st_set_srid(st_rectangle(col("k") * 10.0, lit(0.0),
        col("k") * 10.0 + 4.0, lit(2.0)), lit(4326)).as("geometry"))
    val path = "/tmp/graft_test_gpkg/t.gpkg"
    new java.io.File("/tmp/graft_test_gpkg").mkdirs()
    GeoIO.writeGeoPackage(df, path, tableName = "boxes")
    val back = GeoIO.readGeoPackage(spark, path)
    assert(back.columns.toSeq ==
      Seq("geometry", "fid", "k", "name", "score", "flag"))
    val rows = back.select(col("fid"), col("k"), col("name"), col("score"),
        col("flag"), st_area(col("geometry")).as("area"),
        graft.functions.st_srid(col("geometry")).as("srid"))
      .orderBy(col("k")).collect()
    assert(rows.length == 300)
    assert(rows.forall(_.getDouble(5) == 8.0))
    assert(rows.forall(_.getInt(6) == 4326))
    assert(rows.map(_.getLong(0)).toSeq == (1L to 300L)) // fid from rowid
    assert(rows.map(_.getString(2)).take(2).toSeq == Seq("name-1", "name-2"))
    assert(rows.count(_.getBoolean(4)) == 150)
    // layer discovery sees the declared metadata
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val db = new Sqlite.SqliteDb(
        new Sqlite.HadoopAccess(in, fs.getFileStatus(p).getLen))
      assert(db.applicationId == 0x47504B47L) // "GPKG"
      val lay = GeoPackage.layers(db)
      assert(lay.map(_.table) == Seq("boxes"))
      assert(lay.head.srid == 4326)
      assert(lay.head.geometryType == "POLYGON")
    } finally in.close()
  }

  test("geopackage read: column subset, bbox pushdown, readGeometry=false") {
    val df = (1 to 100).toDF("k").select(
      col("k").cast("long").as("k"),
      concat(lit("n"), col("k")).as("name"),
      st_set_srid(st_point(col("k") * 1.0, col("k") * 1.0), lit(4326)).as("geometry"))
    val path = "/tmp/graft_test_gpkg/sub.gpkg"
    GeoIO.writeGeoPackage(df, path, tableName = "pts")
    val sub = GeoIO.readGeoPackage(spark, path, columns = Some(Seq("k")))
    assert(sub.columns.toSeq == Seq("geometry", "k"))
    // bbox prune on the stored blob envelope
    val bb = GeoIO.readGeoPackage(spark, path, bbox = Some((0.0, 0.0, 30.5, 30.5)))
    assert(bb.count() == 30)
    val noGeom = GeoIO.readGeoPackage(spark, path, readGeometry = false)
    assert(noGeom.columns.toSeq == Seq("fid", "k", "name"))
    assert(noGeom.count() == 100)
    // null geometry rows survive
    val withNull = df.unionAll(Seq((999L, "nullgeom"))
      .toDF("k", "name").select(col("k"), col("name"), lit(null).cast("binary").as("geometry"))
      .select(col("k"), col("name"), col("geometry")))
    GeoIO.writeGeoPackage(withNull, path, tableName = "pts")
    val back = GeoIO.readGeoPackage(spark, path)
    assert(back.count() == 101)
    assert(back.filter(col("geometry").isNull).select("k").as[Long].collect().toSeq == Seq(999L))
  }

  test("foreign gpkg fixture (written by real SQLite) reads correctly") {
    // src/test/resources/foreign.gpkg: 512-byte pages (multi-level trees),
    // freelist churn, an overflow-chain text row, a NULL-geometry row, and
    // real automatic indexes — bytes our writer never produced.
    val url = getClass.getResource("/foreign.gpkg")
    assume(url != null, "fixture missing")
    val path = url.getPath
    val df = GeoIO.readGeoPackage(spark, path)
    assert(df.columns.toSeq == Seq("geometry", "fid", "name", "v", "tag"))
    assert(df.count() == 390) // 400 - 11 deleted + 1 late insert
    val agg = df.agg(min("fid"), max("fid"), sum("v")).collect()(0)
    assert(agg.getLong(0) == 1L && agg.getLong(1) == 401L)
    // sum(i/8, i=1..400) - sum(i/8, i=50..60); late row has NULL v
    assert(agg.getDouble(2) == (1 to 400).map(_ / 8.0).sum - (50 to 60).map(_ / 8.0).sum)
    // overflow-chain text row reassembled
    val big = df.filter(col("fid") === 177).select("name").as[String].head()
    assert(big == "long-" + "z" * 2000)
    // NULL geometry row survives; real rows carry the layer SRID
    assert(df.filter(col("geometry").isNull).select("name").as[String]
      .collect().toSeq == Seq("nullgeom"))
    val one = df.filter(col("fid") === 7)
      .select(graft.functions.st_aswkt(col("geometry")),
        graft.functions.st_srid(col("geometry"))).collect()(0)
    assert(one.getString(0) == "POINT (7 7)")
    assert(one.getInt(1) == 4326)
    // bbox prune against stored envelopes
    assert(GeoIO.readGeoPackage(spark, path,
      bbox = Some((0.0, 0.0, 40.5, 40.5))).count() == 40)
  }

  test("gpkg geometry blob codec: srid, envelope read-back, empty geometry") {
    val g = graft.serde.EWKB.read(graft.serde.EWKB.write {
      val r = new org.locationtech.jts.io.WKTReader(graft.serde.EWKB.geometryFactory)
      val geom = r.read("POLYGON((0 0, 4 0, 4 2, 0 2, 0 0))")
      geom.setSRID(3857)
      geom
    })
    val blob = GeoPackage.writeGeometryBlob(g, 3857)
    val (back, env) = GeoPackage.readGeometryBlob(blob)
    assert(back.getSRID == 3857)
    assert(back.getArea == 8.0)
    assert(env.toSeq == Seq(0.0, 4.0, 0.0, 2.0)) // minx, maxx, miny, maxy
    val empty = graft.serde.EWKB.geometryFactory.createPolygon()
    val eb = GeoPackage.writeGeometryBlob(empty, 4326)
    val (eg, _) = GeoPackage.readGeometryBlob(eb)
    assert(eg.isEmpty)
    assert(eg.getSRID == 4326)
  }
}
