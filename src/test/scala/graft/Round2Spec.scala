package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.api._
import graft.functions.{st_point, st_rectangle}

/** Round-2 surface: st namespace, CRS breadth, sjoin hardening, ordered
  * difference_all, image header decode, from_coords dispatch. */
class Round2Spec extends AnyFunSuite with BeforeAndAfterAll {

  // single shared session for the whole test JVM (carries GraftExtensions)
  private lazy val spark: SparkSession = TestSpark.spark
  // the session is shared across suites (getOrCreate) — do NOT stop it here:
  // a stopped context makes the next suite build a fresh one whose broadcast
  // ids restart, which is exactly the stale-cache hazard TreeCache guards
  override def afterAll(): Unit = ()

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(1).toDF("i").select(c).collect()(0).get(0).asInstanceOf[T]
  }

  test("st namespace mirrors package functions") {
    val g = st_rectangle(lit(0.0), lit(0.0), lit(4.0), lit(2.0))
    assert(one[Double](g.st.area) === 8.0)
    assert(one[Double](g.st.length) === 12.0)
    assert(one[String](g.st.geometryType) === "Polygon")
    assert(one[Boolean](g.st.contains(st_point(lit(1.0), lit(1.0)))))
    assert(one[Double](g.st.buffer(1.0).st.area) > 8.0)
    assert(one[String](g.st.centroid.st.asWkt) === "POINT (2 1)")
  }

  test("from_coords dispatches on nesting depth") {
    import org.apache.spark.sql.types._
    import graft.functions.st_from_coords
    val p = st_from_coords(array(lit(1.0), lit(2.0)), ArrayType(DoubleType))
    assert(one[String](p.st.asWkt) === "POINT (1 2)")
    val l = st_from_coords(array(array(lit(0.0), lit(0.0)), array(lit(3.0), lit(4.0))),
      ArrayType(ArrayType(DoubleType)))
    assert(one[Double](l.st.length) === 5.0)
    val poly = st_from_coords(array(array(
      array(lit(0.0), lit(0.0)), array(lit(2.0), lit(0.0)),
      array(lit(2.0), lit(2.0)), array(lit(0.0), lit(0.0)))),
      ArrayType(ArrayType(ArrayType(DoubleType))))
    assert(one[Double](poly.st.area) === 2.0)
    assertThrows[IllegalArgumentException] {
      st_from_coords(lit(1.0), DoubleType)
    }
  }

  test("CRS: UTM and world-mercator round trips, authority, from_code") {
    val p = st_point(lit(15.25), lit(47.5)).st.setSrid(lit(4326))
    val utm = p.st.toSrid(lit(32633))
    assert(one[Int](utm.st.srid) === 32633)
    val x = one[Double](utm.st.x)
    assert(x > 100000 && x < 900000, s"utm easting out of range: $x")
    val back = utm.st.toSrid(lit(4326))
    assert(math.abs(one[Double](back.st.x) - 15.25) < 1e-8)
    assert(math.abs(one[Double](back.st.y) - 47.5) < 1e-8)
    // southern hemisphere zone
    val s = st_point(lit(-58.5), lit(-34.5)).st.setSrid(lit(4326))
      .st.toSrid(lit(32721)).st.toSrid(lit(4326))
    assert(math.abs(one[Double](s.st.y) - (-34.5)) < 1e-8)
    // world mercator
    val wm = p.st.toSrid(lit(3395)).st.toSrid(lit(4326))
    assert(math.abs(one[Double](wm.st.y) - 47.5) < 1e-9)
    // authority / from_code
    import graft.functions.{st_get_crs_authority, st_get_crs_from_code}
    val auth = one[org.apache.spark.sql.Row](
      st_get_crs_authority(lit("urn:ogc:def:crs:EPSG::4326")))
    assert(auth.getString(0) === "EPSG" && auth.getInt(1) === 4326)
    assert(one[String](st_get_crs_from_code(lit(32721))).contains("UTM zone 21S"))
    // Lambert-93 (LCC 2SP): Paris forward matches the published grid to ~cm
    val paris = st_point(lit(2.3522), lit(48.8566)).st.setSrid(lit(4326))
      .st.toSrid(lit(2154))
    assert(math.abs(one[Double](paris.st.x) - 652469.0) < 10.0)
    assert(math.abs(one[Double](paris.st.y) - 6862035.0) < 10.0)
    val lccBack = paris.st.toSrid(lit(4326))
    assert(math.abs(one[Double](lccBack.st.x) - 2.3522) < 1e-8)
    assert(math.abs(one[Double](lccBack.st.y) - 48.8566) < 1e-8)
    // Canada Atlas Lambert round trip
    val yyz = st_point(lit(-79.38), lit(43.65)).st.setSrid(lit(4326))
      .st.toSrid(lit(3978)).st.toSrid(lit(4326))
    assert(math.abs(one[Double](yyz.st.y) - 43.65) < 1e-8)
    // 27700/2056 (r5 table), 5514 (r6 Krovak), 27200 (r7 NZ Map Grid),
    // 29873 (r10 Hotine Oblique Mercator) and 5880 (r10 Polyconic) are
    // supported; a code outside every family still raises (2000 is
    // Anguilla 1957 / British West Indies Grid — not registered)
    assert(one[Array[Byte]](p.st.toSrid(lit(27700))) != null)
    assert(one[Array[Byte]](p.st.toSrid(lit(2056))) != null)
    assert(one[Array[Byte]](p.st.toSrid(lit(5514))) != null)
    assert(one[Array[Byte]](p.st.toSrid(lit(27200))) != null)
    assert(one[Array[Byte]](p.st.toSrid(lit(29873))) != null)
    assert(one[Array[Byte]](p.st.toSrid(lit(5880))) != null)
    val ex = intercept[Exception] {
      one[Array[Byte]](p.st.toSrid(lit(2000)))
    }
    assert(ex.getMessage.contains("to_srid") || ex.getCause != null)
  }

  test("sjoin broadcast guard falls back to the grid tier") {
    import spark.implicits._
    val left = (1 to 100).toDF("k")
      .select(col("k"), st_rectangle(col("k") * 10.0, lit(0.0),
        col("k") * 10.0 + 5.0, lit(5.0)).as("geometry"))
    val right = (1 to 100).toDF("k2")
      .select(col("k2"), st_point(col("k2") * 10.0 + 2.0, lit(2.0)).as("geometry"))
    // guard of 10 rows forces the partitioned path; result must be identical
    val viaGrid = graft.join.SpatialJoin.sjoin(left, right, "contains", "inner",
      maxBuildRows = 10)
    val direct = graft.join.SpatialJoin.sjoin(left, right, "contains", "inner")
    assert(viaGrid.count() === 100)
    assert(direct.count() === 100)
    assert(viaGrid.select("k", "k2").as[(Int, Int)].collect().toSet ===
      direct.select("k", "k2").as[(Int, Int)].collect().toSet)
  }

  test("quadtree sjoin matches the grid tier on skewed data") {
    import spark.implicits._
    // skew: 300 small rects clustered in [0,30]², 50 spread over [0,5000]²
    val lrows = (1 to 300).map { i =>
      (i, (i % 30).toDouble, (i / 30).toDouble * 3.0)
    } ++ (301 to 350).map { i => (i, (i % 50) * 100.0, (i / 50) * 500.0) }
    val left = lrows.toDF("k", "x", "y")
      .select(col("k"), st_rectangle(col("x"), col("y"),
        col("x") + 2.0, col("y") + 2.0).as("geometry"))
    val right = lrows.toDF("p", "x", "y")
      .select(col("p"), st_point(col("x") + 1.0, col("y") + 1.0).as("geometry"))
    val viaQt = graft.join.SpatialJoin.sjoinQuadtree(left, right, "contains",
      sampleSize = 200, leafCapacity = 16, maxDepth = 8)
      .select("k", "p").as[(Int, Int)].collect().toSet
    val viaGrid = graft.join.SpatialJoin.sjoinPartitioned(left, right, 8.0, "contains")
      .select("k", "p").as[(Int, Int)].collect().toSet
    assert(viaQt === viaGrid)
    assert(viaQt.size >= 350, s"each point at least in its own rect: ${viaQt.size}")
  }

  test("sjoin partitioned outer joins") {
    import spark.implicits._
    val left = (1 to 10).toDF("k")
      .select(col("k"), st_rectangle(col("k") * 10.0, lit(0.0),
        col("k") * 10.0 + 5.0, lit(5.0)).as("geometry"))
    val rightHalf = (1 to 5).toDF("k2")
      .select(col("k2"), st_point(col("k2") * 10.0 + 2.0, lit(2.0)).as("geometry"))
    val lj = graft.join.SpatialJoin.sjoinPartitioned(left, rightHalf, 10.0,
      "contains", "left")
    assert(lj.count() === 10)
    assert(lj.filter(col("k2").isNull).count() === 5)
    val rj = graft.join.SpatialJoin.sjoinPartitioned(rightHalf, left, 10.0,
      "within", "right")
    assert(rj.count() === 10)
    assert(rj.filter(col("k2").isNull).count() === 5)
  }

  test("difference_all_ordered minuend is the min-order row regardless of partitioning") {
    import spark.implicits._
    import graft.functions.st_difference_all_ordered
    // minuend idx=0: big box; others: disjoint inner boxes
    val rows = Seq(
      (0L, 0.0, 0.0, 10.0, 10.0),
      (1L, 1.0, 1.0, 2.0, 2.0),
      (2L, 4.0, 4.0, 5.0, 5.0)
    )
    for (parts <- Seq(1, 3)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts)).toDF("i", "x0", "y0", "x1", "y1")
        .select(col("i"), st_rectangle(col("x0"), col("y0"), col("x1"), col("y1")).as("g"))
      val area = df.agg(
        graft.functions.st_area(st_difference_all_ordered(col("g"), col("i"))).as("a"))
        .as[Double].collect()(0)
      assert(area === 98.0, s"parts=$parts")
    }
    // r9 sweep: Long.MaxValue is a REAL order value, not the internal
    // sentinel — a lone row at that index must still become the minuend
    // (the old `idx < sentinel` test misfiled it and returned EMPTY), and
    // a MaxValue minuend with a smaller-index companion still works
    for (parts <- Seq(1, 2)) {
      val lone = spark.createDataFrame(spark.sparkContext.parallelize(
          Seq((Long.MaxValue, 0.0, 0.0, 10.0, 10.0)), parts))
        .toDF("i", "x0", "y0", "x1", "y1")
        .select(col("i"), st_rectangle(col("x0"), col("y0"), col("x1"), col("y1")).as("g"))
      val loneArea = lone.agg(
        graft.functions.st_area(st_difference_all_ordered(col("g"), col("i"))).as("a"))
        .as[Double].collect()(0)
      assert(loneArea === 100.0, s"lone MaxValue row discarded (parts=$parts)")
      val mixed = spark.createDataFrame(spark.sparkContext.parallelize(
          Seq((0L, 0.0, 0.0, 10.0, 10.0), (Long.MaxValue, 1.0, 1.0, 2.0, 2.0)), parts))
        .toDF("i", "x0", "y0", "x1", "y1")
        .select(col("i"), st_rectangle(col("x0"), col("y0"), col("x1"), col("y1")).as("g"))
      val mixedArea = mixed.agg(
        graft.functions.st_area(st_difference_all_ordered(col("g"), col("i"))).as("a"))
        .as[Double].collect()(0)
      assert(mixedArea === 99.0, s"MaxValue subtrahend mishandled (parts=$parts)")
    }
  }

  test("GeoJSON FeatureCollection reader round-trips") {
    import spark.implicits._
    val df = (1 to 5).toDF("k")
      .select(col("k"), st_rectangle(col("k") * 10.0, lit(0.0),
        col("k") * 10.0 + 4.0, lit(2.0)).as("geometry"))
    val fc = graft.io.GeoIO.toGeoJsonFeatureCollection(df)
    val path = "/tmp/graft_test_fc.geojson"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), fc)
    val back = graft.io.GeoIO.readGeoJson(spark, path)
    assert(back.count() === 5)
    assert(back.columns.toSet === Set("geometry", "k"))
    val areas = back.select(col("k").cast("int"),
      graft.functions.st_area(col("geometry"))).as[(Int, Double)].collect().toMap
    assert(areas === (1 to 5).map(_ -> 8.0).toMap)
  }

  test("GeoParquet bbox read prunes on the covering column") {
    import spark.implicits._
    val df = (1 to 100).toDF("k")
      .select(col("k"), st_rectangle(col("k") * 10.0, lit(0.0),
        col("k") * 10.0 + 4.0, lit(2.0)).as("geometry"))
    val path = "/tmp/graft_test_bbox_pq"
    graft.io.GeoIO.writeGeoParquet(df, path)
    val hit = graft.io.GeoIO.readGeoParquet(spark, path,
      bbox = Some((0.0, 0.0, 305.0, 10.0)))
    // rects with xmin <= 305: k*10 <= 305 → k <= 30
    assert(hit.count() === 30)
    assert(!hit.columns.contains(graft.io.GeoIO.BboxColumn))
    // no covering column → per-row envelope fallback, same result
    graft.io.GeoIO.writeGeoParquet(df, path + "2", writeBbox = false)
    assert(graft.io.GeoIO.readGeoParquet(spark, path + "2",
      bbox = Some((0.0, 0.0, 305.0, 10.0))).count() === 30)
  }

  test("GeoParquet metadata sidecar: inferred types/CRS, mixed SRIDs rejected") {
    import spark.implicits._
    val df = (1 to 10).toDF("k")
      .select(col("k"), graft.functions.st_set_srid(st_rectangle(col("k") * 10.0,
        lit(0.0), col("k") * 10.0 + 4.0, lit(2.0)), lit(4326)).as("geometry"))
    val path = "/tmp/graft_test_meta_pq"
    graft.io.GeoIO.writeGeoParquet(df, path, writeMetadata = true)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_geo_metadata.json")), "UTF-8")
    assert(json.contains("\"geometry_types\":[\"Polygon\"]"))
    assert(json.contains("\"srid\":4326"))
    assert(json.contains("WGS 84"))
    // mixed SRIDs → reject, like the reference write_file
    val mixed = df.limit(5).unionAll(
      df.limit(5).select(col("k"),
        graft.functions.st_set_srid(col("geometry"), lit(3857)).as("geometry")))
    assertThrows[IllegalArgumentException] {
      graft.io.GeoIO.writeGeoParquet(mixed, path + "2", writeMetadata = true)
    }
  }

  test("GeoParquet footer metadata + standard WKB encoding round-trip") {
    import spark.implicits._
    val df = (1 to 50).toDF("k")
      .select(col("k"), graft.functions.st_set_srid(st_rectangle(col("k") * 10.0,
        lit(0.0), col("k") * 10.0 + 4.0, lit(2.0)), lit(4326)).as("geometry"))
    val path = "/tmp/graft_test_footer_pq"
    graft.io.GeoIO.writeGeoParquet(df, path, writeMetadata = true, encoding = "WKB")
    // discovery straight from the parquet FOOTER (sidecar removed to prove it)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path, "_geo_metadata.json"))
    val meta = graft.io.GeoIO.geoParquetMetadata(spark, path)
    assert(meta.isDefined)
    assert(meta.get.contains("\"encoding\":\"WKB\""))
    assert(meta.get.contains("\"srid\":4326"))
    // the stored bytes are plain ISO WKB: no SRID flag bit set
    val rawFirst = spark.read.parquet(path).select(col("geometry")).limit(1)
      .collect()(0).getAs[Array[Byte]](0)
    assert((graft.serde.EWKB.header(rawFirst).srid) === 0)
    // read back: dataset-level SRID re-applied from the footer metadata
    val back = graft.io.GeoIO.readGeoParquet(spark, path)
      .select(col("k"), graft.functions.st_srid(col("geometry")).as("srid"),
        graft.functions.st_area(col("geometry")).as("a"))
      .orderBy(col("k")).collect()
    assert(back.length === 50)
    assert(back.forall(_.getInt(1) === 4326))
    assert(back.forall(_.getDouble(2) === 8.0))
    // footer rewrite preserved Spark's own footer entries: schema + stats
    // still read fine (covering-column prune path still works)
    assert(graft.io.GeoIO.readGeoParquet(spark, path,
      bbox = Some((0.0, 0.0, 305.0, 10.0))).count() === 30)
  }

  test("image header decode: PNG, JPEG, GIF") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    // PNG via the generator
    val png = Multimodal.parseImageHeader(
      Seq(1).toDF("i").select(Multimodal.makePngHeader(lit(640), lit(480)))
        .collect()(0).getAs[Array[Byte]](0))
    assert(png === Some((640, 480, 3, "png")))
    // minimal JPEG: SOI + APP0(len 4) + SOF0 (h=480 w=640, 3 components)
    val jpeg = Array[Int](0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80, 0x03,
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(graft.pipeline.Multimodal.parseImageHeader(jpeg) === Some((640, 480, 3, "jpeg")))
    // GIF89a 320x200
    val gif = "GIF89a".getBytes("US-ASCII") ++ Array[Int](0x40, 0x01, 0xc8, 0x00,
      0x00, 0x00, 0x00).map(_.toByte)
    assert(graft.pipeline.Multimodal.parseImageHeader(gif) === Some((320, 200, 3, "gif")))
    // garbage → None
    assert(graft.pipeline.Multimodal.parseImageHeader(Array[Byte](1, 2, 3, 4)) === None)
  }

  test("WAV header decode round-trips the generator") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    val wav = Seq(1).toDF("i")
      .select(Multimodal.makeWavHeader(lit(2), lit(44100), lit(16), lit(441000)))
      .collect()(0).getAs[Array[Byte]](0)
    // 441000 bytes at 44100 Hz × 2ch × 2B = 176400 B/s → 2500 ms
    assert(Multimodal.parseWavHeader(wav) === Some((2, 44100, 16, 2500L)))
    assert(Multimodal.parseWavHeader("nope".getBytes) === None)
  }

  test("n-gram near-dup finds duplicated docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about query engines and shuffles")
    ).toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.nearDupNgram(docs, "doc_id", "text", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }
}
