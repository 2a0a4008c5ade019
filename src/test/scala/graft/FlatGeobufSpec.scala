package graft

import java.nio.file.Files

import graft.io.{FlatGeobuf, GeoIO}
import graft.serde.EWKB
import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite

/** FlatGeobuf round-trip coverage: byte-level encode/decode of every
  * supported geometry type and property type, plus the Spark read/write
  * paths (single-file and partitioned). */
class FlatGeobufSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val wkt = new WKTReader(EWKB.geometryFactory)

  private val fixtures = Seq(
    "POINT (1 2)",
    "POINT EMPTY",
    "POINT Z (1 2 3)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "LINESTRING Z (0 0 1, 1 1 2)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOINT ((0 0), (1 1), (2 2))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5), (5.2 5.2, 5.4 5.2, 5.4 5.4, 5.2 5.2)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2), POLYGON ((0 0, 1 0, 1 1, 0 0)))",
    "GEOMETRYCOLLECTION EMPTY")

  test("feature-level geometry round trip, all types") {
    for (w <- fixtures) {
      val g = wkt.read(w)
      g.setSRID(4326)
      val out = new java.io.ByteArrayOutputStream()
      val cols = Seq(FlatGeobuf.Col("id", FlatGeobuf.CtLong))
      val writer = new FlatGeobuf.Writer(out, cols, 4326)
      writer.write(g, Array[Any](7L))
      writer.close()
      val (header, features) = FlatGeobuf.read(out.toByteArray)
      assert(header.srid == 4326)
      assert(header.columns == cols)
      val fs = features.toSeq
      assert(fs.length == 1)
      val back = fs.head.geometry
      assert(back.getSRID == 4326)
      assert(fs.head.properties.toSeq == Seq(7L),
        s"property mismatch for $w")
      assert(back.norm().equalsExact(g.norm()), s"geometry mismatch for $w: got ${back.toText}")
    }
  }

  test("property types round trip incl. nulls") {
    val cols = Seq(
      FlatGeobuf.Col("b", FlatGeobuf.CtBool),
      FlatGeobuf.Col("i", FlatGeobuf.CtInt),
      FlatGeobuf.Col("l", FlatGeobuf.CtLong),
      FlatGeobuf.Col("f", FlatGeobuf.CtFloat),
      FlatGeobuf.Col("d", FlatGeobuf.CtDouble),
      FlatGeobuf.Col("s", FlatGeobuf.CtString),
      FlatGeobuf.Col("bin", FlatGeobuf.CtBinary))
    val values = Array[Any](true, 42, 1234567890123L, 1.5f, 2.25, "héllo", Array[Byte](1, 2, 3))
    val blob = FlatGeobuf.writeProperties(values, cols)
    val back = FlatGeobuf.readProperties(blob, cols)
    assert(back(0) == true && back(1) == 42 && back(2) == 1234567890123L)
    assert(back(3) == 1.5f && back(4) == 2.25 && back(5) == "héllo")
    assert(back(6).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    val withNulls = Array[Any](null, 1, null, null, 3.5, null, null)
    val back2 = FlatGeobuf.readProperties(FlatGeobuf.writeProperties(withNulls, cols), cols)
    assert(back2(0) == null && back2(1) == 1 && back2(4) == 3.5 && back2(5) == null)
  }

  test("spark single-file write/read round trip") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val dir = Files.createTempDirectory("fgb").toFile
    val path = new java.io.File(dir, "t.fgb").getAbsolutePath
    val df = spark.range(100).toDF("id")
      .withColumn("name", concat(lit("row-"), col("id")))
      .withColumn("score", col("id").cast("double") / 4.0)
      .withColumn("geometry", st_set_srid(
        st_point(col("id").cast("double"), col("id").cast("double") * 2), lit(3857)))
    GeoIO.writeFlatGeobuf(df, path)
    val back = GeoIO.readFlatGeobuf(spark, path)
    assert(back.schema.fieldNames.toSeq == Seq("geometry", "id", "name", "score"))
    assert(back.count() == 100)
    val row = back.selectExpr(
      "sum(id)", "count(distinct name)", "sum(score)",
      "sum(st_x(geometry))", "max(st_srid(geometry))").collect()(0)
    assert(row.getLong(0) == 4950L && row.getLong(1) == 100L)
    assert(math.abs(row.getDouble(2) - 4950.0 / 4) < 1e-9)
    assert(math.abs(row.getDouble(3) - 4950.0) < 1e-9)
    assert(row.getInt(4) == 3857)
  }

  test("spark partitioned write/read round trip") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val dir = Files.createTempDirectory("fgbp").toFile.getAbsolutePath + "/parts"
    val df = spark.range(1000).toDF("id").repartition(7)
      .withColumn("geometry", st_point(col("id").cast("double"), lit(0.0)))
    GeoIO.writeFlatGeobufPartitioned(df, dir)
    val back = GeoIO.readFlatGeobuf(spark, dir)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).collect()(0).getLong(0) == 499500L)
    // executor-side parallel write: one part file per input partition
    // (binaryFiles may coalesce small files into fewer read partitions)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fgb"))
    assert(parts.length == 7)
  }

  test("r10: null-first row keeps the real SRID; mixed SRIDs raise everywhere") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val dir = Files.createTempDirectory("fgb_nullfirst").toFile
    val single = new java.io.File(dir, "s.fgb").getAbsolutePath
    // id 0 carries a NULL geometry and sorts first
    val df = spark.range(6).toDF("id").coalesce(1)
      .withColumn("geometry", when(col("id") === 0, lit(null).cast("binary"))
        .otherwise(st_set_srid(st_point(col("id").cast("double"), lit(0.0)), lit(25832))))
      .sortWithinPartitions(col("id"))
    GeoIO.writeFlatGeobuf(df, single)
    val back = GeoIO.readFlatGeobuf(spark, single)
    assert(back.count() == 6)
    assert(back.filter(col("geometry").isNull).count() == 1)
    assert(back.filter(col("geometry").isNotNull)
      .selectExpr("max(st_srid(geometry))").head().getInt(0) == 25832)
    // the partitioned non-indexed writer: same protocol
    val parts = new java.io.File(dir, "parts").getAbsolutePath
    GeoIO.writeFlatGeobufPartitioned(df, parts)
    assert(GeoIO.readFlatGeobuf(spark, parts).filter(col("geometry").isNotNull)
      .selectExpr("max(st_srid(geometry))").head().getInt(0) == 25832)
    // mixed SRIDs now raise in the streaming (non-indexed) branches too,
    // matching the indexed branch and the reference's write_file rule
    val mixed = spark.range(4).toDF("id").coalesce(1)
      .withColumn("geometry", st_set_srid(
        st_point(col("id").cast("double"), lit(0.0)),
        when(col("id") < 2, lit(4326)).otherwise(lit(3857))))
    val e = intercept[org.apache.spark.SparkException] {
      GeoIO.writeFlatGeobufPartitioned(mixed, new java.io.File(dir, "mix").getAbsolutePath)
    }
    assert(e.getMessage.contains("mixed SRIDs") ||
      Option(e.getCause).exists(_.getMessage.contains("mixed SRIDs")))
  }

  test("null geometry and empty frame") {
    val out = new java.io.ByteArrayOutputStream()
    val cols = Seq(FlatGeobuf.Col("id", FlatGeobuf.CtInt))
    val w = new FlatGeobuf.Writer(out, cols, 0)
    w.write(null, Array[Any](5))
    w.close()
    val (_, features) = FlatGeobuf.read(out.toByteArray)
    val f = features.toSeq.head
    assert(f.geometry == null && f.properties(0) == 5)

    val out2 = new java.io.ByteArrayOutputStream()
    new FlatGeobuf.Writer(out2, cols, 0).close()
    val (h2, it2) = FlatGeobuf.read(out2.toByteArray)
    assert(h2.columns == cols && it2.isEmpty)
  }

  test("packed Hilbert R-tree: indexed write, bbox search == filtered scan") {
    import graft.functions._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("fgb_idx").toString
    // 600 unit squares on a 60x10 grid + one geometry-less row → the
    // tree has real internal levels (600 leaves → 38 → 3 → 1)
    val df = (1 to 600).map { i =>
      val x = (i % 60) * 10.0; val y = (i / 60) * 10.0
      (i.toLong, s"POLYGON (($x $y, ${x + 1} $y, ${x + 1} ${y + 1}, $x ${y + 1}, $x $y))")
    }.toDF("pid", "wkt")
      .select($"pid", st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
      .unionByName(Seq((601L, null.asInstanceOf[Array[Byte]]))
        .toDF("pid", "geometry"))
    graft.io.GeoIO.writeFlatGeobuf(df, s"$d/i.fgb", spatialIndex = true)
    graft.io.GeoIO.writeFlatGeobuf(df, s"$d/p.fgb") // plain, no index
    // structural: the indexed header declares nodeSize 16 and the file
    // is exactly indexSize bigger than the sum of its parts implies
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d, "i.fgb"))
    val (h, all) = FlatGeobuf.read(bytes)
    assert(h.indexNodeSize === 16 && h.featuresCount === 601L)
    assert(all.size === 601) // sequential read skips the index correctly
    // full read of indexed == full read of plain (order differs — Hilbert)
    def pids(df2: org.apache.spark.sql.DataFrame) =
      df2.select($"pid").as[Long].collect().toSet
    assert(pids(graft.io.GeoIO.readFlatGeobuf(spark, s"$d/i.fgb")) ===
      (1L to 601L).toSet)
    // bbox via the index == bbox via the scan fallback == manual filter;
    // the geometry-less row never matches a spatial predicate
    val box = (95.0, 25.0, 205.0, 65.0)
    val viaIndex = graft.io.GeoIO.readFlatGeobuf(spark, s"$d/i.fgb", bbox = Some(box))
    val viaScan = graft.io.GeoIO.readFlatGeobuf(spark, s"$d/p.fgb", bbox = Some(box))
    val manual = pids(graft.io.GeoIO.readFlatGeobuf(spark, s"$d/p.fgb")
      .where(st_intersects(st_envelope($"geometry"),
        st_rectangle(lit(box._1), lit(box._2), lit(box._3), lit(box._4)))))
    assert(pids(viaIndex) === manual, "index search diverges from envelope filter")
    assert(pids(viaScan) === manual)
    assert(!pids(viaIndex).contains(601L))
    assert(manual.nonEmpty && manual.size < 601)
    // the index visits a fraction: candidates from searchOffsets are
    // exactly the matches (leaf boxes are exact envelopes)
    val offs = FlatGeobuf.searchOffsets(bytes, box._1, box._2, box._3, box._4).get
    assert(offs.size === manual.size)
    // bbox + window composes post-filter
    val windowed = graft.io.GeoIO.readFlatGeobuf(spark, s"$d/i.fgb",
      bbox = Some(box), skipFeatures = 2, maxFeatures = 3)
    assert(windowed.count() === 3)
    assert(pids(windowed).subsetOf(manual))
    // partitioned writer with per-part indexes: a directory bbox read
    // index-searches every part in parallel and agrees with the others
    graft.io.GeoIO.writeFlatGeobufPartitioned(
      df.filter($"pid" <= 600).repartition(4), s"$d/parts", spatialIndex = true)
    val partFiles = new java.io.File(s"$d/parts").listFiles
      .filter(_.getName.endsWith(".fgb"))
    assert(partFiles.length === 4)
    partFiles.foreach { f =>
      val b = java.nio.file.Files.readAllBytes(f.toPath)
      assert(FlatGeobuf.read(b)._1.indexNodeSize === 16, s"${f.getName} unindexed")
    }
    val viaParts = graft.io.GeoIO.readFlatGeobuf(spark, s"$d/parts", bbox = Some(box))
    assert(pids(viaParts) === manual)
  }
}
