package graft

import java.nio.file.Files

import graft.io.GeoIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 facade (`spark.read.format("flatgeobuf")`): result
  * parity with the function surface ([[GeoIO.readFlatGeobuf]]), REAL
  * column pruning in the scan's ReadSchema, decode-level filter pushdown
  * reported in the scan node, and the bbox option riding the packed
  * R-tree. */
class DataSourceV2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val (singlePath, partsDir): (String, String) = {
    import graft.functions._
    val dir = Files.createTempDirectory("fgb_dsv2").toFile
    val single = new java.io.File(dir, "t.fgb").getAbsolutePath
    val df = spark.range(200).toDF("id")
      .withColumn("name", concat(lit("row-"), col("id")))
      .withColumn("score", col("id").cast("double") / 4.0)
      .withColumn("geometry", st_set_srid(
        st_point(col("id").cast("double"), col("id").cast("double") * 2), lit(3857)))
    GeoIO.writeFlatGeobuf(df, single, spatialIndex = true)
    val parts = new java.io.File(dir, "parts").getAbsolutePath
    GeoIO.writeFlatGeobufPartitioned(df.repartition(5), parts)
    (single, parts)
  }

  test("format(flatgeobuf): row parity with readFlatGeobuf, single file and directory") {
    for (p <- Seq(singlePath, partsDir)) {
      val dsv2 = spark.read.format("flatgeobuf").load(p)
      val fn = GeoIO.readFlatGeobuf(spark, p)
      assert(dsv2.schema == fn.schema, s"schema mismatch for $p")
      val a = dsv2.selectExpr("id", "name", "score", "hex(geometry) AS g")
        .collect().map(_.toSeq).toSet
      val b = fn.selectExpr("id", "name", "score", "hex(geometry) AS g")
        .collect().map(_.toSeq).toSet
      assert(a == b, s"row mismatch for $p")
      assert(a.size == 200)
    }
  }

  test("column pruning reaches the scan: ReadSchema is the referenced columns only") {
    val pruned = spark.read.format("flatgeobuf").load(singlePath).select("name")
    val plan = pruned.queryExecution.executedPlan.toString
    // the BatchScan's output must be just `name` — geometry (and its EWKB
    // serialization cost) pruned away
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse(
      fail(s"no BatchScan node in:\n$plan"))
    assert(scanLine.contains("name") && !scanLine.contains("geometry"),
      s"scan not pruned: $scanLine")
    assert(pruned.distinct().count() == 200)
  }

  test("filter pushdown: pushed filters visible in scan description, result exact") {
    val df = spark.read.format("flatgeobuf").load(singlePath)
      .filter(col("id") >= 100 && col("name") =!= "row-150")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters") || desc.contains("pushed"),
      s"no pushdown report in plan:\n$desc")
    assert(df.count() == 99)
    assert(df.agg(min("id")).collect()(0).getLong(0) == 100L)
    // IsNull / In also push
    val in = spark.read.format("flatgeobuf").load(singlePath)
      .filter(col("id").isin(3L, 5L, 999L))
    assert(in.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet == Set(3L, 5L))
  }

  test("bbox option: index-driven spatial window == filtered full scan") {
    val got = spark.read.format("flatgeobuf").option("bbox", "10,20,40,80")
      .load(singlePath).select("id").collect().map(_.getLong(0)).toSet
    // points are (id, 2*id): envelope-intersects [10,40]x[20,80] → id in 10..40
    assert(got == (10L to 40L).toSet)
    val desc = spark.read.format("flatgeobuf").option("bbox", "10,20,40,80")
      .load(singlePath).queryExecution.executedPlan.toString
    assert(desc.contains("10.0,20.0,40.0,80.0"), s"bbox not reported:\n$desc")
  }

  test("format(shapefile): parity, bbox prune, filter pushdown, prj srid") {
    import graft.functions._
    val dir = Files.createTempDirectory("shp_dsv2").toFile
    val shp = new java.io.File(dir, "t.shp").getAbsolutePath
    val df = spark.range(120).toDF("id")
      .withColumn("name", concat(lit("f-"), col("id")))
      .withColumn("geometry", st_set_srid(
        st_point(col("id").cast("double"), col("id").cast("double") * 2), lit(4326)))
    GeoIO.writeShapefile(df, shp)
    val dsv2 = spark.read.format("shapefile").load(shp)
    val fn = GeoIO.readShapefile(spark, shp)
    assert(dsv2.schema == fn.schema)
    assert(dsv2.selectExpr("id", "name", "hex(geometry) AS g").collect().map(_.toSeq).toSet
      == fn.selectExpr("id", "name", "hex(geometry) AS g").collect().map(_.toSeq).toSet)
    // .prj round trip: srid recovered like the function surface
    assert(dsv2.select(st_srid(col("geometry"))).head().getInt(0) == 4326)
    // bbox option prunes on stored record boxes
    val got = spark.read.format("shapefile").option("bbox", "5,10,20,40")
      .load(shp).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (5L to 20L).toSet)
    // filter pushdown visible + exact
    val filt = spark.read.format("shapefile").load(shp).filter(col("id") < 7)
    assert(filt.queryExecution.executedPlan.toString.contains("PushedFilters"))
    assert(filt.count() == 7)
  }

  test("format(geopackage): parity with readGeoPackage, leaf-split partitions, bbox") {
    import graft.functions._
    val dir = Files.createTempDirectory("gpkg_dsv2").toFile
    val gpkg = new java.io.File(dir, "t.gpkg").getAbsolutePath
    val df = spark.range(300).toDF("id")
      .withColumn("label", concat(lit("g-"), col("id")))
      .withColumn("score", col("id").cast("double") / 8.0)
      .withColumn("geometry", st_set_srid(
        st_point(col("id").cast("double"), col("id").cast("double")), lit(4326)))
    GeoIO.writeGeoPackage(df, gpkg, tableName = "feats")
    val dsv2 = spark.read.format("geopackage").option("layer", "feats").load(gpkg)
    val fn = GeoIO.readGeoPackage(spark, gpkg, layer = Some("feats"))
    assert(dsv2.schema == fn.schema, s"${dsv2.schema} vs ${fn.schema}")
    assert(dsv2.selectExpr("id", "label", "score", "hex(geometry) AS g")
      .collect().map(_.toSeq).toSet
      == fn.selectExpr("id", "label", "score", "hex(geometry) AS g")
        .collect().map(_.toSeq).toSet)
    assert(dsv2.count() == 300)
    val got = spark.read.format("geopackage").option("bbox", "10,10,25,25")
      .load(gpkg).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (10L to 25L).toSet)
  }

  test("format(flatgeobuf) write: overwrite + append round trip, task-commit parts") {
    import graft.functions._
    val dir = Files.createTempDirectory("fgb_w").toFile.getAbsolutePath + "/out"
    val df = spark.range(100).toDF("id").repartition(3)
      .withColumn("name", concat(lit("w-"), col("id")))
      .withColumn("geometry", st_set_srid(
        st_point(col("id").cast("double"), lit(1.0)), lit(3857)))
    df.write.format("flatgeobuf").mode("overwrite").save(dir)
    val back = spark.read.format("flatgeobuf").load(dir)
    assert(back.count() == 100)
    assert(back.agg(sum("id")).head().getLong(0) == 4950L)
    assert(back.select(st_srid(col("geometry"))).head().getInt(0) == 3857)
    // one committed part per input partition, no leftover temps
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.count(_.endsWith(".fgb")) == 3, files.toSeq.toString)
    assert(!files.exists(_.endsWith(".tmp")))
    // append adds parts; overwrite replaces them
    df.limit(10).repartition(1).write.format("flatgeobuf").mode("append").save(dir)
    assert(spark.read.format("flatgeobuf").load(dir).count() == 110)
    df.write.format("flatgeobuf").mode("overwrite").save(dir)
    assert(spark.read.format("flatgeobuf").load(dir).count() == 100)
    // function-surface reader agrees with the DSv2 write
    assert(GeoIO.readFlatGeobuf(spark, dir).count() == 100)
  }

  test("write: null-first partition still stamps the real SRID; empty pre-made dir works") {
    import graft.functions._
    val dir = Files.createTempDirectory("fgb_w2").toFile.getAbsolutePath + "/out"
    new java.io.File(dir).mkdirs() // pre-created EMPTY target dir
    // single partition whose FIRST row has a null geometry
    val df = spark.range(10).toDF("id").coalesce(1)
      .withColumn("geometry", when(col("id") === 0, lit(null).cast("binary"))
        .otherwise(st_set_srid(st_point(col("id").cast("double"), lit(0.0)), lit(27700))))
      .sortWithinPartitions(col("id"))
    df.write.format("flatgeobuf").mode("overwrite").save(dir)
    val back = spark.read.format("flatgeobuf").load(dir)
    assert(back.count() == 10)
    assert(back.filter(col("geometry").isNull).count() == 1)
    // header SRID must come from the first NON-NULL geometry, not the
    // null-first row
    assert(back.filter(col("geometry").isNotNull)
      .select(st_srid(col("geometry"))).distinct().head().getInt(0) == 27700)
  }

  test("write protocol: append schema guard, self-overwrite, job-unique part names") {
    import graft.functions._
    val dir = Files.createTempDirectory("fgb_w3").toFile.getAbsolutePath + "/out"
    def frame(n: Int) = spark.range(n).toDF("id").repartition(2)
      .withColumn("name", concat(lit("p-"), col("id")))
      .withColumn("geometry", st_set_srid(
        st_point(col("id").cast("double"), lit(2.0)), lit(4326)))
    frame(50).write.format("flatgeobuf").mode("overwrite").save(dir)
    // two appends from separate queries: queryId-unique names never
    // collide, rows accumulate
    frame(10).write.format("flatgeobuf").mode("append").save(dir)
    frame(10).write.format("flatgeobuf").mode("append").save(dir)
    assert(spark.read.format("flatgeobuf").load(dir).count() == 70)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")))
    // append with a DIFFERENT property layout must refuse (positional
    // decode would scramble columns)
    val bad = spark.range(5).toDF("id")
      .withColumn("geometry", st_point(col("id").cast("double"), lit(0.0)))
      .select(col("geometry"), col("id").cast("string").as("name"), col("id"))
    val e = intercept[Exception] {
      bad.write.format("flatgeobuf").mode("append").save(dir)
    }
    assert(e.getMessage.contains("positional decode") ||
      Option(e.getCause).exists(_.getMessage.contains("positional decode")),
      s"unexpected: ${e.getMessage}")
    // self-overwrite: input files are replaced only at job commit, so
    // read -> transform -> overwrite the same dir is safe
    spark.read.format("flatgeobuf").load(dir).filter(col("id") < 30)
      .write.format("flatgeobuf").mode("overwrite").save(dir)
    val back = spark.read.format("flatgeobuf").load(dir)
    assert(back.agg(max("id")).head().getLong(0) == 29L)
  }

  test("write option spatialIndex: parts carry the packed R-tree, bbox reads use it") {
    import graft.functions._
    val dir = Files.createTempDirectory("fgb_w_idx").toFile.getAbsolutePath + "/out"
    val df = spark.range(200).toDF("id").repartition(2)
      .withColumn("geometry", st_set_srid(
        st_point(col("id").cast("double"), col("id").cast("double")), lit(4326)))
    df.write.format("flatgeobuf").option("spatialIndex", "true")
      .mode("overwrite").save(dir)
    // every part advertises an index (node size > 0 in its header)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    for (f <- new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fgb"))) {
      val in = fs.open(new org.apache.hadoop.fs.Path(f.getAbsolutePath))
      val h = try graft.io.FlatGeobuf.readHeaderFrom(in) finally in.close()
      assert(h.indexNodeSize > 0, s"${f.getName}: no spatial index in header")
    }
    // bbox read over the indexed parts: exact answer
    val got = spark.read.format("flatgeobuf").option("bbox", "50,50,80,80")
      .load(dir).select("id").collect().map(_.getLong(0)).toSet
    assert(got == (50L to 80L).toSet)
    assert(spark.read.format("flatgeobuf").load(dir).count() == 200)
  }

  test("readStream(flatgeobuf): micro-batches over arriving parts, checkpointed offsets") {
    import graft.functions._
    val root = Files.createTempDirectory("fgb_stream").toFile.getAbsolutePath
    val dir = root + "/in"
    val ckpt = root + "/ckpt"
    def batch(lo: Int, hi: Int) = spark.range(lo, hi).toDF("id").repartition(1)
      .withColumn("geometry", st_point(col("id").cast("double"), lit(0.0)))
    batch(0, 40).write.format("flatgeobuf").mode("append").save(dir)
    val sink = root + "/sink"
    def drain(): Unit = {
      // parquet sink: checkpoint-recoverable (memory sinks are not)
      val q = spark.readStream.format("flatgeobuf").load(dir)
        .selectExpr("id")
        .writeStream.format("parquet").outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try require(q.awaitTermination(120000), "fgb stream drain timed out")
      finally if (q.isActive) q.stop()
    }
    drain()
    assert(spark.read.parquet(sink).count() == 40)
    // new parts arrive; a SECOND run from the same checkpoint processes
    // ONLY them (offset = set of seen part files)
    batch(40, 55).write.format("flatgeobuf").mode("append").save(dir)
    drain()
    val ids = spark.read.parquet(sink).select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == (0L until 55L), s"got ${ids.size} rows")
    assert(ids.size == 55, "rows reprocessed or lost across checkpointed runs")
  }

  test("SQL catalog face: CREATE TABLE ... USING flatgeobuf") {
    spark.sql("DROP TABLE IF EXISTS fgb_sql_t")
    spark.sql(
      s"CREATE TABLE fgb_sql_t USING flatgeobuf OPTIONS (path '$singlePath')")
    try {
      val n = spark.sql(
        "SELECT count(*) AS n FROM fgb_sql_t WHERE id < 50").head().getLong(0)
      assert(n == 50)
      // the registered geo functions compose over the catalog table
      Geo.registerAll(spark)
      val a = spark.sql(
        "SELECT max(st_srid(geometry)) FROM fgb_sql_t").head().getInt(0)
      assert(a == 3857)
    } finally spark.sql("DROP TABLE IF EXISTS fgb_sql_t")
  }

  test("explicit read schema: exact stored layout accepted, mismatch refused loudly") {
    import org.apache.spark.sql.types._
    val stored = StructType(Seq(
      StructField("geometry", BinaryType), StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    // matching schema: trusted, full parity
    val ok = spark.read.format("flatgeobuf").schema(stored).load(singlePath)
    assert(ok.count() == 200)
    // reordered / mismatched schema would decode positionally against the
    // stored header and silently scramble columns — must refuse at read
    val scrambled = StructType(Seq(
      StructField("id", LongType), StructField("geometry", BinaryType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val e = intercept[Exception] {
      spark.read.format("flatgeobuf").schema(scrambled).load(singlePath).count()
    }
    assert(e.getMessage.contains("scramble") ||
      Option(e.getCause).exists(_.getMessage.contains("scramble")),
      s"unexpected: ${e.getMessage}")
    // a renamed property is a mismatch too
    val renamed = StructType(Seq(
      StructField("geometry", BinaryType), StructField("id", LongType),
      StructField("label", StringType), StructField("score", DoubleType)))
    intercept[Exception] {
      spark.read.format("flatgeobuf").schema(renamed).load(singlePath).count()
    }
  }

  test("flatgeobuf directory: mixed part layouts refuse at scan build") {
    import graft.functions._
    // two writes with DIFFERENT property layouts, one part copied across —
    // positional decode against the head-derived schema would scramble
    val dirA = Files.createTempDirectory("fgb_mixa").toFile.getAbsolutePath + "/out"
    val dirB = Files.createTempDirectory("fgb_mixb").toFile.getAbsolutePath + "/out"
    spark.range(10).select(st_point(col("id").cast("double"), lit(0.0)).as("geometry"),
      col("id"), col("id").cast("string").as("name"))
      .coalesce(1).write.format("flatgeobuf").mode("overwrite").save(dirA)
    spark.range(10).select(st_point(col("id").cast("double"), lit(1.0)).as("geometry"),
      col("id").cast("string").as("name"), col("id"))
      .coalesce(1).write.format("flatgeobuf").mode("overwrite").save(dirB)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(dirB))
      .map(_.getPath).find(_.getName.endsWith(".fgb")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(dirA, "zz-foreign.fgb"))
    val e = intercept[Exception] {
      spark.read.format("flatgeobuf").load(dirA).count()
    }
    assert(e.getMessage.contains("mixed .fgb layouts") ||
      Option(e.getCause).exists(_.getMessage.contains("mixed .fgb layouts")),
      s"unexpected: ${e.getMessage}")
  }

  test("pushed comparison on Long values beyond 2^53 keeps exact rows") {
    import graft.functions._
    val dir = Files.createTempDirectory("fgb_big").toFile.getAbsolutePath + "/out"
    val base = 1L << 53 // 9007199254740992: base+1 rounds to base as a double
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(base - 1L), org.apache.spark.sql.Row(base),
        org.apache.spark.sql.Row(base + 1L), org.apache.spark.sql.Row(base + 3L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
      .withColumn("geometry", st_point(lit(1.0), lit(2.0)))
    df.write.format("flatgeobuf").mode("overwrite").save(dir)
    // a double-rounding decode filter would drop base+1 (it compares equal
    // to base as a double, so `> base` fails) — Spark's re-filter cannot
    // recover a dropped row, so the decode comparison must be integral
    val got = spark.read.format("flatgeobuf").load(dir)
      .filter(col("id") > base).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(base + 1L, base + 3L), s"got $got")
    val eq = spark.read.format("flatgeobuf").load(dir)
      .filter(col("id") === (base + 1L)).count()
    assert(eq == 1L)
  }

  test("shapefile directory: mixed .dbf layouts and mixed CRS refuse at plan time") {
    import graft.functions._
    def frame(srid: Int, extraCol: Boolean) = {
      val base = spark.range(10).toDF("id")
        .withColumn("geometry", st_set_srid(
          st_point(col("id").cast("double"), lit(0.0)), lit(srid)))
      if (extraCol) base.withColumn("name", concat(lit("n-"), col("id"))) else base
    }
    // homogeneous directory: reads fine through both surfaces
    val okDir = Files.createTempDirectory("shp_mix_ok").toFile.getAbsolutePath
    GeoIO.writeShapefile(frame(4326, extraCol = true), okDir + "/a.shp")
    GeoIO.writeShapefile(frame(4326, extraCol = true), okDir + "/b.shp")
    assert(spark.read.format("shapefile").load(okDir).count() == 20)
    assert(GeoIO.readShapefile(spark, okDir).count() == 20)
    // mixed attribute layouts: both surfaces fail loudly
    val mixDbf = Files.createTempDirectory("shp_mix_dbf").toFile.getAbsolutePath
    GeoIO.writeShapefile(frame(4326, extraCol = true), mixDbf + "/a.shp")
    GeoIO.writeShapefile(frame(4326, extraCol = false), mixDbf + "/b.shp")
    val e1 = intercept[Exception] {
      spark.read.format("shapefile").load(mixDbf).count()
    }
    assert(e1.getMessage.contains("mixed .dbf layouts") ||
      Option(e1.getCause).exists(_.getMessage.contains("mixed .dbf layouts")))
    val e2 = intercept[Exception] { GeoIO.readShapefile(spark, mixDbf).count() }
    assert(e2.getMessage.contains("mixed .dbf layouts") ||
      Option(e2.getCause).exists(_.getMessage.contains("mixed .dbf layouts")))
    // mixed CRS: .prj sidecars provably disagree (two KNOWN codes)
    val mixCrs = Files.createTempDirectory("shp_mix_crs").toFile.getAbsolutePath
    GeoIO.writeShapefile(frame(4326, extraCol = true), mixCrs + "/a.shp")
    GeoIO.writeShapefile(frame(3857, extraCol = true), mixCrs + "/b.shp")
    val e3 = intercept[Exception] {
      spark.read.format("shapefile").load(mixCrs).count()
    }
    assert(e3.getMessage.contains("mixed CRS") ||
      Option(e3.getCause).exists(_.getMessage.contains("mixed CRS")))
    // dialect tolerance: same CRS expressed as (a) reformatted text and
    // (b) an AUTHORITY-less WKT resolving to a synthetic code must NOT
    // trip the mixed-CRS check — only provably-different known codes do
    val dialect = Files.createTempDirectory("shp_dialect").toFile.getAbsolutePath
    GeoIO.writeShapefile(frame(4326, extraCol = true), dialect + "/a.shp")
    GeoIO.writeShapefile(frame(4326, extraCol = true), dialect + "/b.shp")
    val bPrj = new java.io.File(dialect + "/b.prj")
    val aTxt = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dialect + "/a.prj").toPath))
    // rewriting the sidecar behind Hadoop's back: drop its checksum file
    def rewriteB(txt: String): Unit = {
      java.nio.file.Files.write(bPrj.toPath, txt.getBytes)
      new java.io.File(dialect + "/.b.prj.crc").delete()
    }
    // (a) whitespace-reformatted copy of the same definition
    rewriteB(aTxt.replace(",", ", "))
    assert(spark.read.format("shapefile").load(dialect).count() == 20)
    // (b) parseable definition with no AUTHORITY clause (ESRI-style):
    // auto-registers as a synthetic code; known-vs-synthetic is not
    // provably mixed, so the directory still reads
    rewriteB("""GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",""" +
      """6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],""" +
      """UNIT["Degree",0.0174532925199433]]""")
    assert(GeoIO.readShapefile(spark, dialect).count() == 20)
  }

  test("geometry option renames the geometry column") {
    val df = spark.read.format("flatgeobuf").option("geometry", "geom")
      .load(singlePath)
    assert(df.schema.fieldNames.head == "geom")
    assert(df.select("geom").filter(col("geom").isNotNull).count() == 200)
  }
}
