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

  test("geometry option renames the geometry column") {
    val df = spark.read.format("flatgeobuf").option("geometry", "geom")
      .load(singlePath)
    assert(df.schema.fieldNames.head == "geom")
    assert(df.select("geom").filter(col("geom").isNotNull).count() == 200)
  }
}
