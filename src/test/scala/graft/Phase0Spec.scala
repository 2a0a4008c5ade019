package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.serde.{EWKB, GeoCodec}

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Geo.registerAll(s)
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}

class Phase0Spec extends AnyFunSuite {

  // the 22 reference fixtures, /root/reference/tests/test_expressions.py:19-46
  val fixtures: Seq[String] = Seq(
    "POINT EMPTY", "POINT (1 2)", "POINT Z (1 2 3)",
    "LINESTRING EMPTY", "LINESTRING (0 0, 1 1)",
    "LINESTRING Z (0 0 0, 1 1 1, 2 2 2)",
    "POLYGON EMPTY", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "POLYGON Z ((0 0 1, 1 0 0, 1 1 1, 0 1 0, 0 0 1))",
    "MULTIPOINT EMPTY", "MULTIPOINT ((0 0), (1 1))",
    "MULTIPOINT Z ((0 0 0), (1 1 1))",
    "MULTILINESTRING EMPTY", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTILINESTRING Z ((0 0 0, 1 1 1), (2 2 2, 3 3 3))",
    "MULTIPOLYGON EMPTY",
    "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((2 2, 3 2, 2 3, 2 2)))",
    "MULTIPOLYGON Z (((0 0 0, 1 0 0, 0 1 1, 0 0 0)), ((2 2 2, 3 2 3, 2 3 2, 2 2 2)))",
    "GEOMETRYCOLLECTION EMPTY",
    "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))",
    "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1), POLYGON ((0 0, 1 0, 1 1, 0 0)))",
    "GEOMETRYCOLLECTION (POINT Z (0 0 0), LINESTRING (0 0, 1 1), POLYGON ((0 0, 1 0, 1 1, 0 0)))")

  test("EWKB round-trips all fixtures") {
    for (wkt <- fixtures) {
      val g = GeoCodec.fromWkt(wkt)
      val bytes = EWKB.write(g)
      val back = EWKB.read(bytes)
      assert(back.getGeometryType === g.getGeometryType, wkt)
      assert(back.isEmpty === g.isEmpty, wkt)
      if (!g.isEmpty) assert(back.equalsExact(g), wkt)
      // second round-trip must be byte-stable
      assert(EWKB.write(back).sameElements(bytes), wkt)
    }
  }

  test("EWKB header: srid flag and Z flag") {
    val g = GeoCodec.fromEwkt("SRID=4326;POINT Z (1 2 3)")
    val h = EWKB.header(EWKB.write(g))
    assert(h.srid === 4326)
    assert(h.hasZ)
    assert(!h.hasM)
    assert(h.typeCode === 1)
    assert(EWKB.typeName(h.typeCode) === "Point")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("geo_rect_area matches closed form") {
    val rows = SparkEntry.queries("geo_rect_area")(TestSpark.spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getLong(0)
      val w = 1.0 + (k % 13) / 4.0
      val h = 1.0 + (k % 11) / 4.0
      assert(r.getDouble(1) === w * h, s"area key=$k")
      assert(r.getDouble(2) === 2 * (w + h), s"perimeter key=$k")
    }
  }

  test("geo_union_area equals sum of disjoint areas") {
    val got = SparkEntry.queries("geo_union_area")(TestSpark.spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val o = TestSpark.spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    val want = o.groupBy(_ % 16).view.mapValues(
      _.map(k => (1.0 + (k % 13) / 4.0) * (1.0 + (k % 11) / 4.0)).sum).toMap
    assert(got.keySet === want.keySet)
    for ((k, v) <- want) assert(got(k) === v, s"grp $k")
  }
}
