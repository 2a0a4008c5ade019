package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

/** Totality matrix over the 22 reference fixtures (port of
  * /root/reference/tests/test_expressions.py): every op runs on every
  * fixture without crashing, returns the expected Spark type, and
  * propagates null→null. Type-restricted ops raise on wrong types
  * (reference error matrix, test_expressions.py:310-387). */
class SurfaceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  def fixturesDf: DataFrame = {
    val rows = new Phase0Spec().fixtures
    rows.toDF("wkt").withColumn("geometry", st_geomfromtext($"wkt"))
  }

  val dummyPoint: Column = st_geomfromtext(lit("POINT (1 2)"))
  val dummyLine: Column = st_geomfromtext(lit("LINESTRING (0 0, 1 1)"))

  // ops total over all 22 fixtures: name -> (expr, expected type)
  val totalOps: Seq[(String, Column => Column, DataType)] = Seq(
    ("geometrytype", st_geometrytype _, StringType),
    ("dimensions", st_dimensions _, IntegerType),
    ("coordinatedimension", st_coordinatedimension _, IntegerType),
    ("srid", graft.functions.st_srid _, IntegerType), // qualified: Spark 4.1 has a built-in st_srid
    ("x", st_x _, DoubleType),
    ("y", st_y _, DoubleType),
    ("z", st_z _, DoubleType),
    ("m", st_m _, DoubleType),
    ("count_coordinates", st_count_coordinates _, IntegerType),
    ("coordinates", st_coordinates _, ArrayType(ArrayType(DoubleType, false), true)),
    ("exterior_ring", st_exterior_ring _, BinaryType),
    ("interior_rings", st_interior_rings _, ArrayType(BinaryType, true)),
    ("count_interior_rings", st_count_interior_rings _, IntegerType),
    ("count_geometries", st_count_geometries _, IntegerType),
    ("count_points", st_count_points _, IntegerType),
    ("parts", st_parts _, ArrayType(BinaryType, true)),
    ("precision", st_precision _, DoubleType),
    ("bounds", st_bounds _, ArrayType(DoubleType, false)),
    ("area", st_area _, DoubleType),
    ("length", st_length _, DoubleType),
    ("minimum_clearance", st_minimum_clearance _, DoubleType),
    ("has_z", st_has_z _, BooleanType),
    ("has_m", st_has_m _, BooleanType),
    ("is_ccw", st_is_ccw _, BooleanType),
    ("is_closed", st_is_closed _, BooleanType),
    ("is_empty", st_is_empty _, BooleanType),
    ("is_ring", st_is_ring _, BooleanType),
    ("is_simple", st_is_simple _, BooleanType),
    ("is_valid", st_is_valid _, BooleanType),
    ("is_valid_reason", st_is_valid_reason _, StringType),
    ("boundary", st_boundary _, BinaryType),
    ("buffer", (c: Column) => st_buffer(c, lit(0.5)), BinaryType),
    ("centroid", st_centroid _, BinaryType),
    ("center", st_center _, BinaryType),
    ("clip_by_rect", (c: Column) => st_clip_by_rect(c, lit(0.0), lit(0.0), lit(1.0), lit(1.0)), BinaryType),
    ("convex_hull", st_convex_hull _, BinaryType),
    ("concave_hull", (c: Column) => st_concave_hull(c, lit(0.5)), BinaryType),
    ("segmentize", (c: Column) => st_segmentize(c, lit(0.5)), BinaryType),
    ("envelope", st_envelope _, BinaryType),
    ("extract_unique_points", st_extract_unique_points _, BinaryType),
    ("build_area", st_build_area _, BinaryType),
    ("make_valid", st_make_valid _, BinaryType),
    ("normalize", st_normalize _, BinaryType),
    ("node", st_node _, BinaryType),
    ("point_on_surface", st_point_on_surface _, BinaryType),
    ("remove_repeated_points", (c: Column) => st_remove_repeated_points(c, lit(0.1)), BinaryType),
    ("reverse", st_reverse _, BinaryType),
    ("simplify", (c: Column) => st_simplify(c, lit(0.1)), BinaryType),
    ("force_2d", st_force_2d _, BinaryType),
    ("force_3d", st_force_3d _, BinaryType),
    ("flip_coordinates", st_flip_coordinates _, BinaryType),
    ("minimum_rotated_rectangle", st_minimum_rotated_rectangle _, BinaryType),
    ("multi", st_multi _, BinaryType),
    ("translate", (c: Column) => st_translate(c, lit(1.0), lit(2.0)), BinaryType),
    ("rotate", (c: Column) => st_rotate(c, lit(90.0)), BinaryType),
    ("scale", (c: Column) => st_scale(c, lit(2.0), lit(3.0)), BinaryType),
    ("skew", (c: Column) => st_skew(c, lit(10.0), lit(20.0)), BinaryType),
    ("affine",
      (c: Column) => st_affine_transform(c, array(Seq(1.0, 0.0, 0.0, 1.0, 5.0, 6.0).map(lit): _*)),
      BinaryType),
    ("set_srid", (c: Column) => st_set_srid(c, lit(4326)), BinaryType),
    ("aswkt", st_aswkt _, StringType),
    ("asewkt", st_asewkt _, StringType),
    ("aswkb", (c: Column) => st_aswkb(c), BinaryType),
    ("asgeojson", st_asgeojson _, StringType),
    ("distance", (c: Column) => st_distance(c, dummyPoint), DoubleType),
    ("hausdorff", (c: Column) => st_hausdorff_distance(c, dummyLine), DoubleType),
    ("frechet", (c: Column) => st_frechet_distance(c, dummyLine), DoubleType),
    ("intersects", (c: Column) => st_intersects(c, dummyPoint), BooleanType),
    ("crosses", (c: Column) => st_crosses(c, dummyLine), BooleanType),
    ("contains", (c: Column) => st_contains(c, dummyPoint), BooleanType),
    ("contains_properly", (c: Column) => st_contains_properly(c, dummyPoint), BooleanType),
    ("covered_by", (c: Column) => st_covered_by(c, dummyPoint), BooleanType),
    ("covers", (c: Column) => st_covers(c, dummyPoint), BooleanType),
    ("disjoint", (c: Column) => st_disjoint(c, dummyPoint), BooleanType),
    ("overlaps", (c: Column) => st_overlaps(c, dummyLine), BooleanType),
    ("touches", (c: Column) => st_touches(c, dummyLine), BooleanType),
    ("within", (c: Column) => st_within(c, dummyLine), BooleanType),
    ("equals", (c: Column) => st_equals(c, dummyPoint), BooleanType),
    ("equals_identical", (c: Column) => st_equals_identical(c, dummyPoint), BooleanType),
    ("equals_exact", (c: Column) => st_equals_exact(c, dummyPoint, lit(0.0)), BooleanType),
    ("dwithin", (c: Column) => st_dwithin(c, dummyPoint, lit(1.0)), BooleanType),
    ("relate", (c: Column) => st_relate(c, dummyLine), StringType),
    ("relate_pattern", (c: Column) => st_relate_pattern(c, dummyLine, lit("T*F**F***")), BooleanType),
    ("intersects_xy", (c: Column) => st_intersects_xy(c, lit(1.0), lit(2.0)), BooleanType),
    ("contains_xy", (c: Column) => st_contains_xy(c, lit(1.0), lit(2.0)), BooleanType),
    ("union", (c: Column) => st_union(c, dummyPoint), BinaryType),
    ("union_prec", (c: Column) => st_union(c, dummyPoint, lit(0.5)), BinaryType),
    ("intersection", (c: Column) => st_intersection(c, dummyLine), BinaryType),
    ("difference", (c: Column) => st_difference(c, dummyLine), BinaryType),
    ("symmetric_difference", (c: Column) => st_symmetric_difference(c, dummyLine), BinaryType),
    ("unary_union", st_unary_union _, BinaryType),
    ("snap", (c: Column) => st_snap(c, dummyPoint, lit(0.1)), BinaryType),
    ("shortest_line", (c: Column) => st_shortest_line(c, dummyLine), BinaryType),
    ("to_srid_identity", (c: Column) => st_to_srid(st_set_srid(c, lit(4326)), lit(4326)), BinaryType),
    ("line_merge", (c: Column) => st_line_merge(c), BinaryType),
    ("getgeom", (c: Column) => st_get_geometry(c, lit(0)), BinaryType),
    // round-2 additions
    ("skew3", (c: Column) => st_skew(c, lit(10.0), lit(0.0), lit(5.0), lit("center")), BinaryType),
    ("coordinates_dim", (c: Column) => st_coordinates(c, lit(3)),
      ArrayType(ArrayType(DoubleType, false), true)),
    ("disjoint_subset_union", st_disjoint_subset_union _, BinaryType),
    ("get_crs_from_code_null", (_: Column) => st_get_crs_from_code(lit(999999)), StringType))

  test("all total ops run over all fixtures with expected types") {
    val df = fixturesDf
    // batch them to limit plan count: one select with every op
    val cols = totalOps.map { case (name, f, _) => f($"geometry").as(name) }
    val out = df.select(cols: _*)
    val schema = out.schema
    totalOps.foreach { case (name, _, expected) =>
      assert(schema(name).dataType === expected, s"dtype of $name")
    }
    assert(out.count() === 22)
  }

  test("null input -> null output for every elementwise op") {
    val df = Seq((1)).toDF("id").withColumn("geometry", lit(null).cast(BinaryType))
    val cols = totalOps.map { case (name, f, _) => f($"geometry").as(name) }
    val row = df.select(cols: _*).collect()(0)
    totalOps.indices.foreach { i =>
      assert(row.isNullAt(i), s"op ${totalOps(i)._1} must be null on null input")
    }
  }

  test("type-restricted ops raise on wrong input type") {
    def fails(c: Column): Boolean =
      intercept[Exception] {
        fixturesDf.filter($"wkt" === "POINT (1 2)").select(c).collect()
      } != null
    assert(fails(st_get_interior_ring($"geometry", lit(0))))
    assert(fails(st_get_point($"geometry", lit(0))))
    assert(fails(st_interpolate($"geometry", lit(0.5))))
    assert(fails(st_shared_paths($"geometry", $"geometry")))
    assert(fails(st_coverage_union($"geometry")))
    assert(fails(st_project($"geometry", dummyPoint)))
  }

  test("restricted ops work on their valid types") {
    val line = fixturesDf.filter($"wkt" === "LINESTRING (0 0, 1 1)")
    val r1 = line.select(
      st_aswkt(st_get_point($"geometry", lit(1))).as("p1"),
      st_aswkt(st_interpolate($"geometry", lit(0.5), lit(true))).as("mid"),
      st_project($"geometry", dummyPoint, lit(true)).as("proj")).collect()(0)
    assert(r1.getString(0) === "POINT (1 1)")
    assert(r1.getString(1) === "POINT (0.5 0.5)")
    val gc = fixturesDf.filter($"wkt".startsWith("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING"))
    assert(gc.select(st_coverage_union($"geometry")).collect().length === 2)
  }

  test("golden values: measurements and accessors") {
    val df = fixturesDf
    def one(wkt: String, c: Column): Any =
      df.filter($"wkt" === wkt).select(c).collect()(0).get(0)
    assert(one("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", st_area($"geometry")) === 1.0)
    assert(one("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", st_length($"geometry")) === 4.0)
    assert(one("POINT (1 2)", st_x($"geometry")) === 1.0)
    assert(one("POINT (1 2)", st_y($"geometry")) === 2.0)
    assert(one("POINT EMPTY", st_x($"geometry")).asInstanceOf[Double].isNaN)
    assert(one("POINT Z (1 2 3)", st_z($"geometry")) === 3.0)
    assert(one("GEOMETRYCOLLECTION EMPTY", st_dimensions($"geometry")) === -1)
    assert(one("POINT (1 2)", st_geometrytype($"geometry")) === "Point")
    assert(one("MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((2 2, 3 2, 2 3, 2 2)))",
      st_count_geometries($"geometry")) === 2)
    assert(one("LINESTRING (0 0, 1 1)", st_count_points($"geometry")) === 2)
    assert(one("POINT (1 2)", st_count_interior_rings($"geometry")) === 0)
    assert(one("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", st_bounds($"geometry"))
      .asInstanceOf[scala.collection.Seq[Double]].toSeq === Seq(0.0, 0.0, 1.0, 1.0))
    assert(one("POINT EMPTY", st_bounds($"geometry"))
      .asInstanceOf[scala.collection.Seq[Double]].forall(_.isNaN))
    assert(one("LINESTRING (0 0, 1 1)", st_distance($"geometry", dummyPoint)) === 1.0)
    assert(one("LINESTRING EMPTY", st_distance($"geometry", dummyPoint))
      .asInstanceOf[Double].isNaN)
  }

  test("golden values: transforms") {
    val df = fixturesDf.filter($"wkt" === "POINT (1 2)")
    val r = df.select(
      st_aswkt(st_translate($"geometry", lit(1.0), lit(1.0))).as("t"),
      st_aswkt(st_scale($"geometry", lit(2.0), lit(2.0), lit(1.0), lit("0 0"))).as("s"),
      st_aswkt(st_rotate($"geometry", lit(180.0), lit("0 0"))).as("r"),
      st_aswkt(st_flip_coordinates($"geometry")).as("f"),
      st_aswkt(st_force_3d($"geometry", lit(5.0))).as("f3"),
      st_aswkt(st_force_2d(st_force_3d($"geometry", lit(5.0)))).as("f2")).collect()(0)
    assert(r.getString(0) === "POINT (2 3)")
    assert(r.getString(1) === "POINT (2 4)")
    assert(r.getString(2) === "POINT (-1 -2)")
    assert(r.getString(3) === "POINT (2 1)")
    assert(r.getString(4) === "POINT Z (1 2 5)")
    assert(r.getString(5) === "POINT (1 2)")
  }

  test("golden values: overlay and geojson") {
    val a = st_geomfromtext(lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
    val b = st_geomfromtext(lit("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"))
    val r = spark.range(1).select(
      st_area(st_intersection(a, b)).as("i"),
      st_area(st_union(a, b)).as("u"),
      st_area(st_difference(a, b)).as("d"),
      st_area(st_symmetric_difference(a, b)).as("sd"),
      st_asgeojson(st_point(lit(1.0), lit(2.0))).as("gj")).collect()(0)
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 7.0)
    assert(r.getDouble(2) === 3.0)
    assert(r.getDouble(3) === 6.0)
    assert(r.getString(4) === """{"type":"Point","coordinates":[1,2]}""")
    // geojson round-trip
    val rt = spark.range(1).select(st_aswkt(st_geomfromgeojson(
      lit("""{"type":"LineString","coordinates":[[0,0],[1,1]]}""")))).collect()(0)
    assert(rt.getString(0) === "LINESTRING (0 0, 1 1)")
  }

  test("aggregates: identities and group semantics") {
    val df = fixturesDf
    // identity over all-null input
    val nulls = spark.range(3).withColumn("geometry", lit(null).cast(BinaryType))
    val ids = nulls.select(
      st_aswkt(st_union_all($"geometry")).as("u"),
      st_aswkt(st_collect($"geometry")).as("c"),
      st_aswkt(st_intersection_all($"geometry")).as("i"),
      st_aswkt(st_difference_all($"geometry")).as("d"),
      st_aswkt(st_symmetric_difference_all($"geometry")).as("sd"),
      st_aswkt(st_polygonize($"geometry")).as("p"),
      st_aswkt(st_voronoi_polygons($"geometry")).as("v"),
      st_aswkt(st_delaunay_triangles($"geometry")).as("dt"),
      st_total_bounds($"geometry").as("tb")).collect()(0)
    (0 to 7).foreach(i => assert(ids.getString(i) === "GEOMETRYCOLLECTION EMPTY", s"agg id $i"))
    assert(ids.getSeq[Double](8).forall(_.isNaN))

    // collect supertype inference
    val pts = Seq("POINT (0 0)", "POINT (1 1)").toDF("wkt")
      .withColumn("g", st_geomfromtext($"wkt"))
    assert(pts.select(st_aswkt(st_collect($"g"))).collect()(0).getString(0) ===
      "MULTIPOINT ((0 0), (1 1))")

    // total_bounds over fixtures
    val tb = df.select(st_total_bounds($"geometry")).collect()(0).getSeq[Double](0)
    assert(tb === Seq(0.0, 0.0, 3.0, 3.0))

    // intersection_all of nested boxes = smallest box
    val boxes = Seq("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))",
      "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))").toDF("wkt")
      .withColumn("g", st_geomfromtext($"wkt"))
    assert(boxes.select(st_area(st_intersection_all($"g"))).collect()(0).getDouble(0) === 4.0)

    // polygonize closed linework
    val lines = Seq("LINESTRING (0 0, 1 0)", "LINESTRING (1 0, 1 1)",
      "LINESTRING (1 1, 0 0)").toDF("wkt").withColumn("g", st_geomfromtext($"wkt"))
    assert(lines.select(st_area(st_polygonize($"g"))).collect()(0).getDouble(0) === 0.5)
  }

  test("grid symmetric difference: distributed tree fold == linear reference fold") {
    import spark.implicits._
    // Property-style check over several seeds AND partitionings: random
    // overlapping sixteenth-grid rects in a 4x4 window; the 0.25 snap
    // forces heavy overlap and parity cancellation. All vertices sit on
    // the snap lattice (sixteenths snap cleanly onto quarters), so every
    // intermediate overlay stays on-lattice and fold-shape invariance
    // holds EXACTLY — the distributed balanced fold (several partition
    // counts, so merge() runs with different subtree shapes) must equal
    // a strict driver-side left-to-right OverlayNG fold bit-for-bit.
    // Off-lattice inputs carry no such guarantee (hot-pixel snapping can
    // differ by pairing) — see the SymmetricDifferenceAllAgg doc.
    val reader = new org.locationtech.jts.io.WKTReader()
    val pm = new org.locationtech.jts.geom.PrecisionModel(4.0)
    for (seed <- Seq(7, 41, 9001); parts <- Seq(3, 7)) {
      val rnd = new scala.util.Random(seed)
      val wkts = (1 to 120).map { _ =>
        val x = rnd.nextInt(64) / 16.0; val y = rnd.nextInt(64) / 16.0
        val w = (rnd.nextInt(32) + 4) / 16.0; val h = (rnd.nextInt(32) + 4) / 16.0
        s"POLYGON (($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))"
      }
      val df = wkts.toDF("wkt").repartition(parts)
        .select(st_geomfromtext($"wkt").as("g"))
      val treeArea = df.agg(st_area(st_symmetric_difference_all($"g", 0.25)))
        .collect()(0).getDouble(0)
      val ref = wkts.map(reader.read).reduce((a, b) =>
        org.locationtech.jts.operation.overlayng.OverlayNG.overlay(a, b,
          org.locationtech.jts.operation.overlayng.OverlayNG.SYMDIFFERENCE, pm))
      assert(treeArea === ref.getArea,
        s"seed=$seed parts=$parts tree $treeArea vs linear ${ref.getArea}")
      assert(treeArea > 0.0, s"seed=$seed parts=$parts")
    }
  }

  test("aggregation grid_size variants and voronoi/delaunay kwargs") {
    import spark.implicits._
    // single off-grid rect: union_all(0.25) snaps per coordinate
    val one = Seq("POLYGON ((0.125 0.375, 1.375 0.375, 1.375 1.5, 0.125 1.5, 0.125 0.375))")
      .toDF("wkt").select(st_geomfromtext($"wkt").as("g"))
    assert(one.agg(st_area(st_union_all($"g", 0.25))).collect()(0).getDouble(0) === 1.25)

    // overlapping off-grid rects: snapped union / intersection / symdiff
    val two = Seq(
      "POLYGON ((0.125 0.375, 1.375 0.375, 1.375 1.5, 0.125 1.5, 0.125 0.375))",
      "POLYGON ((0.6875 0.6875, 2.0625 0.6875, 2.0625 2.0625, 0.6875 2.0625, 0.6875 0.6875))")
      .toDF("wkt").select(st_geomfromtext($"wkt").as("g"))
    val r = two.agg(
      st_area(st_union_all($"g", 0.25)).as("u"),
      st_area(st_intersection_all($"g", 0.25)).as("i"),
      st_area(st_symmetric_difference_all($"g", 0.25)).as("s")).collect()(0)
    assert(r.getDouble(0) === 2.25)
    assert(r.getDouble(1) === 0.5625)
    assert(r.getDouble(2) === 1.6875)

    // ordered difference with grid: (8×8 box) minus snapped off-grid hole
    val dd = Seq(
      (1L, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))"),
      (2L, "POLYGON ((1.125 1.375, 2.375 1.375, 2.375 2.5, 1.125 2.5, 1.125 1.375))"))
      .toDF("o", "wkt").select($"o", st_geomfromtext($"wkt").as("g"))
    assert(dd.agg(st_area(st_difference_all_ordered($"g", $"o", 0.25)))
      .collect()(0).getDouble(0) === 64.0 - 1.25)
    assert(dd.agg(st_area(st_difference_all($"g", 0.25)))
      .collect()(0).getDouble(0) === 64.0 - 1.25)

    // voronoi extend_to: cell areas partition the clip box; only_edges rings
    val pts = Seq((0.0, 0.0), (4.0, 0.0), (0.0, 3.0)).toDF("x", "y")
      .select(st_point($"x", $"y").as("g"))
    val box = Seq(-8.0, -8.0, 16.0, 16.0)
    val v = pts.agg(
      st_area(st_voronoi_polygons($"g", 0.0, false, box)).as("a"),
      st_count_geometries(st_voronoi_polygons($"g", 0.0, false, box)).as("n"),
      st_geometrytype(st_voronoi_polygons($"g", 0.0, true, box)).as("gt")).collect()(0)
    assert(v.getDouble(0) === 576.0)
    assert(v.getInt(1) === 3)
    assert(v.getString(2) === "MultiLineString")

    // delaunay only_edges: 3-4-5 triangle has 3 edges of total length 12
    val d = pts.agg(
      st_count_geometries(st_delaunay_triangles($"g", 0.0, true)).as("n"),
      st_length(st_delaunay_triangles($"g", 0.0, true)).as("len")).collect()(0)
    assert(d.getInt(0) === 3)
    assert(d.getDouble(1) === 12.0)
  }

  test("difference_all_by_row: the two-step recipe as one call") {
    // r15 (VERDICT r14 #5): the frame-level door stamps the row-order
    // key itself and must equal the documented recipe (withColumn(_mid,
    // monotonically_increasing_id()) + st_difference_all_ordered) on the
    // same ordered frame — groups, grid_size, and the guard included.
    import spark.implicits._
    val rows = Seq(
      ("a", 1, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))"),
      ("a", 2, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
      ("a", 3, "POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))"),
      ("b", 1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      ("b", 2, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"))
    val src = rows.toDF("grp", "ord", "wkt")
      .select($"grp", $"ord", st_geomfromtext($"wkt").as("g"))
      .repartition(1).sortWithinPartitions($"grp", $"ord")
    val got = graft.aggs.GeoAggs.differenceAllByRow(src, $"g", Seq($"grp"))
      .select($"grp", st_area($"difference_all").as("da"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> (64.0 - 4.0 - 4.0), "b" -> (16.0 - 1.0)))
    // recipe equivalence, ungrouped (one global fold over the frame)
    val oneGrp = src.filter($"grp" === "a")
    val viaDoor = graft.aggs.GeoAggs.differenceAllByRow(oneGrp, $"g")
      .select(st_area($"difference_all")).collect()(0).getDouble(0)
    val viaRecipe = oneGrp
      .withColumn("_mid", monotonically_increasing_id())
      .agg(st_area(st_difference_all_ordered($"g", $"_mid")))
      .collect()(0).getDouble(0)
    assert(viaDoor === viaRecipe && viaDoor === 56.0)
    // grid_size threads through to the snapping UDAF
    val off = Seq(
      (1, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))"),
      (2, "POLYGON ((1.125 1.375, 2.375 1.375, 2.375 2.5, 1.125 2.5, 1.125 1.375))"))
      .toDF("ord", "wkt")
      .select($"ord", st_geomfromtext($"wkt").as("g"))
      .repartition(1).sortWithinPartitions($"ord")
    assert(graft.aggs.GeoAggs.differenceAllByRow(off, $"g", gridSize = 0.25)
      .select(st_area($"difference_all")).collect()(0).getDouble(0)
      === 64.0 - 1.25)
    // the internal id column name is guarded against collision
    val clash = src.withColumnRenamed("ord", "__graft_diff_mid")
    val ex = intercept[IllegalArgumentException](
      graft.aggs.GeoAggs.differenceAllByRow(clash, $"g"))
    assert(ex.getMessage.contains("__graft_diff_mid"))
  }

  test("serializer kwargs: to_wkt trim/old_3d, to_geojson indent") {
    import spark.implicits._
    val df = Seq("POINT Z (1.25 2 3)").toDF("wkt")
      .select(st_geomfromtext($"wkt").as("g"))
    def one(c: org.apache.spark.sql.Column): String =
      df.select(c).collect()(0).getString(0)
    assert(one(st_aswkt($"g", lit(2), lit(false), lit(3), lit(false))) ===
      "POINT Z (1.25 2.00 3.00)")
    assert(one(st_aswkt($"g", lit(6), lit(true), lit(3), lit(true))) ===
      "POINT (1.25 2 3)")
    assert(one(st_aswkt($"g", lit(6), lit(true), lit(2), lit(false))) ===
      "POINT (1.25 2)")
    // 1.25 rounds HALF_EVEN at 1 decimal → 1.2 (GEOS %.1f parity)
    assert(one(st_asewkt(st_set_srid($"g", lit(4326)), lit(1), lit(false), lit(3),
      lit(true))) === "SRID=4326;POINT (1.2 2.0 3.0)")
    val gj = one(st_asgeojson($"g", lit(-1)))
    assert(gj === """{"type":"Point","coordinates":[1.25,2,3]}""")
    val pretty = one(st_asgeojson($"g", lit(2)))
    assert(pretty.contains("\n") && pretty.contains("  \"coordinates\""))
    val nlOnly = one(st_asgeojson($"g", lit(0)))
    assert(nlOnly.contains("\n") && !nlOnly.contains("\n "))
  }

  test("api consistency: every SQL name registered and callable") {
    Geo.registerAll(spark)
    val names = Geo.sqlNames
    assert(names.distinct.length === names.length, "duplicate SQL names")
    assert(names.size >= 110)
    val fr = spark.sessionState.catalog
    names.foreach { n =>
      assert(spark.catalog.functionExists(n), s"$n not registered")
    }
  }

  test("SQL kwargs defaults: omitted trailing args behave like the Column API") {
    Geo.registerAll(spark)
    // each pair: short SQL form ≡ explicit full form (reference defaults)
    val pairs = Seq(
      "st_aswkt(st_buffer(st_point(0.0d, 0.0d), 1.0d))" ->
        "st_aswkt(st_buffer(st_point(0.0d, 0.0d), 1.0d, 8, 'round', 'round', 5.0d, false))",
      "st_aswkt(st_simplify(st_geomfromtext('LINESTRING (0 0, 1 0.1, 2 0)'), 0.5d))" ->
        "st_aswkt(st_simplify(st_geomfromtext('LINESTRING (0 0, 1 0.1, 2 0)'), 0.5d, true))",
      "st_aswkt(st_translate(st_point(1.0d, 2.0d), 3.0d, 4.0d))" ->
        "st_aswkt(st_translate(st_point(1.0d, 2.0d), 3.0d, 4.0d, 0.0d))",
      "st_aswkt(st_rotate(st_point(1.0d, 0.0d), 90.0d))" ->
        "st_aswkt(st_rotate(st_point(1.0d, 0.0d), 90.0d, 'center'))",
      "st_aswkt(st_force_3d(st_point(1.0d, 2.0d)))" ->
        "st_aswkt(st_force_3d(st_point(1.0d, 2.0d), 0.0d))",
      "st_aswkt(st_line_merge(st_geomfromtext('MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))')))" ->
        "st_aswkt(st_line_merge(st_geomfromtext('MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))'), false))",
      "hex(st_aswkb(st_point(1.0d, 2.0d)))" ->
        "hex(st_aswkb(st_point(1.0d, 2.0d), 3, false, false))")
    pairs.foreach { case (short, full) =>
      val s = spark.sql(s"SELECT $short").collect()(0).getString(0)
      val f = spark.sql(s"SELECT $full").collect()(0).getString(0)
      assert(s == f, s"SQL default mismatch: $short -> $s vs $f")
    }
    // arity errors stay clear
    val e = intercept[Exception](
      spark.sql("SELECT st_buffer(st_point(0.0d, 0.0d))").collect())
    assert(e.getMessage.contains("argument"), e.getMessage)
  }

  test("frame-level serializers replace every geometry column (reference geodataframe.py:232-299)") {
    import graft.api._
    import org.apache.spark.sql.functions.{col, lit}
    val df = spark.range(3).select(col("id"),
      st_point(col("id").cast("double"), lit(1.0)).as("geometry"),
      st_point(lit(0.0), col("id").cast("double")).as("g2"))
    val wkt = df.stToWkt()
    assert(wkt.schema("geometry").dataType == org.apache.spark.sql.types.StringType)
    assert(wkt.schema("g2").dataType == org.apache.spark.sql.types.StringType)
    assert(wkt.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(wkt.orderBy("id").collect()(1).getString(1) == "POINT (1 1)")
    // named column: only that one serialized
    val one = df.stToGeoJson("g2")
    assert(one.schema("geometry").dataType == org.apache.spark.sql.types.BinaryType)
    assert(one.orderBy("id").collect()(2).getString(2).contains("\"Point\""))
    assert(df.stToWkb().schema("geometry").dataType ==
      org.apache.spark.sql.types.BinaryType) // wkb stays binary
    assert(df.stToEwkt().orderBy("id").collect()(0).getString(1) == "POINT (0 1)")
  }

  test("frame-level sjoinNearest sugar delegates to the tiered door") {
    import graft.api._
    import org.apache.spark.sql.functions.{col, lit}
    val probe = spark.range(4).select(col("id").as("pid"),
      st_point(col("id").cast("double") * 10.0, lit(0.0)).as("geometry"))
    val build = spark.range(4).select(col("id").as("bid"),
      st_point(col("id").cast("double") * 10.0 + 1.0, lit(0.0)).as("geometry"))
    val got = probe.sjoinNearest(build, k = 1, distanceCol = Some("d"))
      .select(col("pid"), col("bid"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq === (0 until 4).map(i => (i.toLong, i.toLong, 1.0)))
    // maxDistance + how=left flow through (probe 3 has no candidate in 0.5)
    val left = probe.sjoinNearest(build, k = 1, maxDistance = 0.5, how = "left")
      .select(col("pid"), col("bid")).collect()
    assert(left.length === 4 && left.forall(_.isNullAt(1)))
  }

  test("empty-geometry edges match GEOS (r9 functions sweep)") {
    import spark.implicits._
    def wkt1(c: Column): String =
      Seq(1).toDF("i").select(st_aswkt(c)).collect()(0).getString(0)
    def bool1(c: Column): Boolean =
      Seq(1).toDF("i").select(c).collect()(0).getBoolean(0)
    val eP = st_geomfromtext(lit("POINT EMPTY"))
    val eL = st_geomfromtext(lit("LINESTRING EMPTY"))
    val eML = st_geomfromtext(lit("MULTILINESTRING EMPTY"))
    val ePoly = st_geomfromtext(lit("POLYGON EMPTY"))
    // st_multi on empties promotes to MULTI* EMPTY (not a Multi of one
    // empty element, which crashed the GeoJSON writer)
    assert(wkt1(st_multi(eP)) === "MULTIPOINT EMPTY")
    assert(wkt1(st_multi(eL)) === "MULTILINESTRING EMPTY")
    assert(wkt1(st_multi(ePoly)) === "MULTIPOLYGON EMPTY")
    // geojson writer survives the promoted empties
    val gjMulti = Seq(1).toDF("i")
      .select(st_asgeojson(st_multi(eP))).collect()(0).getString(0)
    assert(gjMulti.contains("MultiPoint"), gjMulti)
    // GeoJSON: POINT EMPTY round-trips through our own writer; a Feature
    // with geometry:null parses (RFC 7946) instead of NPE
    val gjRt = Seq(1).toDF("i")
      .select(st_aswkt(st_geomfromgeojson(st_asgeojson(eP)))).collect()(0).getString(0)
    assert(gjRt === "POINT EMPTY")
    assert(wkt1(st_geomfromgeojson(
      lit("""{"type":"Feature","properties":{},"geometry":null}"""))) ===
      "GEOMETRYCOLLECTION EMPTY")
    // interpolate on MULTILINESTRING EMPTY degrades like LINESTRING EMPTY
    assert(wkt1(st_interpolate(eML, lit(1.0))) === "POINT EMPTY")
    // centroid-origin transforms pass empties through instead of crashing
    assert(wkt1(st_rotate(ePoly, lit(45.0), lit("centroid"))) === "POLYGON EMPTY")
    // equals: two empties ARE equal (GEOS special case); one empty is not
    assert(bool1(st_equals(eP, eL)))
    assert(!bool1(st_equals(eP, st_point(lit(1.0), lit(2.0)))))
  }
}
