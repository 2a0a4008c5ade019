package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Scratch probe: empirically pin down JTS output values before baking them
  * into oracle SQL constants. Not part of the shipped surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // dyadic sample: x0=1600, y0=32, w=1.75, h=2.25
    val df = Seq((1600.0, 32.0, 1.75, 2.25)).toDF("x0", "y0", "w", "h")
    def rect = st_rectangle($"x0", $"y0", $"x0" + $"w", $"y0" + $"h")
    def p = st_point($"x0" + $"w" / 2, $"y0" + $"h" / 2)

    def show(name: String, d: DataFrame): Unit = {
      val row = d.collect()(0)
      println(s"== $name ==")
      d.columns.zipWithIndex.foreach { case (c, i) =>
        val v = row.get(i) match {
          case x: Double => java.lang.Double.toString(x)
          case x => String.valueOf(x)
        }
        println(f"  $c%-28s $v")
      }
    }

    show("relate", df.select(
      st_relate(rect, p).as("rect_vs_pt"),
      st_relate(p, rect).as("pt_vs_rect"),
      st_relate_pattern(rect, p, lit("0FFFFF212")).as("pat_exact"),
      st_relate_pattern(rect, p, lit("T*****FF*")).as("pat_contains")))

    show("buffer", df.select(
      st_area(st_buffer(p, lit(0.5), lit(1), lit("square"), lit("round"), lit(5.0), lit(false))).as("pt_square_area_want_1.0"),
      st_aswkt(st_buffer(st_point(lit(0.0), lit(0.0)), lit(0.5), lit(1), lit("square"), lit("round"), lit(5.0), lit(false))).as("pt_square_wkt"),
      st_area(st_buffer(rect, lit(0.5), lit(1), lit("round"), lit("mitre"), lit(10.0), lit(false))).as("rect_mitre_area_want_8.9375"),
      st_area(st_buffer(rect, lit(-0.25), lit(1), lit("round"), lit("mitre"), lit(10.0), lit(false))).as("rect_neg_area_want_2.1875")))

    show("offset_segmentize", df.select(
      st_length(st_offset_curve(st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))), lit(0.5))).as("offset_len_want_1.75"),
      st_count_coordinates(st_segmentize(st_linestring(array(array($"x0", $"y0"), array($"x0", $"y0" + $"h"))), $"h" / 2)).as("seg_count_want_3"),
      st_length(st_segmentize(st_linestring(array(array($"x0", $"y0"), array($"x0", $"y0" + $"h"))), $"h" / 2)).as("seg_len_want_2.25")))

    val bowtie = st_polygon(array(array(
      array($"x0", $"y0"), array($"x0" + $"w", $"y0" + $"h"),
      array($"x0" + $"w", $"y0"), array($"x0", $"y0" + $"h"), array($"x0", $"y0"))))
    show("fix_build_node", df.select(
      st_is_valid(bowtie).as("bowtie_valid_want_false"),
      st_area(st_make_valid(bowtie)).as("fix_area_want_1.96875"),
      st_geometrytype(st_make_valid(bowtie)).as("fix_type"),
      st_area(st_build_area(st_boundary(rect))).as("build_area_want_3.9375"),
      st_geometrytype(st_node(st_multilinestring(array(
        array(array($"x0", $"y0" + $"h" / 2), array($"x0" + $"w", $"y0" + $"h" / 2)),
        array(array($"x0" + $"w" / 2, $"y0"), array($"x0" + $"w" / 2, $"y0" + $"h")))))).as("node_type"),
      st_count_geometries(st_node(st_multilinestring(array(
        array(array($"x0", $"y0" + $"h" / 2), array($"x0" + $"w", $"y0" + $"h" / 2)),
        array(array($"x0" + $"w" / 2, $"y0"), array($"x0" + $"w" / 2, $"y0" + $"h")))))).as("node_n_want_4")))

    show("constructive", df.select(
      st_count_geometries(st_extract_unique_points(rect)).as("uniq_want_4"),
      st_count_coordinates(st_simplify(st_linestring(array(
        array($"x0", $"y0"), array($"x0" + $"w" / 2, $"y0"), array($"x0" + $"w", $"y0"))), lit(0.25))).as("simp_want_2"),
      st_count_coordinates(st_remove_repeated_points(st_linestring(array(
        array($"x0", $"y0"), array($"x0", $"y0"), array($"x0" + $"w", $"y0"))), lit(0.0))).as("rrp_want_2"),
      st_x(st_point_on_surface(rect)).as("pos_x"),
      st_y(st_point_on_surface(rect)).as("pos_y"),
      st_area(st_minimum_rotated_rectangle(rect)).as("mrr_area_want_3.9375"),
      st_area(st_concave_hull(st_multipoint(array(
        array($"x0", $"y0"), array($"x0" + $"w", $"y0"),
        array($"x0" + $"w", $"y0" + $"h"), array($"x0", $"y0" + $"h"))), lit(1.0))).as("concave_want_3.9375"),
      st_x(st_centroid(rect)).as("centroid_x_want_1600.875"),
      st_y(st_centroid(rect)).as("centroid_y_want_33.125")))

    show("snap_lines", df.select(
      st_x(st_snap(st_point($"x0" - lit(0.25), $"y0"), rect, lit(0.5))).as("snap_x_want_1600"),
      st_length(st_shortest_line(rect, st_translate(rect, $"w" * 2, lit(0.0)))).as("short_want_1.75"),
      st_length(st_shared_paths(
        st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))),
        st_linestring(array(array($"x0" + $"w" / 4, $"y0"), array($"x0" + $"w", $"y0"))))).as("shared_want_1.3125"),
      st_geometrytype(st_line_merge(st_multilinestring(array(
        array(array($"x0", $"y0"), array($"x0" + $"w", $"y0")),
        array(array($"x0" + $"w", $"y0"), array($"x0" + $"w", $"y0" + $"h")))))).as("lm_type"),
      st_length(st_line_merge(st_multilinestring(array(
        array(array($"x0", $"y0"), array($"x0" + $"w", $"y0")),
        array(array($"x0" + $"w", $"y0"), array($"x0" + $"w", $"y0" + $"h")))))).as("lm_len_want_4.0"),
      st_count_geometries(st_line_merge(st_multilinestring(array(
        array(array($"x0", $"y0"), array($"x0" + $"w", $"y0")),
        array(array($"x0" + $"w", $"y0" + $"h"), array($"x0" + $"w", $"y0")))), lit(true))).as("lmdir_n_want_2")))

    // voronoi/delaunay over 4 square corners (one group)
    val corners = spark.range(4).select(
      st_point((col("id") % 2).cast("double") * 16, (col("id") / 2).cast("double") * 16).as("g"))
    show("vor_del", corners.agg(
      st_count_geometries(st_voronoi_polygons($"g")).as("vor_n_want_4"),
      st_count_geometries(st_delaunay_triangles($"g")).as("del_n_want_2"),
      st_area(st_delaunay_triangles($"g")).as("del_area_want_256"),
      st_geometrytype(st_voronoi_polygons($"g")).as("vor_type"),
      st_geometrytype(st_delaunay_triangles($"g")).as("del_type")))

    show("linref", df.select(
      st_x(st_interpolate(st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))), $"w" / 2)).as("interp_x_want_1600.875"),
      st_x(st_interpolate(st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))), lit(0.5), lit(true))).as("interp_norm_x_want_1600.875"),
      st_project(st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))),
        st_point($"x0" + $"w" / 4, $"y0" + lit(1.0))).as("proj_want_0.4375"),
      st_project(st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))),
        st_point($"x0" + $"w" / 4, $"y0" + lit(1.0)), lit(true)).as("projn_want_0.25")))

    show("measure", df.select(
      st_hausdorff_distance(p, st_translate(p, $"w", lit(0.0))).as("haus_want_1.75"),
      st_hausdorff_distance(
        st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))),
        st_linestring(array(array($"x0", $"y0" + $"h"), array($"x0" + $"w", $"y0" + $"h"))), lit(0.5)).as("hausd_want_2.25"),
      st_frechet_distance(p, st_translate(p, $"w", lit(0.0))).as("frech_want_1.75"),
      st_frechet_distance(
        st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))),
        st_linestring(array(array($"x0", $"y0" + $"h"), array($"x0" + $"w", $"y0" + $"h"))), lit(0.5)).as("frechd_want_2.25"),
      st_minimum_clearance(rect).as("clear_want_1.75"),
      st_distance(p, st_translate(p, $"w", $"h")).as("dist_diag"),
      sqrt($"w" * $"w" + $"h" * $"h").as("sqrt_duck_style")))

    show("serde", df.select(
      st_aswkt(st_point(lit(1600.25), lit(32.0))).as("wkt_frac"),
      st_aswkt(st_point(lit(1600.0), lit(32.0))).as("wkt_int"),
      st_asewkt(st_set_srid(st_point(lit(1600.0), lit(32.0)), lit(4326))).as("ewkt"),
      st_aswkt(st_point(lit(1600.25), lit(32.0)), lit(1)).as("wkt_prec1"),
      length(st_aswkb(p)).as("wkb_len_want_21"),
      hex(substring(st_aswkb(p, lit(2), lit(true), lit(false)), 1, 1)).as("wkb_be_first"),
      length(st_aswkb(st_set_srid(p, lit(4326)), lit(2), lit(false), lit(true))).as("wkb_srid_len_want_25"),
      st_asgeojson(st_point(lit(1600.0), lit(32.0))).as("geojson_int"),
      st_asgeojson(st_point(lit(1600.25), lit(32.0))).as("geojson_frac")))

    show("misc", df.select(
      st_geometrytype(st_cast(p, lit("MultiPoint"))).as("cast_type"),
      st_geometrytype(st_multi(rect)).as("multi_type"),
      st_x(st_rotate(p, lit(37.0))).as("rot_pt_self_x_want_1600.875"),
      st_z(st_force_3d(p, lit(1.25))).as("f3d_z_want_1.25"),
      st_has_z(st_force_2d(st_point($"x0", $"y0", lit(3.0)))).as("f2d_hasz_want_false"),
      st_is_ccw(st_cast(st_exterior_ring(rect), lit("LineString"))).as("ccw_probe"),
      st_is_ccw(st_exterior_ring(rect)).as("ccw_ring"),
      st_geometrytype(st_boundary(rect)).as("bdry_type"),
      st_length(st_boundary(rect)).as("bdry_len_want_8.0"),
      st_dwithin(p, st_translate(p, $"w", lit(0.0)), $"w").as("dwithin_eq_want_false"),
      st_dwithin(p, st_translate(p, $"w", lit(0.0)), $"w" + lit(0.25)).as("dwithin_lt_want_true"),
      st_equals_exact(rect, st_translate(rect, lit(0.25), lit(0.0)), lit(0.5)).as("eqexact_want_true"),
      st_equals(rect, st_reverse(rect)).as("eq_rev_want_true")))

    show("crs", df.select(
      st_x(st_to_srid(st_set_srid(st_point(lit(10.0), lit(45.0)), lit(4326)), lit(3857))).as("merc_x"),
      st_y(st_to_srid(st_set_srid(st_point(lit(10.0), lit(45.0)), lit(4326)), lit(3857))).as("merc_y"),
      st_x(st_to_srid(st_to_srid(st_set_srid(st_point(lit(10.0), lit(45.0)), lit(4326)), lit(3857)), lit(4326))).as("rt_x"),
      graft.functions.st_srid(st_set_srid(p, lit(3857))).as("srid_want_3857")))

    // intersection_all on nested rects: [0,0,16+i%3, 16+i%2]
    val nested = spark.range(6).select(
      st_rectangle(lit(0.0), lit(0.0),
        lit(16.0) + (col("id") % 3).cast("double"),
        lit(16.0) + (col("id") % 2).cast("double")).as("g"))
    show("inter_all", nested.agg(
      st_area(st_intersection_all($"g")).as("ia_want_256"),
      st_geometrytype(st_collect($"g")).as("collect_type"),
      st_count_geometries(st_collect($"g")).as("collect_n_want_6"),
      st_area(st_symmetric_difference_all($"g")).as("sda")))

    // coverage_union_all + polygonize on disjoint boxes
    val disj = spark.range(4).select(
      st_rectangle(col("id").cast("double") * 32, lit(0.0),
        col("id").cast("double") * 32 + 16, lit(16.0)).as("g"))
    show("cov_poly", disj.agg(
      st_area(st_coverage_union_all($"g")).as("cua_want_1024"),
      st_area(st_polygonize(st_boundary($"g"))).as("poly_area_want_1024"),
      st_count_geometries(st_polygonize(st_boundary($"g"))).as("poly_n_want_4"),
      st_area(st_symmetric_difference_all($"g")).as("sda_want_1024"),
      st_aswkt(st_union_all(when(lit(false), $"g"))).as("empty_union_wkt"),
      element_at(st_total_bounds(when(lit(false), $"g")), 1).as("empty_tb_nan")))

    // geometry-list eval: transform over st_parts with a UDF inside lambda
    println("== list-eval probe ==")
    try {
      val r = df.select(transform(st_parts(st_multi(rect)), g => st_area(g)).as("areas")).collect()
      println("  transform+UDF OK: " + r(0).getSeq[Double](0))
    } catch { case e: Throwable => println("  transform+UDF FAILS: " + e.getMessage.take(120)) }


    show("single_sided_buffer", df.select(
      st_area(st_buffer(st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))),
        lit(0.5), lit(8), lit("round"), lit("round"), lit(5.0), lit(true))).as("ss_pos_area_want_0.875"),
      st_aswkt(st_buffer(st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))),
        lit(0.5), lit(8), lit("round"), lit("round"), lit(5.0), lit(true))).as("ss_pos_wkt"),
      st_area(st_buffer(st_linestring(array(array($"x0", $"y0"), array($"x0" + $"w", $"y0"))),
        lit(-0.5), lit(8), lit("round"), lit("round"), lit(5.0), lit(true))).as("ss_neg_area")))

    spark.stop()
  }
}
