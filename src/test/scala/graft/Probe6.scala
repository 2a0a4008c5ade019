package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Probe: voronoi extend_to area invariant, grid-size agg snapping math. */
object Probe6 {
  def main(args: Array[String]): Unit = {
    // --- pure JTS: precision reducer vs UnaryUnionNG snapping
    val wktr = new org.locationtech.jts.io.WKTReader()
    val pm = new org.locationtech.jts.geom.PrecisionModel(4.0) // grid 0.25
    val r1 = wktr.read("POLYGON((0.125 0.375, 1.375 0.375, 1.375 1.5, 0.125 1.5, 0.125 0.375))")
    val red = org.locationtech.jts.precision.GeometryPrecisionReducer.reduce(r1, pm)
    println(s"reduce single: area=${red.getArea} wkt=$red  (expect 1.25: x 0.25..1.5, y 0.5..1.5)")
    // two disjoint rects through UnaryUnionNG
    val r2 = wktr.read("POLYGON((2.125 0.375, 3.375 0.375, 3.375 1.5, 2.125 1.5, 2.125 0.375))")
    import scala.jdk.CollectionConverters._
    val u2 = org.locationtech.jts.operation.overlayng.UnaryUnionNG.union(
      Seq(r1, r2).asJava.asInstanceOf[java.util.Collection[org.locationtech.jts.geom.Geometry]], pm)
    println(s"unionNG two disjoint: area=${u2.getArea} (expect 2.5 if snapped, 2.8125 if not)")
    // overlapping rects
    val r3 = wktr.read("POLYGON((0.6875 0.6875, 2.0625 0.6875, 2.0625 2.0625, 0.6875 2.0625, 0.6875 0.6875))")
    val u3 = org.locationtech.jts.operation.overlayng.UnaryUnionNG.union(
      Seq(r1, r3).asJava.asInstanceOf[java.util.Collection[org.locationtech.jts.geom.Geometry]], pm)
    println(s"unionNG overlap: area=${u3.getArea}")
    // snapped manually then unioned: r1s x .25..1.5 y .5..1.5 ; r3s: snap(.6875)=.75, snap(2.0625)=2.0 → x .75..2.0 y .75..2.0
    // union area = 1.25*1.0 + 1.25*1.25 - overlap(.75..1.5 x .75..1.5 = .75*.75=.5625) = 1.25+1.5625-0.5625 = 2.25
    println("expect 2.25 if inputs snapped per-coordinate first")
    // intersection with grid via OverlayNG
    val i3 = org.locationtech.jts.operation.overlayng.OverlayNG.overlay(r1, r3,
      org.locationtech.jts.operation.overlayng.OverlayNG.INTERSECTION, pm)
    println(s"overlayNG intersect: area=${i3.getArea} (expect .5625)")
    // reducer on a point off grid
    val p = wktr.read("POINT(0.1875 0.3125)")
    println(s"reduce point: ${org.locationtech.jts.precision.GeometryPrecisionReducer.reduce(p, pm)} (expect POINT(0.25 0.25)? snap .1875->.25, .3125->.25? floor(.3125*4+.5)/4=floor(1.75)/4=.25)")

    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- grid union via the agg after fix: single geometry should snap
    val one = Seq(1).toDF("i").select(
      st_rectangle(lit(0.125), lit(0.375), lit(1.375), lit(1.5)).as("g"))
    one.agg(st_area(st_union_all(col("g"), 0.25)).as("a")).show()
    println("expected 1.25 after single-geom snap fix")

    // grid intersection_all / symmetric_difference_all over 2 rows
    val two = Seq(
      ("POLYGON((0.125 0.375, 1.375 0.375, 1.375 1.5, 0.125 1.5, 0.125 0.375))"),
      ("POLYGON((0.6875 0.6875, 2.0625 0.6875, 2.0625 2.0625, 0.6875 2.0625, 0.6875 0.6875))"))
      .toDF("w").select(st_geomfromtext(col("w")).as("g"))
    two.agg(
      st_area(st_intersection_all(col("g"), 0.25)).as("ia"),
      st_area(st_symmetric_difference_all(col("g"), 0.25)).as("sa"),
      st_area(st_union_all(col("g"), 0.25)).as("ua")).show()
    println("expect ia=.5625 ua=2.25 sa=2.25-.5625=1.6875")
    spark.stop()
  }
}
