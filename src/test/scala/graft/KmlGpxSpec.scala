package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KML and GPX round-trips through the pure-JVM StAX codecs
  * (`io/Kml.scala`, `io/Gpx.scala`), mirroring the reference's
  * `read_file` surface via the OGR KML/GPX drivers
  * (`/root/reference/polars_st/input.py:30-153`). Both formats pin the
  * CRS to 4326; coordinates are dyadic so equality is exact. */
class KmlGpxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_xml").toString + "/" + name

  test("kml: polygon + attributes round-trip, name/description, srid") {
    val df = (1 to 25).map { i =>
      val x = i * 4.0; val y = i * 2.0
      (i.toLong, s"pm_$i", s"d_$i",
        s"POLYGON (($x $y, ${x + 2} $y, ${x + 2} ${y + 1.5}, $x ${y + 1.5}, $x $y))")
    }.toDF("k", "name", "note", "wkt")
      .select($"k", $"name", $"note",
        st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
    val path = tmp("boxes.kml")
    graft.io.GeoIO.writeKml(df, path)
    val back = graft.io.GeoIO.readKml(spark, path)
    assert(back.columns.toSeq === Seq("geometry", "name", "description", "k", "note"))
    val rows = back.select($"k".cast("long"), $"name", $"note",
        st_area($"geometry").as("a"),
        graft.functions.st_srid($"geometry").as("srid"))
      .orderBy($"k").collect()
    assert(rows.length === 25)
    rows.zipWithIndex.foreach { case (r, idx) =>
      val i = idx + 1
      assert(r.getLong(0) === i.toLong)
      assert(r.getString(1) === s"pm_$i")
      assert(r.getString(2) === s"d_$i")
      assert(r.getDouble(3) === 3.0) // 2 x 1.5, dyadic-exact
      assert(r.getInt(4) === 4326)
    }
  }

  test("kml: point/line/multi geometry classes and polygon holes survive") {
    val wkts = Seq(
      "POINT (1.5 2.25)",
      "POINT Z (1.5 2.25 10.5)",
      "LINESTRING (0 0, 1 1, 2 0.5)",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    val df = wkts.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("k", "wkt")
      .select($"k", st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
    val path = tmp("classes.kml")
    graft.io.GeoIO.writeKml(df, path)
    val back = graft.io.GeoIO.readKml(spark, path)
      .select($"k".cast("long"), st_aswkt($"geometry").as("wkt"))
      .orderBy($"k").collect()
    assert(back.length === wkts.length)
    // KML's MultiGeometry drops the Multi*/GeometryCollection distinction
    // for homogeneous children only when mixed; our reader rebuilds the
    // homogeneous Multi* classes
    val got = back.map(_.getString(1))
    assert(got(0) === "POINT (1.5 2.25)")
    assert(got(1).startsWith("POINT Z") && got(1).contains("10.5"))
    assert(got(2) === "LINESTRING (0 0, 1 1, 2 0.5)")
    assert(got(3) === "MULTIPOINT ((1 1), (2 2))")
    assert(got(4) === "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))")
    assert(got(5) === wkts(5))
    assert(got(6) === wkts(6))
    assert(got(7) === wkts(7))
  }

  test("kml: reads external documents with styles, folders, schema data") {
    // hand-authored KML exercising pieces our writer never emits
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
        |<Style id="s1"><IconStyle><scale>1.2</scale></IconStyle></Style>
        |<Folder><name>f</name>
        |<Placemark><name>a &amp; b</name>
        |  <styleUrl>#s1</styleUrl>
        |  <ExtendedData>
        |    <Data name="pop"><displayName>Population</displayName><value>42</value></Data>
        |    <SchemaData schemaUrl="#t"><SimpleData name="code">NZ</SimpleData></SchemaData>
        |  </ExtendedData>
        |  <Point><extrude>0</extrude><coordinates>
        |    174.75,-41.25,12.5
        |  </coordinates></Point>
        |</Placemark>
        |<Placemark><name>noGeom</name></Placemark>
        |</Folder></Document></kml>""".stripMargin
    val path = tmp("ext.kml")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val back = graft.io.GeoIO.readKml(spark, path)
    assert(back.columns.toSeq ===
      Seq("geometry", "name", "description", "pop", "code"))
    val rows = back.orderBy($"name").collect()
    assert(rows.length === 2)
    val r = rows.head
    assert(r.getString(1) === "a & b")
    assert(r.getString(3) === "42" && r.getString(4) === "NZ")
    val pt = back.filter($"name" === "a & b")
      .select(st_x($"geometry"), st_y($"geometry"), st_z($"geometry"))
      .head()
    assert(pt.getDouble(0) === 174.75 && pt.getDouble(1) === -41.25
      && pt.getDouble(2) === 12.5)
    assert(rows(1).getString(1) === "noGeom" && rows(1).isNullAt(0))
  }

  test("gpx: waypoint + track round-trip across all five layers") {
    val pts = (1 to 12).map { i =>
      (i.toLong, s"w$i", s"POINT Z (${170 + i * 0.25} ${-40 - i * 0.25} ${i * 10.0})")
    }.toDF("k", "name", "wkt")
      .select($"name",
        st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
    val lines = Seq(
      ("t1", "MULTILINESTRING ((170 -40, 170.5 -40.5), (171 -41, 171.5 -41.5, 172 -41))"),
      ("t2", "LINESTRING (172 -42, 172.25 -42.25)"))
      .toDF("name", "wkt")
      .select($"name", st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
    val path = tmp("mixed.gpx")
    graft.io.GeoIO.writeGpx(pts.unionByName(lines), path)

    val w = graft.io.GeoIO.readGpx(spark, path, "waypoints")
    assert(w.columns.toSeq ===
      Seq("geometry", "ele", "time", "name", "desc", "sym", "type"))
    val wr = w.select($"name", $"ele", st_x($"geometry").as("x"),
        st_z($"geometry").as("z"),
        graft.functions.st_srid($"geometry").as("srid"))
      .orderBy(length($"name"), $"name").collect()
    assert(wr.length === 12)
    assert(wr.head.getString(0) === "w1")
    assert(wr.head.getDouble(1) === 10.0 && wr.head.getDouble(3) === 10.0)
    assert(wr.head.getDouble(2) === 170.25)
    assert(wr.head.getInt(4) === 4326)

    val t = graft.io.GeoIO.readGpx(spark, path, "tracks")
      .select($"name", st_aswkt($"geometry").as("wkt")).orderBy($"name").collect()
    assert(t.length === 2)
    assert(t(0).getString(1) ===
      "MULTILINESTRING ((170 -40, 170.5 -40.5), (171 -41, 171.5 -41.5, 172 -41))")
    // single LineString comes back as a one-part MultiLineString (trkseg)
    assert(t(1).getString(1) === "MULTILINESTRING ((172 -42, 172.25 -42.25))")

    val tp = graft.io.GeoIO.readGpx(spark, path, "track_points")
    assert(tp.count() === 5 + 2)
    val seg1 = tp.filter($"track_fid" === 0 && $"track_seg_id" === 1)
      .orderBy($"track_seg_point_id")
      .select(st_x($"geometry")).collect().map(_.getDouble(0)).toSeq
    assert(seg1 === Seq(171.0, 171.5, 172.0))
  }

  test("gpx: reads external documents with routes and metadata") {
    val xml =
      """<?xml version="1.0"?>
        |<gpx version="1.1" creator="x" xmlns="http://www.topografix.com/GPX/1/1">
        |<metadata><name>doc</name><bounds minlat="-42" minlon="170" maxlat="-40" maxlon="175"/></metadata>
        |<wpt lat="-41.25" lon="174.75"><ele>5.5</ele><time>2020-01-02T03:04:05Z</time>
        |  <name>wgtn</name><sym>City</sym><type>seat</type></wpt>
        |<rte><name>r1</name><desc>ferry</desc>
        |  <rtept lat="-41.25" lon="174.75"><name>a</name></rtept>
        |  <rtept lat="-41.0" lon="174.0"><ele>1.25</ele></rtept>
        |  <rtept lat="-40.75" lon="173.5"/>
        |</rte>
        |</gpx>""".stripMargin
    val path = tmp("routes.gpx")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val w = graft.io.GeoIO.readGpx(spark, path, "waypoints").head()
    assert(w.getDouble(1) === 5.5)
    assert(w.getString(2) === "2020-01-02T03:04:05Z")
    assert(w.getString(3) === "wgtn" && w.getString(5) === "City"
      && w.getString(6) === "seat")
    val r = graft.io.GeoIO.readGpx(spark, path, "routes")
      .select($"name", $"desc", st_aswkt($"geometry")).head()
    assert(r.getString(0) === "r1" && r.getString(1) === "ferry")
    assert(r.getString(2) === "LINESTRING (174.75 -41.25, 174 -41, 173.5 -40.75)")
    val rp = graft.io.GeoIO.readGpx(spark, path, "route_points")
      .orderBy($"route_point_id").collect()
    assert(rp.length === 3)
    assert(rp(0).getLong(1) === 0L && rp(0).getLong(2) === 0L
      && rp(0).getString(5) === "a")
    assert(rp(1).getDouble(3) === 1.25)
    assert(rp(2).isNullAt(3)) // no ele
  }

  test("gml: polygon + attribute round-trip, geometry classes, srid") {
    val wkts = Seq(
      "POINT (1.5 2.25)",
      "POINT Z (1.5 2.25 10.5)",
      "LINESTRING (0 0, 1 1, 2 0.5)",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    val df = wkts.zipWithIndex
      .map { case (w, i) => (i.toLong, s"n$i", w) }.toDF("k", "name", "wkt")
      .select($"k", $"name",
        st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
    val path = tmp("classes.gml")
    graft.io.GeoIO.writeGml(df, path)
    val back = graft.io.GeoIO.readGml(spark, path)
    assert(back.columns.toSeq === Seq("geometry", "k", "name"))
    val rows = back.select($"k".cast("long"), $"name",
        st_aswkt($"geometry").as("wkt"),
        graft.functions.st_srid($"geometry").as("srid"))
      .orderBy($"k").collect()
    assert(rows.length === wkts.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(1) === s"n$i")
      assert(r.getInt(3) === 4326)
    }
    val got = rows.map(_.getString(2))
    assert(got(0) === "POINT (1.5 2.25)")
    assert(got(1).startsWith("POINT Z") && got(1).contains("10.5"))
    assert(got(2) === "LINESTRING (0 0, 1 1, 2 0.5)")
    assert(got(3) === "MULTIPOINT ((1 1), (2 2))")
    assert(got(4) === "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))")
    assert(got(5) === wkts(5))
    assert(got(6) === wkts(6))
  }

  test("gml: reads external GML2 and urn-axis-order GML3 documents") {
    // GML2 coordinates encoding with legacy srsName (axis order as
    // written, lon/lat) + GML3 posList with urn srsName on a geographic
    // CRS (lat-first per the GML3 convention — reader must swap)
    val xml =
      """<?xml version="1.0"?>
        |<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
        |  xmlns:gml="http://www.opengis.net/gml" xmlns:app="urn:app">
        |<gml:featureMember>
        |  <app:city><app:name>wellington</app:name><app:pop>212000</app:pop>
        |    <app:shape>
        |      <gml:Point srsName="EPSG:4326"><gml:coordinates>174.75,-41.25</gml:coordinates></gml:Point>
        |    </app:shape>
        |  </app:city>
        |</gml:featureMember>
        |<gml:featureMember>
        |  <app:city><app:name>auckland</app:name><app:pop>1463000</app:pop>
        |    <app:shape>
        |      <gml:Point srsName="urn:ogc:def:crs:EPSG::4326"><gml:pos>-36.85 174.76</gml:pos></gml:Point>
        |    </app:shape>
        |  </app:city>
        |</gml:featureMember>
        |<gml:featureMember>
        |  <app:zone><app:name>box</app:name>
        |    <gml:Polygon srsName="EPSG:4326"><gml:outerBoundaryIs><gml:LinearRing>
        |      <gml:coordinates>0,0 2,0 2,1.5 0,1.5 0,0</gml:coordinates>
        |    </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>
        |  </app:zone>
        |</gml:featureMember>
        |</wfs:FeatureCollection>""".stripMargin
    val path = tmp("cities.gml")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val back = graft.io.GeoIO.readGml(spark, path)
    assert(back.columns.toSeq === Seq("geometry", "name", "pop"))
    val wgtn = back.filter($"name" === "wellington")
      .select(st_x($"geometry"), st_y($"geometry"),
        graft.functions.st_srid($"geometry"), $"pop").head()
    assert(wgtn.getDouble(0) === 174.75 && wgtn.getDouble(1) === -41.25)
    assert(wgtn.getInt(2) === 4326 && wgtn.getString(3) === "212000")
    // urn form: lat-first on the wire, lon/lat after the reader swap
    val akl = back.filter($"name" === "auckland")
      .select(st_x($"geometry"), st_y($"geometry")).head()
    assert(akl.getDouble(0) === 174.76 && akl.getDouble(1) === -36.85)
    val box = back.filter($"name" === "box")
      .select(st_area($"geometry")).head()
    assert(box.getDouble(0) === 3.0)
  }

  test("mif: typed attribute round-trip across geometry classes") {
    val wkts = Seq(
      "POINT (1.5 2.25)",
      "LINESTRING (0 0, 1 1, 2 0.5)",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((1 1), (2 2))")
    val df = wkts.zipWithIndex
      .map { case (w, i) => (i.toLong, i * 0.25, i % 2 == 0, s"r,\"$i\"", w) }
      .toDF("k", "score", "flag", "name", "wkt")
      .select($"k", $"score", $"flag", $"name",
        st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mif").toString
    val path = s"$dir/t.mif"
    graft.io.GeoIO.writeMif(df, path)
    assert(new java.io.File(path).exists())
    assert(new java.io.File(s"$dir/t.mid").exists())
    val back = graft.io.GeoIO.readMif(spark, path)
    assert(back.columns.toSeq === Seq("geometry", "k", "score", "flag", "name"))
    val rows = back.select($"k", $"score", $"flag", $"name",
        st_aswkt($"geometry").as("wkt"),
        graft.functions.st_srid($"geometry").as("srid"))
      .orderBy($"k").collect()
    assert(rows.length === wkts.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getDouble(1) === i * 0.25)
      assert(r.getBoolean(2) === (i % 2 == 0))
      assert(r.getString(3) === s"r,\"$i\"") // delimiter + quote survive
      assert(r.getInt(5) === 4326)
    }
    val got = rows.map(_.getString(4))
    assert(got(0) === "POINT (1.5 2.25)")
    // MIF has no single-vs-multi polyline distinction on read: a 1-part
    // Pline comes back as LINESTRING, Multiple as MULTILINESTRING
    assert(got(1) === "LINESTRING (0 0, 1 1, 2 0.5)")
    assert(got(2) === "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))")
    // Region rings → shell + contained hole by MapInfo semantics
    assert(got(3) === wkts(3))
    assert(got(4) === "MULTIPOINT ((1 1), (2 2))")
  }

  test("mif: reads external documents with style clauses and none rows") {
    val mif =
      """Version 300
        |Charset "WindowsLatin1"
        |Delimiter ","
        |CoordSys Earth Projection 1, 104
        |Columns 2
        |  id Integer
        |  label Char(20)
        |Data
        |
        |Point 174.75 -41.25
        |    Symbol (34,0,12)
        |Region 2
        |  5
        |0 0
        |4 0
        |4 4
        |0 4
        |0 0
        |  5
        |1 1
        |2 1
        |2 2
        |1 2
        |1 1
        |    Pen (1,2,0)
        |    Brush (2,16777215)
        |None
        |""".stripMargin
    val mid =
      """1,"wgtn"
        |2,"donut"
        |3,"empty"
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_mif2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/x.mif"),
      mif.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/x.mid"),
      mid.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val back = graft.io.GeoIO.readMif(spark, s"$dir/x.mif").orderBy($"id")
    val rows = back.select($"id", $"label", st_aswkt($"geometry").as("w"),
      graft.functions.st_srid($"geometry").as("srid")).collect()
    assert(rows.length === 3)
    assert(rows(0).getLong(0) === 1L && rows(0).getString(1) === "wgtn")
    assert(rows(0).getString(2) === "POINT (174.75 -41.25)")
    assert(rows(0).getInt(3) === 4326)
    assert(rows(1).getString(1) === "donut")
    assert(rows(1).getString(2) ===
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(rows(2).getString(2) === "GEOMETRYCOLLECTION EMPTY")
  }

  test("dxf: point/line/polyline round-trip with layers; arcs linearize") {
    val df = Seq(
      ("pts", "POINT (1.5 2.25)"),
      ("lines", "LINESTRING (0 0, 1 1, 2 0.5)"),
      ("lines", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"),
      ("polys", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"))
      .toDF("layer", "wkt")
      .select($"layer", st_geomfromtext($"wkt").as("geometry"))
    val dir = java.nio.file.Files.createTempDirectory("graft_dxf").toString
    val path = s"$dir/t.dxf"
    graft.io.GeoIO.writeDxf(df, path)
    val back = graft.io.GeoIO.readDxf(spark, path)
    assert(back.columns.toSeq === Seq("geometry", "layer"))
    // polygon rings expand to closed polylines; multiline to 2 entities:
    // 1 point + 1 line + 2 lines + 2 rings = 6 entities
    assert(back.count() === 6)
    val pt = back.filter($"layer" === "pts")
      .select(st_aswkt($"geometry")).head().getString(0)
    assert(pt === "POINT (1.5 2.25)")
    val lines = back.filter($"layer" === "lines")
      .select(st_aswkt($"geometry")).collect().map(_.getString(0)).sorted
    assert(lines === Array("LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1, 2 0.5)",
      "LINESTRING (2 2, 3 3)"))
    // rings read back closed with the documented boundary-export loss
    val rings = back.filter($"layer" === "polys")
    assert(rings.count() === 2)
    val ringLens = rings.select(st_length($"geometry"))
      .collect().map(_.getDouble(0)).sorted
    assert(ringLens === Array(4.0, 16.0))

    // hand-authored document: POLYLINE/VERTEX/SEQEND, CIRCLE, ARC, and an
    // entity type we skip (TEXT)
    val dxf = Seq(
      "0", "SECTION", "2", "ENTITIES",
      "0", "POLYLINE", "8", "road", "70", "1",
      "0", "VERTEX", "10", "0", "20", "0",
      "0", "VERTEX", "10", "2", "20", "0",
      "0", "VERTEX", "10", "2", "20", "2",
      "0", "SEQEND",
      "0", "CIRCLE", "8", "circ", "10", "10", "20", "10", "40", "2",
      "0", "ARC", "8", "arc", "10", "0", "20", "0", "40", "1",
      "50", "0", "51", "90",
      "0", "TEXT", "8", "t", "1", "hello", "10", "0", "20", "0",
      "0", "ENDSEC", "0", "EOF").mkString("\n")
    val p2 = s"$dir/hand.dxf"
    java.nio.file.Files.write(java.nio.file.Paths.get(p2),
      dxf.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hb = graft.io.GeoIO.readDxf(spark, p2)
    assert(hb.count() === 3) // TEXT skipped
    val road = hb.filter($"layer" === "road")
      .select(st_aswkt($"geometry")).head().getString(0)
    assert(road === "LINESTRING (0 0, 2 0, 2 2, 0 0)") // closed flag honored
    val circ = hb.filter($"layer" === "circ").select(
      st_area($"geometry"), st_count_coordinates($"geometry")).head()
    // 64-chord circle area within 1% of pi r^2
    assert(math.abs(circ.getDouble(0) - math.Pi * 4) / (math.Pi * 4) < 0.01)
    val arc = hb.filter($"layer" === "arc").select(
      st_length($"geometry"), st_count_coordinates($"geometry")).head()
    // quarter unit circle, 16 chords ≈ pi/2
    assert(math.abs(arc.getDouble(0) - math.Pi / 2) < 0.01)
  }

  test("kml + gpx: multi-file directory reads parallelize per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_dir").toString
    for (part <- 0 until 3) {
      val df = (0 until 10).map { i =>
        val kk = part * 10 + i
        (kk.toLong, s"POINT (${kk}.5 ${kk}.25)")
      }.toDF("k", "wkt")
        .select($"k", st_set_srid(st_geomfromtext($"wkt"), lit(4326)).as("geometry"))
      graft.io.GeoIO.writeKml(df, s"$dir/part$part.kml")
      graft.io.GeoIO.writeGpx(df.withColumn("name", $"k".cast("string")),
        s"$dir/part$part.gpx")
    }
    val kml = graft.io.GeoIO.readKml(spark, dir)
    assert(kml.rdd.getNumPartitions === 3)
    assert(kml.count() === 30)
    assert(kml.agg(sum($"k".cast("long"))).head().getLong(0) === (0 until 30).sum)
    val gpx = graft.io.GeoIO.readGpx(spark, dir)
    assert(gpx.count() === 30)
    assert(gpx.agg(sum($"name".cast("long"))).head().getLong(0) === (0 until 30).sum)
  }

  test("kml: a 'description' column round-trips to the description element, once") {
    val d = java.nio.file.Files.createTempDirectory("kml_desc").toString
    val df = Seq((1L, "n1", "about one")).toDF("k", "name", "description")
      .select($"k", $"name", $"description",
        graft.functions.st_set_srid(
          graft.functions.st_point(lit(1.0), lit(2.0)), lit(4326)).as("geometry"))
    graft.io.GeoIO.writeKml(df, s"$d/t.kml")
    val back = graft.io.GeoIO.readKml(spark, s"$d/t.kml")
    // exactly ONE description column (writing it as Data used to come
    // back as a duplicate), holding the value
    assert(back.columns.count(_ == "description") === 1)
    assert(back.select($"description").collect().map(_.getString(0)).toSeq
      === Seq("about one"))
  }

  test("degenerate inputs: 1-point lines, empty points, hostile column names") {
    import graft.serde.EWKB
    val wkt = new org.locationtech.jts.io.WKTReader(EWKB.geometryFactory)
    // GPX: a schema-valid route with a single rtept reads as a
    // zero-length line instead of crashing the file
    val oneRte = ("""<?xml version="1.0"?><gpx version="1.1" creator="t" """ +
      """xmlns="http://www.topografix.com/GPX/1/1">""" +
      """<rte><name>r</name><rtept lat="1" lon="2"/></rte></gpx>""").getBytes("UTF-8")
    val doc = graft.io.Gpx.read(oneRte)
    assert(doc.routes.length === 1)
    val rg = graft.io.Gpx.routeGeom(doc.routes.head)
    assert(rg.getLength === 0.0 && rg.getNumPoints === 2)
    // GPX: missing lat attribute raises a diagnosable error, not an NPE
    val badPt = ("""<?xml version="1.0"?><gpx version="1.1" creator="t" """ +
      """xmlns="http://www.topografix.com/GPX/1/1"><wpt lon="1"/></gpx>""").getBytes("UTF-8")
    val e = intercept[IllegalArgumentException](graft.io.Gpx.read(badPt))
    assert(e.getMessage.contains("lat/lon"))
    // DXF: one-vertex LWPOLYLINE degrades instead of aborting the read
    val sb = new StringBuilder
    Seq("0","SECTION","2","ENTITIES","0","LWPOLYLINE","8","L","10","3.0","20","4.0",
      "0","ENDSEC","0","EOF").foreach(v => sb.append(v).append("\n"))
    val ents = graft.io.Dxf.readEntities(sb.toString)
    assert(ents.length === 1 && ents.head.geom.getLength === 0.0)
    // empty POINT: every writer skips/degrades instead of crashing
    val empty = wkt.read("POINT EMPTY")
    graft.io.Dxf.write(Iterator((empty, "0")))
    graft.io.Gpx.write(Iterator((empty, "n")), "t")
    val (mifS, _) = graft.io.MapInfo.write(
      Seq.empty, Seq((empty, Array[String]())).iterator, 0)
    assert(mifS.contains("None"))
    // GML: a column name with a space still yields well-formed XML
    val bytes = graft.io.Gml.write(
      Iterator((wkt.read("POINT (1 2)"), Seq(("my col", "v"), ("2bad&", "w")))), "f x")
    val back = graft.io.Gml.readFeatures(bytes)
    assert(back.length === 1)
    assert(back.head.data === Map("my_col" -> "v", "_2bad_" -> "w"))
    // ADVICE r8: names that sanitize to the SAME NCName must not merge —
    // the second collision gets a numeric suffix, values stay distinct
    val collide = graft.io.Gml.write(
      Iterator((wkt.read("POINT (1 2)"), Seq(("a b", "v1"), ("a&b", "v2")))), "f")
    val cBack = graft.io.Gml.readFeatures(collide)
    assert(cBack.head.data === Map("a_b" -> "v1", "a_b_2" -> "v2"))
  }

  test("kml: an all-null attribute column survives the round trip as null") {
    // nulls write an EMPTY Data element: omitting it entirely would drop
    // a column that is null in every feature from the read-back schema,
    // while writing <value></value> would turn null into empty string
    val d = java.nio.file.Files.createTempDirectory("kml_nulls").toString
    val df = Seq(
      (1L, "a", null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("k", "partial", "allnull")
      .select(concat(lit("r"), $"k".cast("string")).as("name"),
        $"partial", $"allnull",
        graft.functions.st_set_srid(
          graft.functions.st_point($"k".cast("double"), lit(0.0)),
          lit(4326)).as("geometry"))
    graft.io.GeoIO.writeKml(df, s"$d/t.kml")
    val back = graft.io.GeoIO.readKml(spark, s"$d/t.kml")
    assert(back.columns.toSet ===
      Set("geometry", "name", "description", "partial", "allnull"))
    val rows = back.select($"name", $"partial", $"allnull")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(("r1", "a", null), ("r2", null, null)))
  }
}
