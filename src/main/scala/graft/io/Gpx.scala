package graft.io

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import org.locationtech.jts.geom.{Coordinate, Geometry}
import scala.collection.mutable

/** Minimal Topografix GPX 1.0/1.1 codec (pure JVM, StAX) exposing the
  * same five layers the OGR GPX driver gives the reference's `read_file`
  * (`/root/reference/polars_st/input.py:30-153`):
  *
  *  - `waypoints`:    one point per `wpt` (ele → Z and an `ele` column);
  *  - `routes`:       one LineString per `rte`;
  *  - `tracks`:       one MultiLineString per `trk` (a segment per
  *                    `trkseg`);
  *  - `route_points`: one point per `rtept` with (route_fid,
  *                    route_point_id) lineage;
  *  - `track_points`: one point per `trkpt` with (track_fid,
  *                    track_seg_id, track_seg_point_id) lineage.
  *
  * GPX fixes the CRS to WGS84 (EPSG:4326); `lat`/`lon` are attributes,
  * everything else child elements. Extensions are skipped. External
  * entities and DTDs are disabled on the parser (untrusted files).
  */
private[graft] object Gpx {

  /** One parsed point-bearing element (wpt / rtept / trkpt). */
  final case class Pt(lon: Double, lat: Double, ele: Option[Double],
      time: String, name: String, desc: String, sym: String, typ: String)

  final case class Route(name: String, desc: String, points: Seq[Pt])
  final case class Track(name: String, desc: String, segments: Seq[Seq[Pt]])

  final case class Doc(waypoints: Seq[Pt], routes: Seq[Route], tracks: Seq[Track])

  private def factory = graft.serde.EWKB.geometryFactory

  private def newReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  private def skip(r: XMLStreamReader): Unit = {
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
  }

  /** Parse a wpt/rtept/trkpt element (cursor on its START, tag = name). */
  private def parsePt(r: XMLStreamReader, tag: String): Pt = {
    val latS = r.getAttributeValue(null, "lat")
    val lonS = r.getAttributeValue(null, "lon")
    require(latS != null && lonS != null,
      s"gpx: <$tag> element missing its lat/lon attribute")
    val lat = latS.toDouble
    val lon = lonS.toDouble
    var ele: Option[Double] = None
    var time: String = null; var name: String = null
    var desc: String = null; var sym: String = null; var typ: String = null
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "ele" => ele = Some(r.getElementText.trim.toDouble)
          case "time" => time = r.getElementText.trim
          case "name" => name = r.getElementText
          case "desc" => desc = r.getElementText
          case "sym" => sym = r.getElementText
          case "type" => typ = r.getElementText
          case _ => skip(r)
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == tag => done = true
        case _ =>
      }
    }
    Pt(lon, lat, ele, time, name, desc, sym, typ)
  }

  def read(bytes: Array[Byte]): Doc = {
    val r = newReader(bytes)
    val wpts = mutable.ArrayBuffer[Pt]()
    val rtes = mutable.ArrayBuffer[Route]()
    val trks = mutable.ArrayBuffer[Track]()
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) r.getLocalName match {
          case "wpt" => wpts += parsePt(r, "wpt")
          case "rte" =>
            var name: String = null; var desc: String = null
            val pts = mutable.ArrayBuffer[Pt]()
            var done = false
            while (!done && r.hasNext) {
              r.next() match {
                case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
                  case "rtept" => pts += parsePt(r, "rtept")
                  case "name" => name = r.getElementText
                  case "desc" => desc = r.getElementText
                  case _ => skip(r)
                }
                case XMLStreamConstants.END_ELEMENT if r.getLocalName == "rte" =>
                  done = true
                case _ =>
              }
            }
            rtes += Route(name, desc, pts.toSeq)
          case "trk" =>
            var name: String = null; var desc: String = null
            val segs = mutable.ArrayBuffer[Seq[Pt]]()
            var done = false
            while (!done && r.hasNext) {
              r.next() match {
                case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
                  case "trkseg" =>
                    val pts = mutable.ArrayBuffer[Pt]()
                    var sDone = false
                    while (!sDone && r.hasNext) {
                      r.next() match {
                        case XMLStreamConstants.START_ELEMENT =>
                          if (r.getLocalName == "trkpt") pts += parsePt(r, "trkpt")
                          else skip(r)
                        case XMLStreamConstants.END_ELEMENT
                            if r.getLocalName == "trkseg" => sDone = true
                        case _ =>
                      }
                    }
                    segs += pts.toSeq
                  case "name" => name = r.getElementText
                  case "desc" => desc = r.getElementText
                  case _ => skip(r)
                }
                case XMLStreamConstants.END_ELEMENT if r.getLocalName == "trk" =>
                  done = true
                case _ =>
              }
            }
            trks += Track(name, desc, segs.toSeq)
          case "gpx" | "metadata" => // descend into gpx; skip metadata inline
            if (r.getLocalName == "metadata") skip(r)
          case _ =>
        }
      }
    } finally r.close()
    Doc(wpts.toSeq, rtes.toSeq, trks.toSeq)
  }

  // ------------------------------------------------------- geometry builders

  private def coordOf(p: Pt): Coordinate = p.ele match {
    case Some(z) => new Coordinate(p.lon, p.lat, z)
    case None => new Coordinate(p.lon, p.lat)
  }

  def pointGeom(p: Pt): Geometry = {
    val g = factory.createPoint(coordOf(p)); g.setSRID(4326); g
  }

  /** A line is 3D only when EVERY point carries `ele` — a mixed sequence
    * would otherwise interleave NaN Z values into a nominally-3D line. */
  private def lineCoords(pts: Seq[Pt]): Array[Coordinate] = {
    val cs =
      if (pts.nonEmpty && pts.forall(_.ele.isDefined)) pts.map(coordOf).toArray
      else pts.map(p => new Coordinate(p.lon, p.lat)).toArray
    // the GPX 1.1 schema allows a route/segment with a SINGLE point; JTS
    // rejects 1-coordinate lines, so degrade to a zero-length line
    if (cs.length == 1) Array(cs(0), cs(0).copy()) else cs
  }

  def routeGeom(rt: Route): Geometry = {
    val g = factory.createLineString(lineCoords(rt.points))
    g.setSRID(4326); g
  }

  def trackGeom(t: Track): Geometry = {
    val g = factory.createMultiLineString(
      t.segments.map(s => factory.createLineString(lineCoords(s))).toArray)
    g.setSRID(4326); g
  }

  // ------------------------------------------------------------------ write

  private def num(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.endsWith(".0")) s.dropRight(2) else s
  }

  private def ptXml(tag: String, c: Coordinate, name: String,
      b: StringBuilder): Unit = {
    b.append('<').append(tag).append(" lat=\"").append(num(c.y))
      .append("\" lon=\"").append(num(c.x)).append('"')
    val hasZ = !java.lang.Double.isNaN(c.getZ)
    if (!hasZ && name == null) { b.append("/>"); return }
    b.append('>')
    if (hasZ) b.append("<ele>").append(num(c.getZ)).append("</ele>")
    if (name != null) b.append("<name>").append(Kml.esc(name)).append("</name>")
    b.append("</").append(tag).append('>')
  }

  /** Serialize one GPX 1.1 document. Point rows become `wpt`, LineString
    * rows `trk` with one `trkseg`, MultiLineString rows `trk` with a
    * `trkseg` per part (the OGR writer's mapping). Z → `ele`. */
  def write(rows: Iterator[(Geometry, String)], creator: String): Array[Byte] = {
    val b = new StringBuilder
    b.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<gpx version=\"1.1\" creator=\"").append(Kml.esc(creator))
      .append("\" xmlns=\"http://www.topografix.com/GPX/1/1\">\n")
    val trkRows = mutable.ArrayBuffer[(Geometry, String)]()
    rows.foreach { case (g, name) =>
      g match {
        case p: org.locationtech.jts.geom.Point if p.isEmpty =>
          () // POINT EMPTY has no coordinate to serialize — skip the row
        case p: org.locationtech.jts.geom.Point =>
          ptXml("wpt", p.getCoordinate, name, b); b.append('\n')
        case _: org.locationtech.jts.geom.LineString |
             _: org.locationtech.jts.geom.MultiLineString =>
          trkRows += ((g, name)) // GPX schema orders wpt* before trk*
        case other => throw new IllegalArgumentException(
          s"gpx: unsupported geometry type ${other.getGeometryType} " +
            "(points become wpt, (Multi)LineString become trk)")
      }
    }
    trkRows.foreach { case (g, name) =>
      b.append("<trk>")
      if (name != null) b.append("<name>").append(Kml.esc(name)).append("</name>")
      val parts: Seq[org.locationtech.jts.geom.LineString] = g match {
        case l: org.locationtech.jts.geom.LineString => Seq(l)
        case m: org.locationtech.jts.geom.MultiLineString =>
          (0 until m.getNumGeometries)
            .map(m.getGeometryN(_).asInstanceOf[org.locationtech.jts.geom.LineString])
      }
      parts.foreach { seg =>
        b.append("<trkseg>")
        seg.getCoordinates.foreach(c => ptXml("trkpt", c, null, b))
        b.append("</trkseg>")
      }
      b.append("</trk>\n")
    }
    b.append("</gpx>\n")
    b.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
