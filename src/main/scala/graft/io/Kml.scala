package graft.io

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing}
import scala.collection.mutable

/** Minimal OGC KML 2.2 codec (pure JVM, StAX over the JDK's XML stack) —
  * the Placemark subset an analytics read/write cares about, mirroring
  * what the reference's `read_file`/`write_file` surface via the OGR KML
  * driver (`/root/reference/polars_st/input.py:30-153`):
  *
  *  - geometry: Point / LineString / LinearRing / Polygon (outer + inner
  *    boundaries) / MultiGeometry (recursive; homogeneous children
  *    collapse to the Multi* type, mixed to a GeometryCollection), with
  *    optional per-tuple altitude (Z);
  *  - attributes: `name`, `description`, and `ExtendedData` pairs (both
  *    `Data[@name]/value` and Schema-less `SimpleData[@name]`), all
  *    strings — KML carries no column types without a Schema element;
  *  - CRS is fixed by the spec: EPSG:4326, lon,lat tuple order.
  *
  * Styles, altitude modes, folders/visibility, and shared Schema typing
  * are intentionally ignored on read and never written. External
  * entities and DTDs are disabled on the parser (untrusted files).
  */
private[graft] object Kml {

  final case class Feature(geom: Geometry, name: String, description: String,
      data: mutable.LinkedHashMap[String, String])

  private def factory = graft.serde.EWKB.geometryFactory

  private val GeometryTags =
    Set("Point", "LineString", "LinearRing", "Polygon", "MultiGeometry")

  private def newReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** Skip the rest of the element the reader is currently inside (cursor
    * on its START_ELEMENT); returns with the cursor on its END_ELEMENT. */
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

  /** "lon,lat[,alt]" tuples separated by whitespace (KML §9.17). */
  private[io] def parseCoordinates(text: String): Array[Coordinate] = {
    // some authoring tools put a space after the comma ("10.0, 59.0"),
    // splitting one tuple across whitespace tokens — strip whitespace
    // around commas first, then drop fragments with < 2 components
    // instead of crashing the whole file on them
    val cleaned = text.trim.replaceAll("\\s*,\\s*", ",")
    cleaned.split("\\s+").iterator.filter(_.nonEmpty).map(_.split(","))
      .filter(_.length >= 2).map { p =>
        if (p.length >= 3)
          new Coordinate(p(0).toDouble, p(1).toDouble, p(2).toDouble)
        else new Coordinate(p(0).toDouble, p(1).toDouble)
      }.toArray
  }

  /** First `coordinates` child's tuples; skips siblings (extrude etc.). */
  private def coordinatesOf(r: XMLStreamReader, owner: String): Array[Coordinate] = {
    var coords: Array[Coordinate] = Array.empty
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "coordinates") coords = parseCoordinates(r.getElementText)
          else skip(r)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == owner => done = true
        case _ =>
      }
    }
    coords
  }

  private def closedRing(cs: Array[Coordinate]): LinearRing = {
    if (cs.isEmpty) return factory.createLinearRing(cs)
    val closed =
      if (cs.length >= 3 && cs.head.equals2D(cs.last)) cs
      else cs :+ new Coordinate(cs.head) // KML requires closure; repair
    factory.createLinearRing(closed)
  }

  /** Parse the geometry element named `tag` (cursor on its START). */
  private def parseGeometry(r: XMLStreamReader, tag: String): Geometry = tag match {
    case "Point" =>
      val cs = coordinatesOf(r, "Point")
      if (cs.isEmpty) factory.createPoint() else factory.createPoint(cs(0))
    case "LineString" => factory.createLineString(coordinatesOf(r, "LineString"))
    case "LinearRing" => closedRing(coordinatesOf(r, "LinearRing"))
    case "Polygon" =>
      var outer: LinearRing = null
      val holes = mutable.ArrayBuffer[LinearRing]()
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case b @ ("outerBoundaryIs" | "innerBoundaryIs") =>
              // exactly one LinearRing child per boundary element
              var ring: LinearRing = null
              var bDone = false
              while (!bDone && r.hasNext) {
                r.next() match {
                  case XMLStreamConstants.START_ELEMENT =>
                    if (r.getLocalName == "LinearRing")
                      ring = closedRing(coordinatesOf(r, "LinearRing"))
                    else skip(r)
                  case XMLStreamConstants.END_ELEMENT if r.getLocalName == b =>
                    bDone = true
                  case _ =>
                }
              }
              if (ring != null) {
                if (b == "outerBoundaryIs") outer = ring else holes += ring
              }
            case _ => skip(r)
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "Polygon" =>
            done = true
          case _ =>
        }
      }
      // malformed-but-seen KML: holes without a usable outer ring — JTS
      // rejects (null shell, holes); degrade to an empty polygon
      if (outer == null || outer.isEmpty) factory.createPolygon()
      else factory.createPolygon(outer, holes.toArray)
    case "MultiGeometry" =>
      val parts = mutable.ArrayBuffer[Geometry]()
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val n = r.getLocalName
            if (GeometryTags.contains(n)) parts += parseGeometry(r, n)
            else skip(r)
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "MultiGeometry" =>
            done = true
          case _ =>
        }
      }
      val classes = parts.map(_.getGeometryType).toSet
      classes.toSeq match {
        case Seq("Point") => factory.createMultiPoint(
          parts.map(_.asInstanceOf[org.locationtech.jts.geom.Point]).toArray)
        case Seq("LineString") => factory.createMultiLineString(
          parts.map(_.asInstanceOf[org.locationtech.jts.geom.LineString]).toArray)
        case Seq("Polygon") => factory.createMultiPolygon(
          parts.map(_.asInstanceOf[org.locationtech.jts.geom.Polygon]).toArray)
        case _ => factory.createGeometryCollection(parts.toArray)
      }
  }

  private def parseExtendedData(r: XMLStreamReader,
      into: mutable.LinkedHashMap[String, String]): Unit = {
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "Data" =>
            val key = r.getAttributeValue(null, "name")
            var value: String = null
            var dDone = false
            while (!dDone && r.hasNext) {
              r.next() match {
                case XMLStreamConstants.START_ELEMENT =>
                  if (r.getLocalName == "value") value = r.getElementText
                  else skip(r)
                case XMLStreamConstants.END_ELEMENT if r.getLocalName == "Data" =>
                  dDone = true
                case _ =>
              }
            }
            if (key != null) into(key) = value
          case "SchemaData" => // Schema-typed rows: flatten SimpleData as strings
          case "SimpleData" =>
            val key = r.getAttributeValue(null, "name")
            val value = r.getElementText
            if (key != null) into(key) = value
          case _ => skip(r)
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "ExtendedData" =>
          done = true
        case _ =>
      }
    }
  }

  /** All Placemarks in the document, in document order. Geometry SRID is
    * set to 4326 (fixed by the KML spec). */
  def readFeatures(bytes: Array[Byte]): Seq[Feature] = {
    val r = newReader(bytes)
    val out = mutable.ArrayBuffer[Feature]()
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Placemark") {
          var name: String = null
          var desc: String = null
          val data = mutable.LinkedHashMap[String, String]()
          var geom: Geometry = null
          var done = false
          while (!done && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
                case "name" => name = r.getElementText
                case "description" => desc = r.getElementText
                case "ExtendedData" => parseExtendedData(r, data)
                case g if GeometryTags.contains(g) => geom = parseGeometry(r, g)
                case _ => skip(r)
              }
              case XMLStreamConstants.END_ELEMENT if r.getLocalName == "Placemark" =>
                done = true
              case _ =>
            }
          }
          if (geom != null) geom.setSRID(4326)
          out += Feature(geom, name, desc, data)
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** The ExtendedData keys of the document, in first-seen order — the
    * attribute schema for the DataFrame reader. */
  def dataKeys(bytes: Array[Byte]): Seq[String] = {
    val keys = mutable.LinkedHashSet[String]()
    readFeatures(bytes).foreach(_.data.keysIterator.foreach(keys += _))
    keys.toSeq
  }

  // ------------------------------------------------------------------ write

  private[io] def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case '"' => b.append("&quot;")
        // control chars below 0x20 (except tab/LF/CR) are ILLEGAL in
        // XML 1.0 even escaped — emitting one writes a file no parser
        // (ours included) can read back; coerce to a space
        case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' =>
          b.append(' ')
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** Shortest decimal that round-trips the double (java.lang.Double
    * semantics); integral values drop the trailing ".0" for KML
    * friendliness — they parse back to the same double either way. */
  private def num(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.endsWith(".0")) s.dropRight(2) else s
  }

  private def coordString(cs: Array[Coordinate]): String =
    cs.iterator.map { c =>
      if (java.lang.Double.isNaN(c.getZ)) s"${num(c.x)},${num(c.y)}"
      else s"${num(c.x)},${num(c.y)},${num(c.getZ)}"
    }.mkString(" ")

  private def geometryXml(g: Geometry, b: StringBuilder): Unit = g match {
    case p: org.locationtech.jts.geom.Point =>
      b.append("<Point><coordinates>")
        .append(coordString(p.getCoordinates)).append("</coordinates></Point>")
    case l: org.locationtech.jts.geom.LinearRing =>
      b.append("<LinearRing><coordinates>")
        .append(coordString(l.getCoordinates)).append("</coordinates></LinearRing>")
    case l: org.locationtech.jts.geom.LineString =>
      b.append("<LineString><coordinates>")
        .append(coordString(l.getCoordinates)).append("</coordinates></LineString>")
    case p: org.locationtech.jts.geom.Polygon =>
      b.append("<Polygon><outerBoundaryIs><LinearRing><coordinates>")
        .append(coordString(p.getExteriorRing.getCoordinates))
        .append("</coordinates></LinearRing></outerBoundaryIs>")
      var i = 0
      while (i < p.getNumInteriorRing) {
        b.append("<innerBoundaryIs><LinearRing><coordinates>")
          .append(coordString(p.getInteriorRingN(i).getCoordinates))
          .append("</coordinates></LinearRing></innerBoundaryIs>")
        i += 1
      }
      b.append("</Polygon>")
    case m => // Multi* and GeometryCollection
      b.append("<MultiGeometry>")
      var i = 0
      while (i < m.getNumGeometries) {
        geometryXml(m.getGeometryN(i), b); i += 1
      }
      b.append("</MultiGeometry>")
  }

  /** Serialize one document. `rows`: (geometry, name-or-null, data pairs). */
  def write(rows: Iterator[(Geometry, String, String, Seq[(String, String)])],
      docName: String): Array[Byte] = {
    val b = new StringBuilder
    b.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<kml xmlns=\"http://www.opengis.net/kml/2.2\"><Document><name>")
      .append(esc(docName)).append("</name>\n")
    rows.foreach { case (g, name, desc, data) =>
      b.append("<Placemark>")
      if (name != null) b.append("<name>").append(esc(name)).append("</name>")
      // description is a first-class Placemark element (the reader parses
      // it into the fixed 'description' column): writing it as Data would
      // come back as a DUPLICATE description column
      if (desc != null) b.append("<description>").append(esc(desc)).append("</description>")
      if (data.nonEmpty) {
        b.append("<ExtendedData>")
        data.foreach { case (k, v) =>
          // null values write an EMPTY Data element (no value child): the
          // reader records the key with a null value, so the column stays
          // in the read-back schema even when null in every feature AND
          // null round-trips as null, not empty string
          if (v != null)
            b.append("<Data name=\"").append(esc(k)).append("\"><value>")
              .append(esc(v)).append("</value></Data>")
          else
            b.append("<Data name=\"").append(esc(k)).append("\"/>")
        }
        b.append("</ExtendedData>")
      }
      if (g != null) geometryXml(g, b)
      b.append("</Placemark>\n")
    }
    b.append("</Document></kml>\n")
    b.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
