package graft.io

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing}
import scala.collection.mutable

/** Minimal OGC GML 2/3 codec (pure JVM, StAX) for the feature-collection
  * shape the OGR GML driver exposes to the reference's `read_file`
  * (`/root/reference/polars_st/input.py:30-153`):
  *
  *  - features inside `featureMember` / `featureMembers` / `member`
  *    elements; simple text-only child elements become string columns
  *    (GML is untyped without its XSD — cast downstream);
  *  - geometry: Point / LineString / LinearRing / Polygon /
  *    MultiPoint / MultiLineString / MultiPolygon and the GML3
  *    MultiCurve / MultiSurface containers, in BOTH encodings —
  *    GML2 `coordinates` ("x,y x,y") and GML3 `pos` / `posList`
  *    ("x y x y", `srsDimension` 2 or 3);
  *  - SRID from `srsName`, accepting `EPSG:4326`,
  *    `urn:ogc:def:crs:EPSG::4326`, and OGC-URL forms. Axis order: taken
  *    as written for legacy `EPSG:n` srsNames (lon/lat), SWAPPED to
  *    lon/lat for `urn:`/OGC-URL forms naming a geographic CRS (the GML3
  *    convention stores those lat-first — the known pitfall of consuming
  *    WFS output).
  *
  * Schema elements, xlinks, curves/arcs, and 3D solids are out of scope.
  * External entities and DTDs are disabled on the parser.
  */
private[graft] object Gml {

  final case class Feature(geom: Geometry, srid: Int,
      data: mutable.LinkedHashMap[String, String])

  private def factory = graft.serde.EWKB.geometryFactory

  private val GeometryTags = Set("Point", "LineString", "LinearRing",
    "Polygon", "MultiPoint", "MultiLineString", "MultiPolygon",
    "MultiCurve", "MultiSurface", "MultiGeometry")

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

  /** srsName → (srid, latFirst). Legacy `EPSG:n` keeps written order;
    * urn/OGC-URL forms are lat-first when the code is geographic. */
  private[io] def parseSrsName(srs: String): (Int, Boolean) = {
    if (srs == null || srs.isEmpty) return (0, false)
    val afterColon = srs.substring(srs.lastIndexOf(':') + 1)
    val code = afterColon.substring(afterColon.lastIndexOf('/') + 1)
    val srid = try code.toInt catch { case _: NumberFormatException => 0 }
    val authorityOrder = srs.startsWith("urn:") || srs.startsWith("http://www.opengis.net/def/crs") ||
      srs.startsWith("https://www.opengis.net/def/crs")
    val geographic = srid == 4326 ||
      graft.functions.EpsgDb.table.get(srid).exists(
        _.proj.isInstanceOf[graft.functions.EpsgDb.Geographic])
    (srid, authorityOrder && geographic)
  }

  /** GML2 coordinates: "x,y[,z]" tuples separated by whitespace. */
  private def parseGml2Coordinates(text: String, latFirst: Boolean): Array[Coordinate] =
    Kml.parseCoordinates(text) match {
      case cs if latFirst => cs.map(c =>
        if (java.lang.Double.isNaN(c.getZ)) new Coordinate(c.y, c.x)
        else new Coordinate(c.y, c.x, c.getZ))
      case cs => cs
    }

  /** GML3 posList: flat whitespace-separated doubles. */
  private def parsePosList(text: String, dim: Int, latFirst: Boolean): Array[Coordinate] = {
    val nums = text.trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
    require(dim == 2 || dim == 3, s"gml: srsDimension $dim")
    require(nums.length % dim == 0,
      s"gml: posList length ${nums.length} not a multiple of $dim")
    Array.tabulate(nums.length / dim) { i =>
      val a = nums(i * dim); val b = nums(i * dim + 1)
      val (x, y) = if (latFirst) (b, a) else (a, b)
      if (dim == 3) new Coordinate(x, y, nums(i * dim + 2))
      else new Coordinate(x, y)
    }
  }

  /** Coordinates of the current geometry element from whichever encoding
    * appears (pos / posList / coordinates); cursor on the owner START,
    * returns with cursor on the owner END. Nested rings/members are NOT
    * handled here — only scalar geometry bodies. */
  private def coordsOf(r: XMLStreamReader, owner: String, dim: Int,
      latFirst: Boolean): Array[Coordinate] = {
    val out = mutable.ArrayBuffer[Coordinate]()
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "pos" =>
            // a single position: the dimension IS the token count (an
            // explicit srsDimension is redundant on gml:pos)
            val toks = r.getElementText.trim.split("\\s+").filter(_.nonEmpty)
            out ++= parsePosList(toks.mkString(" "),
              if (toks.length == 3) 3 else dim, latFirst)
          case "posList" | "coordinates" =>
            val tag = r.getLocalName
            val d = Option(r.getAttributeValue(null, "srsDimension"))
              .map(_.toInt).getOrElse(dim)
            val text = r.getElementText
            if (tag == "posList") out ++= parsePosList(text, d, latFirst)
            else out ++= parseGml2Coordinates(text, latFirst)
          case _ => skip(r)
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == owner => done = true
        case _ =>
      }
    }
    out.toArray
  }

  private def ringOf(cs: Array[Coordinate]): LinearRing =
    if (cs.isEmpty) factory.createLinearRing(cs)
    else if (cs.length >= 4 && cs.head.equals2D(cs.last)) factory.createLinearRing(cs)
    else factory.createLinearRing(cs :+ new Coordinate(cs.head))

  /** Parse the geometry element `tag` (cursor on its START). `srsDim` and
    * `latFirst` inherit from the outermost geometry element. */
  private def parseGeometry(r: XMLStreamReader, tag: String, srsDim: Int,
      latFirst: Boolean): Geometry = tag match {
    case "Point" =>
      val cs = coordsOf(r, "Point", srsDim, latFirst)
      if (cs.isEmpty) factory.createPoint() else factory.createPoint(cs(0))
    case "LineString" =>
      factory.createLineString(coordsOf(r, "LineString", srsDim, latFirst))
    case "LinearRing" =>
      ringOf(coordsOf(r, "LinearRing", srsDim, latFirst))
    case "Polygon" =>
      var outer: LinearRing = null
      val holes = mutable.ArrayBuffer[LinearRing]()
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            // GML3 exterior/interior; GML2 outerBoundaryIs/innerBoundaryIs
            case b @ ("exterior" | "outerBoundaryIs" | "interior" | "innerBoundaryIs") =>
              var ring: LinearRing = null
              var bDone = false
              while (!bDone && r.hasNext) {
                r.next() match {
                  case XMLStreamConstants.START_ELEMENT =>
                    if (r.getLocalName == "LinearRing")
                      ring = ringOf(coordsOf(r, "LinearRing", srsDim, latFirst))
                    else skip(r)
                  case XMLStreamConstants.END_ELEMENT if r.getLocalName == b =>
                    bDone = true
                  case _ =>
                }
              }
              if (ring != null) {
                if (b == "exterior" || b == "outerBoundaryIs") outer = ring
                else holes += ring
              }
            case _ => skip(r)
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "Polygon" =>
            done = true
          case _ =>
        }
      }
      factory.createPolygon(outer, holes.toArray)
    case m @ ("MultiPoint" | "MultiLineString" | "MultiPolygon" |
        "MultiCurve" | "MultiSurface" | "MultiGeometry") =>
      val parts = mutable.ArrayBuffer[Geometry]()
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val n = r.getLocalName
            // member wrappers (pointMember, curveMember, surfaceMembers,
            // geometryMember, ...) just descend; geometry tags parse —
            // including nested Multi* (a MultiPolygon inside MultiGeometry
            // is valid GML and must not be silently skipped)
            if (GeometryTags.contains(n))
              parts += parseGeometry(r, n, srsDim, latFirst)
            else if (!n.endsWith("Member") && !n.endsWith("Members")) skip(r)
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == m => done = true
          case _ =>
        }
      }
      // A nested multi inside a *typed* container (nonstandard but seen in
      // the wild) contributes its components rather than failing the cast.
      val flat = parts.flatMap {
        case gc: org.locationtech.jts.geom.GeometryCollection
            if m != "MultiGeometry" =>
          (0 until gc.getNumGeometries).map(gc.getGeometryN)
        case g => Seq(g)
      }
      m match {
        case "MultiPoint" => factory.createMultiPoint(
          flat.map(_.asInstanceOf[org.locationtech.jts.geom.Point]).toArray)
        case "MultiLineString" | "MultiCurve" => factory.createMultiLineString(
          flat.map(_.asInstanceOf[org.locationtech.jts.geom.LineString]).toArray)
        case "MultiPolygon" | "MultiSurface" => factory.createMultiPolygon(
          flat.map(_.asInstanceOf[org.locationtech.jts.geom.Polygon]).toArray)
        case _ => factory.createGeometryCollection(parts.toArray)
      }
  }

  /** All features in the document. A feature is the single child element
    * of each `featureMember` (or each child of `featureMembers`, or a
    * WFS2 `member`); inside it, the first geometry-bearing descendant is
    * the geometry and text-only children become attributes. */
  def readFeatures(bytes: Array[Byte]): Seq[Feature] = {
    val r = newReader(bytes)
    val out = mutable.ArrayBuffer[Feature]()
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            (r.getLocalName == "featureMember" || r.getLocalName == "featureMembers" ||
              r.getLocalName == "member")) {
          val wrapper = r.getLocalName
          var done = false
          while (!done && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                out += parseFeature(r, r.getLocalName)
              case XMLStreamConstants.END_ELEMENT if r.getLocalName == wrapper =>
                done = true
              case _ =>
            }
          }
        }
      }
    } finally r.close()
    out.toSeq
  }

  private def parseFeature(r: XMLStreamReader, featureTag: String): Feature = {
    val data = mutable.LinkedHashMap[String, String]()
    var geom: Geometry = null
    var srid = 0
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val n = r.getLocalName
          if (GeometryTags.contains(n)) {
            val srs = r.getAttributeValue(null, "srsName")
            val dimAttr = Option(r.getAttributeValue(null, "srsDimension"))
              .map(_.toInt).getOrElse(2)
            val (sr, latFirst) = parseSrsName(srs)
            srid = sr
            geom = parseGeometry(r, n, dimAttr, latFirst)
          } else {
            // property element: text-only child → attribute; if it wraps a
            // geometry (geometryProperty pattern), recurse one level
            val key = n
            val sb = new StringBuilder
            var isText = true
            var pDone = false
            while (!pDone && r.hasNext) {
              r.next() match {
                case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
                  sb.append(r.getText)
                case XMLStreamConstants.START_ELEMENT =>
                  val inner = r.getLocalName
                  isText = false
                  if (GeometryTags.contains(inner)) {
                    val srs = r.getAttributeValue(null, "srsName")
                    val dimAttr = Option(r.getAttributeValue(null, "srsDimension"))
                      .map(_.toInt).getOrElse(2)
                    val (sr, latFirst) = parseSrsName(srs)
                    srid = sr
                    geom = parseGeometry(r, inner, dimAttr, latFirst)
                  } else skip(r)
                case XMLStreamConstants.END_ELEMENT if r.getLocalName == key =>
                  pDone = true
                case _ =>
              }
            }
            if (isText) data(key) = sb.toString.trim
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == featureTag =>
          done = true
        case _ =>
      }
    }
    if (geom != null && srid != 0) geom.setSRID(srid)
    Feature(geom, srid, data)
  }

  /** The attribute keys of the document, in first-seen order. */
  def dataKeys(bytes: Array[Byte]): Seq[String] = {
    val keys = mutable.LinkedHashSet[String]()
    readFeatures(bytes).foreach(_.data.keysIterator.foreach(keys += _))
    keys.toSeq
  }

  // ------------------------------------------------------------------ write

  private def num(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.endsWith(".0")) s.dropRight(2) else s
  }

  private def posList(cs: Array[Coordinate]): String =
    cs.iterator.map { c =>
      if (java.lang.Double.isNaN(c.getZ)) s"${num(c.x)} ${num(c.y)}"
      else s"${num(c.x)} ${num(c.y)} ${num(c.getZ)}"
    }.mkString(" ")

  private def dimOf(cs: Array[Coordinate]): Int =
    if (cs.exists(c => !java.lang.Double.isNaN(c.getZ))) 3 else 2

  private def geometryXml(g: Geometry, srs: String, b: StringBuilder): Unit = {
    val srsAttr = if (srs == null) "" else s""" srsName="$srs""""
    g match {
      case p: org.locationtech.jts.geom.Point =>
        b.append(s"<gml:Point$srsAttr><gml:pos>")
          .append(posList(p.getCoordinates)).append("</gml:pos></gml:Point>")
      case l: org.locationtech.jts.geom.LinearRing =>
        b.append(s"<gml:LinearRing$srsAttr><gml:posList srsDimension=\"")
          .append(dimOf(l.getCoordinates)).append("\">")
          .append(posList(l.getCoordinates))
          .append("</gml:posList></gml:LinearRing>")
      case l: org.locationtech.jts.geom.LineString =>
        b.append(s"<gml:LineString$srsAttr><gml:posList srsDimension=\"")
          .append(dimOf(l.getCoordinates)).append("\">")
          .append(posList(l.getCoordinates))
          .append("</gml:posList></gml:LineString>")
      case p: org.locationtech.jts.geom.Polygon =>
        b.append(s"<gml:Polygon$srsAttr><gml:exterior>")
        geometryXml(p.getExteriorRing, null, b)
        b.append("</gml:exterior>")
        var i = 0
        while (i < p.getNumInteriorRing) {
          b.append("<gml:interior>")
          geometryXml(p.getInteriorRingN(i), null, b)
          b.append("</gml:interior>")
          i += 1
        }
        b.append("</gml:Polygon>")
      case m: org.locationtech.jts.geom.MultiPoint =>
        b.append(s"<gml:MultiPoint$srsAttr>")
        (0 until m.getNumGeometries).foreach { i =>
          b.append("<gml:pointMember>")
          geometryXml(m.getGeometryN(i), null, b)
          b.append("</gml:pointMember>")
        }
        b.append("</gml:MultiPoint>")
      case m: org.locationtech.jts.geom.MultiLineString =>
        b.append(s"<gml:MultiCurve$srsAttr>")
        (0 until m.getNumGeometries).foreach { i =>
          b.append("<gml:curveMember>")
          geometryXml(m.getGeometryN(i), null, b)
          b.append("</gml:curveMember>")
        }
        b.append("</gml:MultiCurve>")
      case m: org.locationtech.jts.geom.MultiPolygon =>
        b.append(s"<gml:MultiSurface$srsAttr>")
        (0 until m.getNumGeometries).foreach { i =>
          b.append("<gml:surfaceMember>")
          geometryXml(m.getGeometryN(i), null, b)
          b.append("</gml:surfaceMember>")
        }
        b.append("</gml:MultiSurface>")
      case gc =>
        b.append(s"<gml:MultiGeometry$srsAttr>")
        (0 until gc.getNumGeometries).foreach { i =>
          b.append("<gml:geometryMember>")
          geometryXml(gc.getGeometryN(i), null, b)
          b.append("</gml:geometryMember>")
        }
        b.append("</gml:MultiGeometry>")
    }
  }

  /** Serialize one GML 3.2 feature collection. `rows`: (geometry, data
    * pairs); the legacy `EPSG:n` srsName form is written (axis order as
    * stored, lon/lat) so a round trip through [[readFeatures]] is
    * order-preserving. */
  /** XML element names must be NCNames; Spark column names may hold
    * spaces, '&', '<' or lead with a digit — sanitize (invalid chars →
    * '_', leading non-letter prefixed) or the output is not well-formed
    * XML and no reader, ours included, can parse it back. Reads return
    * the sanitized name. */
  private def ncName(s: String): String = {
    val cleaned = s.map(c =>
      if (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') c else '_')
    if (cleaned.isEmpty || !(cleaned(0).isLetter || cleaned(0) == '_')) "_" + cleaned
    else cleaned
  }

  /** Per-write collision-free sanitizer: distinct input names that
    * sanitize to the same NCName (e.g. "a b" and "a&b" → "a_b") get
    * numeric suffixes, so their values cannot silently merge on round
    * trip. Stable across rows within one write. */
  private final class NcNames {
    private val assigned = scala.collection.mutable.Map.empty[String, String]
    private val taken = scala.collection.mutable.Set.empty[String]
    def apply(raw: String): String = assigned.getOrElseUpdate(raw, {
      val base = ncName(raw)
      val unique =
        if (!taken(base)) base
        else Iterator.from(2).map(i => s"${base}_$i").find(!taken(_)).get
      taken += unique
      unique
    })
  }

  def write(rows: Iterator[(Geometry, Seq[(String, String)])],
      featureName: String): Array[Byte] = {
    val b = new StringBuilder
    b.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<gml:FeatureCollection xmlns:gml=\"http://www.opengis.net/gml/3.2\" ")
      .append("xmlns:graft=\"urn:graft\">\n")
    val fn = ncName(featureName)
    val names = new NcNames
    rows.foreach { case (g, data) =>
      b.append("<gml:featureMember><graft:").append(fn).append('>')
      data.foreach { case (k0, v) =>
        val k = names(k0)
        b.append("<graft:").append(k).append('>')
          .append(if (v == null) "" else Kml.esc(v))
          .append("</graft:").append(k).append('>')
      }
      if (g != null) {
        b.append("<graft:geometry>")
        geometryXml(g, if (g.getSRID == 0) null else s"EPSG:${g.getSRID}", b)
        b.append("</graft:geometry>")
      }
      b.append("</graft:").append(fn).append("></gml:featureMember>\n")
    }
    b.append("</gml:FeatureCollection>\n")
    b.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
