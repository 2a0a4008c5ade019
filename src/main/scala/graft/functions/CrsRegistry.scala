package graft.functions

import graft.functions.EpsgDb._

import scala.collection.mutable.ArrayBuffer

/** User-registrable CRS definitions, closing the long tail beyond the
  * embedded EPSG table: any WKT1 definition (the format published per code
  * on epsg.io / spatialreference.org, and carried by `.prj` files) whose
  * projection method is one of the implemented families becomes a working
  * `st_to_srid` target/source.
  *
  * Cluster semantics: [[register]] affects the CALLING JVM — the driver,
  * and every executor in `local[*]` mode. On a multi-executor cluster,
  * pass definitions at submit time via the Spark conf key
  * `spark.graft.crs.wkt` (entries `code=WKT` joined with `;;`): every
  * executor lazily seeds its registry from that conf on first CRS lookup,
  * so transforms running inside tasks see the same table as the driver.
  * (A driver-side runtime `register` cannot reach remote executors —
  * Spark ships no static state — hence the conf channel.)
  *
  * Supported WKT1 projection methods → [[EpsgDb]] families:
  * Transverse_Mercator, Mercator_1SP/2SP, Lambert_Conformal_Conic_1SP/2SP,
  * Albers_Conic_Equal_Area, Polar_Stereographic,
  * Lambert_Azimuthal_Equal_Area, Oblique_Stereographic, Krovak, plus plain
  * GEOGCS. Datum shift from TOWGS84 (3- or 7-parameter, position vector);
  * non-metre linear units via [[EpsgDb.UnitScaled]].
  */
object CrsRegistry {

  private val custom = new java.util.concurrent.ConcurrentHashMap[Int, (Crs, String)]()
  @volatile private var confLoaded = false

  /** Spark conf key read (lazily, once per JVM) for submit-time
    * registrations: `"27700=PROJCS[...];;31370=PROJCS[...]"`. */
  val ConfKey = "spark.graft.crs.wkt"

  /** Register EPSG `code` from a WKT1 string in this JVM (see the class
    * doc for cluster semantics). Throws IllegalArgumentException when the
    * projection method has no implemented family. */
  def register(code: Int, wkt: String): Unit =
    custom.put(code, (parseWkt(wkt), wkt))

  def registered(code: Int): Option[Crs] = { ensureConf(); Option(custom.get(code)).map(_._1) }

  /** The raw WKT the code was registered with (used by `.prj` writers). */
  def registeredWkt(code: Int): Option[String] = { ensureConf(); Option(custom.get(code)).map(_._2) }

  private def ensureConf(): Unit = if (!confLoaded) synchronized {
    if (!confLoaded) {
      confLoaded = true
      try {
        val env = org.apache.spark.SparkEnv.get
        if (env != null) {
          val blob = env.conf.get(ConfKey, "")
          blob.split(";;").iterator.map(_.trim).filter(_.nonEmpty).foreach { entry =>
            val eq = entry.indexOf('=')
            require(eq > 0, s"$ConfKey entry must be code=WKT: $entry")
            val code = entry.substring(0, eq).trim.toInt
            custom.putIfAbsent(code, (parseWkt(entry.substring(eq + 1)), entry.substring(eq + 1)))
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(s"failed to load $ConfKey: ${e.getMessage}", e)
      }
    }
  }

  // ------------------------------------------------------------ WKT1 parse

  /** One node of a WKT1 tree: KIND[args...] where each arg is a quoted
    * string, a number, or a nested node. */
  private final case class Node(kind: String, args: Seq[Any]) {
    def name: String = args.collectFirst { case s: String => s }.getOrElse("")
    def child(kind: String): Option[Node] = {
      val up = kind.toUpperCase
      args.collectFirst { case n: Node if n.kind == up => n }
    }
    def children(kind: String): Seq[Node] = {
      val up = kind.toUpperCase
      args.collect { case n: Node if n.kind == up => n }
    }
    def numbers: Seq[Double] = args.collect { case d: Double => d }
  }

  private def tokenizeAndParse(s: String): Node = {
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def parseNode(): Node = {
      skipWs()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      val kind = s.substring(start, i).toUpperCase
      skipWs()
      require(i < s.length && (s(i) == '[' || s(i) == '('),
        s"WKT parse: expected [ after $kind at $i")
      i += 1
      val args = ArrayBuffer.empty[Any]
      var done = false
      while (!done) {
        skipWs()
        s(i) match {
          case ']' | ')' => i += 1; done = true
          case ',' => i += 1
          case '"' =>
            i += 1
            val st = i
            while (s(i) != '"') i += 1
            args += s.substring(st, i)
            i += 1
          case c if c.isLetter => args += parseNode()
          case _ =>
            val st = i
            while (i < s.length && "]),".indexOf(s(i)) < 0) i += 1
            args += s.substring(st, i).trim.toDouble
        }
      }
      Node(kind, args.toSeq)
    }
    parseNode()
  }

  /** WKT1 GEOGCS/PROJCS → [[EpsgDb.Crs]]. */
  def parseWkt(wkt: String): Crs = {
    val root = tokenizeAndParse(wkt)
    root.kind match {
      case "GEOGCS" =>
        val (ell, shift) = datumOf(root)
        Crs(Geographic(ell), shift, root.name)
      case "PROJCS" =>
        val geog = root.child("GEOGCS").getOrElse(
          throw new IllegalArgumentException("WKT PROJCS without GEOGCS"))
        val (ell, shift) = datumOf(geog)
        val angularFactor = geog.child("UNIT").flatMap(_.numbers.headOption)
          .getOrElse(math.Pi / 180)
        // WKTs print the degree factor truncated (0.0174532925199433): a
        // near-1 ratio IS degrees — snap it so 90 stays exactly 90 (grads
        // etc. convert for real)
        val toDegRaw = angularFactor / (math.Pi / 180)
        val toDeg = if (math.abs(toDegRaw - 1.0) < 1e-12) 1.0 else toDegRaw
        val linearFactor = root.children("UNIT").lastOption
          .flatMap(_.numbers.headOption).getOrElse(1.0)
        val method = root.child("PROJECTION").map(_.name).getOrElse(
          throw new IllegalArgumentException("WKT PROJCS without PROJECTION"))
        val params: Map[String, Double] = root.children("PARAMETER").map { p =>
          (p.name.toLowerCase.replaceAll("[\\s_-]", ""), p.numbers.headOption.getOrElse(0.0))
        }.toMap
        def angle(names: String*): Double =
          names.flatMap(params.get).headOption.map(_ * toDeg).getOrElse(0.0)
        def len(names: String*): Double = // WKT unit → metres
          names.flatMap(params.get).headOption.map(_ * linearFactor).getOrElse(0.0)
        def num(names: String*): Double = names.flatMap(params.get).headOption.getOrElse(1.0)
        val lat0 = angle("latitudeoforigin", "latitudeofcenter")
        val lon0 = angle("centralmeridian", "longitudeofcenter")
        val lat1 = angle("standardparallel1")
        val lat2 = angle("standardparallel2")
        val k0 = num("scalefactor")
        val fe = len("falseeasting")
        val fn = len("falsenorthing")
        val m = method.toLowerCase.replaceAll("[\\s_-]", "")
        val proj: Projection = m match {
          case "transversemercator" | "gausskruger" =>
            TMerc(ell, lat0, lon0, k0, fe, fn)
          case "mercator1sp" | "mercator" =>
            Mercator1SP(ell, lon0, k0, fe, fn)
          case "mercator2sp" =>
            // k0 at the equator that holds scale true at standard_parallel_1
            val phi1 = math.toRadians(lat1)
            val s = math.sin(phi1)
            val kEq = math.cos(phi1) / math.sqrt(1 - ell.e2 * s * s)
            Mercator1SP(ell, lon0, kEq, fe, fn)
          case "lambertconformalconic1sp" =>
            Lcc1SP(ell, lat0, lon0, k0, fe, fn)
          case "lambertconformalconic2sp" | "lambertconformalconic" =>
            if (params.contains("standardparallel2"))
              Lcc2SP(ell, lat1, lat2, lat0, lon0, fe, fn)
            else Lcc1SP(ell, lat0, lon0, k0, fe, fn)
          case "albersconicequalarea" | "albers" =>
            AlbersConic(ell, lat1, lat2, lat0, lon0, fe, fn)
          case "polarstereographic" =>
            val north = lat0 >= 0
            if (math.abs(math.abs(lat0) - 90) < 1e-9) // variant A: scale at pole
              PolarStereo(ell, north, lon0, Double.NaN, k0, fe, fn)
            else PolarStereo(ell, north, lon0, lat0, Double.NaN, fe, fn)
          case "lambertazimuthalequalarea" =>
            Laea(ell, lat0, lon0, fe, fn)
          case "obliquestereographic" | "doublestereographic" =>
            ObliqueStereo(ell, lat0, lon0, k0, fe, fn)
          case "krovak" =>
            require(fe == 0 && fn == 0,
              "WKT Krovak with false easting/northing is not supported")
            Krovak(ell, lat0, lon0, angle("azimuth"),
              angle("pseudostandardparallel1"), k0)
          case _ => throw new IllegalArgumentException(
            s"WKT projection method not implemented: $method (supported: " +
              "Transverse_Mercator, Mercator_1SP/2SP, Lambert_Conformal_Conic_1SP/2SP, " +
              "Albers_Conic_Equal_Area, Polar_Stereographic, " +
              "Lambert_Azimuthal_Equal_Area, Oblique_Stereographic, Krovak)")
        }
        val scaled =
          if (math.abs(linearFactor - 1.0) < 1e-12) proj
          else UnitScaled(proj, linearFactor)
        Crs(scaled, shift, root.name)
      case other => throw new IllegalArgumentException(
        s"WKT root must be GEOGCS or PROJCS, got $other")
    }
  }

  private def datumOf(geog: Node): (Ellipsoid, Option[Helmert]) = {
    val datum = geog.child("DATUM").getOrElse(
      throw new IllegalArgumentException("WKT GEOGCS without DATUM"))
    val sph = datum.child("SPHEROID").orElse(datum.child("ELLIPSOID")).getOrElse(
      throw new IllegalArgumentException("WKT DATUM without SPHEROID"))
    val ns = sph.numbers
    require(ns.length >= 2, "WKT SPHEROID needs semi-major axis and 1/f")
    // 1/f = 0 encodes a sphere; a huge inverse flattening approximates it
    val ell = Ellipsoid(ns(0), if (ns(1) == 0.0) 1e12 else ns(1))
    val shift = datum.child("TOWGS84").map(_.numbers).collect {
      case s if s.exists(_ != 0.0) =>
        val p = s.padTo(7, 0.0)
        Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6))
    }
    (ell, shift)
  }
}
