package graft.functions

import graft.functions.EpsgDb._

import scala.collection.mutable.ArrayBuffer

/** User-registrable CRS definitions, closing the long tail beyond the
  * embedded EPSG table: any WKT definition — OGC WKT1, the ESRI WKT1
  * dialect that ArcGIS writes into `.prj` files (no TOWGS84, no AUTHORITY,
  * `D_`-prefixed datum names), or WKT2 (ISO 19162 `PROJCRS`/`GEOGCRS`,
  * incl. `BOUNDCRS` datum-shift wrappers) — or any PROJ.4 string
  * (`+proj=... +ellps=... +towgs84=...`, see [[parseProj4]]) whose
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
  * Supported projection methods → [[EpsgDb]] families (WKT1, ESRI and
  * WKT2/EPSG spellings all accepted): Transverse_Mercator/Gauss_Kruger,
  * Mercator (1SP/2SP/variant A/B/Auxiliary_Sphere/web mercator),
  * Lambert_Conformal_Conic (1SP/2SP), Albers, Polar_Stereographic
  * (variant A/B, ESRI North/South_Pole), plain Stereographic (polar →
  * variant A, non-polar → the classic single oblique/equatorial form,
  * Snyder §21), Lambert_Azimuthal_Equal_Area,
  * Oblique/Double_Stereographic, Krovak, Hotine_Oblique_Mercator
  * (variant A/B and the ESRI Azimuth_Center spelling — azimuth 90 with
  * rectified angle 90 dispatches to the Swiss somerc family), Polyconic,
  * Cylindrical_Equal_Area, Equirectangular/Equidistant_Cylindrical,
  * New_Zealand_Map_Grid, plus plain geographic CRSs.
  * Datum shift from TOWGS84 / BOUNDCRS when present; otherwise recovered
  * from the datum NAME via [[EpsgDb.datumShiftByName]] (how the reference
  * resolves ESRI `.prj` files through GDAL, `utils/srid.py:10-23`).
  * Non-metre linear units via [[EpsgDb.UnitScaled]].
  */
object CrsRegistry {

  private val custom = new java.util.concurrent.ConcurrentHashMap[Int, (Crs, String)]()
  @volatile private var confLoaded = false

  /** Spark conf key read (lazily, once per JVM) for submit-time
    * registrations: `"27700=PROJCS[...];;31370=PROJCS[...]"`. */
  val ConfKey = "spark.graft.crs.wkt"

  /** Register EPSG `code` from a CRS definition string — WKT (WKT1, ESRI
    * WKT1 or WKT2) or a PROJ.4 string (`+proj=... +ellps=... +towgs84=...`,
    * the grammar users paste from epsg.io / spatialreference.org) — in
    * this JVM (see the class doc for cluster semantics). Throws
    * IllegalArgumentException when the projection method has no
    * implemented family. */
  def register(code: Int, definition: String): Unit =
    custom.put(code, (parseDef(definition), definition))

  /** Dialect test shared by every front door (register, the conf key,
    * sridForWkt): a definition starting with `+` (or a bare `proj=`) is
    * PROJ.4; anything else parses as WKT. */
  def isProj4(s: String): Boolean = {
    val t = s.trim
    t.startsWith("+") || t.startsWith("proj=")
  }

  /** Dialect dispatch onto [[parseProj4]] / [[parseWkt]]. */
  def parseDef(s: String): Crs =
    if (isProj4(s)) parseProj4(s.trim) else parseWkt(s.trim)

  /** Remove a JVM-local registration made with [[register]]. A code that
    * also arrives via [[ConfKey]] is re-registered here immediately from
    * the conf (conf entries otherwise load only once per JVM, so a lazy
    * "next lookup restores it" contract would be false — the entry would
    * stay gone). */
  def unregister(code: Int): Unit = {
    custom.remove(code)
    val env = org.apache.spark.SparkEnv.get
    if (env != null) {
      env.conf.get(ConfKey, "").split(";;").iterator.map(_.trim)
        .filter(_.nonEmpty)
        .find { entry => // same entry grammar as ensureConf
          val eq = entry.indexOf('=')
          eq > 0 && scala.util.Try(entry.substring(0, eq).trim.toInt)
            .toOption.contains(code)
        }
        .foreach { entry =>
          val defn = entry.substring(entry.indexOf('=') + 1)
          custom.putIfAbsent(code, (parseDef(defn), defn))
        }
    }
  }

  def registered(code: Int): Option[Crs] = { ensureConf(); Option(custom.get(code)).map(_._1) }

  // ------------------------------------------------------ grid shifts seam

  private val gridShifts =
    new java.util.concurrent.ConcurrentHashMap[EpsgDb.Helmert, NTv2.GridFile]()
  @volatile private var gridConfLoaded = false

  /** Spark conf key for CLUSTER-wide grid registrations —
    * `"NAD27=/mnt/grids/ntv2_0.gsb;;DHDN=hdfs:///grids/BETA2007.gsb"`.
    * Loaded lazily ONCE PER JVM (driver and every executor alike, the
    * same mechanism [[ConfKey]] uses for WKT), so the datum-hop UDFs see
    * the grids on executors without any startup hook; paths resolve
    * through the Hadoop filesystem of the running job. */
  val GridConfKey = "spark.graft.crs.gridshift"

  private def ensureGridConf(): Unit = if (!gridConfLoaded) synchronized {
    // flag flips only AFTER a successful load: concurrent callers block
    // on the monitor until the grids are in (a lock-free early flag let
    // them silently transform grid-less during the load window), and a
    // transient FS failure is retried by the next caller instead of
    // poisoning the JVM into permanent Helmert-only mode
    if (!gridConfLoaded) {
      try {
        val env = org.apache.spark.SparkEnv.get
        if (env != null) {
          // classpath core-site/hdfs-site PLUS the job's spark.hadoop.*
          // overrides (object-store credentials etc.; SparkHadoopUtil is
          // private[spark], so copy the keys directly). Loop-invariant —
          // built once, not per entry.
          lazy val hconf = {
            val c = new org.apache.hadoop.conf.Configuration()
            env.conf.getAll.foreach { case (k, v) =>
              if (k.startsWith("spark.hadoop."))
                c.set(k.stripPrefix("spark.hadoop."), v)
            }
            c
          }
          val blob = env.conf.get(GridConfKey, "")
          blob.split(";;").iterator.map(_.trim).filter(_.nonEmpty).foreach { entry =>
            val eq = entry.indexOf('=')
            require(eq > 0, s"$GridConfKey entry must be datum=/path/to.gsb: $entry")
            val datum = entry.substring(0, eq).trim
            val path = new org.apache.hadoop.fs.Path(entry.substring(eq + 1).trim)
            val fs = path.getFileSystem(hconf)
            val bytes = graft.io.GeoIO.readWholeGuarded(fs, path)
            // if-absent: an explicit driver-side registerGridShift wins
            // over the conf, matching ensureConf's WKT semantics
            val key = EpsgDb.datumShiftByName.get(norm(stripDatumPrefix(datum)))
              .flatten.getOrElse(throw new IllegalArgumentException(
                s"$GridConfKey: unknown or WGS84-coincident datum '$datum'"))
            gridShifts.putIfAbsent(key, NTv2.read(bytes))
          }
        }
        gridConfLoaded = true
      } catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"failed to load $GridConfKey: ${e.getMessage}", e)
      }
    }
  }

  /** Register an NTv2 grid-shift file for a datum: every `st_to_srid`
    * datum hop on that datum then prefers the grid (source datum →
    * WGS84-class target, bilinear, sub-meter where the grid is sub-meter)
    * over the datum's single-Helmert fallback wherever the grid covers;
    * outside coverage the Helmert still applies. The datum is named as in
    * WKT (e.g. "NAD27", "DHDN", "North_American_Datum_1927") — the same
    * lookup `.prj` parsing uses. No grids ship with the library (they are
    * distributed under their agencies' own terms); this is the seam for
    * users who have them.
    *
    * Direct calls are JVM-local, like [[register]] — right for driver-side
    * work and tests. For a CLUSTER, set [[GridConfKey]]
    * (`spark.graft.crs.gridshift = "NAD27=/mnt/grids/ntv2_0.gsb"`) at
    * submit time instead: every executor lazily loads the grid from the
    * shared filesystem on first datum hop, the same per-JVM mechanism WKT
    * registrations use. */
  def registerGridShift(datumName: String, gsb: Array[Byte]): Unit = {
    val key = norm(stripDatumPrefix(datumName))
    val shift = EpsgDb.datumShiftByName.get(key).flatten.getOrElse(
      throw new IllegalArgumentException(
        s"registerGridShift: unknown or WGS84-coincident datum '$datumName' " +
          "(a coincident datum has nothing to shift)"))
    gridShifts.put(shift, NTv2.read(gsb))
  }

  private def stripDatumPrefix(s: String): String =
    if (s.startsWith("D_")) s.substring(2) else s

  /** The grid registered for a datum's Helmert, if any. */
  private[functions] def gridShiftFor(h: EpsgDb.Helmert): Option[NTv2.GridFile] = {
    ensureGridConf()
    Option(gridShifts.get(h))
  }

  /** Test/ops hook: drop a registration. */
  def unregisterGridShift(datumName: String): Unit =
    EpsgDb.datumShiftByName.get(norm(stripDatumPrefix(datumName))).flatten
      .foreach(gridShifts.remove(_))

  /** Test hook: force the next [[gridShiftFor]] to re-read [[GridConfKey]]. */
  private[graft] def reloadGridConfForTest(): Unit = synchronized {
    gridConfLoaded = false
  }

  /** The raw WKT the code was registered with (used by `.prj` writers). */
  def registeredWkt(code: Int): Option[String] = { ensureConf(); Option(custom.get(code)).map(_._2) }

  private def ensureConf(): Unit = if (!confLoaded) synchronized {
    // flag flips only AFTER a successful load (same discipline as
    // ensureGridConf): an early flag would make one malformed entry
    // silently drop ALL conf registrations for every later caller in
    // the JVM — subsequent lookups fail with 'unknown SRID' instead of
    // surfacing the conf error
    if (!confLoaded) {
      try {
        val env = org.apache.spark.SparkEnv.get
        if (env != null) {
          val blob = env.conf.get(ConfKey, "")
          blob.split(";;").iterator.map(_.trim).filter(_.nonEmpty).foreach { entry =>
            val eq = entry.indexOf('=')
            require(eq > 0, s"$ConfKey entry must be code=WKT: $entry")
            val code = entry.substring(0, eq).trim.toInt
            custom.putIfAbsent(code, (parseDef(entry.substring(eq + 1)), entry.substring(eq + 1)))
          }
        }
        confLoaded = true
      } catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(s"failed to load $ConfKey: ${e.getMessage}", e)
      }
    }
  }

  // ------------------------------------------------------------- WKT parse

  /** One node of a WKT tree: KIND[args...] where each arg is a quoted
    * string, a number, a bare keyword (WKT2 axis directions etc.), or a
    * nested node. */
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
    def childNodes: Seq[Node] = args.collect { case n: Node => n }
    def numbers: Seq[Double] = args.collect { case d: Double => d }
  }

  private def tokenizeAndParse(s: String): Node = {
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def parseNode(): Node = {
      skipWs()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      val kind = s.substring(start, i).toUpperCase(java.util.Locale.ROOT)
      skipWs()
      require(i < s.length && (s(i) == '[' || s(i) == '('),
        s"WKT parse: expected [ after $kind at $i")
      i += 1
      val args = ArrayBuffer.empty[Any]
      var done = false
      while (!done) {
        skipWs()
        require(i < s.length, s"WKT parse: unterminated $kind (unexpected end of input)")
        s(i) match {
          case ']' | ')' => i += 1; done = true
          case ',' => i += 1
          case '"' =>
            i += 1
            val st = i
            while (i < s.length && s(i) != '"') i += 1
            require(i < s.length, "WKT parse: unterminated quoted string")
            args += s.substring(st, i)
            i += 1
          case c if c.isLetter =>
            // lookahead: identifier followed by [ is a nested node, a bare
            // identifier (WKT2 `north`, `east`, `Cartesian`...) is a token
            val st = i
            var j = i
            while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
            var k = j
            while (k < s.length && s(k).isWhitespace) k += 1
            if (k < s.length && (s(k) == '[' || s(k) == '(')) args += parseNode()
            else { args += s.substring(st, j); i = j }
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

  /** Lowercase, alphanumeric-only key: makes `Central_Meridian`,
    * `central meridian` and `Longitude of natural origin`-style spellings
    * comparable across the WKT1 / ESRI / WKT2 dialects. */
  private def norm(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]", "")

  private val DegFactor = math.Pi / 180

  /** WKTs print the degree factor truncated (0.0174532925199433): a near-1
    * ratio IS degrees — snap it so 90 stays exactly 90 (grads etc. convert
    * for real). */
  private def snapToDeg(angularFactor: Double): Double = {
    val toDegRaw = angularFactor / DegFactor
    if (math.abs(toDegRaw - 1.0) < 1e-12) 1.0 else toDegRaw
  }

  /** WKT1/ESRI GEOGCS/PROJCS or WKT2 GEOGCRS/PROJCRS/BOUNDCRS →
    * [[EpsgDb.Crs]]. */
  def parseWkt(wkt: String): Crs = parseTree(tokenizeAndParse(wkt))

  /** Geographic projection honoring the node's angular UNIT and PRIMEM:
    * grads-and-Paris definitions (ESRI GCS_NTF_Paris) must not be read
    * as degrees-Greenwich. WKT1 PRIMEM longitudes are in DEGREES
    * regardless of the CRS unit (the OGC/ESRI/GDAL practice — ESRI
    * writes Paris as 2.337229166666667 under UNIT["Grad"]); WKT2 PRIMEM
    * carries its own ANGLEUNIT, handled by [[primeMeridianDeg]]. */
  private def geographicOf(ell: Ellipsoid, node: Node): Projection = {
    val toDeg = snapToDeg(node.child("UNIT").orElse(node.child("ANGLEUNIT"))
      .flatMap(_.numbers.headOption).getOrElse(DegFactor))
    val pmDeg = primeMeridianDeg(node)
    if (math.abs(toDeg - 1.0) < 1e-12 && pmDeg == 0.0) Geographic(ell)
    else GeographicUnits(ell, toDeg, pmDeg)
  }

  /** PRIMEM longitude in degrees: WKT1 bare value = degrees; a WKT2
    * ANGLEUNIT child converts explicitly. */
  private def primeMeridianDeg(node: Node): Double =
    node.child("PRIMEM").map { pm =>
      val v = pm.numbers.headOption.getOrElse(0.0)
      pm.child("ANGLEUNIT").orElse(pm.child("UNIT"))
        .flatMap(_.numbers.headOption) match {
        case Some(f) => v * snapToDeg(f)
        case None => v // WKT1: always degrees
      }
    }.getOrElse(0.0)

  private def parseTree(root: Node): Crs = root.kind match {
    case "GEOGCS" =>
      val (ell, shift) = datumOf(root)
      Crs(geographicOf(ell, root), shift, root.name)
    case "PROJCS" => parseProjcs1(root)
    case "GEOGCRS" | "GEOGRAPHICCRS" | "GEODCRS" | "GEODETICCRS" =>
      val (ell, shift) = datumOf2(root)
      Crs(geographicOf(ell, root), shift, root.name)
    case "PROJCRS" | "PROJECTEDCRS" => parseProjcrs2(root)
    case "BOUNDCRS" => parseBoundCrs(root)
    case other => throw new IllegalArgumentException(
      s"WKT root must be GEOGCS/PROJCS (WKT1) or GEOGCRS/PROJCRS/BOUNDCRS (WKT2), got $other")
  }

  // ------------------------------------------------------------ WKT1 path

  private def parseProjcs1(root: Node): Crs = {
    val geog = root.child("GEOGCS").getOrElse(
      throw new IllegalArgumentException("WKT PROJCS without GEOGCS"))
    val (ell, shift) = datumOf(geog)
    val toDeg = snapToDeg(geog.child("UNIT").flatMap(_.numbers.headOption)
      .getOrElse(DegFactor))
    val linearFactor = root.children("UNIT").lastOption
      .flatMap(_.numbers.headOption).getOrElse(1.0)
    val method = root.child("PROJECTION").map(_.name).getOrElse(
      throw new IllegalArgumentException("WKT PROJCS without PROJECTION"))
    val params: Map[String, Double] = root.children("PARAMETER").map { p =>
      (norm(p.name), p.numbers.headOption.getOrElse(0.0))
    }.toMap
    // longitudes in the PARAMETERs are measured from the GEOGCS's PRIMEM:
    // a Paris-meridian Central_Meridian of 0 means 2.3372°E Greenwich —
    // silently ignoring the offset shifted every coordinate ~170 km
    val pmDeg = primeMeridianDeg(geog)
    val proj = buildProjection(method, ell,
      angle = names => names.flatMap(params.get).headOption.map(_ * toDeg),
      len = names => names.flatMap(params.get).headOption.map(_ * linearFactor),
      num = names => names.flatMap(params.get).headOption,
      pmDeg = pmDeg)
    Crs(unitScaled(proj, linearFactor), shift, root.name)
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
    }.orElse(
      // ESRI dialect: no TOWGS84 clause — recover the published Helmert
      // from the datum NAME (`D_` prefix is ESRI's marker)
      if (datum.child("TOWGS84").isDefined) None // explicit all-zero = coincident
      else shiftFromDatumName(datum.name))
    (ell, shift)
  }

  private def shiftFromDatumName(raw: String): Option[Helmert] =
    EpsgDb.datumShiftByName.getOrElse(norm(stripDatumPrefix(raw)), None)

  // ------------------------------------------------------------ WKT2 path

  /** Datum/ensemble + ellipsoid of a WKT2 geographic (or BASEGEOGCRS)
    * node; shift recovered from the datum name (WKT2 has no TOWGS84 —
    * shifts live in BOUNDCRS wrappers, handled separately). */
  private def datumOf2(geog: Node): (Ellipsoid, Option[Helmert]) = {
    val datum = geog.child("DATUM").orElse(geog.child("ENSEMBLE"))
      .orElse(geog.child("TRF")).orElse(geog.child("GEODETICDATUM")).getOrElse(
        throw new IllegalArgumentException(s"WKT2 ${geog.kind} without DATUM/ENSEMBLE"))
    val sph = datum.child("ELLIPSOID").orElse(datum.child("SPHEROID")).getOrElse(
      throw new IllegalArgumentException("WKT2 DATUM without ELLIPSOID"))
    val ns = sph.numbers
    require(ns.length >= 2, "WKT2 ELLIPSOID needs semi-major axis and 1/f")
    // semi-major axis may carry its own LENGTHUNIT (Clarke's foot etc.)
    val aFactor = sph.child("LENGTHUNIT").orElse(sph.child("UNIT"))
      .flatMap(_.numbers.headOption).getOrElse(1.0)
    val ell = Ellipsoid(ns(0) * aFactor, if (ns(1) == 0.0) 1e12 else ns(1))
    (ell, shiftFromDatumName(datum.name))
  }

  private def parseProjcrs2(root: Node): Crs = {
    val base = root.child("BASEGEOGCRS").orElse(root.child("BASEGEODCRS")).getOrElse(
      throw new IllegalArgumentException("WKT2 PROJCRS without BASEGEOGCRS"))
    val (ell, shift) = datumOf2(base)
    val conv = root.child("CONVERSION").getOrElse(
      throw new IllegalArgumentException("WKT2 PROJCRS without CONVERSION"))
    val method = conv.child("METHOD").map(_.name).getOrElse(
      throw new IllegalArgumentException("WKT2 CONVERSION without METHOD"))
    // CS linear unit: per-axis LENGTHUNIT, or a CS-level one after CS[]
    val axisUnit = root.children("AXIS").flatMap(a =>
      a.child("LENGTHUNIT").orElse(a.child("UNIT"))).headOption
      .orElse(root.child("LENGTHUNIT")).orElse(root.child("UNIT"))
    val linearFactor = axisUnit.flatMap(_.numbers.headOption).getOrElse(1.0)
    // each parameter may carry its own unit node
    case class P(value: Double, unit: Option[Node])
    val params: Map[String, P] = conv.children("PARAMETER").map { p =>
      val u = p.child("ANGLEUNIT").orElse(p.child("LENGTHUNIT"))
        .orElse(p.child("SCALEUNIT")).orElse(p.child("UNIT"))
      norm(p.name) -> P(p.numbers.headOption.getOrElse(0.0), u)
    }.toMap
    def get(names: Seq[String]): Option[P] = names.flatMap(params.get).headOption
    // base CRS prime meridian (WKT2 carries its unit; bare = degrees)
    val basePmDeg = primeMeridianDeg(base)
    val proj = buildProjection(method, ell,
      angle = names => get(names).map { p =>
        val f = p.unit.flatMap(_.numbers.headOption).getOrElse(DegFactor)
        p.value * snapToDeg(f)
      },
      len = names => get(names).map { p =>
        val f = p.unit.filter(_.kind != "SCALEUNIT").flatMap(_.numbers.headOption)
          .getOrElse(linearFactor)
        p.value * f
      },
      num = names => get(names).map(_.value),
      pmDeg = basePmDeg)
    Crs(unitScaled(proj, linearFactor), shift, root.name)
  }

  /** BOUNDCRS[SOURCECRS[...], TARGETCRS[...WGS 84...],
    * ABRIDGEDTRANSFORMATION[... PARAMETER["X-axis translation",...]...]]:
    * the WKT2 equivalent of TOWGS84. Rotations are arc-seconds; the
    * abridged scale difference is the ratio M = 1 + ds·1e-6 (a full
    * TRANSFORMATION writes ppm directly — both accepted). */
  private def parseBoundCrs(root: Node): Crs = {
    val src = root.child("SOURCECRS").flatMap(_.childNodes.headOption).getOrElse(
      throw new IllegalArgumentException("BOUNDCRS without SOURCECRS"))
    val inner = parseTree(src)
    val tr = root.child("ABRIDGEDTRANSFORMATION")
      .orElse(root.child("COORDINATEOPERATION"))
    val shift: Option[Helmert] = tr match {
      case None => inner.shift
      case Some(t) =>
        val p: Map[String, Double] = t.children("PARAMETER").map { n =>
          norm(n.name) -> n.numbers.headOption.getOrElse(0.0)
        }.toMap
        def g(k: String): Double = p.getOrElse(k, 0.0)
        val dsRaw = g("scaledifference")
        // only the ABRIDGED form writes the ratio M = 1 + ds·1e-6 — a
        // full COORDINATEOPERATION's ppm value near 1 (e.g. 0.995 ppm)
        // must NOT be re-scaled by 1e6
        val abridged = t.kind == "ABRIDGEDTRANSFORMATION"
        val ds = if (abridged && dsRaw != 0.0 && math.abs(dsRaw - 1.0) < 0.01)
          (dsRaw - 1.0) * 1e6 else dsRaw
        val h = Helmert(g("xaxistranslation"), g("yaxistranslation"), g("zaxistranslation"),
          g("xaxisrotation"), g("yaxisrotation"), g("zaxisrotation"), ds)
        // an EXPLICIT all-zero transformation declares coincidence — do
        // not resurrect the datum-name Helmert (the WKT1 TOWGS84 path
        // treats explicit zeros the same way)
        if (h == Helmert(0, 0, 0, 0, 0, 0, 0)) None else Some(h)
    }
    Crs(inner.proj, shift, inner.name)
  }

  // ------------------------------------------------------------ PROJ.4 path

  /** Ellipsoids by PROJ.4 `+ellps=` mnemonic (normalized): the published
    * PROJ ellipsoid table, a + 1/f (b-defined entries converted). */
  private val proj4Ellps: Map[String, Ellipsoid] = {
    def fromAB(a: Double, b: Double) = Ellipsoid(a, a / (a - b))
    Map(
      "wgs84" -> Ellipsoid(6378137.0, 298.257223563),
      "grs80" -> Ellipsoid(6378137.0, 298.257222101),
      "clrk66" -> fromAB(6378206.4, 6356583.8),
      "clrk80" -> Ellipsoid(6378249.145, 293.4663),
      "clrk80ign" -> Ellipsoid(6378249.2, 293.4660212936269),
      "intl" -> Ellipsoid(6378388.0, 297.0),
      "bessel" -> Ellipsoid(6377397.155, 299.1528128),
      "krass" -> Ellipsoid(6378245.0, 298.3),
      "airy" -> Ellipsoid(6377563.396, 299.3249646),
      "modairy" -> fromAB(6377340.189, 6356034.446),
      "wgs72" -> Ellipsoid(6378135.0, 298.26),
      "wgs66" -> Ellipsoid(6378145.0, 298.25),
      "grs67" -> Ellipsoid(6378160.0, 298.247167427),
      "austsa" -> Ellipsoid(6378160.0, 298.25),
      "helmert" -> Ellipsoid(6378200.0, 298.3),
      "evrst30" -> Ellipsoid(6377276.345, 300.8017),
      "sphere" -> Ellipsoid(6370997.0, 1e12))
  }

  /** PROJ.4 `+datum=` shorthands → (ellipsoid mnemonic, datum-name key in
    * [[EpsgDb.datumShiftByName]]) — the public PROJ datum table restated
    * onto the shift constants this engine already carries. */
  private val proj4Datums: Map[String, (String, String)] = Map(
    "wgs84" -> ("wgs84", "wgs84"),
    "nad83" -> ("grs80", "nad83"),
    "nad27" -> ("clrk66", "nad27"),
    "osgb36" -> ("airy", "osgb36"),
    "potsdam" -> ("bessel", "dhdn"),
    "ch1903" -> ("bessel", "ch1903"),
    "nzgd49" -> ("intl", "nzgd1949"),
    "ire65" -> ("modairy", "tm65"),
    "hermannskogel" -> ("bessel", "mgi"),
    "ggrs87" -> ("grs80", "ggrs87"))

  /** PROJ.4 `+pm=` named meridians, degrees east of Greenwich (the
    * public PROJ prime-meridian table). */
  private val proj4Pms: Map[String, Double] = Map(
    "greenwich" -> 0.0, "lisbon" -> -9.131906111111112,
    "paris" -> 2.337229166666667, "bogota" -> -74.08091666666667,
    "madrid" -> -3.687938888888889, "rome" -> 12.45233333333333,
    "bern" -> 7.439583333333333, "jakarta" -> 106.8077194444444,
    "ferro" -> -17.66666666666667, "brussels" -> 4.367975,
    "stockholm" -> 18.05827777777778, "athens" -> 23.7163375,
    "oslo" -> 10.72291666666667)

  /** PROJ.4 `+units=` → metres-per-unit (`+to_meter=` overrides). */
  private val proj4Units: Map[String, Double] = Map(
    "m" -> 1.0, "km" -> 1000.0, "cm" -> 0.01, "mm" -> 0.001,
    "ft" -> 0.3048, "us-ft" -> 1200.0 / 3937.0, "ind-ft" -> 0.30479841,
    "yd" -> 0.9144, "us-yd" -> 3600.0 / 3937.0,
    "mi" -> 1609.344, "us-mi" -> 6336000.0 / 3937.0,
    "in" -> 0.0254, "us-in" -> 100.0 / 3937.0,
    "link" -> 0.201168402336805, "us-ch" -> 79200.0 / 3937.0, "fath" -> 1.8288)

  /** PROJ.4 string → [[EpsgDb.Crs]]. Supported `+proj=` families map onto
    * the same projection engine the WKT path uses: longlat/latlong, tmerc,
    * utm (+zone/+south), merc (+lat_ts → 2SP form), webmerc, lcc (1/2SP),
    * aea, stere (polar A via +k_0, polar B via +lat_ts, non-polar lat_0 →
    * the classic oblique/equatorial form), sterea, laea,
    * cea, eqc (+lat_ts standard parallel), krovak, poly, omerc
    * (+no_uoff → variant A), somerc, nzmg.
    * Ellipsoid from `+ellps`/`+a +b`/`+a +rf`/`+a +f`/`+R`/`+datum`;
    * datum shift from `+towgs84` (3 or 7 params; all-zero or
    * `+nadgrids=@null` = explicitly WGS84-coincident) or the `+datum`
    * shorthand; `+pm` named or numeric; `+units`/`+to_meter` for output
    * units (false easting/northing stay metres, PROJ semantics).
    * The reference reaches this grammar through pyproj/PROJ
    * (`functions.rs:1868-1939`); here it is a ~100-line parser onto the
    * in-repo families. */
  def parseProj4(s: String): Crs = {
    val kv = scala.collection.mutable.LinkedHashMap[String, String]()
    s.trim.split("\\s+").iterator.filter(_.nonEmpty).foreach { t0 =>
      val t = if (t0.startsWith("+")) t0.substring(1) else t0
      val eq = t.indexOf('=')
      if (eq >= 0) kv(t.substring(0, eq).toLowerCase(java.util.Locale.ROOT)) =
        t.substring(eq + 1)
      else kv(t.toLowerCase(java.util.Locale.ROOT)) = ""
    }
    val projName = kv.getOrElse("proj",
      throw new IllegalArgumentException("PROJ.4 string without +proj="))
    // silently ignoring a non-default axis order would register a CRS
    // whose coordinates come out sign-flipped/swapped (e.g. the South
    // African +axis=wsu grids) — fail loudly like the other unknowns
    kv.get("axis").filter(_ != "enu").foreach(a =>
      throw new IllegalArgumentException(
        s"PROJ.4 +axis=$a: only the default east-north-up order is implemented"))
    def d(k: String): Option[Double] =
      kv.get(k).filter(_.nonEmpty).map(_.toDouble)

    val datum = kv.get("datum").map(n => proj4Datums.getOrElse(norm(n),
      throw new IllegalArgumentException(s"PROJ.4 +datum=$n not implemented " +
        s"(known: ${proj4Datums.keys.toSeq.sorted.mkString(", ")})")))
    val ell: Ellipsoid =
      (d("a"), d("b"), d("rf").orElse(d("f").map(f => if (f == 0) 1e12 else 1 / f))) match {
        case (Some(a), Some(b), _) =>
          if (a == b) Ellipsoid(a, 1e12) else Ellipsoid(a, a / (a - b))
        case (Some(a), None, Some(rf)) => Ellipsoid(a, if (rf == 0) 1e12 else rf)
        case (Some(a), None, None) => Ellipsoid(a, 1e12) // +a alone = sphere
        case _ => d("r").map(Ellipsoid(_, 1e12))
          .orElse(kv.get("ellps").map(n => proj4Ellps.getOrElse(norm(n),
            throw new IllegalArgumentException(s"PROJ.4 +ellps=$n not implemented " +
              s"(known: ${proj4Ellps.keys.toSeq.sorted.mkString(", ")})"))))
          .orElse(datum.map(dt => proj4Ellps(dt._1)))
          .getOrElse(proj4Ellps("wgs84")) // PROJ's own default
      }
    val shift: Option[Helmert] = kv.get("towgs84") match {
      case Some(csv) =>
        val p = csv.split(",").map(_.trim.toDouble).padTo(7, 0.0)
        if (p.forall(_ == 0.0)) None // explicit zeros = coincident
        else Some(Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6)))
      case None if kv.get("nadgrids").contains("@null") => None
      case None => datum.flatMap(dt => EpsgDb.datumShiftByName.getOrElse(dt._2, None))
    }
    val pmDeg = kv.get("pm").map { pm =>
      proj4Pms.getOrElse(norm(pm),
        scala.util.Try(pm.toDouble).getOrElse(throw new IllegalArgumentException(
          s"PROJ.4 +pm=$pm: not a known meridian or a number")))
    }.getOrElse(0.0)
    val toMeter = d("to_meter").orElse(kv.get("units").map(u =>
      proj4Units.getOrElse(u.toLowerCase(java.util.Locale.ROOT),
        throw new IllegalArgumentException(s"PROJ.4 +units=$u not implemented " +
          s"(known: ${proj4Units.keys.toSeq.sorted.mkString(", ")})")))).getOrElse(1.0)

    if (Set("longlat", "latlong", "latlon", "lonlat").contains(projName)) {
      val proj = if (pmDeg == 0.0) Geographic(ell) else GeographicUnits(ell, 1.0, pmDeg)
      return Crs(proj, shift, s.trim)
    }

    // parameters restated under the WKT spellings buildProjection resolves
    val p = scala.collection.mutable.Map[String, Double]()
    d("lat_0").foreach(p("latitudeoforigin") = _)
    d("lon_0").foreach(p("centralmeridian") = _)
    d("lonc").foreach(p("longitudeofcenter") = _)
    d("lat_1").foreach(p("standardparallel1") = _)
    d("lat_2").foreach(p("standardparallel2") = _)
    d("k").orElse(d("k_0")).foreach(p("scalefactor") = _)
    d("x_0").foreach(p("falseeasting") = _)
    d("y_0").foreach(p("falsenorthing") = _)
    d("alpha").foreach(p("azimuth") = _)
    d("gamma").foreach(p("rectifiedgridangle") = _)

    val method: String = projName match {
      case "tmerc" => "transversemercator"
      case "utm" =>
        val zone = d("zone").map(_.toInt).getOrElse(throw new IllegalArgumentException(
          "PROJ.4 +proj=utm needs +zone="))
        require(zone >= 1 && zone <= 60, s"+proj=utm zone out of range: $zone")
        p("latitudeoforigin") = 0.0
        p("centralmeridian") = -183.0 + 6.0 * zone
        p("scalefactor") = 0.9996
        p("falseeasting") = 500000.0
        p("falsenorthing") = if (kv.contains("south")) 1e7 else 0.0
        "transversemercator"
      case "merc" =>
        // +lat_ts selects the standard-parallel (2SP) form, under which a
        // scale factor has no meaning — modern PROJ errors on the
        // combination ("k_0 and lat_ts can not both be specified") except
        // for the legacy 3857 string's explicit k=1, so must we
        d("lat_ts") match {
          case Some(ts) =>
            d("k").orElse(d("k_0")).filter(k => math.abs(k - 1.0) > 1e-12)
              .foreach { kBad =>
                throw new IllegalArgumentException(
                  s"PROJ.4 +proj=merc with both +lat_ts=$ts and +k=$kBad: " +
                    "a standard parallel already fixes the scale (PROJ " +
                    "rejects the combination; only the legacy k=1 form " +
                    "is accepted)")
              }
            p("standardparallel1") = ts; "mercator2sp"
          case None => "mercator1sp"
        }
      case "webmerc" => "popularvisualisationpseudomercator"
      case "lcc" =>
        if (d("lat_2").isDefined) "lambertconformalconic2sp"
        else { // 1SP: tangent cone at lat_1 (PROJ defaults lat_0 := lat_1)
          // PROJ's 1SP form puts the cone at lat_1 but measures the false
          // northing from lat_0 — Lcc1SP has a single latitude, so a
          // DISTINCT pair would silently offset every northing; and a
          // lat_0-only string (no lat_1) is an error in PROJ itself
          // (lat_1 defaults to 0, an invalid equatorial cone) — both
          // reject loudly rather than register plausible-looking output
          (d("lat_1"), d("lat_0")) match {
            case (Some(l1), Some(l0)) if math.abs(l1 - l0) > 1e-12 =>
              throw new IllegalArgumentException(
                s"PROJ.4 +proj=lcc 1SP with lat_1=$l1 != lat_0=$l0 is not " +
                  "implemented (supply +lat_2 for the 2SP form, or equal values)")
            case (None, _) =>
              // lat_0-only AND latitude-less forms both leave lat_1 at
              // PROJ's invalid 0 default (an equatorial cone, n = sin 0 =
              // 0 → division by zero → silent Infinity output) — PROJ
              // errors on both, so must we
              throw new IllegalArgumentException(
                "PROJ.4 +proj=lcc needs +lat_1 (PROJ rejects latitude-less " +
                  "and lat_0-only strings too — lat_1 would default to an " +
                  "invalid equatorial 0)")
            case _ => ()
          }
          d("lat_1").foreach(p("latitudeoforigin") = _)
          "lambertconformalconic1sp"
        }
      case "aea" => "albers"
      case "stere" =>
        val lat0 = d("lat_0").getOrElse(0.0)
        if (math.abs(math.abs(lat0) - 90) < 1e-9)
          d("lat_ts") match {
            case Some(ts) => p("standardparallel1") = ts; "polarstereographicvariantb"
            case None => "polarstereographicvarianta"
          }
        else {
          // oblique/equatorial aspect: the classic (Snyder §21) single
          // stereographic. PROJ only consumes +lat_ts in the polar setup —
          // silently dropping it here would register a different scale
          // than the user asked for, so reject the combination loudly
          d("lat_ts").foreach { ts =>
            throw new IllegalArgumentException(
              s"PROJ.4 +proj=stere with non-polar lat_0=$lat0 does not " +
                s"take +lat_ts=$ts (a standard parallel only exists in " +
                "the polar aspect; use +k for oblique scale)")
          }
          "stereographic"
        }
      case "sterea" => "obliquestereographic"
      case "laea" => "lambertazimuthalequalarea"
      case "cea" =>
        d("lat_ts").foreach(p("standardparallel1") = _)
        "cylindricalequalarea"
      case "eqc" =>
        d("lat_ts").foreach(p("standardparallel1") = _)
        "equidistantcylindrical"
      case "krovak" =>
        // PROJ hardcodes ALL of these when absent — a terse
        // '+proj=krovak +ellps=bessel' is valid there and must not parse
        // here as a lat_0=0/lon_0=0/k=1 projection thousands of km off
        p.getOrElseUpdate("pseudostandardparallel1", 78.5)
        p.getOrElseUpdate("azimuth", 30.28813972222222)
        p.getOrElseUpdate("latitudeoforigin", 49.5)
        p.getOrElseUpdate("centralmeridian", 24.833333333333332)
        p.getOrElseUpdate("scalefactor", 0.9999)
        "krovak"
      case "poly" => "polyconic"
      case "omerc" =>
        if (kv.contains("no_uoff") || kv.contains("no_off"))
          "hotineobliquemercatorvarianta"
        else "hotineobliquemercatorazimuthcenter"
      case "somerc" =>
        p("azimuth") = 90.0; p("rectifiedgridangle") = 90.0
        "hotineobliquemercatorazimuthcenter" // az=γ=90 dispatches to somerc
      case "nzmg" => "newzealandmapgrid"
      case other => throw new IllegalArgumentException(
        s"PROJ.4 +proj=$other not implemented (supported: longlat, tmerc, utm, " +
          "merc, webmerc, lcc, aea, stere, sterea, laea, cea, eqc, " +
          "krovak, poly, omerc, somerc, nzmg)")
    }
    def get(names: Seq[String]): Option[Double] = names.flatMap(p.get).headOption
    val proj = buildProjection(method, ell,
      angle = get, len = get, num = get, pmDeg = pmDeg)
    Crs(unitScaled(proj, toMeter), shift, s.trim)
  }

  // --------------------------------------------- shared projection builder

  private def unitScaled(proj: Projection, linearFactor: Double): Projection =
    if (math.abs(linearFactor - 1.0) < 1e-12) proj else UnitScaled(proj, linearFactor)

  private val Lat0Names = Seq("latitudeoforigin", "latitudeofnaturalorigin",
    "latitudeoffalseorigin", "latitudeofcenter", "latitudeofcentre",
    "latitudeofprojectioncentre")
  private val Lon0Names = Seq("centralmeridian", "longitudeofnaturalorigin",
    "longitudeoffalseorigin", "longitudeofcenter", "longitudeofcentre",
    "longitudeoforigin", "longitudeofprojectioncentre")
  private val K0Names = Seq("scalefactor", "scalefactoratnaturalorigin")
  private val FeNames = Seq("falseeasting", "eastingatfalseorigin")
  private val FnNames = Seq("falsenorthing", "northingatfalseorigin")
  private val Sp1Names = Seq("standardparallel1", "latitudeof1ststandardparallel",
    "latitudeofstandardparallel")
  private val Sp2Names = Seq("standardparallel2", "latitudeof2ndstandardparallel")

  /** Construct the projection family from dialect-normalized lookups:
    * `angle` yields degrees, `len` metres, `num` the raw value; all return
    * None when no spelling of the parameter is present. */
  private def buildProjection(method: String, ell: Ellipsoid,
      angle: Seq[String] => Option[Double],
      len: Seq[String] => Option[Double],
      num: Seq[String] => Option[Double],
      pmDeg: Double = 0.0): Projection = {
    val lat0 = angle(Lat0Names).getOrElse(0.0)
    // longitude parameters are relative to the prime meridian; lon0 in
    // the projection families is Greenwich-referenced
    val lon0 = angle(Lon0Names).getOrElse(0.0) + pmDeg
    val sp1 = angle(Sp1Names)
    val lat1 = sp1.getOrElse(0.0)
    val lat2 = angle(Sp2Names).getOrElse(0.0)
    val k0 = num(K0Names).getOrElse(1.0)
    val fe = len(FeNames).getOrElse(0.0)
    val fn = len(FnNames).getOrElse(0.0)
    def mercSp1: Projection = {
      // k0 at the equator that holds scale true at standard_parallel_1
      val phi1 = math.toRadians(lat1)
      val s = math.sin(phi1)
      val kEq = math.cos(phi1) / math.sqrt(1 - ell.e2 * s * s)
      Mercator1SP(ell, lon0, kEq, fe, fn)
    }
    // spherical web mercator: formulas of a sphere of radius a, applied to
    // ellipsoidal WGS84 latitudes (the EPSG 3857 definition)
    def webMercator: Projection =
      Mercator1SP(Ellipsoid(ell.a, 1e12), lon0, 1.0, fe, fn)
    def polarA: Projection =
      PolarStereo(ell, lat0 >= 0, lon0, Double.NaN, k0, fe, fn)
    def polarB(north: Boolean): Projection =
      PolarStereo(ell, north, lon0, lat1, Double.NaN, fe, fn)
    norm(method) match {
      case "transversemercator" | "gausskruger" =>
        TMerc(ell, lat0, lon0, k0, fe, fn)
      case "mercator1sp" | "mercatorvarianta" =>
        Mercator1SP(ell, lon0, k0, fe, fn)
      case "mercator2sp" | "mercatorvariantb" => mercSp1
      case "mercator" => // ESRI spells both variants "Mercator"
        if (sp1.isDefined && num(K0Names).isEmpty) mercSp1
        else Mercator1SP(ell, lon0, k0, fe, fn)
      case "mercatorauxiliarysphere" | "popularvisualisationpseudomercator" =>
        webMercator
      case "lambertconformalconic1sp" | "lambertconicconformal1sp" =>
        Lcc1SP(ell, lat0, lon0, k0, fe, fn)
      case "lambertconformalconic2sp" | "lambertconicconformal2sp" =>
        Lcc2SP(ell, lat1, lat2, lat0, lon0, fe, fn)
      case "lambertconformalconic" => // ESRI: one name for both variants
        if (angle(Sp2Names).isDefined) Lcc2SP(ell, lat1, lat2, lat0, lon0, fe, fn)
        else Lcc1SP(ell, lat0, lon0, k0, fe, fn)
      case "albersconicequalarea" | "albers" | "albersequalarea" =>
        AlbersConic(ell, lat1, lat2, lat0, lon0, fe, fn)
      case "polarstereographic" =>
        if (math.abs(math.abs(lat0) - 90) < 1e-9) polarA // variant A: scale at pole
        else PolarStereo(ell, lat0 >= 0, lon0, lat0, Double.NaN, fe, fn)
      case "polarstereographicvarianta" => polarA
      case "polarstereographicvariantb" => polarB(lat1 >= 0)
      case "stereographicnorthpole" => polarB(north = true) // ESRI names
      case "stereographicsouthpole" => polarB(north = false)
      case "stereographic" => // classic single stereographic: polar at the
        // poles (Snyder §21 polar eqs), oblique/equatorial elsewhere
        if (math.abs(math.abs(lat0) - 90) < 1e-6) polarA
        else StereoClassic(ell, lat0, lon0, k0, fe, fn)
      case "obliquestereographic" | "doublestereographic" =>
        ObliqueStereo(ell, lat0, lon0, k0, fe, fn)
      case "lambertazimuthalequalarea" =>
        Laea(ell, lat0, lon0, fe, fn)
      case "krovak" =>
        require(fe == 0 && fn == 0,
          "WKT Krovak with false easting/northing is not supported")
        val az = angle(Seq("azimuth", "colatitudeofconeaxis")).getOrElse(0.0)
        val psp = angle(Seq("pseudostandardparallel1",
          "latitudeofpseudostandardparallel")).getOrElse(0.0)
        val kk = num("scalefactoronpseudostandardparallel" +: K0Names).getOrElse(1.0)
        Krovak(ell, lat0, lon0, az, psp, kk)
      case "polyconic" | "americanpolyconic" =>
        Polyconic(ell, lat0, lon0, fe, fn)
      case "cylindricalequalarea" | "lambertcylindricalequalarea" |
          "lambertcylindricalequalareaspherical" =>
        Cea(ell, lat1, lon0, fe, fn)
      case "equirectangular" | "equidistantcylindrical" |
          "equidistantcylindricalspherical" | "platecarree" =>
        Eqc(ell, lat1, lat0, lon0, fe, fn)
      case "newzealandmapgrid" =>
        Nzmg(fe, fn)
      case "hotineobliquemercator" | "hotineobliquemercatorvarianta" |
          "rectifiedskeworthomorphicnaturalorigin" |
          "obliquemercatorhotine" =>
        val az = angle(Seq("azimuth", "azimuthofinitialline")).getOrElse(0.0)
        val gamma = angle(Seq("rectifiedgridangle",
          "anglefromrectifiedtoskewgrid")).getOrElse(az)
        val kh = num("scalefactoroninitialline" +: K0Names).getOrElse(1.0)
        HotineOblique(ell, lat0, lon0, az, gamma, kh, fe, fn, variantB = false)
      case "hotineobliquemercatorazimuthcenter" |
          "hotineobliquemercatorvariantb" |
          "rectifiedskeworthomorphiccenter" =>
        val az = angle(Seq("azimuth", "azimuthofinitialline")).getOrElse(0.0)
        val gamma = angle(Seq("rectifiedgridangle",
          "anglefromrectifiedtoskewgrid")).getOrElse(az)
        val kh = num("scalefactoroninitialline" +: K0Names).getOrElse(1.0)
        // ESRI writes the Swiss Rosenmund grids (LV03/LV95) with this
        // method name and azimuth = rectified angle = 90: that special
        // case IS the somerc projection, whose dedicated implementation
        // this engine already carries — dispatch it there so Swiss .prj
        // files and our own synthesized LV WKT round-trip exactly
        if (math.abs(az - 90.0) < 1e-9 && math.abs(gamma - 90.0) < 1e-9)
          SwissOblique(ell, lat0, lon0, kh, fe, fn)
        else HotineOblique(ell, lat0, lon0, az, gamma, kh, fe, fn, variantB = true)
      case _ => throw new IllegalArgumentException(
        s"WKT projection method not implemented: $method (supported: " +
          "Transverse_Mercator, Mercator (1SP/2SP/web), Lambert_Conformal_Conic (1SP/2SP), " +
          "Albers, Polar_Stereographic (A/B), Stereographic (polar/oblique classic), " +
          "Lambert_Azimuthal_Equal_Area, Oblique_Stereographic, Krovak, " +
          "Hotine_Oblique_Mercator (A/B), Polyconic, " +
          "Cylindrical_Equal_Area, Equirectangular, New_Zealand_Map_Grid)")
    }
  }

  // --------------------------------------------- SRID inference / recovery

  /** Approximate structural equality of projection trees (case classes of
    * doubles): relative 1e-9 absorbs WKT decimal printing while keeping
    * distinct zones distinct. Names are NOT compared. */
  private def approxSame(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) ||
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (x: Product, y: Product) =>
      x.getClass == y.getClass && x.productArity == y.productArity &&
        x.productIterator.zip(y.productIterator).forall { case (u, v) => approxSame(u, v) }
    case (x, y) => x == y
  }

  /** The embedded-table EPSG code whose definition matches `crs` (smallest
    * code wins for determinism), if any — the CRS→SRID inference the
    * reference performs at import time via pyproj. */
  def inferSrid(crs: Crs): Option[Int] =
    EpsgDb.table.toSeq.sortBy(_._1).collectFirst {
      case (code, t) if approxSame(t.proj, crs.proj) && approxSame(t.shift, crs.shift) =>
        code
    }

  /** Resolve a `.prj`/WKT definition to a working SRID:
    * 1. an explicit root AUTHORITY/ID clause wins (and the definition is
    *    registered under it when the code isn't otherwise known, so the
    *    long tail still reprojects);
    * 2. else the parsed definition is matched against the embedded EPSG
    *    table (how ESRI `.prj` files — no AUTHORITY — recover their code);
    * 3. else the definition auto-registers under a deterministic synthetic
    *    code in 990000..998999 so reprojection works end-to-end;
    * 4. unparseable/unsupported definitions yield 0 (geometry still reads,
    *    untagged — the reference's GDAL fallback behavior). */
  def sridForWkt(wkt: String): Int = {
    // PROJ.4 definitions have no AUTHORITY concept — parse, then infer
    // the code from the embedded table or auto-register, same as
    // authority-less WKT (keeps all three front doors — register, the
    // conf key, and this .prj/definition resolver — dialect-consistent)
    if (isProj4(wkt)) {
      return try {
        val crs = parseProj4(wkt.trim)
        inferSrid(crs).getOrElse(autoRegister(crs, wkt))
      } catch { case scala.util.control.NonFatal(_) => 0 }
    }
    val parsed: Option[Node] =
      try Some(tokenizeAndParse(wkt))
      catch { case scala.util.control.NonFatal(_) => None }
    val authority: Option[Int] = parsed match {
      case Some(root) =>
        // ROOT-level authority only. No regex fallback for parseable WKT:
        // a root without an EPSG authority (ESRI-coded, GeoServer-style)
        // must NOT inherit a NESTED clause — the last raw-text match is
        // typically the base GEOGCS's or even the UNIT's code, and
        // tagging an Albers grid as 4269/9001 poisons every later
        // st_to_srid
        (root.children("AUTHORITY") ++ root.children("ID")).lastOption.collect {
          case n if n.name.equalsIgnoreCase("EPSG") =>
            n.args.collectFirst {
              case d: Double => d.toInt
              case s: String if s.forall(_.isDigit) && s.nonEmpty => s.toInt
            }
        }.flatten
      case None =>
        // only UNPARSEABLE WKT may use the raw-text scan, and only a
        // TRAILING clause (the root authority is last in well-formed WKT)
        "(?i)AUTHORITY\\s*\\[\\s*\"EPSG\"\\s*,\\s*\"?(\\d+)\"?\\s*\\]\\s*\\]*\\s*$".r
          .findFirstMatchIn(wkt.trim).map(_.group(1).toInt)
    }
    authority match {
      case Some(code) =>
        if (!EpsgDb.isSupported(code))
          try register(code, wkt) catch { case scala.util.control.NonFatal(_) => () }
        code
      case None =>
        try {
          val crs = parseWkt(wkt)
          inferSrid(crs).getOrElse(autoRegister(crs, wkt))
        } catch { case scala.util.control.NonFatal(_) => 0 }
    }
  }

  /** Deterministic synthetic code (990000..998999, outside the EPSG range)
    * keyed by the definition text: the same `.prj` content always maps to
    * the same code, distinct definitions probe forward on collision. */
  private def autoRegister(crs: Crs, wkt: String): Int = synchronized {
    var code = 990000 + (scala.util.hashing.MurmurHash3.stringHash(wkt) & 0x7fffffff) % 9000
    while (Option(custom.get(code)).exists(_._2 != wkt)) code += 1
    custom.putIfAbsent(code, (crs, wkt))
    code
  }
}
