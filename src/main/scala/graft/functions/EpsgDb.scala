package graft.functions

/** Embedded EPSG parameter table + generalized projection engine for
  * `st_to_srid` (reference `to_srid`, `/root/reference/src/functions.rs:
  * 1868-1939`, backed there by proj4rs + an embedded EPSG database; this
  * offline build embeds the parameter tuples directly).
  *
  * Everything here derives from public knowledge: the projection formulas
  * are Snyder, *Map Projections — A Working Manual* (USGS PP 1395), the
  * datum transform is the standard 7-parameter Helmert (position-vector
  * rotation convention, EPSG method 9606), and the per-code parameters are
  * the published EPSG registry values (ellipsoid, standard parallels,
  * natural origin, false easting/northing, scale, datum shift).
  *
  * This module backs the codes NOT covered by [[CrsImpl]]'s original
  * closed-form families; those keep their existing implementations so
  * results stay bit-identical. All transforms route through the WGS84
  * geodetic hub; CRSs on other datums convert via geodetic → geocentric →
  * Helmert → WGS84 (grid-based transformations like NADCON/NTv2 are out of
  * scope — the published Helmert parameters are the meter-level "single
  * transform" of each registry entry, which is the same fallback proj uses
  * without grid files).
  */
object EpsgDb {

  // ------------------------------------------------------------ ellipsoids

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
    val ep2: Double = e2 / (1 - e2)
  }

  private val WGS84 = Ellipsoid(6378137.0, 298.257223563)
  private val GRS80 = Ellipsoid(6378137.0, 298.257222101)
  private val Wgs72Ell = Ellipsoid(6378135.0, 298.26)
  private val Intl1924 = Ellipsoid(6378388.0, 297.0)
  private val Airy1830 = Ellipsoid(6377563.396, 299.3249646)
  private val AiryModified = Ellipsoid(6377340.189, 299.3249646)
  private val Bessel1841 = Ellipsoid(6377397.155, 299.1528128)
  private val Clarke1880IGN = Ellipsoid(6378249.2, 293.4660212936269)
  private val Clarke1866 = Ellipsoid(6378206.4, 294.978698213898)
  private val Grs67 = Ellipsoid(6378160.0, 298.247167427)
  private val Krassowsky1940 = Ellipsoid(6378245.0, 298.3)
  private val Everest1967 = Ellipsoid(6377298.556, 300.8017)

  // ------------------------------------------------------- datum transform

  /** 7-parameter Helmert to WGS84, position-vector rotation convention
    * (EPSG 9606): translations m, rotations arc-seconds, scale ppm. The
    * inverse uses the EXACT analytic inverse of the (small-angle) rotation
    * matrix rather than parameter negation — negation leaves a second-order
    * s² residual (~3 mm for OSGB36's −20.5 ppm) that would eat the 1e-8°
    * round-trip budget. */
  final case class Helmert(dx: Double, dy: Double, dz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, ppm: Double) {
    private val s = math.Pi / (180.0 * 3600.0)
    private val (rx, ry, rz) = (rxSec * s, rySec * s, rzSec * s)
    private val m = 1.0 + ppm * 1e-6
    // inverse of A = [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]] via cofactors
    private val det = 1.0 + rx * rx + ry * ry + rz * rz
    private val i11 = (1 + rx * rx) / det
    private val i12 = (rz + rx * ry) / det
    private val i13 = (rx * rz - ry) / det
    private val i21 = (rx * ry - rz) / det
    private val i22 = (1 + ry * ry) / det
    private val i23 = (rx + ry * rz) / det
    private val i31 = (rx * rz + ry) / det
    private val i32 = (ry * rz - rx) / det
    private val i33 = (1 + rz * rz) / det

    def toWgs84(x: Double, y: Double, z: Double): (Double, Double, Double) =
      (dx + m * (x - rz * y + ry * z),
        dy + m * (rz * x + y - rx * z),
        dz + m * (-ry * x + rx * y + z))

    def fromWgs84(x0: Double, y0: Double, z0: Double): (Double, Double, Double) = {
      val x = (x0 - dx) / m
      val y = (y0 - dy) / m
      val z = (z0 - dz) / m
      (i11 * x + i12 * y + i13 * z,
        i21 * x + i22 * y + i23 * z,
        i31 * x + i32 * y + i33 * z)
    }
  }

  /** Geodetic (deg, h=0) → geocentric XYZ. */
  private def toXYZ(ell: Ellipsoid, lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg)
    val lon = math.toRadians(lonDeg)
    val sinP = math.sin(lat)
    val n = ell.a / math.sqrt(1 - ell.e2 * sinP * sinP)
    (n * math.cos(lat) * math.cos(lon),
      n * math.cos(lat) * math.sin(lon),
      n * (1 - ell.e2) * sinP)
  }

  /** Geocentric XYZ → geodetic (deg), fixed-point on φ (converges to
    * double precision in < 10 rounds for surface points). */
  private def toGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double): (Double, Double) = {
    val p = math.hypot(x, y)
    var phi = math.atan2(z, p * (1 - ell.e2))
    var i = 0
    while (i < 12) {
      val sinP = math.sin(phi)
      val n = ell.a / math.sqrt(1 - ell.e2 * sinP * sinP)
      phi = math.atan2(z + ell.e2 * n * sinP, p)
      i += 1
    }
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
  }

  // ------------------------------------------------------------ projections

  /** Forward/inverse between (lon, lat) degrees on the CRS's own datum and
    * projected (x, y). */
  sealed trait Projection {
    def ell: Ellipsoid
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
  }

  /** Geographic 2D CRS (axis order normalized to lon, lat degrees). */
  final case class Geographic(ell: Ellipsoid) extends Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = (lonDeg, latDeg)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** Geographic CRS stored in NON-degree angular units (grads) and/or
    * referenced to a non-Greenwich prime meridian (Paris): the CRS's
    * native coordinates are `(lonDeg − pmDeg) / toDeg`. Without this,
    * a grads/Paris `.prj` (ESRI GCS_NTF_Paris) would register fine but
    * silently treat grads as degrees — hundreds of km of error. */
  final case class GeographicUnits(ell: Ellipsoid, toDeg: Double,
      pmDeg: Double) extends Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      ((lonDeg - pmDeg) / toDeg, latDeg / toDeg)
    def inverse(x: Double, y: Double): (Double, Double) =
      (x * toDeg + pmDeg, y * toDeg)
  }

  /** Linear-unit adapter for WKT CRSs whose projected unit is not the
    * metre (e.g. US survey foot): the wrapped projection computes in
    * metres (false easting/northing already converted), outputs divide by
    * `factor` (metres per unit). Used by [[CrsRegistry]]'s WKT parser. */
  final case class UnitScaled(inner: Projection, factor: Double) extends Projection {
    def ell: Ellipsoid = inner.ell
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (x, y) = inner.forward(lonDeg, latDeg)
      (x / factor, y / factor)
    }
    def inverse(x: Double, y: Double): (Double, Double) =
      inner.inverse(x * factor, y * factor)
  }

  /** Meridian arc M(φ) (Snyder 3-21), per ellipsoid. */
  private def meridianArc(ell: Ellipsoid, phi: Double): Double = {
    val e2 = ell.e2; val e4 = e2 * e2; val e6 = e4 * e2
    ell.a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
      - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
      + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
      - (35 * e6 / 3072) * math.sin(6 * phi))
  }

  /** Ellipsoidal Transverse Mercator (Snyder §8, series form — sub-mm
    * within ±4° of the central meridian, the designed domain of every
    * TM-based grid here). */
  final case class TMerc(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      k0: Double, fe: Double, fn: Double) extends Projection {
    private val m0 = meridianArc(ell, math.toRadians(lat0Deg))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      // Δλ wrapped to (−180°, 180°]: zones whose central meridian sits
      // past the antimeridian (Pulkovo GK zone 31 at 183°E) must see a
      // point at −176° as +1° off-meridian, not −359°
      val dLonDeg = {
        val d = (lonDeg - lon0Deg) % 360.0
        if (d > 180.0) d - 360.0 else if (d <= -180.0) d + 360.0 else d
      }
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val n = ell.a / math.sqrt(1 - ell.e2 * sinP * sinP)
      val t = tanP * tanP
      val c = ell.ep2 * cosP * cosP
      val aa = math.toRadians(dLonDeg) * cosP
      val m = meridianArc(ell, phi)
      val x = fe + k0 * n * (aa + (1 - t + c) * aa * aa * aa / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ell.ep2) * math.pow(aa, 5) / 120)
      val y = fn + k0 * (m - m0 + n * tanP * (aa * aa / 2
        + (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24
        + (61 - 58 * t + t * t + 600 * c - 330 * ell.ep2) * math.pow(aa, 6) / 720))
      (x, y)
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val e2 = ell.e2
      val x = x0 - fe
      val m = m0 + (y0 - fn) / k0
      val mu = m / (ell.a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val phi1 = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
      val c1 = ell.ep2 * cosP * cosP
      val t1 = tanP * tanP
      val n1 = ell.a / math.sqrt(1 - e2 * sinP * sinP)
      val r1 = ell.a * (1 - e2) / math.pow(1 - e2 * sinP * sinP, 1.5)
      val d = x / (n1 * k0)
      val phi = phi1 - (n1 * tanP / r1) * (d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ell.ep2) * math.pow(d, 4) / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ell.ep2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
      val lam = (d - (1 + 2 * t1 + c1) * d * d * d / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ell.ep2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cosP
      // The Snyder series truncates at d⁵/λ⁶: ~3e-8° of residual at
      // 3.75° from the central meridian (LKS92's eastern edge), which
      // breaches the shift-free 1e-8° round-trip budget. One Newton step
      // against the exact forward (numeric Jacobian; the step error is
      // quadratic in the ~1e-8 residual) lands every in-domain TM zone
      // at ≤1e-11°.
      var lon = lon0Deg + math.toDegrees(lam)
      var lat = math.toDegrees(phi)
      val (fx0, fy0) = forward(lon, lat)
      val h = 1e-7
      val (fx1, fy1) = forward(lon + h, lat)
      val (fx2, fy2) = forward(lon, lat + h)
      val j11 = (fx1 - fx0) / h; val j12 = (fx2 - fx0) / h
      val j21 = (fy1 - fy0) / h; val j22 = (fy2 - fy0) / h
      val det = j11 * j22 - j12 * j21
      if (det != 0.0 && !det.isNaN) {
        val ex = x0 - fx0; val ey = y0 - fy0
        lon += (j22 * ex - j12 * ey) / det
        lat += (-j21 * ex + j11 * ey) / det
      }
      (lon, lat)
    }
  }

  /** Lambert Conformal Conic 2SP (Snyder §15). */
  final case class Lcc2SP(ell: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
      lat0Deg: Double, lon0Deg: Double, fe: Double, fn: Double) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)
    private def mOf(phi: Double) = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - ell.e2 * s * s)
    }
    private def tOf(phi: Double) = {
      val esin = ell.e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), ell.e / 2)
    }
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val n =
      if (lat1Deg == lat2Deg) math.sin(phi1)
      else (math.log(mOf(phi1)) - math.log(mOf(phi2))) /
        (math.log(tOf(phi1)) - math.log(tOf(phi2)))
    private val fBig = mOf(phi1) / (n * math.pow(tOf(phi1), n))
    private val rho0 = {
      val t0 = tOf(math.toRadians(lat0Deg))
      if (t0 == 0.0) 0.0 else ell.a * fBig * math.pow(t0, n)
    }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val t = tOf(math.toRadians(latDeg))
      val rho = if (t == 0.0) 0.0 else ell.a * fBig * math.pow(t, n)
      val theta = n * (math.toRadians(lonDeg) - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val sg = math.signum(n)
      val x = x0 - fe; val y = rho0 - (y0 - fn)
      val rho = sg * math.sqrt(x * x + y * y)
      val t = math.pow(rho / (ell.a * fBig), 1 / n)
      val theta = math.atan2(sg * x, sg * y)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 10) {
        val esin = ell.e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - esin) / (1 + esin), ell.e / 2))
        i += 1
      }
      (math.toDegrees(theta / n + lon0), math.toDegrees(phi))
    }
  }

  /** Lambert Conformal Conic 1SP (EPSG method 9801; Snyder §15 with the
    * scale factor k0 at the natural origin — the French NTF Lambert zones'
    * form). Same t/ρ machinery as [[Lcc2SP]] with n = sin φ0 and ρ scaled
    * by k0. */
  final case class Lcc1SP(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      k0: Double, fe: Double, fn: Double) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)
    private def tOf(phi: Double) = {
      val esin = ell.e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), ell.e / 2)
    }
    private val phi0 = math.toRadians(lat0Deg)
    private val n = math.sin(phi0)
    private val m0 = {
      val s = math.sin(phi0)
      math.cos(phi0) / math.sqrt(1 - ell.e2 * s * s)
    }
    private val fBig = m0 / (n * math.pow(tOf(phi0), n))
    private val rho0 = {
      val t0 = tOf(phi0)
      if (t0 == 0.0) 0.0 else ell.a * k0 * fBig * math.pow(t0, n)
    }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val t = tOf(math.toRadians(latDeg))
      val rho = if (t == 0.0) 0.0 else ell.a * k0 * fBig * math.pow(t, n)
      val theta = n * (math.toRadians(lonDeg) - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val sg = math.signum(n)
      val x = x0 - fe; val y = rho0 - (y0 - fn)
      val rho = sg * math.sqrt(x * x + y * y)
      val t = math.pow(rho / (ell.a * k0 * fBig), 1 / n)
      val theta = math.atan2(sg * x, sg * y)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 10) {
        val esin = ell.e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - esin) / (1 + esin), ell.e / 2))
        i += 1
      }
      (math.toDegrees(theta / n + lon0), math.toDegrees(phi))
    }
  }

  /** Albers Equal-Area Conic 2SP (Snyder §14). */
  final case class AlbersConic(ell: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
      lat0Deg: Double, lon0Deg: Double, fe: Double, fn: Double) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)
    private def mOf(phi: Double) = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - ell.e2 * s * s)
    }
    private def qOf(phi: Double): Double = {
      val esin = ell.e * math.sin(phi)
      (1 - ell.e2) * (math.sin(phi) / (1 - esin * esin) -
        (1 / (2 * ell.e)) * math.log((1 - esin) / (1 + esin)))
    }
    private val m1 = mOf(math.toRadians(lat1Deg))
    private val m2 = mOf(math.toRadians(lat2Deg))
    private val q1 = qOf(math.toRadians(lat1Deg))
    private val q2 = qOf(math.toRadians(lat2Deg))
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    private val c = m1 * m1 + n * q1
    private val rho0 = ell.a * math.sqrt(c - n * qOf(math.toRadians(lat0Deg))) / n

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = ell.a * math.sqrt(c - n * qOf(math.toRadians(latDeg))) / n
      val theta = n * (math.toRadians(lonDeg) - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val sg = math.signum(n)
      val x = x0 - fe; val y = rho0 - (y0 - fn)
      val rho = sg * math.sqrt(x * x + y * y)
      val theta = math.atan2(sg * x, sg * y)
      val q = (c - rho * rho * n * n / (ell.a * ell.a)) / n
      var phi = math.asin(math.max(-1, math.min(1, q / 2)))
      var i = 0
      while (i < 12) {
        val sinP = math.sin(phi)
        val esin = ell.e * sinP
        val one = 1 - esin * esin
        phi += one * one / (2 * math.cos(phi)) * (q / (1 - ell.e2) -
          sinP / one + (1 / (2 * ell.e)) * math.log((1 - esin) / (1 + esin)))
        i += 1
      }
      (math.toDegrees(theta / n + lon0), math.toDegrees(phi))
    }
  }

  /** Polar Stereographic (Snyder §21), either EPSG variant: variant B is
    * parameterized by a standard parallel (`latTsDeg`), variant A (UPS) by
    * a scale factor at the pole (`k0`). Set exactly one. */
  final case class PolarStereo(ell: Ellipsoid, north: Boolean, lon0Deg: Double,
      latTsDeg: Double, k0: Double, fe: Double, fn: Double) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)
    private def tOf(phi: Double) = {
      val esin = ell.e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), ell.e / 2)
    }
    private def mOf(phi: Double) = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - ell.e2 * s * s)
    }
    /** ρ = kFactor · t. Variant B: a·m(φts)/t(φts); variant A (Snyder
      * 21-33): 2·a·k0 / sqrt((1+e)^(1+e)·(1-e)^(1-e)). */
    private val kFactor =
      if (!latTsDeg.isNaN) {
        val phiTs = math.toRadians(math.abs(latTsDeg))
        ell.a * mOf(phiTs) / tOf(phiTs)
      } else {
        val e = ell.e
        2 * ell.a * k0 / math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
      }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(if (north) latDeg else -latDeg)
      val dLam = math.toRadians(lonDeg) - lon0
      val rho = kFactor * tOf(phi)
      val x = rho * math.sin(dLam)
      val y = if (north) -rho * math.cos(dLam) else rho * math.cos(dLam)
      (fe + x, fn + y)
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe; val y = y0 - fn
      val rho = math.hypot(x, y)
      if (rho < 1e-12) return (lon0Deg, if (north) 90.0 else -90.0)
      val t = rho / kFactor
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 10) {
        val esin = ell.e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - esin) / (1 + esin), ell.e / 2))
        i += 1
      }
      val lam = lon0 + (if (north) math.atan2(x, -y) else math.atan2(x, y))
      val lamDeg = math.toDegrees(lam)
      val norm = lamDeg - 360.0 * math.floor((lamDeg + 180.0) / 360.0)
      val lamOut = if (norm == -180.0) 180.0 else norm
      (lamOut, math.toDegrees(if (north) phi else -phi))
    }
  }

  /** Classic (single-projection) oblique/equatorial Stereographic on the
    * ellipsoid — Snyder §21, eqs 21-27..21-39 on the conformal latitude
    * (3-1): what PROJ's `+proj=stere` computes for a non-polar `+lat_0`
    * (the reference reaches it via proj, functions.rs:1868-1939). Distinct
    * from [[ObliqueStereo]], the EPSG method 9809 DOUBLE stereographic
    * (ellipsoid → conformal sphere → sphere stereographic): the two agree
    * at the natural origin and diverge by centimetres-to-metres away from
    * it. Conformal; scale at the origin is k0. The antipode of the origin
    * is the projection's singular point (Snyder's A denominator → 0) —
    * like the other azimuthal families here, far-zone input is the
    * caller's responsibility. */
  final case class StereoClassic(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      k0: Double, fe: Double, fn: Double) extends Projection {
    require(math.abs(lat0Deg) < 90 - 1e-9,
      s"classic stereographic lat_0=$lat0Deg is polar — the polar aspect " +
        "is a different formula (PolarStereo); dispatch there instead")
    private val e = ell.e
    /** Conformal latitude χ(φ), Snyder 3-1. */
    private def chiOf(phi: Double): Double = {
      val esin = e * math.sin(phi)
      2 * math.atan(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - esin) / (1 + esin), e / 2)) - math.Pi / 2
    }
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val chi1 = chiOf(phi0)
    private val sinChi1 = math.sin(chi1)
    private val cosChi1 = math.cos(chi1)
    private val m1 = {
      val s = math.sin(phi0)
      math.cos(phi0) / math.sqrt(1 - ell.e2 * s * s)
    }
    private val akm1 = 2 * ell.a * k0 * m1 // Snyder 21-27 numerator

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val chi = chiOf(math.toRadians(latDeg))
      var dlam = math.toRadians(lonDeg) - lam0
      while (dlam > math.Pi) dlam -= 2 * math.Pi
      while (dlam <= -math.Pi) dlam += 2 * math.Pi
      val sinChi = math.sin(chi); val cosChi = math.cos(chi)
      val bigA = akm1 /
        (cosChi1 * (1 + sinChi1 * sinChi + cosChi1 * cosChi * math.cos(dlam)))
      (fe + bigA * cosChi * math.sin(dlam),
        fn + bigA * (cosChi1 * sinChi - sinChi1 * cosChi * math.cos(dlam)))
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe; val y = y0 - fn
      val rho = math.hypot(x, y)
      if (rho < 1e-12) return (lon0Deg, lat0Deg)
      val ce = 2 * math.atan2(rho * cosChi1, akm1) // Snyder 21-38
      val sinCe = math.sin(ce); val cosCe = math.cos(ce)
      val chi = math.asin(cosCe * sinChi1 + y * sinCe * cosChi1 / rho)
      val lam = lam0 + math.atan2(x * sinCe,
        rho * cosChi1 * cosCe - y * sinChi1 * sinCe)
      // χ → φ by the standard conformal fixed point (3-4 iterated; the
      // same scheme the Mercator / polar-stereo inverses here use)
      var phi = chi
      var i = 0
      while (i < 10) {
        val esin = e * math.sin(phi)
        phi = 2 * math.atan(math.tan(math.Pi / 4 + chi / 2) *
          math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 2
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Mercator 1SP (Snyder §7). */
  final case class Mercator1SP(ell: Ellipsoid, lon0Deg: Double, k0: Double,
      fe: Double, fn: Double) extends Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val esin = ell.e * math.sin(phi)
      (fe + ell.a * k0 * math.toRadians(lonDeg - lon0Deg),
        fn + ell.a * k0 * math.log(math.tan(math.Pi / 4 + phi / 2) *
          math.pow((1 - esin) / (1 + esin), ell.e / 2)))
    }
    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val t = math.exp(-(y0 - fn) / (ell.a * k0))
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 10) {
        val esin = ell.e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - esin) / (1 + esin), ell.e / 2))
        i += 1
      }
      (lon0Deg + math.toDegrees((x0 - fe) / (ell.a * k0)), math.toDegrees(phi))
    }
  }

  /** Oblique-aspect Lambert Azimuthal Equal-Area (Snyder §24). */
  /** Authalic q(φ) (Snyder 3-12) — shared by the equal-area projections. */
  private def authalicQ(ell: Ellipsoid, phi: Double): Double = {
    val esin = ell.e * math.sin(phi)
    (1 - ell.e2) * (math.sin(phi) / (1 - esin * esin) -
      (1 / (2 * ell.e)) * math.log((1 - esin) / (1 + esin)))
  }

  /** Authalic β → geodetic φ series (Snyder 3-18). */
  private def authalicBetaToPhi(ell: Ellipsoid, betaP: Double): Double = {
    val e2 = ell.e2; val e4 = e2 * e2; val e6 = e4 * e2
    betaP + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * betaP) +
      (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * betaP) +
      (761 * e6 / 45360) * math.sin(6 * betaP)
  }

  final case class Laea(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      fe: Double, fn: Double) extends Projection {
    private val lat0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)
    private def qOf(phi: Double): Double = authalicQ(ell, phi)
    private val qp = qOf(math.Pi / 2)
    private val q0 = qOf(lat0)
    private val beta0 = math.asin(q0 / qp)
    private val rq = ell.a * math.sqrt(qp / 2)
    // polar aspect (lat0 = ±90): the oblique D constant degenerates to
    // 0/0 there — Snyder's separate polar forms (24-23..25) apply
    private val polar = math.abs(lat0Deg) >= 90.0 - 1e-9
    private val north = lat0Deg > 0
    private val d = if (polar) Double.NaN else ell.a * (math.cos(lat0) /
      math.sqrt(1 - ell.e2 * math.pow(math.sin(lat0), 2))) / (rq * math.cos(beta0))

    private def betaToPhi(betaP: Double): Double = authalicBetaToPhi(ell, betaP)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      if (polar) {
        val q = qOf(phi)
        val rho = ell.a * math.sqrt(math.max(0.0, if (north) qp - q else qp + q))
        if (north) (fe + rho * math.sin(lam - lon0), fn - rho * math.cos(lam - lon0))
        else (fe + rho * math.sin(lam - lon0), fn + rho * math.cos(lam - lon0))
      } else {
        val beta = math.asin(qOf(phi) / qp)
        val b = rq * math.sqrt(2 / (1 + math.sin(beta0) * math.sin(beta) +
          math.cos(beta0) * math.cos(beta) * math.cos(lam - lon0)))
        (fe + b * d * math.cos(beta) * math.sin(lam - lon0),
          fn + (b / d) * (math.cos(beta0) * math.sin(beta) -
            math.sin(beta0) * math.cos(beta) * math.cos(lam - lon0)))
      }
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe; val y = y0 - fn
      if (polar) {
        val rho = math.hypot(x, y)
        if (rho < 1e-12) return (lon0Deg, lat0Deg)
        val r = rho / ell.a
        val q = if (north) qp - r * r else r * r - qp
        val betaP = math.asin(math.max(-1.0, math.min(1.0, q / qp)))
        val lam = if (north) lon0 + math.atan2(x, -y) else lon0 + math.atan2(x, y)
        var phi = betaToPhi(betaP)
        // series truncation leaves ~1e-8° at mid latitudes — the same
        // Newton-on-q(φ) polish as Cea (Snyder 3-16) lands ≤1e-12°
        if (math.abs(phi) < math.Pi / 2 - 1e-9) {
          val sinp = math.sin(phi)
          val den = 1 - ell.e2 * sinp * sinp
          phi += den * den / (2 * math.cos(phi) * (1 - ell.e2)) * (q - qOf(phi))
        }
        return (math.toDegrees(lam), math.toDegrees(phi))
      }
      val rho = math.sqrt(math.pow(x / d, 2) + math.pow(d * y, 2))
      if (rho < 1e-12) return (lon0Deg, lat0Deg)
      val ce = 2 * math.asin(rho / (2 * rq))
      val betaP = math.asin(math.cos(ce) * math.sin(beta0) +
        (d * y * math.sin(ce) * math.cos(beta0)) / rho)
      val lam = lon0 + math.atan2(x * math.sin(ce),
        d * rho * math.cos(beta0) * math.cos(ce) - d * d * y * math.sin(beta0) * math.sin(ce))
      (math.toDegrees(lam), math.toDegrees(betaToPhi(betaP)))
    }
  }

  /** Normal-aspect cylindrical equal-area, ellipsoidal form (Snyder §10,
    * EPSG method 9835 "Lambert Cylindrical Equal Area"): x scales by
    * k0 = cos φts / √(1 − e² sin² φts), y is the authalic ordinate
    * a·q/(2k0). NSIDC EASE-Grid 2.0 Global (EPSG:6933) is this with
    * φts = 30°. Inverse latitude via the authalic β series. */
  final case class Cea(ell: Ellipsoid, latTsDeg: Double, lon0Deg: Double,
      fe: Double, fn: Double) extends Projection {
    // k0 = cos φts/√(1−e²sin²φts) = 0 at a polar parallel: forward easting
    // collapses and the northing a·q/(2k0) divides by zero — fail loudly
    require(math.abs(latTsDeg) < 90 - 1e-9,
      s"cylindrical equal-area standard parallel lat_ts=$latTsDeg is " +
        "degenerate (k0 = cos 90° = 0)")
    private val lon0 = math.toRadians(lon0Deg)
    private val ts = math.toRadians(latTsDeg)
    private def qOf(phi: Double): Double = authalicQ(ell, phi)
    private val qp = qOf(math.Pi / 2)
    private val k0 = math.cos(ts) / math.sqrt(1 - ell.e2 * math.sin(ts) * math.sin(ts))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      var dlam = math.toRadians(lonDeg) - lon0
      while (dlam > math.Pi) dlam -= 2 * math.Pi
      while (dlam <= -math.Pi) dlam += 2 * math.Pi
      (fe + ell.a * k0 * dlam, fn + ell.a * qOf(phi) / (2 * k0))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val q = (y - fn) * 2 * k0 / ell.a
      val betaP = math.asin(math.max(-1.0, math.min(1.0, q / qp)))
      var phi = authalicBetaToPhi(ell, betaP)
      // the β series truncates at ~1e-8° — one Newton step on q(φ)
      // (Snyder 3-16; quadratic from the series seed) lands ≤1e-12°
      if (math.abs(phi) < math.Pi / 2 - 1e-9) {
        val sinp = math.sin(phi)
        val den = 1 - ell.e2 * sinp * sinp
        phi += den * den / (2 * math.cos(phi) * (1 - ell.e2)) * (q - qOf(phi))
      }
      (math.toDegrees(lon0 + (x - fe) / (ell.a * k0)), math.toDegrees(phi))
    }
  }

  /** Equidistant Cylindrical, EPSG method 1028 (ellipsoidal; the
    * spherical method 1029 reduces exactly when e² = 0): easting scales
    * the longitude by the standard parallel's parallel radius
    * ν₁·cos φ₁, northing is the meridian arc from the latitude of
    * origin — the world-map CRS family (EPSG 4087 "World Equidistant
    * Cylindrical", 4088 on the authalic sphere, Plate Carrée). */
  final case class Eqc(ell: Ellipsoid, lat1Deg: Double, lat0Deg: Double,
      lon0Deg: Double, fe: Double, fn: Double) extends Projection {
    // a polar standard parallel makes ν₁·cos φ₁ = 0: forward collapses
    // every easting to FE and the inverse divides by zero — fail loudly
    // (same policy as the degenerate equatorial lcc cone)
    require(math.abs(lat1Deg) < 90 - 1e-9,
      s"equidistant cylindrical standard parallel lat_ts=$lat1Deg is " +
        "degenerate (cos 90° = 0 collapses the easting axis)")
    private val lon0 = math.toRadians(lon0Deg)
    private val phi1 = math.toRadians(lat1Deg)
    private val sin1 = math.sin(phi1)
    private val nu1CosPhi1 =
      ell.a / math.sqrt(1 - ell.e2 * sin1 * sin1) * math.cos(phi1)
    private val m0 = meridianArc(ell, math.toRadians(lat0Deg))
    // rectifying-latitude inverse series (Snyder 3-26)
    private val e1 = {
      val t = math.sqrt(1 - ell.e2); (1 - t) / (1 + t)
    }
    private val mScale =
      ell.a * (1 - ell.e2 / 4 - 3 * ell.e2 * ell.e2 / 64 -
        5 * ell.e2 * ell.e2 * ell.e2 / 256)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      var dlam = math.toRadians(lonDeg) - lon0
      while (dlam > math.Pi) dlam -= 2 * math.Pi
      while (dlam <= -math.Pi) dlam += 2 * math.Pi
      (fe + nu1CosPhi1 * dlam,
        fn + meridianArc(ell, math.toRadians(latDeg)) - m0)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val mu = (y - fn + m0) / mScale
      val e1_2 = e1 * e1; val e1_3 = e1_2 * e1; val e1_4 = e1_2 * e1_2
      val phi = mu +
        (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
        (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
        (151 * e1_3 / 96) * math.sin(6 * mu) +
        (1097 * e1_4 / 512) * math.sin(8 * mu)
      (math.toDegrees(lon0 + (x - fe) / nu1CosPhi1), math.toDegrees(phi))
    }
  }

  /** Oblique (double) Stereographic, EPSG method 9809 (EPSG Guidance Note
    * 7-2): ellipsoid → conformal sphere → oblique stereographic. The
    * projection of the Dutch RD grid. */
  final case class ObliqueStereo(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      k0: Double, fe: Double, fn: Double) extends Projection {
    private val e = ell.e
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val sin0 = math.sin(phi0)
    private val rho0 = ell.a * (1 - ell.e2) / math.pow(1 - ell.e2 * sin0 * sin0, 1.5)
    private val nu0 = ell.a / math.sqrt(1 - ell.e2 * sin0 * sin0)
    private val bigR = math.sqrt(rho0 * nu0)
    private val n = math.sqrt(1 + ell.e2 * math.pow(math.cos(phi0), 4) / (1 - ell.e2))
    private val s1 = (1 + sin0) / (1 - sin0)
    private val s2 = (1 - e * sin0) / (1 + e * sin0)
    private val w1 = math.pow(s1 * math.pow(s2, e), n)
    private val sinChi00 = (w1 - 1) / (w1 + 1)
    private val c = (n + sin0) * (1 - sinChi00) / ((n - sin0) * (1 + sinChi00))
    private val w2 = c * w1
    private val chi0 = math.asin((w2 - 1) / (w2 + 1))
    private val sinChi0 = math.sin(chi0)
    private val cosChi0 = math.cos(chi0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      val bigLam = n * (lam - lam0) + lam0
      val sa = (1 + math.sin(phi)) / (1 - math.sin(phi))
      val sb = (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
      val w = c * math.pow(sa * math.pow(sb, e), n)
      val chi = math.asin((w - 1) / (w + 1))
      val dl = bigLam - lam0
      val b = 1 + math.sin(chi) * sinChi0 + math.cos(chi) * cosChi0 * math.cos(dl)
      (fe + 2 * bigR * k0 * math.cos(chi) * math.sin(dl) / b,
        fn + 2 * bigR * k0 * (math.sin(chi) * cosChi0 -
          math.cos(chi) * sinChi0 * math.cos(dl)) / b)
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val de = x0 - fe
      val dn = y0 - fn
      val g = 2 * bigR * k0 * math.tan(math.Pi / 4 - chi0 / 2)
      val h = 4 * bigR * k0 * math.tan(chi0) + g
      val i = math.atan2(de, h + dn)
      val j = math.atan2(de, g - dn) - i
      val chi = chi0 + 2 * math.atan((dn - de * math.tan(j / 2)) / (2 * bigR * k0))
      val bigLam = j + 2 * i + lam0
      val lam = (bigLam - lam0) / n + lam0
      // isometric latitude on the conformal sphere → geodetic φ by iteration
      val psi = 0.5 * math.log((1 + math.sin(chi)) / (c * (1 - math.sin(chi)))) / n
      var phi = 2 * math.atan(math.exp(psi)) - math.Pi / 2
      var k = 0
      while (k < 12) {
        val esin = e * math.sin(phi)
        val psiI = math.log(math.tan(phi / 2 + math.Pi / 4) *
          math.pow((1 - esin) / (1 + esin), e / 2))
        phi -= (psiI - psi) * math.cos(phi) * (1 - esin * esin) / (1 - ell.e2)
        k += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Oblique Mercator (Swiss / Rosenmund), EPSG method 9814 — proj's
    * `somerc`: ellipsoid → conformal sphere → rotated equatorial Mercator.
    * The projection of the Swiss LV03/LV95 grids. */
  final case class SwissOblique(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      k0: Double, fe: Double, fn: Double) extends Projection {
    private val e = ell.e
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val sin0 = math.sin(phi0)
    private val cc = math.sqrt(1 + ell.e2 * math.pow(math.cos(phi0), 4) / (1 - ell.e2))
    private val sinP0 = sin0 / cc // sin of the conformal-sphere latitude of origin
    private val phiP0 = math.asin(sinP0)
    private val cosP0 = math.cos(phiP0)
    private val bigK = math.log(math.tan(math.Pi / 4 + phiP0 / 2)) -
      cc * (math.log(math.tan(math.Pi / 4 + phi0 / 2)) -
        (e / 2) * math.log((1 + e * sin0) / (1 - e * sin0)))
    private val kR = ell.a * k0 * math.sqrt(1 - ell.e2) / (1 - ell.e2 * sin0 * sin0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      val esin = e * math.sin(phi)
      // geodetic → conformal sphere
      val s = cc * (math.log(math.tan(math.Pi / 4 + phi / 2)) -
        (e / 2) * math.log((1 + esin) / (1 - esin))) + bigK
      val phiC = 2 * math.atan(math.exp(s)) - math.Pi / 2
      val lamC = cc * (lam - lam0)
      // rotate so the origin sits on the (oblique) equator
      val sinPhi2 = cosP0 * math.sin(phiC) - sinP0 * math.cos(phiC) * math.cos(lamC)
      val phi2 = math.asin(sinPhi2)
      val lam2 = math.asin(math.cos(phiC) * math.sin(lamC) / math.cos(phi2))
      (fe + kR * lam2,
        fn + kR * math.log(math.tan(math.Pi / 4 + phi2 / 2)))
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val lam2 = (x0 - fe) / kR
      val phi2 = 2 * math.atan(math.exp((y0 - fn) / kR)) - math.Pi / 2
      // unrotate
      val sinPhiC = cosP0 * math.sin(phi2) + sinP0 * math.cos(phi2) * math.cos(lam2)
      val phiC = math.asin(sinPhiC)
      val lamC = math.asin(math.cos(phi2) * math.sin(lam2) / math.cos(phiC))
      val lam = lamC / cc + lam0
      // conformal sphere → geodetic by iteration
      val psi = math.log(math.tan(math.Pi / 4 + phiC / 2))
      val s = (psi - bigK) / cc // isometric latitude of the geodetic φ
      var phi = 2 * math.atan(math.exp(s)) - math.Pi / 2
      var k = 0
      while (k < 12) {
        val esin = e * math.sin(phi)
        val psiI = math.log(math.tan(phi / 2 + math.Pi / 4)) -
          (e / 2) * math.log((1 + esin) / (1 - esin))
        phi -= (psiI - s) * math.cos(phi) * (1 - esin * esin) / (1 - ell.e2)
        k += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Hotine Oblique Mercator (EPSG methods 9812 "variant A" and 9815
    * "variant B"), per the published EPSG Guidance Note 7-2 formulas —
    * the projection of SPCS83 Alaska zone 1 and the Borneo RSO grids.
    * Variant A references the false origin to the aposphere natural
    * origin (u,v) = (0,0); variant B reduces u by u_c so the false
    * coordinates apply at the projection centre. The variant-B worked
    * example from the guidance note (Timbalai 1948 / RSO Borneo) is
    * pinned in EpsgDbSpec. */
  final case class HotineOblique(ell: Ellipsoid, latCDeg: Double,
      lonCDeg: Double, azDeg: Double, gammaDeg: Double, k0: Double,
      fe: Double, fn: Double, variantB: Boolean) extends Projection {
    private val e = ell.e
    private val phiC = math.toRadians(latCDeg)
    private val lamC = math.toRadians(lonCDeg)
    private val alphaC = math.toRadians(azDeg)
    private val gammaC = math.toRadians(gammaDeg)
    private val sinC = math.sin(phiC)
    private val cosC = math.cos(phiC)
    private val bigB = math.sqrt(1 + ell.e2 * math.pow(cosC, 4) / (1 - ell.e2))
    private val bigA = ell.a * bigB * k0 * math.sqrt(1 - ell.e2) /
      (1 - ell.e2 * sinC * sinC)
    private val t0 = math.tan(math.Pi / 4 - phiC / 2) /
      math.pow((1 - e * sinC) / (1 + e * sinC), e / 2)
    private val bigD = math.max(1.0, bigB * math.sqrt(1 - ell.e2) /
      (cosC * math.sqrt(1 - ell.e2 * sinC * sinC)))
    private val sgn = if (phiC < 0) -1.0 else 1.0
    private val bigF = bigD + math.sqrt(bigD * bigD - 1) * sgn
    private val bigH = bigF * math.pow(t0, bigB)
    private val bigG = (bigF - 1 / bigF) / 2
    private val gamma0 = math.asin(math.sin(alphaC) / bigD)
    private val lam0 = lamC - math.asin(bigG * math.tan(gamma0)) / bigB
    private val uC =
      if (math.abs(math.abs(alphaC) - math.Pi / 2) < 1e-12) bigA * (lamC - lam0)
      else (bigA / bigB) * math.atan2(math.sqrt(bigD * bigD - 1),
        math.cos(alphaC)) * sgn
    private val uOff = if (variantB) math.abs(uC) * sgn else 0.0

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      val esin = e * math.sin(phi)
      val t = math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - esin) / (1 + esin), e / 2)
      val bigQ = bigH / math.pow(t, bigB)
      val bigS = (bigQ - 1 / bigQ) / 2
      val bigT = (bigQ + 1 / bigQ) / 2
      val bigV = math.sin(bigB * (lam - lam0))
      val bigU = (-bigV * math.cos(gamma0) + bigS * math.sin(gamma0)) / bigT
      val v = bigA * math.log((1 - bigU) / (1 + bigU)) / (2 * bigB)
      val u = bigA * math.atan2(bigS * math.cos(gamma0) + bigV * math.sin(gamma0),
        math.cos(bigB * (lam - lam0))) / bigB - uOff
      (v * math.cos(gammaC) + u * math.sin(gammaC) + fe,
        u * math.cos(gammaC) - v * math.sin(gammaC) + fn)
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val vP = (x0 - fe) * math.cos(gammaC) - (y0 - fn) * math.sin(gammaC)
      val uP = (y0 - fn) * math.cos(gammaC) + (x0 - fe) * math.sin(gammaC) + uOff
      val bigQ = math.exp(-bigB * vP / bigA)
      val bigS = (bigQ - 1 / bigQ) / 2
      val bigT = (bigQ + 1 / bigQ) / 2
      val bigV = math.sin(bigB * uP / bigA)
      val bigU = (bigV * math.cos(gamma0) + bigS * math.sin(gamma0)) / bigT
      val t = math.pow(bigH / math.sqrt((1 + bigU) / (1 - bigU)), 1 / bigB)
      // conformal-latitude inversion by fixed point (same scheme as the
      // other conformal projections here; converges far below 1e-12 rad)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 12) {
        val esin = e * math.sin(phi)
        phi = math.Pi / 2 -
          2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        i += 1
      }
      val lam = lam0 - math.atan2(bigS * math.cos(gamma0) - bigV * math.sin(gamma0),
        math.cos(bigB * uP / bigA)) / bigB
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Krovak oblique conformal conic (EPSG method 9819) in its East-North
    * orientation (EPSG 5514 axis convention: E = −westing, N = −southing,
    * so Czech/Slovak coordinates are negative). `lon0Deg` is the origin
    * longitude referenced to GREENWICH (24°50′E for S-JTSK — the
    * registry's Ferro-referenced variant of the same origin is 42°30′,
    * Ferro being 17°40′ west of Greenwich; passing the Ferro value here
    * would double-shift). Validated against the published worked example
    * for method 9819 (50°12′32.4416″N 16°50′59.1790″E → southing
    * 1050538.63 m, westing 568991.00 m; EpsgDbSpec anchor). */
  final case class Krovak(ell: Ellipsoid, latCDeg: Double, lon0Deg: Double,
      alphaDeg: Double, latPDeg: Double, k0: Double) extends Projection {
    private val e = ell.e
    private val phiC = math.toRadians(latCDeg)
    private val lam0 = math.toRadians(lon0Deg)
    private val alpha = math.toRadians(alphaDeg)
    private val phiP = math.toRadians(latPDeg)
    private val sinC = math.sin(phiC)
    private val bigA = ell.a * math.sqrt(1 - ell.e2) / (1 - ell.e2 * sinC * sinC)
    private val bigB = math.sqrt(1 + ell.e2 * math.pow(math.cos(phiC), 4) / (1 - ell.e2))
    private val gamma0 = math.asin(sinC / bigB)
    private val t0 = math.tan(math.Pi / 4 + gamma0 / 2) *
      math.pow((1 + e * sinC) / (1 - e * sinC), e * bigB / 2) /
      math.pow(math.tan(math.Pi / 4 + phiC / 2), bigB)
    private val n = math.sin(phiP)
    private val r0 = k0 * bigA / math.tan(phiP)
    private val tanPn = math.pow(math.tan(math.Pi / 4 + phiP / 2), n)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      val esin = e * math.sin(phi)
      val u = 2 * (math.atan(t0 * math.pow(math.tan(phi / 2 + math.Pi / 4), bigB) *
        math.pow((1 - esin) / (1 + esin), e * bigB / 2)) - math.Pi / 4)
      val v = bigB * (lam0 - lam)
      val t = math.asin(math.cos(alpha) * math.sin(u) +
        math.sin(alpha) * math.cos(u) * math.cos(v))
      val d = math.asin(math.cos(u) * math.sin(v) / math.cos(t))
      val theta = n * d
      val r = r0 * tanPn / math.pow(math.tan(t / 2 + math.Pi / 4), n)
      val southing = r * math.cos(theta)
      val westing = r * math.sin(theta)
      (-westing, -southing)
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val westing = -x0
      val southing = -y0
      val r = math.hypot(southing, westing)
      val theta = math.atan2(westing, southing)
      val d = theta / n
      val t = 2 * (math.atan(math.pow(r0 / r, 1.0 / n) *
        math.tan(math.Pi / 4 + phiP / 2)) - math.Pi / 4)
      val u = math.asin(math.cos(alpha) * math.sin(t) -
        math.sin(alpha) * math.cos(t) * math.cos(d))
      val v = math.asin(math.cos(t) * math.sin(d) / math.cos(u))
      var phi = u
      var i = 0
      while (i < 12) {
        val esin = e * math.sin(phi)
        phi = 2 * (math.atan(math.pow(t0, -1.0 / bigB) *
          math.pow(math.tan(u / 2 + math.Pi / 4), 1.0 / bigB) *
          math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 4)
        i += 1
      }
      (math.toDegrees(lam0 - v / bigB), math.toDegrees(phi))
    }
  }

  /** New Zealand Map Grid (EPSG method 9811; the projection of EPSG
    * 27200): the DOSLI/LINZ sixth-degree complex-polynomial conformal
    * projection on International 1924 (NZGD49 datum), natural origin
    * 41°S 173°E, published false origin (2510000, 6023150).
    *
    * Published series (LINZ NZMG definition — the same coefficient set
    * appears verbatim in every public implementation): a 10-term real
    * series maps Δφ (in units of 10⁵ arc-seconds) to the conformal
    * ordinate ψ, then a 6-term complex series maps z = ψ + i·Δλ (Δλ in
    * radians) to grid coordinates θ with E = FE + a·Im θ,
    * N = FN + a·Re θ. Any polynomial in z is holomorphic, so
    * conformality is automatic; correctness of the φ→ψ series is pinned
    * by EpsgDbSpec's directional-scale-equality check (meridian vs
    * parallel scale must agree, which fails if the series is not the
    * isometric-latitude expansion), and overall scale by the
    * near-origin scale anchor.
    *
    * Inverse: the published seed series C (θ→z) refined by Newton on
    * the forward complex polynomial, then the published ψ→Δφ series D
    * refined by Newton on the forward real series — forward/inverse are
    * exact fp inverses regardless of the seed series' truncation. */
  /** American Polyconic (EPSG method 9818, Snyder §18 ellipsoidal
    * forward) — the projection of the Brazilian national Polyconic
    * grids. Each parallel is projected true-to-scale along its own
    * cone, so the projection is neither conformal nor equal-area; the
    * inverse is a damped 2-D Newton iteration on the forward (the same
    * polish-the-closed-seed approach as the EASE cylindrical inverse),
    * converging below 1e-12 rad in a handful of steps over the
    * continental domain. */
  final case class Polyconic(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      fe: Double, fn: Double) extends Projection {
    private val e2 = ell.e2
    private val lam0 = math.toRadians(lon0Deg)
    private val m0 = meridianArc(ell, math.toRadians(lat0Deg))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      if (math.abs(phi) < 1e-12)
        (fe + ell.a * (lam - lam0), fn - m0)
      else {
        val sinP = math.sin(phi)
        val n = ell.a / math.sqrt(1 - e2 * sinP * sinP)
        val ePrime = (lam - lam0) * sinP
        val cot = math.cos(phi) / sinP
        (fe + n * cot * math.sin(ePrime),
          fn + meridianArc(ell, phi) - m0 + n * cot * (1 - math.cos(ePrime)))
      }
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      // seed from the spherical picture: the meridian arc gives the
      // latitude scale, the parallel radius the longitude scale
      var phi = (y0 - fn + m0) / (ell.a * (1 - e2 / 4))
      phi = math.max(-1.55, math.min(1.55, phi))
      var lam = lam0 + (x0 - fe) /
        (ell.a * math.max(0.05, math.cos(phi)))
      var i = 0
      while (i < 40) {
        val (fx, fy) = forwardRad(lam, phi)
        val rx = fx - x0
        val ry = fy - y0
        if (math.abs(rx) < 1e-9 && math.abs(ry) < 1e-9) i = 40
        else {
          // Jacobian by central differences (the forward is cheap)
          val h = 1e-7
          val (fxl, fyl) = forwardRad(lam + h, phi)
          val (fxl2, fyl2) = forwardRad(lam - h, phi)
          val (fxp, fyp) = forwardRad(lam, phi + h)
          val (fxp2, fyp2) = forwardRad(lam, phi - h)
          val j11 = (fxl - fxl2) / (2 * h); val j12 = (fxp - fxp2) / (2 * h)
          val j21 = (fyl - fyl2) / (2 * h); val j22 = (fyp - fyp2) / (2 * h)
          val det = j11 * j22 - j12 * j21
          lam -= (rx * j22 - ry * j12) / det
          phi -= (ry * j11 - rx * j21) / det
          i += 1
        }
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }

    private def forwardRad(lam: Double, phi: Double): (Double, Double) = {
      val (x, y) = forward(math.toDegrees(lam), math.toDegrees(phi))
      (x, y)
    }
  }

  final case class Nzmg(fe: Double, fn: Double) extends Projection {
    val ell: Ellipsoid = Intl1924
    private val lam0 = math.toRadians(173.0)
    private val A = Array(0.6399175073, -0.1358797613, 0.063294409,
      -0.02526853, 0.0117879, -0.0055161, 0.0026906, -0.001333,
      0.00067, -0.00034)
    private val Bre = Array(0.7557853228, 0.249204646, -0.001541739,
      -0.10162907, -0.26623489, -0.6870983)
    private val Bim = Array(0.0, 0.003371507, 0.041058560, 0.01727609,
      -0.36249218, -1.1651967)
    private val Cre = Array(1.3231270439, -0.577245789, 0.508307513,
      -0.15094762, 1.01418179, 1.9660549)
    private val Cim = Array(0.0, -0.007809598, -0.112208952, 0.18200602,
      1.64497696, 2.5127645)
    private val D = Array(1.5627014243, 0.5185406398, -0.03333098,
      -0.1052906, -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013)

    /** Σ_{m=1..n} c_m x^m (real Horner; c(0) = c_1). */
    private def rpoly(c: Array[Double], x: Double): Double = {
      var s = 0.0; var i = c.length - 1
      while (i >= 0) { s = s * x + c(i); i -= 1 }
      s * x
    }
    /** d/dx Σ_{m=1..n} c_m x^m. */
    private def rpolyD(c: Array[Double], x: Double): Double = {
      var s = 0.0; var i = c.length - 1
      while (i >= 0) { s = s * x + (i + 1) * c(i); i -= 1 }
      s
    }
    /** Σ_{m=1..n} c_m z^m (complex Horner). */
    private def cpoly(cre: Array[Double], cim: Array[Double],
        zr: Double, zi: Double): (Double, Double) = {
      var sr = 0.0; var si = 0.0; var i = cre.length - 1
      while (i >= 0) {
        val tr = sr * zr - si * zi + cre(i)
        si = sr * zi + si * zr + cim(i); sr = tr
        i -= 1
      }
      (sr * zr - si * zi, sr * zi + si * zr)
    }

    /** Δφ in the series' unit: 10⁵ arc-seconds from φ0 = −41°. */
    private def dphiOf(latDeg: Double): Double = (latDeg + 41.0) * 0.036

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val psi = rpoly(A, dphiOf(latDeg))
      val dlam = math.toRadians(lonDeg) - lam0
      val (tr, ti) = cpoly(Bre, Bim, psi, dlam)
      (fe + ell.a * ti, fn + ell.a * tr)
    }

    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val wr = (y0 - fn) / ell.a // θ' (grid, a-scaled): real ↔ northing
      val wi = (x0 - fe) / ell.a
      var (zr, zi) = cpoly(Cre, Cim, wr, wi)
      // Newton on θ(z) = θ': z ← (θ' + Σ(m−1)B_m z^m) / (Σ m B_m z^{m−1})
      var it = 0
      while (it < 3) {
        // num = θ' + z²·Σ_{m=2..6}(m−1) B_m z^{m−2}; den = Σ m B_m z^{m−1}
        var nr = 0.0; var ni = 0.0; var dr = 0.0; var di = 0.0
        var i = 5
        while (i >= 0) {
          val t1 = dr * zr - di * zi + (i + 1) * Bre(i)
          di = dr * zi + di * zr + (i + 1) * Bim(i); dr = t1
          if (i >= 1) {
            val t2 = nr * zr - ni * zi + i * Bre(i)
            ni = nr * zi + ni * zr + i * Bim(i); nr = t2
          }
          i -= 1
        }
        // nr+i·ni currently = Σ(m−1)B_m z^{m−2}; multiply by z²
        val z2r = zr * zr - zi * zi; val z2i = 2 * zr * zi
        val numR = wr + (nr * z2r - ni * z2i)
        val numI = wi + (nr * z2i + ni * z2r)
        val dd = dr * dr + di * di
        zr = (numR * dr + numI * di) / dd
        zi = (numI * dr - numR * di) / dd
        it += 1
      }
      // ψ → Δφ: published seed series D, then Newton on the forward series
      var dphi = rpoly(D, zr)
      var j = 0
      while (j < 3) {
        dphi -= (rpoly(A, dphi) - zr) / rpolyD(A, dphi)
        j += 1
      }
      (math.toDegrees(lam0 + zi), dphi / 0.036 - 41.0)
    }
  }

  // ---------------------------------------------------------------- registry

  final case class Crs(proj: Projection, shift: Option[Helmert], name: String)

  private def noShift(p: Projection, name: String): (Projection, Option[Helmert], String) =
    (p, None, name)

  /** Published Helmert parameters (position vector, to WGS84). */
  private val Osgb36 = Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
  private val Tm65 = Helmert(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15)
  private val Dhdn = Helmert(598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
  private val Ed50 = Helmert(-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)
  private val Bd72 = Helmert(-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747)
  private val Amersfoort = Helmert(565.2369, 50.0087, 465.658, -0.406857, 0.350733, -1.87035, 4.0812)
  private val Ch1903 = Helmert(674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)
  private val Ntf = Helmert(-168.0, -60.0, 320.0, 0.0, 0.0, 0.0, 0.0)
  private val Nad27 = Helmert(-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0)
  private val Sjtsk = Helmert(589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0)
  private val Hd72 = Helmert(52.17, -71.82, -14.9, 0.0, 0.0, 0.0, 0.0)
  private val Mgi = Helmert(577.326, 90.129, 463.919, 5.137, 1.474, 5.297, 2.4232)
  // LINZ's published NZGD49 → NZGD2000 7-parameter transform (NZGD2000
  // coincident with WGS84 at our tolerance), position vector
  private val Nzgd49 = Helmert(59.47, -5.04, 187.44, 0.47, -0.10, 1.024, -4.5993)
  private val Pulkovo42 = Helmert(28.0, -130.0, -95.0, 0.0, 0.0, 0.0, 0.0)
  // EPSG tfm "GGRS87 to WGS 84 (1)": pure geocentric translation
  private val Ggrs87 = Helmert(-199.87, 74.79, 246.62, 0.0, 0.0, 0.0, 0.0)
  // EPSG tfm "Monte Mario to WGS 84 (4)" (IGM95, peninsular Italy),
  // position vector
  private val MonteMario = Helmert(-104.1, -49.1, -9.9, 0.971, -2.917, 0.714, -11.68)
  // EPSG tfm "Timbalai 1948 to WGS 84 (1)": geocentric translation
  private val Timbalai = Helmert(-679.0, 669.0, -48.0, 0.0, 0.0, 0.0, 0.0)
  // EPSG tfm "SAD69 to WGS 84 (1)": geocentric translation
  private val Sad69 = Helmert(-57.0, 1.0, -41.0, 0.0, 0.0, 0.0, 0.0)
  // EPSG tfm "Tokyo to WGS 84 (1)": geocentric translation
  private val TokyoDatum = Helmert(-148.0, 507.0, 685.0, 0.0, 0.0, 0.0, 0.0)
  // EPSG tfm "WGS 72 to WGS 84 (1)" / "WGS 72BE to WGS 84 (1)":
  // position-vector with z-rotation + scale
  private val Wgs72 = Helmert(0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.2263)
  private val Wgs72be = Helmert(0.0, 0.0, 1.9, 0.0, 0.0, 0.814, -0.38)

  val table: Map[Int, Crs] = {
    val b = Map.newBuilder[Int, Crs]
    def add(code: Int, e: (Projection, Option[Helmert], String)): Unit =
      b += code -> Crs(e._1, e._2, e._3)

    // geographic 2D CRSs on datums coincident with WGS84 at our tolerance
    add(4258, noShift(Geographic(GRS80), "ETRS89"))
    add(4269, noShift(Geographic(GRS80), "NAD83"))
    add(4283, noShift(Geographic(GRS80), "GDA94"))
    add(4171, noShift(Geographic(GRS80), "RGF93 v1"))
    add(4619, noShift(Geographic(GRS80), "SWEREF99"))
    add(4167, noShift(Geographic(GRS80), "NZGD2000"))
    // geographic CRSs with a datum shift
    add(4277, (Geographic(Airy1830), Some(Osgb36), "OSGB36"))
    add(4230, (Geographic(Intl1924), Some(Ed50), "ED50"))
    add(4314, (Geographic(Bessel1841), Some(Dhdn), "DHDN"))
    add(4313, (Geographic(Intl1924), Some(Bd72), "BD72"))
    add(4299, (Geographic(AiryModified), Some(Tm65), "TM65"))

    // NB: WGS84 UTM (326xx/327xx), 3857, 3395, 3035, 3413/3031, 3978 and
    // friends live on CrsImpl's original closed-form path (checked before
    // this table) — they are deliberately NOT duplicated here.

    // ETRS89 / UTM zones 28N-38N
    for (z <- 28 to 38)
      add(25800 + z, noShift(TMerc(GRS80, 0, -183 + 6 * z, 0.9996, 500000, 0),
        s"ETRS89 / UTM zone ${z}N"))
    // NAD83 / UTM zones 1N-23N
    for (z <- 1 to 23)
      add(26900 + z, noShift(TMerc(GRS80, 0, -183 + 6 * z, 0.9996, 500000, 0),
        s"NAD83 / UTM zone ${z}N"))
    // GDA94 / MGA zones 48-58
    for (z <- 48 to 58)
      add(28300 + z, noShift(TMerc(GRS80, 0, -183 + 6 * z, 0.9996, 500000, 10000000),
        s"GDA94 / MGA zone $z"))
    // ED50 / UTM zones 28N-38N (International 1924 + 3-param shift)
    for (z <- 28 to 38)
      add(23000 + z, (TMerc(Intl1924, 0, -183 + 6 * z, 0.9996, 500000, 0),
        Some(Ed50), s"ED50 / UTM zone ${z}N"))
    // DHDN / 3-degree Gauss-Krüger zones 2-5
    for (z <- 2 to 5)
      add(31464 + z, (TMerc(Bessel1841, 0, 3 * z, 1.0, z * 1e6 + 500000, 0),
        Some(Dhdn), s"DHDN / 3-degree Gauss-Kruger zone $z"))

    // national TM grids
    add(27700, (TMerc(Airy1830, 49, -2, 0.9996012717, 400000, -100000),
      Some(Osgb36), "OSGB36 / British National Grid"))
    add(2157, noShift(TMerc(GRS80, 53.5, -8, 0.99982, 600000, 750000),
      "IRENET95 / Irish Transverse Mercator"))
    add(29902, (TMerc(AiryModified, 53.5, -8, 1.000035, 200000, 250000),
      Some(Tm65), "TM65 / Irish Grid"))
    add(29903, (TMerc(AiryModified, 53.5, -8, 1.000035, 200000, 250000),
      Some(Tm65), "TM75 / Irish Grid"))
    add(2193, noShift(TMerc(GRS80, 0, 173, 0.9996, 1600000, 10000000),
      "NZGD2000 / New Zealand Transverse Mercator 2000"))
    add(2180, noShift(TMerc(GRS80, 0, 19, 0.9993, 500000, -5300000),
      "ETRF2000-PL / CS92"))
    add(3006, noShift(TMerc(GRS80, 0, 15, 0.9996, 500000, 0),
      "SWEREF99 TM"))

    // RGF93 / CC42-CC50 (France 9-zone conic system)
    for (z <- 42 to 50)
      add(3900 + z, noShift(
        Lcc2SP(GRS80, z - 0.75, z + 0.75, z, 3, 1700000, (z - 42) * 1e6 + 1200000),
        s"RGF93 v1 / CC$z"))
    // Belgian Lambert 72
    add(31370, (Lcc2SP(Intl1924, 51.16666723333333, 49.8333339, 90, 4.367486666666666,
      150000.013, 5400088.438), Some(Bd72), "BD72 / Belgian Lambert 72"))
    // NAD83 / California Albers (SPCS California zones live in the
    // comprehensive State Plane table below)
    add(3310, noShift(AlbersConic(GRS80, 34, 40.5, 0, -120, 0, -4000000),
      "NAD83 / California Albers"))
    // Canadian Albers systems
    add(3005, noShift(AlbersConic(GRS80, 50, 58.5, 45, -126, 1000000, 0),
      "NAD83 / BC Albers"))
    add(3578, noShift(AlbersConic(GRS80, 61.0 + 40.0 / 60, 68, 59, -132.5, 500000, 500000),
      "NAD83 / Yukon Albers"))

    // polar CRSs
    add(3976, noShift(PolarStereo(WGS84, north = false, 0, -70, Double.NaN, 0, 0),
      "WGS 84 / NSIDC Sea Ice Polar Stereographic South"))
    add(3995, noShift(PolarStereo(WGS84, north = true, 0, 71, Double.NaN, 0, 0),
      "WGS 84 / Arctic Polar Stereographic"))
    add(32661, noShift(PolarStereo(WGS84, north = true, 0, Double.NaN, 0.994, 2000000, 2000000),
      "WGS 84 / UPS North (N,E)"))
    add(32761, noShift(PolarStereo(WGS84, north = false, 0, Double.NaN, 0.994, 2000000, 2000000),
      "WGS 84 / UPS South (N,E)"))

    // Pacific-centered Mercator
    add(3832, noShift(Mercator1SP(WGS84, 150, 1.0, 0, 0),
      "WGS 84 / PDC Mercator"))

    // France: Lambert-93 (the modern national grid) + the four NTF
    // Lambert zones (LCC-1SP on Clarke 1880 IGN, Paris prime meridian —
    // lon0 below is the Paris meridian expressed from Greenwich)
    add(2154, noShift(Lcc2SP(GRS80, 44, 49, 46.5, 3, 700000, 6600000),
      "RGF93 v1 / Lambert-93"))
    val parisFromGreenwich = 2.0 + 20.0 / 60 + 14.025 / 3600
    add(4275, (Geographic(Clarke1880IGN), Some(Ntf), "NTF"))
    val ntfZones = Seq(
      (27571, 49.5, 0.999877341, 600000.0, 1200000.0, "I"),
      (27572, 46.8, 0.99987742, 600000.0, 2200000.0, "II"),
      (27573, 44.1, 0.999877499, 600000.0, 3200000.0, "III"),
      (27574, 42.165, 0.99994471, 234.358, 4185861.369, "IV"))
    ntfZones.foreach { case (code, lat0, k0, fe, fn, z) =>
      add(code, (Lcc1SP(Clarke1880IGN, lat0, parisFromGreenwich, k0, fe, fn),
        Some(Ntf), s"NTF (Paris) / Lambert zone $z (carto)"))
      // plain (non-carto) zone: same cone, northing minus zone·10⁶
      // (EPSG names zones I-III "<region> France", Corse without it)
      val plainName = Map("I" -> "Nord France", "II" -> "Centre France",
        "III" -> "Sud France", "IV" -> "Corse")(z)
      add(code - 10, (Lcc1SP(Clarke1880IGN, lat0, parisFromGreenwich, k0, fe,
        fn - (code - 27570) * 1e6),
        Some(Ntf), s"NTF (Paris) / Lambert $plainName"))
    }
    // continental equal-area / statistical grids
    add(5070, noShift(AlbersConic(GRS80, 29.5, 45.5, 23, -96, 0, 0),
      "NAD83 / Conus Albers"))
    add(3577, noShift(AlbersConic(GRS80, -18, -36, 0, 132, 0, 0),
      "GDA94 / Australian Albers"))
    add(3347, noShift(Lcc2SP(GRS80, 49, 77, 63.390675, -91.86666666666667,
      6200000, 3000000), "NAD83 / Statistics Canada Lambert"))
    // national TM grids (contd.)
    add(3067, noShift(TMerc(GRS80, 0, 27, 0.9996, 500000, 0),
      "ETRS89 / TM35FIN(E,N)"))
    add(5179, noShift(TMerc(GRS80, 38, 127.5, 0.9996, 1000000, 2000000),
      "Korea 2000 / Unified CS"))
    // GDA2020 (coincident with WGS84 at our tolerance, like GDA94)
    add(7844, noShift(Geographic(GRS80), "GDA2020"))
    for (z <- 46 to 59)
      add(7800 + z, noShift(TMerc(GRS80, 0, -183 + 6 * z, 0.9996, 500000, 10000000),
        s"GDA2020 / MGA zone $z"))
    // JGD2011 / Japan Plane Rectangular CS I-XIX (TM, k0 = 0.9999,
    // zero false origin; JGD2011 coincident with WGS84 at our tolerance)
    val jgdRoman = Seq("I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX",
      "X", "XI", "XII", "XIII", "XIV", "XV", "XVI", "XVII", "XVIII", "XIX")
    val jgdZones = Seq(
      (33.0, 129.5), (33.0, 131.0), (36.0, 132.0 + 10.0 / 60), (33.0, 133.5),
      (36.0, 134.0 + 20.0 / 60), (36.0, 136.0), (36.0, 137.0 + 10.0 / 60),
      (36.0, 138.5), (36.0, 139.0 + 50.0 / 60), (40.0, 140.0 + 50.0 / 60),
      (44.0, 140.25), (44.0, 142.25), (44.0, 144.25), (26.0, 142.0),
      (26.0, 127.5), (26.0, 124.0), (26.0, 131.0), (20.0, 136.0), (26.0, 154.0))
    jgdZones.zipWithIndex.foreach { case ((lat0, lon0), i) =>
      add(6669 + i, noShift(TMerc(GRS80, lat0, lon0, 0.9999, 0, 0),
        s"JGD2011 / Japan Plane Rectangular CS ${jgdRoman(i)}"))
    }
    // Pulkovo 1942 (Krassowsky 1940) + the 6-degree Gauss-Krüger zones
    // covering the former-USSR mapping series; the classic published
    // 3-parameter geocentric translation (EPSG tfm "Pulkovo 1942 to
    // WGS 84 (1)") — grid-based refinements are out of scope offline,
    // same caveat as NAD27
    add(4284, (Geographic(Krassowsky1940), Some(Pulkovo42), "Pulkovo 1942"))
    for (z <- 4 to 32)
      add(28400 + z, (TMerc(Krassowsky1940, 0, 6 * z - 3, 1.0, z * 1e6 + 500000, 0),
        Some(Pulkovo42), s"Pulkovo 1942 / Gauss-Kruger zone $z"))
    // NAD83 / MTM zones 1-10 (eastern Canada 3-degree TM, false easting
    // 304800 m = 1,000,000 ft)
    val mtmLon0 = Seq(-53.0, -56.0, -58.5, -61.5, -64.5,
      -67.5, -70.5, -73.5, -76.5, -79.5)
    mtmLon0.zipWithIndex.foreach { case (lon0, i) =>
      add(32181 + i, noShift(TMerc(GRS80, 0, lon0, 0.9999, 304800, 0),
        s"NAD83 / MTM zone ${i + 1}"))
    }

    // NAD27 (Clarke 1866; single-Helmert fallback — the same meter-level
    // transform proj applies without NADCON grid files). The UTM zone
    // loop lives once, in the r10 tranche below (zones 1N-22N).
    add(4267, (Geographic(Clarke1866), Some(Nad27), "NAD27"))

    // Czech + Slovak S-JTSK (Krovak oblique conformal conic on Bessel,
    // East-North axis variant; origin longitude 24°50' E Greenwich
    // = 42°30' east of Ferro)
    add(5514, (Krovak(Bessel1841, 49.5, 24.0 + 50.0 / 60,
      30.0 + 17.0 / 60 + 17.3031 / 3600, 78.5, 0.9999),
      Some(Sjtsk), "S-JTSK / Krovak East North"))
    add(4156, (Geographic(Bessel1841), Some(Sjtsk), "S-JTSK"))
    // Hungarian EOV: the same oblique-cylindric double projection as the
    // Swiss grids, on GRS 1967 (HD72 datum)
    add(23700, (SwissOblique(Grs67, 47.14439372222222, 19.04857177777778,
      0.99993, 650000, 200000), Some(Hd72), "HD72 / EOV"))
    add(4237, (Geographic(Grs67), Some(Hd72), "HD72"))
    // Austria Lambert (MGI on Bessel, 7-parameter shift)
    add(31287, (Lcc2SP(Bessel1841, 49, 46, 47.5, 13.0 + 20.0 / 60,
      400000, 400000), Some(Mgi), "MGI / Austria Lambert"))
    add(4312, (Geographic(Bessel1841), Some(Mgi), "MGI"))
    // Austria Gauss-Krüger strips: central meridians 28°/31°/34° east of
    // FERRO (17°40' west of Greenwich) → 10°20'/13°20'/16°20' E; k0 = 1,
    // northings reduced by 5 000 000 m. The GK triplet has no false
    // easting; the Bundesmeldenetz M28/M31/M34 add 150/450/750 km.
    val ferroE = Seq(10.0 + 20.0 / 60, 13.0 + 20.0 / 60, 16.0 + 20.0 / 60)
    val gkNames = Seq("West", "Central", "East")
    ferroE.zipWithIndex.foreach { case (lon0, i) =>
      add(31254 + i, (TMerc(Bessel1841, 0, lon0, 1.0, 0, -5000000),
        Some(Mgi), s"MGI / Austria GK ${gkNames(i)}"))
      add(31284 + i, (TMerc(Bessel1841, 0, lon0, 1.0, 150000 + i * 300000, -5000000),
        Some(Mgi), s"MGI / Austria M${28 + 3 * i}"))
    }

    // Norway: ETRS89 / NTM zones 5-30 (TM, k0 = 1, half-degree central
    // meridians — the construction-survey grids)
    for (z <- 5 to 30)
      add(5100 + z, noShift(TMerc(GRS80, 58, z + 0.5, 1.0, 100000, 1000000),
        s"ETRS89 / NTM zone $z"))
    // Baltic national grids (ETRS89-family datums, coincident at our
    // tolerance): Estonia 1997 LCC, Latvia LKS92 TM, Lithuania LKS94 TM
    add(3301, noShift(Lcc2SP(GRS80, 59.0 + 20.0 / 60, 58.0,
      57.0 + 31.0 / 60 + 3.19415 / 3600, 24.0, 500000, 6375000),
      "Estonian Coordinate System of 1997"))
    add(3059, noShift(TMerc(GRS80, 0, 24, 0.9996, 500000, -6000000),
      "LKS92 / Latvia TM"))
    add(3346, noShift(TMerc(GRS80, 0, 24, 0.9998, 500000, 0),
      "LKS94 / Lithuania TM"))
    // Denmark: ETRS89 / DKTM1-4
    val dktm = Seq((4093, 9.0, 200000.0), (4094, 10.0, 400000.0),
      (4095, 11.75, 600000.0), (4096, 15.0, 800000.0))
    dktm.zipWithIndex.foreach { case ((code, lon0, fe), i) =>
      add(code, noShift(TMerc(GRS80, 0, lon0, 0.99998, fe, -5000000),
        s"ETRS89 / DKTM${i + 1}"))
    }

    // New Zealand NZGD49: geographic + the Map Grid (complex-series
    // conformal, EPSG method 9811)
    add(4272, (Geographic(Intl1924), Some(Nzgd49), "NZGD49"))
    add(27200, (Nzmg(2510000, 6023150), Some(Nzgd49),
      "NZGD49 / New Zealand Map Grid"))

    // SIRGAS 2000 (GRS80, coincident with WGS84 at our tolerance) and its
    // Brazilian UTM south zones
    add(4674, noShift(Geographic(GRS80), "SIRGAS 2000"))
    for (z <- 17 to 25)
      add(31960 + z, noShift(TMerc(GRS80, 0, -183 + 6 * z, 0.9996, 500000, 10000000),
        s"SIRGAS 2000 / UTM zone ${z}S"))
    // Brazilian national Polyconic grids (EPSG method 9818): the modern
    // SIRGAS 2000 frame (shift-free) and the legacy SAD69 one
    add(5880, noShift(Polyconic(GRS80, 0, -54, 5000000, 10000000),
      "SIRGAS 2000 / Brazil Polyconic"))
    add(29101, (Polyconic(Grs67, 0, -54, 5000000, 10000000),
      Some(Sad69), "SAD69 / Brazil Polyconic"))
    add(4618, (Geographic(Grs67), Some(Sad69), "SAD69"))
    // NAD27 / UTM zones 1N-22N (Clarke 1866 + the published NAD27 mean
    // translation — the frame of most legacy US federal data)
    for (z <- 1 to 22)
      add(26700 + z, (TMerc(Clarke1866, 0, -183 + 6 * z, 0.9996, 500000, 0),
        Some(Nad27), s"NAD27 / UTM zone ${z}N"))

    // US State Plane Coordinate System of 1983 — the COMPLETE zone set.
    // Parameters are the published SPCS83 definition (NOAA Manual NOS
    // NGS 5 appendix A) as carried in the EPSG registry; NAD83 is
    // WGS84-coincident at this engine's tolerance, so every zone is
    // shift-free. Working variants in US survey feet ("ftUS",
    // 1200/3937 m exactly) or international feet ("ft", 0.3048 m)
    // reuse the metre projection via UnitScaled — the same grid
    // re-expressed; the specs pin the metre/foot twins against each
    // other and geo_crs7 round-trips every family through the oracle.
    val ftUS = 1200.0 / 3937.0 // US survey foot in metres, exact
    val ftI = 0.3048 // international foot in metres, exact
    def ft(code: Int, m: Crs): Unit =
      b += code -> Crs(UnitScaled(m.proj, ftUS), m.shift, m.name + " (ftUS)")
    def fti(code: Int, m: Crs): Unit =
      b += code -> Crs(UnitScaled(m.proj, ftI), m.shift, m.name + " (ft)")
    def dm(d: Int, min: Int): Double = d + min / 60.0

    // Lambert Conformal Conic 2SP zones:
    // (metreCode, footCode [0 = registry defines none], internationalFoot?,
    //  zone, latN, latS, lat0, lon0, FE m, FN m)
    val spLcc: Seq[(Int, Int, Boolean, String, Double, Double, Double, Double, Double, Double)] = Seq(
      (26940, 0, false, "Alaska zone 10", dm(53, 50), dm(51, 50), 51.0, -176.0, 1000000.0, 0.0),
      (26941, 2225, false, "California zone 1", dm(41, 40), 40.0, dm(39, 20), -122.0, 2000000.0, 500000.0),
      (26942, 2226, false, "California zone 2", dm(39, 50), dm(38, 20), dm(37, 40), -122.0, 2000000.0, 500000.0),
      (26943, 2227, false, "California zone 3", dm(38, 26), dm(37, 4), 36.5, -120.5, 2000000.0, 500000.0),
      (26944, 2228, false, "California zone 4", dm(37, 15), 36.0, dm(35, 20), -119.0, 2000000.0, 500000.0),
      (26945, 2229, false, "California zone 5", dm(35, 28), dm(34, 2), 33.5, -118.0, 2000000.0, 500000.0),
      (26946, 2230, false, "California zone 6", dm(33, 53), dm(32, 47), dm(32, 10), -116.25, 2000000.0, 500000.0),
      (26951, 3433, false, "Arkansas North", dm(36, 14), dm(34, 56), dm(34, 20), -92.0, 400000.0, 0.0),
      (26952, 3434, false, "Arkansas South", dm(34, 46), dm(33, 18), dm(32, 40), -92.0, 400000.0, 400000.0),
      (26953, 2231, false, "Colorado North", dm(40, 47), dm(39, 43), dm(39, 20), -105.5, 914401.8289, 304800.6096),
      (26954, 2232, false, "Colorado Central", dm(39, 45), dm(38, 27), dm(37, 50), -105.5, 914401.8289, 304800.6096),
      (26955, 2233, false, "Colorado South", dm(38, 26), dm(37, 14), dm(36, 40), -105.5, 914401.8289, 304800.6096),
      (26956, 2234, false, "Connecticut", dm(41, 52), dm(41, 12), dm(40, 50), -dm(72, 45), 304800.6096, 152400.3048),
      (26960, 2238, false, "Florida North", dm(30, 45), dm(29, 35), 29.0, -84.5, 600000.0, 0.0),
      (26975, 3417, false, "Iowa North", dm(43, 16), dm(42, 4), 41.5, -93.5, 1500000.0, 1000000.0),
      (26976, 3418, false, "Iowa South", dm(41, 47), dm(40, 37), 40.0, -93.5, 500000.0, 0.0),
      (26977, 3419, false, "Kansas North", dm(39, 47), dm(38, 43), dm(38, 20), -98.0, 400000.0, 0.0),
      (26978, 3420, false, "Kansas South", dm(38, 34), dm(37, 16), dm(36, 40), -98.5, 400000.0, 400000.0),
      (26979, 2246, false, "Kentucky North", dm(38, 58), dm(37, 58), 37.5, -dm(84, 15), 500000.0, 0.0),
      (26980, 2247, false, "Kentucky South", dm(37, 56), dm(36, 44), dm(36, 20), -dm(85, 45), 500000.0, 500000.0),
      (3088, 3089, false, "Kentucky Single Zone", dm(38, 40), dm(37, 5), dm(36, 20), -dm(85, 45), 1500000.0, 1000000.0),
      (26981, 3451, false, "Louisiana North", dm(32, 40), dm(31, 10), 30.5, -92.5, 1000000.0, 0.0),
      (26982, 3452, false, "Louisiana South", dm(30, 42), dm(29, 18), 28.5, -dm(91, 20), 1000000.0, 0.0),
      (32199, 3453, false, "Louisiana Offshore", dm(27, 50), dm(26, 10), 25.5, -dm(91, 20), 1000000.0, 0.0),
      (26985, 2248, false, "Maryland", dm(39, 27), dm(38, 18), dm(37, 40), -77.0, 400000.0, 0.0),
      (26986, 2249, false, "Massachusetts Mainland", dm(42, 41), dm(41, 43), 41.0, -71.5, 200000.0, 750000.0),
      (26987, 2250, false, "Massachusetts Island", dm(41, 29), dm(41, 17), 41.0, -70.5, 500000.0, 0.0),
      (26988, 2251, true, "Michigan North", dm(47, 5), dm(45, 29), dm(44, 47), -87.0, 8000000.0, 0.0),
      (26989, 2252, true, "Michigan Central", dm(45, 42), dm(44, 11), dm(43, 19), -dm(84, 22), 6000000.0, 0.0),
      (26990, 2253, true, "Michigan South", dm(43, 40), dm(42, 6), 41.5, -dm(84, 22), 4000000.0, 0.0),
      (26991, 26849, false, "Minnesota North", dm(48, 38), dm(47, 2), 46.5, -dm(93, 6), 800000.0, 100000.0),
      (26992, 26850, false, "Minnesota Central", dm(47, 3), dm(45, 37), 45.0, -dm(94, 15), 800000.0, 100000.0),
      (26993, 26851, false, "Minnesota South", dm(45, 13), dm(43, 47), 43.0, -94.0, 800000.0, 100000.0),
      (32100, 2256, true, "Montana", 49.0, 45.0, dm(44, 15), -109.5, 600000.0, 0.0),
      (32104, 26852, false, "Nebraska", 43.0, 40.0, dm(39, 50), -100.0, 500000.0, 0.0),
      (32118, 2263, false, "New York Long Island", dm(41, 2), dm(40, 40), dm(40, 10), -74.0, 300000.0, 0.0),
      (32119, 2264, false, "North Carolina", dm(36, 10), dm(34, 20), dm(33, 45), -79.0, 609601.22, 0.0),
      (32120, 2265, true, "North Dakota North", dm(48, 44), dm(47, 26), 47.0, -100.5, 600000.0, 0.0),
      (32121, 2266, true, "North Dakota South", dm(47, 29), dm(46, 11), dm(45, 40), -100.5, 600000.0, 0.0),
      (32122, 3734, false, "Ohio North", dm(41, 42), dm(40, 26), dm(39, 40), -82.5, 600000.0, 0.0),
      (32123, 3735, false, "Ohio South", dm(40, 2), dm(38, 44), 38.0, -82.5, 600000.0, 0.0),
      (32124, 2267, false, "Oklahoma North", dm(36, 46), dm(35, 34), 35.0, -98.0, 600000.0, 0.0),
      (32125, 2268, false, "Oklahoma South", dm(35, 14), dm(33, 56), dm(33, 20), -98.0, 600000.0, 0.0),
      (32126, 2269, true, "Oregon North", 46.0, dm(44, 20), dm(43, 40), -120.5, 2500000.0, 0.0),
      (32127, 2270, true, "Oregon South", 44.0, dm(42, 20), dm(41, 40), -120.5, 1500000.0, 0.0),
      (32128, 2271, false, "Pennsylvania North", dm(41, 57), dm(40, 53), dm(40, 10), -77.75, 600000.0, 0.0),
      (32129, 2272, false, "Pennsylvania South", dm(40, 58), dm(39, 56), dm(39, 20), -77.75, 600000.0, 0.0),
      (32133, 2273, true, "South Carolina", dm(34, 50), dm(32, 30), dm(31, 50), -81.0, 609600.0, 0.0),
      (32134, 0, false, "South Dakota North", dm(45, 41), dm(44, 25), dm(43, 50), -100.0, 600000.0, 0.0),
      (32135, 0, false, "South Dakota South", dm(44, 24), dm(42, 50), dm(42, 20), -dm(100, 20), 600000.0, 0.0),
      (32136, 2274, false, "Tennessee", dm(36, 25), dm(35, 15), dm(34, 20), -86.0, 600000.0, 0.0),
      (32137, 2275, false, "Texas North", dm(36, 11), dm(34, 39), 34.0, -101.5, 200000.0, 1000000.0),
      (32138, 2276, false, "Texas North Central", dm(33, 58), dm(32, 8), dm(31, 40), -98.5, 600000.0, 2000000.0),
      (32139, 2277, false, "Texas Central", dm(31, 53), dm(30, 7), dm(29, 40), -dm(100, 20), 700000.0, 3000000.0),
      (32140, 2278, false, "Texas South Central", dm(30, 17), dm(28, 23), dm(27, 50), -99.0, 600000.0, 4000000.0),
      (32141, 2279, false, "Texas South", dm(27, 50), dm(26, 10), dm(25, 40), -98.5, 300000.0, 5000000.0),
      (32142, 2280, true, "Utah North", dm(41, 47), dm(40, 43), dm(40, 20), -111.5, 500000.0, 1000000.0),
      (32143, 2281, true, "Utah Central", dm(40, 39), dm(39, 1), dm(38, 20), -111.5, 500000.0, 2000000.0),
      (32144, 2282, true, "Utah South", dm(38, 21), dm(37, 13), dm(36, 40), -111.5, 500000.0, 3000000.0),
      (32146, 2283, false, "Virginia North", dm(39, 12), dm(38, 2), dm(37, 40), -78.5, 3500000.0, 2000000.0),
      (32147, 2284, false, "Virginia South", dm(37, 58), dm(36, 46), dm(36, 20), -78.5, 3500000.0, 1000000.0),
      (32148, 2285, false, "Washington North", dm(48, 44), 47.5, 47.0, -dm(120, 50), 500000.0, 0.0),
      (32149, 2286, false, "Washington South", dm(47, 20), dm(45, 50), dm(45, 20), -120.5, 500000.0, 0.0),
      (32150, 26853, false, "West Virginia North", dm(40, 15), 39.0, 38.5, -79.5, 600000.0, 0.0),
      (32151, 26854, false, "West Virginia South", dm(38, 53), dm(37, 29), 37.0, -81.0, 600000.0, 0.0),
      (32152, 2287, false, "Wisconsin North", dm(46, 46), dm(45, 34), dm(45, 10), -90.0, 600000.0, 0.0),
      (32153, 2288, false, "Wisconsin Central", dm(45, 30), dm(44, 15), dm(43, 50), -90.0, 600000.0, 0.0),
      (32154, 2289, false, "Wisconsin South", dm(44, 4), dm(42, 44), 42.0, -90.0, 600000.0, 0.0),
      (32161, 0, false, "Puerto Rico & Virgin Is.", dm(18, 26), dm(18, 2), dm(17, 50), -dm(66, 26), 200000.0, 200000.0))
    spLcc.foreach { case (m, f, intl, zone, latN, latS, lat0, lon0, fe, fn) =>
      val crs = Crs(Lcc2SP(GRS80, latN, latS, lat0, lon0, fe, fn), None,
        s"NAD83 / $zone")
      b += m -> crs
      if (f != 0) { if (intl) fti(f, crs) else ft(f, crs) }
    }

    // Transverse Mercator zones:
    // (metreCode, footCode, internationalFoot?, zone, lat0, lon0, k0, FE m, FN m)
    val spTm: Seq[(Int, Int, Boolean, String, Double, Double, Double, Double, Double)] = Seq(
      (26929, 0, false, "Alabama East", 30.5, -dm(85, 50), 0.99996, 200000.0, 0.0),
      (26930, 0, false, "Alabama West", 30.0, -87.5, 0.999933333, 600000.0, 0.0),
      (26948, 2222, true, "Arizona East", 31.0, -dm(110, 10), 0.9999, 213360.0, 0.0),
      (26949, 2223, true, "Arizona Central", 31.0, -dm(111, 55), 0.9999, 213360.0, 0.0),
      (26950, 2224, true, "Arizona West", 31.0, -dm(113, 45), 0.999933333, 213360.0, 0.0),
      (26957, 2235, false, "Delaware", 38.0, -dm(75, 25), 0.999995, 200000.0, 0.0),
      (26958, 2236, false, "Florida East", dm(24, 20), -81.0, 0.999941177, 200000.0, 0.0),
      (26959, 2237, false, "Florida West", dm(24, 20), -82.0, 0.999941177, 200000.0, 0.0),
      (26961, 0, false, "Hawaii zone 1", dm(18, 50), -155.5, 0.999966667, 500000.0, 0.0),
      (26962, 0, false, "Hawaii zone 2", dm(20, 20), -dm(156, 40), 0.999966667, 500000.0, 0.0),
      (26963, 3759, false, "Hawaii zone 3", dm(21, 10), -158.0, 0.99999, 500000.0, 0.0),
      (26964, 0, false, "Hawaii zone 4", dm(21, 50), -159.5, 0.99999, 500000.0, 0.0),
      (26965, 0, false, "Hawaii zone 5", dm(21, 40), -dm(160, 10), 1.0, 500000.0, 0.0),
      (26966, 2239, false, "Georgia East", 30.0, -dm(82, 10), 0.9999, 200000.0, 0.0),
      (26967, 2240, false, "Georgia West", 30.0, -dm(84, 10), 0.9999, 700000.0, 0.0),
      (26968, 2241, false, "Idaho East", dm(41, 40), -dm(112, 10), 0.999947368, 200000.0, 0.0),
      (26969, 2242, false, "Idaho Central", dm(41, 40), -114.0, 0.999947368, 500000.0, 0.0),
      (26970, 2243, false, "Idaho West", dm(41, 40), -115.75, 0.999933333, 800000.0, 0.0),
      (26971, 3435, false, "Illinois East", dm(36, 40), -dm(88, 20), 0.999975, 300000.0, 0.0),
      (26972, 3436, false, "Illinois West", dm(36, 40), -dm(90, 10), 0.999941177, 700000.0, 0.0),
      (26973, 2244, false, "Indiana East", 37.5, -dm(85, 40), 0.999966667, 100000.0, 250000.0),
      (26974, 2245, false, "Indiana West", 37.5, -dm(87, 5), 0.999966667, 900000.0, 250000.0),
      (26983, 26847, false, "Maine East", dm(43, 40), -68.5, 0.9999, 300000.0, 0.0),
      (26984, 26848, false, "Maine West", dm(42, 50), -dm(70, 10), 0.999966667, 900000.0, 0.0),
      (26994, 2254, false, "Mississippi East", 29.5, -dm(88, 50), 0.99995, 300000.0, 0.0),
      (26995, 2255, false, "Mississippi West", 29.5, -dm(90, 20), 0.99995, 700000.0, 0.0),
      (26996, 0, false, "Missouri East", dm(35, 50), -90.5, 0.999933333, 250000.0, 0.0),
      (26997, 0, false, "Missouri Central", dm(35, 50), -92.5, 0.999933333, 500000.0, 0.0),
      (26998, 0, false, "Missouri West", dm(36, 10), -94.5, 0.999941177, 850000.0, 0.0),
      (32107, 3421, false, "Nevada East", dm(34, 45), -dm(115, 35), 0.9999, 200000.0, 8000000.0),
      (32108, 3422, false, "Nevada Central", dm(34, 45), -dm(116, 40), 0.9999, 500000.0, 6000000.0),
      (32109, 3423, false, "Nevada West", dm(34, 45), -dm(118, 35), 0.9999, 800000.0, 4000000.0),
      (32110, 3437, false, "New Hampshire", 42.5, -dm(71, 40), 0.999966667, 300000.0, 0.0),
      (32111, 3424, false, "New Jersey", dm(38, 50), -74.5, 0.9999, 150000.0, 0.0),
      (32112, 2257, false, "New Mexico East", 31.0, -dm(104, 20), 0.999909091, 165000.0, 0.0),
      (32113, 2258, false, "New Mexico Central", 31.0, -106.25, 0.9999, 500000.0, 0.0),
      (32114, 2259, false, "New Mexico West", 31.0, -dm(107, 50), 0.999916667, 830000.0, 0.0),
      (32115, 2260, false, "New York East", dm(38, 50), -74.5, 0.9999, 150000.0, 0.0),
      (32116, 2261, false, "New York Central", 40.0, -dm(76, 35), 0.9999375, 250000.0, 0.0),
      (32117, 2262, false, "New York West", 40.0, -dm(78, 35), 0.9999375, 350000.0, 0.0),
      (32130, 3438, false, "Rhode Island", dm(41, 5), -71.5, 0.99999375, 100000.0, 0.0),
      (32145, 5646, false, "Vermont", 42.5, -72.5, 0.999964286, 500000.0, 0.0),
      (32155, 3736, false, "Wyoming East", 40.5, -dm(105, 10), 0.9999375, 200000.0, 0.0),
      (32156, 3737, false, "Wyoming East Central", 40.5, -dm(107, 20), 0.9999375, 400000.0, 100000.0),
      (32157, 3738, false, "Wyoming West Central", 40.5, -108.75, 0.9999375, 600000.0, 0.0),
      (32158, 3739, false, "Wyoming West", 40.5, -dm(110, 5), 0.9999375, 800000.0, 100000.0))
    spTm.foreach { case (m, f, intl, zone, lat0, lon0, k0, fe, fn) =>
      val crs = Crs(TMerc(GRS80, lat0, lon0, k0, fe, fn), None, s"NAD83 / $zone")
      b += m -> crs
      if (f != 0) { if (intl) fti(f, crs) else ft(f, crs) }
    }
    // Alaska zones 2-9: 4°-wide TM strips west from 142°W
    for (z <- 2 to 9)
      add(26930 + z, noShift(
        TMerc(GRS80, 54.0, -142.0 - 4.0 * (z - 2), 0.9999, 500000, 0),
        s"NAD83 / Alaska zone $z"))
    // Alaska zone 1: Hotine Oblique Mercator variant A along the
    // panhandle axis (azimuth = rectified grid angle = atan(-3/4),
    // the published SPCS83 value -36°52'11.6315")
    add(26931, noShift(
      HotineOblique(GRS80, 57.0, -dm(133, 40),
        -(36.0 + 52.0 / 60 + 11.6315 / 3600), -(36.0 + 52.0 / 60 + 11.6315 / 3600),
        0.9999, 5000000, -5000000, variantB = false),
      "NAD83 / Alaska zone 1"))
    // Timbalai 1948 / RSO Borneo (m) — the EPSG Guidance Note 7-2
    // variant-B worked example; pinned as the Hotine OM anchor in
    // EpsgDbSpec
    add(29873, (HotineOblique(Everest1967, 4.0, 115.0,
      53.0 + 18.0 / 60 + 56.9537 / 3600, 53.0 + 7.0 / 60 + 48.3685 / 3600,
      0.99984, 590476.87, 442857.65, variantB = true),
      Some(Timbalai), "Timbalai 1948 / RSO Borneo (m)"))

    // ETRS89 national / continental LCCs
    add(3034, noShift(Lcc2SP(GRS80, 35, 65, 52, 10, 4000000, 2800000),
      "ETRS89-extended / LCC Europe"))
    add(3763, noShift(TMerc(GRS80, 39.66825833333333, -8.133108333333334, 1.0, 0, 0),
      "ETRS89 / Portugal TM06"))
    add(3416, noShift(Lcc2SP(GRS80, 49, 46, 47.5, 13.0 + 20.0 / 60, 400000, 400000),
      "ETRS89 / Austria Lambert"))
    add(3812, noShift(Lcc2SP(GRS80, 49.0 + 50.0 / 60, 51.0 + 10.0 / 60,
      50.0 + 47.0 / 60 + 52.134 / 3600, 4.0 + 21.0 / 60 + 33.177 / 3600,
      649328, 665262), "ETRS89 / Lambert 2008"))
    add(5243, noShift(Lcc2SP(GRS80, 48.66666666666666, 53.66666666666666, 51, 10.5,
      0, 0), "ETRS89 / LCC Germany (E-N)"))

    // Dutch RD New (double stereographic on Bessel + Amersfoort shift)
    add(28992, (ObliqueStereo(Bessel1841, 52.15616055555555, 5.38763888888889,
      0.9999079, 155000, 463000), Some(Amersfoort), "Amersfoort / RD New"))
    add(4289, (Geographic(Bessel1841), Some(Amersfoort), "Amersfoort"))
    // Swiss LV95 / LV03 (Rosenmund oblique Mercator on Bessel)
    add(2056, (SwissOblique(Bessel1841, 46.95240555555556, 7.439583333333333,
      1.0, 2600000, 1200000), Some(Ch1903), "CH1903+ / LV95"))
    add(21781, (SwissOblique(Bessel1841, 46.95240555555556, 7.439583333333333,
      1.0, 600000, 200000), Some(Ch1903), "CH1903 / LV03"))
    add(4150, (Geographic(Bessel1841), Some(Ch1903), "CH1903+"))
    add(4149, (Geographic(Bessel1841), Some(Ch1903), "CH1903"))

    // ---- r9 tranche: most-used remaining national grids + EASE grids ----
    // Poland: ETRF2000-PL / CS2000 zones 5-8 (3° Gauss-Krüger strips,
    // k0 = 0.999923, zone-number-prefixed false eastings)
    for ((code, cm, fe) <- Seq((2176, 15.0, 5500000.0), (2177, 18.0, 6500000.0),
        (2178, 21.0, 7500000.0), (2179, 24.0, 8500000.0)))
      add(code, noShift(TMerc(GRS80, 0, cm, 0.999923, fe, 0),
        s"ETRF2000-PL / CS2000/${cm.toInt}"))
    // Greece: GGRS87 / Greek Grid (TM87) + the geographic CRS
    add(2100, (TMerc(GRS80, 0, 24, 0.9996, 500000, 0), Some(Ggrs87),
      "GGRS87 / Greek Grid"))
    add(4121, (Geographic(GRS80), Some(Ggrs87), "GGRS87"))
    // Korea 2000 belts (2010 definitions: lat0 38°N, k0 = 1, FN 600 km)
    for ((code, cm, belt) <- Seq((5185, 125.0, "West"), (5186, 127.0, "Central"),
        (5187, 129.0, "East"), (5188, 131.0, "East Sea")))
      add(code, noShift(TMerc(GRS80, 38, cm, 1.0, 200000, 600000),
        s"Korea 2000 / $belt Belt 2010"))
    // Croatia: HTRS96 / Croatia TM
    add(3765, noShift(TMerc(GRS80, 0, 16.5, 0.9999, 500000, 0),
      "HTRS96 / Croatia TM"))
    // Italy: Monte Mario / Gauss-Boaga west + east zones
    add(3003, (TMerc(Intl1924, 0, 9, 0.9996, 1500000, 0), Some(MonteMario),
      "Monte Mario / Italy zone 1"))
    add(3004, (TMerc(Intl1924, 0, 15, 0.9996, 2520000, 0), Some(MonteMario),
      "Monte Mario / Italy zone 2"))
    add(4265, (Geographic(Intl1924), Some(MonteMario), "Monte Mario"))
    // Australia: the national-analysis Lamberts (GDA94 + GDA2020)
    add(3112, noShift(Lcc2SP(GRS80, -18, -36, 0, 134, 0, 0),
      "GDA94 / Geoscience Australia Lambert"))
    add(7845, noShift(Lcc2SP(GRS80, -18, -36, 0, 134, 0, 0),
      "GDA2020 / GA LCC"))
    // Germany/EU INSPIRE zone-prefixed ETRS89 UTM (zE-N: 32.5M/33.5M FE)
    add(4647, noShift(TMerc(GRS80, 0, 9, 0.9996, 32500000, 0),
      "ETRS89 / UTM zone 32N (zE-N)"))
    add(5650, noShift(TMerc(GRS80, 0, 15, 0.9996, 33500000, 0),
      "ETRS89 / UTM zone 33N (zE-N)"))
    // NSIDC EASE-Grid 2.0: polar LAEA pair + the global cylindrical
    // equal-area (the remote-sensing tiling grids)
    add(6931, noShift(Laea(WGS84, 90, 0, 0, 0),
      "WGS 84 / NSIDC EASE-Grid 2.0 North"))
    add(6932, noShift(Laea(WGS84, -90, 0, 0, 0),
      "WGS 84 / NSIDC EASE-Grid 2.0 South"))
    add(6933, noShift(Cea(WGS84, 30, 0, 0, 0),
      "WGS 84 / NSIDC EASE-Grid 2.0 Global"))
    // ---- r13: world equidistant-cylindrical pair (method 1028/1029) ----
    add(4087, noShift(Eqc(WGS84, 0, 0, 0, 0, 0),
      "WGS 84 / World Equidistant Cylindrical"))
    // 4088: method 1029 on the GRS80 authalic sphere (e²=0 reduces the
    // ellipsoidal forms exactly: x = Rλ, y = Rφ)
    add(4088, noShift(Eqc(Ellipsoid(6371007.181, 1e12), 0, 0, 0, 0, 0),
      "World Equidistant Cylindrical (Sphere)"))
    // Singapore SVY21 (WGS84-coincident datum)
    add(3414, noShift(TMerc(WGS84, 1.366666666666667, 103.8333333333333, 1.0,
      28001.642, 38744.572), "SVY21 / Singapore TM"))

    // ---- r10 tranche: the other two Japan CS frames + WGS72 UTM ----
    // The JGD2011 zone loop above already carries the published GSI zone
    // origins (jgdZones/jgdRoman); the JGD2000 (2443-2461, same GRS80
    // projections — the realizations differ at centimetre level, below
    // this engine's Helmert tolerance) and legacy Tokyo-datum
    // (30161-30179, Bessel 1841 + the published EPSG "Tokyo to
    // WGS 84 (1)" geocentric translation) frames reuse it.
    jgdZones.zipWithIndex.foreach { case ((lat0, lon0), i) =>
      add(2443 + i, noShift(TMerc(GRS80, lat0, lon0, 0.9999, 0, 0),
        s"JGD2000 / Japan Plane Rectangular CS ${jgdRoman(i)}"))
      add(30161 + i, (TMerc(Bessel1841, lat0, lon0, 0.9999, 0, 0),
        Some(TokyoDatum), s"Tokyo / Japan Plane Rectangular CS ${jgdRoman(i)}"))
    }
    add(4612, noShift(Geographic(GRS80), "JGD2000"))
    add(6668, noShift(Geographic(GRS80), "JGD2011"))
    add(4301, (Geographic(Bessel1841), Some(TokyoDatum), "Tokyo"))

    // WGS72 / WGS72BE UTM zone grids (legacy satellite-era frames still
    // met in marine/seismic archives): standard UTM on the WGS72
    // ellipsoid + the published EPSG time-independent Helmerts
    // ("WGS 72 to WGS 84 (1)" 4.5 m dz / 0.554" rz / 0.2263 ppm;
    // "WGS 72BE to WGS 84 (1)" 1.9 m dz / 0.814" rz / -0.38 ppm).
    for (z <- 1 to 60) {
      val cm = -183.0 + 6 * z
      add(32200 + z, (TMerc(Wgs72Ell, 0, cm, 0.9996, 500000, 0),
        Some(Wgs72), s"WGS 72 / UTM zone ${z}N"))
      add(32300 + z, (TMerc(Wgs72Ell, 0, cm, 0.9996, 500000, 10000000),
        Some(Wgs72), s"WGS 72 / UTM zone ${z}S"))
      add(32400 + z, (TMerc(Wgs72Ell, 0, cm, 0.9996, 500000, 0),
        Some(Wgs72be), s"WGS 72BE / UTM zone ${z}N"))
      add(32500 + z, (TMerc(Wgs72Ell, 0, cm, 0.9996, 500000, 10000000),
        Some(Wgs72be), s"WGS 72BE / UTM zone ${z}S"))
    }
    add(4322, (Geographic(Wgs72Ell), Some(Wgs72), "WGS 72"))
    add(4324, (Geographic(Wgs72Ell), Some(Wgs72be), "WGS 72BE"))

    b.result()
  }

  /** Datum name → published Helmert shift (None = WGS84-coincident at our
    * tolerance), keyed by lowercase alphanumeric-only names. Covers the OGC
    * WKT1, ESRI WKT1 (`D_` prefix stripped by the caller) and WKT2 (EPSG
    * registry) spellings, so a `.prj` with no TOWGS84 clause — the ESRI
    * dialect ArcGIS writes — still reprojects through the right datum
    * (reference behavior: GDAL/pyproj datum lookup, `utils/srid.py:10-23`). */
  val datumShiftByName: Map[String, Option[Helmert]] = Map(
    // WGS84-coincident
    "wgs1984" -> None, "worldgeodeticsystem1984" -> None,
    "worldgeodeticsystem1984ensemble" -> None, "wgs84" -> None,
    "etrs1989" -> None, "europeanterrestrialreferencesystem1989" -> None,
    "etrs89" -> None, "etrf1989" -> None,
    "northamerican1983" -> None, "northamericandatum1983" -> None,
    "nad1983" -> None, "nad83" -> None,
    "gda1994" -> None, "geocentricdatumofaustralia1994" -> None,
    "nzgd2000" -> None, "newzealandgeodeticdatum2000" -> None,
    "sweref99" -> None, "rgf1993" -> None,
    "reseaugeodesiquefrancais1993" -> None,
    "reseaugeodesiquefrancais1993v1" -> None, "rgf93" -> None,
    "sirgas2000" -> None, "sistemadereferenciageocentricoparalasamericas2000" -> None,
    // shifted datums (position-vector Helmert, as in the embedded table)
    "osgb1936" -> Some(Osgb36), "osgb36" -> Some(Osgb36),
    "ordnancesurveyofgreatbritain1936" -> Some(Osgb36),
    "northamerican1927" -> Some(Nad27), "northamericandatum1927" -> Some(Nad27),
    "nad1927" -> Some(Nad27), "nad27" -> Some(Nad27),
    "european1950" -> Some(Ed50), "europeandatum1950" -> Some(Ed50),
    "ed1950" -> Some(Ed50), "ed50" -> Some(Ed50),
    "deutscheshauptdreiecksnetz" -> Some(Dhdn), "dhdn" -> Some(Dhdn),
    "belge1972" -> Some(Bd72), "reseaunationalbelge1972" -> Some(Bd72),
    "amersfoort" -> Some(Amersfoort),
    "ch1903" -> Some(Ch1903),
    "ntf" -> Some(Ntf), "nouvelletriangulationfrancaise" -> Some(Ntf),
    "nouvelletriangulationfrancaiseparis" -> Some(Ntf),
    "sjtsk" -> Some(Sjtsk), "jtsk" -> Some(Sjtsk),
    "systemjednotnetrigonometrickesitekatastralni" -> Some(Sjtsk),
    "greekgeodeticreferencesystem1987" -> Some(Ggrs87), "ggrs87" -> Some(Ggrs87),
    "montemario" -> Some(MonteMario),
    "hungarian1972" -> Some(Hd72), "hungariandatum1972" -> Some(Hd72),
    "hd1972" -> Some(Hd72),
    "mgi" -> Some(Mgi), "militargeographischesinstitut" -> Some(Mgi),
    "tm65" -> Some(Tm65),
    "newzealand1949" -> Some(Nzgd49),
    "newzealandgeodeticdatum1949" -> Some(Nzgd49), "nzgd1949" -> Some(Nzgd49),
    "pulkovo1942" -> Some(Pulkovo42),
    "timbalai1948" -> Some(Timbalai),
    "southamerican1969" -> Some(Sad69),
    "southamericandatum1969" -> Some(Sad69), "sad69" -> Some(Sad69))

  /** Built-in table first, then user registrations ([[CrsRegistry]]). */
  private def crsOf(code: Int): Option[Crs] =
    table.get(code).orElse(CrsRegistry.registered(code))

  def isSupported(code: Int): Boolean =
    code == 4326 || table.contains(code) || CrsRegistry.registered(code).isDefined

  /** (lon, lat) on this CRS's datum → WGS84 (lon, lat). A registered
    * NTv2 grid for the datum ([[CrsRegistry.registerGridShift]]) takes
    * precedence wherever it covers — the grid interpolates the true
    * distortion field where a single Helmert can only average it;
    * outside coverage (or with no grid) the Helmert applies. */
  private def datumToWgs84(crs: Crs, lonDeg: Double, latDeg: Double): (Double, Double) =
    crs.shift match {
      case None => (lonDeg, latDeg)
      case Some(h) =>
        CrsRegistry.gridShiftFor(h).flatMap(_.shift(lonDeg, latDeg)) match {
          case Some((dLat, dLon)) => (lonDeg + dLon, latDeg + dLat)
          case None =>
            val (x, y, z) = toXYZ(crs.proj.ell, lonDeg, latDeg)
            val (x2, y2, z2) = h.toWgs84(x, y, z)
            toGeodetic(WGS84, x2, y2, z2)
        }
    }

  private def wgs84ToDatum(crs: Crs, lonDeg: Double, latDeg: Double): (Double, Double) =
    crs.shift match {
      case None => (lonDeg, latDeg)
      case Some(h) =>
        def helmert(): (Double, Double) = {
          val (x, y, z) = toXYZ(WGS84, lonDeg, latDeg)
          val (x2, y2, z2) = h.fromWgs84(x, y, z)
          var (lo, la) = toGeodetic(crs.proj.ell, x2, y2, z2)
          // Fixed-point polish: both directions drop ellipsoidal height at
          // the XYZ→geodetic step (the 2-D convention, like proj with
          // h = 0), so the one-shot inverse misses by ~shift·e²/R — up to
          // 2.5 cm for the large Tokyo translation. The forward hop
          // (datumToWgs84) is the canonical direction; two residual
          // corrections against it land round trips at machine precision.
          var i = 0
          while (i < 2) {
            val (xf, yf, zf) = toXYZ(crs.proj.ell, lo, la)
            val (xw, yw, zw) = h.toWgs84(xf, yf, zf)
            val (flon, flat) = toGeodetic(WGS84, xw, yw, zw)
            lo += lonDeg - flon; la += latDeg - flat
            i += 1
          }
          (lo, la)
        }
        CrsRegistry.gridShiftFor(h) match {
          case Some(grid) =>
            // the grid is indexed by SOURCE-datum coordinates: fixed-point
            // iterate λφ_datum = λφ_wgs − shift(λφ_datum), seeded at the
            // WGS84 position (shifts are arc-seconds — 3 rounds land far
            // below the 1e-9° budget; proj inverts the same way).
            // The seed can sit up to a shift-magnitude OUTSIDE the
            // source-frame coverage for in-coverage sources near the
            // edge, so iteration lookups tolerate a 30-arcsec margin
            // (edge-clamped interpolation); the accept/reject decision is
            // STRICT on the converged source estimate — the same frame
            // datumToWgs84 tests, so forward and inverse always pick the
            // same path and edge round trips hold.
            val margin = 30.0
            var lon = lonDeg; var lat = latDeg
            var near = true
            var i = 0
            while (near && i < 4) {
              grid.shift(lon, lat, margin) match {
                case Some((dLat, dLon)) => lon = lonDeg - dLon; lat = latDeg - dLat
                case None => near = false
              }
              i += 1
            }
            if (near && grid.shift(lon, lat).isDefined) (lon, lat)
            else helmert()
          case None => helmert()
        }
    }

  /** Projected/geographic (x, y) in `code` → WGS84 (lon, lat). */
  def toWgs84(x: Double, y: Double, code: Int): (Double, Double) = {
    if (code == 4326) return (x, y)
    val crs = crsOf(code).getOrElse(table(code))
    val (lon, lat) = crs.proj.inverse(x, y)
    datumToWgs84(crs, lon, lat)
  }

  /** WGS84 (lon, lat) → projected/geographic (x, y) in `code`. */
  def fromWgs84(lon: Double, lat: Double, code: Int): (Double, Double) = {
    if (code == 4326) return (lon, lat)
    val crs = crsOf(code).getOrElse(table(code))
    val (lonD, latD) = wgs84ToDatum(crs, lon, lat)
    crs.proj.forward(lonD, latD)
  }

  /** Synthesized CRS WKT from the stored parameters (reference
    * `src/crs.rs:20-26`; registry names, parameter values public). For a
    * user-registered code, the registration's own WKT is returned
    * verbatim. */
  def wkt(code: Int): Option[String] =
    wktBuiltin(code).orElse(CrsRegistry.registeredWkt(code))

  /** WKT unit name for a [[UnitScaled]] factor: the international foot
    * (0.3048 exactly) vs the US survey foot (1200/3937). */
  private def footName(f: Double): String =
    if (f == 0.3048) "foot" else "US survey foot"

  private def wktBuiltin(code: Int): Option[String] = table.get(code).map { crs =>
    def geogcs(ell: Ellipsoid, datumName: String) =
      s"""GEOGCS["$datumName",DATUM["${datumName.replace(' ', '_')}",SPHEROID["${datumName}",${ell.a},${ell.invF}]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]"""
    val base = geogcs(crs.proj.ell, crs.name.split(" / ").head)
    crs.proj match {
      case Geographic(_) =>
        s"""GEOGCS["${crs.name}",DATUM["${crs.name.replace(' ', '_')}",SPHEROID["${crs.name}",${crs.proj.ell.a},${crs.proj.ell.invF}]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","$code"]]"""
      case TMerc(_, lat0, lon0, k0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["scale_factor",$k0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Lcc1SP(_, lat0, lon0, k0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Lambert_Conformal_Conic_1SP"],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["scale_factor",$k0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Lcc2SP(_, lat1, lat2, lat0, lon0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Lambert_Conformal_Conic_2SP"],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["standard_parallel_1",$lat1],PARAMETER["standard_parallel_2",$lat2],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case AlbersConic(_, lat1, lat2, lat0, lon0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Albers_Conic_Equal_Area"],PARAMETER["latitude_of_center",$lat0],PARAMETER["longitude_of_center",$lon0],PARAMETER["standard_parallel_1",$lat1],PARAMETER["standard_parallel_2",$lat2],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case PolarStereo(_, north, lon0, latTs, k0, fe, fn) =>
        val lat0 = if (!latTs.isNaN) latTs else if (north) 90.0 else -90.0
        val k = if (k0.isNaN) 1.0 else k0
        s"""PROJCS["${crs.name}",$base,PROJECTION["Polar_Stereographic"],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["scale_factor",$k],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Mercator1SP(_, lon0, k0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",$lon0],PARAMETER["scale_factor",$k0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Laea(_, lat0, lon0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Lambert_Azimuthal_Equal_Area"],PARAMETER["latitude_of_center",$lat0],PARAMETER["longitude_of_center",$lon0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case ObliqueStereo(_, lat0, lon0, k0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Oblique_Stereographic"],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["scale_factor",$k0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Krovak(_, latC, lon0, alpha, latP, k0) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Krovak"],PARAMETER["latitude_of_center",$latC],PARAMETER["longitude_of_center",$lon0],PARAMETER["azimuth",$alpha],PARAMETER["pseudo_standard_parallel_1",$latP],PARAMETER["scale_factor",$k0],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Nzmg(fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["New_Zealand_Map_Grid"],PARAMETER["latitude_of_origin",-41],PARAMETER["central_meridian",173],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case SwissOblique(_, lat0, lon0, k0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],PARAMETER["latitude_of_center",$lat0],PARAMETER["longitude_of_center",$lon0],PARAMETER["azimuth",90],PARAMETER["rectified_grid_angle",90],PARAMETER["scale_factor",$k0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Polyconic(_, lat0, lon0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Polyconic"],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Cea(_, latTs, lon0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Cylindrical_Equal_Area"],PARAMETER["standard_parallel_1",$latTs],PARAMETER["central_meridian",$lon0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case Eqc(_, lat1, lat0, lon0, fe, fn) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Equirectangular"],PARAMETER["standard_parallel_1",$lat1],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      case HotineOblique(_, latC, lonC, az, gamma, k0, fe, fn, vB) =>
        val proj = if (vB) "Hotine_Oblique_Mercator_Azimuth_Center"
          else "Hotine_Oblique_Mercator"
        s"""PROJCS["${crs.name}",$base,PROJECTION["$proj"],PARAMETER["latitude_of_center",$latC],PARAMETER["longitude_of_center",$lonC],PARAMETER["azimuth",$az],PARAMETER["rectified_grid_angle",$gamma],PARAMETER["scale_factor",$k0],PARAMETER["false_easting",$fe],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]"""
      // non-metre CRSs (US-survey-foot / international-foot state
      // planes): the false origin is expressed in the CRS's own unit,
      // per WKT1 convention
      case UnitScaled(TMerc(_, lat0, lon0, k0, fe, fn), f) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["scale_factor",$k0],PARAMETER["false_easting",${fe / f}],PARAMETER["false_northing",${fn / f}],UNIT["${footName(f)}",$f],AUTHORITY["EPSG","$code"]]"""
      case UnitScaled(Lcc2SP(_, lat1, lat2, lat0, lon0, fe, fn), f) =>
        s"""PROJCS["${crs.name}",$base,PROJECTION["Lambert_Conformal_Conic_2SP"],PARAMETER["latitude_of_origin",$lat0],PARAMETER["central_meridian",$lon0],PARAMETER["standard_parallel_1",$lat1],PARAMETER["standard_parallel_2",$lat2],PARAMETER["false_easting",${fe / f}],PARAMETER["false_northing",${fn / f}],UNIT["${footName(f)}",$f],AUTHORITY["EPSG","$code"]]"""
      case UnitScaled(inner, f) => throw new IllegalStateException(
        s"no WKT synthesis for UnitScaled(${inner.getClass.getSimpleName}, $f)")
    }
  }
}
