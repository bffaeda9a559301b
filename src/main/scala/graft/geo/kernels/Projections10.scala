package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Central Conic (PROJ `ccon` — behavioral reference:
  * /root/reference/src/projections/ccon.cpp:43-67).  Spherical; cone
  * tangent at lat_1. */
final case class CconKernel(override val ell: Ellipsoid,
                            phi1: Double,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  require(math.abs(phi1) >= 1e-10, "ccon |lat_1| must be > 0")
  private val sinphi1 = math.sin(phi1)
  private val ctgphi1 = math.cos(phi1) / sinphi1

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val r = ctgphi1 - math.tan(phi - phi1)
    (r * math.sin(lam * sinphi1), ctgphi1 - r * math.cos(lam * sinphi1))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val yy = ctgphi1 - y
    val phi = phi1 - math.atan(math.hypot(x, yy) - ctgphi1)
    (math.atan2(x, yy) / sinphi1, phi)
  }
}

/** Bertin 1953 (PROJ `bertin1953` — behavioral reference:
  * /root/reference/src/projections/bertin1953.cpp:28-96).  Oblique
  * Hammer-style compromise projection with empirical adjustments; the
  * rotation pole (-16.5°E, -42°N) is built in.  Forward only. */
final case class Bertin1953Kernel(override val ell: Ellipsoid,
                                  override val x0: Double = 0.0,
                                  override val y0: Double = 0.0)
    extends ProjectionKernel(ell, 0.0, x0, y0) {
  override def invertible: Boolean = false
  private val cosDeltaPhi = math.cos(math.toRadians(-42.0))
  private val sinDeltaPhi = math.sin(math.toRadians(-42.0))

  protected def project(lamIn: Double, phiIn: Double): (Double, Double) = {
    val fu = 1.4; val k = 12.0; val w = 1.68
    var lam = lamIn + math.toRadians(-16.5)
    var phi = phiIn
    // rotate about the built-in pole
    var cosphi = math.cos(phi)
    val x = math.cos(lam) * cosphi
    val y = math.sin(lam) * cosphi
    val z = math.sin(phi)
    var z0 = z * cosDeltaPhi + x * sinDeltaPhi
    lam = math.atan2(y, x * cosDeltaPhi - z * sinDeltaPhi)
    phi = math.asin(z0)
    lam = M.adjlon(lam)
    // pre-projection adjustment
    if (lam + phi < -fu) {
      val d = (lam - phi + 1.6) * (lam + phi + fu) / 8.0
      lam += d
      phi -= 0.8 * d * math.sin(phi + math.Pi / 2.0)
    }
    // Hammer (1.68, 2)
    cosphi = math.cos(phi)
    var d = math.sqrt(2.0 / (1.0 + cosphi * math.cos(lam / 2.0)))
    var px = w * d * cosphi * math.sin(lam / 2.0)
    var py = d * math.sin(phi)
    // post-projection adjustment
    d = (1.0 - math.cos(lam * phi)) / k
    if (py < 0.0) px *= 1.0 + d
    if (py > 0.0) py *= 1.0 + d / 1.5 * px * px
    (px, py)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) =
    (Double.NaN, Double.NaN)
}

/** Ellipsoidal gnomonic (PROJ `gnom` ellipsoidal branch — behavioral
  * reference: /root/reference/src/projections/gnom.cpp:120-214, after
  * Karney's GeographicLib Gnomonic): x+iy = (m12/M12)·e^{i·azi1} from
  * the geodesic inverse problem on a unit-radius ellipsoid; the inverse
  * is a Newton iteration along the geodesic line. */
final case class GnomEllKernel(override val ell: Ellipsoid,
                               lat0: Double = 0.0,
                               override val lam0: Double = 0.0,
                               override val x0: Double = 0.0,
                               override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  import graft.geo.geodesic.Geodesic

  // unit-radius geodesic (the kernel emits a=1 CLASSIC units)
  private val geod = new Geodesic(1.0, ell.f)
  private val lat0Deg = math.toDegrees(lat0)
  private val NewtonEps = 0.01 * math.sqrt(math.ulp(1.0))

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    // two solves where the reference's geod_geninverse outmask returns
    // m12/M12 from one: a DELIBERATE trade — extending GeodInverse would
    // make every kNN-hot inverse() pay the reduced-length series, and the
    // ellipsoidal gnomonic is the only consumer needing both
    val inv = geod.inverse(lat0Deg, 0.0, math.toDegrees(phi), math.toDegrees(lam))
    val full = geod.directScale(lat0Deg, 0.0, inv.azi1, inv.s12)
    if (full.M12 <= 0) return err
    val rho = full.m12 / full.M12
    val azi = math.toRadians(inv.azi1)
    (rho * math.sin(azi), rho * math.cos(azi))
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val azi0 = math.toDegrees(math.atan2(x, y))
    var rho = math.hypot(x, y)
    var s = math.atan(rho)
    val little = rho <= 1
    if (!little) rho = 1 / rho
    var count = 10
    var trip = false
    var lat1 = 0.0; var lon1 = 0.0
    var continue = true
    while (continue && count > 0) {
      count -= 1
      val p = geod.directScale(lat0Deg, 0.0, azi0, s)
      lat1 = p.lat2; lon1 = p.lon2
      if (trip) continue = false
      else {
        val ds =
          if (little) (p.m12 - rho * p.M12) * p.M12
          else (rho * p.m12 - p.M12) * p.m12
        s -= ds
        if (!(math.abs(ds) >= NewtonEps)) trip = true
      }
    }
    if (!trip) return err
    (math.toRadians(lon1), math.toRadians(lat1))
  }
}

/** Spherical Cross-track Height (PROJ `sch` — behavioral reference:
  * /root/reference/src/projections/sch.cpp:64-228).  Radar geometry:
  * geodetic -> geocentric -> shift/rotate into a local sphere whose
  * radius is the curvature at the peg point, then scale the local
  * angular coordinates by that radius.  3D throughout. */
final case class SchKernel(ell: Ellipsoid,
                           plat: Double, plon: Double, phdg: Double,
                           h0: Double = 0.0) extends PointKernel {
  override def left: IOUnits.Value = IOUnits.Radians
  override def right: IOUnits.Value = IOUnits.Projected

  private val cartEll = CartKernel(ell)

  private val clt = math.cos(plat)
  private val slt = math.sin(plat)
  private val clo = math.cos(plon)
  private val slo = math.sin(plon)
  private val rcurv = {
    val temp = math.sqrt(1.0 - ell.es * slt * slt)
    val reast = ell.a / temp
    val rnorth = ell.a * (1.0 - ell.es) / (temp * temp * temp)
    val chdg = math.cos(phdg); val shdg = math.sin(phdg)
    h0 + (reast * rnorth) / (reast * chdg * chdg + rnorth * shdg * shdg)
  }
  private val cartSph = CartKernel(Ellipsoid(rcurv, 0.0))

  // row-major rotation matrix (sch.cpp:164-173)
  private val m: Array[Double] = {
    val chdg = math.cos(phdg); val shdg = math.sin(phdg)
    Array(
      clt * clo, -shdg * slo - slt * clo * chdg, slo * chdg - slt * clo * shdg,
      clt * slo, clo * shdg - slt * slo * chdg, -clo * chdg - slt * slo * shdg,
      slt, clt * chdg, clt * shdg)
  }
  private val xyzoff: Array[Double] = {
    val v = Array(plon, plat, h0, 0.0)
    cartEll.fwd(v)
    Array(v(0) - rcurv * clt * clo, v(1) - rcurv * clt * slo, v(2) - rcurv * slt)
  }

  def fwd(v: Array[Double]): Boolean = {
    if (!cartEll.fwd(v)) return false
    val px = v(0) - xyzoff(0)
    val py = v(1) - xyzoff(1)
    val pz = v(2) - xyzoff(2)
    // transpose rotation
    v(0) = m(0) * px + m(3) * py + m(6) * pz
    v(1) = m(1) * px + m(4) * py + m(7) * pz
    v(2) = m(2) * px + m(5) * py + m(8) * pz
    if (!cartSph.inv(v)) return false
    v(0) = v(0) * rcurv
    v(1) = v(1) * rcurv
    true
  }

  def inv(v: Array[Double]): Boolean = {
    v(0) = v(0) / rcurv
    v(1) = v(1) / rcurv
    if (!cartSph.fwd(v)) return false
    val px = v(0); val py = v(1); val pz = v(2)
    v(0) = m(0) * px + m(1) * py + m(2) * pz + xyzoff(0)
    v(1) = m(3) * px + m(4) * py + m(5) * pz + xyzoff(1)
    v(2) = m(6) * px + m(7) * py + m(8) * pz + xyzoff(2)
    cartEll.inv(v)
  }
}
