package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Oblique Cylindrical Equal Area (spherical; behavioral reference:
  * /root/reference/src/projections/ocea.cpp).  The central meridian is
  * derived from the pole (construction via the companion). */
final class OceaKernel private (ell0: Ellipsoid, lam0v: Double,
                                x00: Double, y00: Double,
                                sinphi: Double, cosphi: Double, k0: Double)
    extends ProjectionKernel(Ellipsoid(ell0.a, 0.0), lam0v, x00, y00) {
  private val rok = 1.0 / k0
  private val rtk = k0

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val y0v = math.sin(lam)
    val t = math.cos(lam)
    var x = math.atan((math.tan(phi) * cosphi + sinphi * y0v) / t)
    if (t < 0) x += math.Pi
    x *= rtk
    val y = rok * (sinphi * math.sin(phi) - cosphi * math.cos(phi) * y0v)
    (x, y)
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    val y = yIn / rok
    val x = xIn / rtk
    val t = math.sqrt(1.0 - y * y)
    val s = math.sin(x)
    val phi = math.asin(y * sinphi + t * cosphi * s)
    val lam = math.atan2(t * sinphi * s - y * cosphi, t * math.cos(x))
    (lam, phi)
  }
}

object OceaKernel {
  /** alpha/lonc form (angles radians, alpha from north clockwise). */
  def fromAzimuth(ell: Ellipsoid, lat0: Double, lonc: Double, alphaIn: Double,
                  k0: Double = 1.0, x0: Double = 0.0, y0: Double = 0.0): OceaKernel = {
    val alpha = math.Pi + alphaIn
    val lamP = math.atan2(-math.cos(alpha), -math.sin(lat0) * math.sin(alpha)) + lonc
    val phiP = math.asin(math.cos(lat0) * math.sin(alpha))
    build(ell, lamP, phiP, k0, x0, y0)
  }

  /** two-point form. */
  def fromTwoPoints(ell: Ellipsoid, phi1: Double, lam1: Double,
                    phi2: Double, lam2: Double,
                    k0: Double = 1.0, x0: Double = 0.0, y0: Double = 0.0): OceaKernel = {
    var lamP = math.atan2(
      math.cos(phi1) * math.sin(phi2) * math.cos(lam1) -
        math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
      math.sin(phi1) * math.cos(phi2) * math.sin(lam2) -
        math.cos(phi1) * math.sin(phi2) * math.sin(lam1))
    if (lam1 == -M.HalfPi) lamP = -lamP
    val cosD = math.cos(lamP - lam1)
    val tanPhi1 = math.tan(phi1)
    val phiP =
      if (tanPhi1 == 0.0) { if (cosD >= 0.0) -M.HalfPi else M.HalfPi }
      else math.atan(-cosD / tanPhi1)
    build(ell, lamP, phiP, k0, x0, y0)
  }

  private def build(ell: Ellipsoid, lamP: Double, phiP: Double, k0: Double,
                    x0: Double, y0: Double): OceaKernel =
    new OceaKernel(ell, lamP + M.HalfPi, x0, y0,
      math.sin(phiP), math.cos(phiP), k0)
}

/** Two-point equidistant (spherical; behavioral reference:
  * /root/reference/src/projections/tpeqd.cpp). */
final class TpeqdKernel private (ell0: Ellipsoid, lam0v: Double,
                                 x00: Double, y00: Double,
                                 cp1: Double, sp1: Double, cp2: Double, sp2: Double,
                                 ccs: Double, cs: Double, sc: Double,
                                 r2z0: Double, z02: Double, dlam2: Double,
                                 hz0: Double, thz0: Double, rhshz0: Double,
                                 ca: Double, sa: Double, lp: Double, lamc: Double)
    extends ProjectionKernel(Ellipsoid(ell0.a, 0.0), lam0v, x00, y00) {

  // M.aacos: clamp 1-ulp noise, NaN (error) beyond ONE_TOL like the
  // reference — a bare clamp fabricated coordinates for out-of-lens
  // planar input on the inverse
  private def aacos(x: Double): Double = M.aacos(x)
  private def asqrt(x: Double): Double = if (x < 0) 0.0 else math.sqrt(x)

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val sp = math.sin(phi); val cp = math.cos(phi)
    val dl1 = lam + dlam2
    val dl2 = lam - dlam2
    var z1 = aacos(sp1 * sp + cp1 * cp * math.cos(dl1))
    var z2 = aacos(sp2 * sp + cp2 * cp * math.cos(dl2))
    z1 *= z1; z2 *= z2
    var t = z1 - z2
    val x = r2z0 * t
    t = z02 - t
    var y = r2z0 * asqrt(4.0 * z02 * z2 - t * t)
    if ((ccs * sp - cp * (cs * math.sin(dl1) - sc * math.sin(dl2))) < 0) y = -y
    (x, y)
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val cz1 = math.cos(math.hypot(y, x + hz0))
    val cz2 = math.cos(math.hypot(y, x - hz0))
    var s = cz1 + cz2
    val d = cz1 - cz2
    var lam = -math.atan2(d, s * thz0)
    var phi = aacos(math.hypot(thz0 * s, d) * rhshz0)
    if (y < 0) phi = -phi
    val sp = math.sin(phi); val cp = math.cos(phi)
    lam -= lp
    s = math.cos(lam)
    phi = math.asin(math.max(-1.0, math.min(1.0, sa * sp + ca * cp * s)))
    val lamOut = math.atan2(cp * math.sin(lam), sa * cp * s - ca * sp) + lamc
    (lamOut, phi)
  }
}

object TpeqdKernel {
  def apply(ell: Ellipsoid, phi1: Double, lam1: Double,
            phi2: Double, lam2: Double,
            x0: Double = 0.0, y0: Double = 0.0): TpeqdKernel = {
    require(!(phi1 == phi2 && lam1 == lam2), "tpeqd identical points")
    val lam0 = M.adjlon(0.5 * (lam1 + lam2))
    var dlam2 = M.adjlon(lam2 - lam1)
    val cp1 = math.cos(phi1); val cp2 = math.cos(phi2)
    val sp1 = math.sin(phi1); val sp2 = math.sin(phi2)
    val cs = cp1 * sp2; val sc = sp1 * cp2
    val ccs = cp1 * cp2 * math.sin(dlam2)
    def sq(x: Double) = x * x
    val csMinus = cs - sc * math.cos(dlam2)
    var z02 = math.atan2(
      math.sqrt(sq(cp2 * math.sin(dlam2)) + sq(csMinus)),
      sp1 * sp2 + cp1 * cp2 * math.cos(dlam2))
    require(z02 != 0.0, "tpeqd |lat| = 90 degenerate")
    val hz0 = 0.5 * z02
    val a12 = math.atan2(cp2 * math.sin(dlam2), csMinus)
    val pp = math.asin(math.max(-1.0, math.min(1.0, cp1 * math.sin(a12))))
    val ca = math.cos(pp); val sa = math.sin(pp)
    val lp = M.adjlon(math.atan2(cp1 * math.cos(a12), sp1) - hz0)
    dlam2 *= 0.5
    val lamc = M.HalfPi - math.atan2(math.sin(a12) * sp1, math.cos(a12)) - dlam2
    val thz0 = math.tan(hz0)
    val rhshz0 = 0.5 / math.sin(hz0)
    val r2z0 = 0.5 / z02
    z02 *= z02
    new TpeqdKernel(ell, lam0, x0, y0, cp1, sp1, cp2, sp2, ccs, cs, sc,
      r2z0, z02, dlam2, hz0, thz0, rhshz0, ca, sa, lp, lamc)
  }
}

/** Van der Grinten I (spherical; Snyder p.241-242 quartic solution;
  * behavioral reference: /root/reference/src/projections/vandg.cpp). */
final case class VandgKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0,
                             over: Boolean = false)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  override protected def overFlag: Boolean = over
  private val Tol = 1e-10
  private val Third = 1.0 / 3
  private val C227 = 2.0 / 27
  private val Pi43 = 4.18879020478639098458
  private val PiSq = 9.86960440108935861869
  private val TPiSq = 19.73920880217871723738
  private val HPiSq = 4.93480220054467930934

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var p2 = math.abs(phi / M.HalfPi)
    if ((p2 - Tol) > 1.0) return err
    if (p2 > 1.0) p2 = 1.0
    if (math.abs(phi) <= Tol) (lam, 0.0)
    else if (math.abs(lam) <= Tol || math.abs(p2 - 1.0) < Tol) {
      val y = math.Pi * math.tan(0.5 * math.asin(p2))
      (0.0, if (phi < 0) -y else y)
    } else {
      // +over continuation past the antimeridian: A changes sign for
      // |lam| > pi (vandg.cpp:20-24)
      val signA = if (over && math.abs(lam) > math.Pi) -1.0 else 1.0
      val al = 0.5 * signA * math.abs(math.Pi / lam - lam / math.Pi)
      val al2 = al * al
      var g = math.sqrt(1.0 - p2 * p2)
      g = g / (p2 + g - 1.0)
      val g2 = g * g
      var pp2 = g * (2.0 / p2 - 1.0)
      pp2 = pp2 * pp2
      var x = g - pp2
      val gg = pp2 + al2
      x = math.Pi * math.abs(al * x + math.sqrt(al2 * x * x - gg * (g2 - pp2))) / gg
      if (lam < 0) x = -x
      var y = math.abs(x / math.Pi)
      y = 1.0 - y * (y + 2.0 * al)
      if (y < -Tol) return err
      y = if (y < 0) 0.0 else math.sqrt(y) * (if (phi < 0) -math.Pi else math.Pi)
      (x, y)
    }
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val x2 = x * x
    val ay = math.abs(y)
    if (ay < Tol) {
      val t = x2 * x2 + TPiSq * (x2 + HPiSq)
      return (if (math.abs(x) <= Tol) 0.0
              else 0.5 * (x2 - PiSq + math.sqrt(t)) / x, 0.0)
    }
    val y2 = y * y
    val r = x2 + y2
    val r2 = r * r
    val c1 = -math.Pi * ay * (r + PiSq)
    val c3 = r2 + M.TwoPi * (ay * r + math.Pi * (y2 + math.Pi * (ay + M.HalfPi)))
    var c2 = c1 + PiSq * (r - 3.0 * y2)
    val c0 = math.Pi * ay
    c2 /= c3
    val al = c1 / c3 - Third * c2 * c2
    val m = 2.0 * math.sqrt(-Third * al)
    var d = C227 * c2 * c2 * c2 + (c0 * c0 - Third * c2 * c1) / c3
    val alM = al * m
    if (math.abs(alM) < 1e-16) return err
    d = 3.0 * d / alM
    val t = math.abs(d)
    if ((t - Tol) <= 1.0) {
      var dd = if (t > 1.0) { if (d > 0) 0.0 else math.Pi } else math.acos(d)
      // r > pi^2 only for points generated with |lon| > 180 under +over:
      // pick the other cosine branch (vandg.cpp:29-17 comment)
      if (r > PiSq) dd = M.TwoPi - dd
      var phi = math.Pi * (m * math.cos(dd * Third + Pi43) - Third * c2)
      if (y < 0) phi = -phi
      val tt = r2 + TPiSq * (x2 - y2 + HPiSq)
      val lam =
        if (math.abs(x) <= Tol) 0.0
        else 0.5 * (r - PiSq + (if (tt <= 0) 0.0 else math.sqrt(tt))) / x
      (lam, phi)
    } else err
  }
}