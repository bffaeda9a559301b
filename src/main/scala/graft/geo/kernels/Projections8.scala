package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Simple-conic family — Euler, Murdoch I/II/III, Perspective Conic,
  * Tissot, Vitkovsky I — one shared kernel with per-type constants
  * (behavioral reference: /root/reference/src/projections/sconics.cpp). */
object SconicType extends Enumeration {
  val Euler, Murd1, Murd2, Murd3, Pconic, Tissot, Vitk1 = Value
}

final case class SconicKernel(override val ell: Ellipsoid,
                              typ: SconicType.Value,
                              lat1: Double, lat2: Double, lat0: Double = 0.0,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  import SconicType._
  private val Eps = 1e-10
  private val delIn = 0.5 * (lat2 - lat1)
  private val sig = 0.5 * (lat2 + lat1)
  require(math.abs(delIn) >= Eps && math.abs(sig) >= Eps,
    "sconic |lat_1 - lat_2| and |lat_1 + lat_2| should be > 0")

  private val (nc, rhoC, rho0, c1, c2) = {
    var del = delIn
    typ match {
      case Tissot =>
        val n = math.sin(sig)
        val cs = math.cos(del)
        val rc = n / cs + cs / n
        (n, rc, math.sqrt((rc - 2 * math.sin(lat0)) / n), 0.0, 0.0)
      case Murd1 =>
        val rc = math.sin(del) / (del * math.tan(sig)) + sig
        (math.sin(sig), rc, rc - lat0, 0.0, 0.0)
      case Murd2 =>
        val cs = math.sqrt(math.cos(del))
        val rc = cs / math.tan(sig)
        (math.sin(sig) * cs, rc, rc + math.tan(sig - lat0), 0.0, 0.0)
      case Murd3 =>
        val rc = del / (math.tan(sig) * math.tan(del)) + sig
        (math.sin(sig) * math.sin(del) * math.tan(del) / (del * del),
          rc, rc - lat0, 0.0, 0.0)
      case Euler =>
        val n = math.sin(sig) * math.sin(del) / del
        del *= 0.5
        val rc = del / (math.tan(del) * math.tan(sig)) + sig
        (n, rc, rc - lat0, 0.0, 0.0)
      case Pconic =>
        val n = math.sin(sig)
        val cc2 = math.cos(del)
        val cc1 = 1.0 / math.tan(sig)
        val d0 = lat0 - sig
        require(math.abs(d0) - Eps < M.HalfPi,
          "pconic |lat_0 - (lat_1+lat_2)/2| >= 90")
        (n, 0.0, cc2 * (cc1 - math.tan(d0)), cc1, cc2)
      case Vitk1 =>
        val cs = math.tan(del)
        val rc = del / (cs * math.tan(sig)) + sig
        (cs * math.sin(sig) / del, rc, rc - lat0, 0.0, 0.0)
    }
  }

  protected def project(lamIn: Double, phi: Double): (Double, Double) = {
    val rho = typ match {
      case Murd2  => rhoC + math.tan(sig - phi)
      case Pconic => c2 * (c1 - math.tan(phi - sig))
      case _      => rhoC - phi
    }
    val lam = lamIn * nc
    (rho * math.sin(lam), rho0 - rho * math.cos(lam))
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn
    var y = rho0 - yIn
    var rho = math.hypot(x, y)
    if (nc < 0) { rho = -rho; x = -x; y = -y }
    val lam = math.atan2(x, y) / nc
    val phi = typ match {
      case Pconic => math.atan(c1 - rho / c2) + sig
      case Murd2  => sig - math.atan(rho - rhoC)
      case _      => rhoC - rho
    }
    (lam, phi)
  }
}

/** Sine-tangent pseudo-cylindrical series — Foucaut, Kavrayskiy V,
  * Quartic Authalic, McBryde-Thomas Flat-Polar Sine No.1 (behavioral
  * reference: /root/reference/src/projections/sts.cpp). */
final case class StsKernel(override val ell: Ellipsoid,
                           p: Double, q: Double, tanMode: Boolean,
                           override val lam0: Double = 0.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  private val cx = q / p
  private val cy = p
  private val cp = 1.0 / q

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    var x = cx * lam * math.cos(phiIn)
    var y = cy
    val phi = phiIn * cp
    val c = math.cos(phi)
    if (tanMode) { x *= c * c; y *= math.tan(phi) }
    else { x /= c; y *= math.sin(phi) }
    (x, y)
  }

  protected def unproject(x: Double, yIn: Double): (Double, Double) = {
    val y = yIn / cy
    val phi0 = if (tanMode) math.atan(y)
               else M.aasin(y) // NaN (error) beyond ONE_TOL, like aasin
    val c = math.cos(phi0)
    val phi = phi0 / cp
    var lam = x / (cx * math.cos(phi))
    if (tanMode) lam /= c * c else lam *= c
    (lam, phi)
  }
}

object StsKernel {
  def fouc(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    StsKernel(ell, 2.0, 2.0, tanMode = true, lam0, x0, y0)
  def kav5(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    StsKernel(ell, 1.50488, 1.35439, tanMode = false, lam0, x0, y0)
  def quaAut(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    StsKernel(ell, 2.0, 2.0, tanMode = false, lam0, x0, y0)
  def mbtS(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    StsKernel(ell, 1.48875, 1.36509, tanMode = false, lam0, x0, y0)
}

/** Hammer (Elliptical) / Eckert-Greifendorff via W= (behavioral
  * reference: /root/reference/src/projections/hammer.cpp). */
final case class HammerKernel(override val ell: Ellipsoid,
                              wIn: Double = 0.5, mIn: Double = 1.0,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  private val Eps = 1e-10
  require(wIn > 0, "hammer W <= 0")
  require(mIn > 0, "hammer M <= 0")
  private val w = wIn
  private val rm = 1.0 / mIn
  private val m = mIn / w

  protected def project(lamIn: Double, phi: Double): (Double, Double) = {
    val cosphi = math.cos(phi)
    val lam = lamIn * w
    val denom = 1.0 + cosphi * math.cos(lam)
    if (denom == 0.0) return err
    val d = math.sqrt(2.0 / denom)
    (m * d * cosphi * math.sin(lam), rm * d * math.sin(phi))
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val z = math.sqrt(1.0 - 0.25 * w * w * x * x - 0.25 * y * y)
    if (math.abs(2.0 * z * z - 1.0) < Eps) err
    else (math.atan2(w * x * z, 2.0 * z * z - 1.0) / w,
      math.asin(math.max(-1.0, math.min(1.0, z * y))))
  }
}

/** Tobler's cylindrical (area-preserving Mercator companion; behavioral
  * reference: /root/reference/src/projections/tobmerc.cpp). */
final case class TobMercKernel(override val ell: Ellipsoid,
                               k0: Double = 1.0,
                               override val lam0: Double = 0.0,
                               override val x0: Double = 0.0,
                               override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    if (math.abs(phi) >= M.HalfPi) return err
    val cosphi = math.cos(phi)
    (k0 * lam * cosphi * cosphi, k0 * M.asinh(math.tan(phi)))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = math.atan(math.sinh(y / k0))
    val cosphi = math.cos(phi)
    (x / k0 / (cosphi * cosphi), phi)
  }
}