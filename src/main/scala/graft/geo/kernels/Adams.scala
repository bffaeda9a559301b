package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** The Adams elliptic-integral family — Guyou, Peirce Quincuncial (all
  * six shapes + scroll), Adams Hemisphere-in-a-Square, Adams World in a
  * Square I/II — one kernel with per-mode math (behavioral reference:
  * /root/reference/src/projections/adams.cpp). */
object AdamsMode extends Enumeration {
  val Guyou, PeirceQ, AdamsHemi, AdamsWs1, AdamsWs2 = Value
}
object PeirceShape extends Enumeration {
  val Square, Diamond, NHemisphere, SHemisphere, Horizontal, Vertical = Value
}

final case class AdamsKernel(override val ell: Ellipsoid,
                             mode: AdamsMode.Value,
                             pqShape: PeirceShape.Value = PeirceShape.Diamond,
                             scrollX: Double = 0.0, scrollY: Double = 0.0,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0)
    with GenericInverse2D {
  import AdamsMode._
  import PeirceShape._
  private val Tol = 1e-9
  private val RSqrt2 = 0.7071067811865475244008443620
  private val Shd = 1.8540746773013719 * 2

  override def invertible: Boolean = mode match {
    case AdamsWs2 => true
    case PeirceQ  => pqShape == Square || pqShape == Diamond
    case _        => false
  }

  /** incomplete elliptic integral (Chebyshev series, reference
    * ell_int_5). */
  private def ellInt5(phi: Double): Double = {
    val C0 = 2.19174570831038
    val C = Array(-8.58691003636495e-07, 2.02692115653689e-07,
      3.12960480765314e-05, 5.30394739921063e-05, -0.0012804644680613,
      -0.00575574836830288, 0.0914203033408211)
    var y = phi * (2.0 / math.Pi)
    y = 2.0 * y * y - 1.0
    val y2 = 2.0 * y
    var d1 = 0.0; var d2 = 0.0
    var i = 0
    while (i < C.length) {
      val temp = d1
      d1 = y2 * d1 - d2 + C(i)
      d2 = temp
      i += 1
    }
    phi * (y * d1 - d2 + 0.5 * C0)
  }

  private def aacos(x: Double): Double =
    math.acos(math.max(-1.0, math.min(1.0, x)))
  private def aasin(x: Double): Double =
    math.asin(math.max(-1.0, math.min(1.0, x)))

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var a = 0.0; var b = 0.0
    var sm = false; var sn = false
    mode match {
      case Guyou =>
        if ((math.abs(lam) - Tol) > M.HalfPi) return err
        if (math.abs(math.abs(phi) - M.HalfPi) < Tol)
          return (0.0, if (phi < 0) -1.85407 else 1.85407)
        val sl = math.sin(lam); val sp = math.sin(phi); val cp = math.cos(phi)
        a = aacos((cp * sl - sp) * RSqrt2)
        b = aacos((cp * sl + sp) * RSqrt2)
        sm = lam < 0; sn = phi < 0
      case PeirceQ =>
        if (pqShape == NHemisphere && phi < -Tol) return err
        if (pqShape == SHemisphere && phi > -Tol) return err
        val sl = math.sin(lam); val cl = math.cos(lam); val cp = math.cos(phi)
        a = aacos(cp * (sl + cl) * RSqrt2)
        b = aacos(cp * (sl - cl) * RSqrt2)
        sm = sl < 0; sn = cl > 0
      case AdamsHemi =>
        val sp = math.sin(phi)
        if ((math.abs(lam) - Tol) > M.HalfPi) return err
        var aa = math.cos(phi) * math.sin(lam)
        sm = (sp + aa) < 0; sn = (sp - aa) < 0
        a = aacos(aa)
        b = M.HalfPi - phi
      case AdamsWs1 =>
        val sp = math.tan(0.5 * phi)
        val bb = math.cos(aasin(sp)) * math.sin(0.5 * lam)
        a = aacos((bb - sp) * RSqrt2)
        b = aacos((bb + sp) * RSqrt2)
        sm = lam < 0; sn = phi < 0
      case AdamsWs2 =>
        val spp = math.tan(0.5 * phi)
        val aa = math.cos(aasin(spp)) * math.sin(0.5 * lam)
        sm = (spp + aa) < 0; sn = (spp - aa) < 0
        b = aacos(spp)
        a = aacos(aa)
    }
    var m = aasin(math.sqrt(1.0 + math.min(0.0, math.cos(a + b))))
    if (sm) m = -m
    var n = aasin(math.sqrt(math.abs(1.0 - math.max(0.0, math.cos(a - b)))))
    if (sn) n = -n
    var x = ellInt5(m)
    var y = ellInt5(n)
    if (mode == PeirceQ) {
      if (pqShape == Square || pqShape == Diamond) {
        if (phi < 0) { // fold out segments
          if (lam < -0.75 * math.Pi) y = Shd - y
          if (lam < -0.25 * math.Pi && lam >= -0.75 * math.Pi) x = -Shd - x
          if (lam < 0.25 * math.Pi && lam >= -0.25 * math.Pi) y = -Shd - y
          if (lam < 0.75 * math.Pi && lam >= 0.25 * math.Pi) x = Shd - x
          if (lam >= 0.75 * math.Pi) y = Shd - y
        }
      }
      if (pqShape == Square) {
        val temp = x
        x = RSqrt2 * (x - y)
        y = RSqrt2 * (temp + y)
      }
      if (pqShape == Horizontal) {
        if (phi < 0) x = Shd - x
        x -= Shd / 2
        if (scrollX != 0.0) {
          val xscale = 2.0
          val xthresh = Shd / 2
          x += scrollX * (xthresh * 2 * xscale)
          if (x >= xthresh * xscale) x -= Shd * xscale
          else if (x < -(xthresh * xscale)) x += Shd * xscale
        }
      }
      if (pqShape == Vertical) {
        if (phi < 0) y = Shd - y
        y -= Shd / 2
        if (scrollY != 0.0) {
          val yscale = 2.0
          val ythresh = Shd / 2
          y += scrollY * (ythresh * 2 * yscale)
          if (y >= ythresh * yscale) y -= Shd * yscale
          else if (y < -(ythresh * yscale)) y += Shd * yscale
        }
      }
    }
    if (mode == AdamsHemi || mode == AdamsWs2) { // rotate 45 deg
      val temp = x
      x = RSqrt2 * (x - y)
      y = RSqrt2 * (temp + y)
    }
    (x, y)
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    if (mode == AdamsWs2) {
      val phi0 = math.max(math.min(y / 2.62181347, 1.0), -1.0) * M.HalfPi
      val lam0g =
        if (math.abs(phi0) >= M.HalfPi) 0.0
        else math.max(math.min(x / 2.62205760 / math.cos(phi0), 1.0), -1.0) * math.Pi
      genericInverse2d(x, y, lam0g, phi0, tol = 1e-10)
    } else if (mode == PeirceQ && pqShape == PeirceShape.Square) {
      var lam = 0.0; var phi = 0.0
      if (x == 0 && y < 0) {
        lam = -math.Pi / 4
        if (math.abs(y) < 2.622057580396) phi = math.Pi / 4
      } else if (x > 0 && math.abs(y) < 1e-7) lam = math.Pi / 4
      else if (x < 0 && math.abs(y) < 1e-7) {
        lam = -3 * math.Pi / 4
        phi = M.HalfPi / 2.622057574224 * x + M.HalfPi
      } else if (math.abs(x) < 1e-7 && y > 0) lam = 3 * math.Pi / 4
      else if (x >= 0 && y <= 0) {
        lam = 0
        if (x == 0 && y == 0) return (0.0, M.HalfPi)
      } else if (x >= 0 && y >= 0) lam = math.Pi / 2
      else if (x <= 0 && y >= 0) {
        lam = if (math.abs(x) < math.abs(y)) math.Pi * 0.9 else -math.Pi * 0.9
      } else lam = -math.Pi / 2
      genericInverse2d(x, y, lam, phi, tol = 1e-10)
    } else if (mode == PeirceQ && pqShape == PeirceShape.Diamond) {
      var lam = 0.0; var phi = 0.0
      if (x >= 0 && y <= 0) {
        lam = math.Pi / 4
        if (x > 0 && y == 0) { lam = math.Pi / 2; phi = 0 }
        else if (x == 0 && y == 0) return (0.0, M.HalfPi)
        else if (x == 0 && y < 0) { lam = 0; phi = math.Pi / 4 }
      } else if (x >= 0 && y >= 0) lam = 3 * math.Pi / 4
      else if (x <= 0 && y >= 0) lam = -3 * math.Pi / 4
      else lam = -math.Pi / 4
      if (math.abs(x) > 1.8540746773013719 + 1e-3 ||
          math.abs(y) > 1.8540746773013719 + 1e-3) phi = -math.Pi / 4
      genericInverse2d(x, y, lam, phi, tol = 1e-10)
    } else err
  }
}

/** Spilhaus world-ocean map — oblique conformal transform feeding
  * Adams WS2, with azimuth/rotation/conformal-distortion parameters
  * (behavioral reference: /root/reference/src/projections/spilhaus.cpp). */
final case class SpilhausKernel(override val ell: Ellipsoid,
                                lat0: Double, azimuth: Double,
                                rotation: Double, k0: Double = 1.0,
                                override val lam0: Double,
                                override val x0: Double = 0.0,
                                override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val adams = AdamsKernel(Ellipsoid.UnitSphere, AdamsMode.AdamsWs2)
  private val cosrot = math.cos(rotation)
  private val sinrot = math.sin(rotation)

  /** exact conformal latitude chi(phi) */
  private def conformalLat(phi: Double): Double = {
    if (ell.isSphere) return phi
    val psi = M.asinh(math.tan(phi)) - ell.e * M.atanh(ell.e * math.sin(phi))
    math.atan(math.sinh(psi))
  }
  private def conformalLatInv(chi: Double): Double =
    if (ell.isSphere) chi
    else math.atan(M.sinhpsi2tanphi(math.tan(chi), ell.e))

  private val chiC = conformalLat(lat0)
  private val sinalpha = -math.cos(chiC) * math.cos(azimuth)
  private val cosalpha = math.sqrt(1 - sinalpha * sinalpha)
  private val lambda0i = math.atan2(math.tan(azimuth), -math.sin(chiC))
  private val beta = math.Pi + math.atan2(-math.sin(azimuth), -math.tan(chiC))
  private val confDist = math.cos(lat0) /
    math.sqrt(1 - ell.es * math.sin(lat0) * math.sin(lat0)) / math.cos(chiC)

  private def aasin(x: Double): Double =
    math.asin(math.max(-1.0, math.min(1.0, x)))

  protected def project(lamIn: Double, phiIn: Double): (Double, Double) = {
    val chi = conformalLat(phiIn)
    val cosc = math.cos(chi); val sinc = math.sin(chi)
    val coslam = math.cos(lamIn - lambda0i)
    val sinlam = math.sin(lamIn - lambda0i)
    val aPhi = aasin(sinalpha * sinc - cosalpha * cosc * coslam)
    var aLam = beta + math.atan2(cosc * sinlam,
      sinalpha * cosc * coslam + cosalpha * sinc)
    while (aLam > math.Pi) aLam -= 2 * math.Pi
    while (aLam < -math.Pi) aLam += 2 * math.Pi
    val (xa, ya) = adams.rawProject(aLam, aPhi)
    if (xa.isNaN) return err
    val factor = confDist * k0
    (-(xa * cosrot + ya * sinrot) * factor,
      -(xa * -sinrot + ya * cosrot) * factor)
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val factor = 1.0 / (confDist * k0)
    val xa = -(x * cosrot + y * -sinrot) * factor
    val ya = -(x * sinrot + y * cosrot) * factor
    val (aLam, aPhi) = adams.rawUnproject(xa, ya)
    if (aLam.isNaN) return err
    val coss = math.cos(aPhi); val sins = math.sin(aPhi)
    val cosl = math.cos(aLam - beta); val sinl = math.sin(aLam - beta)
    var phi = aasin(sinalpha * sins + cosalpha * coss * cosl)
    val lam = lambda0i + math.atan2(coss * sinl,
      sinalpha * coss * cosl - cosalpha * sins)
    phi = conformalLatInv(phi)
    // base inv adds lam0 back; our lam is already absolute-relative to
    // lam0-shifted input, matching the reference flow
    (lam, phi)
  }
}