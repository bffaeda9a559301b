package graft.geo.proj

import graft.geo.kernels.ProjectionKernel
import graft.geo.math.{ProjMath => M}

/** Cartographic scale/distortion diagnostics at a point — the engine's
  * `proj_factors` (reference: /root/reference/src/factors.cpp:15-132 with
  * the 4-point numerical derivative of /root/reference/src/deriv.cpp).
  *
  * All factors are computed from the raw (unit-sphere) projection kernel,
  * so meridional/parallel scales come out as the classic dimensionless h
  * and k.  The ellipsoidal corrections mirror the reference exactly.
  */
object ProjFactors {

  final case class Factors(
      meridionalScale: Double,     // h
      parallelScale: Double,       // k
      arealScale: Double,          // s
      angularDistortion: Double,   // omega
      meridianParallelAngle: Double, // theta'
      meridianConvergence: Double, // conv
      tissotSemimajor: Double, tissotSemiminor: Double,
      dxDlam: Double, dxDphi: Double, dyDlam: Double, dyDphi: Double)

  private final val DefaultH = 1e-5
  private final val Eps = 1e-12

  private def aasin(v: Double): Double =
    math.asin(math.max(-1.0, math.min(1.0, v)))

  /** Numerical derivatives of the raw projection at (lam, phi), step h
    * (reference: pj_deriv, deriv.cpp:8-70). Returns (xL, xP, yL, yP) or
    * null on a domain error. */
  private def deriv(k: ProjectionKernel, lam: Double, phi: Double,
                    hIn: Double): Array[Double] = {
    var h = hIn
    val p1 = k.rawProject(lam + h, phi + h)
    if (p1._1.isNaN) return null
    var xL = p1._1; var yP = p1._2; var xP = p1._1; var yL = p1._2
    if (math.abs(phi - h) > M.HalfPi) return null
    val p2 = k.rawProject(lam + h, phi - h)
    if (p2._1.isNaN) return null
    xL += p2._1; yP -= p2._2; xP -= p2._1; yL += p2._2
    val p3 = k.rawProject(lam - h, phi - h)
    if (p3._1.isNaN) return null
    xL -= p3._1; yP -= p3._2; xP -= p3._1; yL -= p3._2
    val p4 = k.rawProject(lam - h, phi + h)
    if (p4._1.isNaN) return null
    xL -= p4._1; yP += p4._2; xP += p4._1; yL -= p4._2
    val d = 4.0 * h
    Array(xL / d, xP / d, yL / d, yP / d)
  }

  /** Factors at geographic (lamDeg, latDeg) for the projection kernel
    * `k`; None if the point is outside the projection domain. */
  def at(k: ProjectionKernel, lonDeg: Double, latDeg: Double,
         hStep: Double = DefaultH): Option[Factors] = {
    val h = if (math.abs(hStep) < Eps) DefaultH else math.abs(hStep)
    var phi = math.toRadians(latDeg)
    var lam = math.toRadians(lonDeg)
    if (math.abs(phi) - M.HalfPi > Eps || math.abs(lam) > 10.0) return None
    // nudge off the pole so the derivative exists
    if (math.abs(phi) > M.HalfPi - h)
      phi = if (phi < 0) -(M.HalfPi - h) else M.HalfPi - h
    lam = M.adjlon(lam - k.lam0)

    val der = deriv(k, lam, phi, h)
    if (der == null) return None
    val xL = der(0); val xP = der(1); val yL = der(2); val yP = der(3)

    val cosphi = math.cos(phi)
    var hFac = math.hypot(xP, yP)
    var kFac = math.hypot(xL, yL) / cosphi
    var r = 1.0
    if (k.ell.es != 0.0) {
      val sinphi = math.sin(phi)
      val t = 1.0 - k.ell.es * sinphi * sinphi
      val n = math.sqrt(t)
      hFac *= t * n / k.ell.oneEs
      kFac *= n
      r = t * t / k.ell.oneEs
    }
    val conv = -math.atan2(xP, yP)
    val s = (yP * xL - xP * yL) * r / cosphi
    val thetap = aasin(s / (hFac * kFac))
    var t2 = kFac * kFac + hFac * hFac
    val a0 = math.sqrt(t2 + 2.0 * s)
    t2 = t2 - 2.0 * s
    val t3 = if (t2 > 0) math.sqrt(t2) else 0.0
    val b = 0.5 * (a0 - t3)
    val a = 0.5 * (a0 + t3)
    val omega = 2.0 * aasin((a - b) / (a + b))
    Some(Factors(hFac, kFac, s, omega, thetap, conv, a, b, xL, xP, yL, yP))
  }

  /** Convenience: factors for a proj-string defining a plain projection. */
  def at(projString: String, lonDeg: Double, latDeg: Double): Option[Factors] =
    ProjString.parse(projString) match {
      case pk: ProjectionKernel => at(pk, lonDeg, latDeg)
      case _ => None
    }
}
