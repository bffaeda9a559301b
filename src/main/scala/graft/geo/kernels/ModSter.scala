package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Modified (oblated) stereographic family — a conformal stereographic
  * base warped by a complex polynomial (Snyder & Linck, USGS):
  * mil_os, lee_os, gs48, alsk, gs50.  Each variant hard-wires its
  * center, ellipsoid, and polynomial coefficients (behavioral
  * reference: /root/reference/src/projections/mod_ster.cpp +
  * src/zpoly1.cpp).  The polynomial is sum_{i=0..n} C(i)·z^(i+1). */
final case class ModSterKernel(override val ell: Ellipsoid,
                               zr: Array[Double], zi: Array[Double],
                               lat0: Double,
                               override val lam0: Double,
                               override val x0: Double = 0.0,
                               override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-12
  private val n = zr.length - 1
  private val (schio, cchio) = {
    val chio =
      if (ell.es != 0.0) {
        val esphi = ell.e * math.sin(lat0)
        2.0 * math.atan(math.tan((M.HalfPi + lat0) * 0.5) *
          math.pow((1.0 - esphi) / (1.0 + esphi), ell.e * 0.5)) - M.HalfPi
      } else lat0
    (math.sin(chio), math.cos(chio))
  }

  /** Horner evaluation of sum C_i z^(i+1) (reference pj_zpoly1) */
  private def zpoly1(pr: Double, pi: Double): (Double, Double) = {
    var ar = zr(n); var ai = zi(n)
    var k = n - 1
    while (k >= 0) {
      val t = ar
      ar = zr(k) + pr * t - pi * ai
      ai = zi(k) + pr * ai + pi * t
      k -= 1
    }
    val t = ar
    (pr * t - pi * ai, pr * ai + pi * t)
  }

  /** value + derivative (reference pj_zpolyd1) */
  private def zpolyd1(pr: Double, pi: Double): (Double, Double, Double, Double) = {
    var ar = zr(n); var ai = zi(n)
    var br = ar; var bi = ai
    var first = true
    var k = n - 1
    while (k >= 0) {
      if (first) first = false
      else {
        val t = br
        br = ar + pr * t - pi * bi
        bi = ai + pr * bi + pi * t
      }
      val t = ar
      ar = zr(k) + pr * t - pi * ai
      ai = zi(k) + pr * ai + pi * t
      k -= 1
    }
    val tb = br
    br = ar + pr * tb - pi * bi
    bi = ai + pr * bi + pi * tb
    val t = ar
    (pr * t - pi * ai, pr * ai + pi * t, br, bi)
  }

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val sinlon = math.sin(lam); val coslon = math.cos(lam)
    val esphi = ell.e * math.sin(phi)
    val chi = 2.0 * math.atan(math.tan((M.HalfPi + phi) * 0.5) *
      math.pow((1.0 - esphi) / (1.0 + esphi), ell.e * 0.5)) - M.HalfPi
    val schi = math.sin(chi); val cchi = math.cos(chi)
    val denom = 1.0 + schio * schi + cchio * cchi * coslon
    if (denom == 0) return err
    val s = 2.0 / denom
    zpoly1(s * cchi * sinlon, s * (cchio * schi - schio * cchi * coslon))
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var pr = x; var pi = y
    var nn = 20
    var converged = false
    while (nn > 0 && !converged) {
      val (fr0, fi0, fpr, fpi) = zpolyd1(pr, pi)
      val fr = fr0 - x; val fi = fi0 - y
      val den = fpr * fpr + fpi * fpi
      val dpr = -(fr * fpr + fi * fpi) / den
      val dpi = -(fi * fpr - fr * fpi) / den
      pr += dpr; pi += dpi
      if (math.abs(dpr) + math.abs(dpi) <= Eps) converged = true
      else nn -= 1
    }
    if (nn == 0) return err
    val rh = math.hypot(pr, pi)
    val z = 2.0 * math.atan(0.5 * rh)
    val sinz = math.sin(z); val cosz = math.cos(z)
    if (math.abs(rh) <= Eps) return (0.0, lat0)
    val chi = math.asin(math.max(-1.0, math.min(1.0,
      cosz * schio + pi * sinz * cchio / rh)))
    var phi = chi
    nn = 20
    converged = false
    while (nn > 0 && !converged) {
      val esphi = ell.e * math.sin(phi)
      val dphi = 2.0 * math.atan(math.tan((M.HalfPi + chi) * 0.5) *
        math.pow((1.0 + esphi) / (1.0 - esphi), ell.e * 0.5)) - M.HalfPi - phi
      phi += dphi
      if (math.abs(dphi) <= Eps) converged = true
      else nn -= 1
    }
    if (nn == 0) return err
    (math.atan2(pr * sinz, rh * cchio * cosz - pi * schio * sinz), phi)
  }
}

object ModSterKernel {
  /** Clarke 1866 with the reference's rounded es = 0.00676866 */
  private def clrk66Rounded: Ellipsoid = {
    val f = 1.0 - math.sqrt(1.0 - 0.00676866)
    Ellipsoid(6378206.4, 1.0 / f)
  }
  private def sphere(a: Double) = Ellipsoid(a, 0.0)
  private def deg(v: Double) = math.toRadians(v)

  def milOs(userEll: Ellipsoid, x0: Double, y0: Double): ModSterKernel =
    ModSterKernel(sphere(userEll.a),
      Array(0.924500, 0.0, 0.019430), Array(0.0, 0.0, 0.0),
      lat0 = deg(18), lam0 = deg(20), x0 = x0, y0 = y0)

  def leeOs(userEll: Ellipsoid, x0: Double, y0: Double): ModSterKernel =
    ModSterKernel(sphere(userEll.a),
      Array(0.721316, 0.0, -0.0088162), Array(0.0, 0.0, -0.00617325),
      lat0 = deg(-10), lam0 = deg(-165), x0 = x0, y0 = y0)

  def gs48(userEll: Ellipsoid, x0: Double, y0: Double): ModSterKernel =
    ModSterKernel(sphere(6370997.0),
      Array(0.98879, 0.0, -0.050909, 0.0, 0.075528),
      Array(0.0, 0.0, 0.0, 0.0, 0.0),
      lat0 = deg(39), lam0 = deg(-96), x0 = x0, y0 = y0)

  def alsk(userEll: Ellipsoid, x0: Double, y0: Double): ModSterKernel =
    if (userEll.es != 0.0)
      ModSterKernel(clrk66Rounded,
        Array(0.9945303, 0.0052083, 0.0072721, -0.0151089, 0.0642675, 0.3582802),
        Array(0.0, -0.0027404, 0.0048181, -0.1932526, -0.1381226, -0.2884586),
        lat0 = deg(64), lam0 = deg(-152), x0 = x0, y0 = y0)
    else
      ModSterKernel(sphere(6370997.0),
        Array(0.9972523, 0.0052513, 0.0074606, -0.0153783, 0.0636871, 0.3660976),
        Array(0.0, -0.0041175, 0.0048125, -0.1968253, -0.1408027, -0.2937382),
        lat0 = deg(64), lam0 = deg(-152), x0 = x0, y0 = y0)

  def gs50(userEll: Ellipsoid, x0: Double, y0: Double): ModSterKernel =
    if (userEll.es != 0.0)
      ModSterKernel(clrk66Rounded,
        Array(0.9827497, 0.0210669, -0.1031415, -0.0323337, 0.0502303,
          0.0251805, -0.0012315, 0.0072202, -0.0194029, -0.0210072),
        Array(0.0, 0.0053804, -0.0571664, -0.0322847, 0.1211983,
          0.0895678, -0.1416121, -0.1317091, 0.0759677, 0.0834037),
        lat0 = deg(45), lam0 = deg(-120), x0 = x0, y0 = y0)
    else
      ModSterKernel(sphere(6370997.0),
        Array(0.9842990, 0.0211642, -0.1036018, -0.0329095, 0.0499471,
          0.0260460, 0.0007388, 0.0075848, -0.0216473, -0.0225161),
        Array(0.0, 0.0037608, -0.0575102, -0.0320119, 0.1223335,
          0.0899805, -0.1435792, -0.1334108, 0.0776645, 0.0853673),
        lat0 = deg(45), lam0 = deg(-120), x0 = x0, y0 = y0)
}
