package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Space Oblique Mercator — the satellite ground-track projection, with
  * the Landsat (`lsat`) and MISR (`misrsom`) parameterizations
  * (behavioral reference: /root/reference/src/projections/som.cpp).
  * Fourier constants integrated at setup via Simpson weights (seraz0). */
final case class SomKernel(override val ell: Ellipsoid,
                           alf: Double, p22: Double, rlm: Double,
                           override val lam0: Double,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Tol = 1e-7
  private val sa = math.sin(alf)
  private val ca = { val c = math.cos(alf); if (math.abs(c) < 1e-9) 1e-9 else c }
  private val esc = ell.es * ca * ca
  private val ess = ell.es * sa * sa
  private val w = { val w0 = (1.0 - esc) * ell.rOneEs; w0 * w0 - 1.0 }
  private val q = ess * ell.rOneEs
  private val t = ess * (2.0 - ell.es) * ell.rOneEs * ell.rOneEs
  private val u = esc * ell.rOneEs
  private val xj = ell.oneEs * ell.oneEs * ell.oneEs
  private val rlm2 = rlm + M.TwoPi

  private val (a2, a4, b, c1, c3) = {
    var A2 = 0.0; var A4 = 0.0; var B = 0.0; var C1 = 0.0; var C3 = 0.0
    def seraz0(lamDeg: Double, mult: Double): Unit = {
      val lam = math.toRadians(lamDeg)
      val sd = math.sin(lam)
      val sdsq = sd * sd
      val s = p22 * sa * math.cos(lam) *
        math.sqrt((1.0 + t * sdsq) / ((1.0 + w * sdsq) * (1.0 + q * sdsq)))
      val d1 = 1.0 + q * sdsq
      val h = math.sqrt((1.0 + q * sdsq) / (1.0 + w * sdsq)) *
        ((1.0 + w * sdsq) / (d1 * d1) - p22 * ca)
      val sq = math.sqrt(xj * xj + s * s)
      var fc = mult * (h * xj - s * s) / sq
      B += fc
      A2 += fc * math.cos(lam + lam)
      A4 += fc * math.cos(lam * 4.0)
      fc = mult * s * (h + xj) / sq
      C1 += fc * math.cos(lam)
      C3 += fc * math.cos(lam * 3.0)
    }
    seraz0(0.0, 1.0)
    var lam = 9
    while (lam <= 81) { seraz0(lam, 4.0); lam += 18 }
    lam = 18
    while (lam <= 72) { seraz0(lam, 2.0); lam += 18 }
    seraz0(90.0, 1.0)
    (A2 / 30.0, A4 / 60.0, B / 30.0, C1 / 15.0, C3 / 45.0)
  }

  protected def project(lamIn: Double, phiIn: Double): (Double, Double) = {
    var phi = phiIn
    if (phi > M.HalfPi) phi = M.HalfPi
    else if (phi < -M.HalfPi) phi = -M.HalfPi
    var lampp = if (phi >= 0) M.HalfPi else math.Pi + M.HalfPi
    val tanphi = math.tan(phi)
    var lamt = 0.0; var lamdp = 0.0
    var l = 0
    var nn = 0
    var outer = true
    while (outer) {
      var sav = lampp
      val lamtp = lamIn + p22 * lampp
      val cl = math.cos(lamtp)
      val fac =
        if (cl < 0) lampp + math.sin(lampp) * M.HalfPi
        else lampp - math.sin(lampp) * M.HalfPi
      l = 50
      var innerDone = false
      while (l >= 0 && !innerDone) {
        lamt = lamIn + p22 * sav
        // stale cosine kept on the TOL nudge, as the reference does
        val c = math.cos(lamt)
        if (math.abs(c) < Tol) lamt -= Tol
        val xlam = (ell.oneEs * tanphi * sa + math.sin(lamt) * ca) / c
        lamdp = math.atan(xlam) + fac
        if (math.abs(math.abs(sav) - math.abs(lamdp)) < Tol) innerDone = true
        else { sav = lamdp; l -= 1 }
      }
      nn += 1
      if (l == 0 || nn >= 3 || (lamdp > rlm && lamdp < rlm2)) outer = false
      else {
        if (lamdp <= rlm) lampp = M.TwoPi + M.HalfPi
        else if (lamdp >= rlm2) lampp = M.HalfPi
      }
    }
    // converging exactly on the last allowed iteration (l==0) is the
    // reference's only forward-failure state; exhaustion (l==-1) is not
    if (l == 0) return err
    val sp = math.sin(phi)
    val phidp = math.asin(math.max(-1.0, math.min(1.0,
      (ell.oneEs * ca * sp - sa * math.cos(phi) * math.sin(lamt)) /
        math.sqrt(1.0 - ell.es * sp * sp))))
    val tanph = math.log(math.tan(M.FortPi + 0.5 * phidp))
    val sd = math.sin(lamdp)
    val sdsq = sd * sd
    val s = p22 * sa * math.cos(lamdp) *
      math.sqrt((1.0 + t * sdsq) / ((1.0 + w * sdsq) * (1.0 + q * sdsq)))
    val d = math.sqrt(xj * xj + s * s)
    (b * lamdp + a2 * math.sin(2.0 * lamdp) + a4 * math.sin(lamdp * 4.0) -
      tanph * s / d,
      c1 * sd + c3 * math.sin(lamdp * 3.0) + tanph * xj / d)
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var lamdp = x / b
    var nn = 50
    var s = 0.0
    var continue0 = true
    while (continue0) {
      val sav = lamdp
      val sd = math.sin(lamdp)
      val sdsq = sd * sd
      s = p22 * sa * math.cos(lamdp) *
        math.sqrt((1.0 + t * sdsq) / ((1.0 + w * sdsq) * (1.0 + q * sdsq)))
      lamdp = x + y * s / xj - a2 * math.sin(2.0 * lamdp) -
        a4 * math.sin(lamdp * 4.0) -
        s / xj * (c1 * math.sin(lamdp) + c3 * math.sin(lamdp * 3.0))
      lamdp /= b
      nn -= 1
      if (!(math.abs(lamdp - sav) >= Tol) || nn == 0) continue0 = false
    }
    var sl = math.sin(lamdp)
    val fac = math.exp(math.sqrt(1.0 + s * s / (xj * xj)) *
      (y - c1 * sl - c3 * math.sin(lamdp * 3.0)))
    val phidp = 2.0 * (math.atan(fac) - M.FortPi)
    val dd = sl * sl
    if (math.abs(math.cos(lamdp)) < Tol) lamdp -= Tol
    val spp = math.sin(phidp)
    val sppsq = spp * spp
    val denom = 1.0 - sppsq * (1.0 + u)
    if (denom == 0.0) return err
    var lamt = math.atan(
      ((1.0 - sppsq * ell.rOneEs) * math.tan(lamdp) * ca -
        spp * sa * math.sqrt((1.0 + q * dd) * (1.0 - sppsq) - sppsq * u) /
          math.cos(lamdp)) / denom)
    sl = if (lamt >= 0) 1.0 else -1.0
    val scl = if (math.cos(lamdp) >= 0) 1.0 else -1.0
    lamt -= M.HalfPi * (1.0 - scl) * sl
    val lam = lamt - p22 * lamdp
    val phi =
      if (math.abs(sa) < Tol)
        math.asin(math.max(-1.0, math.min(1.0,
          spp / math.sqrt(ell.oneEs * ell.oneEs + ell.es * sppsq))))
      else
        math.atan((math.tan(lamdp) * math.cos(lamt) - ca * math.sin(lamt)) /
          (ell.oneEs * sa))
    (lam, phi)
  }
}

object SomKernel {
  /** ground-track crossover longitude shared by the Landsat WRS grids */
  val LsatRlm: Double = math.Pi * (1.0 / 248.0 + 0.5161290322580645)

  def som(ell: Ellipsoid, incAngle: Double, psRev: Double, ascLon: Double,
          x0: Double = 0.0, y0: Double = 0.0): SomKernel =
    SomKernel(ell, alf = incAngle, p22 = psRev, rlm = 0.0, lam0 = ascLon,
      x0 = x0, y0 = y0)

  def misrsom(ell: Ellipsoid, path: Int, x0: Double = 0.0, y0: Double = 0.0): SomKernel =
    SomKernel(ell, alf = math.toRadians(98.30382), p22 = 98.88 / 1440.0,
      rlm = 0.0, lam0 = math.toRadians(129.3056) - M.TwoPi / 233.0 * path,
      x0 = x0, y0 = y0)

  def lsat(ell: Ellipsoid, land: Int, path: Int,
           x0: Double = 0.0, y0: Double = 0.0): SomKernel =
    if (land <= 3)
      SomKernel(ell, alf = math.toRadians(99.092), p22 = 103.2669323 / 1440.0,
        rlm = LsatRlm,
        lam0 = math.toRadians(128.87) - M.TwoPi / 251.0 * path, x0 = x0, y0 = y0)
    else
      SomKernel(ell, alf = math.toRadians(98.2), p22 = 98.8841202 / 1440.0,
        rlm = LsatRlm,
        lam0 = math.toRadians(129.3) - M.TwoPi / 233.0 * path, x0 = x0, y0 = y0)
}