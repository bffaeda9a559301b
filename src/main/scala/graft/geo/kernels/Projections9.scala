package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Swiss Oblique Mercator (CH1903; behavioral reference:
  * /root/reference/src/projections/somerc.cpp). */
final case class SomercKernel(override val ell: Ellipsoid,
                              lat0: Double = 0.0, k0: Double = 1.0,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  private val hlfE = 0.5 * ell.e
  private val (cQ, sinp0, cosp0, kK, kR) = {
    var cp = math.cos(lat0)
    cp *= cp
    val c = math.sqrt(1 + ell.es * cp * cp * ell.rOneEs)
    var sp = math.sin(lat0)
    val s0 = sp / c
    val phip0 = math.asin(math.max(-1.0, math.min(1.0, s0)))
    val c0 = math.cos(phip0)
    sp *= ell.e
    val k = math.log(math.tan(M.FortPi + 0.5 * phip0)) -
      c * (math.log(math.tan(M.FortPi + 0.5 * lat0)) -
        hlfE * math.log((1.0 + sp) / (1.0 - sp)))
    val r = k0 * math.sqrt(ell.oneEs) / (1.0 - sp * sp)
    (c, s0, c0, k, r)
  }

  private def aasin(x: Double): Double =
    math.asin(math.max(-1.0, math.min(1.0, x)))

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val sp = ell.e * math.sin(phi)
    val phip = 2.0 * math.atan(math.exp(
      cQ * (math.log(math.tan(M.FortPi + 0.5 * phi)) -
        hlfE * math.log((1.0 + sp) / (1.0 - sp))) + kK)) - M.HalfPi
    val lamp = cQ * lam
    val cp = math.cos(phip)
    val phipp = aasin(cosp0 * math.sin(phip) - sinp0 * cp * math.cos(lamp))
    val lampp = aasin(cp * math.sin(lamp) / math.cos(phipp))
    (kR * lampp, kR * math.log(math.tan(M.FortPi + 0.5 * phipp)))
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phipp = 2.0 * (math.atan(math.exp(y / kR)) - M.FortPi)
    val lampp = x / kR
    val cp = math.cos(phipp)
    var phip = aasin(cosp0 * math.sin(phipp) + sinp0 * cp * math.cos(lampp))
    val lamp = aasin(cp * math.sin(lampp) / math.cos(phip))
    val con = (kK - math.log(math.tan(M.FortPi + 0.5 * phip))) / cQ
    var i = 6
    var done = false
    while (i > 0 && !done) {
      val esp = ell.e * math.sin(phip)
      val delp = (con + math.log(math.tan(M.FortPi + 0.5 * phip)) -
        hlfE * math.log((1.0 + esp) / (1.0 - esp))) *
        (1.0 - esp * esp) * math.cos(phip) * ell.rOneEs
      phip -= delp
      if (math.abs(delp) < Eps) done = true
      i -= 1
    }
    if (!done) err else (lamp / cQ, phip)
  }
}

/** American Polyconic, sphere + ellipsoid (behavioral reference:
  * /root/reference/src/projections/poly.cpp). */
final case class PolyKernel(override val ell: Ellipsoid,
                            lat0: Double = 0.0,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Tol = 1e-10
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private def mlfn(phi: Double, s: Double, c: Double): Double =
    rectRad * M.auxConvert(phi, s, c, phiMu)
  private val ml0 =
    if (ell.isSphere) -lat0
    else mlfn(lat0, math.sin(lat0), math.cos(lat0))

  protected def project(lamIn: Double, phi: Double): (Double, Double) =
    if (!ell.isSphere) {
      if (math.abs(phi) <= Tol) (lamIn, -ml0)
      else {
        val sp = math.sin(phi); val cp = math.cos(phi)
        val ms = if (math.abs(cp) > Tol) M.msfn(sp, cp, ell.es) / sp else 0.0
        val lam = lamIn * sp
        (ms * math.sin(lam),
          (mlfn(phi, sp, cp) - ml0) + ms * (1.0 - math.cos(lam)))
      }
    } else {
      if (math.abs(phi) <= Tol) (lamIn, ml0)
      else {
        val cot = 1.0 / math.tan(phi)
        val e = lamIn * math.sin(phi)
        (math.sin(e) * cot, phi - lat0 + cot * (1.0 - math.cos(e)))
      }
    }

  protected def unproject(x: Double, yIn: Double): (Double, Double) =
    if (!ell.isSphere) {
      val y = yIn + ml0
      if (math.abs(y) <= Tol) (x, 0.0)
      else {
        val r = y * y + x * x
        var phi = y
        var i = 20
        var converged = false
        while (i > 0 && !converged) {
          val sp = math.sin(phi); val cp = math.cos(phi)
          val s2ph = sp * cp
          if (math.abs(cp) < 1e-12) return err
          var mlp = math.sqrt(1.0 - ell.es * sp * sp)
          val c = sp * mlp / cp
          val ml = mlfn(phi, sp, cp)
          val mlb = ml * ml + r
          mlp = ell.oneEs / (mlp * mlp * mlp)
          val dPhi = (ml + ml + c * mlb - 2.0 * y * (c * ml + 1.0)) /
            (ell.es * s2ph * (mlb - 2.0 * y * ml) / c +
              2.0 * (y - ml) * (c * mlp - 1.0 / s2ph) - mlp - mlp)
          phi += dPhi
          if (math.abs(dPhi) <= 1e-12) converged = true
          i -= 1
        }
        if (!converged) return err
        val c = math.sin(phi)
        (math.asin(x * math.tan(phi) * math.sqrt(1.0 - ell.es * c * c)) /
          math.sin(phi), phi)
      }
    } else {
      val y = lat0 + yIn
      if (math.abs(y) <= Tol) (x, 0.0)
      else {
        var phi = y
        val b = x * x + y * y
        var i = 10
        var break0 = false
        while (!break0) {
          val tp = math.tan(phi)
          val dphi = (y * (phi * tp + 1.0) - phi -
            0.5 * (phi * phi + b) * tp) / ((phi - y) / tp - 1.0)
          phi -= dphi
          if (!(math.abs(dphi) > 1e-10)) break0 = true
          else {
            i -= 1
            if (i == 0) return err
          }
        }
        (math.asin(x * math.tan(phi)) / math.sin(phi), phi)
      }
    }
}