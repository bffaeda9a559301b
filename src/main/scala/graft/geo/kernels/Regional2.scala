package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Evenden's exact meridian-distance series (reference:
  * /root/reference/src/proj_mdist.cpp) — distinct from the rectifying
  * mlfn; used by the Roussilhe stereographic. */
private[kernels] final class Mdist(es: Double) {
  private val (bArr, eConst) = {
    val E = new Array[Double](20)
    E(0) = 1.0
    var ens = es
    var numf = 1.0; var twon1 = 1.0; var denfi = 1.0
    var denf = 1.0; var twon = 4.0
    var Es = 1.0; var El = 1.0
    var i = 1
    var break0 = false
    while (i < 20 && !break0) {
      numf *= twon1 * twon1
      val den = twon * denf * denf * twon1
      E(i) = (numf / den) * ens
      Es -= E(i)
      ens *= es
      twon *= 4.0
      denfi += 1.0; denf *= denfi
      twon1 += 2.0
      if (Es == El) break0 = true else { El = Es; i += 1 }
    }
    val n = (if (break0) i else 20) - 1
    val b = new Array[Double](n + 1)
    b(0) = 1.0 - Es
    var acc = b(0)
    var numf2 = 1.0; var denf2 = 1.0
    var numfi = 2.0; var denfi2 = 3.0
    var j = 1
    while (j <= n) {
      acc -= E(j)
      numf2 *= numfi
      denf2 *= denfi2
      b(j) = acc * numf2 / denf2
      numfi += 2.0; denfi2 += 2.0
      j += 1
    }
    (b, Es)
  }
  private val nb = bArr.length - 1

  def mdist(phi: Double, sphi: Double, cphi: Double): Double = {
    val sc = sphi * cphi
    val sphi2 = sphi * sphi
    val dd = phi * eConst - es * sc / math.sqrt(1.0 - es * sphi2)
    var sum = bArr(nb)
    var i = nb
    while (i > 0) { i -= 1; sum = bArr(i) + sphi2 * sum }
    dd + sc * sum
  }

  /** Newton inverse; NaN phi signals non-convergence */
  def invMdist(dist: Double): Double = {
    val k = 1.0 / (1.0 - es)
    var phi = dist
    var i = 20
    while (i > 0) {
      val s = math.sin(phi)
      var t = 1.0 - es * s * s
      t = (mdist(phi, s, math.cos(phi)) - dist) * t * math.sqrt(t) * k
      phi -= t
      if (math.abs(t) < 1e-14) return phi
      i -= 1
    }
    phi
  }
}

/** Guam variant of the azimuthal equidistant (EPSG GN7-2 p.85;
  * reference: /root/reference/src/projections/aeqd.cpp e_guam_fwd/inv). */
final case class GuamKernel(override val ell: Ellipsoid,
                            lat0: Double,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val muPhi = M.coeffsMuToPhi(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private def mlfn(phi: Double, s: Double, c: Double): Double =
    rectRad * M.auxConvert(phi, s, c, phiMu)
  private def invMlfn(m: Double): Double = {
    val mu = m / rectRad
    M.auxConvert(mu, math.sin(mu), math.cos(mu), muPhi)
  }
  private val m1 = mlfn(lat0, math.sin(lat0), math.cos(lat0))

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val cosphi = math.cos(phi); val sinphi = math.sin(phi)
    val t = 1.0 / math.sqrt(1.0 - ell.es * sinphi * sinphi)
    (lam * cosphi * t,
      mlfn(phi, sinphi, cosphi) - m1 +
        0.5 * lam * lam * cosphi * sinphi * t)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val x2 = 0.5 * x * x
    var phi = lat0
    var t = 0.0
    var i = 0
    while (i < 3) {
      t = ell.e * math.sin(phi)
      t = math.sqrt(1.0 - t * t)
      phi = invMlfn(m1 + y - x2 * math.tan(phi) * t)
      i += 1
    }
    (x * t / math.cos(phi), phi)
  }
}

/** Lambert conformal conic alternative — the French Army truncated cubic
  * Lambert (reference: /root/reference/src/projections/lcca.cpp). */
final case class LccaKernel(override val ell: Ellipsoid,
                            lat0: Double, k0: Double = 1.0,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val muPhi = M.coeffsMuToPhi(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private def mlfn(phi: Double, s: Double, c: Double): Double =
    rectRad * M.auxConvert(phi, s, c, phiMu)
  private def invMlfn(m: Double): Double = {
    val mu = m / rectRad
    M.auxConvert(mu, math.sin(mu), math.cos(mu), muPhi)
  }
  private val l = math.sin(lat0)
  private val m0 = mlfn(lat0, l, math.cos(lat0))
  private val (r0, cC) = {
    val s2p0 = l * l
    var rr0 = 1.0 / (1.0 - ell.es * s2p0)
    val n0 = math.sqrt(rr0)
    rr0 *= ell.oneEs * n0
    (n0 / math.tan(lat0), 1.0 / (6.0 * rr0 * n0))
  }
  private def fS(s: Double): Double = s * (1.0 + s * s * cC)
  private def fSp(s: Double): Double = 1.0 + 3.0 * s * s * cC

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val s = mlfn(phi, math.sin(phi), math.cos(phi)) - m0
    val r = r0 - fS(s)
    val t = lam * l
    (k0 * (r * math.sin(t)), k0 * (r0 - r * math.cos(t)))
  }
  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    val x = xIn / k0; val y = yIn / k0
    val theta = math.atan2(x, r0 - y)
    val dr = y - x * math.tan(0.5 * theta)
    val lam = theta / l
    var s = dr
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      val dif = (fS(s) - dr) / fSp(s)
      s -= dif
      if (math.abs(dif) < 1e-12) converged = true
      else i -= 1
    }
    if (!converged) err else (lam, invMlfn(s + m0))
  }
}

/** Roussilhe stereographic (reference:
  * /root/reference/src/projections/rouss.cpp). */
final case class RoussKernel(override val ell: Ellipsoid,
                             lat0: Double, k0: Double = 1.0,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val md = new Mdist(ell.es)
  private val s0 = md.mdist(lat0, math.sin(lat0), math.cos(lat0))
  private val (a1, a2, a3, a4, a5, a6, b1, b2, b3, b4, b5, b6, b7, b8) = {
    val sp = math.sin(lat0)
    val es2 = ell.es * sp * sp
    val t0 = 1.0 - es2
    val n0 = 1.0 / math.sqrt(t0)
    val rr2 = t0 * t0 / ell.oneEs
    val rr4 = rr2 * rr2
    val t = math.tan(lat0); val t2 = t * t
    (rr2 / 4.0,
      rr2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0,
      rr2 * t * (1.0 + 4.0 * t2) / (12.0 * n0),
      rr4 / 24.0,
      rr4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0,
      rr4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0,
      t / (2.0 * n0),
      rr2 / 12.0,
      rr2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0,
      rr2 * t * (2.0 - t2) / (24.0 * n0),
      rr2 * t * (5.0 + 4.0 * t2) / (8.0 * n0),
      rr4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0,
      rr4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0,
      rr4 / 120.0)
  }
  private val (c1, c2, c3, c4, c5, c6, c7, c8,
               d1, d2, d3, d4, d5, d6, d7, d8, d9, d10, d11) = {
    val sp = math.sin(lat0)
    val es2 = ell.es * sp * sp
    val t0 = 1.0 - es2
    val n0 = 1.0 / math.sqrt(t0)
    val rr2 = t0 * t0 / ell.oneEs
    val rr4 = rr2 * rr2
    val t = math.tan(lat0); val t2 = t * t
    (rr2 / 4.0,
      rr2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0,
      rr2 * t * (1.0 + t2) / (3.0 * n0),
      rr4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0,
      rr4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0,
      rr4 / 16.0,
      rr4 * t * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * n0),
      rr4 * t * (1.0 + t2 * 4.0) / (36.0 * n0),
      t / (2.0 * n0),
      rr2 / 12.0,
      rr2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0,
      rr2 * t * (1.0 + t2) / (8.0 * n0),
      rr2 * t * (1.0 + t2 * 2.0) / (4.0 * n0),
      rr4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0,
      rr4 * t2 * (3.0 + t2 * 4.0) / 8.0,
      rr4 / 80.0,
      rr4 * t * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0,
      rr4 * t * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * n0),
      rr4 * t * (37.0 + t2 * 44.0) / (96.0 * n0))
  }

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val cp = math.cos(phi); val sp = math.sin(phi)
    val s = md.mdist(phi, sp, cp) - s0
    val s2 = s * s
    val al = lam * cp / math.sqrt(1.0 - ell.es * sp * sp)
    val al2 = al * al
    (k0 * al * (1.0 + s2 * (a1 + s2 * a4) -
        al2 * (a2 + s * a3 + s2 * a5 + al2 * a6)),
      k0 * (al2 * (b1 + al2 * b4) +
        s * (1.0 + al2 * (b3 - al2 * b6) + s2 * (b2 + s2 * b8) +
          s * al2 * (b5 + s * b7))))
  }
  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    val x = xIn / k0; val y = yIn / k0
    val x2 = x * x; val y2 = y * y
    val al = x * (1.0 - c1 * y2 +
      x2 * (c2 + c3 * y - c4 * x2 + c5 * y2 - c7 * x2 * y) +
      y2 * (c6 * y2 - c8 * x2 * y))
    val s = s0 + y * (1.0 + y2 * (-d2 + d8 * y2)) +
      x2 * (-d1 + y * (-d3 + y * (-d5 + y * (-d7 + y * d11))) +
        x2 * (d4 + y * (d6 + y * d10) - x2 * d9))
    val phi = md.invMdist(s)
    val sp = math.sin(phi)
    (al * math.sqrt(1.0 - ell.es * sp * sp) / math.cos(phi), phi)
  }
}

/** Gauss–Schreiber transverse Mercator (Gauss–Laborde Réunion;
  * reference: /root/reference/src/projections/gstmerc.cpp). */
final case class GstmercKernel(override val ell: Ellipsoid,
                               lat0: Double, k0: Double = 1.0,
                               override val lam0: Double = 0.0,
                               override val x0: Double = 0.0,
                               override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val n1 = math.sqrt(1 + ell.es *
    math.pow(math.cos(lat0), 4.0) / (1 - ell.es))
  private val phic = math.asin(math.sin(lat0) / n1)
  private val cc = math.log(M.tsfn(-phic, -math.sin(lat0) / n1, 0.0)) -
    n1 * math.log(M.tsfn(-lat0, -math.sin(lat0), ell.e))
  private val n2 = k0 * ell.a * math.sqrt(1 - ell.es) /
    (1 - ell.es * math.sin(lat0) * math.sin(lat0))
  private val xs = 0.0
  private val ys = -n2 * phic

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val ll = n1 * lam
    val ls = cc + n1 * math.log(M.tsfn(-phi, -math.sin(phi), ell.e))
    val sinLs1 = math.sin(ll) / math.cosh(ls)
    val ls1 = math.log(M.tsfn(-math.asin(sinLs1), -sinLs1, 0.0))
    ((xs + n2 * ls1) * ell.ra,
      (ys + n2 * math.atan(math.sinh(ls) / math.cos(ll))) * ell.ra)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val ll = math.atan(math.sinh((x * ell.a - xs) / n2) /
      math.cos((y * ell.a - ys) / n2))
    val sinC = math.sin((y * ell.a - ys) / n2) /
      math.cosh((x * ell.a - xs) / n2)
    val lc = math.log(M.tsfn(-math.asin(sinC), -sinC, 0.0))
    (ll / n1, -M.phi2(math.exp((lc - cc) / n1), ell.e))
  }
}

/** Laborde (Madagascar; reference:
  * /root/reference/src/projections/labrd.cpp). */
final case class LabrdKernel(override val ell: Ellipsoid,
                             lat0: Double, azi: Double, k0: Double = 1.0,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  private val (kRg, p0s, aA, cC, ca, cb, ccc, cd) = {
    val sinp = math.sin(lat0)
    val t0 = 1.0 - ell.es * sinp * sinp
    val n = 1.0 / math.sqrt(t0)
    val r = ell.oneEs * n / t0
    val krg = k0 * math.sqrt(n * r)
    val ps = math.atan(math.sqrt(r / n) * math.tan(lat0))
    val a = sinp / math.sin(ps)
    val t = ell.e * sinp
    val c = 0.5 * ell.e * a * math.log((1.0 + t) / (1.0 - t)) +
      -a * math.log(math.tan(M.FortPi + 0.5 * lat0)) +
      math.log(math.tan(M.FortPi + 0.5 * ps))
    val t2 = azi + azi
    var cbv = 1.0 / (12.0 * krg * krg)
    val cav = (1.0 - math.cos(t2)) * cbv
    cbv *= math.sin(t2)
    (krg, ps, a, c, cav, cbv,
      3.0 * (cav * cav - cbv * cbv), 6.0 * cav * cbv)
  }

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val v1 = aA * math.log(math.tan(M.FortPi + 0.5 * phi))
    val t0 = ell.e * math.sin(phi)
    val v2 = 0.5 * ell.e * aA * math.log((1.0 + t0) / (1.0 - t0))
    val ps = 2.0 * (math.atan(math.exp(v1 - v2 + cC)) - M.FortPi)
    val i1 = ps - p0s
    val cosps = math.cos(ps); val cosps2 = cosps * cosps
    val sinps = math.sin(ps); val sinps2 = sinps * sinps
    val i4 = aA * cosps
    val i2 = 0.5 * aA * i4 * sinps
    val i3 = i2 * aA * aA * (5.0 * cosps2 - sinps2) / 12.0
    var i6 = i4 * aA * aA
    val i5 = i6 * (cosps2 - sinps2) / 6.0
    i6 *= aA * aA *
      (5.0 * cosps2 * cosps2 + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0
    val t = lam * lam
    var x = kRg * lam * (i4 + t * (i5 + t * i6))
    var y = kRg * (i1 + t * (i2 + t * i3))
    val x2 = x * x; val y2 = y * y
    val v1b = 3.0 * x * y2 - x * x2
    val v2b = y * y2 - 3.0 * x2 * y
    val xo = x + ca * v1b + cb * v2b
    val yo = y + ca * v2b - cb * v1b
    (xo, yo)
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn; var y = yIn
    var x2 = x * x; val y2 = y * y
    val v1 = 3.0 * x * y2 - x * x2
    val v2 = y * y2 - 3.0 * x2 * y
    val v3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
    val v4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
    val xa = x + (-ca * v1 - cb * v2 + ccc * v3 + cd * v4)
    val ya = y + (cb * v1 - ca * v2 - cd * v3 + ccc * v4)
    x = xa; y = ya
    val ps = p0s + y / kRg
    var pe = ps + lat0 - p0s
    var i = 20
    var converged = false
    while (i > 0 && !converged) {
      val v1b = aA * math.log(math.tan(M.FortPi + 0.5 * pe))
      val tpe = ell.e * math.sin(pe)
      val v2b = 0.5 * ell.e * aA * math.log((1.0 + tpe) / (1.0 - tpe))
      val t = ps - 2.0 * (math.atan(math.exp(v1b - v2b + cC)) - M.FortPi)
      pe += t
      if (math.abs(t) < Eps) converged = true
      i -= 1
    }
    var t = ell.e * math.sin(pe)
    t = 1.0 - t * t
    val re = ell.oneEs / (t * math.sqrt(t))
    t = math.tan(ps)
    val t2 = t * t
    val s = kRg * kRg
    var d = re * k0 * kRg
    val i7 = t / (2.0 * d)
    val i8 = t * (5.0 + 3.0 * t2) / (24.0 * d * s)
    d = math.cos(ps) * kRg * aA
    val i9 = 1.0 / d
    d *= s
    val i10 = (1.0 + 2.0 * t2) / (6.0 * d)
    val i11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
    x2 = x * x
    (x * (i9 + x2 * (-i10 + x2 * i11)), pe + x2 * (-i7 + i8 * x2))
  }
}

/** New Zealand Map Grid (fixed Earth: International a, 6th-order complex
  * polynomial; reference: /root/reference/src/projections/nzmg.cpp). */
final case class NzmgKernel(override val ell: Ellipsoid,
                            override val lam0: Double,
                            override val x0: Double,
                            override val y0: Double)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  private val RadToSec5 = 2.062648062470963551564733573
  private val Sec5ToRad = 0.4848136811095359935899141023
  private val phi0 = math.toRadians(-41.0)
  private val bfr = Array(0.7557853228, 0.249204646, -0.001541739,
    -0.10162907, -0.26623489, -0.6870983)
  private val bfi = Array(0.0, 0.003371507, 0.041058560, 0.01727609,
    -0.36249218, -1.1651967)
  private val tpsi = Array(0.6399175073, -0.1358797613, 0.063294409,
    -0.02526853, 0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067,
    -0.00034)
  private val tphi = Array(1.5627014243, 0.5185406398, -0.03333098,
    -0.1052906, -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013)
  private val n = 5

  private def zpoly1(pr: Double, pi: Double): (Double, Double) = {
    var ar = bfr(n); var ai = bfi(n)
    var k = n - 1
    while (k >= 0) {
      val t = ar
      ar = bfr(k) + pr * t - pi * ai
      ai = bfi(k) + pr * ai + pi * t
      k -= 1
    }
    val t = ar
    (pr * t - pi * ai, pr * ai + pi * t)
  }
  private def zpolyd1(pr: Double, pi: Double): (Double, Double, Double, Double) = {
    var ar = bfr(n); var ai = bfi(n)
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
      ar = bfr(k) + pr * t - pi * ai
      ai = bfi(k) + pr * ai + pi * t
      k -= 1
    }
    val tb = br
    br = ar + pr * tb - pi * bi
    bi = ai + pr * bi + pi * tb
    val t = ar
    (pr * t - pi * ai, pr * ai + pi * t, br, bi)
  }

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val dphi = (phiIn - phi0) * RadToSec5
    var pr = tpsi(9)
    var i = 9
    while (i > 0) { i -= 1; pr = tpsi(i) + dphi * pr }
    pr *= dphi
    val (r, im) = zpoly1(pr, lam)
    (im, r)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var pr = y; var pi = x
    var nn = 20
    var converged = false
    while (nn > 0 && !converged) {
      val (fr0, fi0, fpr, fpi) = zpolyd1(pr, pi)
      val fr = fr0 - y; val fi = fi0 - x
      val den = fpr * fpr + fpi * fpi
      val dpr = -(fr * fpr + fi * fpi) / den
      val dpi = -(fi * fpr - fr * fpi) / den
      pr += dpr; pi += dpi
      if (math.abs(dpr) + math.abs(dpi) <= Eps) converged = true
      else nn -= 1
    }
    if (nn == 0) return err
    var phi = tphi(8)
    var i = 8
    while (i > 0) { i -= 1; phi = tphi(i) + pr * phi }
    (pi, phi0 + pr * phi * Sec5ToRad)
  }
}

/** Colombia Urban (IOGP GN7-2; reference:
  * /root/reference/src/projections/col_urban.cpp). */
final case class ColUrbanKernel(override val ell: Ellipsoid,
                                lat0: Double, h0Unscaled: Double,
                                override val lam0: Double = 0.0,
                                override val x0: Double = 0.0,
                                override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val h0 = h0Unscaled / ell.a
  private val sinphi0 = math.sin(lat0)
  private val nu0 = 1.0 / math.sqrt(1 - ell.es * sinphi0 * sinphi0)
  private val aC = 1 + h0 / nu0
  private val rho0 = (1 - ell.es) / math.pow(1 - ell.es * sinphi0 * sinphi0, 1.5)
  private val bC = math.tan(lat0) / (2 * rho0 * nu0)
  private val cCc = 1 + h0
  private val dC = rho0 * (1 + h0 / (1 - ell.es))

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val cosphi = math.cos(phi); val sinphi = math.sin(phi)
    val nu = 1.0 / math.sqrt(1 - ell.es * sinphi * sinphi)
    val lnc = lam * nu * cosphi
    val sinphiM = math.sin(0.5 * (phi + lat0))
    val rhoM = (1 - ell.es) / math.pow(1 - ell.es * sinphiM * sinphiM, 1.5)
    val g = 1 + h0 / rhoM
    (aC * lnc, g * rho0 * ((phi - lat0) + bC * lnc * lnc))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = lat0 + y / dC - bC * (x / cCc) * (x / cCc)
    val sinphi = math.sin(phi)
    val nu = 1.0 / math.sqrt(1 - ell.es * sinphi * sinphi)
    (x / (cCc * nu * math.cos(phi)), phi)
  }
}

/** Chamberlin trimetric (three control points; forward only;
  * reference: /root/reference/src/projections/chamb.cpp). */
final case class ChambKernel(override val ell: Ellipsoid,
                             ctlLat: Array[Double], ctlLonIn: Array[Double],
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Third = 0.333333333333333333
  private val Tol = 1e-9
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  private def aacos(x: Double) = math.acos(math.max(-1.0, math.min(1.0, x)))

  /** great-circle distance + azimuth */
  private def vect(dphi: Double, c1: Double, s1: Double,
                   c2: Double, s2: Double, dlam: Double): (Double, Double) = {
    val cdl = math.cos(dlam)
    var r =
      if (math.abs(dphi) > 1.0 || math.abs(dlam) > 1.0)
        aacos(s1 * s2 + c1 * c2 * cdl)
      else {
        val dp = math.sin(0.5 * dphi)
        val dl = math.sin(0.5 * dlam)
        2.0 * aasin(math.sqrt(dp * dp + c1 * c2 * dl * dl))
      }
    if (math.abs(r) > Tol)
      (r, math.atan2(c2 * math.sin(dlam), c1 * s2 - s1 * c2 * cdl))
    else (0.0, 0.0)
  }
  private def lc(b: Double, c: Double, a: Double): Double =
    aacos(0.5 * (b * b + c * c - a * a) / (b * c))

  private val cPhi = ctlLat
  private val cLam = ctlLonIn.map(l => M.adjlon(l - lam0))
  private val cCos = cPhi.map(math.cos)
  private val cSin = cPhi.map(math.sin)
  private val (vR, vAz) = {
    val r = new Array[Double](3); val az = new Array[Double](3)
    var i = 0
    while (i < 3) {
      val j = if (i == 2) 0 else i + 1
      val (rr, aa) = vect(cPhi(j) - cPhi(i), cCos(i), cSin(i),
        cCos(j), cSin(j), cLam(j) - cLam(i))
      require(rr != 0.0, "chamb control points must be distinct")
      r(i) = rr; az(i) = aa
      i += 1
    }
    (r, az)
  }
  private val beta0 = lc(vR(0), vR(2), vR(1))
  private val beta1 = lc(vR(0), vR(1), vR(2))
  private val beta2 = math.Pi - beta0
  private val cpy = Array(vR(2) * math.sin(beta0), vR(2) * math.sin(beta0), 0.0)
  private val cpx = Array(-0.5 * vR(0), 0.5 * vR(0),
    -0.5 * vR(0) + vR(2) * math.cos(beta0))
  private val pX = cpx(2)
  private val pY = 2.0 * cpy(0)

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val sinphi = math.sin(phi); val cosphi = math.cos(phi)
    val vr = new Array[Double](3); val vaz = new Array[Double](3)
    var i = 0
    var atCtl = -1
    while (i < 3 && atCtl < 0) {
      val (r, az) = vect(phi - cPhi(i), cCos(i), cSin(i), cosphi, sinphi,
        lam - cLam(i))
      if (r == 0.0) atCtl = i
      else { vr(i) = r; vaz(i) = M.adjlon(az - vAz(i)); i += 1 }
    }
    if (atCtl >= 0) return (cpx(atCtl), cpy(atCtl))
    var x = pX; var y = pY
    i = 0
    while (i < 3) {
      val j = if (i == 2) 0 else i + 1
      var a = lc(vR(i), vr(i), vr(j))
      if (vaz(i) < 0) a = -a
      if (i == 0) { x += vr(i) * math.cos(a); y -= vr(i) * math.sin(a) }
      else if (i == 1) {
        a = beta1 - a
        x -= vr(i) * math.cos(a); y -= vr(i) * math.sin(a)
      } else {
        a = beta2 - a
        x += vr(i) * math.cos(a); y += vr(i) * math.sin(a)
      }
      i += 1
    }
    (x * Third, y * Third)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}
