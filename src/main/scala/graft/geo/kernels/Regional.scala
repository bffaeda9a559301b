package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Bipolar oblique conic conformal of the western hemisphere
  * (Miller–Briesemeister; behavioral reference:
  * /root/reference/src/projections/bipc.cpp).  Spherical. */
final case class BipcKernel(override val ell: Ellipsoid, noskew: Boolean,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  private val OneEps = 1.000000001
  private val LamB = -0.34894976726250681539
  private val Nc = 0.63055844881274687180
  private val Fc = 1.89724742567461030582
  private val Azab = 0.81650043674686363166
  private val Azba = 1.82261843856185925133
  private val Tc = 1.27246578267089012270
  private val Rhoc = 1.20709121521568721927
  private val CAzc = 0.69691523038678375519
  private val SAzc = 0.71715351331143607555
  private val C45 = 0.70710678118654752469
  private val S45 = 0.70710678118654752410
  private val C20 = 0.93969262078590838411
  private val S20 = -0.34202014332566873287
  private val R110 = 1.91986217719376253360
  private val R104 = 1.81514242207410275904

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val cphi = math.cos(phi); val sphi = math.sin(phi)
    var sdlam = LamB - lam
    var cdlam = math.cos(sdlam)
    sdlam = math.sin(sdlam)
    var az = 0.0
    var tphi = Double.PositiveInfinity
    if (math.abs(math.abs(phi) - M.HalfPi) < Eps) {
      az = if (phi < 0) math.Pi else 0.0
    } else {
      tphi = sphi / cphi
      az = math.atan2(sdlam, C45 * (tphi - cdlam))
    }
    val tag = az > Azba
    var z = 0.0
    var av = 0.0
    var yOut = 0.0
    if (tag) {
      sdlam = lam + R110
      cdlam = math.cos(sdlam)
      sdlam = math.sin(sdlam)
      z = S20 * sphi + C20 * cphi * cdlam
      if (math.abs(z) > 1.0) {
        if (math.abs(z) > OneEps) return err
        z = if (z < 0) -1.0 else 1.0
      }
      z = math.acos(math.max(-1.0, math.min(1.0, z)))
      if (!tphi.isInfinite)
        az = math.atan2(sdlam, C20 * tphi - S20 * cdlam)
      av = Azab
      yOut = Rhoc
    } else {
      z = S45 * (sphi + cphi * cdlam)
      if (math.abs(z) > 1.0) {
        if (math.abs(z) > OneEps) return err
        z = if (z < 0) -1.0 else 1.0
      }
      z = math.acos(math.max(-1.0, math.min(1.0, z)))
      av = Azba
      yOut = -Rhoc
    }
    if (z < 0) return err
    var t = math.pow(math.tan(0.5 * z), Nc)
    var r = Fc * t
    var al = 0.5 * (R104 - z)
    if (al < 0) return err
    al = (t + math.pow(al, Nc)) / Tc
    if (math.abs(al) > 1.0) {
      if (math.abs(al) > OneEps) return err
      al = if (al < 0) -1.0 else 1.0
    }
    al = math.acos(math.max(-1.0, math.min(1.0, al)))
    t = Nc * (av - az)
    if (math.abs(t) < al)
      r /= math.cos(al + (if (tag) t else -t))
    var x = r * math.sin(t)
    var y = yOut + (if (tag) -r else r) * math.cos(t)
    if (noskew) {
      val t2 = x
      x = -x * CAzc - y * SAzc
      y = -y * CAzc + t2 * SAzc
    }
    (x, y)
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn; var y = yIn
    if (noskew) {
      val t = x
      x = -x * CAzc + y * SAzc
      y = -y * CAzc - t * SAzc
    }
    val neg = x < 0
    var s = 0.0; var c = 0.0; var av = 0.0
    if (neg) { y = Rhoc - y; s = S20; c = C20; av = Azab }
    else { y += Rhoc; s = S45; c = C45; av = Azba }
    var r = math.hypot(x, y)
    var rp = r; var rl = r
    var az = math.atan2(x, y)
    val fAz = math.abs(az)
    var z = 0.0
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      z = 2.0 * math.atan(math.pow(r / Fc, 1 / Nc))
      val al = math.acos(math.max(-1.0, math.min(1.0,
        (math.pow(math.tan(0.5 * z), Nc) +
          math.pow(math.tan(0.5 * (R104 - z)), Nc)) / Tc)))
      if (fAz < al)
        r = rp * math.cos(al + (if (neg) az else -az))
      if (math.abs(rl - r) < Eps) converged = true
      else { rl = r; i -= 1 }
    }
    if (!converged) return err
    az = av - az / Nc
    val phi = math.asin(math.max(-1.0, math.min(1.0,
      s * math.cos(z) + c * math.sin(z) * math.cos(az))))
    var lam = math.atan2(math.sin(az), c / math.tan(z) - s * math.cos(az))
    if (neg) lam -= R110 else lam = LamB - lam
    (lam, phi)
  }
}

/** International Map of the World polyconic (lat_1/lat_2 [lon_1]),
  * ellipsoidal (behavioral reference:
  * /root/reference/src/projections/imw_p.cpp). */
final case class ImwPKernel(override val ell: Ellipsoid,
                            phi1In: Double, phi2In: Double,
                            lam1Opt: Option[Double],
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Tol = 1e-10
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private def mlfn(phi: Double, s: Double, c: Double): Double =
    rectRad * M.auxConvert(phi, s, c, phiMu)

  // southern parallel first
  private val phi1 = math.min(phi1In, phi2In)
  private val phi2 = math.max(phi1In, phi2In)
  private val lam1 = lam1Opt.getOrElse {
    val sig = math.abs(math.toDegrees(0.5 * (phi2In + phi1In)))
    math.toRadians(if (sig <= 60) 2.0 else if (sig <= 76) 4.0 else 8.0)
  }
  // mode: 0 = neither zero, 1 = phi1 zero, -1 = phi2 zero
  private val mode = if (phi1 == 0.0) 1 else if (phi2 == 0.0) -1 else 0

  private def parXY(phi: Double): (Double, Double, Double, Double) = {
    val sp = math.sin(phi)
    val r = 1.0 / (math.tan(phi) * math.sqrt(1.0 - ell.es * sp * sp))
    val f = lam1 * sp
    (r * math.sin(f), r * (1 - math.cos(f)), sp, r)
  }

  private val (sphi1, r1, x1, y1) =
    if (phi1 != 0.0) { val (x, y, sp, r) = parXY(phi1); (sp, r, x, y) }
    else (0.0, 0.0, lam1, 0.0)
  private val (sphi2, r2, x2, t2) =
    if (phi2 != 0.0) { val (x, y, sp, r) = parXY(phi2); (sp, r, x, y) }
    else (0.0, 0.0, lam1, 0.0)
  private val (pC, qC, ppC, qpC, c2C) = {
    val m1 = mlfn(phi1, sphi1, math.cos(phi1))
    val m2 = mlfn(phi2, sphi2, math.cos(phi2))
    val t = m2 - m1
    val s = x2 - x1
    val y2v = math.sqrt(t * t - s * s) + y1
    val rt = 1.0 / t
    ((m2 * y1 - m1 * y2v) * rt, (y2v - y1) * rt,
      (m2 * x1 - m1 * x2) * rt, (x2 - x1) * rt, y2v - t2)
  }

  /** forward location + the yc of the phi_1 parallel for this lam */
  private def locFor(lam: Double, phi: Double): (Double, Double, Double) =
    if (phi == 0.0) (lam, 0.0, 0.0)
    else {
      val sp = math.sin(phi)
      val m = mlfn(phi, sp, math.cos(phi))
      val xa = ppC + qpC * m
      val ya = pC + qC * m
      val r = 1.0 / (math.tan(phi) * math.sqrt(1.0 - ell.es * sp * sp))
      var cc = math.sqrt(r * r - xa * xa)
      if (phi < 0) cc = -cc
      cc += ya - r
      val (xb, yb) =
        if (mode == -1) (lam, c2C)
        else {
          val t = lam * sphi2
          (r2 * math.sin(t), c2C + r2 * (1.0 - math.cos(t)))
        }
      val (xc, yc) =
        if (mode == 1) (lam, 0.0)
        else {
          val t = lam * sphi1
          (r1 * math.sin(t), r1 * (1.0 - math.cos(t)))
        }
      val dd = (xb - xc) / (yb - yc)
      val bb = xc + dd * (cc + r - yc)
      var xv = dd * math.sqrt(r * r * (1 + dd * dd) - bb * bb)
      if (phi > 0) xv = -xv
      xv = (bb + xv) / (1.0 + dd * dd)
      var yv = math.sqrt(r * r - xv * xv)
      if (phi > 0) yv = -yv
      yv += cc + r
      (xv, yv, yc)
    }

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val (x, y, _) = locFor(lam, phi)
    (x, y)
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var phi = phi2
    var lam = x / math.cos(phi)
    var i = 0
    var tx = 0.0; var ty = 0.0
    var done = false
    while (i < 1000 && !done) {
      val (tx0, ty0, yc) = locFor(lam, phi)
      tx = tx0; ty = ty0
      val denom = ty - yc
      if (denom != 0 || math.abs(ty - y) > Tol) {
        if (denom == 0) return err
        phi = (phi - phi1) * (y - yc) / denom + phi1
      }
      if (tx != 0 && math.abs(tx - x) > Tol)
        lam = lam * x / tx
      i += 1
      if (!(math.abs(tx - x) > Tol || math.abs(ty - y) > Tol)) done = true
    }
    if (!done) err else (lam, phi)
  }
}
