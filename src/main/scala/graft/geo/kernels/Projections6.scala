package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Equal Earth (Savric/Patterson/Jenny 2018), sphere + ellipsoid via the
  * authalic latitude (behavioral reference:
  * /root/reference/src/projections/eqearth.cpp). */
final case class EqEarthKernel(override val ell: Ellipsoid,
                               override val lam0: Double = 0.0,
                               override val x0: Double = 0.0,
                               override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val A1 = 1.340264; private val A2 = -0.081106
  private val A3 = 0.000893; private val A4 = 0.003796
  private val Mc = math.sqrt(3.0) / 2.0
  private val MaxY = 1.3173627591574
  private val qp = M.authalicQ(1.0, ell.e, ell.oneEs)
  private val xiPhi = M.coeffsXiToPhi(ell.n)
  private val rqda = if (ell.isSphere) 1.0 else math.sqrt(0.5 * qp)

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var sbeta = math.sin(phi)
    if (!ell.isSphere) {
      sbeta = M.authalicQ(sbeta, ell.e, ell.oneEs) / qp
      if (math.abs(sbeta) > 1) sbeta = if (sbeta > 0) 1 else -1
    }
    val psi = math.asin(Mc * sbeta)
    val psi2 = psi * psi
    val psi6 = psi2 * psi2 * psi2
    val x = lam * math.cos(psi) /
      (Mc * (A1 + 3 * A2 * psi2 + psi6 * (7 * A3 + 9 * A4 * psi2)))
    val y = psi * (A1 + A2 * psi2 + psi6 * (A3 + A4 * psi2))
    (x * rqda, y * rqda)
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    val x = xIn / rqda
    var y = yIn / rqda
    // at/beyond the clamp the point IS the pole: snap exactly (the Newton
    // + asin(sin(yc)/M) chain loses ~1e-6 deg at the boundary)
    if (y >= MaxY) return (0.0, M.HalfPi)
    else if (y <= -MaxY) return (0.0, -M.HalfPi)
    var yc = y
    var i = 12
    var done = false
    while (i > 0 && !done) {
      val y2 = yc * yc
      val y6 = y2 * y2 * y2
      val f = yc * (A1 + A2 * y2 + y6 * (A3 + A4 * y2)) - y
      val fder = A1 + 3 * A2 * y2 + y6 * (7 * A3 + 9 * A4 * y2)
      val tol = f / fder
      yc -= tol
      if (math.abs(tol) < 1e-11) done = true
      i -= 1
    }
    if (!done) return err
    val y2 = yc * yc
    val y6 = y2 * y2 * y2
    val lam = Mc * x * (A1 + 3 * A2 * y2 + y6 * (7 * A3 + 9 * A4 * y2)) /
      math.cos(yc)
    var phi = math.asin(math.sin(yc) / Mc)
    if (!ell.isSphere) phi = M.auxConvert(phi, xiPhi)
    (lam, phi)
  }
}

/** Urmaev V (spherical, forward-only; behavioral reference:
  * /root/reference/src/projections/urm5.cpp). */
final case class Urm5Kernel(override val ell: Ellipsoid,
                            n: Double, q: Double, alpha: Double,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  require(n > 0 && n <= 1, "urm5 n outside ]0,1]")
  private val q3 = q / 3.0
  private val t0 = n * math.sin(alpha)
  require(math.sqrt(1.0 - t0 * t0) != 0, "urm5 n*sin(alpha) ~ 1")
  private val m = math.cos(alpha) / math.sqrt(1.0 - t0 * t0)
  private val rmn = 1.0 / (m * n)
  override def invertible: Boolean = false

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val phi = math.asin(math.max(-1.0, math.min(1.0, n * math.sin(phiIn))))
    val t = phi * phi
    (m * lam * math.cos(phi), phi * (1.0 + t * q3) * rmn)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Lagrange conformal (spherical; behavioral reference:
  * /root/reference/src/projections/lagrng.cpp). */
final case class LagrngKernel(override val ell: Ellipsoid,
                              w: Double = 2.0, lat1: Double = 0.0,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  private val Tol = 1e-10
  require(w > 0, "lagrng W <= 0")
  private val hw = 0.5 * w
  private val rw = 1.0 / w
  private val hrw = 0.5 * rw
  private val sinPhi1 = math.sin(lat1)
  require(math.abs(math.abs(sinPhi1) - 1.0) >= Tol, "lagrng |lat_1| ~ 90")
  private val a1 = math.pow((1.0 - sinPhi1) / (1.0 + sinPhi1), hrw)
  private val a2 = a1 * a1

  protected def project(lamIn: Double, phi: Double): (Double, Double) = {
    val sinPhi = math.sin(phi)
    if (math.abs(math.abs(sinPhi) - 1) < Tol)
      (0.0, if (phi < 0) -2.0 else 2.0)
    else {
      val v = a1 * math.pow((1.0 + sinPhi) / (1.0 - sinPhi), hrw)
      val lam = lamIn * rw
      val c = 0.5 * (v + 1.0 / v) + math.cos(lam)
      if (c < Tol) err
      else (2.0 * math.sin(lam) / c, (v - 1.0 / v) / c)
    }
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    if (math.abs(math.abs(y) - 2.0) < Tol)
      (0.0, if (y < 0) -M.HalfPi else M.HalfPi)
    else {
      val x2 = x * x
      val y2p = 2.0 + y
      val y2m = 2.0 - y
      val c = y2p * y2m - x2
      if (math.abs(c) < Tol) return err
      val phi = 2.0 * math.atan(math.pow(
        (y2p * y2p + x2) / (a2 * (y2m * y2m + x2)), hw)) - M.HalfPi
      (w * math.atan2(4.0 * x, c), phi)
    }
  }
}

/** Near-sided / tilted perspective (spherical; behavioral reference:
  * /root/reference/src/projections/nsper.cpp). `heightNorm` = h / a. */
final case class NsperKernel(override val ell: Ellipsoid,
                             heightNorm: Double,
                             lat0: Double = 0.0,
                             tilt: Double = 0.0, azi: Double = 0.0,
                             hasTilt: Boolean = false,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  private val Eps = 1e-10
  require(heightNorm > 0 && heightNorm <= 1e10, "nsper invalid h")
  // 0=EQUIT 1=OBLIQ 2=N_POLE 3=S_POLE
  private val mode: Int = {
    if (math.abs(math.abs(lat0) - M.HalfPi) < Eps) { if (lat0 < 0) 3 else 2 }
    else if (math.abs(lat0) < Eps) 0 else 1
  }
  private val sinph0 = math.sin(lat0)
  private val cosph0 = math.cos(lat0)
  private val pn1 = heightNorm
  private val p = 1.0 + pn1
  private val rp = 1.0 / p
  private val h = 1.0 / pn1
  private val pfact = (p + 1.0) * h
  private val cg = math.cos(azi); private val sg = math.sin(azi)
  private val cw = math.cos(tilt); private val sw = math.sin(tilt)

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val sinphi = math.sin(phi); val cosphi = math.cos(phi)
    var coslam = math.cos(lam)
    var y = mode match {
      case 1 => sinph0 * sinphi + cosph0 * cosphi * coslam
      case 0 => cosphi * coslam
      case 3 => -sinphi
      case _ => sinphi
    }
    if (y < rp) return err
    y = pn1 / (p - y)
    var x = y * cosphi * math.sin(lam)
    y *= (mode match {
      case 1 => cosph0 * sinphi - sinph0 * cosphi * coslam
      case 0 => sinphi
      case 2 => coslam = -coslam; cosphi * coslam
      case _ => cosphi * coslam
    })
    if (hasTilt) {
      val yt = y * cg + x * sg
      val ba = 1.0 / (yt * sw * h + cw)
      val xNew = (x * cg - y * sg) * cw * ba
      x = xNew
      y = yt * ba
    }
    (x, y)
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn; var y = yIn
    if (hasTilt) {
      val yt = 1.0 / (pn1 - y * sw)
      val bm = pn1 * x * yt
      val bq = pn1 * y * cw * yt
      x = bm * cg + bq * sg
      y = bq * cg - bm * sg
    }
    val rh = math.hypot(x, y)
    if (math.abs(rh) <= Eps) (0.0, lat0)
    else {
      var sinz = 1.0 - rh * rh * pfact
      if (sinz < 0) return err
      sinz = (p - math.sqrt(sinz)) / (pn1 / rh + rh / pn1)
      val cosz = math.sqrt(1.0 - sinz * sinz)
      var phi = 0.0
      mode match {
        case 1 =>
          phi = math.asin(cosz * sinph0 + y * sinz * cosph0 / rh)
          y = (cosz - sinph0 * math.sin(phi)) * rh
          x *= sinz * cosph0
        case 0 =>
          phi = math.asin(y * sinz / rh)
          y = cosz * rh
          x *= sinz
        case 2 =>
          phi = math.asin(cosz)
          y = -y
        case _ =>
          phi = -math.asin(cosz)
      }
      (math.atan2(x, y), phi)
    }
  }
}

/** Airy minimum-error azimuthal (spherical, forward-only; behavioral
  * reference: /root/reference/src/projections/airy.cpp). */
final case class AiryKernel(override val ell: Ellipsoid,
                            lat0: Double = 0.0, latB: Double = 0.0,
                            noCut: Boolean = false,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  private val Eps = 1e-10
  override def invertible: Boolean = false
  // 0=EQUIT 1=OBLIQ 2=N_POLE 3=S_POLE
  private val mode: Int = {
    if (math.abs(math.abs(lat0) - M.HalfPi) < Eps) { if (lat0 < 0) 3 else 2 }
    else if (math.abs(lat0) < Eps) 0 else 1
  }
  private val pHalfPi = if (mode == 3) -M.HalfPi else M.HalfPi
  private val sinph0 = math.sin(lat0)
  private val cosph0 = math.cos(lat0)
  private val cb = {
    val beta = 0.5 * (M.HalfPi - latB)
    if (math.abs(beta) < Eps) -0.5
    else {
      val c = 1.0 / math.tan(beta)
      c * c * math.log(math.cos(beta))
    }
  }

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val sinlam = math.sin(lam); val coslam = math.cos(lam)
    mode match {
      case 0 | 1 =>
        val sinphi = math.sin(phiIn); val cosphi = math.cos(phiIn)
        var cosz = cosphi * coslam
        if (mode == 1) cosz = sinph0 * sinphi + cosph0 * cosz
        if (!noCut && cosz < -Eps) return err
        val s = 1.0 - cosz
        val krho =
          if (math.abs(s) > Eps) {
            val t = 0.5 * (1.0 + cosz)
            if (t == 0) return err
            -math.log(t) / s - cb / t
          } else 0.5 - cb
        val x = krho * cosphi * sinlam
        val y =
          if (mode == 1) krho * (cosph0 * sinphi - sinph0 * cosphi * coslam)
          else krho * sinphi
        (x, y)
      case m =>
        var phi = math.abs(pHalfPi - phiIn)
        if (!noCut && (phi - Eps) > M.HalfPi) return err
        phi *= 0.5
        if (phi > Eps) {
          val t = math.tan(phi)
          val krho = -2.0 * (math.log(math.cos(phi)) / t + t * cb)
          val x = krho * sinlam
          var y = krho * coslam
          if (m == 2) y = -y
          (x, y)
        } else (0.0, 0.0)
    }
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}