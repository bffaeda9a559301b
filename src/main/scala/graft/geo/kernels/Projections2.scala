package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Stereographic — polar / oblique / equatorial, sphere + ellipsoid
  * (behavioral reference: /root/reference/src/projections/stere.cpp).
  * `latTs` only affects the polar aspects (defaults to the pole). */
final case class StereKernel(override val ell: Ellipsoid,
                             lat0: Double = 0.0,
                             latTsIn: Double = M.HalfPi,
                             k0: Double = 1.0,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  private val latTs = math.abs(latTsIn)
  // 0=S_POLE 1=N_POLE 2=OBLIQ 3=EQUIT
  private val mode: Int = {
    val t = math.abs(lat0)
    if (math.abs(t - M.HalfPi) < Eps) { if (lat0 < 0) 0 else 1 }
    else if (t > Eps) 2 else 3
  }

  private def ssfn(phi: Double, sinphiIn: Double): Double = {
    val sinphi = sinphiIn * ell.e
    math.tan(0.5 * (M.HalfPi + phi)) *
      math.pow((1.0 - sinphi) / (1.0 + sinphi), 0.5 * ell.e)
  }

  private val (akm1, sinX1, cosX1) = {
    if (!ell.isSphere) {
      mode match {
        case 0 | 1 =>
          val a =
            if (math.abs(latTs - M.HalfPi) < Eps)
              2.0 * k0 / math.sqrt(
                math.pow(1 + ell.e, 1 + ell.e) * math.pow(1 - ell.e, 1 - ell.e))
            else {
              val t = math.sin(latTs)
              val base = math.cos(latTs) / M.tsfn(latTs, t, ell.e)
              val te = t * ell.e
              base / math.sqrt(1.0 - te * te)
            }
          (a, 0.0, 0.0)
        case _ =>
          val t = math.sin(lat0)
          val x = 2.0 * math.atan(ssfn(lat0, t)) - M.HalfPi
          val te = t * ell.e
          (2.0 * k0 * math.cos(lat0) / math.sqrt(1.0 - te * te),
            math.sin(x), math.cos(x))
      }
    } else {
      mode match {
        case 2 => (2.0 * k0, math.sin(lat0), math.cos(lat0))
        case 3 => (2.0 * k0, 0.0, 0.0)
        case _ =>
          (if (math.abs(latTs - M.HalfPi) >= Eps)
             math.cos(latTs) / math.tan(M.FortPi - 0.5 * latTs)
           else 2.0 * k0, 0.0, 0.0)
      }
    }
  }

  protected def project(lamIn: Double, phiIn: Double): (Double, Double) = {
    var lam = lamIn; var phi = phiIn
    var coslam = math.cos(lam)
    val sinlam = math.sin(lam)
    if (!ell.isSphere) {
      var sinphi = math.sin(phi)
      var x = 0.0; var y = 0.0
      mode match {
        case 2 => // OBLIQ
          val xx = 2.0 * math.atan(ssfn(phi, sinphi)) - M.HalfPi
          val sX = math.sin(xx); val cX = math.cos(xx)
          val denom = cosX1 * (1.0 + sinX1 * sX + cosX1 * cX * coslam)
          if (denom == 0) return err
          val a = akm1 / denom
          y = a * (cosX1 * sX - sinX1 * cX * coslam)
          x = a * cX
        case 3 => // EQUIT
          val xx = 2.0 * math.atan(ssfn(phi, sinphi)) - M.HalfPi
          val sX = math.sin(xx); val cX = math.cos(xx)
          val den = 1.0 + cX * coslam
          // DELIBERATE divergence from the reference at the antipode:
          // stere.cpp:66-73 emits (x=0, y=HUGE_VAL) and pj_fwd treats it
          // as success (only v[0] is errno-checked) — a silent infinity.
          // This engine fails the point typed instead of writing Inf
          // into a column.
          if (den == 0.0) return err
          val a = akm1 / den
          y = a * sX
          x = a * cX
        case m =>
          if (m == 0) { phi = -phi; coslam = -coslam; sinphi = -sinphi }
          x = if (math.abs(phi - M.HalfPi) < 1e-15) 0.0
              else akm1 * M.tsfn(phi, sinphi, ell.e)
          y = -x * coslam
      }
      (x * sinlam, y)
    } else {
      val sinphi = math.sin(phi); val cosphi = math.cos(phi)
      mode match {
        case 2 | 3 =>
          var yy =
            if (mode == 3) 1.0 + cosphi * coslam
            else 1.0 + sinX1 * sinphi + cosX1 * cosphi * coslam
          if (yy <= Eps) return err
          yy = akm1 / yy
          val x = yy * cosphi * sinlam
          val y = yy * (if (mode == 3) sinphi
                        else cosX1 * sinphi - sinX1 * cosphi * coslam)
          (x, y)
        case m =>
          var ph = phi; var cl = coslam
          if (m == 1) { cl = -cl; ph = -ph }
          if (math.abs(ph - M.HalfPi) < 1e-8) return err
          val yy = akm1 * math.tan(M.FortPi + 0.5 * ph)
          (sinlam * yy, yy * cl)
      }
    }
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn; var y = yIn
    if (!ell.isSphere) {
      val rho = math.hypot(x, y)
      var tp = 0.0; var phiL = 0.0; var halfe = 0.0; var halfpi = 0.0
      mode match {
        case 2 | 3 =>
          tp = 2.0 * math.atan2(rho * cosX1, akm1)
          val cosphi = math.cos(tp); val sinphi = math.sin(tp)
          phiL =
            if (rho == 0.0) math.asin(cosphi * sinX1)
            else math.asin(cosphi * sinX1 + (y * sinphi * cosX1 / rho))
          tp = math.tan(0.5 * (M.HalfPi + phiL))
          x *= sinphi
          y = rho * cosX1 * cosphi - y * sinX1 * sinphi
          halfpi = M.HalfPi; halfe = 0.5 * ell.e
        case m =>
          if (m == 1) y = -y
          tp = -rho / akm1
          phiL = M.HalfPi - 2.0 * math.atan(tp)
          halfpi = -M.HalfPi; halfe = -0.5 * ell.e
      }
      var i = 8
      while (i > 0) {
        val sinphi = ell.e * math.sin(phiL)
        val phi = 2.0 * math.atan(tp *
          math.pow((1.0 + sinphi) / (1.0 - sinphi), halfe)) - halfpi
        if (math.abs(phiL - phi) < 1e-10) {
          val outPhi = if (mode == 0) -phi else phi
          val lam = if (x == 0.0 && y == 0.0) 0.0 else math.atan2(x, y)
          return (lam, outPhi)
        }
        phiL = phi
        i -= 1
      }
      err
    } else {
      val rh = math.hypot(x, y)
      val c = 2.0 * math.atan(rh / akm1)
      val sinc = math.sin(c); val cosc = math.cos(c)
      mode match {
        case 3 =>
          val phi = if (math.abs(rh) <= Eps) 0.0 else math.asin(y * sinc / rh)
          val lam = if (cosc != 0.0 || x != 0.0) math.atan2(x * sinc, cosc * rh) else 0.0
          (lam, phi)
        case 2 =>
          val phi =
            if (math.abs(rh) <= Eps) lat0
            else math.asin(cosc * sinX1 + y * sinc * cosX1 / rh)
          val cc = cosc - sinX1 * math.sin(phi)
          val lam = if (cc != 0.0 || x != 0.0) math.atan2(x * sinc * cosX1, cc * rh) else 0.0
          (lam, phi)
        case m =>
          val yy = if (m == 1) -y else y
          val phi0 = if (math.abs(rh) <= Eps) lat0
                     else math.asin(if (m == 0) -cosc else cosc)
          val lam = if (x == 0.0 && yy == 0.0) 0.0 else math.atan2(x, yy)
          (lam, phi0)
      }
    }
  }
}

object UpsKernel {
  /** Universal Polar Stereographic: k0=0.994, x0=y0=2,000 km. */
  def apply(south: Boolean, ell: Ellipsoid = Ellipsoid.GRS80): StereKernel = {
    require(!ell.isSphere, "ups is ellipsoidal only")
    StereKernel(ell, lat0 = if (south) -M.HalfPi else M.HalfPi,
      latTsIn = M.HalfPi, k0 = 0.994, lam0 = 0.0, x0 = 2000000.0, y0 = 2000000.0)
  }
}

/** Albers Equal Area conic, sphere + ellipsoid via authalic latitude
  * (behavioral reference: /root/reference/src/projections/aea.cpp). */
final case class AeaKernel(override val ell: Ellipsoid,
                           lat1: Double, lat2: Double,
                           lat0: Double = 0.0,
                           override val lam0: Double = 0.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  require(math.abs(lat1) <= M.HalfPi && math.abs(lat2) <= M.HalfPi,
    "aea |lat| > 90")
  require(math.abs(lat1 + lat2) >= Eps, "aea |lat_1 + lat_2| ~ 0")

  private val secant = math.abs(lat1 - lat2) >= Eps
  private val xiPhi = M.coeffsXiToPhi(ell.n)
  private val qp = M.authalicQ(1.0, ell.e, ell.oneEs)

  private val (nc, cc, dd, n2, ec) = {
    var n = math.sin(lat1)
    val cosphi = math.cos(lat1)
    if (!ell.isSphere) {
      val m1 = M.msfn(math.sin(lat1), cosphi, ell.es)
      val ml1 = M.authalicQ(math.sin(lat1), ell.e, ell.oneEs)
      if (secant) {
        val m2 = M.msfn(math.sin(lat2), math.cos(lat2), ell.es)
        val ml2 = M.authalicQ(math.sin(lat2), ell.e, ell.oneEs)
        n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
      }
      val e = 1.0 - 0.5 * ell.oneEs *
        math.log((1.0 - ell.e) / (1.0 + ell.e)) / ell.e
      val c = m1 * m1 + n * ml1
      (n, c, 1.0 / n, 0.0, e)
    } else {
      if (secant) n = 0.5 * (n + math.sin(lat2))
      val nn2 = n + n
      val c = cosphi * cosphi + nn2 * math.sin(lat1)
      (n, c, 1.0 / n, nn2, 0.0)
    }
  }
  private val rho0 =
    if (!ell.isSphere)
      dd * math.sqrt(cc - nc * M.authalicQ(math.sin(lat0), ell.e, ell.oneEs))
    else dd * math.sqrt(cc - n2 * math.sin(lat0))

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val rhoSq =
      if (!ell.isSphere) cc - nc * M.authalicQ(math.sin(phi), ell.e, ell.oneEs)
      else cc - n2 * math.sin(phi)
    if (rhoSq < 0) return err
    val rho = dd * math.sqrt(rhoSq)
    val g = lam * nc
    (rho * math.sin(g), rho0 - rho * math.cos(g))
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn
    var y = rho0 - yIn
    var rho = math.hypot(x, y)
    if (rho != 0.0) {
      if (nc < 0) { rho = -rho; x = -x; y = -y }
      var phi = rho / dd
      if (!ell.isSphere) {
        val qs = (cc - phi * phi) / nc
        if (math.abs(ec - math.abs(qs)) > 1e-7) {
          if (math.abs(qs) > 2) return err
          phi = M.auxConvert(math.asin(qs / qp), xiPhi)
        } else phi = if (qs < 0) -M.HalfPi else M.HalfPi
      } else {
        val q2 = (cc - phi * phi) / n2
        phi = if (math.abs(q2) <= 1.0) math.asin(q2)
              else if (q2 < 0) -M.HalfPi else M.HalfPi
      }
      (math.atan2(x, y) / nc, phi)
    } else (0.0, if (nc > 0) M.HalfPi else -M.HalfPi)
  }
}

/** Lambert Azimuthal Equal Area, all aspects, sphere + ellipsoid
  * (behavioral reference: /root/reference/src/projections/laea.cpp). */
final case class LaeaKernel(override val ell: Ellipsoid,
                            lat0: Double = 0.0,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  // 0=EQUIT 1=OBLIQ 2=N_POLE 3=S_POLE
  private val mode: Int = {
    val t = math.abs(lat0)
    if (math.abs(t - M.HalfPi) < Eps) { if (lat0 < 0) 3 else 2 }
    else if (math.abs(t) < Eps) 0 else 1
  }
  private val xiPhi = M.coeffsXiToPhi(ell.n)
  private val phiXi = M.coeffsPhiToXi(ell.n)
  private val qp = M.authalicQ(1.0, ell.e, ell.oneEs)
  private val rq = math.sqrt(0.5 * qp)

  private val (sinb1, cosb1, dd, xmf, ymf) = {
    if (!ell.isSphere) {
      mode match {
        case 2 | 3 => (0.0, 0.0, 1.0, 0.0, 0.0)
        case 0     => (0.0, 0.0, 1.0 / rq, 1.0, 0.5 * qp)
        case _ =>
          val sinphi = math.sin(lat0)
          val b1 = M.auxConvert(lat0, phiXi)
          val sb = math.sin(b1); val cb = math.cos(b1)
          val d = math.cos(lat0) /
            (math.sqrt(1.0 - ell.es * sinphi * sinphi) * rq * cb)
          (sb, cb, d, rq * d, rq / d)
      }
    } else {
      if (mode == 1) (math.sin(lat0), math.cos(lat0), 0.0, 0.0, 0.0)
      else (0.0, 0.0, 0.0, 0.0, 0.0)
    }
  }

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val coslam = math.cos(lam); val sinlam = math.sin(lam)
    if (!ell.isSphere) {
      val xi = M.auxConvert(phi, phiXi)
      var q = math.sin(xi) * qp
      val sinb = math.sin(xi); val cosb = math.cos(xi)
      var b = mode match {
        case 1 => 1.0 + sinb1 * sinb + cosb1 * cosb * coslam
        case 0 => 1.0 + cosb * coslam
        case 2 => M.HalfPi + phi
        case _ => phi - M.HalfPi
      }
      if (mode == 2) q = qp - q
      if (mode == 3) q = qp + q
      if (math.abs(b) < Eps) return err
      mode match {
        case 1 =>
          b = math.sqrt(2.0 / b)
          val y = ymf * b * (cosb1 * sinb - sinb1 * cosb * coslam)
          val x = xmf * b * cosb * sinlam
          (x, y)
        case 0 =>
          b = math.sqrt(2.0 / (1.0 + cosb * coslam))
          (xmf * b * cosb * sinlam, b * sinb * ymf)
        case m =>
          if (q >= 1e-15) {
            b = math.sqrt(q)
            (b * sinlam, coslam * (if (m == 3) b else -b))
          } else (0.0, 0.0)
      }
    } else {
      val sinphi = math.sin(phi); val cosphi = math.cos(phi)
      mode match {
        case 0 | 1 =>
          var yy =
            if (mode == 0) 1.0 + cosphi * coslam
            else 1.0 + sinb1 * sinphi + cosb1 * cosphi * coslam
          if (yy <= Eps) return err
          yy = math.sqrt(2.0 / yy)
          val x = yy * cosphi * sinlam
          val y = yy * (if (mode == 0) sinphi
                        else cosb1 * sinphi - sinb1 * cosphi * coslam)
          (x, y)
        case m =>
          val cl = if (m == 2) -coslam else coslam
          if (math.abs(phi + lat0) < Eps) return err
          var yy = M.FortPi - phi * 0.5
          yy = 2.0 * (if (m == 3) math.cos(yy) else math.sin(yy))
          (yy * sinlam, yy * cl)
      }
    }
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn; var y = yIn
    if (!ell.isSphere) {
      var ab = 0.0
      mode match {
        case 0 | 1 =>
          x /= dd
          y *= dd
          val rho = math.hypot(x, y)
          if (rho < Eps) return (0.0, lat0)
          val arg = 0.5 * rho / rq
          if (arg > 1) return err
          var ce = 2.0 * math.asin(arg)
          val cCe = math.cos(ce); val sCe = math.sin(ce)
          x *= sCe
          if (mode == 1) {
            ab = cCe * sinb1 + y * sCe * cosb1 / rho
            y = rho * cosb1 * cCe - y * sinb1 * sCe
          } else {
            ab = y * sCe / rho
            y = rho * cCe
          }
        case m =>
          if (m == 2) y = -y
          val q = x * x + y * y
          if (q == 0.0) return (0.0, lat0)
          ab = 1.0 - q / qp
          if (m == 3) ab = -ab
      }
      val lam = math.atan2(x, y)
      val phi = M.auxConvert(math.asin(ab), xiPhi)
      (lam, phi)
    } else {
      val rh = math.hypot(x, y)
      var phi = rh * 0.5
      if (phi > 1.0) return err
      phi = 2.0 * math.asin(phi)
      var sinz = 0.0; var cosz = 0.0
      if (mode == 0 || mode == 1) { sinz = math.sin(phi); cosz = math.cos(phi) }
      mode match {
        case 0 =>
          phi = if (math.abs(rh) <= Eps) 0.0 else math.asin(y * sinz / rh)
          x *= sinz
          y = cosz * rh
        case 1 =>
          phi = if (math.abs(rh) <= Eps) lat0
                else math.asin(cosz * sinb1 + y * sinz * cosb1 / rh)
          x *= sinz * cosb1
          y = (cosz - math.sin(phi) * sinb1) * rh
        case 2 =>
          y = -y
          phi = M.HalfPi - phi
        case _ =>
          phi = phi - M.HalfPi
      }
      val lam =
        if (y == 0.0 && (mode == 0 || mode == 1)) 0.0
        else math.atan2(x, y)
      (lam, phi)
    }
  }
}

/** Azimuthal Equidistant: polar aspects via meridional distance, oblique /
  * equatorial via the Karney geodesic (behavioral reference:
  * /root/reference/src/projections/aeqd.cpp; geodesic normalized to a=1
  * per its setup geod_init(&g, 1, f)). */
final case class AeqdKernel(override val ell: Ellipsoid,
                            lat0: Double = 0.0,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  // 0=EQUIT 1=OBLIQ 2=N_POLE 3=S_POLE
  private val mode: Int = {
    val t = math.abs(lat0)
    if (math.abs(t - M.HalfPi) < Eps) { if (lat0 < 0) 3 else 2 }
    else if (math.abs(t) < Eps) 0 else 1
  }
  private val sinph0 = if (mode == 2) 1.0 else if (mode == 3) -1.0 else math.sin(lat0)
  private val cosph0 = if (mode == 2 || mode == 3) 0.0 else math.cos(lat0)
  @transient private lazy val geod = new graft.geo.geodesic.Geodesic(1.0, ell.f)
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val muPhi = M.coeffsMuToPhi(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private def mlfn(phi: Double): Double = rectRad * M.auxConvert(phi, phiMu)
  private def invMlfn(m: Double): Double = M.auxConvert(m / rectRad, muPhi)
  private val mp = if (mode == 2) mlfn(M.HalfPi) else mlfn(-M.HalfPi)

  private def geodFwd(lam: Double, phi: Double): (Double, Double) = {
    if (math.abs(lam) < Eps && math.abs(phi - lat0) < Eps) return (0.0, 0.0)
    val inv = geod.inverse(math.toDegrees(lat0), 0.0,
      math.toDegrees(phi), math.toDegrees(lam))
    val az = math.toRadians(inv.azi1)
    (inv.s12 * math.sin(az), inv.s12 * math.cos(az))
  }

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    if (!ell.isSphere) {
      mode match {
        case 2 | 3 =>
          val coslam = if (mode == 2) -math.cos(lam) else math.cos(lam)
          val rho = math.abs(mp - mlfn(phi))
          (rho * math.sin(lam), rho * coslam)
        case _ => geodFwd(lam, phi)
      }
    } else {
      val sinphi = math.sin(phi); val cosphi = math.cos(phi)
      val coslam = math.cos(lam); val sinlam = math.sin(lam)
      mode match {
        case 0 =>
          var yy = cosphi * coslam
          if (math.abs(math.abs(yy) - 1.0) < 1e-14) {
            if (yy < 0) return err else return geodFwd(lam, phi)
          }
          yy = math.acos(yy)
          yy /= math.sin(yy)
          (yy * cosphi * sinlam, yy * sinphi)
        case 1 =>
          var yy = sinph0 * sinphi + cosph0 * cosphi * coslam
          if (math.abs(math.abs(yy) - 1.0) < 1e-14) {
            if (yy < 0) return err else return geodFwd(lam, phi)
          }
          yy = math.acos(yy)
          yy /= math.sin(yy)
          (yy * cosphi * sinlam, yy * (cosph0 * sinphi - sinph0 * cosphi * coslam))
        case m =>
          var ph = phi; var cl = coslam
          if (m == 2) { ph = -ph; cl = -cl }
          if (math.abs(ph - M.HalfPi) < Eps) return err
          val yy = M.HalfPi + ph
          (yy * sinlam, yy * cl)
      }
    }
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    if (!ell.isSphere) {
      val s12 = math.hypot(x, y)
      if (s12 < Eps) return (0.0, lat0)
      mode match {
        case 1 | 0 =>
          val azi1 = math.toDegrees(math.atan2(x, y))
          val d = geod.direct(math.toDegrees(lat0), 0.0, azi1, s12)
          (math.toRadians(d.lon2), math.toRadians(d.lat2))
        case m =>
          val phi = invMlfn(if (m == 2) mp - s12 else mp + s12)
          (math.atan2(x, if (m == 2) -y else y), phi)
      }
    } else {
      var cRh = math.hypot(x, y)
      if (cRh > math.Pi) {
        if (cRh - Eps > math.Pi) return err
        cRh = math.Pi
      } else if (cRh < Eps) return (0.0, lat0)
      mode match {
        case 0 | 1 =>
          val sinc = math.sin(cRh); val cosc = math.cos(cRh)
          if (mode == 0) {
            val phi = math.asin(math.max(-1.0, math.min(1.0, y * sinc / cRh)))
            val xx = x * sinc
            val yy = cosc * cRh
            (if (yy == 0.0) 0.0 else math.atan2(xx, yy), phi)
          } else {
            val phi = math.asin(math.max(-1.0,
              math.min(1.0, cosc * sinph0 + y * sinc * cosph0 / cRh)))
            val yy = (cosc - sinph0 * math.sin(phi)) * cRh
            val xx = x * sinc * cosph0
            (if (yy == 0.0) 0.0 else math.atan2(xx, yy), phi)
          }
        case 2 => (math.atan2(x, -y), M.HalfPi - cRh)
        case _ => (math.atan2(x, y), cRh - M.HalfPi)
      }
    }
  }
}
