package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Oblique Mercator (Hotine), alpha/gamma+lonc or two-point form, with
  * no_rot / no_off variants (behavioral reference:
  * /root/reference/src/projections/omerc.cpp).  The central meridian is
  * DERIVED at setup (lon_0 is ignored), so construction goes through the
  * companion which computes it. */
final class OmercKernel private (ell0: Ellipsoid, lam0v: Double,
                                 x00: Double, y00: Double,
                                 aQ: Double, bQ: Double, eQ: Double,
                                 singam: Double, cosgam: Double,
                                 sinrot: Double, cosrot: Double,
                                 u0: Double, vPoleN: Double, vPoleS: Double,
                                 noRot: Boolean)
    extends ProjectionKernel(ell0, lam0v, x00, y00) {
  private val Eps = 1e-10
  private val Tol = 1e-7
  private val arb = aQ / bQ
  private val bra = bQ / aQ
  private val rb = 1.0 / bQ

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var u = 0.0; var v = 0.0
    if (math.abs(math.abs(phi) - M.HalfPi) > Eps) {
      val w = eQ / math.pow(M.tsfn(phi, math.sin(phi), ell.e), bQ)
      val oneDivW = 1.0 / w
      val s = 0.5 * (w - oneDivW)
      val t = 0.5 * (w + oneDivW)
      val vv = math.sin(bQ * lam)
      val uu = (s * singam - vv * cosgam) / t
      if (math.abs(math.abs(uu) - 1.0) < Eps) return err
      v = 0.5 * arb * math.log((1.0 - uu) / (1.0 + uu))
      val temp = math.cos(bQ * lam)
      u = if (math.abs(temp) < Tol) aQ * lam
          else arb * math.atan2(s * cosgam + vv * singam, temp)
    } else {
      v = if (phi > 0) vPoleN else vPoleS
      u = arb * phi
    }
    if (noRot) (u, v)
    else {
      val uu = u - u0
      (v * cosrot + uu * sinrot, uu * cosrot - v * sinrot)
    }
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val (u, v) =
      if (noRot) (x, y)
      else (y * cosrot + x * sinrot + u0, x * cosrot - y * sinrot)
    val qp = math.exp(-bra * v)
    if (qp == 0) return err
    val sp = 0.5 * (qp - 1.0 / qp)
    val tp = 0.5 * (qp + 1.0 / qp)
    val vp = math.sin(bra * u)
    val up = (vp * cosgam + sp * singam) / tp
    if (math.abs(math.abs(up) - 1.0) < Eps)
      (0.0, if (up < 0) -M.HalfPi else M.HalfPi)
    else {
      val t = eQ / math.sqrt((1.0 + up) / (1.0 - up))
      val phi = M.phi2(math.pow(t, 1.0 / bQ), ell.e)
      if (phi.isInfinite || phi.isNaN) return err
      val lam = -rb * math.atan2(sp * cosgam - vp * singam, math.cos(bra * u))
      (lam, phi)
    }
  }
}

object OmercKernel {
  private val Tol = 1e-7
  private val Eps = 1e-10

  /** alpha/gamma form (angles radians); noOff per +no_off/+no_uoff. */
  def fromAzimuth(ell: Ellipsoid, lat0: Double, lonc: Double,
                  alphaOpt: Option[Double], gammaOpt: Option[Double],
                  k0: Double = 1.0, x0: Double = 0.0, y0: Double = 0.0,
                  noOff: Boolean = false, noRot: Boolean = false): OmercKernel =
    build(ell, lat0, k0, x0, y0, noRot, Left((lonc, alphaOpt, gammaOpt, noOff)))

  /** two-point form. */
  def fromTwoPoints(ell: Ellipsoid, lat0: Double,
                    lam1: Double, phi1: Double, lam2: Double, phi2: Double,
                    k0: Double = 1.0, x0: Double = 0.0, y0: Double = 0.0,
                    noRot: Boolean = false): OmercKernel = {
    require(math.abs(phi1) <= M.HalfPi - Tol, "omerc |lat_1| >= 90")
    require(math.abs(phi2) <= M.HalfPi - Tol, "omerc |lat_2| >= 90")
    require(math.abs(phi1 - phi2) > Tol, "omerc lat_1 == lat_2")
    require(math.abs(phi1) > Tol, "omerc lat_1 == 0")
    require(math.abs(math.abs(lat0) - M.HalfPi) > Tol, "omerc |lat_0| >= 90")
    build(ell, lat0, k0, x0, y0, noRot, Right((lam1, phi1, lam2, phi2)))
  }

  private def build(ell: Ellipsoid, lat0: Double, k0: Double,
                    x0: Double, y0: Double, noRot: Boolean,
                    form: Either[(Double, Option[Double], Option[Double], Boolean),
                                 (Double, Double, Double, Double)]): OmercKernel = {
    val com = math.sqrt(ell.oneEs)
    var bQ = 0.0; var aQ = 0.0; var eQ = 0.0; var dD = 0.0; var fF = 0.0
    if (math.abs(lat0) > Eps) {
      val sinph0 = math.sin(lat0); val cosph0 = math.cos(lat0)
      val con = 1.0 - ell.es * sinph0 * sinph0
      var b = cosph0 * cosph0
      b = math.sqrt(1.0 + ell.es * b * b / ell.oneEs)
      bQ = b
      aQ = b * k0 * com / con
      dD = b * com / (cosph0 * math.sqrt(con))
      fF = dD * dD - 1.0
      if (fF <= 0) fF = 0.0
      else {
        fF = math.sqrt(fF)
        if (lat0 < 0) fF = -fF
      }
      fF += dD
      eQ = fF * math.pow(M.tsfn(lat0, sinph0, ell.e), b)
    } else {
      bQ = 1.0 / com
      aQ = k0
      eQ = 1.0; dD = 1.0; fF = 1.0
    }

    var gamma0 = 0.0; var gamma = 0.0; var alphaC = 0.0
    var lam0 = 0.0; var noOff = false
    form match {
      case Left((lonc, alphaOpt, gammaOpt, off)) =>
        noOff = off
        (alphaOpt, gammaOpt) match {
          case (Some(a), g) =>
            alphaC = a
            gamma0 = math.asin(math.min(1.0, math.max(-1.0, math.sin(a) / dD)))
            gamma = g.getOrElse(a)
          case (None, Some(g)) =>
            gamma0 = g
            val sg = dD * math.sin(gamma0)
            require(math.abs(sg) <= 1.0 + 1e-10, "omerc |gamma| too large for lat_0")
            alphaC = math.asin(math.min(1.0, math.max(-1.0, sg)))
            gamma = g
          case _ => throw new IllegalArgumentException("omerc needs alpha or gamma")
        }
        require(math.abs(math.abs(lat0) - M.HalfPi) > Tol, "omerc |lat_0| >= 90")
        lam0 = lonc - math.asin(math.min(1.0, math.max(-1.0,
          0.5 * (fF - 1.0 / fF) * math.tan(gamma0)))) / bQ
      case Right((lam1, phi1, lam2in, phi2)) =>
        val h = math.pow(M.tsfn(phi1, math.sin(phi1), ell.e), bQ)
        val l = math.pow(M.tsfn(phi2, math.sin(phi2), ell.e), bQ)
        val f = eQ / h
        val p = (l - h) / (l + h)
        require(p != 0, "omerc eccentricity degenerate")
        var j = eQ * eQ
        j = (j - l * h) / (j + l * h)
        var lam2 = lam2in
        val con = lam1 - lam2
        if (con < -math.Pi) lam2 -= M.TwoPi
        else if (con > math.Pi) lam2 += M.TwoPi
        lam0 = M.adjlon(0.5 * (lam1 + lam2) -
          math.atan(j * math.tan(0.5 * bQ * (lam1 - lam2)) / p) / bQ)
        val denom = f - 1.0 / f
        require(denom != 0, "omerc eccentricity degenerate")
        gamma0 = math.atan(2.0 * math.sin(bQ * M.adjlon(lam1 - lam0)) / denom)
        alphaC = math.asin(math.min(1.0, math.max(-1.0, dD * math.sin(gamma0))))
        gamma = alphaC
    }
    val singam = math.sin(gamma0)
    val cosgam = math.cos(gamma0)
    val sinrot = math.sin(gamma)
    val cosrot = math.cos(gamma)
    val arb = aQ / bQ
    val u0 =
      if (noOff) 0.0
      else {
        val u = math.abs(arb * math.atan(math.sqrt(dD * dD - 1.0) / math.cos(alphaC)))
        if (lat0 < 0) -u else u
      }
    val f2 = 0.5 * gamma0
    val vPoleN = arb * math.log(math.tan(M.FortPi - f2))
    val vPoleS = arb * math.log(math.tan(M.FortPi + f2))
    new OmercKernel(ell, lam0, x0, y0, aQ, bQ, eQ, singam, cosgam,
      sinrot, cosrot, u0, vPoleN, vPoleS, noRot)
  }
}

/** Krovak (S-JTSK), fixed Bessel ellipsoid, default-and +czech sign
  * conventions (behavioral reference:
  * /root/reference/src/projections/krovak.cpp; modified-Krovak
  * polynomial variant out of scope). */
final case class KrovakKernel(lat0In: Double = Double.NaN,
                              lam0In: Double = Double.NaN,
                              k0In: Double = Double.NaN,
                              czech: Boolean = false,
                              userRa: Double = Double.NaN,
                              modified: Boolean = false,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(
      Ellipsoid(6377397.155, 1.0 / (1.0 - math.sqrt(1.0 - 0.006674372230614))),
      if (lam0In.isNaN) 0.7417649320975901 - 0.308341501185665 else lam0In,
      x0, y0) {
  override protected def invInputScale: Double =
    if (userRa.isNaN) ell.ra else userRa
  private val S0 = 1.37008346281555
  private val UQ = 1.04216856380474
  private val phi0 = if (lat0In.isNaN) 0.863937979737193 else lat0In
  private val k0 = if (k0In.isNaN) 0.9999 else k0In
  require(math.tan(phi0 / 2.0 + M.FortPi) != 0.0, "krovak lat_0 + 90 ~ 0")

  private val alpha =
    math.sqrt(1.0 + (ell.es * math.pow(math.cos(phi0), 4)) / (1.0 - ell.es))
  private val u0v = math.asin(math.sin(phi0) / alpha)
  private val g = math.pow((1.0 + ell.e * math.sin(phi0)) /
    (1.0 - ell.e * math.sin(phi0)), alpha * ell.e / 2.0)
  private val kk = math.tan(u0v / 2.0 + M.FortPi) /
    math.pow(math.tan(phi0 / 2.0 + M.FortPi), alpha) * g
  private val n0 = math.sqrt(1.0 - ell.es) /
    (1.0 - ell.es * math.pow(math.sin(phi0), 2))
  private val nc = math.sin(S0)
  private val rho0 = k0 * n0 / math.tan(S0)
  private val ad = M.HalfPi - UQ

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val esin = ell.e * math.sin(phi)
    val gfi = math.pow((1.0 + esin) / (1.0 - esin), alpha * ell.e / 2.0)
    val u = 2.0 * (math.atan(
      kk * math.pow(math.tan(phi / 2.0 + M.FortPi), alpha) / gfi) - M.FortPi)
    val deltav = -lam * alpha
    val s = math.asin(math.cos(ad) * math.sin(u) +
      math.sin(ad) * math.cos(u) * math.cos(deltav))
    val cosS = math.cos(s)
    if (cosS < 1e-12) return (0.0, 0.0)
    val d = math.asin(math.cos(u) * math.sin(deltav) / cosS)
    val eps = nc * d
    val rho = rho0 * math.pow(math.tan(S0 / 2.0 + M.FortPi), nc) /
      math.pow(math.tan(s / 2.0 + M.FortPi), nc)
    var xx = rho * math.cos(eps) // southing
    var yy = rho * math.sin(eps) // westing
    if (modified) {
      // EPSG mod-Krovak polynomial correction in (Southing, Westing) m
      val (dx, dy) = KrovakKernel.modDxDy(xx * ell.a - 1089000.0,
        yy * ell.a - 654000.0)
      xx -= dx * ell.ra
      yy -= dy * ell.ra
    }
    // swap to (easting-ish, northing-ish)
    val t = xx; xx = yy; yy = t
    if (!czech) {
      (-xx - 2 * x0 * ell.ra, -yy - 2 * y0 * ell.ra)
    } else (xx, yy)
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn; var y = yIn
    if (!czech) {
      val ty = -y - 2 * x0 * ell.ra
      val tx = -x - 2 * y0 * ell.ra
      y = ty; x = tx
    }
    // swap back to (southing, westing)
    val t = x; x = y; y = t
    if (modified) {
      val (dx, dy) = KrovakKernel.modDxDy(x * ell.a - 1089000.0,
        y * ell.a - 654000.0)
      x += dx * ell.ra
      y += dy * ell.ra
    }
    val rho = math.sqrt(x * x + y * y)
    val eps = math.atan2(y, x)
    val d = eps / math.sin(S0)
    val s =
      if (rho == 0.0) M.HalfPi
      else 2.0 * (math.atan(math.pow(rho0 / rho, 1.0 / nc) *
        math.tan(S0 / 2.0 + M.FortPi)) - M.FortPi)
    val u = math.asin(math.cos(ad) * math.sin(s) -
      math.sin(ad) * math.cos(s) * math.cos(d))
    val deltav = math.asin(math.cos(s) * math.sin(d) / math.cos(u))
    val lamAbs = -deltav / alpha // relative to lam0 (base adds lam0 back)
    var fi1 = u
    var phi = 0.0
    var i = 100
    var done = false
    while (i > 0 && !done) {
      phi = 2.0 * (math.atan(math.pow(kk, -1.0 / alpha) *
        math.pow(math.tan(u / 2.0 + M.FortPi), 1.0 / alpha) *
        math.pow((1.0 + ell.e * math.sin(fi1)) / (1.0 - ell.e * math.sin(fi1)),
          ell.e / 2.0)) - M.FortPi)
      if (math.abs(fi1 - phi) < 1e-15) done = true
      fi1 = phi
      i -= 1
    }
    if (!done) err else (lamAbs, phi)
  }
}

object KrovakKernel {
  /** Modified-Krovak corrective polynomial (reference:
    * /root/reference/src/projections/krovak.cpp:109-140). */
  def modDxDy(xr: Double, yr: Double): (Double, Double) = {
    val C1 = 2.946529277e-2; val C2 = 2.515965696e-2
    val C3 = 1.193845912e-7; val C4 = -4.668270147e-7
    val C5 = 9.233980362e-12; val C6 = 1.523735715e-12
    val C7 = 1.696780024e-18; val C8 = 4.408314235e-18
    val C9 = -8.331083518e-24; val C10 = -3.689471323e-24
    val xr2 = xr * xr; val yr2 = yr * yr
    val xr4 = xr2 * xr2; val yr4 = yr2 * yr2
    val dX = C1 + C3 * xr - C4 * yr - 2 * C6 * xr * yr + C5 * (xr2 - yr2) +
      C7 * xr * (xr2 - 3 * yr2) - C8 * yr * (3 * xr2 - yr2) +
      4 * C9 * xr * yr * (xr2 - yr2) + C10 * (xr4 + yr4 - 6 * xr2 * yr2)
    val dY = C2 + C3 * yr + C4 * xr + 2 * C5 * xr * yr + C6 * (xr2 - yr2) +
      C8 * xr * (xr2 - 3 * yr2) + C7 * yr * (3 * xr2 - yr2) -
      4 * C10 * xr * yr * (xr2 - yr2) + C9 * (xr4 + yr4 - 6 * xr2 * yr2)
    (dX, dY)
  }
}

/** CalCOFI oceanographic line/station grid (Eber & Hewitt 1979;
  * behavioral reference: /root/reference/src/projections/calcofi.cpp).
  * The reference stomps a=1, lam0=0, x0=y0=0 at setup: outputs are raw
  * line/station numbers. */
final case class CalcofiKernel(userEll: graft.geo.math.Ellipsoid)
    extends ProjectionKernel(
      graft.geo.math.Ellipsoid(1.0, userEll.rf), 0.0, 0.0, 0.0) {
  // reference forces P->over = 1 at setup (calcofi.cpp:143): line/station
  // space extends past the dateline and must not be longitude-wrapped
  override protected def overFlag: Boolean = true
  private val PtOLine = 80.0
  private val PtOStation = 60.0
  private val PtOLambda = -2.1144663887911301
  private val PtOPhi = 0.59602993955606354
  private val Rot = 0.52359877559829882
  private val LineToRad = 0.0034906585039886592
  private val StationToRad = 0.0011635528346628863

  private def mercY(phi: Double): Double =
    if (ell.isSphere) math.log(math.tan(M.FortPi + 0.5 * phi))
    else -math.log(M.tsfn(phi, math.sin(phi), ell.e))
  private def invMercY(y: Double): Double =
    if (ell.isSphere) M.HalfPi - 2.0 * math.atan(math.exp(-y))
    else M.phi2(math.exp(-y), ell.e)

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    if (math.abs(math.abs(phi) - M.HalfPi) <= 1e-10) return err
    val y = mercY(phi)
    val oy = mercY(PtOPhi)
    val l1 = (y - oy) * math.tan(Rot)
    val l2 = -lam - l1 + PtOLambda
    var ry = l2 * math.cos(Rot) * math.sin(Rot) + y
    ry = invMercY(ry)
    (PtOLine - M.RadToDeg * (ry - PtOPhi) * 5.0 / math.cos(Rot),
      PtOStation + M.RadToDeg * (ry - phi) * 15.0 / math.sin(Rot))
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val ry = PtOPhi - LineToRad * (x - PtOLine) * math.cos(Rot)
    val phi = ry - StationToRad * (y - PtOStation) * math.sin(Rot)
    val oy = mercY(PtOPhi)
    val rym = mercY(ry)
    val xym = mercY(phi)
    val l1 = (xym - oy) * math.tan(Rot)
    val l2 = (rym - xym) / (math.cos(Rot) * math.sin(Rot))
    (PtOLambda - (l1 + l2), phi)
  }
}
