package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** S2 cube-face projection — linear / quadratic / tangent / none UV->ST
  * variants, geodetic<->geocentric latitude shift on ellipsoids
  * (behavioral reference: /root/reference/src/projections/s2.cpp).
  * Outputs are PROJECTED units (raw [0,1] ST / [-1,1] UV — no semimajor
  * scaling, fwd_finalize PJ_IO_UNITS_PROJECTED path).  The face is chosen
  * from (lat0, lon0) but coordinates keep their original longitude
  * (reference sets from_greenwich = -lam0 to undo the central-meridian
  * shift). */
object S2UvToSt extends Enumeration {
  val Linear, Quadratic, Tangent, None_ = Value
}

final case class S2Kernel(override val ell: Ellipsoid,
                          lat0Deg: Double = 0.0, lon0Deg: Double = 0.0,
                          uvToSt: S2UvToSt.Value = S2UvToSt.Quadratic,
                          override val x0: Double = 0.0,
                          override val y0: Double = 0.0)
    extends ProjectionKernel(ell, 0.0, x0, y0) {
  override protected def classicOutput: Boolean = false

  private val face: Int = {
    val phi0 = math.toRadians(lat0Deg)
    val lam0v = math.toRadians(lon0Deg)
    if (phi0 >= M.HalfPi - M.FortPi / 2.0) 2 // TOP
    else if (phi0 <= -(M.HalfPi - M.FortPi / 2.0)) 5 // BOTTOM
    else if (math.abs(lam0v) <= M.FortPi) 0 // FRONT
    else if (math.abs(lam0v) <= M.HalfPi + M.FortPi) { if (lam0v > 0) 1 else 4 }
    else 3 // BACK
  }
  private val oneMinusF = 1.0 - ell.f
  private val oneMinusFSq = oneMinusF * oneMinusF

  private def uvToStF(u: Double): Double = uvToSt match {
    case S2UvToSt.Linear    => 0.5 * (u + 1)
    case S2UvToSt.Quadratic =>
      if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)
    case S2UvToSt.Tangent   => (2 / math.Pi) * (math.atan(u) + M.FortPi)
    case S2UvToSt.None_     => u
  }

  private def stToUvF(s0: Double): Double = uvToSt match {
    case S2UvToSt.Linear    => 2 * s0 - 1
    case S2UvToSt.Quadratic =>
      if (s0 >= 0.5) (1.0 / 3) * (4 * s0 * s0 - 1)
      else (1.0 / 3) * (1 - 4 * (1 - s0) * (1 - s0))
    case S2UvToSt.Tangent =>
      val s = math.tan(M.HalfPi * s0 - M.FortPi)
      s + (1.0 / (1L << 53)) * s
    case S2UvToSt.None_ => s0
  }

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val phi = if (!ell.isSphere) math.atan(oneMinusFSq * math.tan(phiIn)) else phiIn
    val cl = math.cos(phi)
    val x = cl * math.cos(lam); val y = cl * math.sin(lam)
    val z = math.sin(phi)
    val (u, v) = graft.geo.cells.CellIndex.faceUv(face, x, y, z)
    (uvToStF(u), uvToStF(v))
  }

  protected def unproject(s0: Double, t0: Double): (Double, Double) = {
    val u = stToUvF(s0); val v = stToUvF(t0)
    val major = 1.0 / math.sqrt(1 + u * u + v * v)
    val m1 = u * major; val m2 = v * major
    val (x, y, z) = face match {
      case 0 => (major, m1, m2)
      case 1 => (-m1, major, m2)
      case 2 => (-m1, -m2, major)
      case 3 => (-major, -m2, -m1)
      case 4 => (m2, -major, -m1)
      case _ => (m2, m1, -major)
    }
    var phi = math.acos(-z) - M.HalfPi
    val lam = math.atan2(y, x)
    if (!ell.isSphere) {
      val invert = phi < 0.0
      val tanphi = math.tan(phi)
      val xa = ell.b / math.sqrt(tanphi * tanphi + oneMinusFSq)
      phi = math.atan(math.sqrt(ell.a * ell.a - xa * xa) / (oneMinusF * xa))
      if (invert) phi = -phi
    }
    (lam, phi)
  }
}

/** Equal Area Cylindrical (Lambert/Behrmann/Gall-Peters family), sphere +
  * ellipsoid via authalic q (reference:
  * /root/reference/src/projections/cea.cpp). */
final case class CeaKernel(override val ell: Ellipsoid,
                           latTs: Double = 0.0, k0In: Double = 1.0,
                           override val lam0: Double = 0.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0,
                           latTsSet: Boolean = true)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val k0: Double = {
    // reference cea.cpp: an EXPLICIT +lat_ts always overrides k0 with
    // cos(lat_ts) — including +lat_ts=0 alongside +k_0 (presence, not
    // value, decides)
    var k = if (latTsSet || k0In == 1.0) math.cos(latTs) else k0In
    if (!ell.isSphere) {
      val t = math.sin(latTs)
      k /= math.sqrt(1.0 - ell.es * t * t)
    }
    k
  }
  require(k0 >= 0, "cea |lat_ts| > 90")
  private val qp = M.authalicQ(1.0, ell.e, ell.oneEs)
  private val xiPhi = M.coeffsXiToPhi(ell.n)

  protected def project(lam: Double, phi: Double): (Double, Double) =
    if (ell.isSphere) (k0 * lam, math.sin(phi) / k0)
    else (k0 * lam, 0.5 * M.authalicQ(math.sin(phi), ell.e, ell.oneEs) / k0)

  protected def unproject(x: Double, y: Double): (Double, Double) =
    if (ell.isSphere) {
      val yy = y * k0
      val t = math.abs(yy)
      if (t - 1e-10 > 1.0) err
      else (x / k0, if (t >= 1.0) { if (yy < 0) -M.HalfPi else M.HalfPi }
                    else math.asin(yy))
    } else
      (x / k0, M.auxConvert(math.asin(2.0 * y * k0 / qp), xiPhi))
}

/** Gnomonic, spherical (the reference's ellipsoidal variant is
  * geodesic-based and out of this batch) — reference:
  * /root/reference/src/projections/gnom.cpp. */
final case class GnomKernel(override val ell: Ellipsoid,
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
    else if (t < Eps) 0 else 1
  }
  private val sinph0 = math.sin(lat0)
  private val cosph0 = math.cos(lat0)

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val sinphi = math.sin(phi); val cosphi = math.cos(phi)
    val coslam = math.cos(lam)
    var y = mode match {
      case 0 => cosphi * coslam
      case 1 => sinph0 * sinphi + cosph0 * cosphi * coslam
      case 3 => -sinphi
      case _ => sinphi
    }
    if (y <= Eps) return err
    y = 1.0 / y
    val x = y * cosphi * math.sin(lam)
    val yy = y * (mode match {
      case 0 => sinphi
      case 1 => cosph0 * sinphi - sinph0 * cosphi * coslam
      case 2 => cosphi * -coslam
      case _ => cosphi * coslam
    })
    (x, yy)
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn; var y = yIn
    val rh = math.hypot(x, y)
    var phi = math.atan(rh)
    val sinz = math.sin(phi)
    val cosz = math.sqrt(1.0 - sinz * sinz)
    if (math.abs(rh) <= Eps) (0.0, lat0)
    else {
      mode match {
        case 1 =>
          var ph = cosz * sinph0 + y * sinz * cosph0 / rh
          ph = if (math.abs(ph) >= 1.0) { if (ph > 0) M.HalfPi else -M.HalfPi }
               else math.asin(ph)
          y = (cosz - sinph0 * math.sin(ph)) * rh
          x *= sinz * cosph0
          phi = ph
        case 0 =>
          var ph = y * sinz / rh
          ph = if (math.abs(ph) >= 1.0) { if (ph > 0) M.HalfPi else -M.HalfPi }
               else math.asin(ph)
          y = cosz * rh
          x *= sinz
          phi = ph
        case 3 => phi = phi - M.HalfPi
        case _ =>
          phi = M.HalfPi - phi
          y = -y
      }
      (math.atan2(x, y), phi)
    }
  }
}

/** Mollweide (spherical; reference:
  * /root/reference/src/projections/moll.cpp with p = pi/2). */
final case class MollKernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(Ellipsoid(ell.a, 0.0), lam0, x0, y0) {
  private val p = M.HalfPi
  private val p2 = p + p
  private val sp = math.sin(p)
  private val r = math.sqrt(M.TwoPi * sp / (p2 + math.sin(p2)))
  private val cx = 2.0 * r / math.Pi
  private val cy = r / sp
  private val cp = p2 + math.sin(p2)

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    var phi = phiIn
    val k = cp * math.sin(phi)
    var i = 30 // near-pole Newton is slow (denominator 1+cos -> 0)
    var converged = false
    while (i > 0 && !converged) {
      val vv = (phi + math.sin(phi) - k) / (1.0 + math.cos(phi))
      phi -= vv
      if (math.abs(vv) < 1e-7) converged = true
      i -= 1
    }
    phi = if (!converged) { if (phi < 0) -M.HalfPi else M.HalfPi } else phi * 0.5
    (cx * lam * math.cos(phi), cy * math.sin(phi))
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val t = y / cy
    // aasin semantics: 1-ulp overshoot snaps to the pole (the reference
    // accepts it), beyond ONE_TOL is an error
    var phi = M.aasin(t)
    if (phi.isNaN) return err
    val lam = x / (cx * math.cos(phi))
    if (math.abs(lam) < math.Pi) {
      phi += phi
      val s = (phi + math.sin(phi)) / cp
      if (math.abs(s) > 1.0 + 1e-10) return err
      (lam, math.asin(math.max(-1.0, math.min(1.0, s))))
    } else err
  }
}

/** Sinusoidal, sphere + ellipsoid (reference:
  * /root/reference/src/projections/gn_sinu.cpp `sinu`). */
final case class SinuKernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val muPhi = M.coeffsMuToPhi(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)

  protected def project(lam: Double, phi: Double): (Double, Double) =
    if (ell.isSphere) (lam * math.cos(phi), phi)
    else {
      val s = math.sin(phi); val c = math.cos(phi)
      (lam * c / math.sqrt(1.0 - ell.es * s * s),
        rectRad * M.auxConvert(phi, s, c, phiMu))
    }

  protected def unproject(x: Double, y: Double): (Double, Double) =
    if (ell.isSphere) {
      if (math.abs(y) > M.HalfPi + 1e-10) err
      else if (M.HalfPi - math.abs(y) < 1e-10) (0.0, y)
      else (x / math.cos(y), y)
    } else {
      val phi = M.auxConvert(y / rectRad, muPhi)
      val aphi = math.abs(phi)
      if (aphi < M.HalfPi) {
        val s = math.sin(phi)
        (x * math.sqrt(1.0 - ell.es * s * s) / math.cos(phi), phi)
      } else if (aphi - 1e-10 < M.HalfPi) (0.0, phi)
      else err
    }
}

/** Equidistant Conic, sphere + ellipsoid (reference:
  * /root/reference/src/projections/eqdc.cpp). */
final case class EqdcKernel(override val ell: Ellipsoid,
                            lat1: Double, lat2: Double,
                            lat0: Double = 0.0,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  require(math.abs(lat1) <= M.HalfPi && math.abs(lat2) <= M.HalfPi,
    "eqdc |lat| > 90")
  require(math.abs(lat1 + lat2) >= Eps, "eqdc |lat_1 + lat_2| ~ 0")
  private val secant = math.abs(lat1 - lat2) >= Eps
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val muPhi = M.coeffsMuToPhi(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private def mlfn(phi: Double): Double = rectRad * M.auxConvert(phi, phiMu)

  private val (nc, cc, rho0) = {
    var n = math.sin(lat1)
    val cosphi = math.cos(lat1)
    if (!ell.isSphere) {
      val m1 = M.msfn(math.sin(lat1), cosphi, ell.es)
      val ml1 = mlfn(lat1)
      if (secant) {
        val m2 = M.msfn(math.sin(lat2), math.cos(lat2), ell.es)
        val ml2 = mlfn(lat2)
        n = (m1 - m2) / (ml2 - ml1)
      }
      val c = ml1 + m1 / n
      (n, c, c - mlfn(lat0))
    } else {
      if (secant) n = (cosphi - math.cos(lat2)) / (lat2 - lat1)
      val c = lat1 + math.cos(lat1) / n
      (n, c, c - lat0)
    }
  }

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val rho = cc - (if (!ell.isSphere) mlfn(phi) else phi)
    val g = lam * nc
    (rho * math.sin(g), rho0 - rho * math.cos(g))
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn
    var y = rho0 - yIn
    var rho = math.hypot(x, y)
    if (rho != 0.0) {
      if (nc < 0) { rho = -rho; x = -x; y = -y }
      var phi = cc - rho
      if (!ell.isSphere) phi = M.auxConvert(phi / rectRad, muPhi)
      (math.atan2(x, y) / nc, phi)
    } else (0.0, if (nc > 0) M.HalfPi else -M.HalfPi)
  }
}

/** Bonne (Werner at lat_1=90), sphere + ellipsoid (reference:
  * /root/reference/src/projections/bonne.cpp). */
final case class BonneKernel(override val ell: Ellipsoid,
                             lat1: Double,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  require(math.abs(lat1) >= Eps, "bonne |lat_1| ~ 0")
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val muPhi = M.coeffsMuToPhi(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private def mlfn(phi: Double): Double = rectRad * M.auxConvert(phi, phiMu)

  private val m1 = if (!ell.isSphere) mlfn(lat1) else 0.0
  private val am1 =
    if (!ell.isSphere) {
      val s = math.sin(lat1)
      math.cos(lat1) / (math.sqrt(1.0 - ell.es * s * s) * s)
    } else 0.0
  private val cphi1 =
    if (ell.isSphere) {
      if (math.abs(lat1) + Eps >= M.HalfPi) 0.0 else 1.0 / math.tan(lat1)
    } else 0.0

  protected def project(lam: Double, phi: Double): (Double, Double) =
    if (!ell.isSphere) {
      val e = math.sin(phi); val c = math.cos(phi)
      val rh = am1 + m1 - mlfn(phi)
      if (math.abs(rh) > Eps) {
        val ee = c * lam / (rh * math.sqrt(1.0 - ell.es * e * e))
        (rh * math.sin(ee), am1 - rh * math.cos(ee))
      } else (0.0, 0.0)
    } else {
      val rh = cphi1 + lat1 - phi
      if (math.abs(rh) > Eps) {
        val e = lam * math.cos(phi) / rh
        (rh * math.sin(e), cphi1 - rh * math.cos(e))
      } else (0.0, 0.0)
    }

  protected def unproject(x: Double, yIn: Double): (Double, Double) =
    if (!ell.isSphere) {
      val y = am1 - yIn
      val rh = math.copySign(math.hypot(x, y), lat1)
      val phi = M.auxConvert((am1 + m1 - rh) / rectRad, muPhi)
      val aphi = math.abs(phi)
      if (aphi < M.HalfPi) {
        val s = math.sin(phi)
        val lm = rh * math.sqrt(1.0 - ell.es * s * s) / math.cos(phi)
        if (lat1 > 0) (lm * math.atan2(x, y), phi)
        else (lm * math.atan2(-x, -y), phi)
      } else if (aphi - M.HalfPi <= Eps) (0.0, phi)
      else err
    } else {
      val y = cphi1 - yIn
      val rh = math.copySign(math.hypot(x, y), lat1)
      val phi = cphi1 + lat1 - rh
      val aphi = math.abs(phi)
      if (aphi > M.HalfPi) err
      else if (M.HalfPi - aphi <= Eps) (0.0, phi)
      else {
        val lm = rh / math.cos(phi)
        if (lat1 > 0) (lm * math.atan2(x, y), phi)
        else (lm * math.atan2(-x, -y), phi)
      }
    }
}