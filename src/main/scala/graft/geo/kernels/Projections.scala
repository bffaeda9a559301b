package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Mercator, ellipsoidal and spherical, with optional lat_ts scaling
  * (behavioral reference: /root/reference/src/projections/merc.cpp). */
final case class MercKernel(override val ell: Ellipsoid,
                            latTs: Double = 0.0,
                            k0In: Double = 1.0,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val k0: Double =
    if (latTs != 0.0) {
      val p = math.abs(latTs)
      if (ell.isSphere) math.cos(p) else M.msfn(math.sin(p), math.cos(p), ell.es)
    } else k0In

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    // no pole guard: mirrors merc_e_forward which lets asinh grow without
    // bound (builtins.gie expects y=2.36e8 at lat=90-1e-14)
    val x = k0 * lam
    val y =
      if (ell.isSphere) k0 * M.asinh(math.tan(phi))
      else {
        val s = math.sin(phi); val c = math.cos(phi)
        k0 * (M.asinh(s / c) - ell.e * M.atanh(ell.e * s))
      }
    (x, y)
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi =
      if (ell.isSphere) math.atan(math.sinh(y / k0))
      else math.atan(M.sinhpsi2tanphi(math.sinh(y / k0), ell.e))
    (x / k0, phi)
  }
}

object WebMercKernel {
  /** Web Mercator: spherical kernels with k0=1 on the WGS84 semimajor
    * (/root/reference/src/projections/merc.cpp:76-84). */
  def apply(): MercKernel = MercKernel(Ellipsoid.SphereGoogle)
}

/** Equirectangular: spheroidal (EPSG:1029, Plate Carrée) and ellipsoidal
  * (EPSG:1028, meridional-distance based) cases (reference:
  * /root/reference/src/projections/eqc.cpp). */
final case class EqcKernel(override val ell: Ellipsoid,
                           latTs: Double = 0.0, lat0: Double = 0.0,
                           override val lam0: Double = 0.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val sinTs = math.sin(latTs)
  private val rc =
    if (ell.isSphere) math.cos(latTs)
    else math.cos(latTs) / math.sqrt(1.0 - ell.es * sinTs * sinTs)
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val muPhi = M.coeffsMuToPhi(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private val m0 = if (ell.isSphere) 0.0 else rectRad * M.auxConvert(lat0, phiMu)
  protected def project(lam: Double, phi: Double) =
    if (ell.isSphere) (rc * lam, phi - lat0)
    else (rc * lam, rectRad * M.auxConvert(phi, phiMu) - m0)
  protected def unproject(x: Double, y: Double) =
    if (ell.isSphere) (x / rc, y + lat0)
    else (x / rc, M.auxConvert((y + m0) / rectRad, muPhi))
}

/** Lambert Conformal Conic, 1- or 2-parallel, ellipsoid + sphere
  * (behavioral reference: /root/reference/src/projections/lcc.cpp). */
final case class LccKernel(override val ell: Ellipsoid,
                           lat1: Double, lat2Opt: Option[Double],
                           lat0: Double,
                           override val lam0: Double = 0.0,
                           k0: Double = 1.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  private val phi1 = lat1
  private val phi2 = lat2Opt.getOrElse(lat1)
  // cone constant n, scale c, origin radius rho0 — precomputed once.
  private val (nc, cc, rho0) = {
    val sin1 = math.sin(phi1); val cos1 = math.cos(phi1)
    val secant = math.abs(phi1 - phi2) >= Eps
    if (!ell.isSphere) {
      val m1 = M.msfn(sin1, cos1, ell.es)
      val t1 = M.tsfn(phi1, sin1, ell.e)
      val n =
        if (secant) {
          val sin2 = math.sin(phi2)
          math.log(m1 / M.msfn(sin2, math.cos(phi2), ell.es)) /
            math.log(t1 / M.tsfn(phi2, sin2, ell.e))
        } else sin1
      val c = m1 * math.pow(t1, -n) / n
      val r0 =
        if (math.abs(math.abs(lat0) - M.HalfPi) < Eps) 0.0
        else c * math.pow(M.tsfn(lat0, math.sin(lat0), ell.e), n)
      (n, c, r0)
    } else {
      val n =
        if (secant)
          math.log(cos1 / math.cos(phi2)) /
            math.log(math.tan(M.FortPi + 0.5 * phi2) /
              math.tan(M.FortPi + 0.5 * phi1))
        else sin1
      val c = cos1 * math.pow(math.tan(M.FortPi + 0.5 * phi1), n) / n
      val r0 =
        if (math.abs(math.abs(lat0) - M.HalfPi) < Eps) 0.0
        else c * math.pow(math.tan(M.FortPi + 0.5 * lat0), -n)
      (n, c, r0)
    }
  }

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var rho = 0.0
    if (math.abs(math.abs(phi) - M.HalfPi) < Eps) {
      if (phi * nc <= 0.0) return err
      rho = 0.0
    } else {
      rho = cc * (if (!ell.isSphere) math.pow(M.tsfn(phi, math.sin(phi), ell.e), nc)
                  else math.pow(math.tan(M.FortPi + 0.5 * phi), -nc))
    }
    val g = lam * nc
    (k0 * rho * math.sin(g), k0 * (rho0 - rho * math.cos(g)))
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn / k0
    var y = rho0 - yIn / k0
    var rho = math.sqrt(x * x + y * y)
    if (rho != 0.0) {
      if (nc < 0.0) { rho = -rho; x = -x; y = -y }
      val phi =
        if (!ell.isSphere) {
          val p = M.phi2(math.pow(rho / cc, 1.0 / nc), ell.e)
          if (java.lang.Double.isInfinite(p)) return err
          p
        } else 2.0 * math.atan(math.pow(cc / rho, 1.0 / nc)) - M.HalfPi
      (math.atan2(x, y) / nc, phi)
    } else (0.0, if (nc > 0) M.HalfPi else -M.HalfPi)
  }
}

/** Transverse Mercator engine selection, mirroring PROJ's TMercAlgo
  * (/root/reference/src/proj_internal.h:834-841). */
object TmercAlgo extends Enumeration {
  val Approx, PoderEngsager, Auto = Value
}

/** Transverse Mercator: Poder–Engsager exact series (6th order in the
  * third flattening, complex Clenshaw over conformal/rectifying auxiliary
  * latitudes) plus the Evenden/Snyder approximate engine with automatic
  * switching ~3 degrees from the central meridian.  Behavioral reference:
  * /root/reference/src/projections/tmerc.cpp (exact fwd :300-383, inv
  * :386-450, setup :452-489; approx fwd :71-116, inv :160-197; AUTO
  * :491-508). UTM parameterization per :630-672. */
final case class TmercKernel(override val ell: Ellipsoid,
                             lat0: Double = 0.0,
                             override val lam0: Double = 0.0,
                             k0: Double = 1.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0,
                             algo: TmercAlgo.Value = TmercAlgo.PoderEngsager)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  require(!ell.isSphere || algo == TmercAlgo.Approx,
    "spherical tmerc uses the approx engine")

  // --- exact (Poder-Engsager) constants ---
  private val cgb = M.coeffsChiToPhi(ell.n)
  private val cbg = M.coeffsPhiToChi(ell.n)
  private val utg = M.coeffsMuToChi(ell.n)
  private val gtu = M.coeffsChiToMu(ell.n)
  private val qn = k0 * M.rectifyingRadius(ell.n)
  private val zb = {
    val z = M.auxConvert(lat0, cbg)
    -qn * M.auxConvert(z, gtu)
  }
  /** |Ce| domain bound (150 degrees expressed in the conformal frame). */
  private val CeMax = 2.623395162778

  // --- approx (Evenden/Snyder) constants ---
  private val enMuPhi = M.coeffsMuToPhi(ell.n)
  private val enPhiMu = M.coeffsPhiToMu(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private val esp = if (ell.isSphere) k0 else ell.e2s
  private val ml0 =
    if (ell.isSphere) 0.5 * k0
    else rectRad * M.auxConvert(lat0, enPhiMu)

  private def mlfn(phi: Double, s: Double, c: Double): Double =
    rectRad * M.auxConvert(phi, s, c, enPhiMu)
  private def invMlfn(mu: Double): Double = M.auxConvert(mu / rectRad, enMuPhi)

  /** Complex Clenshaw summation of the 6-term trig series; returns
    * (real, imag) increments. */
  private def clenshawC(a: Array[Double], sinR: Double, cosR: Double,
                    sinhI: Double, coshI: Double): (Double, Double) = {
    val r0 = 2.0 * cosR * coshI
    val i0 = -2.0 * sinR * sinhI
    var hr1 = 0.0; var hi1 = 0.0; var hi = 0.0
    var hr = a(5)
    var k = 5
    while (k > 0) {
      k -= 1
      val hr2 = hr1; val hi2 = hi1
      hr1 = hr; hi1 = hi
      hr = -hr2 + r0 * hr1 - i0 * hi1 + a(k)
      hi = -hi2 + i0 * hr1 + r0 * hi1
    }
    val sr = sinR * coshI
    val si = cosR * sinhI
    (sr * hr - si * hi, sr * hi + si * hr)
  }

  private def exactFwd(lam: Double, phi: Double): (Double, Double) = {
    // geographic -> Gaussian (conformal) latitude
    var cn = M.auxConvert(phi, cbg)
    val sinCn = math.sin(cn); val cosCn = math.cos(cn)
    val sinCe = math.sin(lam); val cosCe = math.cos(lam)
    val cosCnCosCe = cosCn * cosCe
    cn = math.atan2(sinCn, cosCnCosCe)
    val invDen = 1.0 / math.hypot(sinCn, cosCnCosCe)
    val tanCe = sinCe * cosCn * invDen
    var ce = M.asinh(tanCe)
    // double-angle forms avoiding extra trig calls
    val twoInv = 2.0 * invDen
    val twoInvSq = twoInv * invDen
    val tmp = cosCnCosCe * twoInvSq
    val sinArgR = sinCn * tmp
    val cosArgR = cosCnCosCe * tmp - 1.0
    val sinhArgI = tanCe * twoInv
    val coshArgI = twoInvSq - 1.0
    val (dCn, dCe) = clenshawC(gtu, sinArgR, cosArgR, sinhArgI, coshArgI)
    cn += dCn
    ce += dCe
    if (math.abs(ce) <= CeMax) (qn * ce, qn * cn + zb)
    else err
  }

  private def exactInv(x: Double, y: Double): (Double, Double) = {
    var cn = (y - zb) / qn
    var ce = x / qn
    if (math.abs(ce) > CeMax) return err
    val sinArgR = math.sin(2.0 * cn)
    val cosArgR = math.cos(2.0 * cn)
    val e2 = math.exp(2.0 * ce)
    val sinhArgI = 0.5 * e2 - 0.5 / e2
    val coshArgI = 0.5 * e2 + 0.5 / e2
    val (dCn, dCe) = clenshawC(utg, sinArgR, cosArgR, sinhArgI, coshArgI)
    cn += dCn
    ce += dCe
    val sinCn = math.sin(cn); val cosCn = math.cos(cn)
    val sinhCe = math.sinh(ce)
    val lam = math.atan2(sinhCe, cosCn)
    val modCe = math.hypot(sinhCe, cosCn)
    val rr = math.hypot(sinCn, modCe)
    val cnOut = math.atan2(sinCn, modCe)
    val phi = M.auxConvert(cnOut, sinCn / rr, modCe / rr, cgb)
    (lam, phi)
  }

  private val FC1 = 1.0; private val FC2 = 0.5
  private val FC3 = 1.0 / 6; private val FC4 = 1.0 / 12
  private val FC5 = 0.05; private val FC6 = 1.0 / 30
  private val FC7 = 1.0 / 42; private val FC8 = 1.0 / 56

  private def approxFwd(lam: Double, phi: Double): (Double, Double) = {
    if (ell.isSphere) return sphFwd(lam, phi)
    // results are garbage beyond 90 degrees from the central meridian
    if (lam < -M.HalfPi || lam > M.HalfPi) return err
    val sinphi = math.sin(phi); val cosphi = math.cos(phi)
    var t = if (math.abs(cosphi) > 1e-10) sinphi / cosphi else 0.0
    t *= t
    var al = cosphi * lam
    val als = al * al
    al /= math.sqrt(1.0 - ell.es * sinphi * sinphi)
    val nn = esp * cosphi * cosphi
    val x = k0 * al * (FC1 + FC3 * als * (1.0 - t + nn +
      FC5 * als * (5.0 + t * (t - 18.0) + nn * (14.0 - 58.0 * t) +
        FC7 * als * (61.0 + t * (t * (179.0 - t) - 479.0)))))
    val y = k0 * (mlfn(phi, sinphi, cosphi) - ml0 +
      sinphi * al * lam * FC2 * (1.0 +
        FC4 * als * (5.0 - t + nn * (9.0 + 4.0 * nn) +
          FC6 * als * (61.0 + t * (t - 58.0) + nn * (270.0 - 330.0 * t) +
            FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))))))
    (x, y)
  }

  private def approxInv(x: Double, y: Double): (Double, Double) = {
    if (ell.isSphere) return sphInv(x, y)
    var phi = invMlfn(ml0 + y / k0)
    if (math.abs(phi) >= M.HalfPi) {
      (0.0, if (y < 0) -M.HalfPi else M.HalfPi)
    } else {
      val sinphi = math.sin(phi); val cosphi = math.cos(phi)
      var t = if (math.abs(cosphi) > 1e-10) sinphi / cosphi else 0.0
      val nn = esp * cosphi * cosphi
      var con = 1.0 - ell.es * sinphi * sinphi
      val d = x * math.sqrt(con) / k0
      con *= t
      t *= t
      val ds = d * d
      phi -= (con * ds / (1.0 - ell.es)) * FC2 * (1.0 -
        ds * FC4 * (5.0 + t * (3.0 - 9.0 * nn) + nn * (1.0 - 4.0 * nn) -
          ds * FC6 * (61.0 + t * (90.0 - 252.0 * nn + 45.0 * t) + 46.0 * nn -
            ds * FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1575.0 * t))))))
      val lam = d * (FC1 - ds * FC3 * (1.0 + 2.0 * t + nn -
        ds * FC5 * (5.0 + t * (28.0 + 24.0 * t + 8.0 * nn) + 6.0 * nn -
          ds * FC7 * (61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))))) / cosphi
      (lam, phi)
    }
  }

  private def sphFwd(lam: Double, phi: Double): (Double, Double) = {
    val cosphi = math.cos(phi)
    var b = cosphi * math.sin(lam)
    if (math.abs(math.abs(b) - 1.0) <= 1e-10) return err
    val x = ml0 * math.log((1.0 + b) / (1.0 - b))
    var y = 0.0
    if (cosphi == 1.0) {
      y = if (lam < -M.HalfPi || lam > M.HalfPi) math.Pi else 0.0
    } else {
      y = cosphi * math.cos(lam) / math.sqrt(1.0 - b * b)
      b = math.abs(y)
      if (b >= 1.0) {
        if (b - 1.0 > 1e-10) return err else y = 0.0
      } else y = math.acos(y)
    }
    if (phi < 0) y = -y
    (x, esp * (y - lat0))
  }

  private def sphInv(x: Double, y: Double): (Double, Double) = {
    val h = math.exp(x / esp)
    if (h == 0.0) return err
    val g = 0.5 * (h - 1.0 / h)
    val dd = lat0 + y / esp
    val hh = math.cos(dd)
    var phi = math.asin(math.sqrt((1.0 - hh * hh) / (1.0 + g * g)))
    phi = math.copySign(phi, dd)
    val lam = if (g != 0.0 || hh != 0.0) math.atan2(g, hh) else 0.0
    (lam, phi)
  }

  protected def project(lam: Double, phi: Double): (Double, Double) =
    algo match {
      case TmercAlgo.PoderEngsager => exactFwd(lam, phi)
      case TmercAlgo.Approx        => approxFwd(lam, phi)
      case TmercAlgo.Auto =>
        if (math.abs(lam) > 3.0 * M.DegToRad) exactFwd(lam, phi)
        else approxFwd(lam, phi)
    }

  protected def unproject(x: Double, y: Double): (Double, Double) =
    algo match {
      case TmercAlgo.PoderEngsager => exactInv(x, y)
      case TmercAlgo.Approx        => approxInv(x, y)
      case TmercAlgo.Auto =>
        // frontier parabola in normalized units, cf. tmerc.cpp:498-508
        if (math.abs(x) > 0.053 - 0.022 * y * y) exactInv(x, y)
        else approxInv(x, y)
    }
}

object UtmKernel {
  /** UTM = exact tmerc at zone central meridian, k0=0.9996, x0=500 km,
    * y0=0 (north) / 10,000 km (south). */
  def apply(zone: Int, south: Boolean = false,
            ell: Ellipsoid = Ellipsoid.GRS80): TmercKernel = {
    require(zone >= 1 && zone <= 60, s"bad UTM zone $zone")
    TmercKernel(ell, lat0 = 0.0,
      lam0 = (zone - 30.5) * math.Pi / 30.0,
      k0 = 0.9996, x0 = 500000.0, y0 = if (south) 10000000.0 else 0.0)
  }
}
