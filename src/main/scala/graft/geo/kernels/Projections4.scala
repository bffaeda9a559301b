package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Generic 2D Newton inverse on the projection's own forward kernel with
  * a numerical Jacobian (behavioral reference:
  * /root/reference/src/generic_inverse.cpp) — the standard refinement for
  * kernels whose closed-form inverse is approximate (cass ellipsoidal). */
trait GenericInverse2D { self: ProjectionKernel =>
  protected def genericInverse2d(x: Double, y: Double,
                                 lam0Guess: Double, phi0Guess: Double,
                                 tol: Double = 1e-12): (Double, Double) = {
    var lam = lam0Guess; var phi = phi0Guess
    var dLamX = 0.0; var dLamY = 0.0; var dPhiX = 0.0; var dPhiY = 0.0
    var i = 0
    while (i < 15) {
      val (ax, ay) = project(lam, phi)
      if (ax.isNaN) return err
      val dx = ax - x; val dy = ay - y
      if (math.abs(dx) < tol && math.abs(dy) < tol) return (lam, phi)
      if (i == 0 || math.abs(dx) > 1e-6 || math.abs(dy) > 1e-6) {
        val dl = if (lam > 0) -1e-6 else 1e-6
        val (x2, y2) = project(lam + dl, phi)
        val dXl = (x2 - ax) / dl; val dYl = (y2 - ay) / dl
        val dp = if (phi > 0) -1e-6 else 1e-6
        val (x3, y3) = project(lam, phi + dp)
        val dXp = (x3 - ax) / dp; val dYp = (y3 - ay) / dp
        val det = dXl * dYp - dXp * dYl
        if (det != 0) {
          dLamX = dYp / det; dLamY = -dXp / det
          dPhiX = -dYl / det; dPhiY = dXl / det
        }
      }
      val dLam = math.max(math.min(dx * dLamX + dy * dLamY, 0.3), -0.3)
      lam -= dLam
      if (lam < -math.Pi) lam = -math.Pi else if (lam > math.Pi) lam = math.Pi
      val dPhi = math.max(math.min(dx * dPhiX + dy * dPhiY, 0.3), -0.3)
      phi -= dPhi
      if (phi < -M.HalfPi) phi = -M.HalfPi
      else if (phi > M.HalfPi) phi = M.HalfPi
      i += 1
    }
    err
  }
}

/** Orthographic, all aspects, sphere + ellipsoid (EPSG GN 7-2 §3.3.5),
  * with the +alpha plane rotation (behavioral reference:
  * /root/reference/src/projections/ortho.cpp). */
final case class OrthoKernel(override val ell: Ellipsoid,
                             lat0: Double = 0.0, alpha: Double = 0.0,
                             k0: Double = 1.0,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  // 0=EQUIT 1=OBLIQ 2=N_POLE 3=S_POLE
  private val mode: Int = {
    if (math.abs(math.abs(lat0) - M.HalfPi) <= Eps) { if (lat0 < 0) 3 else 2 }
    else if (math.abs(lat0) > Eps) 1 else 0
  }
  private val sinph0 = math.sin(lat0)
  private val cosph0 = math.cos(lat0)
  private val sinalpha = math.sin(alpha)
  private val cosalpha = math.cos(alpha)
  private val nu0 = 1.0 / math.sqrt(1.0 - ell.es * sinph0 * sinph0)
  private val yShift = ell.es * nu0 * sinph0 * cosph0
  private val yScale = 1.0 / math.sqrt(1.0 - ell.es * cosph0 * cosph0)

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val cosphi = math.cos(phi); val sinphi = math.sin(phi)
    val coslam = math.cos(lam); val sinlam = math.sin(lam)
    if (ell.isSphere) {
      var y = mode match {
        case 0 =>
          if (cosphi * coslam < -Eps) return err
          sinphi
        case 1 =>
          if (sinph0 * sinphi + cosph0 * cosphi * coslam < -Eps) return err
          cosph0 * sinphi - sinph0 * cosphi * coslam
        case m =>
          if (math.abs(phi - lat0) - Eps > M.HalfPi) return err
          cosphi * (if (m == 2) -coslam else coslam)
      }
      val x = cosphi * sinlam
      ((x * cosalpha - y * sinalpha) * k0, (x * sinalpha + y * cosalpha) * k0)
    } else {
      if (sinph0 * sinphi + cosph0 * cosphi * coslam < -Eps) return err
      val nu = 1.0 / math.sqrt(1.0 - ell.es * sinphi * sinphi)
      val xp = nu * cosphi * sinlam
      val yp = nu * (sinphi * cosph0 - cosphi * sinph0 * coslam) +
        ell.es * (nu0 * sinph0 - nu * sinphi) * cosph0
      ((cosalpha * xp - sinalpha * yp) * k0, (sinalpha * xp + cosalpha * yp) * k0)
    }
  }

  /** spherical inverse on already-derotated (x, y) */
  private def sphInverse(xIn: Double, yIn: Double): (Double, Double) = {
    var x = xIn; var y = yIn
    val rh = math.hypot(x, y)
    var sinc = rh
    if (sinc > 1.0) {
      if (sinc - 1.0 > Eps) return err
      sinc = 1.0
    }
    val cosc = math.sqrt(1.0 - sinc * sinc)
    if (math.abs(rh) <= Eps) (0.0, lat0)
    else mode match {
      case 2 =>
        y = -y
        (math.atan2(x, y), math.acos(sinc))
      case 3 =>
        (math.atan2(x, y), -math.acos(sinc))
      case m =>
        var phi =
          if (m == 0) y * sinc / rh
          else cosc * sinph0 + y * sinc * cosph0 / rh
        if (m == 0) { x *= sinc; y = cosc * rh }
        else { y = (cosc - sinph0 * phi) * rh; x *= sinc * cosph0 }
        phi = if (math.abs(phi) >= 1.0) { if (phi < 0) -M.HalfPi else M.HalfPi }
              else math.asin(phi)
        val lam =
          if (y == 0.0) { if (x == 0.0) 0.0 else if (x < 0) -M.HalfPi else M.HalfPi }
          else math.atan2(x, y)
        (lam, phi)
    }
  }

  protected def unproject(xf: Double, yf: Double): (Double, Double) = {
    val x = (cosalpha * xf + sinalpha * yf) / k0
    val y = (-sinalpha * xf + cosalpha * yf) / k0
    if (ell.isSphere) sphInverse(x, y)
    else mode match {
      case 2 | 3 =>
        val rh2 = x * x + y * y
        if (rh2 >= 1.0 - 1e-15) {
          if (rh2 - 1.0 > Eps) return err
          (math.atan2(x, y * (if (mode == 2) -1 else 1)), 0.0)
        } else {
          val phi = math.acos(math.sqrt(rh2 * ell.oneEs / (1 - ell.es * rh2))) *
            (if (mode == 2) 1 else -1)
          (math.atan2(x, y * (if (mode == 2) -1 else 1)), phi)
        }
      case 0 =>
        if (x * x + math.pow(y * (ell.a / ell.b), 2) > 1 + 1e-11) return err
        val sinphi2 =
          if (y == 0) 0.0
          else 1.0 / (math.pow((1 - ell.es) / y, 2) + ell.es)
        if (sinphi2 > 1 - 1e-11)
          (0.0, M.HalfPi * (if (y > 0) 1 else -1))
        else {
          val phi = math.asin(math.sqrt(sinphi2)) * (if (y > 0) 1 else -1)
          val sinlam = x * math.sqrt((1 - ell.es * sinphi2) / (1 - sinphi2))
          val lam =
            if (math.abs(sinlam) - 1 > -1e-15) M.HalfPi * (if (x > 0) 1 else -1)
            else math.asin(sinlam)
          (lam, phi)
        }
      case _ =>
        val yRec = (y - yShift) / yScale
        if (x * x + yRec * yRec > 1 + 1e-11) return err
        // Newton on the forward equations, seeded by the spherical inverse
        var (lam, phi) = sphInverse(x, yRec)
        if (lam.isNaN) return err
        var i = 0
        while (i < 20) {
          val cosphi = math.cos(phi); val sinphi = math.sin(phi)
          val coslam = math.cos(lam); val sinlam = math.sin(lam)
          val ome = 1.0 - ell.es * sinphi * sinphi
          val nu = 1.0 / math.sqrt(ome)
          val xn = nu * cosphi * sinlam
          val yn = nu * (sinphi * cosph0 - cosphi * sinph0 * coslam) +
            ell.es * (nu0 * sinph0 - nu * sinphi) * cosph0
          val rho = (1.0 - ell.es) * nu / ome
          val j11 = -rho * sinphi * sinlam
          val j12 = nu * cosphi * coslam
          val j21 = rho * (cosphi * cosph0 + sinphi * sinph0 * coslam)
          val j22 = nu * sinph0 * cosphi * sinlam
          val det = j11 * j22 - j12 * j21
          if (det == 0) return err
          val dx = x - xn; val dy = y - yn
          val dphi = (j22 * dx - j12 * dy) / det
          val dlam = (-j21 * dx + j11 * dy) / det
          phi += dphi
          if (phi > M.HalfPi) { phi = M.HalfPi - (phi - M.HalfPi); lam = M.adjlon(lam + math.Pi) }
          else if (phi < -M.HalfPi) { phi = -M.HalfPi + (-M.HalfPi - phi); lam = M.adjlon(lam + math.Pi) }
          lam += dlam
          if (math.abs(dphi) < 1e-12 && math.abs(dlam) < 1e-12)
            return (lam, phi)
          i += 1
        }
        err
    }
  }
}

/** Cassini-Soldner, sphere + ellipsoid (+hyperbolic variant), ellipsoidal
  * inverse refined by the generic 2D Newton (behavioral reference:
  * /root/reference/src/projections/cass.cpp). */
final case class CassKernel(override val ell: Ellipsoid,
                            lat0: Double = 0.0,
                            hyperbolic: Boolean = false,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) with GenericInverse2D {
  private val C1 = 1.0 / 6; private val C2 = 1.0 / 120
  private val C3 = 1.0 / 24; private val C4 = 1.0 / 3; private val C5 = 1.0 / 15
  private val phiMu = M.coeffsPhiToMu(ell.n)
  private val muPhi = M.coeffsMuToPhi(ell.n)
  private val rectRad = M.rectifyingRadius(ell.n)
  private def mlfn(phi: Double): Double = rectRad * M.auxConvert(phi, phiMu)
  private val m0 = if (!ell.isSphere) mlfn(lat0) else 0.0

  protected def project(lam: Double, phi: Double): (Double, Double) =
    if (ell.isSphere)
      (math.asin(math.cos(phi) * math.sin(lam)),
        math.atan2(math.tan(phi), math.cos(lam)) - lat0)
    else {
      val sinphi = math.sin(phi); val cosphi = math.cos(phi)
      val mm = mlfn(phi)
      val nuSq = 1.0 / (1.0 - ell.es * sinphi * sinphi)
      val nu = math.sqrt(nuSq)
      val tanphi = math.tan(phi)
      val t = tanphi * tanphi
      val a1 = lam * cosphi
      val c = ell.es * (cosphi * cosphi) / (1 - ell.es)
      val a2 = a1 * a1
      val x = nu * a1 * (1.0 - a2 * t * (C1 + (8.0 - t + 8.0 * c) * a2 * C2))
      var y = mm - m0 + nu * tanphi * a2 * (0.5 + (5.0 - t + 6.0 * c) * a2 * C3)
      if (hyperbolic) {
        val rho = nuSq * (1.0 - ell.es) * nu
        y -= y * y * y / (6 * rho * nu)
      }
      (x, y)
    }

  protected def unproject(x: Double, y: Double): (Double, Double) =
    if (ell.isSphere) {
      val dd = y + lat0
      (math.atan2(math.tan(x), math.cos(dd)),
        math.asin(math.sin(dd) * math.cos(x)))
    } else {
      val phi1 = M.auxConvert((m0 + y) / rectRad, muPhi)
      val tanphi1 = math.tan(phi1)
      val t1 = tanphi1 * tanphi1
      val sinphi1 = math.sin(phi1)
      val nu1Sq = 1.0 / (1.0 - ell.es * sinphi1 * sinphi1)
      val nu1 = math.sqrt(nu1Sq)
      val rho1 = nu1Sq * (1.0 - ell.es) * nu1
      val d = x / nu1
      val d2 = d * d
      val phi = phi1 - (nu1 * tanphi1 / rho1) * d2 *
        (0.5 - (1.0 + 3.0 * t1) * d2 * C3)
      val lam = d * (1.0 + t1 * d2 * (-C4 + (1.0 + 3.0 * t1) * d2 * C5)) /
        math.cos(phi1)
      genericInverse2d(x, y, lam, phi)
    }
}

/** Oblique Stereographic Alternative (Roussilhe) via the Gauss conformal
  * sphere (behavioral reference: /root/reference/src/projections/sterea.cpp
  * + /root/reference/src/gauss.cpp). */
final case class StereaKernel(override val ell: Ellipsoid,
                              lat0: Double = 0.0, k0: Double = 1.0,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  // Gauss conformal-sphere constants (pj_gauss_ini)
  private val es = ell.es
  private val e = ell.e
  private val (gc, gk, ratexp, chi0, r2) = {
    val sphi = math.sin(lat0)
    var cphi = math.cos(lat0)
    cphi *= cphi
    val rc = math.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
    val c = math.sqrt(1.0 + es * cphi * cphi / (1.0 - es))
    val chi = math.asin(sphi / c)
    val rexp = 0.5 * c * e
    val sratv = srat(e * sphi, rexp)
    val k =
      if (0.5 * lat0 + M.FortPi < 1e-10) 1.0 / sratv
      else math.tan(0.5 * chi + M.FortPi) /
        (math.pow(math.tan(0.5 * lat0 + M.FortPi), c) * sratv)
    (c, k, rexp, chi, 2.0 * rc)
  }
  private val sinc0 = math.sin(chi0)
  private val cosc0 = math.cos(chi0)

  private def srat(esinp: Double, exp: Double): Double =
    math.pow((1.0 - esinp) / (1.0 + esinp), exp)

  private def gauss(lam: Double, phi: Double): (Double, Double) =
    (gc * lam,
      2.0 * math.atan(gk * math.pow(math.tan(0.5 * phi + M.FortPi), gc) *
        srat(e * math.sin(phi), ratexp)) - M.HalfPi)

  private def invGauss(slamIn: Double, sphiIn: Double): (Double, Double) = {
    val lam = slamIn / gc
    val num = math.pow(math.tan(0.5 * sphiIn + M.FortPi) / gk, 1.0 / gc)
    var sphi = sphiIn
    var phi = sphi
    var i = 20
    var done = false
    while (i > 0 && !done) {
      phi = 2.0 * math.atan(num * srat(e * math.sin(sphi), -0.5 * e)) - M.HalfPi
      if (math.abs(phi - sphi) < 1e-14) done = true
      sphi = phi
      i -= 1
    }
    if (!done) err else (lam, phi)
  }

  protected def project(lamIn: Double, phiIn: Double): (Double, Double) = {
    val (lam, phi) = gauss(lamIn, phiIn)
    val sinc = math.sin(phi); val cosc = math.cos(phi)
    val cosl = math.cos(lam)
    val denom = 1.0 + sinc0 * sinc + cosc0 * cosc * cosl
    if (denom == 0.0) return err
    val k = k0 * r2 / denom
    (k * cosc * math.sin(lam), k * (cosc0 * sinc - sinc0 * cosc * cosl))
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    val x = xIn / k0; val y = yIn / k0
    val rho = math.hypot(x, y)
    if (rho != 0.0) {
      val c = 2.0 * math.atan2(rho, r2)
      val sinc = math.sin(c); val cosc = math.cos(c)
      val phi = math.asin(cosc * sinc0 + y * sinc * cosc0 / rho)
      val lam = math.atan2(x * sinc, rho * cosc0 * cosc - y * sinc0 * sinc)
      invGauss(lam, phi)
    } else invGauss(0.0, chi0)
  }
}