package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Quadrilateralized Spherical Cube (COBE sky cube; O'Neill & Laubscher
  * 1976), all six faces, geodetic<->geocentric latitude shift on
  * ellipsoids (behavioral reference:
  * /root/reference/src/projections/qsc.cpp). */
final case class QscKernel(override val ell: Ellipsoid,
                           lat0Deg: Double = 0.0, lon0Deg: Double = 0.0,
                           override val lam0: Double = 0.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  // 0=FRONT 1=RIGHT 2=BACK 3=LEFT 4=TOP 5=BOTTOM (reference enum)
  private val face: Int = {
    val phi0 = math.toRadians(lat0Deg)
    val l0 = math.toRadians(lon0Deg)
    if (phi0 >= M.HalfPi - M.FortPi / 2.0) 4
    else if (phi0 <= -(M.HalfPi - M.FortPi / 2.0)) 5
    else if (math.abs(l0) <= M.FortPi) 0
    else if (math.abs(l0) <= M.HalfPi + M.FortPi) { if (l0 > 0) 1 else 3 }
    else 2
  }
  private val oneMinusF = 1.0 - ell.f
  private val oneMinusFSq = oneMinusF * oneMinusF

  private def shiftLon(lon: Double, offset: Double): Double = {
    val s = lon + offset
    if (s < -math.Pi) s + M.TwoPi else if (s > math.Pi) s - M.TwoPi else s
  }

  /** returns (theta, area) for an equatorial face */
  private def equatFaceTheta(phi: Double, y: Double, x: Double): (Double, Int) = {
    if (phi < Eps) (0.0, 0)
    else {
      val th = math.atan2(y, x)
      if (math.abs(th) <= M.FortPi) (th, 0)
      else if (th > M.FortPi && th <= M.HalfPi + M.FortPi) (th - M.HalfPi, 1)
      else if (th > M.HalfPi + M.FortPi || th <= -(M.HalfPi + M.FortPi))
        (if (th >= 0) th - math.Pi else th + math.Pi, 2)
      else (th + M.HalfPi, 3)
    }
  }

  protected def project(lamIn: Double, phiIn: Double): (Double, Double) = {
    val lat = if (!ell.isSphere) math.atan(oneMinusFSq * math.tan(phiIn)) else phiIn
    var longitude = lamIn
    var phi = 0.0; var theta = 0.0; var area = 0
    if (face == 4) { // TOP
      phi = M.HalfPi - lat
      if (longitude >= M.FortPi && longitude <= M.HalfPi + M.FortPi) {
        area = 0; theta = longitude - M.HalfPi
      } else if (longitude > M.HalfPi + M.FortPi ||
                 longitude <= -(M.HalfPi + M.FortPi)) {
        area = 1; theta = if (longitude > 0) longitude - math.Pi else longitude + math.Pi
      } else if (longitude > -(M.HalfPi + M.FortPi) && longitude <= -M.FortPi) {
        area = 2; theta = longitude + M.HalfPi
      } else { area = 3; theta = longitude }
    } else if (face == 5) { // BOTTOM
      phi = M.HalfPi + lat
      if (longitude >= M.FortPi && longitude <= M.HalfPi + M.FortPi) {
        area = 0; theta = -longitude + M.HalfPi
      } else if (longitude < M.FortPi && longitude >= -M.FortPi) {
        area = 1; theta = -longitude
      } else if (longitude < -M.FortPi && longitude >= -(M.HalfPi + M.FortPi)) {
        area = 2; theta = -longitude - M.HalfPi
      } else {
        area = 3
        theta = if (longitude > 0) -longitude + math.Pi else -longitude - math.Pi
      }
    } else {
      if (face == 1) longitude = shiftLon(longitude, M.HalfPi)
      else if (face == 2) longitude = shiftLon(longitude, math.Pi)
      else if (face == 3) longitude = shiftLon(longitude, -M.HalfPi)
      val sinlat = math.sin(lat); val coslat = math.cos(lat)
      val sinlon = math.sin(longitude); val coslon = math.cos(longitude)
      val q = coslat * coslon
      val r = coslat * sinlon
      val s = sinlat
      face match {
        case 0 => phi = math.acos(q);  val (t, a) = equatFaceTheta(phi, s, r);  theta = t; area = a
        case 1 => phi = math.acos(r);  val (t, a) = equatFaceTheta(phi, s, -q); theta = t; area = a
        case 2 => phi = math.acos(-q); val (t, a) = equatFaceTheta(phi, s, -r); theta = t; area = a
        case _ => phi = math.acos(-r); val (t, a) = equatFaceTheta(phi, s, q);  theta = t; area = a
      }
    }
    var mu = math.atan((12.0 / math.Pi) *
      (theta + math.acos(math.sin(theta) * math.cos(M.FortPi)) - M.HalfPi))
    val t = math.sqrt((1.0 - math.cos(phi)) / (math.cos(mu) * math.cos(mu)) /
      (1.0 - math.cos(math.atan(1.0 / math.cos(theta)))))
    if (area == 1) mu += M.HalfPi
    else if (area == 2) mu += math.Pi
    else if (area == 3) mu += math.Pi + M.HalfPi
    (t * math.cos(mu), t * math.sin(mu))
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val nu = math.atan(math.sqrt(x * x + y * y))
    var mu = math.atan2(y, x)
    var area = 0
    if (x >= 0.0 && x >= math.abs(y)) area = 0
    else if (y >= 0.0 && y >= math.abs(x)) { area = 1; mu -= M.HalfPi }
    else if (x < 0.0 && -x >= math.abs(y)) {
      area = 2; mu = if (mu < 0) mu + math.Pi else mu - math.Pi
    } else { area = 3; mu += M.HalfPi }
    val tt = (math.Pi / 12.0) * math.tan(mu)
    val tantheta = math.sin(tt) / (math.cos(tt) - 1.0 / math.sqrt(2.0))
    val theta = math.atan(tantheta)
    val cosmu = math.cos(mu)
    val tannu = math.tan(nu)
    var cosphi = 1.0 - cosmu * cosmu * tannu * tannu *
      (1.0 - math.cos(math.atan(1.0 / math.cos(theta))))
    if (cosphi < -1.0) cosphi = -1.0 else if (cosphi > 1.0) cosphi = 1.0

    var lam = 0.0; var phiOut = 0.0
    if (face == 4) {
      val phi = math.acos(cosphi)
      phiOut = M.HalfPi - phi
      lam = area match {
        case 0 => theta + M.HalfPi
        case 1 => if (theta < 0) theta + math.Pi else theta - math.Pi
        case 2 => theta - M.HalfPi
        case _ => theta
      }
    } else if (face == 5) {
      val phi = math.acos(cosphi)
      phiOut = phi - M.HalfPi
      lam = area match {
        case 0 => -theta + M.HalfPi
        case 1 => -theta
        case 2 => -theta - M.HalfPi
        case _ => if (theta < 0) -theta - math.Pi else -theta + math.Pi
      }
    } else {
      var q = cosphi
      var t = q * q
      var s = if (t >= 1.0) 0.0 else math.sqrt(1.0 - t) * math.sin(theta)
      t += s * s
      var r = if (t >= 1.0) 0.0 else math.sqrt(1.0 - t)
      if (area == 1) { val tmp = r; r = -s; s = tmp }
      else if (area == 2) { r = -r; s = -s }
      else if (area == 3) { val tmp = r; r = s; s = -tmp }
      if (face == 1) { val tmp = q; q = -r; r = tmp }
      else if (face == 2) { q = -q; r = -r }
      else if (face == 3) { val tmp = q; q = r; r = -tmp }
      phiOut = math.acos(-s) - M.HalfPi
      lam = math.atan2(r, q)
      if (face == 1) lam = shiftLon(lam, -M.HalfPi)
      else if (face == 2) lam = shiftLon(lam, -math.Pi)
      else if (face == 3) lam = shiftLon(lam, M.HalfPi)
    }
    if (!ell.isSphere) {
      val invert = phiOut < 0
      val tanphi = math.tan(phiOut)
      val xa = ell.b / math.sqrt(tanphi * tanphi + oneMinusFSq)
      phiOut = math.atan(math.sqrt(ell.a * ell.a - xa * xa) / (oneMinusF * xa))
      if (invert) phiOut = -phiOut
    }
    (lam, phiOut)
  }
}