package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Robinson (tabulated cubic splines at 5-degree nodes; coefficients kept
  * at float precision like the reference tables,
  * /root/reference/src/projections/robin.cpp). */
final case class RobinKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  import RobinKernel._
  private val FXC = 0.8487; private val FYC = 1.3523
  private val C1 = 11.45915590261646417544
  private val RC1 = 0.08726646259971647884
  private val Nodes = 18

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var dphi = math.abs(phi)
    var i = math.floor(dphi * C1 + 1e-15).toLong
    if (i < 0) return err
    if (i >= Nodes) i = Nodes
    dphi = math.toDegrees(dphi - RC1 * i)
    val ii = i.toInt
    val y0v = v(Y(ii), dphi) * FYC
    (v(X(ii), dphi) * FXC * lam, if (phi < 0) -y0v else y0v)
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var lam = x / FXC
    var phi = math.abs(y / FYC)
    if (phi >= 1.0) {
      if (phi > 1.000001) return err
      phi = if (y < 0) -M.HalfPi else M.HalfPi
      lam /= X(Nodes)(0)
      (lam, phi)
    } else {
      var i = math.floor(phi * Nodes).toInt
      if (i < 0 || i >= Nodes) return err
      var break0 = false
      while (!break0) {
        if (Y(i)(0) > phi) i -= 1
        else if (Y(i + 1)(0) <= phi) i += 1
        else break0 = true
      }
      val T = Y(i)
      var t = 5.0 * (phi - T(0)) / (Y(i + 1)(0) - T(0))
      var iters = 100
      var converged = false
      while (iters > 0 && !converged) {
        val t1 = (v(T, t) - phi) / dv(T, t)
        t -= t1
        if (math.abs(t1) < 1e-10) converged = true
        iters -= 1
      }
      if (!converged) return err
      phi = math.toRadians(5 * i + t)
      if (y < 0) phi = -phi
      lam /= v(X(i), t)
      if (math.abs(lam) > math.Pi) err else (lam, phi)
    }
  }
}
object RobinKernel {
  private def v(c: Array[Double], z: Double): Double =
    c(0) + z * (c(1) + z * (c(2) + z * c(3)))
  private def dv(c: Array[Double], z: Double): Double =
    c(1) + 2 * z * c(2) + z * z * 3.0 * c(3)
  // 5-degree-interval spline nodes (float precision, like the reference)
  private val X: Array[Array[Double]] = Array(
    Array(1.0f, 2.2199e-17f, -7.15515e-05f, 3.1103e-06f),
    Array(0.9986f, -0.000482243f, -2.4897e-05f, -1.3309e-06f),
    Array(0.9954f, -0.00083103f, -4.48605e-05f, -9.86701e-07f),
    Array(0.99f, -0.00135364f, -5.9661e-05f, 3.6777e-06f),
    Array(0.9822f, -0.00167442f, -4.49547e-06f, -5.72411e-06f),
    Array(0.973f, -0.00214868f, -9.03571e-05f, 1.8736e-08f),
    Array(0.96f, -0.00305085f, -9.00761e-05f, 1.64917e-06f),
    Array(0.9427f, -0.00382792f, -6.53386e-05f, -2.6154e-06f),
    Array(0.9216f, -0.00467746f, -0.00010457f, 4.81243e-06f),
    Array(0.8962f, -0.00536223f, -3.23831e-05f, -5.43432e-06f),
    Array(0.8679f, -0.00609363f, -0.000113898f, 3.32484e-06f),
    Array(0.835f, -0.00698325f, -6.40253e-05f, 9.34959e-07f),
    Array(0.7986f, -0.00755338f, -5.00009e-05f, 9.35324e-07f),
    Array(0.7597f, -0.00798324f, -3.5971e-05f, -2.27626e-06f),
    Array(0.7186f, -0.00851367f, -7.01149e-05f, -8.6303e-06f),
    Array(0.6732f, -0.00986209f, -0.000199569f, 1.91974e-05f),
    Array(0.6213f, -0.010418f, 8.83923e-05f, 6.24051e-06f),
    Array(0.5722f, -0.00906601f, 0.000182f, 6.24051e-06f),
    Array(0.5322f, -0.00677797f, 0.000275608f, 6.24051e-06f)
  ).map(_.map(f => f: Double))
  private val Y: Array[Array[Double]] = Array(
    Array(-5.20417e-18f, 0.0124f, 1.21431e-18f, -8.45284e-11f),
    Array(0.062f, 0.0124f, -1.26793e-09f, 4.22642e-10f),
    Array(0.124f, 0.0124f, 5.07171e-09f, -1.60604e-09f),
    Array(0.186f, 0.0123999f, -1.90189e-08f, 6.00152e-09f),
    Array(0.248f, 0.0124002f, 7.10039e-08f, -2.24e-08f),
    Array(0.31f, 0.0123992f, -2.64997e-07f, 8.35986e-08f),
    Array(0.372f, 0.0124029f, 9.88983e-07f, -3.11994e-07f),
    Array(0.434f, 0.0123893f, -3.69093e-06f, -4.35621e-07f),
    Array(0.4958f, 0.0123198f, -1.02252e-05f, -3.45523e-07f),
    Array(0.5571f, 0.0121916f, -1.54081e-05f, -5.82288e-07f),
    Array(0.6176f, 0.0119938f, -2.41424e-05f, -5.25327e-07f),
    Array(0.6769f, 0.011713f, -3.20223e-05f, -5.16405e-07f),
    Array(0.7346f, 0.0113541f, -3.97684e-05f, -6.09052e-07f),
    Array(0.7903f, 0.0109107f, -4.89042e-05f, -1.04739e-06f),
    Array(0.8435f, 0.0103431f, -6.4615e-05f, -1.40374e-09f),
    Array(0.8936f, 0.00969686f, -6.4636e-05f, -8.547e-06f),
    Array(0.9394f, 0.00840947f, -0.000192841f, -4.2106e-06f),
    Array(0.9761f, 0.00616527f, -0.000256f, -4.2106e-06f),
    Array(1.0f, 0.00328947f, -0.000319159f, -4.2106e-06f)
  ).map(_.map(f => f: Double))
}

/** Times (Moir 1965; Snyder, Flattening the Earth p.213). */
final case class TimesKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val t = math.tan(phi / 2.0)
    val s = math.sin(M.FortPi * t)
    (lam * (0.74482 - 0.34588 * s * s), 1.70711 * t)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val t = y / 1.70711
    val s = math.sin(M.FortPi * t)
    (x / (0.74482 - 0.34588 * s * s), 2 * math.atan(t))
  }
}

/** Hatano asymmetrical equal-area. */
final case class HatanoKernel(override val ell: Ellipsoid,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val CN = 2.67595; private val CS = 2.43763
  private val RCN = 0.37369906014686373063
  private val RCS = 0.41023453108141924738
  private val FYCN = 1.75859; private val FYCS = 1.93052
  private val RYCN = 0.56863737426006061674
  private val RYCS = 0.51799515156538134803
  private val FXC = 0.85; private val RXC = 1.17647058823529411764
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    var phi = phiIn
    val c = math.sin(phi) * (if (phi < 0) CS else CN)
    var i = 20
    var converged = false
    while (i > 0 && !converged) {
      val th1 = (phi + math.sin(phi) - c) / (1.0 + math.cos(phi))
      phi -= th1
      if (math.abs(th1) < 1e-7) converged = true
      i -= 1
    }
    phi *= 0.5
    (FXC * lam * math.cos(phi),
      math.sin(phi) * (if (phi < 0) FYCS else FYCN))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var th = y * (if (y < 0) RYCS else RYCN)
    if (math.abs(th) > 1.0) {
      if (math.abs(th) > 1.000001) return err
      th = if (th > 0) M.HalfPi else -M.HalfPi
    } else th = math.asin(th)
    val lam = RXC * x / math.cos(th)
    th += th
    var phi = (th + math.sin(th)) * (if (y < 0) RCS else RCN)
    if (math.abs(phi) > 1.0) {
      if (math.abs(phi) > 1.000001) return err
      phi = if (phi > 0) M.HalfPi else -M.HalfPi
    } else phi = math.asin(phi)
    (lam, phi)
  }
}

/** Oblated equal-area (lat_0, n=, m=, theta=). */
final case class OeaKernel(override val ell: Ellipsoid,
                           n: Double, m: Double, theta: Double,
                           lat0: Double = 0.0,
                           override val lam0: Double = 0.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val sp0 = math.sin(lat0); private val cp0 = math.cos(lat0)
  private val rn = 1.0 / n; private val rm = 1.0 / m
  private val twoRn = 2.0 * rn; private val twoRm = 2.0 * rm
  private val hm = 0.5 * m; private val hn = 0.5 * n
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  private def aacos(x: Double) = math.acos(math.max(-1.0, math.min(1.0, x)))
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val cp = math.cos(phi); val sp = math.sin(phi); val cl = math.cos(lam)
    val az = math.atan2(cp * math.sin(lam), cp0 * sp - sp0 * cp * cl) + theta
    val shz = math.sin(0.5 * aacos(sp0 * sp + cp0 * cp * cl))
    val mm = aasin(shz * math.sin(az))
    val nn = aasin(shz * math.cos(az) * math.cos(mm) / math.cos(mm * twoRm))
    (m * math.sin(mm * twoRm) * math.cos(nn) / math.cos(nn * twoRn),
      n * math.sin(nn * twoRn))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val nn = hn * aasin(y * rn)
    val mm = hm * aasin(x * rm * math.cos(nn * twoRn) / math.cos(nn))
    val xp = 2.0 * math.sin(mm)
    val yp = 2.0 * math.sin(nn) * math.cos(mm * twoRm) / math.cos(mm)
    val az = math.atan2(xp, yp) - theta
    val cAz = math.cos(az)
    val z = 2.0 * aasin(0.5 * math.hypot(xp, yp))
    val sz = math.sin(z); val cz = math.cos(z)
    (math.atan2(sz * math.sin(az), cp0 * cz - sp0 * sz * cAz),
      aasin(sp0 * cz + cp0 * sz * cAz))
  }
}

/** van der Grinten II / III (forward only). */
final case class Vandg2Kernel(override val ell: Ellipsoid, vdg3: Boolean,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Tol = 1e-10
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val bt = math.abs(M.TwoOverPi * phi)
    var ct = 1.0 - bt * bt
    ct = if (ct < 0) 0.0 else math.sqrt(ct)
    if (math.abs(lam) < Tol) {
      (0.0, math.Pi * (if (phi < 0) -bt else bt) / (1.0 + ct))
    } else {
      val at = 0.5 * math.abs(math.Pi / lam - lam / math.Pi)
      var x = 0.0; var y = 0.0
      if (vdg3) {
        val x1 = bt / (1.0 + ct)
        x = math.Pi * (math.sqrt(at * at + 1.0 - x1 * x1) - at)
        y = math.Pi * x1
      } else {
        val x1 = (ct * math.sqrt(1.0 + at * at) - at * ct * ct) /
          (1.0 + at * at * bt * bt)
        x = math.Pi * x1
        y = math.Pi * math.sqrt(1.0 - x1 * (x1 + 2.0 * at) + Tol)
      }
      (if (lam < 0) -x else x, if (phi < 0) -y else y)
    }
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** van der Grinten IV (forward only). */
final case class Vandg4Kernel(override val ell: Ellipsoid,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Tol = 1e-10
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    if (math.abs(phi) < Tol) (lam, 0.0)
    else if (math.abs(lam) < Tol || math.abs(math.abs(phi) - M.HalfPi) < Tol)
      (0.0, phi)
    else {
      val bt = math.abs(M.TwoOverPi * phi)
      val bt2 = bt * bt
      val ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) / (bt2 * (bt - 1.0))
      val ct2 = ct * ct
      var dt = M.TwoOverPi * lam
      dt = dt + 1.0 / dt
      dt = math.sqrt(dt * dt - 4.0)
      if (math.abs(lam) - M.HalfPi < 0) dt = -dt
      val dt2 = dt * dt
      var x1 = bt + ct; x1 *= x1
      val t = bt + 3.0 * ct
      val ft = x1 * (bt2 + ct2 * dt2 - 1.0) +
        (1.0 - bt2) * (bt2 * (t * t + 4.0 * ct2) +
          ct2 * (12.0 * bt * ct + 4.0 * ct2))
      x1 = (dt * (x1 + ct2 - 1.0) + 2.0 * math.sqrt(ft)) / (4.0 * x1 + dt2)
      val x = M.HalfPi * x1
      val y = M.HalfPi * math.sqrt(1.0 + dt * math.abs(x1) - x1 * x1)
      (if (lam < 0) -x else x, if (phi < 0) -y else y)
    }
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Bacon globular / Apian globular I / Ortelius oval (forward only). */
final case class BaconKernel(override val ell: Ellipsoid,
                             bacn: Boolean, ortl: Boolean,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val HlfPi2 = 2.46740110027233965467
  private val Eps = 1e-10
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val y = if (bacn) M.HalfPi * math.sin(phi) else phi
    val ax = math.abs(lam)
    var x = 0.0
    if (ax >= Eps) {
      if (ortl && ax >= M.HalfPi)
        x = math.sqrt(HlfPi2 - phi * phi + Eps) + ax - M.HalfPi
      else {
        val f = 0.5 * (HlfPi2 / ax + ax)
        x = ax - f + math.sqrt(f * f - y * y)
      }
      if (lam < 0) x = -x
    }
    (x, y)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Rectangular polyconic (lat_ts; forward only). */
final case class RpolyKernel(override val ell: Ellipsoid,
                             latTs: Double = 0.0, lat0: Double = 0.0,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-9
  private val phi1 = math.abs(latTs)
  private val mode = phi1 > Eps
  private val fxb = if (mode) 0.5 * math.sin(phi1) else 0.0
  private val fxa = if (mode) 0.5 / fxb else 0.0
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var fa = if (mode) math.tan(lam * fxb) * fxa else 0.5 * lam
    if (math.abs(phi) < Eps) (fa + fa, -lat0)
    else {
      val y = 1.0 / math.tan(phi)
      fa = 2.0 * math.atan(fa * math.sin(phi))
      (math.sin(fa) * y, phi - lat0 + (1.0 - math.cos(fa)) * y)
    }
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}
