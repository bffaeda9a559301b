package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** HEALPix — the equal-area hierarchical sphere pixelization's map
  * projection (equatorial Lambert belt + four polar triangles), with the
  * +rot_xy plane rotation; ellipsoids handled on the authalic sphere with
  * the semimajor replaced by the authalic radius (behavioral reference:
  * /root/reference/src/projections/healpix.cpp; rHEALPix square
  * reassembly out of scope). */
final class HealpixKernel private (baseEll: Ellipsoid, origEll: Ellipsoid,
                                   rotXy: Double, lam0v: Double,
                                   x00: Double, y00: Double)
    extends ProjectionKernel(baseEll, lam0v, x00, y00) {
  private val Eps = 1e-15
  private val phiXi = M.coeffsPhiToXi(origEll.n)
  private val xiPhi = M.coeffsXiToPhi(origEll.n)
  private val isEll = !origEll.isSphere
  private val sinRot = math.sin(-rotXy)
  private val cosRot = math.cos(-rotXy)

  private def sign(x: Double): Double = if (x < 0) -1.0 else 1.0

  private def sphereFwd(lam: Double, phi: Double): (Double, Double) = {
    val phi0 = math.asin(2.0 / 3.0)
    if (math.abs(phi) <= phi0)
      (lam, 3 * math.Pi / 8 * math.sin(phi))
    else {
      val sigma = math.sqrt(3 * (1 - math.abs(math.sin(phi))))
      var cn = math.floor(2 * lam / math.Pi + 2)
      if (cn >= 4) cn = 3
      val lamc = -3 * M.FortPi + M.HalfPi * cn
      (lamc + (lam - lamc) * sigma, sign(phi) * M.FortPi * (2 - sigma))
    }
  }

  private def sphereInv(x: Double, y: Double): (Double, Double) = {
    val y0 = M.FortPi
    if (math.abs(y) <= y0)
      (x, math.asin(8 * y / (3 * math.Pi)))
    else if (math.abs(y) < M.HalfPi) {
      var cn = math.floor(2 * x / math.Pi + 2)
      if (cn >= 4) cn = 3
      val xc = -3 * M.FortPi + M.HalfPi * cn
      val tau = 2.0 - 4 * math.abs(y) / math.Pi
      (xc + (x - xc) / tau, sign(y) * math.asin(1.0 - tau * tau / 3.0))
    } else (-math.Pi, sign(y) * M.HalfPi)
  }

  /** the HEALPix butterfly outline (jittered verts, even-odd test) */
  private val outline: Array[Double] = Array(
    -math.Pi - Eps, M.FortPi, -3 * M.FortPi, M.HalfPi + Eps,
    -M.HalfPi, M.FortPi + Eps, -M.FortPi, M.HalfPi + Eps,
    0.0, M.FortPi + Eps, M.FortPi, M.HalfPi + Eps,
    M.HalfPi, M.FortPi + Eps, 3 * M.FortPi, M.HalfPi + Eps,
    math.Pi + Eps, M.FortPi, math.Pi + Eps, -M.FortPi,
    3 * M.FortPi, -M.HalfPi - Eps, M.HalfPi, -M.FortPi - Eps,
    M.FortPi, -M.HalfPi - Eps, 0.0, -M.FortPi - Eps,
    -M.FortPi, -M.HalfPi - Eps, -M.HalfPi, -M.FortPi - Eps,
    -3 * M.FortPi, -M.HalfPi - Eps, -math.Pi - Eps, -M.FortPi)

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val phi = if (isEll) M.auxConvert(phiIn, phiXi) else phiIn
    val (x, y) = sphereFwd(lam, phi)
    (x * cosRot - y * sinRot, y * cosRot + x * sinRot)
  }

  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    // undo the plane rotation (rotate by +rot_xy)
    val x = xIn * cosRot + yIn * sinRot
    val y = yIn * cosRot - xIn * sinRot
    if (!graft.geo.expr.PointInPolygonExpr.contains(x, y, outline)) return err
    val (lam, phi0) = sphereInv(x, y)
    val phi = if (isEll) M.auxConvert(phi0, xiPhi) else phi0
    (lam, phi)
  }
}

object HealpixKernel {
  def apply(ell: Ellipsoid, rotXyDeg: Double = 0.0, lam0: Double = 0.0,
            x0: Double = 0.0, y0: Double = 0.0): HealpixKernel = {
    // ellipsoids project via the authalic sphere whose radius replaces a
    val aAuth =
      if (ell.isSphere) ell.a
      else ell.a * math.sqrt(0.5 * M.authalicQ(1.0, ell.e, ell.oneEs))
    new HealpixKernel(Ellipsoid(aAuth, 0.0), ell,
      math.toRadians(rotXyDeg), lam0, x0, y0)
  }
}