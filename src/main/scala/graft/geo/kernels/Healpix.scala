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

/** rHEALPix — HEALPix with the four polar triangles reassembled into
  * north/south squares (behavioral reference: combine_caps,
  * /root/reference/src/projections/healpix.cpp:414-470). */
final class RHealpixKernel private (baseEll: Ellipsoid, origEll: Ellipsoid,
                                    northSquare: Int, southSquare: Int,
                                    lam0v: Double, x00: Double, y00: Double)
    extends ProjectionKernel(baseEll, lam0v, x00, y00) {
  require(northSquare >= 0 && northSquare <= 3, "north_square outside [0,3]")
  require(southSquare >= 0 && southSquare <= 3, "south_square outside [0,3]")
  private val Eps = 1e-15
  private val phiXi = M.coeffsPhiToXi(origEll.n)
  private val xiPhi = M.coeffsXiToPhi(origEll.n)
  private val isEll = !origEll.isSphere
  private val helper = HealpixKernel(Ellipsoid(1.0, 0.0))

  // rotation matrices: IDENT, R1(ccw 90), R2(180), R3(270), R3, R2, R1
  private val rots: Array[Array[Double]] = {
    val id = Array(1.0, 0.0, 0.0, 1.0)
    val r1 = Array(0.0, -1.0, 1.0, 0.0)
    val r2 = Array(-1.0, 0.0, 0.0, -1.0)
    val r3 = Array(0.0, 1.0, -1.0, 0.0)
    Array(id, r1, r2, r3, r3, r2, r1)
  }
  private def rotIndex(i: Int): Int = i match {
    case 0 => 0; case 1 => 1; case 2 => 2; case 3 => 3
    case -1 => 4; case -2 => 5; case -3 => 6; case _ => 0
  }

  /** (region: 0=eq 1=north 2=south, cn, capX, capY, adjX) */
  private def getCap(x0: Double, y0: Double, inverse: Boolean):
      (Int, Int, Double, Double, Double) = {
    var x = x0
    if (!inverse) {
      if (y0 > M.FortPi) {
        val c = M.HalfPi
        if (x < -M.HalfPi) (1, 0, -3 * M.FortPi, c, x)
        else if (x < 0) (1, 1, -M.FortPi, c, x)
        else if (x < M.HalfPi) (1, 2, M.FortPi, c, x)
        else (1, 3, 3 * M.FortPi, c, x)
      } else if (y0 < -M.FortPi) {
        val c = -M.HalfPi
        if (x < -M.HalfPi) (2, 0, -3 * M.FortPi, c, x)
        else if (x < 0) (2, 1, -M.FortPi, c, x)
        else if (x < M.HalfPi) (2, 2, M.FortPi, c, x)
        else (2, 3, 3 * M.FortPi, c, x)
      } else (0, 0, x0, y0, x)
    } else {
      if (y0 > M.FortPi) {
        val capX = -3 * M.FortPi + northSquare * M.HalfPi
        x = x0 - northSquare * M.HalfPi
        val y = y0
        val cn =
          if (y >= -x0 + northSquare * M.HalfPi - M.FortPi - Eps &&
              y < x0 - northSquare * M.HalfPi + 5 * M.FortPi - Eps)
            (northSquare + 1) % 4
          else if (y > -x0 + northSquare * M.HalfPi - M.FortPi + Eps &&
                   y >= x0 - northSquare * M.HalfPi + 5 * M.FortPi - Eps)
            (northSquare + 2) % 4
          else if (y <= -x0 + northSquare * M.HalfPi - M.FortPi + Eps &&
                   y > x0 - northSquare * M.HalfPi + 5 * M.FortPi + Eps)
            (northSquare + 3) % 4
          else northSquare
        (1, cn, capX, M.HalfPi, x)
      } else if (y0 < -M.FortPi) {
        val capX = -3 * M.FortPi + southSquare * M.HalfPi
        x = x0 - southSquare * M.HalfPi
        val y = y0
        val cn =
          if (y <= x0 - southSquare * M.HalfPi + M.FortPi + Eps &&
              y > -x0 + southSquare * M.HalfPi - 5 * M.FortPi + Eps)
            (southSquare + 1) % 4
          else if (y < x0 - southSquare * M.HalfPi + M.FortPi - Eps &&
                   y <= -x0 + southSquare * M.HalfPi - 5 * M.FortPi + Eps)
            (southSquare + 2) % 4
          else if (y >= x0 - southSquare * M.HalfPi + M.FortPi - Eps &&
                   y < -x0 + southSquare * M.HalfPi - 5 * M.FortPi - Eps)
            (southSquare + 3) % 4
          else southSquare
        (2, cn, capX, -M.HalfPi, x)
      } else (0, 0, x0, y0, x)
    }
  }

  /** NOTE: the reference's inverse get_cap compares against the RAW x
    * (before square translation) in its quadrant tests — the adjX slot
    * carries the translated x only for the vector_sub step. */
  private def combineCaps(x: Double, y: Double, inverse: Boolean): (Double, Double) = {
    val (region, cn, capX, capY, _) = getCap(x, y, inverse)
    if (region == 0) return (x, y)
    val pole = if (region == 1) northSquare else southSquare
    val rotM =
      if (!inverse) {
        if (region == 1) rots(rotIndex(cn - pole))
        else rots(rotIndex(-(cn - pole)))
      } else {
        if (region == 1) rots(rotIndex(-(cn - pole)))
        else rots(rotIndex(cn - pole))
      }
    val vx = x - capX
    val vy = y - capY
    val rx = rotM(0) * vx + rotM(1) * vy
    val ry = rotM(2) * vx + rotM(3) * vy
    val ax = -3 * M.FortPi + (if (!inverse) pole else cn) * M.HalfPi
    val ay = (if (region == 1) 1 else -1) * M.HalfPi
    (rx + ax, ry + ay)
  }

  /** rHEALPix image outline (jittered verts). */
  private val outline: Array[Double] = {
    val e = Eps
    Array(
      -math.Pi - e, M.FortPi + e,
      -math.Pi + northSquare * M.HalfPi - e, M.FortPi + e,
      -math.Pi + northSquare * M.HalfPi - e, 3 * M.FortPi + e,
      -math.Pi + (northSquare + 1.0) * M.HalfPi + e, 3 * M.FortPi + e,
      -math.Pi + (northSquare + 1.0) * M.HalfPi + e, M.FortPi + e,
      math.Pi + e, M.FortPi + e,
      math.Pi + e, -M.FortPi - e,
      -math.Pi + (southSquare + 1.0) * M.HalfPi + e, -M.FortPi - e,
      -math.Pi + (southSquare + 1.0) * M.HalfPi + e, -3 * M.FortPi - e,
      -math.Pi + southSquare * M.HalfPi - e, -3 * M.FortPi - e,
      -math.Pi + southSquare * M.HalfPi - e, -M.FortPi - e,
      -math.Pi - e, -M.FortPi - e)
  }

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val phi = if (isEll) M.auxConvert(phiIn, phiXi) else phiIn
    val (hx, hy) = helper.rawProject(lam, phi)
    combineCaps(hx, hy, inverse = false)
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    if (!graft.geo.expr.PointInPolygonExpr.contains(x, y, outline)) return err
    val (hx, hy) = combineCaps(x, y, inverse = true)
    val (lam, phi0) = helper.rawUnproject(hx, hy)
    if (lam.isNaN) return err
    val phi = if (isEll) M.auxConvert(phi0, xiPhi) else phi0
    (lam, phi)
  }
}

object RHealpixKernel {
  def apply(ell: Ellipsoid, northSquare: Int = 0, southSquare: Int = 0,
            lam0: Double = 0.0, x0: Double = 0.0, y0: Double = 0.0): RHealpixKernel = {
    val aAuth =
      if (ell.isSphere) ell.a
      else ell.a * math.sqrt(0.5 * M.authalicQ(1.0, ell.e, ell.oneEs))
    new RHealpixKernel(Ellipsoid(aAuth, 0.0), ell, northSquare, southSquare,
      lam0, x0, y0)
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