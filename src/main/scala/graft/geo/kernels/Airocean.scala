package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Fuller's Dymaxion Airocean world map: gnomonic-style projection onto a
  * 23-face (icosahedron + split subfaces) net, unfolded via per-face
  * affine transition matrices (behavioral reference:
  * /root/reference/src/projections/airocean.cpp; geometry after
  * R. W. Gray 1995).  Sphere + ellipsoid (geodetic<->geocentric shift). */
final case class AiroceanKernel(override val ell: Ellipsoid,
                                horizontal: Boolean,
                                override val lam0: Double = 0.0,
                                override val x0: Double = 0.0,
                                override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  import AiroceanData._

  // orient=horizontal premultiplies the net by a rotation + shift
  private val H: Array[Double] = Array(
    0.0, -1.0, 0.0, 5.78304223331047,
    1.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 1.0, 0.0,
    0.0, 0.0, 0.0, 1.0)
  private val Hinv: Array[Double] = Array(
    0.0, 1.0, 0.0, 0.0,
    -1.0, -0.0, -0.0, 5.78304223331047,
    0.0, 0.0, 1.0, 0.0,
    0.0, 0.0, 0.0, 1.0)

  private def matMult(m1: Array[Double], m2: Array[Double]): Array[Double] = {
    val r = new Array[Double](16)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        r(i * 4 + j) = m1(i * 4) * m2(j) + m1(i * 4 + 1) * m2(4 + j) +
          m1(i * 4 + 2) * m2(8 + j) + m1(i * 4 + 3) * m2(12 + j)
        j += 1
      }
      i += 1
    }
    r
  }
  private def vecMult(m: Array[Double], x: Double, y: Double, z: Double): (Double, Double, Double) =
    (m(0) * x + m(1) * y + m(2) * z + m(3),
      m(4) * x + m(5) * y + m(6) * z + m(7),
      m(8) * x + m(9) * y + m(10) * z + m(11))

  private val (fwdTrans, invTrans, airFaces) =
    if (!horizontal) {
      (Array.tabulate(23)(i => FwdTrans.slice(i * 16, i * 16 + 16)),
        Array.tabulate(23)(i => InvTrans.slice(i * 16, i * 16 + 16)),
        AirFaces.clone())
    } else {
      val fw = Array.tabulate(23)(i =>
        matMult(H, FwdTrans.slice(i * 16, i * 16 + 16)))
      val iv = Array.tabulate(23)(i =>
        matMult(InvTrans.slice(i * 16, i * 16 + 16), Hinv))
      val af = new Array[Double](23 * 9)
      var i = 0
      while (i < 23 * 3) {
        val (x, y, z) = vecMult(H, AirFaces(i * 3), AirFaces(i * 3 + 1),
          AirFaces(i * 3 + 2))
        af(i * 3) = x; af(i * 3 + 1) = y; af(i * 3 + 2) = z
        i += 1
      }
      (fw, iv, af)
    }

  private def det(ux: Double, uy: Double, uz: Double,
                  vx: Double, vy: Double, vz: Double,
                  wx: Double, wy: Double, wz: Double): Double =
    ux * (vy * wz - vz * wy) - vx * (uy * wz - uz * wy) +
      wx * (uy * vz - uz * vy)

  /** index of face containing p in a 23-face vertex table, or -1 */
  private def faceIndex(tbl: Array[Double], px: Double, py: Double, pz: Double): Int = {
    var i = 0
    while (i < 23) {
      val o = i * 9
      val p1x = tbl(o); val p1y = tbl(o + 1); val p1z = tbl(o + 2)
      val p2x = tbl(o + 3); val p2y = tbl(o + 4); val p2z = tbl(o + 5)
      val p3x = tbl(o + 6); val p3y = tbl(o + 7); val p3z = tbl(o + 8)
      if (det(px, py, pz, p2x, p2y, p2z, p3x, p3y, p3z) <= 0 &&
          det(p1x, p1y, p1z, px, py, pz, p3x, p3y, p3z) <= 0 &&
          det(p1x, p1y, p1z, p2x, p2y, p2z, px, py, pz) <= 0) return i
      i += 1
    }
    -1
  }

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val lat =
      if (ell.es != 0.0) {
        val oneMinusF = ell.b / ell.a
        math.atan(oneMinusF * oneMinusF * math.tan(phiIn))
      } else phiIn
    val coslat = math.cos(lat)
    val px = coslat * math.cos(lam)
    val py = coslat * math.sin(lam)
    val pz = math.sin(lat)
    val f = faceIndex(IcoFaces, px, py, pz)
    if (f < 0) return err
    // central projection of p onto the face plane
    val cx = IcoCenters(f * 3); val cy = IcoCenters(f * 3 + 1)
    val cz = IcoCenters(f * 3 + 2)
    val nx = IcoNormals(f * 3); val ny = IcoNormals(f * 3 + 1)
    val nz = IcoNormals(f * 3 + 2)
    val a = 1.0 - (cx * nx + cy * ny + cz * nz) / (px * nx + py * ny + pz * nz)
    val ix = px - a * px; val iy = py - a * py; val iz = pz - a * pz
    val m = fwdTrans(f)
    (m(0) * ix + m(1) * iy + m(2) * iz + m(3),
      m(4) * ix + m(5) * iy + m(6) * iz + m(7))
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val f = faceIndex(airFaces, x, y, 1.0)
    if (f < 0) return err
    val m = invTrans(f)
    val sx = m(0) * x + m(1) * y + m(3)
    val sy = m(4) * x + m(5) * y + m(7)
    val sz = m(8) * x + m(9) * y + m(11)
    val norm = math.sqrt(sx * sx + sy * sy + sz * sz)
    val q = sx / norm; val r = sy / norm; val s = sz / norm
    var phi = math.acos(math.max(-1.0, math.min(1.0, -s))) - M.HalfPi
    val lam = math.atan2(r, q)
    if (ell.es != 0.0) {
      val invert = phi < 0
      val tanphi = math.tan(phi)
      val oneMinusF = ell.b / ell.a
      val xa = ell.b / math.sqrt(tanphi * tanphi + oneMinusF * oneMinusF)
      phi = math.atan(math.sqrt(ell.a * ell.a - xa * xa) / (oneMinusF * xa))
      if (invert) phi = -phi
    }
    (lam, phi)
  }
}
