package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Geostationary Satellite View (GOES/Meteosat scan geometry), sphere +
  * ellipsoid, x- and y-sweep variants (behavioral reference:
  * /root/reference/src/projections/geos.cpp). `heightNorm` = h / a. */
final case class GeosKernel(override val ell: Ellipsoid,
                            heightNorm: Double,
                            flipAxis: Boolean = false,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  require(heightNorm > 0 && heightNorm <= 1e10, "geos invalid h")
  private val radiusG1 = heightNorm
  private val radiusG = 1.0 + radiusG1
  private val cC = radiusG * radiusG - 1.0
  private val radiusP = if (ell.isSphere) 1.0 else math.sqrt(ell.oneEs)
  private val radiusP2 = if (ell.isSphere) 1.0 else ell.oneEs
  private val radiusPInv2 = if (ell.isSphere) 1.0 else ell.rOneEs

  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    if (ell.isSphere) {
      val tmp0 = math.cos(phiIn)
      val vx = math.cos(lam) * tmp0
      val vy = math.sin(lam) * tmp0
      val vz = math.sin(phiIn)
      val tmp = radiusG - vx
      if (flipAxis)
        (radiusG1 * math.atan(vy / math.hypot(vz, tmp)),
          radiusG1 * math.atan(vz / tmp))
      else
        (radiusG1 * math.atan(vy / tmp),
          radiusG1 * math.atan(vz / math.hypot(vy, tmp)))
    } else {
      val phi = math.atan(radiusP2 * math.tan(phiIn))
      val r = radiusP / math.hypot(radiusP * math.cos(phi), math.sin(phi))
      val vx = r * math.cos(lam) * math.cos(phi)
      val vy = r * math.sin(lam) * math.cos(phi)
      val vz = r * math.sin(phi)
      if (((radiusG - vx) * vx - vy * vy - vz * vz * radiusPInv2) < 0)
        return err
      val tmp = radiusG - vx
      if (flipAxis)
        (radiusG1 * math.atan(vy / math.hypot(vz, tmp)),
          radiusG1 * math.atan(vz / tmp))
      else
        (radiusG1 * math.atan(vy / tmp),
          radiusG1 * math.atan(vz / math.hypot(vy, tmp)))
    }
  }

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var vx = -1.0
    var vy = 0.0; var vz = 0.0
    if (flipAxis) {
      vz = math.tan(y / radiusG1)
      vy = math.tan(x / radiusG1) * math.hypot(1.0, vz)
    } else {
      vy = math.tan(x / radiusG1)
      vz = math.tan(y / radiusG1) * math.hypot(1.0, vy)
    }
    val a =
      if (ell.isSphere) vy * vy + vz * vz + vx * vx
      else { val t = vz / radiusP; vy * vy + t * t + vx * vx }
    val b = 2 * radiusG * vx
    val det = b * b - 4 * a * cC
    if (det < 0) return err
    val k = (-b - math.sqrt(det)) / (2 * a)
    vx = radiusG + k * vx
    vy *= k
    vz *= k
    val lam = math.atan2(vy, vx)
    val phi =
      if (ell.isSphere) math.atan(vz / math.hypot(vx, vy))
      else math.atan(radiusPInv2 * vz / math.hypot(vx, vy))
    (lam, phi)
  }
}