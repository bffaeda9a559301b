package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** The latlong family — a unit-tagged null projection: identity apart
  * from central-meridian handling (behavioral reference:
  * /root/reference/src/projections/latlong.cpp; I/O RADIANS both sides). */
final case class LatLongKernel(lam0: Double = 0.0) extends PointKernel {
  override def left = IOUnits.Radians
  override def right = IOUnits.Radians
  def fwd(v: Array[Double]): Boolean = {
    if (math.abs(v(1)) > M.HalfPi + M.EpsLat) return false
    v(0) = M.adjlon(M.adjlon(v(0)) - lam0)
    true
  }
  def inv(v: Array[Double]): Boolean = {
    v(0) = M.adjlon(v(0) + lam0)
    true
  }
}

/** Spherical pole-rotation math shared by the ob_tran variants
  * (Snyder 5-7..5-10b; reference: /root/reference/src/projections/
  * ob_tran.cpp:29-95). */
object PoleRotation {
  private def aasin(x: Double): Double =
    math.asin(math.max(-1.0, math.min(1.0, x)))

  /** rotate geographic (lam, phi) into the frame whose pole is at
    * (lamp, phip); `oblique` = |phip| > tol. */
  def fwd(lamIn: Double, phiIn: Double, lamp: Double,
          sphip: Double, cphip: Double, oblique: Boolean): (Double, Double) = {
    val coslam = math.cos(lamIn)
    val sinphi = math.sin(phiIn)
    val cosphi = math.cos(phiIn)
    if (oblique) {
      val lam = M.adjlon(math.atan2(cosphi * math.sin(lamIn),
        sphip * cosphi * coslam + cphip * sinphi) + lamp)
      val phi = aasin(sphip * sinphi - cphip * cosphi * coslam)
      (lam, phi)
    } else {
      val lam = M.adjlon(math.atan2(cosphi * math.sin(lamIn), sinphi) + lamp)
      val phi = aasin(-cosphi * coslam)
      (lam, phi)
    }
  }

  def inv(lamIn: Double, phiIn: Double, lamp: Double,
          sphip: Double, cphip: Double, oblique: Boolean): (Double, Double) = {
    if (oblique) {
      val lam = lamIn - lamp
      val coslam = math.cos(lam)
      val sinphi = math.sin(phiIn)
      val cosphi = math.cos(phiIn)
      val phi = aasin(sphip * sinphi + cphip * cosphi * coslam)
      val lamOut = math.atan2(cosphi * math.sin(lam),
        sphip * cosphi * coslam - cphip * sinphi)
      (lamOut, phi)
    } else {
      val cosphi = math.cos(phiIn)
      val t = lamIn - lamp
      val lamOut = math.atan2(cosphi * math.sin(t), -math.sin(phiIn))
      val phi = aasin(cosphi * math.cos(t))
      (lamOut, phi)
    }
  }

  /** new-pole longitude/latitude from the three reference setups. */
  def poleOf(p: graft.geo.proj.ProjString.Params): (Double, Double) = {
    val Tol = 1e-10
    if (p.has("o_alpha")) {
      val lamc = p.angle("o_lon_c").getOrElse(0.0)
      val phic = p.angle("o_lat_c").getOrElse(0.0)
      val alpha = p.angle("o_alpha").get
      require(math.abs(math.abs(phic) - M.HalfPi) > Tol, "ob_tran |o_lat_c| ~ 90")
      val lamp = lamc + math.atan2(-math.cos(alpha), -math.sin(alpha) * math.sin(phic))
      (lamp, aasin(math.cos(phic) * math.sin(alpha)))
    } else if (p.has("o_lat_p")) {
      (p.angle("o_lon_p").getOrElse(0.0), p.angle("o_lat_p").get)
    } else {
      val lam1 = p.angle("o_lon_1").getOrElse(0.0)
      val phi1 = p.angle("o_lat_1").getOrElse(0.0)
      val lam2 = p.angle("o_lon_2").getOrElse(0.0)
      val phi2 = p.angle("o_lat_2").getOrElse(0.0)
      require(math.abs(phi1) <= M.HalfPi - Tol, "ob_tran |o_lat_1| >= 90")
      require(math.abs(phi2) <= M.HalfPi - Tol, "ob_tran |o_lat_2| >= 90")
      require(math.abs(phi1 - phi2) >= Tol, "ob_tran o_lat_1 == o_lat_2")
      require(math.abs(phi1) >= Tol, "ob_tran o_lat_1 == 0")
      val lamp = math.atan2(
        math.cos(phi1) * math.sin(phi2) * math.cos(lam1) -
          math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
        math.sin(phi1) * math.cos(phi2) * math.sin(lam2) -
          math.cos(phi1) * math.sin(phi2) * math.sin(lam1))
      (lamp, math.atan(-math.cos(lamp - lam1) / math.tan(phi1)))
    }
  }
}

/** ob_tran with o_proj=latlon/longlat: a pure rotated-graticule operation,
  * angular in and out. */
final case class ObTranLatlonKernel(lamp: Double, phip: Double,
                                    lam0: Double) extends PointKernel {
  override def left = IOUnits.Radians
  // raw radians out, unscaled and never degree-converted (the reference
  // sets right = WHATEVER when the rotated target is latlong)
  override def right = IOUnits.Whatever
  private val oblique = math.abs(phip) > 1e-10
  private val sphip = if (oblique) math.sin(phip) else 0.0
  private val cphip = if (oblique) math.cos(phip) else 0.0

  def fwd(v: Array[Double]): Boolean = {
    if (math.abs(v(1)) > M.HalfPi + M.EpsLat) return false
    val lam = M.adjlon(M.adjlon(v(0)) - lam0)
    val (l, p) = PoleRotation.fwd(lam, v(1), lamp, sphip, cphip, oblique)
    v(0) = l; v(1) = p
    true
  }
  def inv(v: Array[Double]): Boolean = {
    val (l, p) = PoleRotation.inv(v(0), v(1), lamp, sphip, cphip, oblique)
    v(0) = M.adjlon(l + lam0); v(1) = p
    true
  }
}

/** ob_tran wrapping a non-projection target operation (e.g. helmert):
  * the reference dispatches to the target's 2D interface when it defines
  * one (/root/reference/src/projections/ob_tran.cpp:287-291); a target
  * without a 2D interface — a helmert lacking +theta sets only the
  * 3D/4D hooks (/root/reference/src/transformations/helmert.cpp:566-571)
  * — still instantiates, but applying it fails with no_forward /
  * no_inverse, mirrored here by returning false. */
final case class ObTranOpKernel(inner: PointKernel, has2d: Boolean,
                                lamp: Double, phip: Double, lam0: Double)
    extends PointKernel {
  override def left = IOUnits.Radians
  override def right = IOUnits.Whatever
  private val oblique = math.abs(phip) > 1e-10
  private val sphip = if (oblique) math.sin(phip) else 0.0
  private val cphip = if (oblique) math.cos(phip) else 0.0

  def fwd(v: Array[Double]): Boolean = {
    if (!has2d) return false
    if (math.abs(v(1)) > M.HalfPi + M.EpsLat) return false
    val lam = M.adjlon(M.adjlon(v(0)) - lam0)
    val (l, p) = PoleRotation.fwd(lam, v(1), lamp, sphip, cphip, oblique)
    v(0) = l; v(1) = p
    inner.fwd(v)
  }
  def inv(v: Array[Double]): Boolean = {
    if (!has2d) return false
    if (!inner.inv(v)) return false
    val (l, p) = PoleRotation.inv(v(0), v(1), lamp, sphip, cphip, oblique)
    v(0) = M.adjlon(l + lam0); v(1) = p
    true
  }
}

/** ob_tran wrapping a real projection: the rotation feeds the TARGET
  * kernel's raw per-point math (the reference calls link->fwd directly,
  * bypassing the inner prepare/finalize — outer lam0/x0/scaling apply). */
final case class ObTranProjKernel(inner: ProjectionKernel,
                                  lamp: Double, phip: Double,
                                  override val lam0: Double,
                                  override val x0: Double,
                                  override val y0: Double)
    extends ProjectionKernel(inner.ell, lam0, x0, y0) {
  private val oblique = math.abs(phip) > 1e-10
  private val sphip = if (oblique) math.sin(phip) else 0.0
  private val cphip = if (oblique) math.cos(phip) else 0.0

  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val (l, p) = PoleRotation.fwd(lam, phi, lamp, sphip, cphip, oblique)
    inner.rawProject(l, p)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val (l, p) = inner.rawUnproject(x, y)
    if (l.isNaN) return err
    PoleRotation.inv(l, p, lamp, sphip, cphip, oblique)
  }
}