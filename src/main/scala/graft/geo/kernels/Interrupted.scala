package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Interrupted composites: Goode homolosine (igh / igh_o, sinusoidal belt
  * + Mollweide caps over 12 lobes) and interrupted Mollweide
  * (imoll / imoll_o, 6 lobes), plus the uninterrupted Goode homolosine.
  * Behavioral reference: /root/reference/src/projections/{goode,igh,igh_o,
  * imoll,imoll_o}.cpp.  All spherical (es forced to 0). */
object Interrupted {
  private[kernels] val MollCp = math.Pi + math.sin(math.Pi)
  private[kernels] val MollR =
    math.sqrt(M.TwoPi * 1.0 / MollCp) // sin(pi/2)=1
  private[kernels] val MollCx = 2.0 * MollR / math.Pi
  private[kernels] val MollCy = MollR

  /** spherical Mollweide forward in a=1 units; returns (NaN,NaN) on
    * non-convergence (reference never hits it for fixture inputs) */
  private[kernels] def mollFwd(lam: Double, phiIn: Double): (Double, Double) = {
    var phi = phiIn
    val k = MollCp * math.sin(phi)
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      val v = (phi + math.sin(phi) - k) / (1.0 + math.cos(phi))
      phi -= v
      if (math.abs(v) < 1e-7) converged = true
      i -= 1
    }
    phi = if (!converged) { if (phi < 0) -M.HalfPi else M.HalfPi } else phi * 0.5
    (MollCx * lam * math.cos(phi), MollCy * math.sin(phi))
  }

  private[kernels] def mollInv(x: Double, y: Double): (Double, Double) = {
    val t = y / MollCy
    if (math.abs(t) > 1.0) return (Double.NaN, Double.NaN)
    var phi = math.asin(t)
    val lam = x / (MollCx * math.cos(phi))
    if (math.abs(lam) < math.Pi) {
      phi += phi
      val s = (phi + math.sin(phi)) / MollCp
      if (math.abs(s) > 1.0 + 1e-10) return (Double.NaN, Double.NaN)
      (lam, math.asin(math.max(-1.0, math.min(1.0, s))))
    } else (Double.NaN, Double.NaN)
  }

  private[kernels] def sinuFwd(lam: Double, phi: Double): (Double, Double) =
    (lam * math.cos(phi), phi)

  private[kernels] def sinuInv(x: Double, y: Double): (Double, Double) = {
    val s = math.abs(y)
    if (s < M.HalfPi) (x / math.cos(y), y)
    else if (s - 1e-10 < M.HalfPi) (0.0, y)
    else (Double.NaN, Double.NaN)
  }

  /** one lobe: a raw sub-projection with its own lam0 / planar offset */
  private[kernels] final class Zone(val moll: Boolean, val lam0: Double,
                                    var zx0: Double, var zy0: Double) {
    def fwd(lam: Double, phi: Double): (Double, Double) = {
      val (x, y) = if (moll) mollFwd(lam - lam0, phi) else sinuFwd(lam - lam0, phi)
      (x + zx0, y + zy0)
    }
    def inv(x: Double, y: Double): (Double, Double) = {
      val (lam, phi) =
        if (moll) mollInv(x - zx0, y - zy0) else sinuInv(x - zx0, y - zy0)
      (lam + lam0, phi)
    }
  }

  private[kernels] def d(deg: Double): Double = math.toRadians(deg)
  /** sinusoidal->Mollweide transition: 40d44'11.8" */
  private[kernels] val PhiBoundary = math.toRadians(40 + 44 / 60.0 + 11.8 / 3600.0)
  private[kernels] val Epsln = 1e-10
}

/** Uninterrupted Goode homolosine. */
final case class GoodeKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  import Interrupted._
  private val YCor = 0.05280
  private val PhiLim = 0.71093078197902358062
  protected def project(lam: Double, phi: Double): (Double, Double) =
    if (math.abs(phi) <= PhiLim) sinuFwd(lam, phi)
    else {
      val (x, y) = mollFwd(lam, phi)
      (x, y - (if (phi >= 0) YCor else -YCor))
    }
  protected def unproject(x: Double, y: Double): (Double, Double) =
    if (math.abs(y) <= PhiLim) sinuInv(x, y)
    else mollInv(x, y + (if (y >= 0) YCor else -YCor))
}

/** Interrupted Goode homolosine, land (igh) and oceanic (igh_o) views. */
final case class IghKernel(override val ell: Ellipsoid, oceanic: Boolean,
                           override val lam0: Double = 0.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  import Interrupted._

  private val zones: Array[Zone] = {
    val z = new Array[Zone](12)
    // each zone's planar x-offset equals its central meridian (a=1 units)
    def zn(moll: Boolean, lonDeg: Double, zy0: Double = 0.0): Zone =
      new Zone(moll, d(lonDeg), d(lonDeg), zy0)
    val dy0 = sinuFwd(0.0, PhiBoundary)._2 - mollFwd(0.0, PhiBoundary)._2
    if (!oceanic) {
      z(2) = zn(false, -100); z(3) = zn(false, 30)
      z(4) = zn(false, -160); z(5) = zn(false, -60)
      z(6) = zn(false, 20);   z(7) = zn(false, 140)
      z(0) = zn(true, -100, dy0)
      z(1) = zn(true, 30, dy0)
      z(8) = zn(true, -160, -dy0); z(9) = zn(true, -60, -dy0)
      z(10) = zn(true, 20, -dy0);  z(11) = zn(true, 140, -dy0)
    } else {
      z(3) = zn(false, -140); z(4) = zn(false, -10)
      z(5) = zn(false, 130);  z(6) = zn(false, -110)
      z(7) = zn(false, 20);   z(8) = zn(false, 150)
      z(0) = zn(true, -140, dy0)
      z(1) = zn(true, -10, dy0); z(2) = zn(true, 130, dy0)
      z(9) = zn(true, -110, -dy0); z(10) = zn(true, 20, -dy0)
      z(11) = zn(true, 150, -dy0)
    }
    z
  }
  private val dy0 = zones(0).zy0

  private def zoneOfFwd(lam: Double, phi: Double): Int =
    if (!oceanic) {
      if (phi >= PhiBoundary) { if (lam <= -d(40)) 1 else 2 }
      else if (phi >= 0) { if (lam <= -d(40)) 3 else 4 }
      else if (phi >= -PhiBoundary) {
        if (lam <= -d(100)) 5 else if (lam <= -d(20)) 6
        else if (lam <= d(80)) 7 else 8
      } else {
        if (lam <= -d(100)) 9 else if (lam <= -d(20)) 10
        else if (lam <= d(80)) 11 else 12
      }
    } else {
      if (phi >= PhiBoundary) {
        if (lam <= -d(90)) 1 else if (lam >= d(60)) 3 else 2
      } else if (phi >= 0) {
        if (lam <= -d(90)) 4 else if (lam >= d(60)) 6 else 5
      } else if (phi >= -PhiBoundary) {
        if (lam <= -d(60)) 7 else if (lam >= d(90)) 9 else 8
      } else {
        if (lam <= -d(60)) 10 else if (lam >= d(90)) 12 else 11
      }
    }

  protected def project(lam: Double, phi: Double): (Double, Double) =
    zones(zoneOfFwd(lam, phi) - 1).fwd(lam, phi)

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val y90 = dy0 + math.sqrt(2.0)
    var z = 0
    if (y > y90 + Epsln || y < -y90 + Epsln) z = 0
    else if (!oceanic) {
      if (y >= PhiBoundary) z = if (x <= -d(40)) 1 else 2
      else if (y >= 0) z = if (x <= -d(40)) 3 else 4
      else if (y >= -PhiBoundary)
        z = if (x <= -d(100)) 5 else if (x <= -d(20)) 6
            else if (x <= d(80)) 7 else 8
      else
        z = if (x <= -d(100)) 9 else if (x <= -d(20)) 10
            else if (x <= d(80)) 11 else 12
    } else {
      if (y >= PhiBoundary)
        z = if (x <= -d(90)) 1 else if (x >= d(60)) 3 else 2
      else if (y >= 0)
        z = if (x <= -d(90)) 4 else if (x >= d(60)) 6 else 5
      else if (y >= -PhiBoundary)
        z = if (x <= -d(60)) 7 else if (x >= d(90)) 9 else 8
      else
        z = if (x <= -d(60)) 10 else if (x >= d(90)) 12 else 11
    }
    if (z == 0) return err
    val (lam, phi) = zones(z - 1).inv(x, y)
    val e = Epsln
    val ok: Boolean =
      if (!oceanic) z match {
        case 1 => (lam >= -d(180) - e && lam <= -d(40) + e) ||
          ((lam >= -d(40) - e && lam <= -d(10) + e) &&
            (phi >= d(60) - e && phi <= d(90) + e))
        case 2 => (lam >= -d(40) - e && lam <= d(180) + e) ||
          ((lam >= -d(180) - e && lam <= -d(160) + e) &&
            (phi >= d(50) - e && phi <= d(90) + e)) ||
          ((lam >= -d(50) - e && lam <= -d(40) + e) &&
            (phi >= d(60) - e && phi <= d(90) + e))
        case 3 => lam >= -d(180) - e && lam <= -d(40) + e
        case 4 => lam >= -d(40) - e && lam <= d(180) + e
        case 5 | 9 => lam >= -d(180) - e && lam <= -d(100) + e
        case 6 | 10 => lam >= -d(100) - e && lam <= -d(20) + e
        case 7 | 11 => lam >= -d(20) - e && lam <= d(80) + e
        case _ => lam >= d(80) - e && lam <= d(180) + e
      } else z match {
        case 1 => (lam >= -d(180) - e && lam <= -d(90) + e) ||
          ((lam >= d(160) - e && lam <= d(180) + e) &&
            (phi >= d(50) - e && phi <= d(90) + e))
        case 2 => lam >= -d(90) - e && lam <= d(60) + e
        case 3 => (lam >= d(60) - e && lam <= d(180) + e) ||
          ((lam >= -d(180) - e && lam <= -d(160) + e) &&
            (phi >= d(50) - e && phi <= d(90) + e))
        case 4 => lam >= -d(180) - e && lam <= -d(90) + e
        case 5 => lam >= -d(90) - e && lam <= d(60) + e
        case 6 => lam >= d(60) - e && lam <= d(180) + e
        case 7 | 10 => lam >= -d(180) - e && lam <= -d(60) + e
        case 8 => lam >= -d(60) - e && lam <= d(90) + e
        case 11 => (lam >= -d(60) - e && lam <= d(90) + e) ||
          ((lam >= d(90) - e && lam <= d(100) + e) &&
            (phi >= -d(90) - e && phi <= -d(40) + e))
        case _ => lam >= d(90) - e && lam <= d(180) + e
      }
    if (!ok) err else (lam, phi)
  }
}

/** Interrupted Mollweide, land (imoll) and oceanic (imoll_o) views. */
final case class ImollKernel(override val ell: Ellipsoid, oceanic: Boolean,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  import Interrupted._

  private val zones: Array[Zone] = {
    def zn(lonDeg: Double): Zone = new Zone(true, d(lonDeg), d(lonDeg), 0.0)
    if (!oceanic) Array(zn(-100), zn(30), zn(-160), zn(-60), zn(20), zn(140))
    else Array(zn(-140), zn(-10), zn(130), zn(-110), zn(20), zn(150))
  }

  /** x-shift making zone z1 meet zone z2 at lam (reference
    * compute_zone_offset) */
  private def zoneOffset(z1: Int, z2: Int, lam: Double,
                         phi1: Double, phi2: Double): Double = {
    val a = zones(z1 - 1).fwd(lam, phi1)
    val b = zones(z2 - 1).fwd(lam, phi2)
    b._1 - a._1
  }

  private val (b12, b34or23, b45, b56) = {
    if (!oceanic) {
      zones(2).zx0 += zoneOffset(3, 1, -d(160), -Epsln, +Epsln)
      zones(1).zx0 += zoneOffset(2, 1, -d(40), +Epsln, +Epsln)
      zones(3).zx0 += zoneOffset(4, 1, -d(100), -Epsln, +Epsln)
      zones(4).zx0 += zoneOffset(5, 2, -d(20), -Epsln, +Epsln)
      zones(5).zx0 += zoneOffset(6, 2, d(80), -Epsln, +Epsln)
      def bnd(lam: Double, phi: Double): Double = {
        val a = rawFwd(lam - Epsln, phi); val b = rawFwd(lam + Epsln, phi)
        (a._1 + b._1) / 2.0
      }
      (bnd(-d(40), +Epsln), bnd(-d(100), -Epsln),
        bnd(-d(20), -Epsln), bnd(d(80), -Epsln))
    } else {
      zones(1).zx0 += zoneOffset(2, 1, -d(90), +Epsln, +Epsln)
      zones(2).zx0 += zoneOffset(3, 2, d(60), +Epsln, +Epsln)
      zones(3).zx0 += zoneOffset(4, 1, -d(180), -Epsln, +Epsln)
      zones(4).zx0 += zoneOffset(5, 2, -d(60), -Epsln, +Epsln)
      zones(5).zx0 += zoneOffset(6, 3, d(90), -Epsln, +Epsln)
      def bnd(lam: Double, phi: Double): Double = {
        val a = rawFwd(lam - Epsln, phi); val b = rawFwd(lam + Epsln, phi)
        (a._1 + b._1) / 2.0
      }
      (bnd(-d(90), +Epsln), bnd(d(60), +Epsln),
        bnd(-d(60), -Epsln), bnd(d(90), -Epsln))
    }
  }

  private def zoneOfFwd(lam: Double, phi: Double): Int =
    if (!oceanic) {
      if (phi >= 0) { if (lam <= -d(40)) 1 else 2 }
      else if (lam <= -d(100)) 3
      else if (lam <= -d(20)) 4
      else if (lam <= d(80)) 5
      else 6
    } else {
      if (phi >= 0) {
        if (lam <= -d(90)) 1 else if (lam >= d(60)) 3 else 2
      } else {
        if (lam <= -d(60)) 4 else if (lam >= d(90)) 6 else 5
      }
    }

  private def rawFwd(lam: Double, phi: Double): (Double, Double) =
    zones(zoneOfFwd(lam, phi) - 1).fwd(lam, phi)

  protected def project(lam: Double, phi: Double): (Double, Double) =
    rawFwd(lam, phi)

  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val y90 = math.sqrt(2.0)
    var z = 0
    if (y > y90 + Epsln || y < -y90 + Epsln) z = 0
    else if (!oceanic) {
      if (y >= 0) z = if (x <= b12) 1 else 2
      else z = if (x <= b34or23) 3 else if (x <= b45) 4
               else if (x <= b56) 5 else 6
    } else {
      if (y >= 0) z = if (x <= b12) 1 else if (x >= b34or23) 3 else 2
      else z = if (x <= b45) 4 else if (x >= b56) 6 else 5
    }
    if (z == 0) return err
    val (lam, phi) = zones(z - 1).inv(x, y)
    val e = Epsln
    val ok: Boolean =
      if (!oceanic) z match {
        case 1 => lam >= -d(180) - e && lam <= -d(40) + e && phi >= -e
        case 2 => lam >= -d(40) - e && lam <= d(180) + e && phi >= -e
        case 3 => lam >= -d(180) - e && lam <= -d(100) + e && phi <= e
        case 4 => lam >= -d(100) - e && lam <= -d(20) + e && phi <= e
        case 5 => lam >= -d(20) - e && lam <= d(80) + e && phi <= e
        case _ => lam >= d(80) - e && lam <= d(180) + e && phi <= e
      } else z match {
        case 1 => lam >= -d(180) - e && lam <= -d(90) + e && phi >= -e
        case 2 => lam >= -d(90) - e && lam <= d(60) + e && phi >= -e
        case 3 => lam >= d(60) - e && lam <= d(180) + e && phi >= -e
        case 4 => lam >= -d(180) - e && lam <= -d(60) + e && phi <= e
        case 5 => lam >= -d(60) - e && lam <= d(90) + e && phi <= e
        case _ => lam >= d(90) - e && lam <= d(180) + e && phi <= e
      }
    if (!ok) err else (lam, phi)
  }
}
