package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Geodetic (lam, phi, h) <-> geocentric cartesian (X, Y, Z), closed-form
  * forward and the non-iterative Bowring-style inverse with pole handling.
  * Behavioral reference: /root/reference/src/conversions/cart.cpp:139-239.
  * Units: radians + metres in, metres out. */
final case class CartKernel(ell: Ellipsoid) extends PointKernel {
  override def left = IOUnits.Radians
  override def right = IOUnits.Cartesian

  def fwd(v: Array[Double]): Boolean = {
    val lam = v(0); val phi = v(1); val h = v(2)
    val cosphi = math.cos(phi); val sinphi = math.sin(phi)
    val nrc = ell.a / math.sqrt(1.0 - ell.es * sinphi * sinphi)
    v(0) = (nrc + h) * cosphi * math.cos(lam)
    v(1) = (nrc + h) * cosphi * math.sin(lam)
    v(2) = (nrc * (1.0 - ell.es) + h) * sinphi
    true
  }

  def inv(v: Array[Double]): Boolean = {
    val xa = v(0) * ell.ra; val ya = v(1) * ell.ra; val za = v(2) * ell.ra
    val pa = math.sqrt(xa * xa + ya * ya)
    val bDivA = 1.0 - ell.f
    val pb = pa * bDivA
    val norm = math.sqrt(za * za + pb * pb)
    var c = 1.0; var s = 0.0
    if (norm != 0.0) { c = pb / norm; s = za / norm }
    val yPhi = za + ell.e2s * bDivA * s * s * s
    val xPhi = pa - ell.es * c * c * c
    val normPhi = math.sqrt(yPhi * yPhi + xPhi * xPhi)
    var cosphi = 1.0; var sinphi = 0.0
    if (normPhi != 0.0) { cosphi = xPhi / normPhi; sinphi = yPhi / normPhi }
    var phi = 0.0
    if (xPhi <= 0.0) {
      // degenerate near-centre case: no unique solution, clamp to a pole
      phi = if (v(2) >= 0) M.HalfPi else -M.HalfPi
      cosphi = 0.0
      sinphi = if (v(2) >= 0) 1.0 else -1.0
    } else phi = math.atan(yPhi / xPhi)
    val lam = math.atan2(ya, xa)
    var h = 0.0
    if (cosphi < 1e-6) {
      // poleward of ~89.99994 deg: height from geocentric radius
      val c2 = cosphi * cosphi; val s2 = sinphi * sinphi
      val b2 = bDivA * bDivA
      val r = ell.a * math.sqrt((c2 + b2 * (b2 * s2)) / (c2 + b2 * s2))
      h = math.abs(v(2)) - r
    } else {
      val nrc = ell.a / math.sqrt(1.0 - ell.es * sinphi * sinphi)
      h = ell.a * pa / cosphi - nrc
    }
    v(0) = lam; v(1) = phi; v(2) = h
    true
  }
}

/** Helmert similarity transform on geocentric cartesian coordinates:
  * 3/4/7-parameter static and 14-parameter kinematic (rates applied from
  * t_epoch to the per-row observation epoch in v(3)).  Behavioral
  * reference: /root/reference/src/transformations/helmert.cpp:100-474.
  *
  * Translations in metres, rotations in radians (callers convert from
  * arcsec), scale in ppm; rates per year.  `positionVector` selects the
  * EPSG position-vector sign convention (transpose of coordinate-frame);
  * `exact` uses the full trigonometric rotation matrix instead of the
  * small-angle linearization.
  *
  * Unlike PROJ's single-threaded cached-matrix variant
  * (helmert.cpp:438-455), the kinematic path recomputes the matrix per
  * row — a pure function compatible with parallel execution (SURVEY.md
  * §7.4). */
final case class HelmertKernel(
    x: Double = 0, y: Double = 0, z: Double = 0,
    rx: Double = 0, ry: Double = 0, rz: Double = 0, s: Double = 0,
    dx: Double = 0, dy: Double = 0, dz: Double = 0,
    drx: Double = 0, dry: Double = 0, drz: Double = 0, ds: Double = 0,
    tEpoch: Double = Double.NaN,
    exact: Boolean = false, positionVector: Boolean = false,
    fourParam: Boolean = false, theta: Double = 0.0)
    extends PointKernel {
  override def left = IOUnits.Cartesian
  override def right = IOUnits.Cartesian

  private val kinematic =
    !tEpoch.isNaN && (dx != 0 || dy != 0 || dz != 0 || drx != 0 ||
      dry != 0 || drz != 0 || ds != 0)
  private val noRotation = rx == 0 && ry == 0 && rz == 0 && !kinematic

  /** 3x3 rotation (+ row-major) for parameters at epoch offset dt. */
  private def rot(dt: Double): Array[Double] = {
    val f = rx + drx * dt; val t = ry + dry * dt; val p = rz + drz * dt
    val m = new Array[Double](9)
    if (exact) {
      val cf = math.cos(f); val sf = math.sin(f)
      val ct = math.cos(t); val st = math.sin(t)
      val cp = math.cos(p); val sp = math.sin(p)
      m(0) = ct * cp; m(1) = cf * sp + sf * st * cp; m(2) = sf * sp - cf * st * cp
      m(3) = -ct * sp; m(4) = cf * cp - sf * st * sp; m(5) = sf * cp + cf * st * sp
      m(6) = st; m(7) = -sf * ct; m(8) = cf * ct
    } else {
      m(0) = 1; m(1) = p; m(2) = -t
      m(3) = -p; m(4) = 1; m(5) = f
      m(6) = t; m(7) = -f; m(8) = 1
    }
    if (positionVector) {
      def swap(i: Int, j: Int): Unit = { val tmp = m(i); m(i) = m(j); m(j) = tmp }
      swap(1, 3); swap(2, 6); swap(5, 7)
    }
    m
  }
  private val rot0 = rot(0.0)

  private def dtOf(v: Array[Double]): Double = {
    if (!kinematic) 0.0
    else {
      val t = v(3)
      val tObs = if (t.isNaN) tEpoch else t
      tObs - tEpoch
    }
  }

  def fwd(v: Array[Double]): Boolean = {
    if (fourParam) {
      // 2D 4-param: s is the scale FACTOR itself, not ppm
      // (reference: helmert.cpp:324-341 uses Q->scale directly)
      val cr = math.cos(theta) * s
      val sr = math.sin(theta) * s
      val x0 = v(0); val y0 = v(1)
      v(0) = cr * x0 + sr * y0 + x
      v(1) = -sr * x0 + cr * y0 + y
      return true
    }
    val dt = dtOf(v)
    val tx = x + dx * dt; val ty = y + dy * dt; val tz = z + dz * dt
    if (noRotation && s == 0.0 && ds == 0.0) {
      v(0) += tx; v(1) += ty; v(2) += tz
      return true
    }
    val m = if (dt == 0.0) rot0 else rot(dt)
    val scale = 1.0 + (s + ds * dt) * 1e-6
    val xx = v(0); val yy = v(1); val zz = v(2)
    v(0) = scale * (m(0) * xx + m(1) * yy + m(2) * zz) + tx
    v(1) = scale * (m(3) * xx + m(4) * yy + m(5) * zz) + ty
    v(2) = scale * (m(6) * xx + m(7) * yy + m(8) * zz) + tz
    true
  }

  def inv(v: Array[Double]): Boolean = {
    if (fourParam) {
      val cr = math.cos(theta) / s
      val sr = math.sin(theta) / s
      val x0 = v(0) - x; val y0 = v(1) - y
      v(0) = x0 * cr - y0 * sr
      v(1) = x0 * sr + y0 * cr
      return true
    }
    val dt = dtOf(v)
    val tx = x + dx * dt; val ty = y + dy * dt; val tz = z + dz * dt
    if (noRotation && s == 0.0 && ds == 0.0) {
      v(0) -= tx; v(1) -= ty; v(2) -= tz
      return true
    }
    val m = if (dt == 0.0) rot0 else rot(dt)
    val scale = 1.0 + (s + ds * dt) * 1e-6
    val xx = (v(0) - tx) / scale
    val yy = (v(1) - ty) / scale
    val zz = (v(2) - tz) / scale
    // inverse rotation = transpose
    v(0) = m(0) * xx + m(3) * yy + m(6) * zz
    v(1) = m(1) * xx + m(4) * yy + m(7) * zz
    v(2) = m(2) * xx + m(5) * yy + m(8) * zz
    true
  }
}

/** Molodensky-Badekas: 7-param similarity about a reference point
  * (reference: /root/reference/src/transformations/helmert.cpp:699-760):
  * out = scale * R * (in - ref) + ref + T. */
final case class MolodenskyBadekasKernel(
    x: Double, y: Double, z: Double,
    rx: Double, ry: Double, rz: Double, s: Double,
    px: Double, py: Double, pz: Double,
    exact: Boolean = false, positionVector: Boolean = false)
    extends PointKernel {
  override def left = IOUnits.Cartesian
  override def right = IOUnits.Cartesian
  private val h = HelmertKernel(x = 0, y = 0, z = 0, rx = rx, ry = ry,
    rz = rz, s = s, exact = exact, positionVector = positionVector)
  def fwd(v: Array[Double]): Boolean = {
    v(0) -= px; v(1) -= py; v(2) -= pz
    h.fwd(v)
    v(0) += px + x; v(1) += py + y; v(2) += pz + z
    true
  }
  def inv(v: Array[Double]): Boolean = {
    v(0) -= px + x; v(1) -= py + y; v(2) -= pz + z
    h.inv(v)
    v(0) += px; v(1) += py; v(2) += pz
    true
  }
}

/** General affine transform on (x,y,z,t) with exact matrix inverse
  * (reference: /root/reference/src/transformations/affine.cpp). */
final case class AffineKernel(xoff: Double = 0, yoff: Double = 0,
                              zoff: Double = 0, toff: Double = 0,
                              s11: Double = 1, s12: Double = 0, s13: Double = 0,
                              s21: Double = 0, s22: Double = 1, s23: Double = 0,
                              s31: Double = 0, s32: Double = 0, s33: Double = 1,
                              tscale: Double = 1) extends PointKernel {
  private val det = s11 * (s22 * s33 - s23 * s32) -
    s12 * (s21 * s33 - s23 * s31) + s13 * (s21 * s32 - s22 * s31)
  override def invertible: Boolean = det != 0.0 && tscale != 0.0
  // adjugate / det
  private val i11 = (s22 * s33 - s23 * s32) / det
  private val i12 = (s13 * s32 - s12 * s33) / det
  private val i13 = (s12 * s23 - s13 * s22) / det
  private val i21 = (s23 * s31 - s21 * s33) / det
  private val i22 = (s11 * s33 - s13 * s31) / det
  private val i23 = (s13 * s21 - s11 * s23) / det
  private val i31 = (s21 * s32 - s22 * s31) / det
  private val i32 = (s12 * s31 - s11 * s32) / det
  private val i33 = (s11 * s22 - s12 * s21) / det
  def fwd(v: Array[Double]): Boolean = {
    val x = v(0); val y = v(1); val z = v(2)
    v(0) = xoff + s11 * x + s12 * y + s13 * z
    v(1) = yoff + s21 * x + s22 * y + s23 * z
    v(2) = zoff + s31 * x + s32 * y + s33 * z
    if (!v(3).isNaN) v(3) = toff + tscale * v(3)
    true
  }
  def inv(v: Array[Double]): Boolean = {
    // singular matrix / tscale: the op builds (fwd-only) but its inverse
    // application fails, mirroring the reference (more_builtins.gie:750-765)
    if (det == 0.0 || tscale == 0.0) return false
    val x = v(0) - xoff; val y = v(1) - yoff; val z = v(2) - zoff
    v(0) = i11 * x + i12 * y + i13 * z
    v(1) = i21 * x + i22 * y + i23 * z
    v(2) = i31 * x + i32 * y + i33 * z
    if (!v(3).isNaN) v(3) = (v(3) - toff) / tscale
    true
  }
}

/** EPSG 1046 Vertical Offset and Slope: z adjusted by a planar slope
  * about (lat_0, lon_0) (reference:
  * /root/reference/src/transformations/vertoffset.cpp:47-52). */
final case class VertOffsetKernel(ell: Ellipsoid, lat0: Double, lon0: Double,
                                  dh: Double, slopeLat: Double,
                                  slopeLon: Double) extends PointKernel {
  override def left = IOUnits.Radians
  override def right = IOUnits.Radians
  private val sin0 = math.sin(lat0)
  private val oneMinus = 1.0 - ell.es * sin0 * sin0
  private val rho0 = ell.a * ell.oneEs / (oneMinus * math.sqrt(oneMinus))
  private val nu0 = ell.a / math.sqrt(oneMinus)
  private def offset(phi: Double, lam: Double): Double =
    dh + slopeLat * rho0 * (phi - lat0) +
      slopeLon * nu0 * (lam - lon0) * math.cos(phi)
  def fwd(v: Array[Double]): Boolean = { v(2) += offset(v(1), v(0)); true }
  def inv(v: Array[Double]): Boolean = { v(2) -= offset(v(1), v(0)); true }
}

/** Overwrite selected components with constants (PROJ `set`,
  * /root/reference/src/conversions/set.cpp): applied in BOTH directions. */
final case class SetKernel(values: Array[(Int, Double)]) extends PointKernel {
  def fwd(v: Array[Double]): Boolean = {
    var i = 0
    while (i < values.length) { v(values(i)._1) = values(i)._2; i += 1 }
    true
  }
  def inv(v: Array[Double]): Boolean = fwd(v)
}

/** Geocentric <-> topocentric (E,N,U about an origin) per IOGP GN 7-2
  * (reference: /root/reference/src/conversions/topocentric.cpp). Origin
  * given either geocentric (X0,Y0,Z0) or geographic (lon0,lat0,h0). */
final case class TopocentricKernel(ell: Ellipsoid,
                                   originXyz: Option[(Double, Double, Double)],
                                   originLlh: Option[(Double, Double, Double)])
    extends PointKernel {
  override def left = IOUnits.Cartesian
  override def right = IOUnits.Cartesian
  private val cart = CartKernel(ell)
  private val (x0v, y0v, z0v, sinphi0, cosphi0, sinlam0, coslam0) = {
    (originXyz, originLlh) match {
      case (Some((x, y, z)), None) =>
        val v = Array(x, y, z, 0.0)
        cart.inv(v)
        (x, y, z, math.sin(v(1)), math.cos(v(1)), math.sin(v(0)), math.cos(v(0)))
      case (None, Some((lam, phi, h))) =>
        val v = Array(lam, phi, h, 0.0)
        cart.fwd(v)
        (v(0), v(1), v(2), math.sin(phi), math.cos(phi), math.sin(lam), math.cos(lam))
      case _ => throw new IllegalArgumentException(
        "topocentric needs exactly one of (X_0,Y_0,Z_0) / (lon_0,lat_0,h_0)")
    }
  }
  def fwd(v: Array[Double]): Boolean = {
    val dX = v(0) - x0v; val dY = v(1) - y0v; val dZ = v(2) - z0v
    v(0) = -dX * sinlam0 + dY * coslam0
    v(1) = -dX * sinphi0 * coslam0 - dY * sinphi0 * sinlam0 + dZ * cosphi0
    v(2) = dX * cosphi0 * coslam0 + dY * cosphi0 * sinlam0 + dZ * sinphi0
    true
  }
  def inv(v: Array[Double]): Boolean = {
    val x = v(0); val y = v(1); val z = v(2)
    v(0) = x0v - x * sinlam0 - y * sinphi0 * coslam0 + z * cosphi0 * coslam0
    v(1) = y0v + x * coslam0 - y * sinphi0 * sinlam0 + z * cosphi0 * sinlam0
    v(2) = z0v + y * cosphi0 + z * sinphi0
    true
  }
}

/** (Abridged) Molodensky geodetic-domain datum shift (reference:
  * /root/reference/src/transformations/molodensky.cpp). Radians in/out;
  * note the reverse is the forward offsets negated at the TARGET point
  * (the reference's approximation, not an exact inverse). */
final case class MolodenskyKernel(ell: Ellipsoid,
                                  dx: Double, dy: Double, dz: Double,
                                  da: Double, df: Double,
                                  abridged: Boolean = false)
    extends PointKernel {
  override def left = IOUnits.Radians
  override def right = IOUnits.Radians

  private def rn(phi: Double): Double = {
    val s = math.sin(phi)
    if (ell.es == 0) ell.a else ell.a / math.sqrt(1 - ell.es * s * s)
  }
  private def rm(phi: Double): Double = {
    val s = math.sin(phi)
    if (ell.es == 0) ell.a
    else if (phi == 0) ell.a * (1 - ell.es)
    else if (math.abs(phi) == M.HalfPi) ell.a / math.sqrt(1 - ell.es)
    else (ell.a * (1 - ell.es)) / math.pow(1 - ell.es * s * s, 1.5)
  }

  /** (dphi, dlam, dh) at (lam, phi, z); NaN dlam = domain error */
  private def offsets(lam: Double, phi: Double, z: Double): (Double, Double, Double) = {
    val slam = math.sin(lam); val clam = math.cos(lam)
    val sphi = math.sin(phi); val cphi = math.cos(phi)
    if (abridged) {
      val adffda = ell.a * df + ell.f * da
      val dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi +
        adffda * math.sin(2 * phi)) / rm(phi)
      val dlamDen = rn(phi) * cphi
      if (dlamDen == 0.0) return (0.0, Double.NaN, 0.0)
      val dlam = (-dx * slam + dy * clam) / dlamDen
      val dh = dx * cphi * clam + dy * cphi * slam + dz * sphi - da +
        adffda * sphi * sphi
      (dphi, dlam, dh)
    } else {
      val rho = rm(phi); val nu = rn(phi)
      var dphi = (-dx * sphi * clam) - (dy * sphi * slam) + (dz * cphi) +
        ((nu * ell.es * sphi * cphi * da) / ell.a) +
        (sphi * cphi * (rho / (1 - ell.f) + nu * (1 - ell.f)) * df)
      val dphiDen = rho + z
      if (dphiDen == 0.0) return (0.0, Double.NaN, 0.0)
      dphi /= dphiDen
      val dlamDen = (nu + z) * cphi
      if (dlamDen == 0.0) return (0.0, Double.NaN, 0.0)
      val dlam = (-dx * slam + dy * clam) / dlamDen
      val dh = dx * cphi * clam + dy * cphi * slam + dz * sphi -
        (ell.a / nu) * da + nu * (1 - ell.f) * sphi * sphi * df
      (dphi, dlam, dh)
    }
  }

  def fwd(v: Array[Double]): Boolean = {
    val (dphi, dlam, dh) = offsets(v(0), v(1), v(2))
    if (dlam.isNaN) return false
    v(0) += dlam; v(1) += dphi; v(2) += dh
    true
  }
  def inv(v: Array[Double]): Boolean = {
    val (dphi, dlam, dh) = offsets(v(0), v(1), v(2))
    if (dlam.isNaN) return false
    v(0) -= dlam; v(1) -= dphi; v(2) -= dh
    true
  }
}

/** Geographic <-> geocentric latitude conversion (PROJ `geoc`,
  * /root/reference/src/conversions/geoc.cpp). */
final case class GeocLatKernel(ell: Ellipsoid) extends PointKernel {
  override def left = IOUnits.Radians
  override def right = IOUnits.Radians
  def fwd(v: Array[Double]): Boolean = {
    v(1) = M.geocentricLat(v(1), ell.oneEs, fwd = true); true
  }
  def inv(v: Array[Double]): Boolean = {
    v(1) = M.geocentricLat(v(1), ell.oneEs, fwd = false); true
  }
}

/** Constant lon/lat/h offset (PROJ `geogoffset`: angular components in
  * radians, I/O tagged angular like the reference). */
final case class OffsetKernel(dx: Double, dy: Double, dz: Double)
    extends PointKernel {
  override def left = IOUnits.Radians
  override def right = IOUnits.Radians
  def fwd(v: Array[Double]): Boolean = { v(0) += dx; v(1) += dy; v(2) += dz; true }
  def inv(v: Array[Double]): Boolean = { v(0) -= dx; v(1) -= dy; v(2) -= dz; true }
}
