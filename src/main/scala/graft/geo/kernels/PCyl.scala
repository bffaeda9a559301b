package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Small spherical pseudocylindrical / miscellaneous projections.
  * All force es=0 (spherical formulas over the semimajor axis), as the
  * reference constructors do.  Behavioral references are the identically
  * named files under /root/reference/src/projections/ (eck1.cpp, wag2.cpp,
  * mill.cpp, ...); constants are the published projection constants. */

/** Eckert I. */
final case class Eck1Kernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val FC = 0.92131773192356127802
  private val RP = 0.31830988618379067154
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (FC * lam * (1.0 - RP * math.abs(phi)), FC * phi)
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = y / FC
    (x / (FC * (1.0 - RP * math.abs(phi))), phi)
  }
}

/** Eckert II. */
final case class Eck2Kernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val FXC = 0.46065886596178063902
  private val FYC = 1.44720250911653531871
  private val C13 = 0.33333333333333333333
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val t = math.sqrt(4.0 - 3.0 * math.sin(math.abs(phi)))
    val y = FYC * (2.0 - t)
    (FXC * lam * t, if (phi < 0) -y else y)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val t = 2.0 - math.abs(y) / FYC
    val lam = x / (FXC * t)
    var phi = (4.0 - t * t) * C13
    if (math.abs(phi) >= 1.0) {
      if (math.abs(phi) > 1.0000001) return err
      phi = if (phi < 0) -M.HalfPi else M.HalfPi
    } else phi = math.asin(phi)
    (lam, if (y < 0) -phi else phi)
  }
}

/** Eckert III parameterization, shared by eck3 / kav7 / wag6 / putp1:
  * x = Cx·λ·(A + sqrt(1 − B·φ²)), y = Cy·φ. */
final case class Eck3Kernel(override val ell: Ellipsoid,
                            cx: Double, cy: Double, aa: Double, bb: Double,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (cx * lam * (aa + math.sqrt(math.max(0.0, 1.0 - bb * phi * phi))),
      cy * phi)
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = y / cy
    val den = cx * (aa + math.sqrt(math.max(0.0, 1.0 - bb * phi * phi)))
    if (den == 0.0) err else (x / den, phi)
  }
}
object Eck3Kernel {
  private val B = 0.30396355092701331433
  def eck3(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Eck3Kernel(ell, 0.42223820031577120149, 0.84447640063154240298, 1.0,
      0.4052847345693510857755, lam0, x0, y0)
  def kav7(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Eck3Kernel(ell, 0.8660254037844, 1.0, 0.0, B, lam0, x0, y0)
  def wag6(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Eck3Kernel(ell, 1.0, 1.0, 0.0, B, lam0, x0, y0)
  def putp1(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Eck3Kernel(ell, 1.89490, 0.94745, -0.5, B, lam0, x0, y0)
}

/** Eckert IV. */
final case class Eck4Kernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Cx = 0.42223820031577120149
  private val Cy = 1.32650042817700232218
  private val RCy = 0.75386330736002178205
  private val Cp = 3.57079632679489661922
  private val RCp = 0.28004957675577868795
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val p = Cp * math.sin(phiIn)
    var v = phiIn * phiIn
    var theta = phiIn * (0.895168 + v * (0.0218849 + v * 0.00826809))
    var i = 6
    var converged = false
    while (i > 0 && !converged) {
      val c = math.cos(theta); val s = math.sin(theta)
      v = (theta + s * (c + 2.0) - p) / (1.0 + c * (c + 2.0) - s * s)
      theta -= v
      if (math.abs(v) < 1e-7) converged = true
      i -= 1
    }
    if (!converged && i == 0)
      (Cx * lam, if (theta < 0) -Cy else Cy)
    else
      (Cx * lam * (1.0 + math.cos(theta)), Cy * math.sin(theta))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val sinTheta = y * RCy
    val oneMinus = 1.0 - math.abs(sinTheta)
    val (lam, phi) =
      if (oneMinus >= 0.0 && oneMinus <= 1e-12)
        (x / Cx, if (sinTheta > 0) M.HalfPi else -M.HalfPi)
      else {
        if (math.abs(sinTheta) > 1.0) return err
        val theta = math.asin(sinTheta)
        val cosTheta = math.cos(theta)
        val sp = (theta + sinTheta * (cosTheta + 2.0)) * RCp
        if (math.abs(sp) > 1.0) return err
        (x / (Cx * (1.0 + cosTheta)), math.asin(sp))
      }
    if (math.abs(lam) - math.Pi > 0.0) {
      if (math.abs(lam) - math.Pi > 1e-10) err
      else (if (lam > 0) math.Pi else -math.Pi, phi)
    } else (lam, phi)
  }
}

/** Eckert V. */
final case class Eck5Kernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val XF = 0.44101277172455148219
  private val RXF = 2.26750802723822639137
  private val YF = 0.88202554344910296438
  private val RYF = 1.13375401361911319568
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (XF * (1.0 + math.cos(phi)) * lam, YF * phi)
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = RYF * y
    (RXF * x / (1.0 + math.cos(phi)), phi)
  }
}

/** Wagner II. */
final case class Wag2Kernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Cx = 0.92483; private val Cy = 1.38725
  private val Cp1 = 0.88022; private val Cp2 = 0.88550
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val phi = aasin(Cp1 * math.sin(Cp2 * phiIn))
    (Cx * lam * math.cos(phi), Cy * phi)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val t = y / Cy
    (x / (Cx * math.cos(t)), aasin(math.sin(t) / Cp1) / Cp2)
  }
}

/** Wagner III (lat_ts). */
final case class Wag3Kernel(override val ell: Ellipsoid, latTs: Double = 0.0,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val TwoThird = 0.6666666666666666666667
  private val cx = math.cos(latTs) / math.cos(2.0 * latTs / 3.0)
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (cx * lam * math.cos(TwoThird * phi), phi)
  protected def unproject(x: Double, y: Double): (Double, Double) =
    (x / (cx * math.cos(TwoThird * y)), y)
}

/** Wagner VII (forward only, like the reference). */
final case class Wag7Kernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lamIn: Double, phi: Double): (Double, Double) = {
    val s = 0.90630778703664996 * math.sin(phi)
    val theta = math.asin(s)
    val ct = math.cos(theta)
    val lam = lamIn / 3.0
    val d = 1.0 / math.sqrt(0.5 * (1.0 + ct * math.cos(lam)))
    (2.66723 * ct * math.sin(lam) * d, s * 1.24104 * d)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Mollweide-core family with explicit constants (wag4, wag5); moll
  * itself stays on [[MollKernel]]. */
final case class MollFamilyKernel(override val ell: Ellipsoid,
                                  cx: Double, cy: Double, cp: Double,
                                  override val lam0: Double = 0.0,
                                  override val x0: Double = 0.0,
                                  override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    var phi = phiIn
    val k = cp * math.sin(phi)
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      val v = (phi + math.sin(phi) - k) / (1.0 + math.cos(phi))
      phi -= v
      if (math.abs(v) < 1e-7) converged = true
      i -= 1
    }
    phi = if (!converged) { if (phi < 0) -M.HalfPi else M.HalfPi } else phi * 0.5
    (cx * lam * math.cos(phi), cy * math.sin(phi))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val t = y / cy
    if (math.abs(t) > 1.0) return err
    var phi = math.asin(t)
    val lam = x / (cx * math.cos(phi))
    if (math.abs(lam) < math.Pi) {
      phi += phi
      val s = (phi + math.sin(phi)) / cp
      if (math.abs(s) > 1.0 + 1e-10) return err
      (lam, math.asin(math.max(-1.0, math.min(1.0, s))))
    } else err
  }
}
object MollFamilyKernel {
  def wag4(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double): MollFamilyKernel = {
    val p = math.Pi / 3.0
    val p2 = p + p
    val sp = math.sin(p)
    val r = math.sqrt(M.TwoPi * sp / (p2 + math.sin(p2)))
    MollFamilyKernel(ell, 2.0 * r / math.Pi, r / sp, p2 + math.sin(p2),
      lam0, x0, y0)
  }
  def wag5(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double): MollFamilyKernel =
    MollFamilyKernel(ell, 0.90977, 1.65014, 3.00896, lam0, x0, y0)
}

/** General sinusoidal series (spherical), shared by gn_sinu / eck6 /
  * mbtfps: x = Cx·λ·(m + cos φ'), y = Cy·φ' with
  * m·φ' + sin φ' = n·sin φ. */
final case class GnSinuKernel(override val ell: Ellipsoid,
                              m: Double, n: Double,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val cy = math.sqrt((m + 1.0) / n)
  private val cx = cy / (m + 1.0)
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    var phi = phiIn
    if (m == 0.0) phi = if (n != 1.0) aasin(n * math.sin(phi)) else phi
    else {
      val k = n * math.sin(phi)
      var i = 8
      var converged = false
      while (i > 0 && !converged) {
        val v = (m * phi + math.sin(phi) - k) / (m + math.cos(phi))
        phi -= v
        if (math.abs(v) < 1e-7) converged = true
        i -= 1
      }
      if (!converged) return err
    }
    (cx * lam * (m + math.cos(phi)), cy * phi)
  }
  protected def unproject(x: Double, yIn: Double): (Double, Double) = {
    val y = yIn / cy
    val phi =
      if (m != 0.0) aasin((m * y + math.sin(y)) / n)
      else if (n != 1.0) aasin(math.sin(y) / n)
      else y
    (x / (cx * (m + math.cos(y))), phi)
  }
}
object GnSinuKernel {
  def eck6(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    GnSinuKernel(ell, 1.0, 2.570796326794896619231321691, lam0, x0, y0)
  def mbtfps(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    GnSinuKernel(ell, 0.5, 1.785398163397448309615660845, lam0, x0, y0)
}

/** Urmaev flat-polar sinusoidal (urmfps n=; wag1 n=sin 60°). */
final case class UrmfpsKernel(override val ell: Ellipsoid, n: Double,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Cx = 0.8773826753
  private val cy = 1.139753528477 / n
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val phi = aasin(n * math.sin(phiIn))
    (Cx * lam * math.cos(phi), cy * phi)
  }
  protected def unproject(x: Double, yIn: Double): (Double, Double) = {
    val y = yIn / cy
    (x / (Cx * math.cos(y)), aasin(math.sin(y) / n))
  }
}

/** Foucaut sinusoidal (n = weighting between sinusoidal and
  * cylindrical equal-area). */
final case class FoucSKernel(override val ell: Ellipsoid, n: Double,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val n1 = 1.0 - n
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val t = math.cos(phi)
    (lam * t / (n + n1 * t), n * phi + n1 * math.sin(phi))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var phi = 0.0
    if (n != 0.0) {
      phi = y
      var i = 10
      var converged = false
      while (i > 0 && !converged) {
        val v = (n * phi + n1 * math.sin(phi) - y) /
          (n + n1 * math.cos(phi))
        phi -= v
        if (math.abs(v) < 1e-7) converged = true
        i -= 1
      }
      if (!converged) phi = if (y < 0) -M.HalfPi else M.HalfPi
    } else phi = math.asin(math.max(-1.0, math.min(1.0, y)))
    val v = math.cos(phi)
    (x * (n + n1 * v) / v, phi)
  }
}

/** Miller cylindrical. */
final case class MillKernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (lam, math.log(math.tan(M.FortPi + phi * 0.4)) * 1.25)
  protected def unproject(x: Double, y: Double): (Double, Double) =
    (x, 2.5 * (math.atan(math.exp(0.8 * y)) - M.FortPi))
}

/** Gall stereographic. */
final case class GallKernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val YF = 1.70710678118654752440
  private val XF = 0.70710678118654752440
  private val RYF = 0.58578643762690495119
  private val RXF = 1.41421356237309504880
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (XF * lam, YF * math.tan(0.5 * phi))
  protected def unproject(x: Double, y: Double): (Double, Double) =
    (RXF * x, 2.0 * math.atan(y * RYF))
}

/** Central cylindrical (cc). */
final case class CcKernel(override val ell: Ellipsoid,
                          override val lam0: Double = 0.0,
                          override val x0: Double = 0.0,
                          override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) =
    if (math.abs(math.abs(phi) - M.HalfPi) <= 1e-10) err
    else (lam, math.tan(phi))
  protected def unproject(x: Double, y: Double): (Double, Double) =
    (x, math.atan(y))
}

/** Compact Miller (Patterson–Savric–Jenny polynomial). */
final case class ComillKernel(override val ell: Ellipsoid,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val K1 = 0.9902; private val K2 = 0.1604; private val K3 = -0.03054
  private val C2 = 3 * K2; private val C3 = 5 * K3
  private val MaxY = 0.6000207669862655 * math.Pi
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val p2 = phi * phi
    (lam, phi * (K1 + p2 * (K2 + K3 * p2)))
  }
  protected def unproject(x: Double, yIn: Double): (Double, Double) = {
    val y = math.max(-MaxY, math.min(MaxY, yIn))
    var yc = y
    var i = 100
    var converged = false
    while (i > 0 && !converged) {
      val y2 = yc * yc
      val f = yc * (K1 + y2 * (K2 + K3 * y2)) - y
      val fder = K1 + y2 * (C2 + C3 * y2)
      val tol = f / fder
      yc -= tol
      if (math.abs(tol) < 1e-11) converged = true
      i -= 1
    }
    if (!converged) err else (x, yc)
  }
}

/** Fahey. */
final case class FaheyKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val t = math.tan(0.5 * phi)
    (0.819152 * lam * math.sqrt(math.max(0.0, 1.0 - t * t)), 1.819152 * t)
  }
  protected def unproject(x: Double, yIn: Double): (Double, Double) = {
    val t = yIn / 1.819152
    val phi = 2.0 * math.atan(t)
    val u = 1.0 - t * t
    (if (math.abs(u) < 1e-6) 0.0 else x / (0.819152 * math.sqrt(u)), phi)
  }
}

/** Collignon. */
final case class CollgKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val FXC = 1.12837916709551257390
  private val FYC = 1.77245385090551602729
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var t = 1.0 - math.sin(phi)
    t = if (t <= 0.0) 0.0 else math.sqrt(t)
    (FXC * lam * t, FYC * (1.0 - t))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val t = y / FYC - 1.0
    var phi = 1.0 - t * t
    if (math.abs(phi) < 1.0) phi = math.asin(phi)
    else if (math.abs(phi) > 1.0000001) return err
    else phi = if (phi < 0) -M.HalfPi else M.HalfPi
    var s = 1.0 - math.sin(phi)
    val lam = if (s <= 0.0) 0.0 else x / (FXC * math.sqrt(s))
    (lam, phi)
  }
}

/** Craster parabolic (Putnins P4). */
final case class CrastKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val XM = 0.97720502380583984317
  private val RXM = 1.02332670794648848847
  private val YM = 3.06998012383946546542
  private val RYM = 0.32573500793527994772
  private val Third = 0.333333333333333333
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val phi = phiIn * Third
    (XM * lam * (2.0 * math.cos(phi + phi) - 1.0), YM * math.sin(phi))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = 3.0 * math.asin(math.max(-1.0, math.min(1.0, y * RYM)))
    (x * RXM / (2.0 * math.cos((phi + phi) * Third) - 1.0), phi)
  }
}

/** Loximuthal (lat_1). */
final case class LoximKernel(override val ell: Ellipsoid, phi1: Double,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-8
  private val cosphi1 = math.cos(phi1)
  private val tanphi1 = math.tan(M.FortPi + 0.5 * phi1)
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val y = phi - phi1
    val x =
      if (math.abs(y) < Eps) lam * cosphi1
      else {
        val t = M.FortPi + 0.5 * phi
        if (math.abs(t) < Eps || math.abs(math.abs(t) - M.HalfPi) < Eps) 0.0
        else lam * y / math.log(math.tan(t) / tanphi1)
      }
    (x, y)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = y + phi1
    val lam =
      if (math.abs(y) < Eps) x / cosphi1
      else {
        val t = M.FortPi + 0.5 * phi
        if (math.abs(t) < Eps || math.abs(math.abs(t) - M.HalfPi) < Eps) 0.0
        else x * math.log(math.tan(t) / tanphi1) / y
      }
    (lam, phi)
  }
}

/** Nell. */
final case class NellKernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val k = 2.0 * math.sin(phiIn)
    val p2 = phiIn * phiIn
    var phi = phiIn * (1.00371 + p2 * (-0.0935382 + p2 * -0.011412))
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      val v = (phi + math.sin(phi) - k) / (1.0 + math.cos(phi))
      phi -= v
      if (math.abs(v) < 1e-7) converged = true
      i -= 1
    }
    (0.5 * lam * (1.0 + math.cos(phi)), phi)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) =
    (2.0 * x / (1.0 + math.cos(y)),
      math.asin(math.max(-1.0, math.min(1.0, 0.5 * (y + math.sin(y))))))
}

/** Nell–Hammer. */
final case class NellHKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (0.5 * lam * (1.0 + math.cos(phi)), 2.0 * (phi - math.tan(0.5 * phi)))
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val p = 0.5 * y
    var phi = 0.0
    var i = 9
    var converged = false
    while (i > 0 && !converged) {
      val c = math.cos(0.5 * phi)
      val v = (phi - math.tan(phi / 2) - p) / (1.0 - 0.5 / (c * c))
      phi -= v
      if (math.abs(v) < 1e-7) converged = true
      i -= 1
    }
    if (!converged)
      (2.0 * x, if (p < 0) -M.HalfPi else M.HalfPi)
    else
      (2.0 * x / (1.0 + math.cos(phi)), phi)
  }
}

/** Winkel I (lat_ts). */
final case class Wink1Kernel(override val ell: Ellipsoid, latTs: Double = 0.0,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val cosphi1 = math.cos(latTs)
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (0.5 * lam * (cosphi1 + math.cos(phi)), phi)
  protected def unproject(x: Double, y: Double): (Double, Double) =
    (2.0 * x / (cosphi1 + math.cos(y)), y)
}

/** Winkel II (lat_1; numeric inverse). */
final case class Wink2Kernel(override val ell: Ellipsoid, phi1: Double = 0.0,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) with GenericInverse2D {
  private val cosphi1 = math.cos(phi1)
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val y0v = phiIn * M.TwoOverPi
    val k = math.Pi * math.sin(phiIn)
    var phi = phiIn * 1.8
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      val v = (phi + math.sin(phi) - k) / (1.0 + math.cos(phi))
      phi -= v
      if (math.abs(v) < 1e-7) converged = true
      i -= 1
    }
    phi = if (!converged) { if (phi < 0) -M.HalfPi else M.HalfPi } else phi * 0.5
    (0.5 * lam * (math.cos(phi) + cosphi1),
      M.FortPi * (math.sin(phi) + y0v))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) =
    genericInverse2d(x, y, x, y, tol = 1e-10)
}

/** Natural Earth (Savric–Patterson–Jenny polynomial). */
final case class NatearthKernel(override val ell: Ellipsoid,
                                override val lam0: Double = 0.0,
                                override val x0: Double = 0.0,
                                override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val A0 = 0.8707; private val A1 = -0.131979
  private val A2 = -0.013791; private val A3 = 0.003971
  private val A4 = -0.001529
  private val B0 = 1.007226; private val B1 = 0.015085
  private val B2 = -0.044475; private val B3 = 0.028874
  private val B4 = -0.005916
  private val C1 = 3 * B1; private val C2 = 7 * B2
  private val C3 = 9 * B3; private val C4 = 11 * B4
  private val MaxY = 0.8707 * 0.52 * math.Pi
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val p2 = phi * phi; val p4 = p2 * p2
    (lam * (A0 + p2 * (A1 + p2 * (A2 + p4 * p2 * (A3 + p2 * A4)))),
      phi * (B0 + p2 * (B1 + p4 * (B2 + B3 * p2 + B4 * p4))))
  }
  protected def unproject(x: Double, yIn: Double): (Double, Double) = {
    val y = math.max(-MaxY, math.min(MaxY, yIn))
    var yc = y
    var i = 100
    var converged = false
    while (i > 0 && !converged) {
      val y2 = yc * yc; val y4 = y2 * y2
      val f = yc * (B0 + y2 * (B1 + y4 * (B2 + B3 * y2 + B4 * y4))) - y
      val fder = B0 + y2 * (C1 + y4 * (C2 + C3 * y2 + C4 * y4))
      val tol = f / fder
      yc -= tol
      if (math.abs(tol) < 1e-11) converged = true
      i -= 1
    }
    if (!converged) return err
    val y2 = yc * yc
    (x / (A0 + y2 * (A1 + y2 * (A2 + y2 * y2 * y2 * (A3 + y2 * A4)))), yc)
  }
}

/** Natural Earth II. */
final case class Natearth2Kernel(override val ell: Ellipsoid,
                                 override val lam0: Double = 0.0,
                                 override val x0: Double = 0.0,
                                 override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val A0 = 0.84719; private val A1 = -0.13063
  private val A2 = -0.04515; private val A3 = 0.05494
  private val A4 = -0.02326; private val A5 = 0.00331
  private val B0 = 1.01183; private val B1 = -0.02625
  private val B2 = 0.01926; private val B3 = -0.00396
  private val C1 = 9 * B1; private val C2 = 11 * B2; private val C3 = 13 * B3
  private val MaxY = 0.84719 * 0.535117535153096 * math.Pi
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val p2 = phi * phi; val p4 = p2 * p2; val p6 = p2 * p4
    (lam * (A0 + A1 * p2 + p6 * p6 * (A2 + A3 * p2 + A4 * p4 + A5 * p6)),
      phi * (B0 + p4 * p4 * (B1 + B2 * p2 + B3 * p4)))
  }
  protected def unproject(x: Double, yIn: Double): (Double, Double) = {
    val y = math.max(-MaxY, math.min(MaxY, yIn))
    var yc = y
    var i = 100
    var converged = false
    while (i > 0 && !converged) {
      val y2 = yc * yc; val y4 = y2 * y2
      val f = yc * (B0 + y4 * y4 * (B1 + B2 * y2 + B3 * y4)) - y
      val fder = B0 + y4 * y4 * (C1 + C2 * y2 + C3 * y4)
      val tol = f / fder
      yc -= tol
      if (math.abs(tol) < 1e-11) converged = true
      i -= 1
    }
    if (!converged) return err
    val y2 = yc * yc; val y4 = y2 * y2; val y6 = y2 * y4
    (x / (A0 + A1 * y2 + y6 * y6 * (A2 + A3 * y2 + A4 * y4 + A5 * y6)), yc)
  }
}

/** Patterson cylindrical. */
final case class PattersonKernel(override val ell: Ellipsoid,
                                 override val lam0: Double = 0.0,
                                 override val x0: Double = 0.0,
                                 override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val K1 = 1.0148; private val K2 = 0.23185
  private val K3 = -0.14499; private val K4 = 0.02406
  private val C2 = 5.0 * K2; private val C3 = 7.0 * K3; private val C4 = 9.0 * K4
  private val MaxY = 1.790857183
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val p2 = phi * phi
    (lam, phi * (K1 + p2 * p2 * (K2 + p2 * (K3 + K4 * p2))))
  }
  protected def unproject(x: Double, yIn: Double): (Double, Double) = {
    // Newton starts from the unclamped y, targets the clamped one
    var yc = yIn
    val y = math.max(-MaxY, math.min(MaxY, yIn))
    var i = 100
    var converged = false
    while (i > 0 && !converged) {
      val y2 = yc * yc
      val f = yc * (K1 + y2 * y2 * (K2 + y2 * (K3 + K4 * y2))) - y
      val fder = K1 + y2 * y2 * (C2 + y2 * (C3 + C4 * y2))
      val tol = f / fder
      yc -= tol
      if (math.abs(tol) < 1e-11) converged = true
      i -= 1
    }
    if (!converged) err else (x, yc)
  }
}

/** Putnins P2. */
final case class Putp2Kernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Cx = 1.89490; private val Cy = 1.71848
  private val Cp = 0.6141848493043784
  private val PiDiv3 = 1.0471975511965977
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val p = Cp * math.sin(phiIn)
    val p2 = phiIn * phiIn
    var phi = phiIn * (0.615709 + p2 * (0.00909953 + p2 * 0.0046292))
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      val c = math.cos(phi); val s = math.sin(phi)
      val v = (phi + s * (c - 1.0) - p) / (1.0 + c * (c - 1.0) - s * s)
      phi -= v
      if (math.abs(v) < 1e-10) converged = true
      i -= 1
    }
    if (!converged) phi = if (phi < 0) -PiDiv3 else PiDiv3
    (Cx * lam * (math.cos(phi) - 0.5), Cy * math.sin(phi))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi0 = aasin(y / Cy)
    val c = math.cos(phi0)
    (x / (Cx * (c - 0.5)),
      aasin((phi0 + math.sin(phi0) * (c - 1.0)) / Cp))
  }
}

/** Putnins P3 / P3' (A = 4/π² or 2/π²). */
final case class Putp3Kernel(override val ell: Ellipsoid, aa: Double,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val C = 0.79788456
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (C * lam * (1.0 - aa * phi * phi), C * phi)
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = y / C
    (x / (C * (1.0 - aa * phi * phi)), phi)
  }
}
object Putp3Kernel {
  private val RPiSq = 0.1013211836
  def putp3(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Putp3Kernel(ell, 4.0 * RPiSq, lam0, x0, y0)
  def putp3p(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Putp3Kernel(ell, 2.0 * RPiSq, lam0, x0, y0)
}

/** Putnins P4' / Werenskiold I. */
final case class Putp4pKernel(override val ell: Ellipsoid,
                              cx: Double, cy: Double,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    var phi = aasin(0.883883476 * math.sin(phiIn))
    var x = cx * lam * math.cos(phi)
    phi *= 0.333333333333333
    x /= math.cos(phi)
    (x, cy * math.sin(phi))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var phi = aasin(y / cy)
    var lam = x * math.cos(phi) / cx
    phi *= 3.0
    lam /= math.cos(phi)
    (lam, aasin(1.13137085 * math.sin(phi)))
  }
}
object Putp4pKernel {
  def putp4p(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Putp4pKernel(ell, 0.874038744, 3.883251825, lam0, x0, y0)
  def weren(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Putp4pKernel(ell, 1.0, 4.442882938, lam0, x0, y0)
}

/** Putnins P5 / P5'. */
final case class Putp5Kernel(override val ell: Ellipsoid,
                             aa: Double, bb: Double,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val C = 1.01346; private val D = 1.2158542
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (C * lam * (aa - bb * math.sqrt(1.0 + D * phi * phi)), C * phi)
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = y / C
    (x / (C * (aa - bb * math.sqrt(1.0 + D * phi * phi))), phi)
  }
}

/** Putnins P6 / P6'. */
final case class Putp6Kernel(override val ell: Ellipsoid,
                             cx: Double, cy: Double,
                             aa: Double, bb: Double, dd: Double,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val ConPole = 1.732050807568877
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val p = bb * math.sin(phiIn)
    var phi = phiIn * 1.10265779
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      val r = math.sqrt(1.0 + phi * phi)
      val v = ((aa - r) * phi - math.log(phi + r) - p) / (aa - 2.0 * r)
      phi -= v
      if (math.abs(v) < 1e-10) converged = true
      i -= 1
    }
    val r = if (!converged) { phi = if (p < 0) -ConPole else ConPole; 2.0 }
            else math.sqrt(1.0 + phi * phi)
    (cx * lam * (dd - r), cy * phi)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val phi = y / cy
    val r = math.sqrt(1.0 + phi * phi)
    (x / (cx * (dd - r)),
      aasin(((aa - r) * phi - math.log(phi + r)) / bb))
  }
}
object Putp6Kernel {
  def putp6(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Putp6Kernel(ell, 1.01346, 0.91910, 4.0, 2.1471437182129378784, 2.0,
      lam0, x0, y0)
  def putp6p(ell: Ellipsoid, lam0: Double, x0: Double, y0: Double) =
    Putp6Kernel(ell, 0.44329, 0.80404, 6.0, 5.61125, 3.0, lam0, x0, y0)
}

/** McBryde–Thomas flat-polar parabolic. */
final case class MbtfppKernel(override val ell: Ellipsoid,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val CSy = 0.95257934441568037152
  private val FXC = 0.92582009977255146156
  private val FYC = 3.40168025708304504493
  private val C23 = 0.66666666666666666666
  private val C13 = 0.33333333333333333333
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val phi = math.asin(CSy * math.sin(phiIn))
    (FXC * lam * (2.0 * math.cos(C23 * phi) - 1.0), FYC * math.sin(C13 * phi))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var phi = y / FYC
    if (math.abs(phi) >= 1.0) {
      if (math.abs(phi) > 1.0000001) return err
      phi = if (phi < 0) -M.HalfPi else M.HalfPi
    } else phi = math.asin(phi)
    phi *= 3.0
    val lam = x / (FXC * (2.0 * math.cos(C23 * phi) - 1.0))
    var s = math.sin(phi) / CSy
    if (math.abs(s) >= 1.0) {
      if (math.abs(s) > 1.0000001) return err
      s = if (s < 0) -M.HalfPi else M.HalfPi
      return (lam, s)
    }
    (lam, math.asin(s))
  }
}

/** McBryde–Thomas flat-polar quartic. */
final case class MbtfpqKernel(override val ell: Ellipsoid,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val C = 1.70710678118654752440
  private val RC = 0.58578643762690495119
  private val FYC = 1.87475828462269495505
  private val RYC = 0.53340209679417701685
  private val FXC = 0.31245971410378249250
  private val RXC = 3.20041258076506210122
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val c = C * math.sin(phiIn)
    var phi = phiIn
    var i = 20
    var converged = false
    while (i > 0 && !converged) {
      val th1 = (math.sin(0.5 * phi) + math.sin(phi) - c) /
        (0.5 * math.cos(0.5 * phi) + math.cos(phi))
      phi -= th1
      if (math.abs(th1) < 1e-7) converged = true
      i -= 1
    }
    (FXC * lam * (1.0 + 2.0 * math.cos(phi) / math.cos(0.5 * phi)),
      FYC * math.sin(0.5 * phi))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    var t = 0.0
    var phi = RYC * y
    if (math.abs(phi) > 1.0) {
      if (math.abs(phi) > 1.000001) return err
      else if (phi < 0) { t = -1.0; phi = -math.Pi }
      else { t = 1.0; phi = math.Pi }
    } else { t = phi; phi = 2.0 * math.asin(phi) }
    val lam = RXC * x / (1.0 + 2.0 * math.cos(phi) / math.cos(0.5 * phi))
    var s = RC * (t + math.sin(phi))
    if (math.abs(s) > 1.0) {
      if (math.abs(s) > 1.000001) return err
      s = if (s < 0) -M.HalfPi else M.HalfPi
      return (lam, s)
    }
    (lam, math.asin(s))
  }
}

/** McBryde–Thomas flat-pole sine No. 2. */
final case class MbtFpsKernel(override val ell: Ellipsoid,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val C1 = 0.45503; private val C2 = 1.36509; private val C3 = 1.41546
  private val Cx = 0.22248; private val Cy = 1.44492
  private val C12 = 0.33333333333333333333333333
  private def aasin(x: Double) = math.asin(math.max(-1.0, math.min(1.0, x)))
  protected def project(lam: Double, phiIn: Double): (Double, Double) = {
    val k = C3 * math.sin(phiIn)
    var phi = phiIn
    var i = 10
    var converged = false
    while (i > 0 && !converged) {
      val t0 = phi / C2
      val v = (C1 * math.sin(t0) + math.sin(phi) - k) /
        (C12 * math.cos(t0) + math.cos(phi))
      phi -= v
      if (math.abs(v) < 1e-7) converged = true
      i -= 1
    }
    val t = phi / C2
    (Cx * lam * (1.0 + 3.0 * math.cos(phi) / math.cos(t)), Cy * math.sin(t))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = {
    val t = aasin(y / Cy)
    val phi = C2 * t
    (x / (Cx * (1.0 + 3.0 * math.cos(phi) / math.cos(t))),
      aasin((C1 * math.sin(t) + math.sin(phi)) / C3))
  }
}

/** Transverse central cylindrical (forward only). */
final case class TccKernel(override val ell: Ellipsoid,
                           override val lam0: Double = 0.0,
                           override val x0: Double = 0.0,
                           override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val b = math.cos(phi) * math.sin(lam)
    val bt = 1.0 - b * b
    if (bt < 1e-10) err
    else (b / math.sqrt(bt), math.atan2(math.tan(phi), math.cos(lam)))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Transverse cylindrical equal-area. */
final case class TceaKernel(override val ell: Ellipsoid,
                            lat0: Double = 0.0, k0: Double = 1.0,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (math.cos(phi) * math.sin(lam) / k0,
      k0 * (math.atan2(math.tan(phi), math.cos(lam)) - lat0))
  protected def unproject(xIn: Double, yIn: Double): (Double, Double) = {
    val y = yIn / k0 + lat0
    val x = xIn * k0
    val t = math.sqrt(math.max(0.0, 1.0 - x * x))
    (math.atan2(x, t * math.cos(y)),
      math.asin(math.max(-1.0, math.min(1.0, t * math.sin(y)))))
  }
}

/** Aitoff / Winkel Tripel (shared Newton inverse). */
final case class AitoffKernel(override val ell: Ellipsoid,
                              winkel: Boolean, cosphi1: Double = 0.0,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val c = 0.5 * lam
    val d = math.acos(math.min(1.0, math.max(-1.0, math.cos(phi) * math.cos(c))))
    var x = 0.0; var y = 0.0
    if (d != 0.0) {
      val rsd = 1.0 / math.sin(d)
      x = 2.0 * d * math.cos(phi) * math.sin(c) * rsd
      y = rsd * d * math.sin(phi)
    }
    if (winkel) {
      x = (x + lam * cosphi1) * 0.5
      y = (y + phi) * 0.5
    }
    (x, y)
  }

  protected def unproject(x0v: Double, y0v: Double): (Double, Double) = {
    val Epsilon = 1e-12
    if (math.abs(x0v) < Epsilon && math.abs(y0v) < Epsilon) return (0.0, 0.0)
    var phi = y0v; var lam = x0v
    var round = 0
    var outerDone = false
    var iter = 0
    while (!outerDone) {
      iter = 0
      var innerDone = false
      while (!innerDone) {
        val sl = math.sin(lam * 0.5); val cl = math.cos(lam * 0.5)
        val sp = math.sin(phi); val cp = math.cos(phi)
        var dv = cp * cl
        val cc = 1.0 - dv * dv
        val denom = math.pow(cc, 1.5)
        if (denom == 0) return err
        dv = math.acos(math.min(1.0, math.max(-1.0, dv))) / denom
        var f1 = 2.0 * dv * cc * cp * sl
        var f2 = dv * cc * sp
        var f1p = 2.0 * (sl * cl * sp * cp / cc - dv * sp * sl)
        var f1l = cp * cp * sl * sl / cc + dv * cp * cl * sp * sp
        var f2p = sp * sp * cl / cc + dv * sl * sl * cp
        var f2l = 0.5 * (sp * cp * sl / cc - dv * sp * cp * cp * sl * cl)
        if (winkel) {
          f1 = 0.5 * (f1 + lam * cosphi1)
          f2 = 0.5 * (f2 + phi)
          f1p *= 0.5
          f1l = 0.5 * (f1l + cosphi1)
          f2p = 0.5 * (f2p + 1.0)
          f2l *= 0.5
        }
        f1 -= x0v; f2 -= y0v
        var dp = f1p * f2l - f2p * f1l
        val dl0 = (f2 * f1p - f1 * f2p) / dp
        dp = (f1 * f2l - f2 * f1l) / dp
        val dl = dl0 % math.Pi // C fmod: sign follows the dividend
        phi -= dp; lam -= dl
        iter += 1
        if (!((math.abs(dp) > Epsilon || math.abs(dl) > Epsilon) && iter <= 10))
          innerDone = true
      }
      if (phi > M.HalfPi) phi -= 2.0 * (phi - M.HalfPi)
      if (phi < -M.HalfPi) phi -= 2.0 * (phi + M.HalfPi)
      if (math.abs(math.abs(phi) - M.HalfPi) < Epsilon && !winkel) lam = 0.0
      // re-project the solution and compare against the target
      val cHalf = 0.5 * lam
      val d = math.acos(math.min(1.0, math.max(-1.0, math.cos(phi) * math.cos(cHalf))))
      var x = 0.0; var y = 0.0
      if (d != 0.0) {
        val rsd = 1.0 / math.sin(d)
        x = 2.0 * d * math.cos(phi) * math.sin(cHalf) * rsd
        y = rsd * d * math.sin(phi)
      }
      if (winkel) {
        x = (x + lam * cosphi1) * 0.5
        y = (y + phi) * 0.5
      }
      round += 1
      if (!((math.abs(x0v - x) > Epsilon || math.abs(y0v - y) > Epsilon) &&
            round <= 20)) outerDone = true
    }
    if (iter > 10 && round > 20) err else (lam, phi)
  }
}

/** Boggs eumorphic (forward only). */
final case class BoggsKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val FXC = 2.00276; private val FXC2 = 1.11072; private val FYC = 0.49931
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    var theta = phi
    var x = 0.0
    if (math.abs(math.abs(phi) - M.HalfPi) < 1e-7) x = 0.0
    else {
      val c = math.sin(theta) * math.Pi
      var i = 20
      var converged = false
      while (i > 0 && !converged) {
        val th1 = (theta + math.sin(theta) - c) / (1.0 + math.cos(theta))
        theta -= th1
        if (math.abs(th1) < 1e-7) converged = true
        i -= 1
      }
      theta *= 0.5
      x = FXC * lam / (1.0 / math.cos(phi) + FXC2 / math.cos(theta))
    }
    (x, FYC * (phi + math.sqrt(2.0) * math.sin(theta)))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Denoyer semi-elliptical (forward only). */
final case class DenoyKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val C0 = 0.95
  private val C1 = -0.08333333333333333333
  private val C3 = 0.00166666666666666666
  private val D1 = 0.9; private val D5 = 0.03
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val al = math.abs(lam)
    (lam * math.cos((C0 + al * (C1 + al * al * C3)) *
      (phi * (D1 + D5 * phi * phi * phi * phi))), phi)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Nicolosi globular (forward only). */
final case class NicolKernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Eps = 1e-10
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    if (math.abs(lam) < Eps) (0.0, phi)
    else if (math.abs(phi) < Eps) (lam, 0.0)
    else if (math.abs(math.abs(lam) - M.HalfPi) < Eps)
      (lam * math.cos(phi), M.HalfPi * math.sin(phi))
    else if (math.abs(math.abs(phi) - M.HalfPi) < Eps) (0.0, phi)
    else {
      val tb = M.HalfPi / lam - lam / M.HalfPi
      val c = phi / M.HalfPi
      val sp = math.sin(phi)
      val d = (1 - c * c) / (sp - c)
      var r2 = tb / d
      r2 *= r2
      val m = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
      val n = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
      var x = math.cos(phi)
      x = math.sqrt(m * m + x * x / (1.0 + r2))
      x = M.HalfPi * (m + (if (lam < 0) -x else x))
      var y = math.sqrt(n * n - (sp * sp / r2 + d * sp - 1.0) / (1.0 + 1.0 / r2))
      y = M.HalfPi * (n + (if (phi < 0) y else -y))
      (x, y)
    }
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** August epicycloidal (forward only). */
final case class AugustKernel(override val ell: Ellipsoid,
                              override val lam0: Double = 0.0,
                              override val x0: Double = 0.0,
                              override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Mc = 1.333333333333333
  protected def project(lamIn: Double, phi: Double): (Double, Double) = {
    val t = math.tan(0.5 * phi)
    val c1 = math.sqrt(1.0 - t * t)
    val lam = lamIn * 0.5
    val c = 1.0 + c1 * math.cos(lam)
    val x1 = math.sin(lam) * c1 / c
    val y1 = t / c
    val x12 = x1 * x1; val y12 = y1 * y1
    (Mc * x1 * (3.0 + x12 - 3.0 * y12), Mc * y1 * (3.0 + 3.0 * x12 - y12))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Laskowski (forward only). */
final case class LaskKernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val l2 = lam * lam; val p2 = phi * phi
    (lam * (0.975534 + p2 * (-0.119161 + l2 * -0.0143059 + p2 * -0.0547009)),
      phi * (1.00384 + l2 * (0.0802894 + p2 * -0.0285500 + l2 * 0.000199025) +
        p2 * (0.0998909 + p2 * -0.0491032)))
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Ginsburg VIII (forward only). */
final case class Gins8Kernel(override val ell: Ellipsoid,
                             override val lam0: Double = 0.0,
                             override val x0: Double = 0.0,
                             override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Cl = 0.000952426; private val Cp = 0.162388
  private val C12 = 0.08333333333333333
  protected def project(lam: Double, phi: Double): (Double, Double) = {
    val t = phi * phi
    val y = phi * (1.0 + t * C12)
    val t2 = lam * lam
    (lam * (1.0 - Cp * t) * (0.87 - Cl * t2 * t2), y)
  }
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}

/** Larrivée (forward only). */
final case class LarrKernel(override val ell: Ellipsoid,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  private val Sixth = 0.16666666666666666
  protected def project(lam: Double, phi: Double): (Double, Double) =
    (0.5 * lam * (1.0 + math.sqrt(math.cos(phi))),
      phi / (math.cos(0.5 * phi) * math.cos(Sixth * lam)))
  protected def unproject(x: Double, y: Double): (Double, Double) = err
}
