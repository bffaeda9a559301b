package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** Icosahedral Snyder Equal Area (Snyder 1992): forward over the 20
  * icosahedron faces with plane / di / dd / hex output modes, plus the
  * planar inverse (Newton on the spherical-triangle area) for the
  * standard and polar orientations (behavioral reference:
  * /root/reference/src/projections/isea.cpp). */
final case class IseaKernel(override val ell: Ellipsoid,
                            orientPole: Boolean, orientSet: Boolean,
                            oAzIn: Double, oLonIn: Option[Double],
                            oLatIn: Option[Double],
                            mode: String, resolution: Int, aperture: Int,
                            override val lam0: Double = 0.0,
                            override val x0: Double = 0.0,
                            override val y0: Double = 0.0)
    extends ProjectionKernel(ell, lam0, x0, y0) {
  import IseaKernel._

  private val oLat = oLatIn.getOrElse(if (orientPole) M.HalfPi else StdLat)
  private val oLon = oLonIn.getOrElse(if (orientPole) 0.0 else StdLon)
  private val oAz = oAzIn

  // planar-inverse support: default planar options only
  private val invKind: Int = // 0 none, 1 standard, 2 polar
    if (mode == "plane" && oAz == 0.0 && aperture == 3 && resolution == 4) {
      if (oLat == StdLat && oLon == StdLon) 1
      else if (oLat == M.HalfPi && oLon == 0.0) 2
      else 0
    } else 0

  // meters-scale grid constants for the inverse
  private val r2: Double =
    if (ell.e > 0) {
      val a2 = ell.a * ell.a; val c2 = ell.b * ell.b
      val s = math.Pi * (2 * a2 + c2 / ell.e *
        math.log((1 + ell.e) / (1 - ell.e)))
      s / (4 * math.Pi)
    } else ell.a * ell.a
  private val rprime = RprimeOverR * math.sqrt(r2)
  private val rprime2x = 2 * rprime
  private val rprimeTang = rprime * Tang
  private val centerToBase = rprimeTang / 2
  private val triWidth = rprimeTang * Sqrt3
  private val rprime2Tan2g = rprimeTang * rprimeTang
  private val yOffsets = Array(-2 * centerToBase, -4 * centerToBase,
    -5 * centerToBase, -7 * centerToBase)
  private val xo = 2.5 * triWidth
  private val yo = -1.5 * centerToBase
  private val sxScale = 1.0 / triWidth
  private val syScale = 1.0 / (3 * centerToBase)

  // inverse orientation (revertOrientation pole)
  private val orientLat = if (invKind == 1) (ERad + FRad) / 2 else 0.0
  private val orientLon = if (invKind == 1) math.toRadians(-11.25) else 0.0
  private val cosOrientLat = math.cos(orientLat)
  private val sinOrientLat = math.sin(orientLat)

  // ---- forward ----

  /** Snyder's oblique pole rotation (mpawm 5-7/5-8b) */
  private def ctran(lat: Double, lon: Double): (Double, Double) = {
    val alpha = oLat; val beta = oLon + math.Pi
    val dlam = lon - beta
    val cosP = math.cos(lat); val sinP = math.sin(lat)
    val cosA = math.cos(alpha); val sinA = math.sin(alpha)
    val cosDl = math.cos(dlam); val sinDl = math.sin(dlam)
    val sinPhip = sinA * sinP - cosA * cosP * cosDl
    val lpB = math.atan2(cosP * sinDl, sinA * cosP * cosDl + cosA * sinP)
    var lambdap = lpB + beta
    lambdap = lambdap % M.TwoPi
    while (lambdap > math.Pi) lambdap -= M.TwoPi
    while (lambdap < -math.Pi) lambdap += M.TwoPi
    lambdap -= (-oAz + oLat0Lon)
    lambdap = lambdap % M.TwoPi
    while (lambdap > math.Pi) lambdap -= M.TwoPi
    while (lambdap < -math.Pi) lambdap += M.TwoPi
    (safeAsin(sinPhip), lambdap)
  }
  private def oLat0Lon = oLon

  /** Snyder forward on face; returns (face, x, y) or null if impossible */
  private def snyderForward(lat: Double, lon: Double): (Int, Double, Double) = {
    val sinLat = math.sin(lat); val cosLat = math.cos(lat)
    var i = 0
    while (i < 20) {
      val cLat = FaceLat(i); val cLon = FaceLon(i)
      val sLat0 = math.sin(cLat); val cLat0 = math.cos(cLat)
      val dLon = lon - cLon
      val cosLatCosLon = cosLat * math.cos(dLon)
      val cosZ = sLat0 * sinLat + cLat0 * cosLatCosLon
      val z = safeAcos(cosZ)
      if (z <= Sdc2vos + 0.000005) {
        var az = math.atan2(cosLat * math.sin(dLon),
          cLat0 * sinLat - sLat0 * cosLatCosLon)
        az -= azAdjustment(i)
        if (az < 0.0) az += 2.0 * math.Pi
        var azAdjustMultiples = 0
        while (az < 0.0) { az += Deg120; azAdjustMultiples -= 1 }
        while (az > Deg120 + 2.220446049250313e-16) {
          az -= Deg120; azAdjustMultiples += 1
        }
        val cosAz = math.cos(az); val sinAz = math.sin(az)
        val q = math.atan2(Tang, cosAz + sinAz * CotTheta)
        if (z <= q + 0.000005) {
          val h = math.acos(math.max(-1.0, math.min(1.0,
            sinAz * SinGcosSdc - cosAz * CosG)))
          val ag = az + G36 + h - math.Pi
          var azprime = math.atan2(2.0 * ag,
            RprimeOverR * RprimeOverR * Tang * Tang - 2.0 * ag * CotTheta)
          val dprime = RprimeOverR * Tang /
            (math.cos(azprime) + math.sin(azprime) * CotTheta)
          val f = dprime / (2.0 * RprimeOverR * math.sin(q / 2.0))
          val rho = 2.0 * RprimeOverR * f * math.sin(z / 2.0)
          azprime += Deg120 * azAdjustMultiples
          return (i, rho * math.sin(azprime), rho * math.cos(azprime))
        }
      }
      i += 1
    }
    null
  }

  private def triangleXY(triIn: Int): (Double, Double) = {
    val tri = triIn % 20
    var cx = TableG * ((tri % 5) - 2) * 2.0
    if (tri > 9) cx += TableG
    val cy = (tri / 5) match {
      case 0 => 5.0 * TableH
      case 1 => TableH
      case 2 => -TableH
      case _ => -5.0 * TableH
    }
    (cx * RprimeOverR, cy * RprimeOverR)
  }

  private def rotateDeg(x: Double, y: Double, degrees: Double): (Double, Double) = {
    var rad = -degrees * math.Pi / 180.0
    while (rad >= 2.0 * math.Pi) rad -= 2.0 * math.Pi
    while (rad <= -2.0 * math.Pi) rad += 2.0 * math.Pi
    (x * math.cos(rad) + y * math.sin(rad),
      -x * math.sin(rad) + y * math.cos(rad))
  }

  private final class Overflow extends RuntimeException

  /** hex binning; throws Overflow like the reference on huge resolutions */
  private def hexbin2(width: Double, x0v: Double, y0v: Double): (Long, Long) = {
    var x = x0v / math.cos(30 * math.Pi / 180.0)
    var y = y0v - x / 2.0
    if (width == 0) throw new Overflow
    x /= width
    y /= width
    val z = -x - y
    val rx = math.floor(x + 0.5); var ix = math.round(rx)
    val ry = math.floor(y + 0.5); var iy = math.round(ry)
    val rz = math.floor(z + 0.5); var iz = math.round(rz)
    if (math.abs(ix.toDouble + iy) > Int.MaxValue ||
        math.abs(ix.toDouble + iy + iz) > Int.MaxValue) throw new Overflow
    val s = ix + iy + iz
    if (s != 0) {
      val adx = math.abs(rx - x); val ady = math.abs(ry - y)
      val adz = math.abs(rz - z)
      if (adx >= ady && adx >= adz) ix -= s
      else if (ady >= adx && ady >= adz) iy -= s
      else iz -= s
    }
    // hex_xy on iso coords (x, y, z)
    val hy = if (ix >= 0) -iy - (ix + 1) / 2 else -iy - ix / 2
    (ix, hy)
  }

  private def hexIso(x: Long, y: Long): (Long, Long, Long) = {
    val ny = if (x >= 0) -y - (x + 1) / 2 else -y - x / 2
    (x, ny, -x - ny)
  }

  /** plane coords -> quad + rotated in-quad coords (isea_ptdd) */
  private def ptdd(tri: Int, xIn: Double, yIn: Double): (Int, Double, Double) = {
    val downtri = (tri / 5) % 2 == 1
    val quad = (tri % 5) + (tri / 10) * 5 + 1
    var (x, y) = rotateDeg(xIn, yIn, if (downtri) 240.0 else 60.0)
    if (downtri) { x += 0.5; y += Cos30 }
    (quad, x, y)
  }

  private def dddiAp3odd(quadIn: Int, x: Double, y: Double): (Int, Double, Double) = {
    val sidelength = (math.pow(2.0, resolution) + 1.0) / 2.0
    val hexwidth = math.cos(math.Pi / 6.0) / sidelength
    val maxcoord = math.round(sidelength * 2.0)
    val (hx0, hy0) = hexbin2(hexwidth, x, y)
    val (hx, hy, hz) = hexIso(hx0, hy0)
    var d = hx - hz
    var i = hx + hy + hy
    var quad = quadIn
    if (quad <= 5) {
      if (d == 0 && i == maxcoord) { quad = 0; d = 0; i = 0 }
      else if (i == maxcoord) {
        quad += 1; if (quad == 6) quad = 1
        i = maxcoord - d; d = 0
      } else if (d == maxcoord) { quad += 5; d = 0 }
    } else {
      if (i == 0 && d == maxcoord) { quad = 11; d = 0; i = 0 }
      else if (d == maxcoord) {
        quad += 1; if (quad == 11) quad = 6
        d = maxcoord - i; i = 0
      } else if (i == maxcoord) { quad = (quad - 4) % 5; i = 0 }
    }
    (quad, d.toDouble, i.toDouble)
  }

  private def dddi(quadIn: Int, x: Double, y: Double): (Int, Double, Double) = {
    if (aperture == 3 && resolution % 2 != 0) return dddiAp3odd(quadIn, x, y)
    val sidelength: Long =
      if (aperture > 0) {
        val sd = math.pow(aperture, resolution / 2.0)
        if (math.abs(sd) > Int.MaxValue) throw new Overflow
        math.round(sd)
      } else resolution.toLong
    if (sidelength == 0) throw new Overflow
    val hexwidth = 1.0 / sidelength
    val (vx, vy) = rotateDeg(x, y, -30.0)
    val (hx0, hy0) = hexbin2(hexwidth, vx, vy)
    var (hx, hy, hz) = hexIso(hx0, hy0)
    var quad = quadIn
    if (quad <= 5) {
      if (hx == 0 && hz == -sidelength) { quad = 0; hz = 0; hy = 0; hx = 0 }
      else if (hz == -sidelength) {
        quad += 1; if (quad == 6) quad = 1
        hy = sidelength - hx; hz = hx - sidelength; hx = 0
      } else if (hx == sidelength) { quad += 5; hy = -hz; hx = 0 }
    } else {
      if (hz == 0 && hx == sidelength) { quad = 11; hx = 0; hy = 0; hz = 0 }
      else if (hx == sidelength) {
        quad += 1; if (quad == 11) quad = 6
        hx = hy + sidelength; hy = 0; hz = -hx
      } else if (hy == -sidelength) { quad -= 4; hy = 0; hz = -hx }
    }
    (quad, hx.toDouble, -hz.toDouble)
  }

  protected def project(lamIn: Double, phiIn: Double): (Double, Double) = {
    val (lat, lon) = ctran(phiIn, lamIn)
    val sf = snyderForward(lat, lon)
    if (sf == null) return err
    val (tri, x0v, y0v) = sf
    try {
      if (mode == "plane") {
        var x = x0v; var y = y0v
        if ((tri / 5) % 2 == 1) { x = -x; y = -y }
        val (tcx, tcy) = triangleXY(tri)
        (x + tcx, y + tcy)
      } else {
        var x = x0v * IseaScale + 0.5
        var y = y0v * IseaScale + 2.0 * 0.14433756729740644112
        mode match {
          case "dd" =>
            val (_, dx, dy) = ptdd(tri, x, y)
            (dx, dy)
          case "di" =>
            val (q0, px, py) = ptdd(tri, x, y)
            val (_, dx, dy) = dddi(q0, px, py)
            (dx, dy)
          case _ => // hex
            val (q0, px, py) = ptdd(tri, x, y)
            val (quad, dx, dy) = dddi(q0, px, py)
            if (dx < (Int.MinValue >> 4) || dx > (Int.MaxValue >> 4))
              throw new Overflow
            ((dx.toInt * 16 + quad).toDouble, dy)
        }
      }
    } catch { case _: Overflow => err }
  }

  // ---- inverse (plane modes, standard/polar orientations) ----

  private def faceOrientation(face: Int): Double =
    if (face <= 4 || (face >= 10 && face <= 14)) 0.0 else math.Pi

  private def revertOrientation(lat: Double, lonIn: Double): (Double, Double) = {
    val pp = math.toRadians(1e-5)
    val lon = if (lat < -M.HalfPi + pp || lat > M.HalfPi - pp) 0.0 else lonIn
    if (orientLat != 0.0 || orientLon != 0.0) {
      val sinLat = math.sin(lat); val cosLat = math.cos(lat)
      val sinLon = math.sin(lon); val cosLon = math.cos(lon)
      val cosLonCosLat = cosLon * cosLat
      (math.asin(math.max(-1.0, math.min(1.0,
        sinLat * cosOrientLat - cosLonCosLat * sinOrientLat))),
        math.atan2(sinLon * cosLat,
          cosLonCosLat * cosOrientLat + sinLat * sinOrientLat) - orientLon)
    } else (lat, lon)
  }

  /** in-face planar point -> lat/lon (Newton on spherical area) */
  private def icoToSphere(face: Int, cx: Double, cy: Double): (Double, Double) = {
    val Precision = math.toRadians(1e-11)
    val AzMax = math.toRadians(120.0)
    var az = math.atan2(cx, cy)
    val rho = math.sqrt(cx * cx + cy * cy)
    var azAdj = faceOrientation(face)
    az += azAdj
    while (az < 0) { azAdj += AzMax; az += AzMax }
    while (az > AzMax) { azAdj -= AzMax; az -= AzMax }
    val sinAz = math.sin(az); val cosAz = math.cos(az)
    val cotAz = cosAz / sinAz
    val area = rprime2Tan2g / (2 * (cotAz + CotTheta))
    var deltaAz = 10 * Precision
    val target = area / r2 - WestVertexLon
    var azEarth = az
    while (math.abs(deltaAz) > Precision) {
      val sinAzE = math.sin(azEarth); val cosAzE = math.cos(azEarth)
      val h = math.acos(math.max(-1.0, math.min(1.0,
        sinAzE * SinGcosSdc - cosAzE * CosG)))
      val fAz = target - h - azEarth
      val f2Az = (cosAzE * SinGcosSdc + sinAzE * CosG) / math.sin(h) - 1
      deltaAz = -fAz / f2Az
      azEarth += deltaAz
    }
    val sinAzE = math.sin(azEarth); val cosAzE = math.cos(azEarth)
    val q = math.atan2(Tang, cosAzE + sinAzE * CotTheta)
    val d = rprimeTang / (cosAz + sinAz * CotTheta)
    val f = d / (rprime2x * math.sin(q / 2))
    val z = 2 * math.asin(math.max(-1.0, math.min(1.0,
      rho / (rprime2x * f))))
    azEarth -= azAdj
    val sinLat0 = math.sin(FaceLat(face)); val cosLat0 = math.cos(FaceLat(face))
    val sinZ = math.sin(z); val cosZ = math.cos(z)
    val cosLat0SinZ = cosLat0 * sinZ
    val latSin = sinLat0 * cosZ + cosLat0SinZ * math.cos(azEarth)
    val lat = safeAsin(latSin)
    val lon = FaceLon(face) +
      math.atan2(math.sin(azEarth) * cosLat0SinZ, cosZ - sinLat0 * math.sin(lat))
    revertOrientation(lat, lon)
  }

  protected def unproject(xu: Double, yu: Double): (Double, Double) = {
    if (invKind == 0) return err
    val Epsilon = 1e-11
    var px = xu * ell.a + xo
    val py = yu * ell.a + yo
    val sr = -Sin60; val cr = 0.5
    if (px < 0 || (px < triWidth / 2 && py < 0 && py * cr < px * sr))
      px += 5 * triWidth
    val shearX = 1.0 / Sqrt3
    val yp = -(px * sr + py * cr)
    var x = (px * cr - py * sr + yp * shearX) * sxScale
    var y = yp * syScale
    if (x < 0 || (y > x && x < 5 - Epsilon)) x += Epsilon
    else if (x > 5 || (y < x && x > 0 + Epsilon)) x -= Epsilon
    if (y < 0 || (x > y && y < 6 - Epsilon)) y += Epsilon
    else if (y > 6 || (x < y && y > 0 + Epsilon)) y -= Epsilon
    var face = 0
    if (x >= 0 && x <= 5 && y >= 0 && y <= 6) {
      val ix = math.max(0, math.min(4, x.toInt))
      val iy = math.max(0, math.min(5, y.toInt))
      if (iy == ix || iy == ix + 1) {
        val rhombus = ix + iy
        val top = x - ix > y - iy
        val f = rhombus match {
          case 0 => if (top) 0 else 5
          case 2 => if (top) 1 else 6
          case 4 => if (top) 2 else 7
          case 6 => if (top) 3 else 8
          case 8 => if (top) 4 else 9
          case 1 => if (top) 10 else 15
          case 3 => if (top) 11 else 16
          case 5 => if (top) 12 else 17
          case 7 => if (top) 13 else 18
          case 9 => if (top) 14 else 19
          case _ => -1
        }
        face = f + 1
      }
    }
    if (face == 0) return err
    val fy = (face - 1) / 5; val fx = (face - 1) - 5 * fy
    val rx = px - (2 * fx + fy / 2 + 1) * triWidth / 2 // fy/2: int division
    val ry = py - (yOffsets(fy) + 3 * centerToBase)
    val (lat, lon0) = icoToSphere(face - 1, rx, ry)
    var lon = lon0
    if (lon < -math.Pi - Epsilon) lon += 2 * math.Pi
    else if (lon > math.Pi + Epsilon) lon -= 2 * math.Pi
    (lon, lat)
  }
}

object IseaKernel {
  private val Sqrt3 = 1.73205080756887729352744634150587236694280525381038
  private val Sin60 = Sqrt3 / 2.0
  private val Cos30 = Sqrt3 / 2.0
  private val Deg120 = 2.09439510239319549229
  private val IseaScale = 0.8301572857837594396028083
  private val ERad = 0.91843818701052843323
  private val FRad = 0.18871053078356206978
  private val Sdc2vos = 0.6523581397843681859886783
  private val Tang = 0.76393202250021030358019673567
  private val Tan30 = 0.57735026918962576450914878
  private val CotTheta = 1.0 / Tan30
  private val CosG = 0.80901699437494742410229341718281905886
  private val SinG = 0.587785252292473129168705954639072768597652
  private val CosSdc = 0.7946544722917661229596057297879189448539
  private val SinGcosSdc = SinG * CosSdc
  private val TableG = Tang * Sin60
  private val TableH = 0.25 * Tang
  private val RprimeOverR = 0.9103832815095032
  private val StdLat = 1.01722196792335072101
  private val StdLon = 0.19634954084936207740
  private val G36 = math.toRadians(36.0)
  private val WestVertexLon = math.toRadians(-144.0)

  private val FaceLat: Array[Double] = Array(
    ERad, ERad, ERad, ERad, ERad,
    FRad, FRad, FRad, FRad, FRad,
    -FRad, -FRad, -FRad, -FRad, -FRad,
    -ERad, -ERad, -ERad, -ERad, -ERad)
  private val FaceLon: Array[Double] = Array[Double](
    -144, -72, 0, 72, 144,
    -144, -72, 0, 72, 144,
    -108, -36, 36, 108, 180,
    -108, -36, 36, 108, 180).map(math.toRadians)

  private def azAdjustment(triangle: Int): Double =
    if ((triangle >= 5 && triangle <= 9) || triangle == 15 || triangle == 16)
      math.Pi
    else if (triangle >= 17) -math.Pi
    else 0.0

  private val ArcEps = 1e-15
  private def safeAsin(t: Double): Double =
    if (math.abs(t) < ArcEps) 0.0
    else if (math.abs(t - 1.0) < ArcEps) math.Pi / 2
    else if (math.abs(t + 1.0) < ArcEps) -math.Pi / 2
    else math.asin(t)
  private def safeAcos(t: Double): Double =
    if (math.abs(t) < ArcEps) math.Pi / 2
    else if (math.abs(t + 1) < ArcEps) math.Pi
    else if (math.abs(t - 1) < ArcEps) 0.0
    else math.acos(t)
}
