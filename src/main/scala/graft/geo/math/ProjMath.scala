package graft.geo.math

/** Shared scalar math used by the projection kernels.
  *
  * Everything here is a pure function of doubles: this is the Scala
  * re-expression of PROJ's shared helper layer —
  * `adjlon` (/root/reference/src/adjlon.cpp), `pj_tsfn`
  * (/root/reference/src/tsfn.cpp:6), `pj_msfn`
  * (/root/reference/src/msfn.cpp:5), `pj_sinhpsi2tanphi`/`pj_phi2`
  * (/root/reference/src/phi2.cpp:10,124), and the auxiliary-latitude
  * machinery (/root/reference/src/latitudes.cpp:238-440).
  *
  * The methods are kept small and branch-light so the JIT can inline them
  * into whole-stage-codegen loops.
  */
object ProjMath {
  final val HalfPi  = math.Pi / 2.0

  /** PROJ's aasin/aacos (src/aasincos.cpp): arguments within ONE_TOL
    * (1+1e-14) of the domain clamp to the end value, anything beyond is
    * an ERROR — here NaN, the kernels' in-band failure channel.  Using a
    * bare clamp fabricates plausible coordinates for garbage planar
    * input; a bare strict check rejects 1-ulp round-trip noise the
    * reference accepts. */
  final val OneTol = 1.0 + 1e-14
  def aasin(v: Double): Double =
    if (math.abs(v) >= 1.0) {
      if (math.abs(v) > OneTol) Double.NaN
      else if (v < 0) -HalfPi else HalfPi
    } else math.asin(v)
  def aacos(v: Double): Double =
    if (math.abs(v) >= 1.0) {
      if (math.abs(v) > OneTol) Double.NaN
      else if (v < 0) math.Pi else 0.0
    } else math.acos(v)
  final val FortPi  = math.Pi / 4.0
  final val TwoPi   = math.Pi * 2.0
  final val TwoOverPi = 2.0 / math.Pi
  final val DegToRad = math.Pi / 180.0
  final val RadToDeg = 180.0 / math.Pi
  final val ArcSecToRad = DegToRad / 3600.0
  /** slack matching PROJ's PJ_EPS_LAT for latitude over-range clamping */
  final val EpsLat = 1e-12

  /** Wrap a longitude (radians) into (-pi, pi], letting values within 1e-12
    * of the dateline pass through unchanged to avoid sign flapping. */
  def adjlon(lon: Double): Double = {
    if (math.abs(lon) < math.Pi + 1e-12) lon
    else {
      val l = lon + math.Pi
      l - TwoPi * math.floor(l / TwoPi) - math.Pi
    }
  }

  /** ts(phi) = exp(-isometric latitude); Snyder (7-10). */
  def tsfn(phi: Double, sinphi: Double, e: Double): Double = {
    val cosphi = math.cos(phi)
    // exp(-asinh(tan phi)) written in the cancellation-free form per
    // hemisphere.
    val expPart = math.exp(e * atanh(e * sinphi))
    expPart * (if (sinphi > 0) cosphi / (1.0 + sinphi)
               else (1.0 - sinphi) / cosphi)
  }

  /** m(phi) = cos(phi)/sqrt(1 - es sin^2 phi). */
  def msfn(sinphi: Double, cosphi: Double, es: Double): Double =
    cosphi / math.sqrt(1.0 - es * sinphi * sinphi)

  def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  def asinh(x: Double): Double = {
    val y = math.abs(x)
    val r = math.log1p(y * (1.0 + y / (math.sqrt(y * y + 1.0) + 1.0)))
    if (x < 0) -r else r
  }

  /** Newton inversion of tau' = sinh(psi) -> tau = tan(phi)
    * (Karney 2011 eq. 7; the GeographicLib tauf algorithm). */
  def sinhpsi2tanphi(taup: Double, e: Double): Double = {
    val numit = 5
    // rel. error ~ e^2 eps, so 2 iterations suffice; 5 is belt+braces.
    val rooteps = math.sqrt(java.lang.Math.ulp(1.0))
    val tol = rooteps / 10.0
    val tmax = 2.0 / rooteps
    val e2m = 1.0 - e * e
    val stol = tol * math.max(1.0, math.abs(taup))
    var tau =
      if (math.abs(taup) > 70.0) taup * math.exp(e * atanh(e))
      else taup / e2m
    if (!(math.abs(tau) < tmax)) return tau // inf / nan passthrough
    var i = numit
    var done = false
    while (i > 0 && !done) {
      val tau1 = math.sqrt(1.0 + tau * tau)
      val sig = math.sinh(e * atanh(e * tau / tau1))
      val taupa = math.sqrt(1.0 + sig * sig) * tau - sig * tau1
      val dtau = (taup - taupa) * (1.0 + e2m * (tau * tau)) /
        (e2m * tau1 * math.sqrt(1.0 + taupa * taupa))
      tau += dtau
      if (!(math.abs(dtau) >= stol)) done = true
      i -= 1
    }
    tau
  }

  /** phi from ts = exp(-psi); Snyder's phi2 via the tau-Newton above. */
  def phi2(ts: Double, e: Double): Double =
    math.atan(sinhpsi2tanphi((1.0 / ts - ts) / 2.0, e))

  /** Horner evaluation of sum(p(i) x^i, i=0..n). */
  def polyval(x: Double, p: Array[Double], n: Int): Double = {
    var y = if (n < 0) 0.0 else p(n)
    var i = n
    while (i > 0) { i -= 1; y = y * x + p(i) }
    y
  }

  /** Clenshaw summation of sum(f(k) sin((2k+2) z), k=0..K-1), with z given
    * by its sine and cosine. */
  def clenshaw(sz: Double, cz: Double, f: Array[Double], kk: Int): Double = {
    var u0 = 0.0; var u1 = 0.0
    val x = 2.0 * (cz - sz) * (cz + sz) // 2 cos 2z
    var k = kk
    while (k > 0) {
      k -= 1
      val t = x * u0 - u1 + f(k)
      u1 = u0; u0 = t
    }
    2.0 * sz * cz * u0 // sin 2z * u0
  }

  /** Auxiliary-latitude series order (matches PROJ_ETMERC_ORDER). */
  final val AuxOrder = 6

  // --- Auxiliary latitude Fourier coefficients -----------------------------
  // C[out,in] polynomial matrices in the third flattening n for the
  // conversions the engine needs (geographic phi, rectifying mu, conformal
  // chi).  These constants come from the published series (Karney,
  // "On auxiliary latitudes", 2023; also printed in
  // /root/reference/src/latitudes.cpp:239-326).  F[l] = n^(l+1) *
  // polyval(n, row l); chi-involving rows are full polynomials in n, the
  // phi<->mu rows are polynomials in n^2 (even powers only).

  private val cPhiMu = Array( // C[phi,mu]: mu -> phi, polynomial in n^2
    Array(3.0/2, -27.0/32, 269.0/512),
    Array(21.0/16, -55.0/32, 6759.0/4096),
    Array(151.0/96, -417.0/128),
    Array(1097.0/512, -15543.0/2560),
    Array(8011.0/2560),
    Array(293393.0/61440))

  private val cMuPhi = Array( // C[mu,phi]: phi -> mu, polynomial in n^2
    Array(-3.0/2, 9.0/16, -3.0/32),
    Array(15.0/16, -15.0/32, 135.0/2048),
    Array(-35.0/48, 105.0/256),
    Array(315.0/512, -189.0/512),
    Array(-693.0/1280),
    Array(1001.0/2048))

  private val cPhiChi = Array( // C[phi,chi]: chi -> phi ("cgb")
    Array(2.0, -2.0/3, -2.0, 116.0/45, 26.0/45, -2854.0/675),
    Array(7.0/3, -8.0/5, -227.0/45, 2704.0/315, 2323.0/945),
    Array(56.0/15, -136.0/35, -1262.0/105, 73814.0/2835),
    Array(4279.0/630, -332.0/35, -399572.0/14175),
    Array(4174.0/315, -144838.0/6237),
    Array(601676.0/22275))

  private val cChiPhi = Array( // C[chi,phi]: phi -> chi ("cbg")
    Array(-2.0, 2.0/3, 4.0/3, -82.0/45, 32.0/45, 4642.0/4725),
    Array(5.0/3, -16.0/15, -13.0/9, 904.0/315, -1522.0/945),
    Array(-26.0/15, 34.0/21, 8.0/5, -12686.0/2835),
    Array(1237.0/630, -12.0/5, -24832.0/14175),
    Array(-734.0/315, 109598.0/31185),
    Array(444337.0/155925))

  private val cMuChi = Array( // C[mu,chi]: chi -> mu ("gtu")
    Array(1.0/2, -2.0/3, 5.0/16, 41.0/180, -127.0/288, 7891.0/37800),
    Array(13.0/48, -3.0/5, 557.0/1440, 281.0/630, -1983433.0/1935360),
    Array(61.0/240, -103.0/140, 15061.0/26880, 167603.0/181440),
    Array(49561.0/161280, -179.0/168, 6601661.0/7257600),
    Array(34729.0/80640, -3418889.0/1995840),
    Array(212378941.0/319334400))

  private val cChiMu = Array( // C[chi,mu]: mu -> chi ("utg")
    Array(-1.0/2, 2.0/3, -37.0/96, 1.0/360, 81.0/512, -96199.0/604800),
    Array(-1.0/48, -1.0/15, 437.0/1440, -46.0/105, 1118711.0/3870720),
    Array(-17.0/480, 37.0/840, 209.0/4480, -5569.0/90720),
    Array(-4397.0/161280, 11.0/504, 830251.0/7257600),
    Array(-4583.0/161280, 108847.0/3991680),
    Array(-20648693.0/638668800))

  private val cPhiXi = Array( // C[phi,xi]: authalic xi -> phi
    Array(4.0/3, 4.0/45, -16.0/35, -2582.0/14175, 60136.0/467775, 28112932.0/212837625),
    Array(46.0/45, 152.0/945, -11966.0/14175, -21016.0/51975, 251310128.0/638512875),
    Array(3044.0/2835, 3802.0/14175, -94388.0/66825, -8797648.0/10945935),
    Array(6059.0/4725, 41072.0/93555, -1472637812.0/638512875),
    Array(768272.0/467775, 455935736.0/638512875),
    Array(4210684958.0/1915538625))

  private val cXiPhi = Array( // C[xi,phi]: phi -> authalic xi
    Array(-4.0/3, -4.0/45, 88.0/315, 538.0/4725, 20824.0/467775, -44732.0/2837835),
    Array(34.0/45, 8.0/105, -2482.0/14175, -37192.0/467775, -12467764.0/212837625),
    Array(-1532.0/2835, -898.0/14175, 54968.0/467775, 100320856.0/1915538625),
    Array(6007.0/14175, 24496.0/467775, -5884124.0/70945875),
    Array(-23356.0/66825, -839792.0/19348875),
    Array(570284222.0/1915538625))

  private def evalCoeffs(n: Double, rows: Array[Array[Double]],
                         evenOnly: Boolean): Array[Double] = {
    val f = new Array[Double](AuxOrder)
    val x = if (evenOnly) n * n else n
    var d = n
    var l = 0
    while (l < AuxOrder) {
      val row = rows(l)
      f(l) = d * polyval(x, row, row.length - 1)
      d *= n
      l += 1
    }
    f
  }

  /** mu -> phi Fourier coefficients (inverse meridional distance). */
  def coeffsMuToPhi(n: Double): Array[Double] = evalCoeffs(n, cPhiMu, evenOnly = true)
  /** phi -> mu coefficients (meridional distance). */
  def coeffsPhiToMu(n: Double): Array[Double] = evalCoeffs(n, cMuPhi, evenOnly = true)
  /** chi -> phi ("Gaussian -> geodetic", tmerc cgb). */
  def coeffsChiToPhi(n: Double): Array[Double] = evalCoeffs(n, cPhiChi, evenOnly = false)
  /** phi -> chi ("geodetic -> Gaussian", tmerc cbg). */
  def coeffsPhiToChi(n: Double): Array[Double] = evalCoeffs(n, cChiPhi, evenOnly = false)
  /** chi -> mu (sphere N,E -> ellipsoidal normalized N,E, tmerc gtu). */
  def coeffsChiToMu(n: Double): Array[Double] = evalCoeffs(n, cMuChi, evenOnly = false)
  /** mu -> chi (ellipsoidal N,E -> sphere N,E, tmerc utg). */
  def coeffsMuToChi(n: Double): Array[Double] = evalCoeffs(n, cChiMu, evenOnly = false)
  /** authalic xi -> phi (aea/laea inverse). */
  def coeffsXiToPhi(n: Double): Array[Double] = evalCoeffs(n, cPhiXi, evenOnly = false)
  /** phi -> authalic xi. */
  def coeffsPhiToXi(n: Double): Array[Double] = evalCoeffs(n, cXiPhi, evenOnly = false)

  /** Authalic q(sinphi): q such that xi = asin(q / qp)
    * (reference: /root/reference/src/latitudes.cpp:55-73). */
  def authalicQ(sinphi: Double, e: Double, oneEs: Double): Double =
    if (e >= 1e-7) {
      val es = e * sinphi
      val den = 1.0 - es * es
      if (den == 0.0) Double.PositiveInfinity
      else oneEs * (sinphi / den + atanh(es) / e)
    } else 2 * sinphi

  /** Convert an auxiliary latitude using coefficients from the tables. */
  def auxConvert(zeta: Double, f: Array[Double]): Double =
    zeta + clenshaw(math.sin(zeta), math.cos(zeta), f, AuxOrder)

  def auxConvert(zeta: Double, szeta: Double, czeta: Double,
                 f: Array[Double]): Double =
    zeta + clenshaw(szeta, czeta, f, AuxOrder)

  /** Rectifying radius: quarter meridian / (pi/2 (a+b)/2) as a series in
    * n^2; coefficients ((2k-3)!!/(2k)!!)^2. */
  def rectifyingRadius(n: Double): Double = {
    val c = Array(1.0, 1.0 / 4, 1.0 / 64, 1.0 / 256)
    polyval(n * n, c, 3) / (1.0 + n)
  }

  /** Geocentric latitude from geographic (and back with fwd=false). */
  def geocentricLat(phi: Double, oneEs: Double, fwd: Boolean): Double =
    if (fwd) math.atan(oneEs * math.tan(phi))
    else math.atan(math.tan(phi) / oneEs)
}
