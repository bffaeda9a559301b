package graft.geo.geodesic

/** A geodesic line: the expensive per-line constants (Fourier series
  * C1/C1'/C3 at the line's eps, the starting-point trigonometry) are
  * computed once in the constructor, after which [[position]] evaluates a
  * waypoint at any distance along the line with no series re-expansion and
  * no azimuth re-solve — the `geod_lineinit` / `geod_position` pair of the
  * reference (behavioral reference /root/reference/src/geodesic.c:419-459,
  * 662-666; Karney 2013 §5).
  *
  * Instances are immutable and Serializable, so a line broadcasts into
  * Catalyst expressions like the [[Geodesic]] it came from.  Waypoint
  * generation for trajectory densification calls [[position]] N times per
  * row with one line init — the same cost split the reference recommends
  * for "many points on one geodesic" workloads.
  *
  * @param s13 distance (m) to a registered endpoint: set by
  *            [[Geodesic.inverseLine]] to the full inverse distance
  *            (geod_geodesicline.s13), NaN for plain azimuth lines.
  */
final class GeodesicLine private[geodesic] (
    g: Geodesic, val lat1: Double, val lon1: Double, val azi1In: Double,
    val s13: Double) extends Serializable {
  import Geodesic._

  val azi1: Double = angNormalize(azi1In)

  // --- line constants (geod_lineinit, geodesic.c:419-459) -----------------
  private val b = g.b
  private val f = g.f
  private val f1 = g.f1

  private val (salp1, calp1) = sincosd(angRound(azi1))

  private val (sbet1, cbet1) = {
    val (s, c) = sincosd(angRound(latFix(lat1)))
    val sb = s * f1
    val h = math.hypot(sb, c)
    (sb / h, math.max(Tiny, c / h))
  }

  private val salp0 = salp1 * cbet1
  private val calp0 = math.hypot(calp1, salp1 * sbet1)
  // comg1 stays un-normalized (cbet1*calp1), matching the scale of
  // somg1 = salp0*sbet1 — the pair only ever enters omg12's atan2 where
  // the common factor cancels (same invariant as Geodesic.directScale)
  private val (ssig1, csig1, comg1) = {
    val s = sbet1
    val c = if (sbet1 != 0 || calp1 != 0) cbet1 * calp1 else 1.0
    val h = math.hypot(s, c)
    (s / h, c / h, c)
  }
  private val somg1 = salp0 * sbet1

  private val k2 = calp0 * calp0 * g.ep2
  private val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)

  private val A1m1 = a1m1f(eps)
  private val C1a = { val c = new Array[Double](7); c1f(eps, c); c }
  private val B11 = sinCosSeriesSin(ssig1, csig1, C1a, 6)
  private val (stau1, ctau1) = {
    val sB = math.sin(B11); val cB = math.cos(B11)
    (ssig1 * cB + csig1 * sB, csig1 * cB - ssig1 * sB)
  }
  private val C1pa = { val c = new Array[Double](7); c1pf(eps, c); c }
  private val C3a = { val c = new Array[Double](6); g.c3f(eps, c); c }
  private val A3c = -f * salp0 * g.a3f(eps)
  private val B31 = sinCosSeriesSin(ssig1, csig1, C3a, 5)

  /** Waypoint at distance `s12` metres along the line (geod_position,
    * geodesic.c:662-666 -> geod_genposition distance mode). */
  def position(s12: Double): GeodDirect = {
    // distance -> sigma via the reverted C1' series, one Newton correction
    // for very eccentric ellipsoids (same ladder as Geodesic.directScale)
    val tau12 = s12 / (b * (1 + A1m1))
    val st = math.sin(tau12); val ct = math.cos(tau12)
    var B12 = -sinCosSeriesSin(stau1 * ct + ctau1 * st,
      ctau1 * ct - stau1 * st, C1pa, 6)
    var sig12 = tau12 - (B12 - B11)
    var ssig12 = math.sin(sig12); var csig12 = math.cos(sig12)
    if (math.abs(f) > 0.01) {
      val ssig2 = ssig1 * csig12 + csig1 * ssig12
      val csig2 = csig1 * csig12 - ssig1 * ssig12
      B12 = sinCosSeriesSin(ssig2, csig2, C1a, 6)
      val serr = (1 + A1m1) * (sig12 + (B12 - B11)) - s12 / b
      sig12 = sig12 - serr / math.sqrt(1 + k2 * ssig2 * ssig2)
      ssig12 = math.sin(sig12); csig12 = math.cos(sig12)
    }

    val ssig2 = ssig1 * csig12 + csig1 * ssig12
    var csig2 = csig1 * csig12 - ssig1 * ssig12
    val sbet2 = calp0 * ssig2
    var cbet2 = math.hypot(salp0, calp0 * csig2)
    if (cbet2 == 0) { cbet2 = Tiny; csig2 = Tiny }
    val salp2 = salp0; val calp2 = calp0 * csig2

    val somg2 = salp0 * ssig2; val comg2 = csig2
    val omg12 = math.atan2(somg2 * comg1 - comg2 * somg1,
      comg2 * comg1 + somg2 * somg1)
    val lam12 = omg12 + A3c *
      (sig12 + (sinCosSeriesSin(ssig2, csig2, C3a, 5) - B31))
    val lon2 = angNormalize(angNormalize(lon1) + angNormalize(lam12 * RadToDeg))
    val lat2 = atan2d(sbet2, f1 * cbet2)
    val azi2 = atan2d(salp2, calp2)
    GeodDirect(lat2, lon2, azi2, sig12 * RadToDeg)
  }

  /** `n+1` evenly spaced waypoints from the start point to the registered
    * endpoint (requires a line from [[Geodesic.inverseLine]]), endpoints
    * included — the densification primitive behind trajectory tiling. */
  def waypoints(n: Int): Array[GeodDirect] = {
    require(n >= 1, "need at least one segment")
    require(!s13.isNaN, "waypoints need a line with a registered endpoint")
    Array.tabulate(n + 1)(i => position(s13 * i / n))
  }
}
