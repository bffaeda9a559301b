package graft.geo.proj

import graft.geo.kernels.{IOUnits, PointKernel}
import graft.geo.math.{ProjMath => M}

/** CRS→CRS candidate-operation planner — the engine's analogue of the
  * reference's per-point dynamic dispatch over
  * `alternativeCoordinateOperations` (pj_get_suggested_operation,
  * /root/reference/src/trans.cpp:47-176, retry logic :233-342):
  *
  *  - candidates carry a source/destination bounding box (degrees),
  *    an accuracy and a pseudo-area;
  *  - per point, pick the in-bbox candidate with the best accuracy
  *    (ties: smaller pseudo-area);
  *  - if the chosen operation errors (e.g. the point is outside its
  *    grid), retry up to two further candidates;
  *  - final fallback: the first grid-free candidate, evaluated
  *    regardless of bbox.
  *
  * On Spark the planner is itself a [[PointKernel]], so the entire
  * selection compiles into the same whole-stage-codegen row kernel as a
  * static pipeline would (SURVEY §3.2's "CASE WHEN bbox THEN expr"
  * mapping) — there is no per-row interpretation outside the generated
  * code path and no driver involvement after plan construction.
  */
object CrsPlanner {

  /** One candidate operation.  Bboxes in degrees (lon/lat); the kernel's
    * forward input must be angular (radians).  The source bbox gates the
    * forward direction and the destination bbox (defaults to the source
    * one) the inverse — mirroring the reference's per-direction
    * minx/maxx Src/Dst checks.  `gridFree` marks operations usable as
    * the last-resort fallback. */
  final case class Candidate(kernel: PointKernel,
                             westDeg: Double, southDeg: Double,
                             eastDeg: Double, northDeg: Double,
                             accuracy: Double,
                             gridFree: Boolean = false,
                             dstWestDeg: Double = Double.NaN,
                             dstSouthDeg: Double = Double.NaN,
                             dstEastDeg: Double = Double.NaN,
                             dstNorthDeg: Double = Double.NaN) extends Serializable {
    val pseudoArea: Double = // ~ cos-weighted area, crs_to_crs.cpp:119-127
      (eastDeg - westDeg) *
        (math.sin(math.toRadians(northDeg)) - math.sin(math.toRadians(southDeg)))

    private def inBox(lonDeg: Double, latDeg: Double, w: Double, s: Double,
                      e: Double, n: Double): Boolean = {
      if (!(latDeg >= s && latDeg <= n)) return false
      var x = lonDeg
      if (x > 180.0) x -= 360.0 else if (x < -180.0) x += 360.0
      x >= w && x <= e
    }

    def contains(lonDeg: Double, latDeg: Double, forward: Boolean): Boolean =
      if (forward || dstWestDeg.isNaN)
        inBox(lonDeg, latDeg, westDeg, southDeg, eastDeg, northDeg)
      else
        inBox(lonDeg, latDeg, dstWestDeg, dstSouthDeg, dstEastDeg, dstNorthDeg)
  }

  def kernel(candidates: Seq[Candidate]): PointKernel = {
    require(candidates.nonEmpty, "planner needs at least one candidate")
    PlannerKernel(candidates.toArray)
  }
}

/** The compiled planner: per-point candidate selection + bounded retry.
  * Works on angular coordinates in radians (like the reference's
  * geographic-CRS hub). */
final case class PlannerKernel(candidates: Array[CrsPlanner.Candidate])
    extends PointKernel {
  override def left: IOUnits.Value = IOUnits.Radians
  override def right: IOUnits.Value = IOUnits.Radians
  override def invertible: Boolean = candidates.forall(_.kernel.invertible)

  private val fallbackIdx = candidates.indexWhere(_.gridFree)

  /** (accuracy, pseudoArea) rank is a property of the candidate LIST, not
    * of the point — computed once here so the per-row path allocates
    * nothing: it scans this order, bbox-tests inline, and tries at most 3
    * in-bbox candidates (reference: retry up to 2 alternates) plus the
    * grid-free fallback. */
  private val rankedIdx: Array[Int] = candidates.indices
    .sortBy(i => (candidates(i).accuracy, candidates(i).pseudoArea)).toArray

  private def attempt(ci: Int, v: Array[Double], forward: Boolean): Boolean = {
    val k = candidates(ci).kernel
    val w = v.clone()
    val ok = if (forward) k.fwd(w) else k.inv(w)
    if (ok) System.arraycopy(w, 0, v, 0, 4)
    ok
  }

  private def run(v: Array[Double], forward: Boolean): Boolean = {
    val lonDeg = math.toDegrees(v(0))
    val latDeg = math.toDegrees(v(1))
    var tried = 0
    var usedFallback = false
    var s = 0
    while (s < rankedIdx.length && tried < 3) {
      val ci = rankedIdx(s)
      if (candidates(ci).contains(lonDeg, latDeg, forward)) {
        tried += 1
        if (ci == fallbackIdx) usedFallback = true
        if (attempt(ci, v, forward)) return true
      }
      s += 1
    }
    if (fallbackIdx >= 0 && !usedFallback) attempt(fallbackIdx, v, forward)
    else false
  }

  def fwd(v: Array[Double]): Boolean = run(v, forward = true)
  def inv(v: Array[Double]): Boolean = run(v, forward = false)
}
