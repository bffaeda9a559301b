package graft.geo.proj

import graft.geo.kernels.{IOUnits, PointKernel}

/** Bounding-box transformation with edge densification — the engine's
  * `proj_trans_bounds` (reference: /root/reference/src/trans_bounds.cpp:
  * 364-580): sample `densifyPts` extra points per edge of the box,
  * transform the linear ring, and extract the outermost bounds with
  * pole containment and antimeridian crossing handled for geographic
  * output.  Angular sides of the kernel take/return DEGREES here (the
  * driver-side convention); the primary use is reprojecting polygon /
  * area-of-interest boxes before a PIP join.
  *
  * For geographic output, `xmax < xmin` in the result means the box
  * crosses the antimeridian and callers should split it into
  * (xmin..180) and (-180..xmax). */
object TransBounds {

  final case class Bounds(xmin: Double, ymin: Double,
                          xmax: Double, ymax: Double) {
    def crossesAntimeridian: Boolean = xmax < xmin
  }

  private def angular(k: PointKernel, forward: Boolean, input: Boolean): Boolean = {
    val side = if (input == forward) k.left else k.right
    side == IOUnits.Radians
  }

  /** Transform one point through the kernel with degree conversion at
    * the angular boundaries; returns null on failure. */
  private def tr(k: PointKernel, forward: Boolean, x: Double, y: Double): Array[Double] = {
    val v = Array(x, y, 0.0, 0.0)
    if (angular(k, forward, input = true)) {
      v(0) = math.toRadians(v(0)); v(1) = math.toRadians(v(1))
    }
    val ok = if (forward) k.fwd(v) else k.inv(v)
    if (!ok) return null
    if (angular(k, forward, input = false)) {
      v(0) = math.toDegrees(v(0)); v(1) = math.toDegrees(v(1))
    }
    v
  }

  def transform(k: PointKernel, forward: Boolean,
                xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                densifyPts: Int = 21): Option[Bounds] = {
    require(densifyPts >= 0 && densifyPts <= 10000, "densify_pts must be 0-10000")
    val degreeInput = angular(k, forward, input = true)
    val degreeOutput = angular(k, forward, input = false)
    require(!degreeOutput || densifyPts >= 2,
      "densify_pts must be at least 2 if the output is geographic")

    val sidePts = densifyPts + 1
    val n = sidePts * 4
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)

    val deltaX =
      if (degreeInput && xmax < xmin) (xmax - xmin + 360.0) / sidePts
      else (xmax - xmin) / sidePts
    val deltaY = (ymax - ymin) / sidePts
    require(!(degreeInput && ymax < ymin), "latitude max < latitude min")

    var i = 0
    while (i < sidePts) {
      ys(i) = ymax - i * deltaY;            xs(i) = xmin
      ys(i + sidePts) = ymin;               xs(i + sidePts) = xmin + i * deltaX
      ys(i + sidePts * 2) = ymin + i * deltaY; xs(i + sidePts * 2) = xmax
      ys(i + sidePts * 3) = ymax;           xs(i + sidePts * 3) = xmax - i * deltaX
      i += 1
    }
    i = 0
    var anyOk = false
    while (i < n) {
      val r = tr(k, forward, xs(i), ys(i))
      if (r == null) { xs(i) = Double.NaN; ys(i) = Double.NaN }
      else { xs(i) = r(0); ys(i) = r(1); anyOk = true }
      i += 1
    }
    if (!anyOk) return None

    def simpleMin(a: Array[Double]) = a.filterNot(_.isNaN).min
    def simpleMax(a: Array[Double]) = a.filterNot(_.isNaN).max

    if (!degreeOutput)
      return Some(Bounds(simpleMin(xs), simpleMin(ys), simpleMax(xs), simpleMax(ys)))

    // pole containment: inverse-project the pole into the source space
    def containsPole(lat: Double): Boolean = {
      val p = tr(k, !forward, 0.0, lat)
      p != null && xmin < p(0) && p(0) < xmax && ymin < p(1) && p(1) < ymax
    }
    if (containsPole(90.0))
      Some(Bounds(-180, simpleMin(ys), 180, 90))
    else if (containsPole(-90.0))
      Some(Bounds(-180, -90, 180, simpleMax(ys)))
    else
      Some(Bounds(antimeridianMin(xs), simpleMin(ys),
        antimeridianMax(xs), simpleMax(ys)))
  }

  private def prevIndex(i: Int, a: Array[Double]): Int = {
    var p = if (i == 0) a.length - 1 else i - 1
    while (a(p).isNaN && p != i) { p = if (p == 0) a.length - 1 else p - 1 }
    p
  }

  /** reference: antimeridian_min (trans_bounds.cpp:125-170) */
  private def antimeridianMin(a: Array[Double]): Double = {
    var positiveMin = Double.MaxValue
    var minValue = Double.MaxValue
    var crossed = 0
    var positiveMeridian = false
    var i = 0
    while (i < a.length) {
      if (!a(i).isNaN) {
        val prev = prevIndex(i, a)
        val delta = a(prev) - a(i)
        if (delta >= 200) {
          if (crossed == 0) positiveMin = minValue
          crossed += 1
          positiveMeridian = false
        } else if (delta <= -200) {
          if (crossed == 0) positiveMin = a(i)
          crossed += 1
          positiveMeridian = true
        }
        if (positiveMeridian && a(i) < positiveMin) positiveMin = a(i)
        if (a(i) < minValue) minValue = a(i)
      }
      i += 1
    }
    if (crossed == 2) positiveMin
    else if (crossed == 4) -180.0
    else minValue
  }

  /** reference: antimeridian_max (trans_bounds.cpp:175-220) */
  private def antimeridianMax(a: Array[Double]): Double = {
    var negativeMax = Double.MinValue
    var maxValue = Double.MinValue
    var crossed = 0
    var negativeMeridian = false
    var i = 0
    while (i < a.length) {
      if (!a(i).isNaN) {
        val prev = prevIndex(i, a)
        val delta = a(prev) - a(i)
        if (delta >= 200) {
          if (crossed == 0) negativeMax = a(i)
          crossed += 1
          negativeMeridian = true
        } else if (delta <= -200) {
          if (crossed == 0) negativeMax = maxValue
          crossed += 1
          negativeMeridian = false
        }
        if (negativeMeridian && a(i) > negativeMax) negativeMax = a(i)
        if (a(i) > maxValue) maxValue = a(i)
      }
      i += 1
    }
    if (crossed == 2) negativeMax
    else if (crossed == 4) 180.0
    else maxValue
  }
}
