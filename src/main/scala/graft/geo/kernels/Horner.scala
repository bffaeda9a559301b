package graft.geo.kernels

/** Engsager/Poder Horner polynomial transformations (Danish KMS system
  * transformations) — reference:
  * /root/reference/src/transformations/horner.cpp:91-657.
  *
  * Real mode evaluates a 2D polynomial pair with the "double Horner"
  * scheme (backwards summation for numerical stability); complex mode
  * evaluates a complex polynomial in (N + iE).  When no inverse
  * coefficients are given the inverse is solved iteratively with a
  * Jacobian/Newton step (32 iterations max).
  */
object Horner {
  def nRealCoefs(order: Int): Int = (order + 1) * (order + 2) / 2
  def nComplexCoefs(order: Int): Int = 2 * order + 2

  /** double Horner evaluation (reference: double_real_horner_eval,
    * horner.cpp:185-210); returns (E, N). */
  def realEval(order: Int, cx: Array[Double], cy: Array[Double],
               e: Double, n: Double, offset: Int): Array[Double] = {
    var icx = nRealCoefs(order)
    var icy = icx
    icy -= 1; var nOut = cy(icy)
    icx -= 1; var eOut = cx(icx)
    var r = order
    while (r > offset) {
      icy -= 1; var u = cy(icy)
      icx -= 1; var v = cx(icx)
      var c = order
      while (c >= r) {
        icy -= 1; u = n * u + cy(icy)
        icx -= 1; v = e * v + cx(icx)
        c -= 1
      }
      nOut = e * nOut + u
      eOut = n * eOut + v
      r -= 1
    }
    Array(eOut, nOut)
  }

  /** single-variable Horner over the first (order+1) coefficients
    * (reference: single_real_horner_eval, horner.cpp:212-222). */
  def singleEval(order: Int, cx: Array[Double], x: Double, offset: Int): Double = {
    var i = order
    var u = cx(i)
    var r = order
    while (r > offset) { i -= 1; u = x * u + cx(i); r -= 1 }
    u
  }

  /** complex Horner evaluation (reference: complex_horner_eval,
    * horner.cpp:224-243); coefficients ordered (Cn0, Ce0, Cn1, Ce1, …);
    * returns (E, N). */
  def complexEval(order: Int, c: Array[Double],
                  e: Double, n: Double, offset: Int): Array[Double] = {
    var i = nComplexCoefs(order)
    val beg = 2 * offset
    i -= 1; var eOut = c(i)
    i -= 1; var nOut = c(i)
    while (i > beg) {
      i -= 1; val w = n * eOut + e * nOut + c(i)
      i -= 1; nOut = n * nOut - e * eOut + c(i)
      eOut = w
    }
    Array(eOut, nOut)
  }
}

final case class HornerKernel(
    order: Int,
    range: Double,
    invTolerance: Double,
    fwdOrigin: Array[Double],            // (u, v)
    invOrigin: Array[Double],            // (u, v) or null
    fwdU: Array[Double], fwdV: Array[Double], // real mode (null in complex)
    invU: Array[Double], invV: Array[Double], // null when iterative
    fwdC: Array[Double], invC: Array[Double], // complex mode
    uneg: Boolean, vneg: Boolean) extends PointKernel {

  override def left: IOUnits.Value = IOUnits.Whatever
  override def right: IOUnits.Value = IOUnits.Whatever

  private val complexMode = fwdC != null
  private val hasInv = if (complexMode) invC != null else invU != null

  private def outOfRange(e: Double, n: Double): Boolean =
    math.abs(n) > range || math.abs(e) > range

  def fwd(v: Array[Double]): Boolean = applyDir(v, forward = true)
  def inv(v: Array[Double]): Boolean =
    if (hasInv) applyDir(v, forward = false)
    else if (complexMode) complexIterInv(v)
    else realIterInv(v)

  private def applyDir(vec: Array[Double], forward: Boolean): Boolean = {
    val origin = if (forward) fwdOrigin else invOrigin
    var e = vec(0) - origin(0)
    var n = vec(1) - origin(1)
    if (complexMode) {
      if (uneg) e = -e
      if (vneg) n = -n
    }
    if (outOfRange(e, n)) return false
    val out =
      if (complexMode)
        Horner.complexEval(order, if (forward) fwdC else invC, e, n, 0)
      else
        Horner.realEval(order,
          if (forward) fwdU else invU, if (forward) fwdV else invV, e, n, 0)
    vec(0) = out(0); vec(1) = out(1)
    true
  }

  /** iterative inverse for real polynomia (reference:
    * real_iterative_inverse_impl, horner.cpp:322-383). */
  private def realIterInv(vec: Array[Double]): Boolean = {
    val e = vec(0); val n = vec(1)
    if (outOfRange(e, n)) return false
    val de = e - fwdU(0)
    val dn = n - fwdV(0)
    var x0 = 0.0; var y0 = 0.0
    var loops = 32
    var converged = false
    while (loops > 0 && !converged) {
      loops -= 1
      val mbc = Horner.realEval(order, fwdU, fwdV, x0, y0, 1)
      val mb = mbc(0); val mc = mbc(1)
      val ma = Horner.singleEval(order, fwdU, x0, 1)
      val md = Horner.singleEval(order, fwdV, y0, 1)
      val idet = 1.0 / (ma * md - mb * mc)
      val x = idet * (md * de - mb * dn)
      val y = idet * (ma * dn - mc * de)
      converged = math.abs(x - x0) < invTolerance && math.abs(y - y0) < invTolerance
      x0 = x; y0 = y
    }
    if (!converged) return false
    vec(0) = x0 + fwdOrigin(0)
    vec(1) = y0 + fwdOrigin(1)
    true
  }

  /** iterative inverse for complex polynomia (reference:
    * complex_iterative_inverse_impl, horner.cpp:440-490). */
  private def complexIterInv(vec: Array[Double]): Boolean = {
    val e = vec(0); val n = vec(1)
    if (outOfRange(e, n)) return false
    val dzr = n - fwdC(0)
    val dzi = e - fwdC(1)
    var w0r = 0.0; var w0i = 0.0
    var loops = 32
    var converged = false
    while (loops > 0 && !converged) {
      loops -= 1
      val en = Horner.complexEval(order, fwdC, w0i, w0r, 1)
      val detR = en(1); val detI = en(0)
      val d2 = detR * detR + detI * detI
      val w1r = (dzr * detR + dzi * detI) / d2
      val w1i = (dzi * detR - dzr * detI) / d2
      converged = math.abs(w1r - w0r) < invTolerance && math.abs(w1i - w0i) < invTolerance
      w0r = w1r; w0i = w1i
    }
    if (!converged) return false
    var eo = w0i; var no = w0r
    if (uneg) eo = -eo
    if (vneg) no = -no
    vec(0) = eo + fwdOrigin(0)
    vec(1) = no + fwdOrigin(1)
    true
  }
}
