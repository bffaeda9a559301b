package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** I/O unit tags for pipeline composition type-checking — the Spark-side
  * analogue of PROJ's PJ_IO_UNITS enum and the pipeline unit-propagation
  * check (/root/reference/src/proj_internal.h:192-201,
  * /root/reference/src/pipeline.cpp:581-627). */
object IOUnits extends Enumeration {
  val Whatever, Radians, Degrees, Projected, Cartesian = Value
}

/** One compiled coordinate operation: a pure function on a 4-vector
  * (x|lam, y|phi, z, t), mutating in place; returns false on a domain
  * error (the null-result channel, standing in for PROJ's HUGE_VAL
  * sentinel, /root/reference/src/fwd.cpp:209-227).
  *
  * Setup-time invariants (ellipsoid constants, series coefficients,
  * rotation matrices) are computed once in the constructor — PROJ's
  * setup/apply split (SURVEY.md §1.2) — and serialized with the Catalyst
  * expression that wraps the kernel.
  *
  * Angular components are radians inside kernels; the Catalyst expression
  * layer converts from/to degrees at the boundary.
  */
trait PointKernel extends Serializable {
  def fwd(v: Array[Double]): Boolean
  def inv(v: Array[Double]): Boolean
  def invertible: Boolean = true
  /** unit tag of the forward-direction input */
  def left: IOUnits.Value = IOUnits.Whatever
  /** unit tag of the forward-direction output */
  def right: IOUnits.Value = IOUnits.Whatever
}

/** Identity (PROJ `noop`). */
object NoopKernel extends PointKernel {
  def fwd(v: Array[Double]) = true
  def inv(v: Array[Double]) = true
}

/** Wraps a kernel with swapped direction (a `+inv` pipeline step). */
final case class InverseKernel(k: PointKernel) extends PointKernel {
  def fwd(v: Array[Double]): Boolean = k.inv(v)
  def inv(v: Array[Double]): Boolean = k.fwd(v)
  override def left = k.right
  override def right = k.left
}

/** Sequential step composition with unit checking at build time (PROJ
  * `pipeline`, /root/reference/src/pipeline.cpp:361-639). Steps that are
  * mutually inverse or identity should be removed by
  * [[graft.geo.pipeline.PipelineBuilder]] before this is constructed. */
final case class PipelineKernel(steps: Array[PointKernel]) extends PointKernel {
  require(steps.nonEmpty, "empty pipeline")
  // unit propagation exactly as the reference (pipeline.cpp:581-627):
  // a step with BOTH sides Whatever inherits the next step's left
  // (backward pass) or the previous step's right (forward pass); a step
  // with only one Whatever side keeps it — e.g. the first step of
  // "step proj=unitconvert xy_in=grad xy_out=rad step ..." must keep a
  // Whatever left so callers don't apply a spurious deg->rad conversion.
  private val effLeft = steps.map(_.left)
  private val effRight = steps.map(_.right)
  locally {
    var i = steps.length - 2
    while (i >= 0) {
      if (effLeft(i) == IOUnits.Whatever && effRight(i) == IOUnits.Whatever) {
        val nl = effLeft(i + 1)
        if (nl != effRight(i + 1) || nl != IOUnits.Whatever) {
          effLeft(i) = nl; effRight(i) = nl
        }
      }
      i -= 1
    }
    i = 1
    while (i < steps.length) {
      if (effLeft(i) == IOUnits.Whatever && effRight(i) == IOUnits.Whatever) {
        val pr = effRight(i - 1)
        if (effLeft(i - 1) != pr || pr != IOUnits.Whatever) {
          effLeft(i) = pr; effRight(i) = pr
        }
      }
      i += 1
    }
    i = 0
    while (i < steps.length - 1) {
      val a = effRight(i); val b = effLeft(i + 1)
      require(a == IOUnits.Whatever || b == IOUnits.Whatever || a == b,
        s"pipeline unit mismatch between step $i ($a) and step ${i + 1} ($b)")
      i += 1
    }
  }
  override def left = effLeft(0)
  override def right = effRight(steps.length - 1)
  override def invertible: Boolean = steps.forall(_.invertible)
  private val hasStack = steps.exists {
    case _: PushKernel | _: PopKernel => true
    case _ => false
  }
  private def stacks(): Array[Array[Double]] =
    if (hasStack) Array.fill(4)(new Array[Double](steps.length)) else null

  def fwd(v: Array[Double]): Boolean = {
    val st = stacks()
    val depth = new Array[Int](4)
    var i = 0
    while (i < steps.length) {
      steps(i) match {
        case PushKernel(mask) => PipelineKernel.push(st, depth, mask, v)
        case PopKernel(mask)  => PipelineKernel.pop(st, depth, mask, v)
        case k                => if (!k.fwd(v)) return false
      }
      i += 1
    }
    true
  }
  def inv(v: Array[Double]): Boolean = {
    val st = stacks()
    val depth = new Array[Int](4)
    var i = steps.length - 1
    while (i >= 0) {
      steps(i) match {
        // in the inverse direction push acts as pop and vice versa
        // (reference: /root/reference/src/pipeline.cpp:641-725)
        case PushKernel(mask) => PipelineKernel.pop(st, depth, mask, v)
        case PopKernel(mask)  => PipelineKernel.push(st, depth, mask, v)
        case k                => if (!k.inv(v)) return false
      }
      i -= 1
    }
    true
  }
}

object PipelineKernel {
  private def push(st: Array[Array[Double]], depth: Array[Int],
                   mask: Array[Boolean], v: Array[Double]): Unit = {
    var c = 0
    while (c < 4) {
      if (mask(c)) { st(c)(depth(c)) = v(c); depth(c) += 1 }
      c += 1
    }
  }
  private def pop(st: Array[Array[Double]], depth: Array[Int],
                  mask: Array[Boolean], v: Array[Double]): Unit = {
    var c = 0
    while (c < 4) {
      if (mask(c) && depth(c) > 0) { depth(c) -= 1; v(c) = st(c)(depth(c)) }
      c += 1
    }
  }
}

/** Save selected components onto the per-pipeline stacks (PROJ `push`,
  * +v_1..+v_4 flags); only meaningful inside a [[PipelineKernel]]. */
final case class PushKernel(mask: Array[Boolean]) extends PointKernel {
  def fwd(v: Array[Double]): Boolean = true
  def inv(v: Array[Double]): Boolean = true
}

/** Restore selected components from the per-pipeline stacks (PROJ `pop`). */
final case class PopKernel(mask: Array[Boolean]) extends PointKernel {
  def fwd(v: Array[Double]): Boolean = true
  def inv(v: Array[Double]): Boolean = true
}

/** Component permutation/sign flip (PROJ `axisswap`,
  * /root/reference/src/conversions/axisswap.cpp:64-309).
  * order: e.g. Array(2,1) or Array(1,2,-3) — 1-based, sign = negate. */
final case class AxisSwapKernel(order: Array[Int]) extends PointKernel {
  require(order.nonEmpty && order.length <= 4)
  private val axis = order.map(o => math.abs(o) - 1)
  private val sign = order.map(o => if (o < 0) -1.0 else 1.0)
  require(axis.sorted.sameElements(0 until order.length),
    s"axisswap order must be a permutation, got ${order.mkString(",")}")
  def fwd(v: Array[Double]): Boolean = {
    val tmp = new Array[Double](order.length)
    var i = 0
    while (i < order.length) { tmp(i) = sign(i) * v(axis(i)); i += 1 }
    System.arraycopy(tmp, 0, v, 0, order.length)
    true
  }
  def inv(v: Array[Double]): Boolean = {
    val tmp = new Array[Double](order.length)
    var i = 0
    while (i < order.length) { tmp(axis(i)) = sign(i) * v(i); i += 1 }
    System.arraycopy(tmp, 0, v, 0, order.length)
    true
  }
}

/** Linear + angular unit conversion (the static subset of PROJ
  * `unitconvert`, /root/reference/src/conversions/unitconvert.cpp:455-560).
  * Angular in/out units tag the kernel's left/right so the column layer
  * knows when degree<->radian boundary conversion applies (mirrors the
  * reference setting PJ_IO_UNITS_RADIANS / _DEGREES). */
final case class UnitConvertKernel(fxy: Double, fz: Double,
                                   leftTag: IOUnits.Value,
                                   rightTag: IOUnits.Value,
                                   tIn: Int = -1, tOut: Int = -1)
    extends PointKernel {
  import TimeUnits._
  override def left = leftTag
  override def right = rightTag
  def fwd(v: Array[Double]): Boolean = {
    v(0) *= fxy; v(1) *= fxy; v(2) *= fz
    if (tIn >= 0) v(3) = toMjd(tIn, v(3))
    if (tOut >= 0) v(3) = fromMjd(tOut, v(3))
    true
  }
  def inv(v: Array[Double]): Boolean = {
    v(0) /= fxy; v(1) /= fxy; v(2) /= fz
    if (tOut >= 0) v(3) = toMjd(tOut, v(3))
    if (tIn >= 0) v(3) = fromMjd(tIn, v(3))
    true
  }
}

/** Epoch conversions through the modified Julian date (reference:
  * /root/reference/src/conversions/unitconvert.cpp:97-276). */
object TimeUnits {
  val ids: Map[String, Int] =
    Map("mjd" -> 0, "decimalyear" -> 1, "gps_week" -> 2, "yyyymmdd" -> 3)

  private def isLeap(year: Long): Boolean =
    (year % 4 == 0 && year % 100 != 0) || year % 400 == 0
  private def daysInYear(year: Long): Int = if (isLeap(year)) 366 else 365
  private val MonthTable = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private def daysInMonth(year: Long, monthIn: Long): Int = {
    val month = math.max(1L, math.min(12L, monthIn))
    val d = MonthTable(month.toInt - 1)
    if (isLeap(year) && month == 2) d + 1 else d
  }
  private def dayNumberInYear(year: Long, monthIn: Long, dayIn: Long): Int = {
    val month = math.max(1L, math.min(12L, monthIn))
    val day = math.min(dayIn, daysInMonth(year, month))
    var n = 0
    var i = 1L
    while (i < month) { n += daysInMonth(year, i); i += 1 }
    n + day.toInt
  }

  def toMjd(id: Int, t: Double): Double = id match {
    case 0 => t
    case 1 => // decimalyear (epoch 1858-11-16)
      if (!(t >= -10000 && t <= 10000)) 0.0
      else {
        val year = math.round(math.floor(t))
        val frac = t - year
        var mjd = (year - 1859) * 365.0 + 14 + 31
        mjd += frac * daysInYear(year)
        var y = year - 1
        while (y > 1858) { if (isLeap(y)) mjd += 1; y -= 1 }
        mjd
      }
    case 2 => 44244.0 + t * 7.0 // gps_week
    case _ => // yyyymmdd
      // bounded: a garbage value (1e18) would otherwise iterate the
      // year-by-year loop ~1e14 times and wedge the executor
      if (!(t >= 0 && t <= 99991231.0)) return Double.NaN
      val year = math.round(math.floor(t / 10000))
      val month = math.round(math.floor((t - year * 10000) / 100))
      val day = math.round(math.floor(t - year * 10000 - month * 100))
      var mjd: Double = dayNumberInYear(year, month, day)
      var y = year - 1
      while (y > 1858) { mjd += daysInYear(y); y -= 1 }
      mjd + 13 + 31
  }

  def fromMjd(id: Int, mjd: Double): Double = id match {
    case 0 => mjd
    case 1 =>
      // bounded (~year 11k): the year loop is linear in mjd and a bad
      // per-row value must fail in-band, not hang the task
      if (!(mjd >= -1e7 && mjd < 4e6)) return Double.NaN
      var mjdIter = 14.0 + 31
      var year = 1859
      while (mjd >= mjdIter) { mjdIter += daysInYear(year); year += 1 }
      year -= 1
      mjdIter -= daysInYear(year)
      year + (mjd - mjdIter) / daysInYear(year)
    case 2 => (mjd - 44244.0) / 7.0
    case _ =>
      if (!(mjd >= -1e7 && mjd < 4e6)) return Double.NaN
      var dateIter = 14 + 31
      var year = 1859
      val date = math.round(mjd).toInt
      while (date >= dateIter) { dateIter += daysInYear(year); year += 1 }
      year -= 1
      dateIter -= daysInYear(year)
      var month = 1
      while (dateIter + daysInMonth(year, month) <= date) {
        dateIter += daysInMonth(year, month); month += 1
      }
      val day = date - dateIter + 1
      year * 10000.0 + month * 100.0 + day
  }
}

object UnitConvertKernel {
  /** to-metre factors for the linear units PROJ registers */
  val linear: Map[String, Double] = Map(
    "m" -> 1.0, "km" -> 1000.0, "dm" -> 0.1, "cm" -> 0.01, "mm" -> 0.001,
    "ft" -> 0.3048, "us-ft" -> 1200.0 / 3937.0, "yd" -> 0.9144,
    "mi" -> 1609.344, "kmi" -> 1852.0, "in" -> 0.0254,
    "us-in" -> (1.0 / 39.37), "us-yd" -> (3 * 1200.0 / 3937.0),
    "us-ch" -> (66 * 1200.0 / 3937.0), "us-mi" -> (5280 * 1200.0 / 3937.0),
    "ind-yd" -> 0.91439523, "ind-ft" -> 0.30479841, "ind-ch" -> 20.11669506,
    "link" -> 0.201168, "ch" -> 20.1168, "fath" -> 1.8288)
  /** to-radian factors for angular units */
  val angular: Map[String, Double] = Map(
    "rad" -> 1.0, "deg" -> M.DegToRad, "grad" -> (math.Pi / 200.0),
    "arcsec" -> M.ArcSecToRad)

  /** Build from unit names / numeric factors exactly like the reference
    * setup: class consistency enforced, zero factors rejected, angular
    * units set the I/O tags. Returns Left(reason) on invalid config;
    * unknown names (e.g. time units) raise [[UnknownUnit]]. */
  final case class UnknownUnit(name: String) extends RuntimeException(name)

  def build(xyIn: Option[String], xyOut: Option[String],
            zIn: Option[String], zOut: Option[String]): Either[String, UnitConvertKernel] = {
    // (factor, isLinear: -1 unknown / 0 angular / 1 linear, tag)
    def resolve(u: String): (Double, Int, IOUnits.Value) =
      linear.get(u) match {
        case Some(f) => (f, 1, IOUnits.Whatever)
        case None => angular.get(u) match {
          case Some(f) =>
            val tag = if (u == "rad") IOUnits.Radians
                      else if (u == "deg") IOUnits.Degrees
                      else IOUnits.Whatever
            (f, 0, tag)
          case None =>
            val f = try u.toDouble catch {
              case _: NumberFormatException => throw UnknownUnit(u)
            }
            (f, -1, IOUnits.Whatever)
        }
      }
    var fxy = 1.0; var fz = 1.0
    var leftTag: IOUnits.Value = IOUnits.Whatever
    var rightTag: IOUnits.Value = IOUnits.Whatever
    var xyInLin = -1; var xyOutLin = -1; var zInLin = -1; var zOutLin = -1
    for (u <- xyIn) {
      val (f, l, tag) = resolve(u)
      if (f == 0.0 || 1.0 / f == 0.0) return Left(s"bad xy_in $u")
      fxy = f; xyInLin = l; leftTag = tag
    }
    for (u <- xyOut) {
      val (f, l, tag) = resolve(u)
      if (f == 0.0 || 1.0 / f == 0.0) return Left(s"bad xy_out $u")
      fxy /= f; xyOutLin = l; rightTag = tag
    }
    if (xyInLin >= 0 && xyOutLin >= 0 && xyInLin != xyOutLin)
      return Left("inconsistent unit type between xy_in and xy_out")
    for (u <- zIn) {
      val (f, l, _) = resolve(u)
      if (f == 0.0 || 1.0 / f == 0.0) return Left(s"bad z_in $u")
      fz = f; zInLin = l
    }
    for (u <- zOut) {
      val (f, l, _) = resolve(u)
      if (f == 0.0 || 1.0 / f == 0.0) return Left(s"bad z_out $u")
      fz /= f; zOutLin = l
    }
    if (zInLin >= 0 && zOutLin >= 0 && zInLin != zOutLin)
      return Left("inconsistent unit type between z_in and z_out")
    Right(UnitConvertKernel(fxy, fz, leftTag, rightTag))
  }

  def factor(u: String): Double =
    linear.getOrElse(u, angular.getOrElse(u,
      throw new IllegalArgumentException(s"unknown unit $u")))
}

/** Base for classic projections: handles PROJ's fwd_prepare / fwd_finalize
  * plumbing (/root/reference/src/fwd.cpp:40-189): latitude clamping,
  * central-meridian offset + longitude wrap on the way in; semimajor
  * scaling and false easting/northing on the way out. Kernels compute in
  * a=1 units. */
abstract class ProjectionKernel(val ell: Ellipsoid, val lam0: Double,
                                val x0: Double, val y0: Double)
    extends PointKernel {
  override def left = IOUnits.Radians
  override def right = IOUnits.Projected

  /** CLASSIC kernels emit planar coords in a=1 units (scaled by the
    * semimajor in finalize); PROJECTED kernels (s2) emit final units
    * (reference: fwd_finalize, /root/reference/src/fwd.cpp:156-166). */
  protected def classicOutput: Boolean = true

  /** `+over`: skip longitude wrapping, letting |lam - lam0| exceed pi
    * so world copies project beyond the +-180 seam (fwd_prepare /
    * inv_finalize adjlon skip in the reference). */
  protected def overFlag: Boolean = false

  /** inverse de-scaling factor (inv_prepare multiplies by P->ra) —
    * overridable because krovak reassigns P->a to Bessel AFTER init
    * computed ra from the user ellipsoid, so the reference's inverse
    * de-scales with the USER ra (quirk reproduced for fixture parity). */
  protected def invInputScale: Double = ell.ra

  /** angular (lam, phi) -> planar (x, y) in a=1 units; NaN x = error */
  protected def project(lam: Double, phi: Double): (Double, Double)
  /** planar (x, y) in a=1 units -> angular (lam, phi); NaN lam = error */
  protected def unproject(x: Double, y: Double): (Double, Double)

  /** raw kernel access for higher-order wrappers (ob_tran calls the
    * target's kernel directly, bypassing its prepare/finalize). */
  final def rawProject(lam: Double, phi: Double): (Double, Double) =
    project(lam, phi)
  final def rawUnproject(x: Double, y: Double): (Double, Double) =
    unproject(x, y)

  final def fwd(v: Array[Double]): Boolean = {
    var phi = v(1)
    if (math.abs(phi) > M.HalfPi) {
      if (math.abs(phi) - M.HalfPi > M.EpsLat) return false
      phi = if (phi > 0) M.HalfPi else -M.HalfPi
    }
    var lam = v(0)
    if (math.abs(lam) > 10.0) return false
    lam = if (overFlag) lam - lam0 else M.adjlon(M.adjlon(lam) - lam0)
    val (x, y) = project(lam, phi)
    if (java.lang.Double.isNaN(x)) return false
    val s = if (classicOutput) ell.a else 1.0
    v(0) = s * x + x0
    v(1) = s * y + y0
    true
  }

  final def inv(v: Array[Double]): Boolean = {
    val s = if (classicOutput) invInputScale else 1.0
    val x = (v(0) - x0) * s
    val y = (v(1) - y0) * s
    val (lam, phi) = unproject(x, y)
    if (java.lang.Double.isNaN(lam)) return false
    v(0) = if (overFlag) lam + lam0 else M.adjlon(lam + lam0)
    v(1) = phi
    true
  }

  protected final val err: (Double, Double) = (Double.NaN, Double.NaN)
}
