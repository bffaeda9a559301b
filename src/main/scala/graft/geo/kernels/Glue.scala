package graft.geo.kernels

import graft.geo.math.{Ellipsoid, ProjMath => M}

/** The "cs2cs emulation" wrapper around a core operation — the engine's
  * analogue of the reference's fwd_prepare/fwd_finalize datum-and-units
  * glue (/root/reference/src/fwd.cpp:40-189, inv.cpp mirrored):
  *
  *  fwd  =  [geoc⁻¹] → [nadgrids⁻¹ | cart_wgs84∘helmert⁻¹∘cart⁻¹] →
  *          [geoidgrids] → [pm offset] → core.fwd →
  *          [unit scaling fr/vfr] → [axisswap]
  *  inv  =  exact mirror.
  *
  * Datum glue applies only when the core's forward input is angular
  * (radians), matching the reference's INPUT_UNITS == RADIANS gate; the
  * builder in [[graft.geo.proj.ProjString]] enforces that.  Unit scaling
  * switches on the core's output tag: CARTESIAN scales x,y,z by frMeter;
  * PROJECTED scales x,y by frMeter and z by vfrMeter; RADIANS scales only
  * z by vfrMeter.
  */
final case class GlueKernel(
    core: PointKernel,
    hshift: Option[HgridshiftGlue] = None,
    vshift: Option[PointKernel] = None,
    cartWgs: Option[CartKernel] = None,
    helmert: Option[HelmertKernel] = None,
    cartLocal: Option[CartKernel] = None,
    geoc: Option[GeocLatKernel] = None,
    axisswap: Option[AxisSwapKernel] = None,
    frMeter: Double = 1.0,
    vfrMeter: Double = 1.0,
    fromGreenwich: Double = 0.0,
    longWrapCenter: Double = Double.NaN,
    over: Boolean = false) extends PointKernel {

  override def left: IOUnits.Value = core.left
  override def right: IOUnits.Value = core.right
  override def invertible: Boolean = core.invertible

  private val datumOnRadians = core.left == IOUnits.Radians

  def fwd(v: Array[Double]): Boolean = {
    if (datumOnRadians) {
      // fwd_prepare longitude check (fwd.cpp:70-82): reject |lam| > 10,
      // wrap into -pi..pi (unless +over) BEFORE the datum ops — the grid
      // lookups below would otherwise miss their extents for a longitude
      // just past the antimeridian
      if (math.abs(v(0)) > math.Pi) {
        if (math.abs(v(0)) > 10) return false
        if (!over) v(0) = M.adjlon(v(0))
      }
      for (g <- geoc) if (!g.inv(v)) return false
      hshift match {
        case Some(h) => if (!h.k.inv(v)) return false
        case None =>
          if (cartWgs.isDefined) {
            if (!cartWgs.get.fwd(v)) return false
            for (h <- helmert) if (!h.inv(v)) return false
            if (!cartLocal.get.inv(v)) return false
          }
      }
      for (vg <- vshift) if (!vg.fwd(v)) return false
      if (fromGreenwich != 0.0) v(0) = M.adjlon(v(0) - fromGreenwich)
    }
    if (!core.fwd(v)) return false
    finalizeFwd(v)
    for (as <- axisswap) as.fwd(v)
    true
  }

  def inv(v: Array[Double]): Boolean = {
    for (as <- axisswap) as.inv(v)
    unfinalize(v)
    if (!core.inv(v)) return false
    if (datumOnRadians) {
      if (fromGreenwich != 0.0) v(0) = M.adjlon(v(0) + fromGreenwich)
      for (vg <- vshift) if (!vg.inv(v)) return false
      hshift match {
        case Some(h) => if (!h.k.fwd(v)) return false
        case None =>
          if (cartWgs.isDefined) {
            if (!cartLocal.get.fwd(v)) return false
            for (h <- helmert) if (!h.fwd(v)) return false
            if (!cartWgs.get.inv(v)) return false
          }
      }
      for (g <- geoc) if (!g.fwd(v)) return false
    }
    true
  }

  private def finalizeFwd(v: Array[Double]): Unit = core.right match {
    case IOUnits.Cartesian =>
      v(0) *= frMeter; v(1) *= frMeter; v(2) *= frMeter
    case IOUnits.Radians =>
      v(2) *= vfrMeter
      // +lon_wrap re-centering (fwd_finalize RADIANS branch, fwd.cpp:175-181)
      if (!longWrapCenter.isNaN)
        v(0) = longWrapCenter + M.adjlon(v(0) - longWrapCenter)
    // WHATEVER and DEGREES outputs are untouched (fwd.cpp:168-172:
    // both cases are a bare `break` — scaling a Whatever core or
    // radian-wrapping a degrees-valued longitude corrupts the result)
    case IOUnits.Whatever | IOUnits.Degrees =>
    case _ => // Projected / Classic-style
      v(0) *= frMeter; v(1) *= frMeter; v(2) *= vfrMeter
  }

  private def unfinalize(v: Array[Double]): Unit = core.right match {
    case IOUnits.Cartesian =>
      v(0) /= frMeter; v(1) /= frMeter; v(2) /= frMeter
    case IOUnits.Radians =>
      v(2) /= vfrMeter
    case IOUnits.Whatever | IOUnits.Degrees =>
    case _ =>
      v(0) /= frMeter; v(1) /= frMeter; v(2) /= vfrMeter
  }
}

/** Small wrapper marking the nadgrids kernel so GlueKernel's signature
  * stays self-documenting (the glue applies it INVERSE on forward —
  * nadgrids go from the local datum to WGS84, fwd.cpp:94-97). */
final case class HgridshiftGlue(k: PointKernel) extends Serializable

object Glue {
  /** datum registry (reference: /root/reference/src/datums.cpp:40-61);
    * definition + implied ellipsoid name */
  val datums: Map[String, (String, String)] = Map(
    "WGS84" -> ("towgs84=0,0,0", "WGS84"),
    "GGRS87" -> ("towgs84=-199.87,74.79,246.62", "GRS80"),
    "NAD83" -> ("towgs84=0,0,0", "GRS80"),
    "NAD27" -> ("nadgrids=@conus,@alaska,@ntv2_0.gsb,@ntv1_can.dat", "clrk66"),
    "potsdam" -> ("nadgrids=@BETA2007.gsb", "bessel"),
    "carthage" -> ("towgs84=-263.0,6.0,431.0", "clrk80ign"),
    "hermannskogel" -> ("towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232", "bessel"),
    "ire65" -> ("towgs84=482.530,-130.596,564.557,-1.042,-0.214,-0.631,8.15", "mod_airy"),
    "nzgd49" -> ("towgs84=59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993", "intl"),
    "OSGB36" -> ("towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894", "airy"))

  /** prime meridians (reference: /root/reference/src/datums.cpp:70-87),
    * degrees east of Greenwich */
  val primeMeridians: Map[String, String] = Map(
    "greenwich" -> "0dE",
    "lisbon" -> "9d07'54.862\"W",
    "paris" -> "2d20'14.025\"E",
    "bogota" -> "74d04'51.3\"W",
    "madrid" -> "3d41'16.58\"W",
    "rome" -> "12d27'8.4\"E",
    "bern" -> "7d26'22.5\"E",
    "jakarta" -> "106d48'27.79\"E",
    "ferro" -> "17d40'W",
    "brussels" -> "4d22'4.71\"E",
    "stockholm" -> "18d3'29.8\"E",
    "athens" -> "23d42'58.815\"E",
    "oslo" -> "10d43'22.5\"E",
    "copenhagen" -> "12d34'40.35\"E")

  /** towgs84 string -> Helmert kernel (position_vector convention;
    * rotations arc-seconds, scale ppm — reference cs2cs emulation,
    * src/init.cpp pj_datum_set + transformations/helmert.cpp). Returns
    * None for a pure 0,0,0 translation (identity — the cart pair still
    * applies, matching "+towgs84=0,0,0 still implies cart"). */
  def helmertOfTowgs84(spec: String): Option[HelmertKernel] = {
    val parts = spec.split(',').map(_.trim.toDouble)
    require(parts.length == 3 || parts.length == 7,
      s"towgs84 needs 3 or 7 values, got ${parts.length}")
    if (parts.forall(_ == 0.0)) None
    else if (parts.length == 3)
      Some(HelmertKernel(x = parts(0), y = parts(1), z = parts(2)))
    else {
      val as = M.ArcSecToRad
      Some(HelmertKernel(
        x = parts(0), y = parts(1), z = parts(2),
        rx = parts(3) * as, ry = parts(4) * as, rz = parts(5) * as,
        s = parts(6), positionVector = true))
    }
  }

  /** `+axis=` string -> axisswap order ints (reference:
    * src/conversions/axisswap.cpp:64-131 — e/w/n/s/u/d with sign). */
  def axisOrder(axis: String): Option[Array[Int]] = {
    require(axis.length == 3, s"axis must have 3 characters: $axis")
    val order = axis.map {
      case 'e' => 1
      case 'w' => -1
      case 'n' => 2
      case 's' => -2
      case 'u' => 3
      case 'd' => -3
      case c => throw new IllegalArgumentException(s"bad axis letter $c")
    }.toArray
    val abs = order.map(math.abs).sorted
    require(abs.sameElements(Array(1, 2, 3)), s"axis must name e/w, n/s, u/d once: $axis")
    if (order.sameElements(Array(1, 2, 3))) None else Some(order)
  }

  /** Parse a to_meter-style value with optional ratio ("2000/2"),
    * rejecting non-positive results (reference: src/init.cpp:693-753). */
  def parseToMeter(s: String): Double = {
    val slash = s.indexOf('/')
    val v =
      if (slash < 0) s.toDouble
      else {
        val num = s.substring(0, slash).toDouble
        val den = s.substring(slash + 1).toDouble
        require(den != 0.0, "zero denominator")
        num / den
      }
    require(v > 0.0 && !v.isInfinite, s"invalid to_meter $s")
    v
  }
}
