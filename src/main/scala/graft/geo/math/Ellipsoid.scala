package graft.geo.math

/** Reference ellipsoid with every derived constant the projection kernels
  * need, precomputed once at construction (the setup/apply split described
  * in SURVEY.md §4.4; cf. /root/reference/src/ell_set.cpp and the derived
  * members of PJconsts, /root/reference/src/proj_internal.h:548-580).
  *
  * All kernels downstream treat these as immutable driver-side constants
  * that get serialized into the Catalyst expression tree.
  */
final case class Ellipsoid(a: Double, rf: Double) extends Serializable {
  /** flattening (0 for a sphere) */
  val f: Double = if (rf == 0.0) 0.0 else 1.0 / rf
  val b: Double = a * (1.0 - f)
  /** eccentricity squared */
  val es: Double = f * (2.0 - f)
  val e: Double = math.sqrt(es)
  val oneEs: Double = 1.0 - es
  val rOneEs: Double = 1.0 / oneEs
  /** second eccentricity squared e'^2 = es/(1-es) */
  val e2s: Double = es / oneEs
  /** third flattening n = (a-b)/(a+b) = f/(2-f) */
  val n: Double = f / (2.0 - f)
  val ra: Double = 1.0 / a
  def isSphere: Boolean = es == 0.0
}

object Ellipsoid {
  // Canonical parameter values per the published EPSG / proj registry
  // (cf. /root/reference/src/ellps.cpp).
  val WGS84  = Ellipsoid(6378137.0, 298.257223563)
  val GRS80  = Ellipsoid(6378137.0, 298.257222101)
  val Intl   = Ellipsoid(6378388.0, 297.0)          // "intl" / Hayford 1909
  val Bessel = Ellipsoid(6377397.155, 299.1528128)
  val Clrk66 = Ellipsoid(6378206.4, 294.9786982138982) // derived from b
  val SphereGoogle = Ellipsoid(6378137.0, 0.0)      // webmerc sphere
  val UnitSphere   = Ellipsoid(1.0, 0.0)

  def byName(name: String): Option[Ellipsoid] = name.toLowerCase match {
    case "wgs84"   => Some(WGS84)
    case "grs80"   => Some(GRS80)
    case "intl"    => Some(Intl)
    case "bessel"  => Some(Bessel)
    case "clrk66"  => Some(Clrk66)
    case _         => None
  }
}
