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

  private def fromB(a: Double, b: Double) = Ellipsoid(a, a / (a - b))

  /** Full published registry (values per /root/reference/src/ellps.cpp). */
  private val registry: Map[String, Ellipsoid] = Map(
    "merit"    -> Ellipsoid(6378137.0, 298.257),
    "sgs85"    -> Ellipsoid(6378136.0, 298.257),
    "grs80"    -> GRS80,
    "iau76"    -> Ellipsoid(6378140.0, 298.257),
    "airy"     -> Ellipsoid(6377563.396, 299.3249646),
    "apl4.9"   -> Ellipsoid(6378137.0, 298.25),
    "nwl9d"    -> Ellipsoid(6378145.0, 298.25),
    "mod_airy" -> fromB(6377340.189, 6356034.446),
    "andrae"   -> Ellipsoid(6377104.43, 300.0),
    "danish"   -> Ellipsoid(6377019.2563, 300.0),
    "aust_sa"  -> Ellipsoid(6378160.0, 298.25),
    "grs67"    -> Ellipsoid(6378160.0, 298.2471674270),
    "gsk2011"  -> Ellipsoid(6378136.5, 298.2564151),
    "bessel"   -> Bessel,
    "bess_nam" -> Ellipsoid(6377483.865, 299.1528128),
    "clrk66"   -> Clrk66,
    "clrk80"   -> Ellipsoid(6378249.145, 293.4663),
    "clrk80ign" -> Ellipsoid(6378249.2, 293.4660212936269),
    "cpm"      -> Ellipsoid(6375738.7, 334.29),
    "delmbr"   -> Ellipsoid(6376428.0, 311.5),
    "engelis"  -> Ellipsoid(6378136.05, 298.2566),
    "evrst30"  -> Ellipsoid(6377276.345, 300.8017),
    "evrst48"  -> Ellipsoid(6377304.063, 300.8017),
    "evrst56"  -> Ellipsoid(6377301.243, 300.8017),
    "evrst69"  -> Ellipsoid(6377295.664, 300.8017),
    "evrstss"  -> Ellipsoid(6377298.556, 300.8017),
    "fschr60"  -> Ellipsoid(6378166.0, 298.3),
    "fschr60m" -> Ellipsoid(6378155.0, 298.3),
    "fschr68"  -> Ellipsoid(6378150.0, 298.3),
    "helmert"  -> Ellipsoid(6378200.0, 298.3),
    "hough"    -> Ellipsoid(6378270.0, 297.0),
    "intl"     -> Intl,
    "krass"    -> Ellipsoid(6378245.0, 298.3),
    "kaula"    -> Ellipsoid(6378163.0, 298.24),
    "lerch"    -> Ellipsoid(6378139.0, 298.257),
    "mprts"    -> Ellipsoid(6397300.0, 191.0),
    "new_intl" -> fromB(6378157.5, 6356772.2),
    "plessis"  -> fromB(6376523.0, 6355863.0),
    "pz90"     -> Ellipsoid(6378136.0, 298.25784),
    "seasia"   -> fromB(6378155.0, 6356773.3205),
    "walbeck"  -> fromB(6376896.0, 6355834.8467),
    "wgs60"    -> Ellipsoid(6378165.0, 298.3),
    "wgs66"    -> Ellipsoid(6378145.0, 298.25),
    "wgs72"    -> Ellipsoid(6378135.0, 298.26),
    "wgs84"    -> WGS84)

  def byName(name: String): Option[Ellipsoid] = registry.get(name.toLowerCase)
}
