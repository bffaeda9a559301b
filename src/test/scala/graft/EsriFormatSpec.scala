package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{ProjString, Wkt, WktFormat}

/** ESRI WKT1 formatter round-trip: formatEsri(def) must parse back via
  * the ESRI-dialect aliases in [[Wkt]] to a kernel numerically identical
  * to the original definition (the reference's WKT1_ESRI convention:
  * GCS_/D_ name prefixes, one Lambert_Conformal_Conic name for both SP
  * forms, hemisphere-specific polar stereographic methods, the
  * Mercator_Auxiliary_Sphere spelling of Web Mercator). */
class EsriFormatSpec extends AnyFunSuite {

  private val samples = Seq(
    (0.12, 0.65), (-0.8, -0.4), (1.9, 0.1), (0.01, -1.2), (2.8, 1.05))

  private def roundTrip(defStr: String, tol: Double = 1e-9): String = {
    val wkt = WktFormat.formatEsri(defStr)
    val back = Wkt.parseCrs(wkt).projString
    val k1 = ProjString.parse(defStr)
    val k2 = ProjString.parse(back)
    for ((lam, phi) <- samples) {
      val a = Array(lam, phi, 0.0, 0.0)
      val b = Array(lam, phi, 0.0, 0.0)
      val ok1 = k1.fwd(a); val ok2 = k2.fwd(b)
      assert(ok1 == ok2, s"fwd status diverged at ($lam,$phi) for $defStr")
      if (ok1) {
        val scale = math.max(1.0, math.max(math.abs(a(0)), math.abs(a(1))))
        assert(math.abs(a(0) - b(0)) <= tol * scale,
          s"x ${a(0)} vs ${b(0)} for $defStr\nESRI:\n$wkt\nback: $back")
        assert(math.abs(a(1) - b(1)) <= tol * scale,
          s"y ${a(1)} vs ${b(1)} for $defStr\nback: $back")
      }
    }
    wkt
  }

  test("geographic: GCS_/D_ naming") {
    val wkt = roundTrip("+proj=longlat +datum=WGS84")
    assert(wkt.contains("GEOGCS[\"GCS_WGS84\"") && wkt.contains("D_WGS84"), wkt)
    assert(wkt.contains("UNIT[\"Degree\""), wkt)
  }

  test("web mercator exports as Mercator_Auxiliary_Sphere") {
    val wkt = roundTrip("+proj=webmerc +ellps=WGS84")
    assert(wkt.contains("Mercator_Auxiliary_Sphere"), wkt)
    assert(wkt.contains("Auxiliary_Sphere_Type"), wkt)
  }

  test("both LCC forms share the single ESRI name") {
    val one = roundTrip("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 " +
      "+k_0=0.99987742 +x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356515")
    assert(one.contains("Lambert_Conformal_Conic") &&
      one.contains("\"Standard_Parallel_1\",46.8"), one)
    val two = roundTrip("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=44 +lon_0=-91.86 +ellps=clrk66")
    assert(two.contains("\"Standard_Parallel_2\",77"), two)
  }

  test("polar stereographic splits into hemisphere methods") {
    assert(roundTrip("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84")
      .contains("Stereographic_North_Pole"))
    assert(roundTrip("+proj=stere +lat_0=-90 +lat_ts=-71 +ellps=WGS84")
      .contains("Stereographic_South_Pole"))
    assert(roundTrip("+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 " +
      "+y_0=2000000 +ellps=WGS84").contains("\"Stereographic\""))
    // hemisphere comes from lat_0 (the method name carries the pole), so
    // an equatorial or cross-hemisphere lat_ts still round-trips exactly
    assert(roundTrip("+proj=stere +lat_0=-90 +lat_ts=0 +ellps=WGS84")
      .contains("Stereographic_South_Pole"))
  }

  test("mercator variant B, UTM expansion, equal-area and misc methods") {
    assert(roundTrip("+proj=merc +lat_ts=42 +lon_0=51 +ellps=krass")
      .contains("PROJECTION[\"Mercator\"]"))
    roundTrip("+proj=utm +zone=31 +ellps=WGS84")
    roundTrip("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=GRS80")
    roundTrip("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80")
    roundTrip("+proj=sterea +lat_0=52.15616055 +lon_0=5.38763888 " +
      "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
    roundTrip("+proj=eqc +lat_ts=30 +lon_0=11 +ellps=WGS84")
    val om = roundTrip("+proj=omerc +no_uoff +lat_0=4 +lonc=115 " +
      "+alpha=53.31582047 +gamma=53.13010236 +k=0.99984 +ellps=evrstSS")
    assert(om.contains("Hotine_Oblique_Mercator_Azimuth_Natural_Origin") &&
      om.contains("\"Longitude_Of_Center\",115"), om)
  }

  test("ESRI text stands anywhere CRS text can: the operation factory consumes it") {
    val esri = WktFormat.formatEsri("+proj=utm +zone=31 +ellps=WGS84")
    val k = graft.geo.proj.OperationFactory.crsToCrs(esri, "EPSG:4326")
    val ref = graft.geo.proj.OperationFactory.crsToCrs("EPSG:32631", "EPSG:4326")
    val a = Array(500000.0, 5500000.0, 0.0, 0.0)
    val b = a.clone()
    assert(k.fwd(a) && ref.fwd(b))
    assert(math.abs(a(0) - b(0)) < 1e-9 && math.abs(a(1) - b(1)) < 1e-9,
      s"factory diverges on ESRI input: (${a(0)},${a(1)}) vs (${b(0)},${b(1)})")
  }

  test("unrepresentable definitions are rejected, not approximated") {
    intercept[ProjString.Unsupported] { // no TOWGS84 slot in ESRI WKT
      WktFormat.formatEsri("+proj=longlat +ellps=bessel +towgs84=1,2,3")
    }
    intercept[ProjString.Unsupported] { // Mercator variant A has no ESRI name
      WktFormat.formatEsri("+proj=merc +k=0.997 +lon_0=110 +ellps=bessel")
    }
    intercept[ProjString.Unsupported] { // ESRI Krovak needs X_Scale/Y_Scale extras
      WktFormat.formatEsri("+proj=krovak +lat_0=49.5 +lonc=24.83 +alpha=30.29 " +
        "+k=0.9999 +axis=swu +ellps=bessel")
    }
  }
}
