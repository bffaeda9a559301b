package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{ProjString, Wkt, WktFormat}

/** Classic WKT1 formatter round-trip: formatWkt1(def) must parse back
  * (via [[Wkt]]'s WKT1 path) to a kernel numerically identical to the
  * original definition — the GDAL-interchange dialect with DATUM-level
  * TOWGS84, unitless parameters in base-CRS degrees / map units, and the
  * classic method vocabulary (Mercator_1SP/2SP,
  * Lambert_Conformal_Conic_*, Polar_Stereographic with
  * latitude_of_origin as true-scale lat).  Behavioral reference: the
  * reference's WKT1_GDAL formatter mode
  * (/root/reference/src/iso19111/io.cpp, Convention::WKT1_GDAL). */
class Wkt1FormatSpec extends AnyFunSuite {

  private val samples = Seq(
    (0.12, 0.65), (-0.8, -0.4), (1.9, 0.1), (0.01, -1.2), (2.8, 1.05))

  private def roundTrip(defStr: String, tol: Double = 1e-9): String = {
    val wkt = WktFormat.formatWkt1(defStr)
    assert(wkt.startsWith("GEOGCS") || wkt.startsWith("PROJCS"), wkt)
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
          s"x ${a(0)} vs ${b(0)} for $defStr\nWKT1:\n$wkt\nback: $back")
        assert(math.abs(a(1) - b(1)) <= tol * scale,
          s"y ${a(1)} vs ${b(1)} for $defStr\nback: $back")
      }
    }
    wkt
  }

  test("geographic round-trips with DATUM-level TOWGS84") {
    roundTrip("+proj=longlat +ellps=GRS80")
    roundTrip("+proj=longlat +datum=WGS84")
    val wkt = roundTrip(
      "+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320 +pm=paris")
    assert(wkt.contains("TOWGS84[-168,-60,320,0,0,0,0]"), wkt)
    assert(!wkt.contains("BOUNDCRS"), "WKT1 spells the bridge inside DATUM")
  }

  test("conformal family: classic 1SP/2SP method names") {
    assert(roundTrip("+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +ellps=bessel")
      .contains("Mercator_1SP"))
    assert(roundTrip("+proj=merc +lat_ts=42 +lon_0=51 +ellps=krass")
      .contains("Mercator_2SP"))
    assert(roundTrip("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 " +
        "+k_0=0.99987742 +x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356515")
      .contains("Lambert_Conformal_Conic_1SP"))
    assert(roundTrip("+proj=lcc +lat_1=49 +lat_2=77 +lon_0=-91.86 +ellps=clrk66")
      .contains("Lambert_Conformal_Conic_2SP"))
    roundTrip("+proj=utm +zone=32 +ellps=GRS80")
    roundTrip("+proj=utm +zone=54 +south +ellps=GRS80")
  }

  test("polar stereographic collapses to the WKT1 latitude_of_origin form") {
    val b = roundTrip("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84")
    assert(b.contains("Polar_Stereographic") &&
      b.contains("\"latitude_of_origin\",70"), b)
    val s = roundTrip("+proj=stere +lat_0=-90 +lat_ts=-71 +ellps=WGS84")
    assert(s.contains("\"latitude_of_origin\",-71"), s)
    val a = roundTrip("+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 +y_0=2000000 +ellps=WGS84")
    assert(a.contains("\"scale_factor\",0.994"), a)
    // +k alongside lat_ts is dead (the kernel ignores it) and must NOT be
    // emitted — an exported k!=1 would defeat the polarWkt1 re-import rule
    val dead = roundTrip("+proj=stere +lat_0=90 +lat_ts=70 +k=0.994 +ellps=WGS84")
    assert(!dead.contains("scale_factor"), dead)
    // a true-scale latitude across the equator from its pole has no WKT1
    // spelling (the sign of latitude_of_origin re-derives the pole)
    intercept[ProjString.Unsupported] {
      WktFormat.formatWkt1("+proj=stere +lat_0=-90 +lat_ts=5 +ellps=WGS84")
    }
  }

  test("azimuthal / equal-area / misc methods round-trip") {
    roundTrip("+proj=sterea +lat_0=52.15616055 +lon_0=5.38763888 " +
      "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
    roundTrip("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=GRS80")
    roundTrip("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80")
    roundTrip("+proj=aeqd +lat_0=40 +lon_0=-100 +ellps=WGS84")
    roundTrip("+proj=cass +lat_0=10.44 +lon_0=-61.33 +ellps=intl")
    roundTrip("+proj=eqc +lat_ts=30 +lon_0=11 +ellps=WGS84")
    roundTrip("+proj=webmerc +ellps=WGS84")
    roundTrip("+proj=omerc +no_uoff +lat_0=4 +lonc=115 +alpha=53.31582047 " +
      "+gamma=53.13010236 +k=0.99984 +ellps=evrstSS")
    roundTrip("+proj=krovak +lat_0=49.5 +lonc=24.83333333333333 " +
      "+alpha=30.28813972222222 +k=0.9999 +axis=swu +ellps=bessel")
  }

  test("non-metre projected units spell linear parameters in map units") {
    val wkt = roundTrip("+proj=tmerc +lat_0=0 +lon_0=-87 +k=0.9996 " +
      "+x_0=500000.0001016 +y_0=0 +ellps=GRS80 +units=us-ft")
    // 500000.0001016 m = 1640416.666999... US survey feet
    assert(wkt.contains("us-ft"), wkt)
    assert(wkt.matches("(?s).*\"false_easting\",1640416\\.66.*"), wkt)
  }

  test("EPSG codes and pipelines behave like the WKT2 renderer") {
    assert(WktFormat.formatWkt1("EPSG:32631").contains("Transverse_Mercator"))
    intercept[ProjString.Unsupported] {
      WktFormat.formatWkt1("+proj=pipeline +step +proj=noop")
    }
    intercept[ProjString.Unsupported] { WktFormat.formatWkt1("+proj=cart +ellps=GRS80") }
  }
}
