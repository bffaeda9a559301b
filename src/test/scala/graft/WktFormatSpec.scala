package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{OperationFactory, ProjString, Wkt, WktFormat}

/** WKT2 formatter round-trip: format(def) must parse back (via [[Wkt]])
  * to a kernel that is numerically identical to the original definition —
  * projection parameters, ellipsoid, prime meridian, units, axis
  * conventions and the towgs84 BOUNDCRS bridge all survive. */
class WktFormatSpec extends AnyFunSuite {

  private val samples = Seq(
    (0.12, 0.65), (-0.8, -0.4), (1.9, 0.1), (0.01, -1.2), (2.8, 1.05))

  /** compare def -> kernel vs def -> WKT -> CRS -> kernel on radian
    * samples (forward), relative tolerance. */
  private def roundTrip(defStr: String, tol: Double = 1e-9): Unit = {
    val wkt = WktFormat.format(defStr)
    assert(Wkt.looksLikeWkt(wkt), s"not WKT?\n$wkt")
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
          s"x ${a(0)} vs ${b(0)} for $defStr\nWKT:\n$wkt\nback: $back")
        assert(math.abs(a(1) - b(1)) <= tol * scale,
          s"y ${a(1)} vs ${b(1)} for $defStr\nback: $back")
      }
    }
  }

  test("geographic / geocentric round-trips") {
    roundTrip("+proj=longlat +ellps=GRS80")
    roundTrip("+proj=longlat +datum=WGS84")
    roundTrip("+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320 +pm=paris")
    roundTrip("+proj=cart +ellps=GRS80")
  }

  test("UTM is exported as its Transverse Mercator expansion") {
    roundTrip("+proj=utm +zone=32 +ellps=GRS80", tol = 1e-9)
    roundTrip("+proj=utm +zone=54 +south +ellps=GRS80", tol = 1e-9)
    val wkt = WktFormat.format("+proj=utm +zone=32 +ellps=GRS80")
    assert(wkt.contains("Transverse Mercator"))
    assert(wkt.contains("\"Longitude of natural origin\",9,"))
    assert(wkt.contains("\"Scale factor at natural origin\",0.9996,"))
  }

  test("projected method round-trips (conformal family)") {
    roundTrip("+proj=tmerc +lat_0=0 +lon_0=21 +k=1 +x_0=0 +y_0=0 +axis=wsu +ellps=WGS84")
    roundTrip("+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 +ellps=bessel")
    roundTrip("+proj=merc +lat_ts=42 +lon_0=51 +ellps=krass")
    roundTrip("+proj=webmerc +ellps=WGS84")
    roundTrip("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 +k_0=0.99987742" +
      " +x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356515")
    roundTrip("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 +x_0=0 +y_0=0 +ellps=clrk66")
    roundTrip("+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889" +
      " +k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
    roundTrip("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +ellps=WGS84")
    roundTrip("+proj=stere +lat_0=-90 +k=0.994 +x_0=2000000 +y_0=2000000 +ellps=WGS84")
    roundTrip("+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333" +
      " +k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel")
    roundTrip("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31580995 +k=0.99984" +
      " +no_uoff +gamma=53.13010236111111 +ellps=GRS80")
  }

  test("projected method round-trips (equal-area / misc)") {
    roundTrip("+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 +ellps=GRS80")
    roundTrip("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80")
    roundTrip("+proj=eqc +lat_ts=30 +lon_0=15 +ellps=WGS84")
    roundTrip("+proj=cass +lat_0=2.12 +lon_0=103.42 +x_0=-14810.562 +y_0=8758.32 +ellps=GRS80")
    roundTrip("+proj=moll +lon_0=10 +ellps=WGS84")
    roundTrip("+proj=eck4 +lon_0=0 +ellps=WGS84")
  }

  test("non-metre units survive as LENGTHUNIT") {
    val d = "+proj=lcc +lat_1=41.78333333333333 +lat_2=40.71666666666667" +
      " +lat_0=40.33333333333334 +lon_0=-111.5 +x_0=500000.00001016" +
      " +y_0=1000000.00001016 +ellps=GRS80 +units=us-ft"
    // x_0/y_0 in proj-strings are metres even under +units; the WKT export
    // spells them in metres and the projected unit separately
    roundTrip(d, tol = 1e-9)
    assert(WktFormat.format(d).contains("us-ft"))
  }

  test("towgs84 exports as a BOUNDCRS that the operation factory consumes") {
    val d = "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333" +
      " +k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel +towgs84=674.374,15.056,405.346"
    val wkt = WktFormat.format(d)
    assert(wkt.startsWith("BOUNDCRS["))
    assert(Wkt.parseCrs(wkt).projString.contains("+towgs84=674.374,15.056,405.346"))
    // full numeric parity through the factory against the raw definition
    val k1 = OperationFactory.crsToCrs(d, "EPSG:4326")
    val k2 = OperationFactory.crsToCrs(wkt, "EPSG:4326")
    val a = Array(2600000.0, 1200000.0, 0.0, 0.0)
    val b = a.clone()
    assert(k1.fwd(a) && k2.fwd(b))
    assert(math.abs(a(0) - b(0)) < 1e-10 && math.abs(a(1) - b(1)) < 1e-10)
  }

  test("seven-parameter bridges keep rotations and scale (ppm <-> ratio)") {
    val d = "+proj=longlat +ellps=bessel" +
      " +towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232"
    val wkt = WktFormat.format(d)
    assert(wkt.contains("\"Scale difference\",1.0000024232,"))
    val back = Wkt.parseCrs(wkt).projString
    val xs = back.split("\\+towgs84=")(1).split(" ")(0).split(",").map(_.toDouble)
    assert(xs.length == 7)
    assert(math.abs(xs(3) - 5.137) < 1e-12)
    assert(math.abs(xs(6) - 2.4232) < 1e-9)
  }

  test("authority codes format directly; grids are rejected honestly") {
    assert(WktFormat.format("EPSG:32631").contains("Transverse Mercator"))
    intercept[ProjString.Unsupported] {
      WktFormat.format("+proj=longlat +ellps=bessel +nadgrids=@BETA2007.gsb")
    }
    intercept[ProjString.Unsupported] {
      WktFormat.format("+proj=pipeline +step +proj=utm +zone=31 +ellps=WGS84")
    }
  }
}
