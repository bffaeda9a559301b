package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{EpsgInit, OperationFactory, ProjString}

/** Validation of the widely-used EPSG codes added to the builtin table
  * (the classic proj.4 epsg-init definitions).  Projected codes are
  * checked by their natural-origin identity — the projection's origin
  * (lat_0/lon_0) must map exactly to the false origin (x_0, y_0), which
  * pins the parameter transcription — plus fwd∘inv closure at regional
  * probe points and a datum-bridge sanity check against WGS84. */
class EpsgTableSpec extends AnyFunSuite {

  /** fwd the RAW projection of a code (datum bridge stripped — the
    * origin identity pins the projection parameters, not the shift) at
    * (lon, lat) degrees. */
  private def fwdRaw(code: String, lon: Double, lat: Double): (Double, Double) = {
    val defn = EpsgInit.lookup(code.toLowerCase).getOrElse(fail(s"no $code"))
      .split(' ').filterNot(_.startsWith("+towgs84")).mkString(" ")
    val k = ProjString.parse(defn)
    val v = Array(math.toRadians(lon), math.toRadians(lat), 0.0, 0.0)
    assert(k.fwd(v), s"fwd failed for $code at ($lon,$lat)")
    (v(0), v(1))
  }

  private def assertOrigin(code: String, lon0: Double, lat0: Double,
                           x0: Double, y0: Double): Unit = {
    val (x, y) = fwdRaw(code, lon0, lat0)
    assert(math.abs(x - x0) < 1e-6 && math.abs(y - y0) < 1e-6,
      s"$code natural origin maps to ($x,$y), expected ($x0,$y0)")
  }

  private def assertRoundtrip(code: String, pts: Seq[(Double, Double)]): Unit = {
    val k = ProjString.parse(code)
    for ((lon, lat) <- pts) {
      val v = Array(math.toRadians(lon), math.toRadians(lat), 0.0, 0.0)
      assert(k.fwd(v) && k.inv(v), s"$code roundtrip failed at ($lon,$lat)")
      assert(math.abs(math.toDegrees(v(0)) - lon) < 1e-9 &&
             math.abs(math.toDegrees(v(1)) - lat) < 1e-9,
        s"$code roundtrip drift at ($lon,$lat): " +
          s"(${math.toDegrees(v(0))},${math.toDegrees(v(1))})")
    }
  }

  test("projected codes: natural-origin identities pin the transcription") {
    assertOrigin("EPSG:27700", -2.0, 49.0, 400000.0, -100000.0)
    assertOrigin("EPSG:2154", 3.0, 46.5, 700000.0, 6600000.0)
    assertOrigin("EPSG:2193", 173.0, 0.0, 1600000.0, 10000000.0)
    assertOrigin("EPSG:3035", 10.0, 52.0, 4321000.0, 3210000.0)
    assertOrigin("EPSG:2056", 7.439583333333333, 46.95240555555556,
      2600000.0, 1200000.0)
    assertOrigin("EPSG:21781", 7.439583333333333, 46.95240555555556,
      600000.0, 200000.0)
    assertOrigin("EPSG:5070", -96.0, 23.0, 0.0, 0.0)
    assertOrigin("EPSG:3395", 0.0, 0.0, 0.0, 0.0)
    assertOrigin("EPSG:6933", 0.0, 0.0, 0.0, 0.0)
    assertOrigin("EPSG:3031", 100.0, -90.0, 0.0, 0.0) // pole -> false origin
    assertOrigin("EPSG:3413", 100.0, 90.0, 0.0, 0.0)
    assertOrigin("EPSG:32661", 100.0, 90.0, 2000000.0, 2000000.0)
    assertOrigin("EPSG:32761", 100.0, -90.0, 2000000.0, 2000000.0)
  }

  test("projected codes: fwd-inverse closure at regional points") {
    assertRoundtrip("EPSG:27700", Seq((-2.0, 49.0), (-5.2, 50.0), (1.3, 52.6)))
    assertRoundtrip("EPSG:2154", Seq((2.35, 48.85), (-4.5, 48.4), (7.7, 48.6)))
    assertRoundtrip("EPSG:2193", Seq((174.76, -36.85), (168.66, -45.03)))
    assertRoundtrip("EPSG:3035", Seq((10.0, 52.0), (-8.0, 37.0), (25.0, 60.0)))
    assertRoundtrip("EPSG:2056", Seq((7.44, 46.95), (8.54, 47.38)))
    assertRoundtrip("EPSG:3031", Seq((0.0, -71.0), (166.67, -77.85)))
    assertRoundtrip("EPSG:3413", Seq((-45.0, 70.0), (-18.0, 64.1)))
    assertRoundtrip("EPSG:5070", Seq((-96.0, 40.0), (-122.3, 37.8)))
    assertRoundtrip("EPSG:6933", Seq((0.0, 30.0), (151.2, -33.9)))
  }

  test("datum bridges: factory pipelines to WGS84 apply the classic shift") {
    // OSGB36 -> WGS84 at Greenwich: the 7-param shift moves the point by
    // roughly 100-130 m (the well-known OSGB/WGS84 offset scale)
    // factory kernels take/return degrees (cs2cs convention)
    val k = OperationFactory.crsToCrs("EPSG:4277", "EPSG:4326")
    val v = Array(0.0, 51.4778, 0.0, 0.0)
    assert(k.fwd(v))
    val meters = math.hypot(
      (v(0) - 0.0) * 111320.0 * math.cos(math.toRadians(51.5)),
      (v(1) - 51.4778) * 110574.0)
    assert(meters > 80 && meters < 160, s"OSGB shift $meters m")
    // zero-bridge datums coincide with WGS84 exactly
    val id = OperationFactory.crsToCrs("EPSG:4171", "EPSG:4326")
    val w = Array(2.35, 48.85, 0.0, 0.0)
    assert(id.fwd(w))
    assert(math.abs(w(0) - 2.35) < 1e-12 && math.abs(w(1) - 48.85) < 1e-12)
  }

  test("every builtin table entry parses and is 2D-invertible near its origin") {
    def param(defn: String, key: String): Double =
      s"\\+$key=(-?[0-9.]+)".r.findFirstMatchIn(defn)
        .map(_.group(1).toDouble).getOrElse(0.0)
    for ((code, defn) <- EpsgInit.defs) {
      val k = ProjString.parse(defn)
      // probe near the CRS origin, nudged off exact poles/meridians
      val zone = param(defn, "zone")
      val lon = (if (zone > 0) zone * 6.0 - 183.0
                 else param(defn, "lon_0") + param(defn, "lonc")) + 0.4
      val lat = math.max(-84.6, math.min(84.6, param(defn, "lat_0"))) + 0.3
      val v = Array(math.toRadians(lon), math.toRadians(lat), 0.0, 0.0)
      assert(k.fwd(v), s"$code fwd failed at ($lon,$lat)")
      assert(k.inv(v), s"$code inv failed at ($lon,$lat)")
      // 1e-7 deg ~ 1 cm: tight enough to catch any transcription error,
      // loose enough for the documented O(theta^2) asymmetry of 7-param
      // rotation bridges (KKJ drifts ~1 mm through fwd-inv)
      assert(math.abs(math.toDegrees(v(0)) - lon) < 1e-7 &&
             math.abs(math.toDegrees(v(1)) - lat) < 1e-7,
        s"$code roundtrip drift: (${math.toDegrees(v(0))},${math.toDegrees(v(1))})" +
          s" vs ($lon,$lat)")
    }
  }
}
