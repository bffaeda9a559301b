package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{ProjString, TransBounds}

/** proj_trans_bounds semantics: densified bbox reprojection, curvature
  * capture, pole containment, antimeridian crossing. */
class TransBoundsSpec extends AnyFunSuite {

  test("geographic -> UTM: bounds contain all corner/edge images") {
    val k = ProjString.parse("+proj=utm +zone=31 +ellps=WGS84")
    val b = TransBounds.transform(k, forward = true, 0.0, 40.0, 6.0, 60.0).get
    // western edge at lat 40 maps west of any corner (meridian convergence):
    // the densified edge must catch it
    assert(b.xmin < 250000 && b.xmax > 750000, b)
    assert(b.ymin > 4.4e6 && b.ymin < 4.45e6 && b.ymax > 6.6e6, b)
    // curvature: the bottom edge's minimum northing sits at the central
    // meridian (lon 3), BELOW both bottom corners — a corners-only box
    // would miss it; densification must catch it
    val corner = {
      val v = Array(math.toRadians(0.0), math.toRadians(40.0), 0.0, 0.0)
      k.fwd(v); v(1)
    }
    assert(b.ymin < corner, s"densification missed edge curvature: $b vs $corner")
  }

  test("polar stereographic inverse: pole containment widens to the world") {
    val k = ProjString.parse("+proj=stere +lat_0=90 +lat_ts=70 +ellps=WGS84")
    // a projected box around the origin contains the north pole
    val b = TransBounds.transform(k, forward = false,
      -1000000.0, -1000000.0, 1000000.0, 1000000.0).get
    assert(b.xmin == -180 && b.xmax == 180 && b.ymax == 90, b)
    assert(b.ymin < 82 && b.ymin > 75, b)
  }

  test("antimeridian crossing detected (xmax < xmin)") {
    // a UTM zone 1 box straddling 180E: inverse bounds must wrap
    val k = ProjString.parse("+proj=utm +zone=1 +ellps=WGS84")
    // zone 1 central meridian = -177; easting << 500000 crosses 180
    val b = TransBounds.transform(k, forward = false,
      -300000.0, 4000000.0, 500000.0, 5000000.0).get
    assert(b.crossesAntimeridian, b)
    assert(b.xmin > 170 && b.xmax < -170, b)
  }

  test("projected output is a simple min/max") {
    val k = ProjString.parse("+proj=merc +ellps=WGS84")
    val b = TransBounds.transform(k, forward = true, -10.0, -20.0, 10.0, 20.0).get
    assert(math.abs(b.xmin + b.xmax) < 1e-6 && math.abs(b.ymin + b.ymax) < 1e-6, b)
    assert(b.xmax > 1.1e6 && b.ymax > 2.2e6, b)
  }
}
