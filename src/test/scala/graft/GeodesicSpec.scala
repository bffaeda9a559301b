package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.geodesic.{Geodesic, GeodInverse}

/** Anchors: exact equatorial arc, published quarter-meridian length, the
  * Geoscience Australia Flinders Peak -> Buninyong survey baseline, and
  * direct/inverse closure over a deterministic point grid. */
class GeodesicSpec extends AnyFunSuite {
  private val g = Geodesic.WGS84

  test("equatorial arc is exactly a * lambda") {
    val r = g.inverse(0, 0, 0, 1)
    assert(math.abs(r.s12 - 6378137.0 * math.Pi / 180) < 1e-8)
    assert(math.abs(r.azi1 - 90.0) < 1e-12)
  }

  test("quarter meridian matches the published WGS84 value") {
    val r = g.inverse(0, 0, 90, 0)
    assert(math.abs(r.s12 - 10001965.7293) < 2e-4, s"got ${r.s12}")
  }

  test("Flinders Peak -> Buninyong (ANS ellipsoid) matches survey values") {
    val ans = new Geodesic(6378160.0, 1 / 298.25)
    def dms(d: Int, m: Int, s: Double) = d.sign * (math.abs(d) + m / 60.0 + s / 3600.0)
    val lat1 = -dms(37, 57, 3.72030); val lon1 = dms(144, 25, 29.52440)
    val lat2 = -dms(37, 39, 10.15610); val lon2 = dms(143, 55, 35.38390)
    val r = ans.inverse(lat1, lon1, lat2, lon2)
    // cross-checked against an independent Vincenty solution (agrees to
    // 0.2 um) and an RK2 integration of the geodesic ODE (sub-mm)
    assert(math.abs(r.s12 - 54972.469016) < 1e-4, s"got ${r.s12}")
    val azi1 = (r.azi1 + 360) % 360
    assert(math.abs(azi1 - 306.8681564) < 1e-6, s"got $azi1")
  }

  test("near-antipodal inverse agrees with itself under swap") {
    val r1 = g.inverse(-30, 0, 29.9, 179.8)
    val r2 = g.inverse(29.9, 179.8, -30, 0)
    assert(math.abs(r1.s12 - r2.s12) < 1e-6)
    assert(r1.s12 > 19_900_000 && r1.s12 < 20_100_000)
  }

  test("direct then inverse closes over a deterministic grid") {
    var worst = 0.0
    for {
      lat <- Seq(-80.0, -45.0, -0.5, 0.0, 20.0, 60.0, 89.0)
      lon <- Seq(-179.0, -60.0, 0.0, 45.0, 120.0)
      azi <- Seq(-150.0, -30.0, 0.0, 75.0, 179.0)
      s <- Seq(10.0, 5000.0, 1.0e6, 1.2e7)
    } {
      val d = g.direct(lat, lon, azi, s)
      val inv = g.inverse(lat, lon, d.lat2, d.lon2)
      worst = math.max(worst, math.abs(inv.s12 - s))
    }
    assert(worst < 1e-7, s"worst closure error $worst m")
  }

  test("inverse is exactly symmetric in distance") {
    val pts = Seq((12.0, 55.0), (-33.9, 18.4), (35.68, 139.69), (40.71, -74.0))
    for (Seq((a1, o1), (a2, o2)) <- pts.combinations(2)) {
      val f = g.inverse(a1, o1, a2, o2)
      val r = g.inverse(a2, o2, a1, o1)
      assert(math.abs(f.s12 - r.s12) <= 1e-9 * math.max(1.0, f.s12))
    }
  }

  test("coincident points give zero") {
    val r: GeodInverse = g.inverse(20.001, 0, 20.001, 0)
    assert(r.s12 == 0.0)
  }

  test("polygon area: octant is exactly 1/8 of the ellipsoid surface") {
    val total = 4 * math.Pi * g.c2
    // WGS84 surface area is the published 510,065,622 km^2
    assert(math.abs(total - 5.10065621724088e14) < 1e6)
    val (area, per) = g.polygonArea(Seq((0.0, 0.0), (0.0, 90.0), (90.0, 0.0)))
    assert(math.abs(area - total / 8) <= 1e-6 * total / 8,
      s"octant area $area vs ${total / 8}")
    assert(per > 2.9e7 && per < 3.1e7) // three quarter-meridian-ish arcs
  }

  test("polygon area: orientation flips the sign") {
    val ccw = g.polygonArea(Seq((5.0, 5.0), (5.0, 40.0), (40.0, 20.0)))._1
    val cw = g.polygonArea(Seq((40.0, 20.0), (5.0, 40.0), (5.0, 5.0)))._1
    assert(ccw > 0)
    assert(math.abs(ccw + cw) <= 1e-6 * ccw)
  }

  test("polygon area: triangulation is additive") {
    val quad = g.polygonArea(Seq((5.0, 5.0), (5.0, 40.0), (40.0, 40.0), (40.0, 5.0)))._1
    val t1 = g.polygonArea(Seq((5.0, 5.0), (5.0, 40.0), (40.0, 40.0)))._1
    val t2 = g.polygonArea(Seq((5.0, 5.0), (40.0, 40.0), (40.0, 5.0)))._1
    assert(math.abs(quad - (t1 + t2)) <= 1e-9 * quad,
      s"quad $quad vs ${t1 + t2}")
  }

  test("polygon area: small equatorial quad matches the planar estimate") {
    val (area, _) = g.polygonArea(Seq((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)))
    val planar = math.pow(math.Pi / 180 * 6378137.0, 2) * math.cos(math.Pi / 360)
    assert(math.abs(area - planar) <= 0.01 * planar, s"$area vs $planar")
  }

  test("polygon area: sphere octant equals pi R^2 / 2") {
    val sph = new Geodesic(6371000.0, 0.0)
    val (area, _) = sph.polygonArea(Seq((0.0, 0.0), (0.0, 90.0), (90.0, 0.0)))
    val expect = math.Pi * 6371000.0 * 6371000.0 / 2
    assert(math.abs(area - expect) <= 1e-9 * expect)
  }

  test("polygon area: ring crossing the antimeridian") {
    // 10x10 degree quad straddling +/-180 at mid latitude; compare with
    // the same quad shifted to lon 0 (areas must agree by symmetry)
    val a1 = g.polygonArea(Seq((30.0, 175.0), (30.0, -175.0),
      (40.0, -175.0), (40.0, 175.0)))._1
    val a2 = g.polygonArea(Seq((30.0, -5.0), (30.0, 5.0),
      (40.0, 5.0), (40.0, -5.0)))._1
    assert(math.abs(a1 - a2) <= 1e-9 * a2, s"$a1 vs $a2")
  }

  // --- geodesic line API (geod_lineinit/geod_position; reference
  // src/tests/geodtest.c GeodSolve17/65/67/71 vectors) ----------------------

  test("line position matches geodtest GeodSolve17 (40,-75 azi -10, 2e7 m)") {
    val l = g.line(40, -75, -10)
    val p = l.position(2e7)
    assert(math.abs(p.lat2 - (-39)) < 1, s"got ${p.lat2}")
    assert(math.abs(p.lon2 - 105) < 1, s"got ${p.lon2}")
    assert(math.abs(p.azi2 - (-170)) < 1, s"got ${p.azi2}")
  }

  test("line position matches geodtest GeodSolve71 (1,2 azi 45, half of 1e7)") {
    val p = g.line(1, 2, 45).position(0.5e7)
    assert(math.abs(p.lat2 - 30.92625) < 0.5e-5, s"got ${p.lat2}")
    assert(math.abs(p.lon2 - 37.54640) < 0.5e-5, s"got ${p.lon2}")
    assert(math.abs(p.azi2 - 55.43104) < 0.5e-5, s"got ${p.azi2}")
  }

  test("inverseLine over the pole matches geodtest GeodSolve67") {
    val l = g.inverseLine(-5, -0.000000000000002, -10, 180)
    val p1 = l.position(2e7)
    assert(math.abs(p1.lat2 - 4.96445) < 0.5e-5, s"got ${p1.lat2}")
    assert(math.abs(math.abs(p1.lon2) - 180.0) < 0.5e-5, s"got ${p1.lon2}")
    assert(math.abs(p1.azi2) < 0.5e-5, s"got ${p1.azi2}")
    val p2 = l.position(0.5 * l.s13)
    assert(math.abs(p2.lat2 - (-87.52461)) < 0.5e-5, s"got ${p2.lat2}")
    assert(math.abs(p2.lon2) < 0.5e-5, s"got ${p2.lon2}")
    assert(math.abs(math.abs(p2.azi2) - 180.0) < 0.5e-5, s"got ${p2.azi2}")
  }

  test("near-antipodal inverseLine matches geodtest GeodSolve65") {
    val l = g.inverseLine(30, -0.000000000000000001, -31, 180)
    val p = l.position(1e7)
    assert(math.abs(p.lat2 - (-60.23169)) < 0.5e-5, s"got ${p.lat2}")
    assert(math.abs(p.lon2) < 0.5e-5, s"got ${p.lon2}")
    assert(math.abs(math.abs(p.azi2) - 180.0) < 0.5e-5, s"got ${p.azi2}")
  }

  test("line position equals the full direct solve along many lines") {
    // the line API must be a pure refactor of the direct problem: same
    // answer to sub-nm at every distance, on WGS84 and a fat ellipsoid
    // (|f| > 0.01 exercises the Newton correction branch)
    for (geod <- Seq(g, new Geodesic(6400000, 1.0 / 50));
         (lat1, lon1, azi1) <- Seq((40.0, -75.0, -10.0), (0.0, 0.0, 90.0),
           (-37.95103, 144.42487, 127.5), (89.9, 13.0, 2.0))) {
      val l = geod.line(lat1, lon1, azi1)
      for (s <- Seq(1.0, 1e3, 5e5, 1e6, 7.3e6, 1.4e7, 1.9e7)) {
        val a = l.position(s)
        val b = geod.direct(lat1, lon1, azi1, s)
        assert(math.abs(a.lat2 - b.lat2) < 1e-12, s"lat at $s: ${a.lat2} vs ${b.lat2}")
        assert(math.abs(a.lon2 - b.lon2) < 1e-12, s"lon at $s: ${a.lon2} vs ${b.lon2}")
        assert(math.abs(a.azi2 - b.azi2) < 1e-12, s"azi at $s: ${a.azi2} vs ${b.azi2}")
      }
    }
  }

  test("waypoints densify Flinders Peak -> Buninyong with exact endpoints") {
    val lat1 = -37.95103341666667; val lon1 = 144.42486788888888
    val lat2 = -37.65282113888889; val lon2 = 143.92649552777777
    val l = g.inverseLine(lat1, lon1, lat2, lon2)
    // WGS84 baseline length (GeographicLib's documented example: 54972.271 m)
    assert(math.abs(l.s13 - 54972.271) < 5e-3, s"got ${l.s13}")
    val w = l.waypoints(8)
    assert(w.length == 9)
    assert(math.abs(w.head.lat2 - lat1) < 1e-12 && math.abs(w.head.lon2 - lon1) < 1e-12)
    assert(math.abs(w.last.lat2 - lat2) < 1e-9, s"got ${w.last.lat2}")
    assert(math.abs(w.last.lon2 - lon2) < 1e-9, s"got ${w.last.lon2}")
    // consecutive waypoints are equidistant along the line
    val seg = l.s13 / 8
    w.sliding(2).foreach { case Array(p, q) =>
      val d = g.distance(p.lat2, p.lon2, q.lat2, q.lon2)
      assert(math.abs(d - seg) < 1e-6, s"segment $d vs $seg")
    }
  }
}
