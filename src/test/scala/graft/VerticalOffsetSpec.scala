package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{AuthorityDb, OperationFactory, ProjString}
import graft.geo.kernels.PointKernel

/** Grid-free vertical operations from the authority registry — the
  * reference factory's vertical branch
  * (/root/reference/src/iso19111/operation/coordinateoperationfactory.cpp:563-664)
  * over the same EPSG 9616 (Vertical Offset) / 1046 (Vertical Offset and
  * Slope) records, with axis unit/direction glue from the vertical CRS's
  * coordinate system.  The PROJ-string lowering mirrors the reference's
  * export (singleoperation.cpp:4052-4226: geogoffset +dh / vertoffset). */
class VerticalOffsetSpec extends AnyFunSuite {

  private def z(k: PointKernel, lon: Double, lat: Double, z0: Double): Double = {
    val v = Array(lon, lat, z0, 0.0)
    assert(k.fwd(v), s"fwd failed at ($lon, $lat, $z0)")
    v(2)
  }

  test("verticalInfo decodes unit and direction from the axis rows") {
    val navd = AuthorityDb.verticalInfo("EPSG", "5703").get
    assert(navd.up && navd.toMeter === 1.0 && navd.name == "NAVD88 height")
    val ftus = AuthorityDb.verticalInfo("EPSG", "6360").get
    assert(ftus.up && math.abs(ftus.toMeter - 0.3048006096) < 1e-9)
    assert(ftus.datumKey == navd.datumKey) // same vertical datum 5103
    val depth = AuthorityDb.verticalInfo("EPSG", "5715").get
    assert(!depth.up && depth.toMeter === 1.0) // MSL depth: positive down
    assert(AuthorityDb.verticalInfo("EPSG", "4326").isEmpty) // not vertical
  }

  test("direct 9616 record: NZVD2009 -> Auckland 1946 is +0.34 m") {
    val k = OperationFactory.crsToCrs("EPSG:4440", "EPSG:5759")
    assert(math.abs(z(k, 174.8, -36.9, 10.0) - 10.34) < 1e-12)
    // record-inverse direction negates
    val ki = OperationFactory.crsToCrs("EPSG:5759", "EPSG:4440")
    assert(math.abs(z(ki, 174.8, -36.9, 10.34) - 10.0) < 1e-12)
  }

  test("2-hop BFS through the NZVD2009 hub: One Tree Point -> Auckland") {
    // EPSG:4441 inverted (-0.06) then EPSG:4442 forward (+0.34)
    val k = OperationFactory.crsToCrs("EPSG:5767", "EPSG:5759")
    assert(math.abs(z(k, 174.0, -35.8, 5.0) - 5.28) < 1e-12)
  }

  test("same datum, unit glue only: NAVD88 (m) -> NAVD88 (ftUS)") {
    val k = OperationFactory.crsToCrs("EPSG:5703", "EPSG:6360")
    val ftPerM = 1.0 / 0.30480060960121924
    assert(math.abs(z(k, -100.0, 40.0, 10.0) - 10.0 * ftPerM) < 1e-12)
  }

  test("same datum, direction glue: MSL height -> MSL depth negates") {
    val k = OperationFactory.crsToCrs("EPSG:5714", "EPSG:5715")
    assert(z(k, 0.0, 0.0, 12.5) === -12.5)
    assert(z(k, 0.0, 0.0, -3.25) === 3.25)
  }

  test("1046 slope plane: ODN -> EVRF2000 (EPSG:4651)") {
    val k = OperationFactory.crsToCrs("EPSG:5701", "EPSG:5730")
    // at the evaluation point the plane is exactly dh = 0.07
    val lat0 = AuthorityDb.sexagesimalDeg("54.35")  // 54d35' = 54.5833..
    val lon0 = AuthorityDb.sexagesimalDeg("-2.15")  // -2d15' = -2.25
    assert(math.abs(z(k, lon0, lat0, 100.0) - 100.07) < 1e-9)
    // one degree further north adds slope_lat * rho0 * 1deg
    val ell = graft.geo.math.Ellipsoid.WGS84
    val l0r = math.toRadians(lat0)
    val s0 = math.sin(l0r); val om = 1.0 - ell.es * s0 * s0
    val rho0 = ell.a * ell.oneEs / (om * math.sqrt(om))
    val expect = 0.07 + 0.044 * graft.geo.math.ProjMath.ArcSecToRad *
      rho0 * math.toRadians(1.0)
    assert(math.abs(z(k, lon0, lat0 + 1.0, 100.0) - (100.0 + expect)) < 1e-9)
    // slope_lon is 0 in this record: longitude displacement is free
    assert(math.abs(z(k, lon0 - 1.5, lat0, 100.0) - 100.07) < 1e-9)
  }

  test("vertical <-> horizontal pairs are a typed error, not a fallthrough") {
    val e = intercept[ProjString.Unsupported] {
      OperationFactory.crsToCrs("EPSG:5703", "EPSG:4326")
    }
    assert(e.getMessage.contains("vertical"))
    intercept[ProjString.Unsupported] {
      OperationFactory.crsToCrs("EPSG:4326", "EPSG:5703")
    }
  }

  test("unconnected vertical datums report the missing record chain") {
    // NAVD88 <-> NZVD2009: no grid-free 9616/1046 chain exists
    val e = intercept[ProjString.Unsupported] {
      OperationFactory.crsToCrs("EPSG:5703", "EPSG:4440")
    }
    assert(e.getMessage.contains("no vertical-offset path"))
  }

  test("WKT VERTCRS with a registry ID resolves through the vertical path") {
    val wkt = """VERTCRS["NZVD2009 height",
      VDATUM["New Zealand Vertical Datum 2009"],
      CS[vertical,1],AXIS["gravity-related height (H)",up],
      LENGTHUNIT["metre",1],ID["EPSG",4440]]"""
    val k = OperationFactory.crsToCrs(wkt, "EPSG:5759")
    assert(math.abs(z(k, 174.8, -36.9, 2.0) - 2.34) < 1e-12)
    // a VERTCRS without a registry ID cannot resolve offset records:
    // typed error, not a fall-through into the horizontal machinery
    val noid = """VERTCRS["local height",VDATUM["local"],
      CS[vertical,1],AXIS["h",up],LENGTHUNIT["metre",1]]"""
    val e = intercept[ProjString.Unsupported](
      OperationFactory.crsToCrs(noid, "EPSG:5759"))
    assert(e.getMessage.contains("registry ID"))
  }

  test("URN forms with a version token unwrap (ADVICE fix)") {
    // versioned URNs must reach the code front door, not the name path
    for (s <- Seq("urn:ogc:def:crs:EPSG:9.9.1:4440",
                  "urn:ogc:def:crs:EPSG::4440",
                  "urn:ogc:def:crs:EPSG:4440")) {
      val k = OperationFactory.crsToCrs(s, "EPSG:5759")
      assert(math.abs(z(k, 174.8, -36.9, 1.0) - 1.34) < 1e-12, s)
    }
  }
}
