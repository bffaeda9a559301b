package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.proj.{AuthorityDb, CoordinateMetadata, OperationFactory, ProjString}

/** Epoch-aware transforms: CoordinateMetadata parsing, registry
  * point-motion discovery and lowering, and the factory composition —
  * the reference's PointMotionOperation machinery
  * (coordinateoperationfactory.cpp:4279-4335, singleoperation.cpp:5684,
  * factory.cpp:10550). */
class PointMotionSpec extends AnyFunSuite {

  private val NkgGrid = "tests/nkgrf03vel_realigned_extract.tif"

  private def nkgPmo(crsKey: String, kind: String) =
    AuthorityDb.PointMotionOp("TEST:NKGVEL", "NKG velocity extract motion",
      crsKey, kind, "1070", NkgGrid, 0.005)

  test("CoordinateMetadata parses @-epochs, WKT, and leaves proj-strings alone") {
    assert(CoordinateMetadata.of("EPSG:8255@2002.0") ==
      CoordinateMetadata("EPSG:8255", Some(2002.0)))
    assert(CoordinateMetadata.of("NAD83(CSRS)v7 @ 2010.25") ==
      CoordinateMetadata("NAD83(CSRS)v7", Some(2010.25)))
    // '@' inside proj tokens is an optional-grid marker, never an epoch
    val pj = "+proj=longlat +ellps=GRS80 +nadgrids=@tests/x.gsb,@null"
    assert(CoordinateMetadata.of(pj) == CoordinateMetadata(pj))
    // even when the optional-grid NAME looks numeric: '@' after '=' or
    // ',' is token syntax, not an epoch (review regression)
    val pj2 = "+proj=hgridshift +ellps=GRS80 +grids=@2002"
    assert(CoordinateMetadata.of(pj2) == CoordinateMetadata(pj2))
    val pj3 = "+proj=hgridshift +grids=@a.gsb,@2002"
    assert(CoordinateMetadata.of(pj3) == CoordinateMetadata(pj3))
    val wkt = "COORDINATEMETADATA[" +
      "GEOGCRS[\"ETRS89\"," +
      "DATUM[\"European Terrestrial Reference System 1989\"," +
      "ELLIPSOID[\"GRS 1980\",6378137,298.257222101]]," +
      "CS[ellipsoidal,2]," +
      "AXIS[\"latitude\",north],AXIS[\"longitude\",east]," +
      "ANGLEUNIT[\"degree\",0.0174532925199433]]," +
      "EPOCH[2012.5]]"
    val m = CoordinateMetadata.of(wkt)
    assert(m.epoch.contains(2012.5))
    // the re-rendered CRS child must itself resolve through the factory
    val k = OperationFactory.crsToCrs(m.crs, "EPSG:4258")
    val v = Array(21.2, 63.0, 0.0, 0.0)
    assert(k.fwd(v) && math.abs(v(0) - 21.2) < 1e-12)
  }

  test("registry discovery: NAD83(CSRS)v7 has the Canada velocity-grid PMO") {
    assume(AuthorityDb.available)
    val ops = AuthorityDb.pointMotionOps("EPSG:8255")
    assert(ops.nonEmpty, "no point-motion ops for NAD83(CSRS)v7")
    // v7 grid record 9483 (method 1141, NAD83v70VG.gvb) — its v8
    // replacement 10707 is also discovered; the superseded-drop keeps
    // both because neither velocity grid ships in this sandbox
    val v7 = ops.find(_.opKey == "EPSG:9483")
    assert(v7.isDefined, s"9483 missing: ${ops.map(_.opKey)}")
    assert(v7.get.methodCode == "1141" && v7.get.gridName == "NAD83v70VG.gvb")
    assert(v7.get.crsKey == "EPSG:8254")
    // epoch change through the front door: typed refusal naming the
    // missing velocity grid — never a silent static transform
    val e = intercept[ProjString.Unsupported] {
      OperationFactory.crsToCrs("EPSG:8255@2002.0", "EPSG:8255@2010.0")
    }
    assert(e.getMessage.contains("unavailable") &&
      e.getMessage.contains("VG"), e.getMessage)
    // equal epochs short-circuit to the static path (identity here)
    val k = OperationFactory.crsToCrs("EPSG:8255@2002.0", "EPSG:8255@2002.0")
    val v = Array(-98.0, 55.0, 0.0, 0.0)
    assert(k.fwd(v) && v(0) == -98.0 && v(1) == 55.0)
  }

  test("PMO lowering matches the reference pipeline shape bit-for-bit") {
    val pk = AuthorityDb.pointMotionKernel(
      nkgPmo("EPSG:4258", "geographic 2D"), 2000.0, 2001.0)
    // the reference's exact export (singleoperation.cpp:5684): inv CRS,
    // cart, set v_4=src omit_fwd, deformation dt, set v_4=tgt omit_inv,
    // inv cart, CRS — hand-written twin must agree exactly
    val hand = ProjString.parse(
      "+proj=pipeline +step +proj=unitconvert +xy_in=deg +xy_out=rad" +
        " +step +proj=cart +ellps=GRS80" +
        " +step +proj=set +v_4=2000.0 +omit_fwd" +
        s" +step +proj=deformation +dt=1.0 +grids=$NkgGrid +ellps=GRS80" +
        " +step +proj=set +v_4=2001.0 +omit_inv" +
        " +step +inv +proj=cart +ellps=GRS80" +
        " +step +proj=unitconvert +xy_in=rad +xy_out=deg")
    for ((lon, lat) <- Seq((21.2, 62.9), (21.5, 63.0), (21.65, 63.05))) {
      val a = Array(lon, lat, 10.0, 0.0); val b = Array(lon, lat, 10.0, 0.0)
      assert(pk.fwd(a) && hand.fwd(b))
      assert(a.sameElements(b), s"($lon,$lat): ${a.toSeq} vs ${b.toSeq}")
      // and the motion is real: the NKG field moves the point
      assert(math.abs(a(0) - lon) + math.abs(a(1) - lat) > 0,
        s"no motion at ($lon,$lat)")
    }
  }

  test("motion is linear in the epoch gap and inverts cleanly") {
    val k1 = AuthorityDb.pointMotionKernel(
      nkgPmo("EPSG:4258", "geographic 2D"), 2000.0, 2001.0)
    val k10 = AuthorityDb.pointMotionKernel(
      nkgPmo("EPSG:4258", "geographic 2D"), 2000.0, 2010.0)
    val (lon, lat) = (21.4, 62.95)
    val a = Array(lon, lat, 0.0, 0.0); val b = Array(lon, lat, 0.0, 0.0)
    assert(k1.fwd(a) && k10.fwd(b))
    // dt multiplies the same sampled velocity: 10x the 1-year shift
    assert(math.abs((b(0) - lon) - 10 * (a(0) - lon)) < 1e-9)
    assert(math.abs((b(1) - lat) - 10 * (a(1) - lat)) < 1e-9)
    // epoch round-trip through the FACTORY composition
    val opts = OperationFactory.CrsToCrsOptions(
      extraPointMotion = Seq(nkgPmo("EPSG:4258", "geographic 2D")))
    val fwd = OperationFactory.crsToCrs(
      CoordinateMetadata("EPSG:4258", Some(2000.0)),
      CoordinateMetadata("EPSG:4258", Some(2010.0)), opts)
    val back = OperationFactory.crsToCrs(
      CoordinateMetadata("EPSG:4258", Some(2010.0)),
      CoordinateMetadata("EPSG:4258", Some(2000.0)), opts)
    val v = Array(lon, lat, 0.0, 0.0)
    assert(fwd.fwd(v) && back.fwd(v))
    assert(math.abs(v(0) - lon) < 1e-8 && math.abs(v(1) - lat) < 1e-8,
      s"epoch round-trip drifted: ${v.toSeq}")
  }

  test("factory composition: static legs glue the PMO frame to both ends") {
    // src is the PMO frame (geographic), dst its geocentric sibling:
    // k1 = noop, PMO moves the point 2000->2012.5, k2 = cart
    val opts = OperationFactory.CrsToCrsOptions(
      extraPointMotion = Seq(nkgPmo("EPSG:4936", "geocentric")))
    val k = OperationFactory.crsToCrs(
      CoordinateMetadata("EPSG:4258", Some(2000.0)),
      CoordinateMetadata("EPSG:4936", Some(2012.5)), opts)
    val v = Array(21.4, 62.95, 0.0, 0.0)
    assert(k.fwd(v))
    // twin: static cart, then the geocentric-frame PMO pipeline by hand
    val cart = OperationFactory.crsToCrs("EPSG:4258", "EPSG:4936")
    val motion = ProjString.parse(
      "+proj=pipeline +step +proj=set +v_4=2000.0 +omit_fwd" +
        s" +step +proj=deformation +dt=12.5 +grids=$NkgGrid +ellps=GRS80" +
        " +step +proj=set +v_4=2012.5 +omit_inv")
    val w = Array(21.4, 62.95, 0.0, 0.0)
    assert(cart.fwd(w) && motion.fwd(w))
    assert(v.sameElements(w), s"${v.toSeq} vs ${w.toSeq}")
    // the shift over 12.5 years on this field is centimetre-scale
    val u = Array(21.4, 62.95, 0.0, 0.0)
    assert(cart.fwd(u))
    val d = math.sqrt(math.pow(v(0) - u(0), 2) + math.pow(v(1) - u(1), 2) +
      math.pow(v(2) - u(2), 2))
    assert(d > 0.001 && d < 10.0, s"implausible 12.5-year motion: $d m")
  }

  test("string front door routes structured epoch spellings (review fix)") {
    // the review found resolveSpec's lenient fallthroughs could swallow
    // the epoch of structured specs: a WKT body with a trailing @epoch
    // (parseNode stops at the root ']') and COORDINATEMETADATA (misread
    // as proj tokens).  Both must reach the point-motion path — proven
    // here by the typed no-PMO refusal, which only that path raises.
    val wkt = "GEOGCRS[\"ETRS89\"," +
      "DATUM[\"European Terrestrial Reference System 1989\"," +
      "ELLIPSOID[\"GRS 1980\",6378137,298.257222101]]," +
      "CS[ellipsoidal,2]," +
      "AXIS[\"latitude\",north],AXIS[\"longitude\",east]," +
      "ANGLEUNIT[\"degree\",0.0174532925199433]]"
    val e1 = intercept[ProjString.Unsupported] {
      OperationFactory.crsToCrs(s"$wkt@2002.0", s"$wkt@2010.0")
    }
    assert(e1.getMessage.contains("epoch"), e1.getMessage)
    val cm = s"COORDINATEMETADATA[$wkt,EPOCH[2002.0]]"
    val cm2 = s"COORDINATEMETADATA[$wkt,EPOCH[2010.0]]"
    val e2 = intercept[ProjString.Unsupported] {
      OperationFactory.crsToCrs(cm, cm2)
    }
    assert(e2.getMessage.contains("epoch"), e2.getMessage)
    // equal epochs short-circuit to the static path and succeed
    val k = OperationFactory.crsToCrs(cm, "EPSG:4258@2002.0")
    val v = Array(21.2, 63.0, 0.0, 0.0)
    assert(k.fwd(v) && math.abs(v(0) - 21.2) < 1e-9)
    // an epoch-LESS COORDINATEMETADATA unwraps to its inner CRS on the
    // static path too (review fix: the raw wrapper text must never reach
    // the proj-token parser)
    val cmNoEpoch = s"COORDINATEMETADATA[$wkt]"
    val k2 = OperationFactory.crsToCrs(cmNoEpoch, "EPSG:4258")
    val w = Array(21.2, 63.0, 0.0, 0.0)
    assert(k2.fwd(w) && math.abs(w(0) - 21.2) < 1e-9)
  }

  test("unsupported methods refuse typed, like the reference") {
    // the NZ deformation model (method 1079) has no PROJ lowering in the
    // reference's PointMotionOperation::_exportToPROJString either
    val e = intercept[ProjString.Unsupported] {
      AuthorityDb.pointMotionKernel(
        AuthorityDb.PointMotionOp("TEST:NZ", "nz", "EPSG:4959",
          "geographic 3D", "1079", "nzgd2000_deformation_20180701.zip", 0.01),
        2000.0, 2010.0)
    }
    assert(e.getMessage.contains("1079"))
  }
}
