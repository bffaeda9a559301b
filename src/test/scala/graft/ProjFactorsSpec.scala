package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.ProjFactors

/** proj_factors diagnostics against closed-form values (the reference's
  * factors are numeric too — factors.cpp h=1e-5 — so agreement bounds
  * are ~1e-7 on unit-scale factors). */
class ProjFactorsSpec extends AnyFunSuite {

  test("spherical mercator: h = k = sec(phi), conformal, no convergence") {
    val f = ProjFactors.at("+proj=merc +R=6371000", 12.0, 30.0).get
    val sec30 = 1.0 / math.cos(math.toRadians(30))
    assert(math.abs(f.meridionalScale - sec30) < 1e-7)
    assert(math.abs(f.parallelScale - sec30) < 1e-7)
    assert(math.abs(f.arealScale - sec30 * sec30) < 1e-6)
    assert(math.abs(f.angularDistortion) < 1e-6)
    assert(math.abs(f.meridianConvergence) < 1e-9)
    assert(math.abs(f.meridianParallelAngle - math.Pi / 2) < 1e-6)
  }

  test("ellipsoidal mercator: k = sec(phi) * sqrt(1 - es sin^2 phi)") {
    val phi = math.toRadians(55.5)
    val es = 0.00669437999014132 // WGS84
    val expected = math.sqrt(1 - es * math.sin(phi) * math.sin(phi)) / math.cos(phi)
    val f = ProjFactors.at("+proj=merc +ellps=WGS84", 0.0, 55.5).get
    assert(math.abs(f.parallelScale - expected) < 1e-7, s"k=${f.parallelScale}")
    assert(math.abs(f.meridionalScale - expected) < 1e-7)
    assert(math.abs(f.angularDistortion) < 1e-6)
  }

  test("lcc: unit scale on the standard parallels, conformal in between") {
    val f1 = ProjFactors.at(
      "+proj=lcc +lat_1=33 +lat_2=45 +ellps=GRS80", 0.0, 33.0).get
    assert(math.abs(f1.parallelScale - 1.0) < 1e-7, s"k=${f1.parallelScale}")
    val f2 = ProjFactors.at(
      "+proj=lcc +lat_1=33 +lat_2=45 +ellps=GRS80", 3.0, 39.0).get
    assert(f2.parallelScale < 1.0) // scale dips between the parallels
    assert(math.abs(f2.parallelScale - f2.meridionalScale) < 1e-7) // conformal
  }

  test("utm: k0 = 0.9996 on the central meridian, grid convergence sign") {
    val f = ProjFactors.at("+proj=utm +zone=32 +ellps=GRS80", 9.0, 56.0).get
    assert(math.abs(f.parallelScale - 0.9996) < 1e-7, s"k=${f.parallelScale}")
    assert(math.abs(f.meridianConvergence) < 1e-9)
    // east of the CM the convergence is positive in the northern hemisphere
    val fe = ProjFactors.at("+proj=utm +zone=32 +ellps=GRS80", 12.0, 56.0).get
    assert(fe.meridianConvergence > 0)
    // approx formula conv ~ dLam * sin(phi)
    val approx = math.toRadians(3.0) * math.sin(math.toRadians(56.0))
    assert(math.abs(fe.meridianConvergence - approx) < 2e-4)
  }

  test("equal-area projections have unit areal scale; cea distortion") {
    val f = ProjFactors.at("+proj=cea +R=6371000", 10.0, 40.0).get
    assert(math.abs(f.arealScale - 1.0) < 1e-6, s"s=${f.arealScale}")
    // Tissot axes: a = sec(phi), b = cos(phi) for Lambert cylindrical
    assert(math.abs(f.tissotSemimajor - 1.0 / math.cos(math.toRadians(40))) < 1e-6)
    assert(math.abs(f.tissotSemiminor - math.cos(math.toRadians(40))) < 1e-6)
  }

  test("pole and domain handling") {
    // at the pole the latitude is nudged inside — finite factors
    val f = ProjFactors.at("+proj=stere +lat_0=90 +lat_ts=70 +ellps=WGS84", 0.0, 90.0)
    assert(f.isDefined && f.get.parallelScale > 0)
    assert(ProjFactors.at("+proj=merc +R=1", 0.0, 91.0).isEmpty)
  }
}
