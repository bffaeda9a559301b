package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.ProjString

/** Horner polynomial transforms against the reference's own published
  * selftest vectors (/root/reference/test/unit/gie_self_tests.cpp:
  * 1059-1240 — TC32/UTM32 real deg-4, System-Storebaelt complex deg-3,
  * Hatt→GGRS87 real deg-2, plus iterative-inverse-only variants). */
class HornerSpec extends AnyFunSuite {

  private val tc32 =
    "+proj=horner +ellps=intl +range=500000" +
      " +fwd_origin=877605.269066,6125810.306769" +
      " +inv_origin=877605.760036,6125811.281773 +deg=4" +
      " +fwd_v=6.1258112678e+06,9.9999971567e-01,1.5372750011e-10,5.9300860915e-15,2.2609497633e-19,4.3188227445e-05,2.8225130416e-10,7.8740007114e-16,-1.7453997279e-19,1.6877465415e-10,-1.1234649773e-14,-1.7042333358e-18,-7.9303467953e-15,-5.2906832535e-19,3.9984284847e-19" +
      " +fwd_u=8.7760574982e+05,9.9999752475e-01,2.8817299305e-10,5.5641310680e-15,-1.5544700949e-18,-4.1357045890e-05,4.2106213519e-11,2.8525551629e-14,-1.9107771273e-18,3.3615590093e-10,2.4380247154e-14,-2.0241230315e-18,1.2429019719e-15,5.3886155968e-19,-1.0167505000e-18" +
      " +inv_v=6.1258103208e+06,1.0000002826e+00,-1.5372762184e-10,-5.9304261011e-15,-2.2612705361e-19,-4.3188331419e-05,-2.8225549995e-10,-7.8529116371e-16,1.7476576773e-19,-1.6875687989e-10,1.1236475299e-14,1.7042518057e-18,7.9300735257e-15,5.2881862699e-19,-3.9990736798e-19" +
      " +inv_u=8.7760527928e+05,1.0000024735e+00,-2.8817540032e-10,-5.5627059451e-15,1.5543637570e-18,4.1357152105e-05,-4.2114813612e-11,-2.8523713454e-14,1.9109017837e-18,-3.3616407783e-10,-2.4382678126e-14,2.0245020199e-18,-1.2441377565e-15,-5.3885232238e-19,1.0167203661e-18"

  private val sb =
    "+proj=horner +ellps=intl +range=500000 +tolerance=0.0005" +
      " +fwd_origin=4.94690026817276e+05,6.13342113183056e+06" +
      " +inv_origin=6.19480258923588e+05,6.13258568148837e+06 +deg=3" +
      " +fwd_c=6.13258562111350e+06,6.19480105709997e+05,9.99378966275206e-01,-2.82153291753490e-02,-2.27089979140026e-10,-1.77019590701470e-09,1.08522286274070e-14,2.11430298751604e-15" +
      " +inv_c=6.13342118787027e+06,4.94690181709311e+05,9.99824464710368e-01,2.82279070814774e-02,7.66123542220864e-11,1.78425334628927e-09,-1.05584823306400e-14,-3.32554258683744e-15"

  private val hatt =
    "+proj=horner +ellps=bessel +fwd_origin=0.0,0.0 +deg=2 +range=10000000" +
      " +fwd_u=370552.68,0.9997155,-1.08e-09,0.0175123,2.04e-09,1.63e-09" +
      " +fwd_v=4511927.23,0.9996979,5.60e-10,-0.0174755,-1.65e-09,-6.50e-10"

  private def xyDist(a: Array[Double], b: Array[Double]): Double =
    math.hypot(a(0) - b(0), a(1) - b(1))

  test("TC32 real deg-4 roundtrip <= 1 cm") {
    val k = ProjString.parse(tc32)
    val a = Array(878354.8539, 6125305.4245, 0.0, 0.0)
    val v = a.clone()
    assert(k.fwd(v) && k.inv(v))
    assert(xyDist(a, v) <= 0.01, s"roundtrip dev ${xyDist(a, v)}")
  }

  test("System Storebaelt complex deg-3 forward/inverse at 1 mm") {
    val k = ProjString.parse(sb)
    val sbPt = Array(495136.8544, 6130821.2945, 0.0, 0.0)
    val utmPt = Array(620000.0000, 6130000.0000, 0.0, 0.0)
    val f = sbPt.clone()
    assert(k.fwd(f))
    assert(xyDist(f, utmPt) <= 0.001, s"fwd dev ${xyDist(f, utmPt)}")
    val i = utmPt.clone()
    assert(k.inv(i))
    assert(xyDist(i, sbPt) <= 0.001, s"inv dev ${xyDist(i, sbPt)}")
    val r = sbPt.clone()
    assert(k.fwd(r) && k.inv(r))
    assert(xyDist(r, sbPt) <= 0.01)
  }

  test("iterative inverses (no inv coefficients) converge") {
    val tc32FwdOnly = ProjString.parse(
      "+proj=horner +ellps=intl +range=10000000" +
        " +fwd_origin=877605.269066,6125810.306769 +deg=4" +
        tc32.split(" ").filter(s => s.startsWith("+fwd_v") || s.startsWith("+fwd_u")).mkString(" ", " ", ""))
    val a = Array(878354.8539, 6125305.4245, 0.0, 0.0)
    val v = a.clone()
    assert(tc32FwdOnly.fwd(v) && tc32FwdOnly.inv(v))
    assert(xyDist(a, v) <= 0.01)

    val sbFwdOnly = ProjString.parse(
      "+proj=horner +ellps=intl +range=10000000" +
        " +fwd_origin=4.94690026817276e+05,6.13342113183056e+06 +deg=3" +
        sb.split(" ").filter(_.startsWith("+fwd_c")).mkString(" ", " ", ""))
    val b = Array(495136.8544, 6130821.2945, 0.0, 0.0)
    val w = b.clone()
    assert(sbFwdOnly.fwd(w) && sbFwdOnly.inv(w))
    assert(xyDist(b, w) <= 0.01)
  }

  test("Hatt -> GGRS87 deg-2, forward vector + iterative inverse at 1 mm") {
    val k = ProjString.parse(hatt)
    val a = Array(-10157.950, -21121.093, 0.0, 0.0)
    val c = Array(360028.794, 4490989.862, 0.0, 0.0)
    val f = a.clone()
    assert(k.fwd(f))
    assert(xyDist(f, c) <= 0.001, s"fwd dev ${xyDist(f, c)}")
    val i = c.clone()
    assert(k.inv(i))
    assert(xyDist(i, a) <= 0.001, s"inv dev ${xyDist(i, a)}")
  }

  test("out-of-range input errors; missing parameters reject") {
    val k = ProjString.parse(tc32)
    val far = Array(878354.0 + 1e7, 6125305.0, 0.0, 0.0)
    assert(!k.fwd(far))
    intercept[ProjString.BadProjString] {
      ProjString.parse("+proj=horner +deg=2 +fwd_origin=0,0 +fwd_u=1,2,3") // wrong count
    }
    intercept[ProjString.BadProjString] {
      ProjString.parse("+proj=horner +fwd_origin=0,0") // no degree
    }
  }
}
