import graft.geo.kernels._
import graft.geo.math._
object KernelSmoke {
  def t(k: PointKernel, lon: Double, lat: Double): (Double,Double) = {
    val v = Array(math.toRadians(lon), math.toRadians(lat), 0.0, Double.NaN)
    assert(k.fwd(v), "fwd failed")
    (v(0), v(1))
  }
  def ti(k: PointKernel, x: Double, y: Double): (Double,Double) = {
    val v = Array(x, y, 0.0, Double.NaN)
    assert(k.inv(v), "inv failed")
    (math.toDegrees(v(0)), math.toDegrees(v(1)))
  }
  def main(args: Array[String]): Unit = {
    val tm = TmercKernel(Ellipsoid.GRS80)
    println("tmerc fwd 2 1      = " + t(tm, 2, 1) + "  want (222650.796797586, 110642.229411933)")
    println("tmerc fwd 30 89.9999 = " + t(tm, 30, 89.9999) + " want (5.584698978, 10001956.056248082)")
    println("tmerc fwd 44.69 35.37 = " + t(tm, 44.69, 35.37) + " want (4168136.489446198, 4985511.302287407)")
    println("tmerc inv       = " + ti(tm, 4168136.489446198, 4985511.302287407) + " want (44.69 35.37)")
    println("tmerc inv 200 100 = " + ti(tm, 200, 100) + " want (0.00179663056816 0.00090436947663)")
    val tmSph = TmercKernel(Ellipsoid(6400000, 0), algo=TmercAlgo.Approx)
    println("tmerc sph fwd 2 1 = " + t(tmSph, 2, 1) + " want (223413.466406322, 111769.145040597)")
    println("tmerc sph fwd 170 60 = " + t(tmSph, 170, 60) + " want (557076.82049 13361866.7641)")
    // merc: gie builtins 4262: +proj=merc +ellps=GRS80 at lat_ts? check below separately
    val me = MercKernel(Ellipsoid.GRS80)
    println("merc fwd 2 1 = " + t(me, 2, 1))
    val wm = WebMercKernel()
    println("webmerc fwd 2 49 = " + t(wm, 2, 49))
    // utm zone 32 on GRS80: gie builtins utm section: accept 12 55 expect 691875.632137542 6098907.825129169
    val utm = UtmKernel(32, ell = Ellipsoid.WGS84)
    println("utm32 fwd 12 56 = " + t(utm, 12, 56) + " want (687071.43910944, 6210141.32674801)")
    println("utm32grs80 fwd 12 56 = " + t(UtmKernel(32, ell=Ellipsoid.GRS80), 12, 56))
    val utm30 = UtmKernel(30, ell = Ellipsoid.GRS80)
    println("utm30 fwd 2 1 = " + t(utm30, 2, 1) + " want (1057002.405491298, 110955.141175949)")
    println("utm30 inv 200 100 = " + ti(utm30, 200, 100) + " want (-7.486952083, 0.000901940)")
    // lcc gie 3750: +proj=lcc +ellps=GRS80 +lat_1=0.5 +lat_2=2: accept 2 1 expect 222588.439735968 110660.533870799
    val lcc = LccKernel(Ellipsoid.GRS80, lat1=math.toRadians(0.5), lat2Opt=Some(math.toRadians(2)), lat0=0)
    println("lcc fwd 2 1 = " + t(lcc, 2, 1) + " want (222588.439735968, 110660.533870799)")
    // cart roundtrip
    val cart = CartKernel(Ellipsoid.GRS80)
    val v = Array(math.toRadians(12.0), math.toRadians(55.0), 100.0, 0.0)
    cart.fwd(v); println("cart fwd 12 55 100 = " + v.toList)
    cart.inv(v); println("cart inv roundtrip = " + (math.toDegrees(v(0)), math.toDegrees(v(1)), v(2)))
  }
}
