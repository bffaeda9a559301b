package graft
object GridBench {
  def main(args: Array[String]): Unit = {
    val k = graft.geo.proj.ProjString.parse(
      "+proj=pipeline +step +proj=unitconvert +xy_in=deg +xy_out=rad " +
        "+step +proj=hgridshift +grids=ntf_r93.gsb " +
        "+step +proj=unitconvert +xy_in=rad +xy_out=deg")
    val n = 5000000
    var pass = 0
    while (pass < 3) {
      var sum = 0.0
      var s = 12345L
      var i = 0
      val t0 = System.nanoTime()
      while (i < n) {
        s = s * 48271 % 2147483647L
        val x = -3.95 + (s % 8000) / 1000.0
        s = s * 48271 % 2147483647L
        val y = 42.55 + (s % 8500) / 1000.0
        val v = Array(x, y, 0.0, 0.0)
        if (k.fwd(v)) sum += v(0)
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"pass $pass: ${n / dt / 1e6}%.2f M pts/s ($dt%.2f s) sum=$sum%.1f")
      pass += 1
    }
  }
}
