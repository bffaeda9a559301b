package graft
object TinBench {
  def main(args: Array[String]): Unit = {
    // synthetic 28x28-vertex grid TIN over [0,270]x[0,270] km: 27*27*2 =
    // 1458 triangles (the round-3 scale), constant small shift
    val g = 28
    val sb = new StringBuilder
    sb.append("""{"file_type":"triangulation_file","format_version":"1.1","transformed_components":["horizontal"],""")
    sb.append(""""vertices_columns":["source_x","source_y","target_x","target_y"],""")
    sb.append(""""triangles_columns":["idx_vertex1","idx_vertex2","idx_vertex3"],"vertices":[""")
    for (j <- 0 until g; i <- 0 until g) {
      val x = i * 10000.0; val y = j * 10000.0
      if (i > 0 || j > 0) sb.append(',')
      sb.append(s"[$x,$y,${x + 93.5},${y - 41.2}]")
    }
    sb.append("],\"triangles\":[")
    var first = true
    for (j <- 0 until g - 1; i <- 0 until g - 1) {
      val v = j * g + i
      if (!first) sb.append(','); first = false
      sb.append(s"[$v,${v + 1},${v + g}],[${v + 1},${v + g + 1},${v + g}]")
    }
    sb.append("]}")
    val dir = java.nio.file.Files.createTempDirectory("tinbench")
    java.nio.file.Files.write(dir.resolve("synth_tin.json"), sb.toString.getBytes("UTF-8"))
    graft.geo.grids.Grids.addSearchDir(dir.toString)
    val k = graft.geo.proj.ProjString.parse("+proj=tinshift +file=synth_tin.json")
    val n = 4000000
    var pass = 0
    while (pass < 3) {
      var sum = 0.0
      var s = 12345L
      var i = 0
      val t0 = System.nanoTime()
      while (i < n) {
        s = s * 48271 % 2147483647L
        val x = (s % 270000).toDouble
        s = s * 48271 % 2147483647L
        val y = (s % 270000).toDouble
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
