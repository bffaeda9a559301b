package graft
import graft.geo.gie.Gie
import graft.geo.proj.ProjString
object TT {
  def main(args: Array[String]): Unit = {
    val files = Seq("builtins.gie", "4D-API_cs2cs-style.gie", "ellipsoid.gie",
      "more_builtins.gie", "deformation.gie", "geotiff_grids.gie", "axisswap.gie")
    for (f <- files) {
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/test/gie/$f")), "UTF-8")
      Gie.parse(content).collect { case Gie.Operation(s, _) => s }.foreach { s =>
        try { ProjString.parse(s); () }
        catch {
          case u: ProjString.Unsupported =>
            println(s"SKIP [$f] ${u.getMessage.take(60)} :: ${s.replaceAll("\\s+", " ").take(110)}")
          case _: Throwable => // bad ops expected
        }
      }
    }
  }
}
