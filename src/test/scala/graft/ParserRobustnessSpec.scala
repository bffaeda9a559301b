package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.proj.{ProjString, Wkt}

/** Fuzz-style robustness for the three CRS text front-ends (the
  * counterpart of the reference's OSS-Fuzz harnesses over its parsers,
  * `test/fuzzers/` — SURVEY.md §5 row 5): on mutated and garbage
  * input the parsers must either succeed or fail with a CONTROLLED,
  * typed error — never an NPE / MatchError / stack overflow / index
  * error that would kill an executor mid-job.  Deterministic seeds so
  * failures replay. */
class ParserRobustnessSpec extends AnyFunSuite {

  private val seeds: Seq[String] = Seq(
    "+proj=utm +zone=31 +ellps=WGS84",
    "+proj=pipeline +step +proj=unitconvert +xy_in=deg +xy_out=rad " +
      "+step +proj=lcc +lat_1=33 +lat_2=45 +lon_0=-97 +ellps=GRS80",
    "+proj=merc +a=6378137 +b=6356752.3142 +k_0=0.9996 +pm=paris",
    "+proj=longlat +datum=WGS84 +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7",
    "+proj=tmerc +approx +lat_0=0 +lon_0=9 +k=0.9996 +x_0=500000 +ellps=bessel",
    "EPSG:32631",
    "EPSG:4326",
    """PROJCRS["X",BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",
      |ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
      |PRIMEM["Greenwich",0]],CONVERSION["UTM 31N",
      |METHOD["Transverse Mercator",ID["EPSG",9807]],
      |PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],
      |PARAMETER["Longitude of natural origin",3,ANGLEUNIT["degree",0.0174532925199433]],
      |PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1]],
      |PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],
      |PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],
      |CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],
      |LENGTHUNIT["metre",1]]""".stripMargin,
    """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],
      |PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]""".stripMargin,
    // ESRI dialect (underscore vocabulary, hemisphere-specific methods)
    """PROJCS["x",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",
      |SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],
      |UNIT["Degree",0.0174532925199433]],
      |PROJECTION["Stereographic_North_Pole"],
      |PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],
      |PARAMETER["Central_Meridian",-45.0],PARAMETER["Standard_Parallel_1",70.0],
      |UNIT["Meter",1.0]]""".stripMargin,
    """{"type":"GeographicCRS","name":"WGS 84","datum":{
      |"type":"GeodeticReferenceFrame","name":"World Geodetic System 1984",
      |"ellipsoid":{"name":"WGS 84","semi_major_axis":6378137,
      |"inverse_flattening":298.257223563}},
      |"coordinate_system":{"subtype":"ellipsoidal","axis":[
      |{"name":"Longitude","abbreviation":"lon","direction":"east","unit":"degree"},
      |{"name":"Latitude","abbreviation":"lat","direction":"north","unit":"degree"}]}}""".stripMargin
  )

  /** a parse outcome is acceptable iff it succeeds or fails typed */
  private def acceptable(input: String): Option[String] =
    try { ProjString.parse(input); None }
    catch {
      case _: ProjString.BadProjString => None
      case _: ProjString.Unsupported => None
      case _: Wkt.BadWkt => None
      case e: Throwable =>
        Some(s"${e.getClass.getName}: ${e.getMessage}\n  input: " +
          input.take(200).replace("\n", "\\n"))
    }

  test("single-edit mutations of valid inputs fail typed or succeed") {
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "+=.,0123456789abcdefghijklmnopqrstuvwxyz\"[]{}:_- \t\nPROJCS"
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    for (seed <- seeds; _ <- 1 to 150) {
      val i = rnd.nextInt(seed.length)
      val mutant = rnd.nextInt(4) match {
        case 0 => seed.updated(i, alphabet(rnd.nextInt(alphabet.length)))
        case 1 => seed.substring(0, i) + seed.substring(math.min(i + 1, seed.length))
        case 2 => seed.substring(0, i) +
          alphabet(rnd.nextInt(alphabet.length)) + seed.substring(i)
        case _ => seed.substring(0, i) // truncation
      }
      acceptable(mutant).foreach(bad += _)
    }
    assert(bad.isEmpty,
      s"${bad.size} uncontrolled failures, first 5:\n${bad.take(5).mkString("\n")}")
  }

  test("random garbage fails typed") {
    val rnd = new scala.util.Random(42L)
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    for (_ <- 1 to 300) {
      val len = 1 + rnd.nextInt(80)
      val s = (1 to len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      acceptable(s).foreach(bad += _)
      acceptable("+proj=" + s).foreach(bad += _)
    }
    assert(bad.isEmpty,
      s"${bad.size} uncontrolled failures, first 5:\n${bad.take(5).mkString("\n")}")
  }

  test("CrsIdentify never throws on mutated or garbage input") {
    // identification is documented never to throw: mutated valid CRS text
    // and raw garbage must yield a (possibly empty) match list
    import graft.geo.proj.CrsIdentify
    val rnd = new scala.util.Random(20260819L)
    val alphabet = "+=.,0123456789abcdefghijklmnopqrstuvwxyz\"[]{}:_- \t\nPROJCS"
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    def check(input: String): Unit =
      try CrsIdentify.identify(input)
      catch { case e: Throwable =>
        bad += s"${e.getClass.getName}: ${e.getMessage}\n  input: " +
          input.take(200).replace("\n", "\\n") }
    for (seed <- seeds; _ <- 1 to 40) {
      val i = rnd.nextInt(seed.length)
      val mutant = rnd.nextInt(4) match {
        case 0 => seed.updated(i, alphabet(rnd.nextInt(alphabet.length)))
        case 1 => seed.substring(0, i) + seed.substring(math.min(i + 1, seed.length))
        case 2 => seed.substring(0, i) +
          alphabet(rnd.nextInt(alphabet.length)) + seed.substring(i)
        case _ => seed.substring(0, i)
      }
      check(mutant)
    }
    for (_ <- 1 to 100) {
      val len = 1 + rnd.nextInt(80)
      check((1 to len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    assert(bad.isEmpty,
      s"${bad.size} identify throws, first 5:\n${bad.take(5).mkString("\n")}")
  }

  test("pathological nesting cannot blow the stack") {
    // recursive-descent WKT: depth must be bounded, not stack-limited
    val deep = "PROJCRS[\"x\"," * 20000 + "1" + "]" * 20000
    assert(acceptable(deep).isEmpty, "deep WKT nesting leaked an error")
    val deepJson = "{\"type\":" * 20000
    assert(acceptable(deepJson).isEmpty, "deep JSON nesting leaked an error")
    // a pipeline of many steps is legitimate and must still build
    val longPipe = "+proj=pipeline " +
      (1 to 500).map(_ => "+step +proj=noop").mkString(" ")
    ProjString.parse(longPipe)
  }
}
