package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.CrsIdentify

/** CRS identification against the builtin EPSG table — the engine's
  * `proj_identify` (/root/reference/src/4D_api.cpp, CRS::identify in
  * src/iso19111/crs.cpp).  Confidence semantics: 100 = equivalent and the
  * input declares the code; 70 = parameter-equivalent; 25 = projection
  * twin with a different datum bridge. */
class CrsIdentifySpec extends AnyFunSuite {

  private def conf(ms: Seq[CrsIdentify.Match], code: String): Option[Int] =
    ms.find(_.code == code).map(_.confidence)

  test("bare EPSG code identifies itself at 100") {
    val ms = CrsIdentify.identify("EPSG:32631")
    assert(conf(ms, "epsg:32631").contains(100))
    assert(ms.head.code == "epsg:32631") // sorted: declared code first
  }

  test("UTM proj string identifies the WGS84 UTM code at 70") {
    val ms = CrsIdentify.identify("+proj=utm +zone=31 +datum=WGS84")
    assert(conf(ms, "epsg:32631").contains(70))
    // and not the southern or ETRS89 twins at full confidence
    assert(conf(ms, "epsg:32731").isEmpty) // different y_0 -> numerics differ
    assert(conf(ms, "epsg:25831").isEmpty) // GRS80 vs WGS84 rf differs
  }

  test("expanded tmerc spelling of UTM 31N matches the UTM code (cross-parameterization)") {
    val ms = CrsIdentify.identify(
      "+proj=tmerc +lat_0=0 +lon_0=3 +k=0.9996 +x_0=500000 +y_0=0 +datum=WGS84 +units=m")
    assert(conf(ms, "epsg:32631").contains(70))
  }

  test("British National Grid: full definition at 70, datum-free twin at 25") {
    val full = CrsIdentify.identify(
      "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
        "+y_0=-100000 +ellps=airy " +
        "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 +units=m")
    assert(conf(full, "epsg:27700").contains(70))
    val bare = CrsIdentify.identify(
      "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
        "+y_0=-100000 +ellps=airy +units=m")
    assert(conf(bare, "epsg:27700").contains(25))
  }

  test("WKT with a declared ID identifies at 100; same WKT without ID at 70") {
    def wkt(id: String) = s"""PROJCRS["ETRS89 / UTM zone 32N",
      BASEGEOGCRS["ETRS89",
        DATUM["European Terrestrial Reference System 1989",
          ELLIPSOID["GRS 1980",6378137,298.257222101,LENGTHUNIT["metre",1]]],
        PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
      CONVERSION["UTM zone 32N",
        METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],
        PARAMETER["Longitude of natural origin",9,ANGLEUNIT["degree",0.0174532925199433]],
        PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1]],
        PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],
        PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],
      CS[Cartesian,2],
        AXIS["(E)",east,ORDER[1]],
        AXIS["(N)",north,ORDER[2]],
        LENGTHUNIT["metre",1]$id]"""
    // the WKT declares no towgs84 bridge and the table entry spells the
    // null bridge explicitly — null and absent bridges are equivalent, so
    // this is a full parameter match (70), promoted to 100 by the ID
    val withId = CrsIdentify.identify(wkt(""",ID["EPSG",25832]"""))
    val notId = CrsIdentify.identify(wkt(""))
    assert(conf(withId, "epsg:25832").contains(100))
    assert(conf(notId, "epsg:25832").contains(70))
  }

  test("Web Mercator spellings all find epsg:3857") {
    val spellings = Seq(
      "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +nadgrids=@null",
      "+proj=webmerc +datum=WGS84", // the modern reference spelling
      "EPSG:3857")
    for (s <- spellings)
      assert(conf(CrsIdentify.identify(s), "epsg:3857").exists(_ >= 70),
        s"no 3857 match for $s")
  }

  test("geographic WGS84 matches 4326 but not the GRS80 datums") {
    val ms = CrsIdentify.identify("+proj=longlat +datum=WGS84")
    assert(conf(ms, "epsg:4326").contains(70))
    assert(conf(ms, "epsg:4258").isEmpty) // GRS80 rf differs from WGS84
  }

  test("shared classic definitions return multiple codes (documented registry behavior)") {
    val ms = CrsIdentify.identify(
      "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0")
    val codes = ms.filter(_.confidence == 70).map(_.code).toSet
    assert(codes.contains("epsg:4258") && codes.contains("epsg:4269"),
      s"expected the ETRS89/NAD83 twins, got $codes")
  }

  test("prime meridian distinguishes NTF (Paris) from NTF (Greenwich)") {
    val paris = CrsIdentify.identify(
      "+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320,0,0,0,0 +pm=paris")
    assert(conf(paris, "epsg:4807").contains(70))
    assert(conf(paris, "epsg:4275").isEmpty)
    val greenwich = CrsIdentify.identify(
      "+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320,0,0,0,0")
    assert(conf(greenwich, "epsg:4275").contains(70))
    assert(conf(greenwich, "epsg:4807").isEmpty)
  }

  test("pipelines and unknown projections identify to nothing") {
    assert(CrsIdentify.identify(
      "+proj=pipeline +step +proj=utm +zone=31 +ellps=GRS80").isEmpty)
    assert(CrsIdentify.identify(
      "+proj=lcc +lat_1=12 +lat_2=13 +lat_0=12.5 +lon_0=77 +ellps=WGS84").isEmpty)
  }

  test("every builtin definition identifies back to its own code") {
    import graft.geo.proj.{EpsgInit, WktFormat}
    var direct = 0
    var viaWkt2 = 0
    var viaWkt1 = 0
    for ((code, defn) <- EpsgInit.defs) {
      // the definition's own proj string must match its code (the bridge
      // compares equal to itself, so >= 70 always)
      val ms = CrsIdentify.identify(defn)
      assert(ms.exists(m => m.code == code && m.confidence >= 70),
        s"$code not identified from its own definition: $ms")
      direct += 1
      // and through the WKT2 / WKT1 formatters where the definition is
      // exportable (grid bridges are rejected by design)
      for (wkt <- scala.util.Try(WktFormat.format(code)).toOption) {
        assert(CrsIdentify.identify(wkt)
            .exists(m => m.code == code && m.confidence >= 70),
          s"$code not identified from its WKT2 export")
        viaWkt2 += 1
      }
      for (wkt <- scala.util.Try(WktFormat.formatWkt1(code)).toOption) {
        assert(CrsIdentify.identify(wkt)
            .exists(m => m.code == code && m.confidence >= 70),
          s"$code not identified from its WKT1 export")
        viaWkt1 += 1
      }
    }
    assert(direct == EpsgInit.defs.size)
    // the interchange matrix formats the overwhelming majority of the
    // table; keep a floor so silent format regressions surface here
    assert(viaWkt2 >= 40, s"only $viaWkt2 WKT2 round-trips")
    assert(viaWkt1 >= 40, s"only $viaWkt1 WKT1 round-trips")
  }

  test("unknown codes and malformed CRS text identify to empty, never throw") {
    assert(CrsIdentify.identify("EPSG:99999").isEmpty)
    assert(CrsIdentify.identify("PROJCRS[\"truncated").isEmpty)
    assert(CrsIdentify.identify("{\"type\": \"ProjectedCRS\"").isEmpty)
    assert(CrsIdentify.identify("not a crs at all").isEmpty)
    // a malformed >7-value towgs84 must yield EMPTY, not a fabricated
    // null-bridge match from silently dropping the extra value
    assert(CrsIdentify.identify(
      "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0,5").isEmpty)
  }

  test("polar stereographic family identifies despite the lat_0=90 pole origin") {
    val ms = CrsIdentify.identify(
      "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +datum=WGS84 +units=m")
    assert(conf(ms, "epsg:3413").contains(70))
    assert(conf(ms, "epsg:3995").isEmpty) // lat_ts 70 vs 71 -> numerics differ
  }

  test("authority database extends identification beyond the builtin table") {
    // TM35FIN is not in the builtin table; its UTM-35-on-GRS80 spelling
    // must identify the registry code (plus the ETRS89 UTM twin 25835)
    val ms = CrsIdentify.identify("+proj=utm +zone=35 +ellps=GRS80")
    assert(conf(ms, "epsg:3067").contains(70), ms.take(12).toString)
    // a declared-bridge input degrades the bridge-free registry twin to 25
    val twin = CrsIdentify.identify(
      "+proj=utm +zone=35 +ellps=GRS80 +towgs84=1,2,3")
    assert(conf(twin, "epsg:3067").contains(25), twin.take(12).toString)
    // a registry definition identifies back to its own code
    val spec = graft.geo.proj.AuthorityDb.crs("EPSG", "3067").get.spec
    assert(conf(CrsIdentify.identify(spec), "epsg:3067").contains(70))
    // non-EPSG authorities participate: IGNF's Web Mercator twin
    // (ESRI:102100 is deprecated in the registry, hence excluded)
    val wm = CrsIdentify.identify("+proj=webmerc +datum=WGS84")
    assert(conf(wm, "ignf:wgs84wmsv").contains(70), wm.take(12).toString)
  }
}
