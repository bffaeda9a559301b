package graft.geo.proj

import graft.geo.math.Ellipsoid

/** WKT2:2019 CRS *formatter* — the export half of CRS interchange,
  * complementing [[Wkt]]'s parser.  Lowers a proj-string CRS definition
  * (or `EPSG:nnnn` builtin) to ISO 19162 text for geographic, geocentric
  * and projected CRS, wrapping a `+towgs84` bridge as a BOUNDCRS with an
  * ABRIDGEDTRANSFORMATION — the same shapes the reference's
  * `WKTFormatter` emits (/root/reference/src/iso19111/io.cpp, WKT2_2019
  * mode).
  *
  * The formatter targets round-trip fidelity with [[Wkt.parseCrs]]:
  * every emitted method/parameter name is one the parser lowers back to
  * the identical proj-string semantics.  Grid-based datum bridges
  * (`+nadgrids`/`+geoidgrids`) have no abridged-Helmert representation
  * and are rejected rather than silently dropped.
  */
object WktFormat {

  /** proj name -> (WKT2/EPSG method name, uses variant-B true-scale
    * parallel).  Only parameter-compatible methods appear; everything
    * else is rejected with [[ProjString.Unsupported]]. */
  private val methodNames: Map[String, String] = Map(
    "tmerc" -> "Transverse Mercator",
    "sterea" -> "Oblique Stereographic",
    "laea" -> "Lambert Azimuthal Equal Area",
    "aea" -> "Albers Equal Area",
    "cass" -> "Cassini-Soldner",
    "sinu" -> "Sinusoidal",
    "moll" -> "Mollweide",
    "robin" -> "Robinson",
    "poly" -> "American Polyconic",
    "ortho" -> "Orthographic",
    "gnom" -> "Gnomonic",
    "aeqd" -> "Azimuthal Equidistant",
    "mill" -> "Miller Cylindrical",
    "vandg" -> "Van der Grinten",
    "gall" -> "Gall Stereographic",
    "eck4" -> "Eckert IV",
    "eck6" -> "Eckert VI",
    "nzmg" -> "New Zealand Map Grid",
    "eqc" -> "Equidistant Cylindrical",
    "somerc" -> "Swiss Oblique Cylindrical",
    "webmerc" -> "Popular Visualisation Pseudo Mercator")

  /** canonical proj key -> (WKT2 parameter name, kind: a angular /
    * l linear / s scale) — names chosen so [[Wkt]] maps them back to the
    * same key. */
  private val paramNames: Seq[(String, String, Char)] = Seq(
    ("lat_0", "Latitude of natural origin", 'a'),
    ("lon_0", "Longitude of natural origin", 'a'),
    ("lonc", "Longitude of projection centre", 'a'),
    ("lat_1", "Latitude of 1st standard parallel", 'a'),
    ("lat_2", "Latitude of 2nd standard parallel", 'a'),
    ("lat_ts", "Latitude of standard parallel", 'a'),
    ("alpha", "Azimuth of initial line", 'a'),
    ("gamma", "Angle from rectified to skew grid", 'a'),
    ("k", "Scale factor at natural origin", 's'),
    ("k_0", "Scale factor at natural origin", 's'),
    ("x_0", "False easting", 'l'),
    ("y_0", "False northing", 'l'))

  private def quote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""
  private def f(v: Double): String = Wkt.fmt(v)

  /** Shared front half of both renderers: lower an `EPSG:` code or
    * proj-string CRS definition to its parameter bag + ellipsoid. */
  private def analyze(spec: String): (String, ProjString.Params, Ellipsoid) = {
    val lowered =
      if (spec.trim.matches("(?i)epsg:\\d+"))
        EpsgInit.lookup(spec.trim.toLowerCase).getOrElse(
          throw ProjString.Unsupported(s"authority code $spec"))
      else spec
    val tokens = ProjString.expandInit(ProjString.tokenize(lowered))
    if (tokens.contains("step"))
      throw ProjString.Unsupported("WKT export takes CRS definitions, not pipelines")
    val p0 = ProjString.toParams(tokens)
    val p = ProjString.expandDatum(p0)
    if (p.has("nadgrids") || p.has("geoidgrids"))
      throw ProjString.Unsupported(
        "grid-based datum bridges have no abridged-Helmert WKT form")
    val proj = p.get("proj").getOrElse(
      throw ProjString.BadProjString("no +proj= in CRS definition"))
    (proj, p, ProjString.ellipsoidOf(p))
  }

  /** Format any accepted CRS definition as WKT2:2019. */
  def format(spec: String): String = {
    val (proj, p, ell) = analyze(spec)

    val body = proj match {
      case "longlat" | "latlong" | "latlon" | "lonlat" => geogCrs(p, ell)
      case "cart" | "geocent" => geocentCrs(p, ell)
      case _ => projCrs(proj, p, ell)
    }
    p.get("towgs84") match {
      case Some(t) => boundCrs(body, t)
      case None => body
    }
  }

  /** (ellipsoid name, datum name, prime meridian degrees) of a parameter
    * bag — shared by the WKT2 and WKT1 renderers. */
  private def names(p: ProjString.Params): (String, String, Double) = {
    val ellName = p.get("ellps").map(_.toUpperCase).getOrElse(
      if (p.has("datum")) p.get("datum").get else "unnamed")
    val datumName = p.get("datum").map(d => s"Unknown datum ($d)")
      .getOrElse(s"Unknown datum based upon $ellName")
    val pmDeg = p.get("pm").map { v =>
      val s = graft.geo.kernels.Glue.primeMeridians.getOrElse(v, v)
      ProjString.parseDms(s)
    }.getOrElse(0.0)
    (ellName, datumName, pmDeg)
  }

  private def datumAndPm(p: ProjString.Params, ell: Ellipsoid): String = {
    val (ellName, datumName, pmDeg) = names(p)
    val rfTxt = if (ell.isSphere) "0" else f(ell.rf)
    s"""  DATUM[${quote(datumName)},
       |    ELLIPSOID[${quote(ellName)},${f(ell.a)},$rfTxt,
       |      LENGTHUNIT["metre",1]]],
       |  PRIMEM["${if (pmDeg == 0.0) "Greenwich" else "Reference meridian"}",${f(pmDeg)},
       |    ANGLEUNIT["degree",0.0174532925199433]]""".stripMargin
  }

  private def geogCs: String =
    """  CS[ellipsoidal,2],
      |    AXIS["geodetic longitude (Lon)",east],
      |    AXIS["geodetic latitude (Lat)",north],
      |    ANGLEUNIT["degree",0.0174532925199433]""".stripMargin

  private def geogCrs(p: ProjString.Params, ell: Ellipsoid): String =
    s"""GEOGCRS[${quote(crsName(p, "Geographic CRS"))},
       |${datumAndPm(p, ell)},
       |$geogCs]""".stripMargin

  private def geocentCrs(p: ProjString.Params, ell: Ellipsoid): String =
    s"""GEODCRS[${quote(crsName(p, "Geocentric CRS"))},
       |${datumAndPm(p, ell)},
       |  CS[Cartesian,3],
       |    AXIS["(X)",geocentricX],
       |    AXIS["(Y)",geocentricY],
       |    AXIS["(Z)",geocentricZ],
       |    LENGTHUNIT["metre",1]]""".stripMargin

  private def crsName(p: ProjString.Params, dflt: String): String = dflt

  /** UTM -> Transverse Mercator parameter expansion, shared by all three
    * renderers (EPSG 9807 spelling of the zone). */
  private def utmExpansion(proj: String,
                           p: ProjString.Params): (String, Map[String, Double]) =
    proj match {
      case "utm" =>
        val zone = p.double("zone").getOrElse(
          throw ProjString.BadProjString("utm needs +zone")).toInt
        ("tmerc", Map(
          "lat_0" -> 0.0, "lon_0" -> (zone * 6.0 - 183.0), "k" -> 0.9996,
          "x_0" -> 500000.0,
          "y_0" -> (if (p.flags.contains("south")) 10000000.0 else 0.0)))
      case _ => (proj, Map.empty[String, Double])
    }

  /** (metres-per-unit, unit name) of the projected linear unit, shared by
    * all three renderers. */
  private def linearUnitOf(p: ProjString.Params): (Double, String) = {
    val factor = p.get("to_meter").map(graft.geo.kernels.Glue.parseToMeter)
      .orElse(p.get("units").map(u =>
        graft.geo.kernels.UnitConvertKernel.linear.getOrElse(u,
          throw ProjString.BadProjString(s"unknown unit $u"))))
      .getOrElse(1.0)
    (factor, p.get("units").getOrElse(if (factor == 1.0) "metre" else "unit"))
  }

  /** Polar Stereographic variant B encodes the pole by the SIGN of the
    * true-scale latitude (EPSG 9829 carries no latitude of origin, and
    * the WKT1 latitude_of_origin form re-derives the pole the same way) —
    * a definition whose lat_ts sign contradicts its pole has no faithful
    * spelling and must be rejected, never silently flipped. */
  private def polarBGuard(lat0: Double, ts: Double): Unit =
    if (!((lat0 > 0 && ts >= 0) || (lat0 < 0 && ts < 0)))
      throw ProjString.Unsupported(
        "polar stereographic with true-scale latitude on the opposite " +
          "side of the equator from its pole has no WKT spelling")

  /** WKT2/EPSG method name of a (projName, params) pair — shared by the
    * WKT2 and WKT1 renderers so variant selection cannot drift. */
  private def methodNameOf(projName: String, p: ProjString.Params,
                           extra: Map[String, Double]): String = projName match {
    case "merc" =>
      if (p.has("lat_ts")) "Mercator (variant B)" else "Mercator (variant A)"
    case "lcc" =>
      if (p.has("lat_2")) "Lambert Conic Conformal (2SP)"
      else "Lambert Conic Conformal (1SP)"
    case "stere" =>
      val lat0 = p.double("lat_0").orElse(extra.get("lat_0")).getOrElse(0.0)
      if (math.abs(math.abs(lat0) - 90.0) < 1e-9)
        if (p.has("lat_ts")) "Polar Stereographic (variant B)"
        else "Polar Stereographic (variant A)"
      else "Stereographic"
    case "krovak" =>
      // plain EPSG "Krovak" is south-west oriented (the parser restores
      // +axis=swu for it); bare +proj=krovak is the north-orientated one
      if (p.get("axis").contains("swu")) "Krovak"
      else "Krovak (North Orientated)"
    case "tmerc" if p.get("axis").contains("wsu") =>
      "Transverse Mercator (South Orientated)"
    case "omerc" =>
      if (p.flags.contains("no_uoff")) "Hotine Oblique Mercator (variant A)"
      else "Hotine Oblique Mercator (variant B)"
    case other => methodNames.getOrElse(other,
      throw ProjString.Unsupported(s"WKT export of +proj=$other"))
  }

  private def projCrs(proj: String, p: ProjString.Params, ell: Ellipsoid): String = {
    // UTM is spelled as its Transverse Mercator expansion (EPSG 9807)
    val (projName, extra) = utmExpansion(proj, p)
    val methodName = methodNameOf(projName, p, extra)
    // an +axis= the method name itself doesn't encode would be silently
    // lost in the round-trip — reject instead
    if (p.has("axis") && !methodName.contains("Krovak") &&
        methodName != "Transverse Mercator (South Orientated)")
      throw ProjString.Unsupported(s"WKT export of +axis=${p.get("axis").get}")

    val (unitFactor, unitName) = linearUnitOf(p)

    def angOf(k: String): Option[Double] =
      extra.get(k).orElse(p.angle(k).map(math.toDegrees))
    def linOf(k: String): Option[Double] =
      extra.get(k).orElse(p.double(k))

    val polarB = methodName == "Polar Stereographic (variant B)"
    if (polarB)
      polarBGuard(angOf("lat_0").getOrElse(90.0), angOf("lat_ts").getOrElse(0.0))

    val ps = paramNames.flatMap { case (key, wktName, kind) =>
      val v = kind match {
        case 'a' => angOf(key)
        case _ => linOf(key)
      }
      // k/k_0 are aliases — emit whichever the definition used, once
      if (key == "k_0" && (p.has("k") || extra.contains("k"))) None
      // variant B carries no scale factor (EPSG 9829; the kernel ignores
      // any +k when lat_ts is set, so nothing is lost)
      else if (polarB && (key == "k" || key == "k_0")) None
      else v.map { value =>
        val unit = kind match {
          case 'a' => """ANGLEUNIT["degree",0.0174532925199433]"""
          case 'l' => """LENGTHUNIT["metre",1]"""
          case _ => """SCALEUNIT["unity",1]"""
        }
        s"""    PARAMETER[${quote(wktName)},${f(value)},
           |      $unit]""".stripMargin
      }
    }

    val baseGeog =
      s"""  BASEGEOGCRS["Base geographic CRS",
         |${datumAndPm(p, ell).linesIterator.map("  " + _).mkString("\n")},
         |    ANGLEUNIT["degree",0.0174532925199433]]""".stripMargin

    val paramBlock =
      if (ps.isEmpty) "" else ",\n" + ps.mkString(",\n")
    s"""PROJCRS[${quote(crsName(p, "Projected CRS"))},
       |$baseGeog,
       |  CONVERSION["unnamed",
       |    METHOD[${quote(methodName)}]$paramBlock],
       |  CS[Cartesian,2],
       |    AXIS["(E)",east],
       |    AXIS["(N)",north],
       |    LENGTHUNIT[${quote(unitName)},${f(unitFactor)}]]""".stripMargin
  }

  /** Wrap a CRS body in BOUNDCRS with the classic towgs84 bridge spelled
    * as an abridged Molodensky-Badekas-style Helmert (ISO 19162 §9.4:
    * translations in metres, rotations arc-seconds, scale difference as
    * the 1+ds ratio). */
  private def boundCrs(body: String, towgs84: String): String = {
    val xs = towgs84.split(',').map(s => ProjString.parseDouble(s.trim)).padTo(7, 0.0)
    val names = Seq(
      ("X-axis translation", xs(0), 8605), ("Y-axis translation", xs(1), 8606),
      ("Z-axis translation", xs(2), 8607), ("X-axis rotation", xs(3), 8608),
      ("Y-axis rotation", xs(4), 8609), ("Z-axis rotation", xs(5), 8610),
      ("Scale difference", 1.0 + xs(6) * 1e-6, 8611))
    val keep =
      if (xs.drop(3).forall(_ == 0.0)) names.take(3) else names
    val ps = keep.map { case (n, v, code) =>
      s"""    PARAMETER[${quote(n)},${f(v)},
         |      ID["EPSG",$code]]""".stripMargin
    }
    val indented = body.linesIterator.map("  " + _).mkString("\n")
    s"""BOUNDCRS[
       |  SOURCECRS[
       |$indented],
       |  TARGETCRS[
       |    GEOGCRS["WGS 84",
       |      DATUM["World Geodetic System 1984",
       |        ELLIPSOID["WGS 84",6378137,298.257223563,
       |          LENGTHUNIT["metre",1]]],
       |      PRIMEM["Greenwich",0,
       |        ANGLEUNIT["degree",0.0174532925199433]],
       |      CS[ellipsoidal,2],
       |        AXIS["geodetic latitude (Lat)",north],
       |        AXIS["geodetic longitude (Lon)",east],
       |        ANGLEUNIT["degree",0.0174532925199433],
       |      ID["EPSG",4326]]],
       |  ABRIDGEDTRANSFORMATION["Transformation to WGS84",
       |    METHOD["Position Vector transformation (geog2D domain)",
       |      ID["EPSG",9606]],
       |${ps.mkString(",\n")}]]""".stripMargin
  }

  // --- WKT1 (classic GIS dialect) -------------------------------------------

  /** WKT2 method name -> classic WKT1 PROJECTION name where they differ;
    * everything else is the WKT2 name with spaces as underscores (the
    * parser normalizes both spellings to the same key). */
  private val wkt1MethodNames: Map[String, String] = Map(
    "Mercator (variant A)" -> "Mercator_1SP",
    "Mercator (variant B)" -> "Mercator_2SP",
    "Lambert Conic Conformal (1SP)" -> "Lambert_Conformal_Conic_1SP",
    "Lambert Conic Conformal (2SP)" -> "Lambert_Conformal_Conic_2SP",
    "Polar Stereographic (variant A)" -> "Polar_Stereographic",
    "Polar Stereographic (variant B)" -> "Polar_Stereographic",
    "Hotine Oblique Mercator (variant A)" -> "Hotine_Oblique_Mercator",
    "Hotine Oblique Mercator (variant B)" ->
      "Hotine_Oblique_Mercator_Azimuth_Center",
    "Transverse Mercator (South Orientated)" ->
      "Transverse_Mercator_South_Orientated",
    "Krovak (North Orientated)" -> "Krovak_North_Orientated",
    "Albers Equal Area" -> "Albers_Conic_Equal_Area",
    "American Polyconic" -> "Polyconic",
    "Equidistant Cylindrical" -> "Equirectangular",
    "Cassini-Soldner" -> "Cassini_Soldner")

  /** canonical proj key -> classic WKT1 parameter name (GDAL spelling;
    * lonc uses longitude_of_projection_centre, which this library's
    * parser — like the reference's alias table — maps back to +lonc,
    * where GDAL's longitude_of_center would ambiguously mean +lon_0). */
  private val wkt1ParamNames: Seq[(String, String, Char)] = Seq(
    ("lat_0", "latitude_of_origin", 'a'),
    ("lon_0", "central_meridian", 'a'),
    ("lonc", "longitude_of_projection_centre", 'a'),
    ("lat_1", "standard_parallel_1", 'a'),
    ("lat_2", "standard_parallel_2", 'a'),
    ("alpha", "azimuth", 'a'),
    ("gamma", "rectified_grid_angle", 'a'),
    ("k", "scale_factor", 's'),
    ("k_0", "scale_factor", 's'),
    ("x_0", "false_easting", 'l'),
    ("y_0", "false_northing", 'l'))

  /** Format any accepted CRS definition as classic WKT1 (GEOGCS/PROJCS
    * with DATUM-level TOWGS84 — the GDAL-interchange dialect the
    * reference exports in WKT1_GDAL mode).  Geocentric CRS (GEOCCS) is
    * out of scope; round-trip fidelity with [[Wkt.parseCrs]] holds for
    * everything emitted. */
  def formatWkt1(spec: String): String = {
    val (proj, p, ell) = analyze(spec)
    proj match {
      case "longlat" | "latlong" | "latlon" | "lonlat" =>
        geogcsWkt1(p, ell, "unknown")
      case "cart" | "geocent" =>
        throw ProjString.Unsupported("WKT1 geocentric (GEOCCS) export")
      case _ => projcsWkt1(proj, p, ell)
    }
  }

  private def towgs84Wkt1(p: ProjString.Params): String =
    p.get("towgs84").map { t =>
      val xs = t.split(',').map(s => ProjString.parseDouble(s.trim)).padTo(7, 0.0)
      ",\n    TOWGS84[" + xs.map(f).mkString(",") + "]"
    }.getOrElse("")

  private def geogcsWkt1(p: ProjString.Params, ell: Ellipsoid,
                         name: String): String = {
    val (ellName, datumName, pmDeg) = names(p)
    val rfTxt = if (ell.isSphere) "0" else f(ell.rf)
    s"""GEOGCS[${quote(name)},
       |  DATUM[${quote(datumName)},
       |    SPHEROID[${quote(ellName)},${f(ell.a)},$rfTxt]${towgs84Wkt1(p)}],
       |  PRIMEM["${if (pmDeg == 0.0) "Greenwich" else "Reference meridian"}",${f(pmDeg)}],
       |  UNIT["degree",0.0174532925199433]]""".stripMargin
  }

  private def projcsWkt1(proj: String, p: ProjString.Params,
                         ell: Ellipsoid): String = {
    val (projName, extra) = utmExpansion(proj, p)
    val wkt2Name = methodNameOf(projName, p, extra)
    val wkt1Name = wkt1MethodNames.getOrElse(wkt2Name, wkt2Name.replace(' ', '_'))
    if (p.has("axis") && !wkt2Name.contains("Krovak") &&
        wkt2Name != "Transverse Mercator (South Orientated)")
      throw ProjString.Unsupported(s"WKT export of +axis=${p.get("axis").get}")

    val (unitFactor, unitName) = linearUnitOf(p)

    def angOf(k: String): Option[Double] =
      extra.get(k).orElse(p.angle(k).map(math.toDegrees))
    def linOf(k: String): Option[Double] =
      extra.get(k).orElse(p.double(k))

    // lat_ts has no fixed WKT1 name: Mercator_2SP / Equirectangular spell
    // it standard_parallel_1 (the parser's stdPar1IsTs rule restores it),
    // Polar_Stereographic spells it latitude_of_origin (polarWkt1 rule —
    // which re-derives the pole from its sign, hence the guard)
    val polarB = wkt2Name == "Polar Stereographic (variant B)"
    val latTs = angOf("lat_ts")
    if (polarB)
      polarBGuard(angOf("lat_0").getOrElse(90.0), latTs.getOrElse(0.0))
    val tsParam = latTs.map { ts =>
      if (polarB) ("latitude_of_origin", ts)
      else ("standard_parallel_1", ts)
    }

    val ps = wkt1ParamNames.flatMap { case (key, wkt1Param, kind) =>
      val v = kind match {
        case 'a' => angOf(key)
        case 'l' => linOf(key).map(_ / unitFactor) // WKT1 linear params are in map units
        case _ => linOf(key)
      }
      if (key == "k_0" && (p.has("k") || extra.contains("k"))) None
      else if (key == "lat_0" && polarB) None // replaced by the lat_ts spelling
      // variant B carries no scale factor (the kernel ignores +k when
      // lat_ts is set, and an emitted k!=1 would defeat the polarWkt1
      // re-import rule, silently turning the CRS oblique)
      else if (polarB && (key == "k" || key == "k_0")) None
      else if (key == "lat_1" && tsParam.exists(_._1 == "standard_parallel_1")) None
      else v.map(value => s"""  PARAMETER[${quote(wkt1Param)},${f(value)}]""")
    } ++ tsParam.map { case (n, v) => s"""  PARAMETER[${quote(n)},${f(v)}]""" }

    val geogcs = geogcsWkt1(p, ell, "unknown")
      .linesIterator.map("  " + _).mkString("\n").drop(2)
    val paramBlock = if (ps.isEmpty) "" else ps.mkString(",\n") + ",\n"
    s"""PROJCS["unknown",
       |  $geogcs,
       |  PROJECTION[${quote(wkt1Name)}],
       |$paramBlock  UNIT[${quote(unitName)},${f(unitFactor)}]]""".stripMargin
  }

  // --- WKT1 ESRI dialect ------------------------------------------------------

  /** WKT2 method name -> ArcGIS PROJECTION name.  Methods with no ESRI
    * spelling (Mercator variant A, south-orientated TM, Krovak with its
    * extra ESRI scale parameters, Swiss Oblique) are rejected rather than
    * approximated. */
  private val esriMethodNames: Map[String, String] = Map(
    "Transverse Mercator" -> "Transverse_Mercator",
    "Mercator (variant B)" -> "Mercator",
    "Popular Visualisation Pseudo Mercator" -> "Mercator_Auxiliary_Sphere",
    "Lambert Conic Conformal (1SP)" -> "Lambert_Conformal_Conic",
    "Lambert Conic Conformal (2SP)" -> "Lambert_Conformal_Conic",
    "Polar Stereographic (variant A)" -> "Stereographic",
    "Stereographic" -> "Stereographic",
    "Oblique Stereographic" -> "Double_Stereographic",
    "Lambert Azimuthal Equal Area" -> "Lambert_Azimuthal_Equal_Area",
    "Albers Equal Area" -> "Albers",
    "Azimuthal Equidistant" -> "Azimuthal_Equidistant",
    "Cassini-Soldner" -> "Cassini",
    "Equidistant Cylindrical" -> "Equidistant_Cylindrical",
    "Sinusoidal" -> "Sinusoidal",
    "Mollweide" -> "Mollweide",
    "Robinson" -> "Robinson",
    "American Polyconic" -> "Polyconic",
    "Orthographic" -> "Orthographic",
    "Gnomonic" -> "Gnomonic",
    "Miller Cylindrical" -> "Miller_Cylindrical",
    "Van der Grinten" -> "Van_der_Grinten_I",
    "Gall Stereographic" -> "Gall_Stereographic",
    "Eckert IV" -> "Eckert_IV",
    "Eckert VI" -> "Eckert_VI",
    "New Zealand Map Grid" -> "New_Zealand_Map_Grid",
    "Hotine Oblique Mercator (variant A)" ->
      "Hotine_Oblique_Mercator_Azimuth_Natural_Origin",
    "Hotine Oblique Mercator (variant B)" ->
      "Hotine_Oblique_Mercator_Azimuth_Center")

  private val esriParamNames: Seq[(String, String, Char)] = Seq(
    ("lat_0", "Latitude_Of_Origin", 'a'),
    ("lon_0", "Central_Meridian", 'a'),
    ("lonc", "Longitude_Of_Center", 'a'),
    ("lat_1", "Standard_Parallel_1", 'a'),
    ("lat_2", "Standard_Parallel_2", 'a'),
    ("alpha", "Azimuth", 'a'),
    ("gamma", "Rectified_Grid_Angle", 'a'),
    ("h", "Height", 'l'),
    ("k", "Scale_Factor", 's'),
    ("k_0", "Scale_Factor", 's'),
    ("x_0", "False_Easting", 'l'),
    ("y_0", "False_Northing", 'l'))

  /** Format a CRS definition in the ArcGIS WKT1 dialect (the reference's
    * WKT1_ESRI convention: GCS_/D_ name prefixes, underscore method and
    * parameter vocabulary, hemisphere-specific polar methods).  ESRI WKT
    * cannot carry a TOWGS84 bridge — definitions with one are rejected
    * rather than silently losing the datum shift. */
  def formatEsri(spec: String): String = {
    val (proj, p, ell) = analyze(spec)
    // a zero bridge (e.g. from +datum=WGS84 expansion) is a no-op and the
    // datum name carries the information; any real shift has no ESRI slot
    val shift = p.get("towgs84").exists(
      _.split(',').exists(s => ProjString.parseDouble(s.trim) != 0.0))
    if (shift)
      throw ProjString.Unsupported(
        "ESRI WKT has no TOWGS84 slot; export via formatWkt1/format instead")
    proj match {
      case "longlat" | "latlong" | "latlon" | "lonlat" => esriGeogcs(p, ell)
      case "cart" | "geocent" =>
        throw ProjString.Unsupported("ESRI WKT geocentric export")
      case _ => esriProjcs(proj, p, ell)
    }
  }

  private def esriGeogcs(p: ProjString.Params, ell: Ellipsoid): String = {
    val (ellName0, _, pmDeg) = names(p)
    val ellName = ellName0.replace(' ', '_')
    val datumName = "D_" + p.get("datum").getOrElse(ellName).replace(' ', '_')
    val rfTxt = if (ell.isSphere) "0" else f(ell.rf)
    s"""GEOGCS["GCS_$ellName",
       |  DATUM[${quote(datumName)},
       |    SPHEROID[${quote(ellName)},${f(ell.a)},$rfTxt]],
       |  PRIMEM["${if (pmDeg == 0.0) "Greenwich" else "Reference_Meridian"}",${f(pmDeg)}],
       |  UNIT["Degree",0.0174532925199433]]""".stripMargin
  }

  private def esriProjcs(proj: String, p: ProjString.Params,
                         ell: Ellipsoid): String = {
    val (projName, extra) = utmExpansion(proj, p)
    val wkt2Name = methodNameOf(projName, p, extra)
    if (p.has("axis"))
      throw ProjString.Unsupported(s"ESRI WKT export of +axis=${p.get("axis").get}")

    def angOf(k: String): Option[Double] =
      extra.get(k).orElse(p.angle(k).map(math.toDegrees))
    def linOf(k: String): Option[Double] =
      extra.get(k).orElse(p.double(k))

    val latTs = angOf("lat_ts")
    // ESRI encodes the pole in the METHOD name, so it must come from
    // lat_0 — the lat_ts sign is free here (unlike WKT1/WKT2 variant B)
    val esriName = wkt2Name match {
      case "Polar Stereographic (variant B)" =>
        if (angOf("lat_0").getOrElse(90.0) < 0) "Stereographic_South_Pole"
        else "Stereographic_North_Pole"
      case other => esriMethodNames.getOrElse(other,
        throw ProjString.Unsupported(s"ESRI WKT export of method '$other'"))
    }

    val (unitFactor, rawUnitName) = linearUnitOf(p)
    val unitName = if (rawUnitName == "metre") "Meter" else rawUnitName

    // lat_ts spelling: ESRI polar methods and Mercator/Equidistant
    // Cylindrical all use Standard_Parallel_1 (the parse specials invert)
    val polarB = wkt2Name == "Polar Stereographic (variant B)"
    val tsParam = latTs.map(ts => ("Standard_Parallel_1", ts))
    // ESRI LCC has one name: the 1SP form carries its standard parallel
    // explicitly (ArcGIS convention: Standard_Parallel_1 = origin lat)
    val lcc1spExtra =
      if (wkt2Name == "Lambert Conic Conformal (1SP)" && angOf("lat_1").isEmpty)
        angOf("lat_0").map(l0 => ("Standard_Parallel_1", l0))
      else None
    val auxSphere =
      if (esriName == "Mercator_Auxiliary_Sphere")
        Some(("Auxiliary_Sphere_Type", 0.0))
      else None

    val ps = esriParamNames.flatMap { case (key, esriParam, kind) =>
      val v = kind match {
        case 'a' => angOf(key)
        case 'l' => linOf(key).map(_ / unitFactor)
        case _ => linOf(key)
      }
      if (key == "k_0" && (p.has("k") || extra.contains("k"))) None
      else if (key == "lat_0" && polarB) None // pole encoded in the method name
      // the kernel ignores +k when lat_ts is set — a dead parameter
      else if (polarB && (key == "k" || key == "k_0")) None
      else if (key == "lat_1" && tsParam.isDefined) None
      else v.map(value => s"""  PARAMETER[${quote(esriParam)},${f(value)}]""")
    } ++ (tsParam ++ lcc1spExtra ++ auxSphere).map { case (n, v) =>
      s"""  PARAMETER[${quote(n)},${f(v)}]"""
    }

    val geogcs = esriGeogcs(p, ell)
      .linesIterator.map("  " + _).mkString("\n").drop(2)
    val paramBlock = if (ps.isEmpty) "" else ps.mkString(",\n") + ",\n"
    s"""PROJCS["unknown",
       |  $geogcs,
       |  PROJECTION[${quote(esriName)}],
       |$paramBlock  UNIT[${quote(unitName)},${f(unitFactor)}]]""".stripMargin
  }
}
