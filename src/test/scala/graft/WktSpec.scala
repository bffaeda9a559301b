package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{ProjString, Wkt}

/** WKT2 / WKT1 CRS parsing, verified numerically: each WKT text (authored
  * from the public EPSG registry definitions) is lowered to a proj string
  * and its kernel must agree with the hand-written reference proj string
  * for the same CRS to micrometres over region-appropriate probe points.
  * Behavioral reference: WKTParser::createFromWKT + PROJ-string export
  * (/root/reference/src/iso19111/io.cpp:8432). */
class WktSpec extends AnyFunSuite {

  private val DegUnit = "ANGLEUNIT[\"degree\",0.0174532925199433]"
  private val MUnit = "LENGTHUNIT[\"metre\",1]"

  /** fwd both kernels at (lon,lat) degrees; max |dx|,|dy| in output units. */
  private def maxDiff(projA: String, projB: String,
                      pts: Seq[(Double, Double)]): Double = {
    val ka = ProjString.parse(projA)
    val kb = ProjString.parse(projB)
    var worst = 0.0
    for ((lon, lat) <- pts) {
      val a = Array(math.toRadians(lon), math.toRadians(lat), 0.0, 0.0)
      val b = a.clone()
      assert(ka.fwd(a), s"fwd A failed at ($lon,$lat) for $projA")
      assert(kb.fwd(b), s"fwd B failed at ($lon,$lat) for $projB")
      worst = math.max(worst,
        math.max(math.abs(a(0) - b(0)), math.abs(a(1) - b(1))))
    }
    worst
  }

  private def assertSame(wkt: String, projRef: String,
                         pts: Seq[(Double, Double)], tol: Double = 1e-6): Wkt.Crs = {
    val crs = Wkt.parseCrs(wkt)
    val d = maxDiff(crs.projString, projRef, pts)
    assert(d <= tol, s"kernels diverge by $d for ${crs.name}: ${crs.projString}")
    crs
  }

  private val europePts = Seq((3.7, 51.03), (7.27, 46.95), (1.5, 43.6))
  private val worldPts = Seq((3.7, 51.03), (-122.3, 37.8), (151.2, -33.9))

  // --- geographic -----------------------------------------------------------

  test("WKT2 GEOGCRS WGS 84: lat-first authority order, datum ensemble") {
    val wkt = s"""GEOGCRS["WGS 84",
      ENSEMBLE["World Geodetic System 1984 ensemble",
        MEMBER["World Geodetic System 1984 (G2139)"],
        ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit],
        ENSEMBLEACCURACY[2.0]],
      PRIMEM["Greenwich",0,$DegUnit],
      CS[ellipsoidal,2],
        AXIS["geodetic latitude (Lat)",north,ORDER[1]],
        AXIS["geodetic longitude (Lon)",east,ORDER[2]],
        $DegUnit,
      ID["EPSG",4326]]"""
    val crs = assertSame(wkt, "+proj=longlat +ellps=WGS84", worldPts)
    assert(crs.kind == "geog" && crs.latFirst && crs.epsg.contains(4326))
    assert(crs.datum.contains("1984"))
  }

  test("WKT1 GEOGCS without axes is lon-first (GIS order)") {
    val wkt = """GEOGCS["WGS 84",
      DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
      PRIMEM["Greenwich",0],
      UNIT["degree",0.0174532925199433]]"""
    val crs = assertSame(wkt, "+proj=longlat +ellps=WGS84", worldPts)
    assert(!crs.latFirst)
  }

  test("WKT1 GEOGCS with TOWGS84 lowers the datum vector") {
    val wkt = """GEOGCS["OSGB36",
      DATUM["OSGB_1936",
        SPHEROID["Airy 1830",6377563.396,299.3249646],
        TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],
      PRIMEM["Greenwich",0],
      UNIT["degree",0.0174532925199433]]"""
    val crs = Wkt.parseCrs(wkt)
    assert(crs.projString.contains(
      "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489"))
    // the engine's latlong kernel applies the datum vector (cs2cs
    // semantics), so the reference string must carry the same one
    assert(maxDiff(crs.projString,
      "+proj=longlat +ellps=airy " +
        "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489",
      europePts) <= 1e-9)
  }

  test("non-Greenwich prime meridian becomes +pm") {
    val wkt = s"""GEOGCRS["NTF (Paris)",
      DATUM["Nouvelle Triangulation Francaise (Paris)",
        ELLIPSOID["Clarke 1880 (IGN)",6378249.2,293.4660212936269,$MUnit]],
      PRIMEM["Paris",2.5969213,ANGLEUNIT["grad",0.015707963267949]],
      CS[ellipsoidal,2],
        AXIS["latitude",north],AXIS["longitude",east],$DegUnit]"""
    val crs = Wkt.parseCrs(wkt)
    // 2.5969213 grad = 2.33722917 deg
    assert(crs.projString.contains("+pm=2.33722917"))
  }

  // --- projected: Transverse Mercator family --------------------------------

  test("WKT2 PROJCRS UTM 31N equals +proj=utm") {
    val wkt = s"""PROJCRS["WGS 84 / UTM zone 31N",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["UTM zone 31N",
        METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0,$DegUnit,ID["EPSG",8801]],
        PARAMETER["Longitude of natural origin",3,$DegUnit,ID["EPSG",8802]],
        PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1],ID["EPSG",8805]],
        PARAMETER["False easting",500000,$MUnit,ID["EPSG",8806]],
        PARAMETER["False northing",0,$MUnit,ID["EPSG",8807]]],
      CS[Cartesian,2],
        AXIS["(E)",east,ORDER[1],$MUnit],
        AXIS["(N)",north,ORDER[2],$MUnit],
      ID["EPSG",32631]]"""
    val crs = assertSame(wkt, "+proj=utm +zone=31 +ellps=WGS84", europePts)
    assert(crs.kind == "projected" && !crs.latFirst && crs.axis == "enu")
    assert(crs.epsg.contains(32631))
  }

  test("WKT1 PROJCS UTM 31N equals +proj=utm") {
    val wkt = """PROJCS["WGS 84 / UTM zone 31N",
      GEOGCS["WGS 84",
        DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
      PROJECTION["Transverse_Mercator"],
      PARAMETER["latitude_of_origin",0],
      PARAMETER["central_meridian",3],
      PARAMETER["scale_factor",0.9996],
      PARAMETER["false_easting",500000],
      PARAMETER["false_northing",0],
      UNIT["metre",1]]"""
    assertSame(wkt, "+proj=utm +zone=31 +ellps=WGS84", europePts)
  }

  test("Transverse Mercator (South Orientated) lowers to tmerc +axis=wsu") {
    val wkt = s"""PROJCRS["Hartebeesthoek94 / Lo29",
      BASEGEOGCRS["Hartebeesthoek94",
        DATUM["Hartebeesthoek94",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["South African Survey Grid zone 29",
        METHOD["Transverse Mercator (South Orientated)",ID["EPSG",9808]],
        PARAMETER["Latitude of natural origin",0,$DegUnit],
        PARAMETER["Longitude of natural origin",29,$DegUnit],
        PARAMETER["Scale factor at natural origin",1,SCALEUNIT["unity",1]],
        PARAMETER["False easting",0,$MUnit],
        PARAMETER["False northing",0,$MUnit]],
      CS[Cartesian,2],
        AXIS["westing (Y)",west,ORDER[1],$MUnit],
        AXIS["southing (X)",south,ORDER[2],$MUnit]]"""
    val crs = Wkt.parseCrs(wkt)
    val ref = "+proj=tmerc +lat_0=0 +lon_0=29 +k=1 +axis=wsu +ellps=WGS84"
    assert(maxDiff(crs.projString, ref,
      Seq((28.2, -25.7), (29.9, -33.0))) <= 1e-6)
    assert(crs.axis == "wsu")
  }

  // --- projected: conformal conic + stereographic ---------------------------

  test("WKT2 Lambert Conic Conformal (2SP): RGF93 / Lambert-93") {
    val wkt = s"""PROJCRS["RGF93 / Lambert-93",
      BASEGEOGCRS["RGF93",
        DATUM["Reseau Geodesique Francais 1993",
          ELLIPSOID["GRS 1980",6378137,298.257222101,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Lambert-93",
        METHOD["Lambert Conic Conformal (2SP)",ID["EPSG",9802]],
        PARAMETER["Latitude of false origin",46.5,$DegUnit,ID["EPSG",8821]],
        PARAMETER["Longitude of false origin",3,$DegUnit,ID["EPSG",8822]],
        PARAMETER["Latitude of 1st standard parallel",49,$DegUnit,ID["EPSG",8823]],
        PARAMETER["Latitude of 2nd standard parallel",44,$DegUnit,ID["EPSG",8824]],
        PARAMETER["Easting at false origin",700000,$MUnit,ID["EPSG",8826]],
        PARAMETER["Northing at false origin",6600000,$MUnit,ID["EPSG",8827]]],
      CS[Cartesian,2],
        AXIS["easting (X)",east],AXIS["northing (Y)",north],$MUnit,
      ID["EPSG",2154]]"""
    assertSame(wkt,
      "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 " +
        "+x_0=700000 +y_0=6600000 +ellps=GRS80", europePts)
  }

  test("WKT1 Lambert_Conformal_Conic_1SP: NTF Lambert zone II") {
    val wkt = """PROJCS["NTF (Paris) / Lambert zone II",
      GEOGCS["NTF",
        DATUM["Nouvelle_Triangulation_Francaise",
          SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936269]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
      PROJECTION["Lambert_Conformal_Conic_1SP"],
      PARAMETER["latitude_of_origin",46.8],
      PARAMETER["central_meridian",0],
      PARAMETER["scale_factor",0.99987742],
      PARAMETER["false_easting",600000],
      PARAMETER["false_northing",2200000],
      UNIT["metre",1]]"""
    assertSame(wkt,
      "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 +k_0=0.99987742 " +
        "+x_0=600000 +y_0=2200000 +a=6378249.2 +rf=293.4660212936269",
      europePts)
  }

  test("Oblique Stereographic: Amersfoort / RD New") {
    val wkt = s"""PROJCRS["Amersfoort / RD New",
      BASEGEOGCRS["Amersfoort",
        DATUM["Amersfoort",
          ELLIPSOID["Bessel 1841",6377397.155,299.1528128,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["RD New",
        METHOD["Oblique Stereographic",ID["EPSG",9809]],
        PARAMETER["Latitude of natural origin",52.15616055555555,$DegUnit],
        PARAMETER["Longitude of natural origin",5.38763888888889,$DegUnit],
        PARAMETER["Scale factor at natural origin",0.9999079,SCALEUNIT["unity",1]],
        PARAMETER["False easting",155000,$MUnit],
        PARAMETER["False northing",463000,$MUnit]],
      CS[Cartesian,2],
        AXIS["easting (X)",east],AXIS["northing (Y)",north],$MUnit,
      ID["EPSG",28992]]"""
    assertSame(wkt,
      "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 " +
        "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel",
      Seq((5.3, 52.1), (6.9, 53.2), (3.6, 51.0)))
  }

  test("Polar Stereographic (variant B): Antarctic Polar Stereographic") {
    val wkt = s"""PROJCRS["WGS 84 / Antarctic Polar Stereographic",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Antarctic Polar Stereographic",
        METHOD["Polar Stereographic (variant B)",ID["EPSG",9829]],
        PARAMETER["Latitude of standard parallel",-71,$DegUnit,ID["EPSG",8832]],
        PARAMETER["Longitude of origin",0,$DegUnit,ID["EPSG",8833]],
        PARAMETER["False easting",0,$MUnit],
        PARAMETER["False northing",0,$MUnit]],
      CS[Cartesian,2],
        AXIS["easting (E)",east],AXIS["northing (N)",north],$MUnit,
      ID["EPSG",3031]]"""
    assertSame(wkt,
      "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",
      Seq((0.0, -75.0), (90.0, -80.0), (-150.0, -70.0)))
  }

  test("Polar Stereographic (variant A): Universal Polar Stereographic North") {
    val wkt = s"""PROJCRS["WGS 84 / UPS North (E,N)",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Universal Polar Stereographic North",
        METHOD["Polar Stereographic (variant A)",ID["EPSG",9810]],
        PARAMETER["Latitude of natural origin",90,$DegUnit],
        PARAMETER["Longitude of natural origin",0,$DegUnit],
        PARAMETER["Scale factor at natural origin",0.994,SCALEUNIT["unity",1]],
        PARAMETER["False easting",2000000,$MUnit],
        PARAMETER["False northing",2000000,$MUnit]],
      CS[Cartesian,2],
        AXIS["easting (E)",east],AXIS["northing (N)",north],$MUnit,
      ID["EPSG",5041]]"""
    assertSame(wkt,
      "+proj=stere +lat_0=90 +k=0.994 +lon_0=0 +x_0=2000000 +y_0=2000000 +ellps=WGS84",
      Seq((0.0, 75.0), (90.0, 80.0), (-150.0, 84.0)))
  }

  test("WKT1 Polar_Stereographic below the pole maps to variant B") {
    // GDAL WKT1 convention: latitude_of_origin < 90 with scale 1 means the
    // latitude is the true-scale parallel
    val wkt = """PROJCS["unknown",
      GEOGCS["unknown",
        DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
      PROJECTION["Polar_Stereographic"],
      PARAMETER["latitude_of_origin",-70],
      PARAMETER["central_meridian",2],
      PARAMETER["false_easting",3],
      PARAMETER["false_northing",4],
      UNIT["metre",1]]"""
    assertSame(wkt,
      "+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=2 +x_0=3 +y_0=4 +ellps=WGS84",
      Seq((0.0, -75.0), (120.0, -80.0)))
  }

  // --- projected: cylindrical + azimuthal + conic equal-area ----------------

  test("Popular Visualisation Pseudo Mercator equals +proj=webmerc") {
    val wkt = s"""PROJCRS["WGS 84 / Pseudo-Mercator",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Popular Visualisation Pseudo-Mercator",
        METHOD["Popular Visualisation Pseudo Mercator",ID["EPSG",1024]],
        PARAMETER["Latitude of natural origin",0,$DegUnit],
        PARAMETER["Longitude of natural origin",0,$DegUnit],
        PARAMETER["False easting",0,$MUnit],
        PARAMETER["False northing",0,$MUnit]],
      CS[Cartesian,2],
        AXIS["easting (X)",east],AXIS["northing (Y)",north],$MUnit,
      ID["EPSG",3857]]"""
    assertSame(wkt, "+proj=webmerc +ellps=WGS84", worldPts)
  }

  test("Mercator (variant A): Batavia / NEIEZ") {
    val wkt = s"""PROJCRS["Batavia / NEIEZ",
      BASEGEOGCRS["Batavia",
        DATUM["Batavia",
          ELLIPSOID["Bessel 1841",6377397.155,299.1528128,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Netherlands East Indies Equatorial Zone",
        METHOD["Mercator (variant A)",ID["EPSG",9804]],
        PARAMETER["Latitude of natural origin",0,$DegUnit],
        PARAMETER["Longitude of natural origin",110,$DegUnit],
        PARAMETER["Scale factor at natural origin",0.997,SCALEUNIT["unity",1]],
        PARAMETER["False easting",3900000,$MUnit],
        PARAMETER["False northing",900000,$MUnit]],
      CS[Cartesian,2],
        AXIS["easting (X)",east],AXIS["northing (Y)",north],$MUnit,
      ID["EPSG",3001]]"""
    assertSame(wkt,
      "+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 +ellps=bessel",
      Seq((106.8, -6.2), (115.0, 2.0)))
  }

  test("Mercator (variant B): standard parallel becomes lat_ts") {
    val wkt = s"""PROJCRS["Caspian Mercator",
      BASEGEOGCRS["Pulkovo 1942",
        DATUM["Pulkovo 1942",
          ELLIPSOID["Krassowsky 1940",6378245,298.3,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Caspian Sea Mercator",
        METHOD["Mercator (variant B)",ID["EPSG",9805]],
        PARAMETER["Latitude of 1st standard parallel",42,$DegUnit,ID["EPSG",8823]],
        PARAMETER["Longitude of natural origin",51,$DegUnit],
        PARAMETER["False easting",0,$MUnit],
        PARAMETER["False northing",0,$MUnit]],
      CS[Cartesian,2],
        AXIS["northing (N)",north,ORDER[1]],AXIS["easting (E)",east,ORDER[2]],$MUnit]"""
    val crs = assertSame(wkt,
      "+proj=merc +lat_ts=42 +lon_0=51 +ellps=krass",
      Seq((50.0, 40.0), (53.5, 42.5)))
    // authority axis order is (northing, easting)
    assert(crs.latFirst && crs.axis == "neu")
  }

  test("Albers Equal Area: GDA94 / Australian Albers") {
    val wkt = s"""PROJCRS["GDA94 / Australian Albers",
      BASEGEOGCRS["GDA94",
        DATUM["Geocentric Datum of Australia 1994",
          ELLIPSOID["GRS 1980",6378137,298.257222101,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Australian Albers",
        METHOD["Albers Equal Area",ID["EPSG",9822]],
        PARAMETER["Latitude of false origin",0,$DegUnit,ID["EPSG",8821]],
        PARAMETER["Longitude of false origin",132,$DegUnit,ID["EPSG",8822]],
        PARAMETER["Latitude of 1st standard parallel",-18,$DegUnit,ID["EPSG",8823]],
        PARAMETER["Latitude of 2nd standard parallel",-36,$DegUnit,ID["EPSG",8824]],
        PARAMETER["Easting at false origin",0,$MUnit],
        PARAMETER["Northing at false origin",0,$MUnit]],
      CS[Cartesian,2],
        AXIS["easting (E)",east],AXIS["northing (N)",north],$MUnit,
      ID["EPSG",3577]]"""
    assertSame(wkt,
      "+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 +ellps=GRS80",
      Seq((133.0, -24.0), (146.5, -37.5), (116.0, -32.0)))
  }

  test("Lambert Azimuthal Equal Area: ETRS89-extended / LAEA Europe") {
    val wkt = s"""PROJCRS["ETRS89-extended / LAEA Europe",
      BASEGEOGCRS["ETRS89",
        DATUM["European Terrestrial Reference System 1989",
          ELLIPSOID["GRS 1980",6378137,298.257222101,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Europe Equal Area 2001",
        METHOD["Lambert Azimuthal Equal Area",ID["EPSG",9820]],
        PARAMETER["Latitude of natural origin",52,$DegUnit],
        PARAMETER["Longitude of natural origin",10,$DegUnit],
        PARAMETER["False easting",4321000,$MUnit],
        PARAMETER["False northing",3210000,$MUnit]],
      CS[Cartesian,2],
        AXIS["northing (Y)",north,ORDER[1]],AXIS["easting (X)",east,ORDER[2]],$MUnit,
      ID["EPSG",3035]]"""
    val crs = assertSame(wkt,
      "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",
      europePts)
    assert(crs.latFirst)
  }

  test("Equidistant Cylindrical: WGS 84 / World Equidistant Cylindrical") {
    val wkt = s"""PROJCRS["WGS 84 / World Equidistant Cylindrical",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["World Equidistant Cylindrical",
        METHOD["Equidistant Cylindrical",ID["EPSG",1028]],
        PARAMETER["Latitude of 1st standard parallel",0,$DegUnit,ID["EPSG",8823]],
        PARAMETER["Longitude of natural origin",0,$DegUnit],
        PARAMETER["False easting",0,$MUnit],
        PARAMETER["False northing",0,$MUnit]],
      CS[Cartesian,2],
        AXIS["easting (E)",east],AXIS["northing (N)",north],$MUnit,
      ID["EPSG",4087]]"""
    assertSame(wkt, "+proj=eqc +lat_ts=0 +lon_0=0 +ellps=WGS84", worldPts)
  }

  // --- units + exotic axes --------------------------------------------------

  test("non-metre projected unit: Trinidad Grid in Clarke's links") {
    // EPSG 30200: parameters and coordinates in Clarke's links
    val wkt = """PROJCS["Trinidad 1903 / Trinidad Grid",
      GEOGCS["Trinidad 1903",
        DATUM["Trinidad_1903",
          SPHEROID["Clarke 1858",6378293.645208759,294.2606763692569]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
      PROJECTION["Cassini_Soldner"],
      PARAMETER["latitude_of_origin",10.44166666666667],
      PARAMETER["central_meridian",-61.33333333333334],
      PARAMETER["false_easting",430000],
      PARAMETER["false_northing",325000],
      UNIT["Clarke's link",0.201166195164]]"""
    val crs = Wkt.parseCrs(wkt)
    // x_0/y_0 converted to metres; output carries +to_meter
    assert(crs.projString.contains("+to_meter=0.201166195164"))
    val ref = "+proj=cass +lat_0=10.44166666666667 +lon_0=-61.33333333333334 " +
      "+x_0=86501.46392052001 +y_0=65379.0134283 " +
      "+a=6378293.645208759 +rf=294.2606763692569 +to_meter=0.201166195164"
    assert(maxDiff(crs.projString, ref, Seq((-61.4, 10.6), (-61.0, 10.2))) <= 1e-6)
  }

  test("Krovak authority axes are southing/westing; North Orientated is GIS") {
    val base = s"""BASEGEOGCRS["S-JTSK",
        DATUM["System of the Unified Trigonometrical Cadastral Network",
          ELLIPSOID["Bessel 1841",6377397.155,299.1528128,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["Krovak",
        METHOD["%METHOD%",ID["EPSG",%MCODE%]],
        PARAMETER["Latitude of projection centre",49.5,$DegUnit,ID["EPSG",8811]],
        PARAMETER["Longitude of origin",24.83333333333333,$DegUnit,ID["EPSG",8833]],
        PARAMETER["Co-latitude of cone axis",30.28813972222222,$DegUnit,ID["EPSG",1036]],
        PARAMETER["Latitude of pseudo standard parallel",78.5,$DegUnit,ID["EPSG",8818]],
        PARAMETER["Scale factor on pseudo standard parallel",0.9999,SCALEUNIT["unity",1],ID["EPSG",8819]],
        PARAMETER["False easting",0,$MUnit],
        PARAMETER["False northing",0,$MUnit]]"""
    val pts = Seq((14.42, 50.09), (17.1, 48.2))
    val south = s"""PROJCRS["S-JTSK / Krovak",$base,
      CS[Cartesian,2],
        AXIS["southing (X)",south,ORDER[1],$MUnit],
        AXIS["westing (Y)",west,ORDER[2],$MUnit],
      ID["EPSG",5513]]"""
      .replace("%METHOD%", "Krovak").replace("%MCODE%", "9819")
    val crsS = Wkt.parseCrs(south)
    assert(crsS.axis == "swu")
    assert(maxDiff(crsS.projString,
      "+proj=krovak +lat_0=49.5 +lon_0=24.83333333333333 +k=0.9999 " +
        "+ellps=bessel +axis=swu", pts) <= 1e-6)
    val north = s"""PROJCRS["S-JTSK / Krovak East North",$base,
      CS[Cartesian,2],
        AXIS["easting (X)",east,ORDER[1],$MUnit],
        AXIS["northing (Y)",north,ORDER[2],$MUnit],
      ID["EPSG",5514]]"""
      .replace("%METHOD%", "Krovak (North Orientated)").replace("%MCODE%", "1041")
    val crsN = Wkt.parseCrs(north)
    assert(crsN.axis == "enu")
    assert(maxDiff(crsN.projString,
      "+proj=krovak +lat_0=49.5 +lon_0=24.83333333333333 +k=0.9999 +ellps=bessel",
      pts) <= 1e-6)
  }

  // --- oblique mercator variants --------------------------------------------

  test("Hotine Oblique Mercator variant A vs B differ by the uv offset") {
    def omercWkt(method: String) = s"""PROJCRS["omerc test",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit]],
      CONVERSION["initial line",
        METHOD["$method"],
        PARAMETER["Latitude of projection centre",4,$DegUnit,ID["EPSG",8811]],
        PARAMETER["Longitude of projection centre",115,$DegUnit,ID["EPSG",8812]],
        PARAMETER["Azimuth of initial line",53.31580995,$DegUnit,ID["EPSG",8813]],
        PARAMETER["Angle from Rectified to Skew Grid",53.13010236111111,$DegUnit,ID["EPSG",8814]],
        PARAMETER["Scale factor on initial line",0.99984,SCALEUNIT["unity",1],ID["EPSG",8815]],
        PARAMETER["Easting at projection centre",590476.87,$MUnit,ID["EPSG",8816]],
        PARAMETER["Northing at projection centre",442857.65,$MUnit,ID["EPSG",8817]]],
      CS[Cartesian,2],
        AXIS["easting (E)",east],AXIS["northing (N)",north],$MUnit]"""
    val pts = Seq((115.0, 4.0), (117.5, 5.8), (113.1, 2.0))
    val common = "+lat_0=4 +lonc=115 +alpha=53.31580995 " +
      "+gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 +y_0=442857.65 " +
      "+ellps=WGS84"
    assert(maxDiff(Wkt.parseCrs(omercWkt("Hotine Oblique Mercator (variant A)")).projString,
      s"+proj=omerc +no_uoff $common", pts) <= 1e-6)
    assert(maxDiff(Wkt.parseCrs(omercWkt("Hotine Oblique Mercator (variant B)")).projString,
      s"+proj=omerc $common", pts) <= 1e-6)
    // and they genuinely differ (the offset is hundreds of km here)
    assert(maxDiff(Wkt.parseCrs(omercWkt("Hotine Oblique Mercator (variant A)")).projString,
      s"+proj=omerc $common", pts) > 1000)
  }

  // --- bound CRS ------------------------------------------------------------

  test("BOUNDCRS lowers ABRIDGEDTRANSFORMATION to towgs84 (ratio scale)") {
    val wkt = s"""BOUNDCRS[
      SOURCECRS[GEOGCRS["GDA94",
        DATUM["Geocentric Datum of Australia 1994",
          ELLIPSOID["GRS 1980",6378137,298.257222101,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit],
        CS[ellipsoidal,2],
          AXIS["latitude",north],AXIS["longitude",east],$DegUnit]],
      TARGETCRS[GEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit],
        CS[ellipsoidal,2],
          AXIS["latitude",north],AXIS["longitude",east],$DegUnit]],
      ABRIDGEDTRANSFORMATION["Transformation to WGS84",
        METHOD["Coordinate Frame"],
        PARAMETER["X-axis translation",1],
        PARAMETER["Y-axis translation",2],
        PARAMETER["Z-axis translation",3],
        PARAMETER["X-axis rotation",-4],
        PARAMETER["Y-axis rotation",-5],
        PARAMETER["Z-axis rotation",-6],
        PARAMETER["Scale difference",1.000007]]]"""
    val crs = Wkt.parseCrs(wkt)
    assert(crs.kind == "geog" && crs.latFirst)
    assert(crs.projString.contains("+towgs84=1,2,3,-4,-5,-6,7"),
      crs.projString)
  }

  test("BOUNDCRS parameters identified by EPSG code instead of name") {
    val wkt = s"""BOUNDCRS[
      SOURCECRS[GEOGCRS["local",
        DATUM["local datum",
          ELLIPSOID["intl",6378388,297,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit],
        CS[ellipsoidal,2],
          AXIS["latitude",north],AXIS["longitude",east],$DegUnit]],
      TARGETCRS[GEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,$MUnit]],
        PRIMEM["Greenwich",0,$DegUnit],
        CS[ellipsoidal,2],
          AXIS["latitude",north],AXIS["longitude",east],$DegUnit]],
      ABRIDGEDTRANSFORMATION["to WGS84",
        METHOD["bla",ID["EPSG",1032]],
        PARAMETER["tx",-87,ID["EPSG",8605]],
        PARAMETER["ty",-98,ID["EPSG",8606]],
        PARAMETER["tz",-121,ID["EPSG",8607]]]]"""
    assert(Wkt.parseCrs(wkt).projString.contains("+towgs84=-87,-98,-121"))
  }

  // --- plumbing -------------------------------------------------------------

  test("ProjString.parse accepts WKT directly (kernel dispatch)") {
    val wkt = """PROJCS["WGS 84 / UTM zone 31N",
      GEOGCS["WGS 84",
        DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
      PROJECTION["Transverse_Mercator"],
      PARAMETER["latitude_of_origin",0],
      PARAMETER["central_meridian",3],
      PARAMETER["scale_factor",0.9996],
      PARAMETER["false_easting",500000],
      PARAMETER["false_northing",0],
      UNIT["metre",1]]"""
    val k = ProjString.parse(wkt)
    val v = Array(math.toRadians(3.7), math.toRadians(51.03), 0.0, 0.0)
    assert(k.fwd(v))
    val r = ProjString.parse("+proj=utm +zone=31 +ellps=WGS84")
    val w = Array(math.toRadians(3.7), math.toRadians(51.03), 0.0, 0.0)
    assert(r.fwd(w))
    assert(math.abs(v(0) - w(0)) < 1e-6 && math.abs(v(1) - w(1)) < 1e-6)
  }

  test("parentheses as bracket alternates, doubled-quote escapes, numbers") {
    val wkt = "GEOGCS(\"He said \"\"hi\"\"\",\n" +
      "  DATUM(\"d\",SPHEROID(\"s\",6378137,298.257223563)),\n" +
      "  PRIMEM(\"Greenwich\",0),\n" +
      "  UNIT(\"degree\",1.7453292519943295e-2))"
    val crs = Wkt.parseCrs(wkt)
    assert(crs.name == "He said \"hi\"")
    assert(crs.a == 6378137.0)
  }

  test("COMPOUNDCRS lowers horizontal + vertical height unit") {
    val wkt =
      """COMPOUNDCRS["NAD83(HARN) / Utah North (ftUS) + NAVD88 height (ftUS)",
        |  PROJCS["Utah North (ftUS)",
        |    GEOGCS["NAD83(HARN)",
        |      DATUM["NAD83_HARN",SPHEROID["GRS 1980",6378137,298.257222101]],
        |      PRIMEM["Greenwich",0],
        |      UNIT["degree",0.0174532925199433]],
        |    PROJECTION["Lambert_Conformal_Conic_2SP"],
        |    PARAMETER["standard_parallel_1",41.78333333333333],
        |    PARAMETER["standard_parallel_2",40.71666666666667],
        |    PARAMETER["latitude_of_origin",40.33333333333334],
        |    PARAMETER["central_meridian",-111.5],
        |    PARAMETER["false_easting",1640416.666666667],
        |    PARAMETER["false_northing",3280833.333333333],
        |    UNIT["US survey foot",0.3048006096012192]],
        |  VERTCRS["NAVD88 height (ftUS)",
        |    VDATUM["North American Vertical Datum 1988"],
        |    CS[vertical,1],
        |      AXIS["gravity-related height (H)",up],
        |      LENGTHUNIT["US survey foot",0.3048006096012192]]]""".stripMargin
    val crs = Wkt.parseCrs(wkt)
    assert(crs.projString.contains("+proj=lcc"))
    assert(crs.projString.contains("+to_meter=0.3048006096012192"))
    assert(crs.projString.contains("+vto_meter=0.3048006096012192"))
    // kernel: z scales by the vertical unit
    val k = ProjString.parse(crs.projString)
    val v = Array(math.toRadians(-111.5), math.toRadians(41.0), 100.0, 0.0)
    assert(k.fwd(v))
    assert(math.abs(v(2) - 100.0 / 0.3048006096012192) < 1e-9,
      s"z not in ftUS: ${v(2)}")
    // metre vertical is a no-op suffix
    val wkt2 = wkt.replace("LENGTHUNIT[\"US survey foot\",0.3048006096012192]]]",
      "LENGTHUNIT[\"metre\",1]]]")
    assert(!Wkt.parseCrs(wkt2).projString.contains("+vto_meter"))
  }

  test("malformed WKT fails cleanly") {
    for (bad <- Seq(
      "GEOGCRS[",
      "GEOGCRS[\"x\"",
      "PROJCRS[\"x\",CS[Cartesian,2]]",
      "GEOGCRS[\"x\",DATUM[\"d\"]]",
      "FOO[\"x\"]"))
      assertThrows[Wkt.BadWkt](Wkt.parseCrs(bad))
  }

  test("DERIVEDPROJCRS: base conversion + affine deriving conversion") {
    val wkt = """DERIVEDPROJCRS["Site grid",
      BASEPROJCRS["OSGB36 / British National Grid",
        BASEGEOGCRS["OSGB36",
          DATUM["Ordnance Survey of Great Britain 1936",
            ELLIPSOID["Airy 1830",6377563.396,299.3249646]]],
        CONVERSION["British National Grid",
          METHOD["Transverse Mercator"],
          PARAMETER["Latitude of natural origin",49],
          PARAMETER["Longitude of natural origin",-2],
          PARAMETER["Scale factor at natural origin",0.9996012717],
          PARAMETER["False easting",400000],
          PARAMETER["False northing",-100000]]],
      DERIVINGCONVERSION["Site rotation",
        METHOD["Affine parametric transformation"],
        PARAMETER["A0",10.0],PARAMETER["A1",0.8],PARAMETER["A2",-0.6],
        PARAMETER["B0",-20.0],PARAMETER["B1",0.6],PARAMETER["B2",0.8]],
      CS[Cartesian,2],
      AXIS["(E)",east],AXIS["(N)",north],
      LENGTHUNIT["metre",1]]"""
    val crs = Wkt.parseCrs(wkt)
    assert(crs.kind == "derived-projected")
    // numeric: base tmerc then the affine plane, point-for-point
    val ref = "+proj=pipeline" +
      " +step +proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717" +
      " +x_0=400000 +y_0=-100000 +ellps=airy" +
      " +step +proj=affine +xoff=10 +s11=0.8 +s12=-0.6" +
      " +yoff=-20 +s21=0.6 +s22=0.8"
    assert(maxDiff(crs.projString, ref,
      Seq((-2.0, 49.0), (0.5, 52.0), (-5.2, 55.8))) <= 1e-8)
  }

  test("ENGCRS: local Cartesian frame with unit scaling, no datum path") {
    val wkt = """ENGCRS["Plant One grid",
      EDATUM["Plant One local datum"],
      CS[Cartesian,2],
      AXIS["(E)",east],AXIS["(N)",north],
      LENGTHUNIT["US survey foot",0.304800609601219]]"""
    val crs = Wkt.parseCrs(wkt)
    assert(crs.kind == "engineering")
    assert(crs.datum == "Plant One local datum")
    val k = ProjString.parse(crs.projString)
    val v = Array(10.0, 20.0, 0.0, 0.0)
    assert(k.fwd(v))
    assert(math.abs(v(0) - 10.0 * 0.304800609601219) < 1e-12)
    assert(math.abs(v(1) - 20.0 * 0.304800609601219) < 1e-12)
    // WKT1 LOCAL_CS spelling parses to the same kind
    val wkt1 = """LOCAL_CS["Plant One grid",
      LOCAL_DATUM["Plant One local datum",0],
      UNIT["metre",1],AXIS["Easting",EAST],AXIS["Northing",NORTH]]"""
    assert(Wkt.parseCrs(wkt1).kind == "engineering")
  }

  test("parametric and temporal CRS parse to identity frames (r5)") {
    // round 4 rejected these typed; the reference parses them
    // (io.cpp:2927-5552), so now we do too — ENGCRS-style identity
    // frames carrying the unit factor, with no path to spatial CRS
    val p = Wkt.parseCrs(
      """PARAMETRICCRS["WMO standard atmosphere layer 0",
        PDATUM["Mean Sea Level",ANCHOR["1013.25 hPa at 15°C"]],
        CS[parametric,1],
        AXIS["pressure (hPa)",up],PARAMETRICUNIT["HectoPascal",100]]""")
    assert(p.kind == "parametric" && p.datum == "Mean Sea Level")
    assert(p.projString == "+proj=affine +s11=100", p.projString)
    val k = ProjString.parse(p.projString)
    val v = Array(10.1325, 0.0, 0.0, 0.0)
    assert(k.fwd(v) && math.abs(v(0) - 1013.25) < 1e-12)
    // unquoted WKT2 datetime literal in TIMEORIGIN (ISO 19162 §7.3.3)
    val t = Wkt.parseCrs(
      """TIMECRS["GPS time",
        TDATUM["Time origin",TIMEORIGIN[1980-01-01T00:00:00.0Z]],
        CS[TemporalDateTime,1],AXIS["time (T)",future]]""")
    assert(t.kind == "temporal" && t.datum == "Time origin")
    assert(t.projString == "+proj=affine", t.projString)
    // measured-duration variant: TIMEUNIT factor to seconds applies
    val ty = Wkt.parseCrs(
      """TIMECRS["DateTime in decimal years",
        TDATUM["Datum origin",TIMEORIGIN[0000]],
        CS[TemporalMeasure,1],AXIS["time (T)",future],
        TIMEUNIT["year",31556925.445]]""")
    val ky = ProjString.parse(ty.projString)
    val w = Array(2.0, 0.0, 0.0, 0.0)
    assert(ky.fwd(w) && math.abs(w(0) - 2 * 31556925.445) < 1e-6,
      s"${ty.projString} -> ${w(0)}")
  }

  test("DERIVEDGEOGCRS: netCDF CF pole rotation lowers to ob_tran") {
    // the reference's own c_api fixture (test_c_api.cpp:5730): grid north
    // pole lat 2, lon 3, north pole grid lon 4 must export as
    // +proj=ob_tran +o_proj=longlat +o_lon_p=4 +o_lat_p=2 +lon_0=183
    val wkt = """GEOGCRS["Rotated CRS",
      BASEGEOGCRS["Unknown datum based upon the GRS 1980 ellipsoid",
        DATUM["Not specified (based on GRS 1980 ellipsoid)",
          ELLIPSOID["GRS 1980",6378137,298.257222101]]],
      DERIVINGCONVERSION["Pole rotation (netCDF CF convention)",
        METHOD["Pole rotation (netCDF CF convention)"],
        PARAMETER["Grid north pole latitude (netCDF CF convention)",2],
        PARAMETER["Grid north pole longitude (netCDF CF convention)",3],
        PARAMETER["North pole grid longitude (netCDF CF convention)",4]],
      CS[ellipsoidal,2],
        AXIS["geodetic latitude (Lat)",north],
        AXIS["geodetic longitude (Lon)",east],
        ANGLEUNIT["degree",0.0174532925199433]]"""
    val crs = Wkt.parseCrs(wkt)
    assert(crs.kind == "derived-geog" && crs.latFirst)
    assert(crs.projString.contains("+proj=ob_tran +o_proj=longlat" +
      " +o_lon_p=4 +o_lat_p=2 +lon_0=183"), crs.projString)
    // numeric twin vs the hand-written reference export, <= 1 µm (in fact
    // the same kernel: exact)
    val k = ProjString.parse(crs.projString)
    val hand = ProjString.parse(
      "+proj=pipeline +step +proj=ob_tran +o_proj=longlat +o_lon_p=4" +
        " +o_lat_p=2 +lon_0=183 +ellps=GRS80" +
        " +step +proj=unitconvert +xy_in=rad +xy_out=deg")
    for ((lon, lat) <- Seq((10.0, 50.0), (-75.3, -12.6), (150.0, 80.0))) {
      val a = Array(math.toRadians(lon), math.toRadians(lat), 0.0, 0.0)
      val b = a.clone()
      assert(k.fwd(a) && hand.fwd(b))
      assert(a(0) == b(0) && a(1) == b(1), s"($lon,$lat): ${a.toSeq} vs ${b.toSeq}")
      // roundtrip through the derived graticule
      assert(k.inv(a))
      assert(math.abs(a(0) - math.toRadians(lon)) < 1e-11 &&
        math.abs(a(1) - math.toRadians(lat)) < 1e-11, s"roundtrip ${a.toSeq}")
    }
  }

  test("DERIVEDGEOGCRS: GRIB convention + PROJ-method spelling; WMO rejects typed") {
    def derived(conv: String) = s"""GEOGCRS["r",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563]]],
      $conv,
      CS[ellipsoidal,2],AXIS["latitude",north],AXIS["longitude",east],
      ANGLEUNIT["degree",0.0174532925199433]]"""
    // GRIB: south pole (lat -30, lon 10), axis rotation -25
    // -> o_lon_p=25 o_lat_p=30 lon_0=10 (conversion.cpp:4125)
    val grib = Wkt.parseCrs(derived(
      """DERIVINGCONVERSION["rot",METHOD["Pole rotation (GRIB convention)"],
        PARAMETER["Latitude of the southern pole (GRIB convention)",-30],
        PARAMETER["Longitude of the southern pole (GRIB convention)",10],
        PARAMETER["Axis rotation (GRIB convention)",-25]]"""))
    assert(grib.projString.contains(
      "+o_lon_p=25 +o_lat_p=30 +lon_0=10"), grib.projString)
    // the literal "PROJ ob_tran o_proj=longlat" method spelling
    val lit = Wkt.parseCrs(derived(
      """DERIVINGCONVERSION["c",METHOD["PROJ ob_tran o_proj=longlat"],
        PARAMETER["o_lat_p",52],PARAMETER["o_lon_p",-30]]"""))
    assert(lit.projString.contains("+proj=ob_tran +o_proj=longlat" +
      " +o_lat_p=52 +o_lon_p=-30"), lit.projString)
    // plain WMO "Pole rotation" has no PROJ lowering in the reference
    val e = intercept[Wkt.BadWkt](Wkt.parseCrs(derived(
      """DERIVINGCONVERSION["p",METHOD["Pole rotation"],
        PARAMETER["Latitude of rotated pole",52],
        PARAMETER["Longitude of rotated pole",-30],
        PARAMETER["Axis rotation",-25]]""")))
    assert(e.getMessage.contains("Pole rotation"))
  }

  test("unsupported deriving conversion method rejects with its name") {
    val wkt = """DERIVEDPROJCRS["x",
      BASEPROJCRS["b",
        BASEGEOGCRS["g",DATUM["d",ELLIPSOID["WGS 84",6378137,298.257223563]]],
        CONVERSION["c",METHOD["Transverse Mercator"],
          PARAMETER["Latitude of natural origin",0],
          PARAMETER["Longitude of natural origin",9]]],
      DERIVINGCONVERSION["dc",METHOD["Madrid to ED50 polynomial"]],
      CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],
      LENGTHUNIT["metre",1]]"""
    val e = intercept[Wkt.BadWkt](Wkt.parseCrs(wkt))
    assert(e.getMessage.contains("Madrid to ED50 polynomial"))
  }
}
