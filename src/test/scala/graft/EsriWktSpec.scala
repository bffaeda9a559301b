package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{ProjString, Wkt}

/** ESRI WKT1 dialect parsing — ArcGIS spells projection methods and
  * parameters with underscore names and hemisphere-specific method
  * variants that differ from both WKT2 and GDAL WKT1.  Behavioral
  * reference: the ESRI method/parameter alias tables the reference keeps
  * in src/iso19111/operation/esriparammappings.cpp (e.g. "Mercator" →
  * Mercator variant B, "Plate_Carree" → Equidistant Cylindrical,
  * "Stereographic_North_Pole" → Polar Stereographic variant B with
  * Standard_Parallel_1 as the true-scale latitude).  Each ESRI string is
  * verified numerically: its lowered kernel must agree with the
  * hand-written proj string to ≤1 µm at probe points. */
class EsriWktSpec extends AnyFunSuite {

  private val gcsWgs84 =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",""" +
      """SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
      """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""

  /** One ESRI PROJCS with the given method + (name, value) parameters. */
  private def esri(method: String, params: (String, Double)*): String = {
    val ps = params.map { case (k, v) => s"""PARAMETER["$k",$v]""" }.mkString(",")
    s"""PROJCS["test_$method",$gcsWgs84,PROJECTION["$method"],$ps,UNIT["Meter",1.0]]"""
  }

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
                         pts: Seq[(Double, Double)], tol: Double = 1e-6): Unit = {
    val crs = Wkt.parseCrs(wkt)
    val d = maxDiff(crs.projString, projRef, pts)
    assert(d <= tol, s"kernels diverge by $d: ${crs.projString} vs $projRef")
  }

  private val worldPts = Seq((3.7, 51.03), (-122.3, 37.8), (151.2, -33.9))
  private val northPts = Seq((3.7, 71.0), (-122.3, 78.8), (151.2, 85.0))
  private val southPts = Seq((3.7, -71.0), (-122.3, -78.8), (151.2, -85.0))
  private val wgs = "+ellps=WGS84"

  test("ESRI Mercator = variant B: Standard_Parallel_1 is true-scale lat") {
    assertSame(
      esri("Mercator", "False_Easting" -> 0.0, "False_Northing" -> 0.0,
        "Central_Meridian" -> 11.0, "Standard_Parallel_1" -> 42.0),
      s"+proj=merc +lon_0=11 +lat_ts=42 $wgs", worldPts)
  }

  test("ESRI Plate_Carree and Cylindrical_Equal_Area lower to eqc/cea") {
    assertSame(
      esri("Plate_Carree", "False_Easting" -> 0.0, "False_Northing" -> 0.0,
        "Central_Meridian" -> 0.0),
      s"+proj=eqc $wgs", worldPts)
    assertSame(
      esri("Cylindrical_Equal_Area", "False_Easting" -> 0.0,
        "False_Northing" -> 0.0, "Central_Meridian" -> -96.0,
        "Standard_Parallel_1" -> 30.0),
      s"+proj=cea +lon_0=-96 +lat_ts=30 $wgs", worldPts)
  }

  test("ESRI hemisphere-specific polar stereographic methods") {
    assertSame(
      esri("Stereographic_North_Pole", "False_Easting" -> 0.0,
        "False_Northing" -> 0.0, "Central_Meridian" -> -45.0,
        "Standard_Parallel_1" -> 70.0),
      s"+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 $wgs", northPts)
    assertSame(
      esri("Stereographic_South_Pole", "False_Easting" -> 0.0,
        "False_Northing" -> 0.0, "Central_Meridian" -> 0.0,
        "Standard_Parallel_1" -> -71.0),
      s"+proj=stere +lat_0=-90 +lat_ts=-71 $wgs", southPts)
  }

  test("ESRI world-atlas methods lower to their registry kernels") {
    val byName = Seq(
      "Winkel_Tripel" -> "wintri", "Aitoff" -> "aitoff",
      "Hammer_Aitoff" -> "hammer", "Bonne" -> "bonne",
      "Craster_Parabolic" -> "crast", "Quartic_Authalic" -> "qua_aut",
      "Flat_Polar_Quartic" -> "mbtfpq", "Times" -> "times",
      "Natural_Earth" -> "natearth", "Compact_Miller" -> "comill",
      "Patterson" -> "patterson", "Equal_Earth" -> "eqearth",
      "Eckert_I" -> "eck1", "Eckert_II" -> "eck2", "Eckert_III" -> "eck3",
      "Eckert_IV" -> "eck4", "Eckert_V" -> "eck5", "Eckert_VI" -> "eck6",
      "Wagner_IV" -> "wag4", "Wagner_V" -> "wag5", "Wagner_VII" -> "wag7",
      "Van_der_Grinten_I" -> "vandg", "Goode_Homolosine" -> "goode",
      "Winkel_I" -> "wink1", "Winkel_II" -> "wink2")
    for ((esriName, proj) <- byName) {
      val extra =
        if (esriName == "Bonne") Seq("Standard_Parallel_1" -> 40.0)
        else Nil
      val projExtra = if (esriName == "Bonne") " +lat_1=40" else ""
      assertSame(
        esri(esriName, (Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0,
          "Central_Meridian" -> 9.0) ++ extra): _*),
        s"+proj=$proj +lon_0=9$projExtra $wgs", worldPts)
    }
  }

  test("ESRI Loximuthal (Central_Parallel) and Vertical_Near_Side_Perspective (Height)") {
    assertSame(
      esri("Loximuthal", "False_Easting" -> 0.0, "False_Northing" -> 0.0,
        "Central_Meridian" -> 9.0, "Central_Parallel" -> 40.0),
      s"+proj=loxim +lon_0=9 +lat_1=40 $wgs", worldPts)
    assertSame(
      esri("Vertical_Near_Side_Perspective", "False_Easting" -> 0.0,
        "False_Northing" -> 0.0, "Longitude_Of_Center" -> 9.0,
        "Latitude_Of_Center" -> 45.0, "Height" -> 35800000.0),
      s"+proj=nsper +lon_0=9 +lat_0=45 +h=35800000 $wgs",
      Seq((3.7, 51.03), (15.0, 40.0), (9.0, 45.0)))
  }

  test("degree unit factor snaps: lon_0 from ESRI WKT is bit-exact") {
    val crs = Wkt.parseCrs(esri("Transverse_Mercator",
      "False_Easting" -> 500000.0, "False_Northing" -> 0.0,
      "Central_Meridian" -> -123.0, "Scale_Factor" -> 0.9996,
      "Latitude_Of_Origin" -> 0.0))
    assert(crs.projString.contains("+lon_0=-123 ") ||
           crs.projString.endsWith("+lon_0=-123"),
      s"lon_0 not bit-exact: ${crs.projString}")
  }
}
