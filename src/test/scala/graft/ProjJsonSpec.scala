package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{ProjJson, ProjString, Wkt, WktFormat}

/** PROJJSON CRS parsing + formatting, verified numerically the same way
  * WktSpec verifies WKT: each JSON document (authored from the public
  * EPSG registry definitions / the published PROJJSON schema) lowers to a
  * proj string whose kernel must agree with the hand-written reference
  * proj string to micrometres; the formatter must round-trip through the
  * parser bit-for-bit numerically.  Behavioral reference: JSONParser /
  * JSONFormatter (/root/reference/src/iso19111/io.cpp:5954) over
  * /root/reference/schemas/v0.7/projjson.schema.json. */
class ProjJsonSpec extends AnyFunSuite {

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

  private def assertSame(json: String, projRef: String,
                         pts: Seq[(Double, Double)],
                         tol: Double = 1e-6): Wkt.Crs = {
    val crs = ProjJson.parseCrs(json)
    val d = maxDiff(crs.projString, projRef, pts)
    assert(d <= tol, s"kernels diverge by $d for ${crs.name}: ${crs.projString}")
    crs
  }

  private val europePts = Seq((3.7, 51.03), (7.27, 46.95), (1.5, 43.6))
  private val worldPts = Seq((3.7, 51.03), (-122.3, 37.8), (151.2, -33.9))

  // --- parsing ---------------------------------------------------------------

  test("GeographicCRS WGS 84 with datum ensemble, lat-first authority order") {
    val json = """{
      "type": "GeographicCRS",
      "name": "WGS 84",
      "datum_ensemble": {
        "name": "World Geodetic System 1984 ensemble",
        "members": [{"name": "World Geodetic System 1984 (G2139)"}],
        "ellipsoid": {
          "name": "WGS 84",
          "semi_major_axis": 6378137,
          "inverse_flattening": 298.257223563
        },
        "accuracy": "2.0"
      },
      "coordinate_system": {
        "subtype": "ellipsoidal",
        "axis": [
          {"name": "Geodetic latitude", "abbreviation": "Lat",
           "direction": "north", "unit": "degree"},
          {"name": "Geodetic longitude", "abbreviation": "Lon",
           "direction": "east", "unit": "degree"}
        ]
      },
      "id": {"authority": "EPSG", "code": 4326}
    }"""
    val crs = assertSame(json, "+proj=longlat +ellps=WGS84", worldPts)
    assert(crs.kind == "geog" && crs.latFirst && crs.epsg.contains(4326))
  }

  test("GeographicCRS with DynamicGeodeticReferenceFrame (ITRF2014 shape)") {
    // the reference's own CoordinateMetadata example CRS
    // (test/unit/test_io.cpp json_import block)
    val json = """{
      "type": "GeographicCRS",
      "name": "ITRF2014",
      "datum": {
        "type": "DynamicGeodeticReferenceFrame",
        "name": "International Terrestrial Reference Frame 2014",
        "frame_reference_epoch": 2010,
        "ellipsoid": {
          "name": "GRS 1980",
          "semi_major_axis": 6378137,
          "inverse_flattening": 298.257222101
        }
      },
      "coordinate_system": {
        "subtype": "ellipsoidal",
        "axis": [
          {"name": "Geodetic latitude", "abbreviation": "Lat",
           "direction": "north", "unit": "degree"},
          {"name": "Geodetic longitude", "abbreviation": "Lon",
           "direction": "east", "unit": "degree"}
        ]
      },
      "id": {"authority": "EPSG", "code": 9000}
    }"""
    val crs = assertSame(json, "+proj=longlat +ellps=GRS80", worldPts)
    assert(crs.latFirst && crs.epsg.contains(9000))
  }

  test("ProjectedCRS UTM 32N from full Transverse Mercator parameters") {
    val json = """{
      "type": "ProjectedCRS",
      "name": "WGS 84 / UTM zone 32N",
      "base_crs": {
        "name": "WGS 84",
        "datum": {
          "type": "GeodeticReferenceFrame",
          "name": "World Geodetic System 1984",
          "ellipsoid": {"name": "WGS 84", "semi_major_axis": 6378137,
                        "inverse_flattening": 298.257223563}
        },
        "coordinate_system": {
          "subtype": "ellipsoidal",
          "axis": [
            {"name": "Geodetic latitude", "abbreviation": "Lat",
             "direction": "north", "unit": "degree"},
            {"name": "Geodetic longitude", "abbreviation": "Lon",
             "direction": "east", "unit": "degree"}
          ]
        }
      },
      "conversion": {
        "name": "UTM zone 32N",
        "method": {"name": "Transverse Mercator", "id": {"authority": "EPSG", "code": 9807}},
        "parameters": [
          {"name": "Latitude of natural origin", "value": 0, "unit": "degree",
           "id": {"authority": "EPSG", "code": 8801}},
          {"name": "Longitude of natural origin", "value": 9, "unit": "degree",
           "id": {"authority": "EPSG", "code": 8802}},
          {"name": "Scale factor at natural origin", "value": 0.9996,
           "unit": "unity", "id": {"authority": "EPSG", "code": 8805}},
          {"name": "False easting", "value": 500000, "unit": "metre",
           "id": {"authority": "EPSG", "code": 8806}},
          {"name": "False northing", "value": 0, "unit": "metre",
           "id": {"authority": "EPSG", "code": 8807}}
        ]
      },
      "coordinate_system": {
        "subtype": "Cartesian",
        "axis": [
          {"name": "Easting", "abbreviation": "E", "direction": "east", "unit": "metre"},
          {"name": "Northing", "abbreviation": "N", "direction": "north", "unit": "metre"}
        ]
      },
      "id": {"authority": "EPSG", "code": 32632}
    }"""
    val crs = assertSame(json, "+proj=utm +zone=32 +ellps=WGS84", europePts)
    assert(crs.kind == "projected" && crs.epsg.contains(32632))
  }

  test("ProjectedCRS Lambert-93 (LCC 2SP over GRS80)") {
    val json = """{
      "type": "ProjectedCRS",
      "name": "RGF93 v1 / Lambert-93",
      "base_crs": {
        "name": "RGF93 v1",
        "datum": {
          "type": "GeodeticReferenceFrame",
          "name": "Reseau Geodesique Francais 1993 v1",
          "ellipsoid": {"name": "GRS 1980", "semi_major_axis": 6378137,
                        "inverse_flattening": 298.257222101}
        },
        "coordinate_system": {
          "subtype": "ellipsoidal",
          "axis": [
            {"name": "Geodetic latitude", "abbreviation": "Lat",
             "direction": "north", "unit": "degree"},
            {"name": "Geodetic longitude", "abbreviation": "Lon",
             "direction": "east", "unit": "degree"}
          ]
        }
      },
      "conversion": {
        "name": "Lambert-93",
        "method": {"name": "Lambert Conic Conformal (2SP)",
                   "id": {"authority": "EPSG", "code": 9802}},
        "parameters": [
          {"name": "Latitude of false origin", "value": 46.5, "unit": "degree"},
          {"name": "Longitude of false origin", "value": 3, "unit": "degree"},
          {"name": "Latitude of 1st standard parallel", "value": 49, "unit": "degree"},
          {"name": "Latitude of 2nd standard parallel", "value": 44, "unit": "degree"},
          {"name": "Easting at false origin", "value": 700000, "unit": "metre"},
          {"name": "Northing at false origin", "value": 6600000, "unit": "metre"}
        ]
      },
      "coordinate_system": {
        "subtype": "Cartesian",
        "axis": [
          {"name": "Easting", "abbreviation": "X", "direction": "east", "unit": "metre"},
          {"name": "Northing", "abbreviation": "Y", "direction": "north", "unit": "metre"}
        ]
      },
      "id": {"authority": "EPSG", "code": 2154}
    }"""
    assertSame(json,
      "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 " +
        "+x_0=700000 +y_0=6600000 +ellps=GRS80", europePts)
  }

  test("parameters identified by EPSG code when names are nonstandard") {
    val json = """{
      "type": "ProjectedCRS",
      "name": "code-addressed UTM",
      "base_crs": {
        "name": "WGS 84",
        "datum": {"type": "GeodeticReferenceFrame", "name": "WGS84",
          "ellipsoid": {"name": "WGS 84", "semi_major_axis": 6378137,
                        "inverse_flattening": 298.257223563}},
        "coordinate_system": {"subtype": "ellipsoidal", "axis": [
          {"name": "Longitude", "direction": "east", "unit": "degree"},
          {"name": "Latitude", "direction": "north", "unit": "degree"}]}
      },
      "conversion": {
        "name": "zone 31",
        "method": {"name": "Transverse Mercator"},
        "parameters": [
          {"name": "localized origin lat", "value": 0, "unit": "degree",
           "id": {"authority": "EPSG", "code": 8801}},
          {"name": "localized origin lon", "value": 3, "unit": "degree",
           "id": {"authority": "EPSG", "code": 8802}},
          {"name": "localized scale", "value": 0.9996, "unit": "unity",
           "id": {"authority": "EPSG", "code": 8805}},
          {"name": "localized easting", "value": 500000, "unit": "metre",
           "id": {"authority": "EPSG", "code": 8806}},
          {"name": "localized northing", "value": 0, "unit": "metre",
           "id": {"authority": "EPSG", "code": 8807}}
        ]
      },
      "coordinate_system": {"subtype": "Cartesian", "axis": [
        {"name": "Easting", "direction": "east", "unit": "metre"},
        {"name": "Northing", "direction": "north", "unit": "metre"}]}
    }"""
    assertSame(json, "+proj=utm +zone=31 +ellps=WGS84", europePts)
  }

  test("BoundCRS lowers the abridged Helmert to +towgs84") {
    val json = """{
      "type": "BoundCRS",
      "source_crs": {
        "type": "GeographicCRS",
        "name": "OSGB36",
        "datum": {"type": "GeodeticReferenceFrame", "name": "OSGB 1936",
          "ellipsoid": {"name": "Airy 1830", "semi_major_axis": 6377563.396,
                        "inverse_flattening": 299.3249646}},
        "coordinate_system": {"subtype": "ellipsoidal", "axis": [
          {"name": "Geodetic latitude", "direction": "north", "unit": "degree"},
          {"name": "Geodetic longitude", "direction": "east", "unit": "degree"}]}
      },
      "target_crs": {
        "type": "GeographicCRS",
        "name": "WGS 84",
        "datum": {"type": "GeodeticReferenceFrame",
          "name": "World Geodetic System 1984",
          "ellipsoid": {"name": "WGS 84", "semi_major_axis": 6378137,
                        "inverse_flattening": 298.257223563}},
        "coordinate_system": {"subtype": "ellipsoidal", "axis": [
          {"name": "Geodetic latitude", "direction": "north", "unit": "degree"},
          {"name": "Geodetic longitude", "direction": "east", "unit": "degree"}]}
      },
      "transformation": {
        "name": "OSGB36 to WGS 84",
        "method": {"name": "Position Vector transformation (geog2D domain)",
                   "id": {"authority": "EPSG", "code": 9606}},
        "parameters": [
          {"name": "X-axis translation", "value": 446.448, "unit": "metre",
           "id": {"authority": "EPSG", "code": 8605}},
          {"name": "Y-axis translation", "value": -125.157, "unit": "metre",
           "id": {"authority": "EPSG", "code": 8606}},
          {"name": "Z-axis translation", "value": 542.06, "unit": "metre",
           "id": {"authority": "EPSG", "code": 8607}},
          {"name": "X-axis rotation", "value": 0.15,
           "unit": {"type": "AngularUnit", "name": "arc-second",
                    "conversion_factor": 4.84813681109536e-06},
           "id": {"authority": "EPSG", "code": 8608}},
          {"name": "Y-axis rotation", "value": 0.247,
           "unit": {"type": "AngularUnit", "name": "arc-second",
                    "conversion_factor": 4.84813681109536e-06},
           "id": {"authority": "EPSG", "code": 8609}},
          {"name": "Z-axis rotation", "value": 0.842,
           "unit": {"type": "AngularUnit", "name": "arc-second",
                    "conversion_factor": 4.84813681109536e-06},
           "id": {"authority": "EPSG", "code": 8610}},
          {"name": "Scale difference", "value": 0.99997951,
           "unit": "unity", "id": {"authority": "EPSG", "code": 8611}}
        ]
      }
    }"""
    val crs = ProjJson.parseCrs(json)
    // scale difference 0.99997951 ratio -> -20.49 ppm (float-rounded)
    assert(crs.projString.contains(
      "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.4"),
      crs.projString)
  }

  test("GeodeticCRS with Cartesian CS is geocentric") {
    val json = """{
      "type": "GeodeticCRS",
      "name": "WGS 84 geocentric",
      "datum": {"type": "GeodeticReferenceFrame",
        "name": "World Geodetic System 1984",
        "ellipsoid": {"name": "WGS 84", "semi_major_axis": 6378137,
                      "inverse_flattening": 298.257223563}},
      "coordinate_system": {"subtype": "Cartesian", "axis": [
        {"name": "Geocentric X", "abbreviation": "X", "direction": "geocentricX", "unit": "metre"},
        {"name": "Geocentric Y", "abbreviation": "Y", "direction": "geocentricY", "unit": "metre"},
        {"name": "Geocentric Z", "abbreviation": "Z", "direction": "geocentricZ", "unit": "metre"}]}
    }"""
    val crs = ProjJson.parseCrs(json)
    assert(crs.kind == "geocent")
    assert(crs.projString.startsWith("+proj=cart"))
  }

  test("sphere ellipsoid via radius; prime meridian in the datum") {
    val json = """{
      "type": "GeographicCRS",
      "name": "sphere paris",
      "datum": {"type": "GeodeticReferenceFrame", "name": "ignf sphere",
        "ellipsoid": {"name": "Sphere", "radius": 6371000},
        "prime_meridian": {"name": "Paris", "longitude": {
          "value": 2.5969213, "unit": {"type": "AngularUnit", "name": "grad",
                                       "conversion_factor": 0.015707963267949}}}},
      "coordinate_system": {"subtype": "ellipsoidal", "axis": [
        {"name": "Longitude", "direction": "east", "unit": "degree"},
        {"name": "Latitude", "direction": "north", "unit": "degree"}]}
    }"""
    val crs = ProjJson.parseCrs(json)
    // 2.5969213 grad = 2.33722917 degrees (the Paris meridian)
    assertSame(json, "+proj=longlat +R=6371000 +pm=2.33722917", worldPts,
      tol = 1e-9)
    assert(!crs.latFirst)
  }

  test("non-metre projected axis unit lowers to +to_meter") {
    val json = """{
      "type": "ProjectedCRS",
      "name": "ftUS tmerc",
      "base_crs": {
        "name": "NAD83",
        "datum": {"type": "GeodeticReferenceFrame",
          "name": "North American Datum 1983",
          "ellipsoid": {"name": "GRS 1980", "semi_major_axis": 6378137,
                        "inverse_flattening": 298.257222101}},
        "coordinate_system": {"subtype": "ellipsoidal", "axis": [
          {"name": "Geodetic latitude", "direction": "north", "unit": "degree"},
          {"name": "Geodetic longitude", "direction": "east", "unit": "degree"}]}
      },
      "conversion": {
        "name": "SPCS83-ish",
        "method": {"name": "Transverse Mercator"},
        "parameters": [
          {"name": "Latitude of natural origin", "value": 31, "unit": "degree"},
          {"name": "Longitude of natural origin", "value": -110.166666666667,
           "unit": "degree"},
          {"name": "Scale factor at natural origin", "value": 0.9999, "unit": "unity"},
          {"name": "False easting", "value": 700000, "unit": {
            "type": "LinearUnit", "name": "US survey foot",
            "conversion_factor": 0.304800609601219}},
          {"name": "False northing", "value": 0, "unit": {
            "type": "LinearUnit", "name": "US survey foot",
            "conversion_factor": 0.304800609601219}}
        ]
      },
      "coordinate_system": {"subtype": "Cartesian", "axis": [
        {"name": "Easting", "direction": "east", "unit": {
          "type": "LinearUnit", "name": "US survey foot",
          "conversion_factor": 0.304800609601219}},
        {"name": "Northing", "direction": "north", "unit": {
          "type": "LinearUnit", "name": "US survey foot",
          "conversion_factor": 0.304800609601219}}]}
    }"""
    assertSame(json,
      "+proj=tmerc +lat_0=31 +lon_0=-110.166666666667 +k=0.9999 " +
        "+x_0=213360.426720853 +y_0=0 +ellps=GRS80 +to_meter=0.304800609601219",
      Seq((-110.5, 32.2), (-109.8, 33.5)), tol = 1e-6)
  }

  test("CompoundCRS lowers the vertical unit to +vto_meter") {
    val json = """{
      "type": "CompoundCRS",
      "name": "WGS 84 + height (ft)",
      "components": [
        {
          "type": "GeographicCRS",
          "name": "WGS 84",
          "datum": {"type": "GeodeticReferenceFrame",
            "name": "World Geodetic System 1984",
            "ellipsoid": {"name": "WGS 84", "semi_major_axis": 6378137,
                          "inverse_flattening": 298.257223563}},
          "coordinate_system": {"subtype": "ellipsoidal", "axis": [
            {"name": "Geodetic latitude", "direction": "north", "unit": "degree"},
            {"name": "Geodetic longitude", "direction": "east", "unit": "degree"}]}
        },
        {
          "type": "VerticalCRS",
          "name": "height (ft)",
          "datum": {"type": "VerticalReferenceFrame", "name": "local"},
          "coordinate_system": {"subtype": "vertical", "axis": [
            {"name": "Gravity-related height", "abbreviation": "H",
             "direction": "up", "unit": {"type": "LinearUnit", "name": "foot",
                                         "conversion_factor": 0.3048}}]}
        }
      ]
    }"""
    val crs = ProjJson.parseCrs(json)
    assert(crs.projString.contains("+vto_meter=0.3048"), crs.projString)
  }

  test("rejects unknown object and unit types with a clear message") {
    val e1 = intercept[ProjJson.BadProjJson] {
      ProjJson.parseCrs("""{"type": "TemporalCRS", "name": "t"}""")
    }
    assert(e1.getMessage.contains("TemporalCRS"))
    intercept[ProjJson.BadProjJson] { ProjJson.parseCrs("not json at all {") }
    val e3 = intercept[ProjJson.BadProjJson] {
      ProjJson.parseCrs("""{
        "type": "GeographicCRS", "name": "x",
        "datum": {"type": "GeodeticReferenceFrame", "name": "d",
          "ellipsoid": {"name": "e", "semi_major_axis": 6378137,
                        "inverse_flattening": 298.3}},
        "coordinate_system": {"subtype": "ellipsoidal", "axis": [
          {"name": "Longitude", "direction": "east", "unit": "furlong"},
          {"name": "Latitude", "direction": "north", "unit": "degree"}]}
      }""")
    }
    assert(e3.getMessage.contains("furlong"))
  }

  // --- formatting ------------------------------------------------------------

  private def roundTrips(spec: String, pts: Seq[(Double, Double)]): Unit = {
    val json = ProjJson.format(spec)
    val crs = ProjJson.parseCrs(json)
    val d = maxDiff(crs.projString, spec, pts)
    assert(d <= 1e-6, s"format->parse of $spec diverges by $d: ${crs.projString}\n$json")
  }

  test("format -> parse round-trips numerically (geog, projected, bound)") {
    roundTrips("+proj=longlat +ellps=WGS84", worldPts)
    roundTrips("+proj=utm +zone=32 +ellps=WGS84", europePts)
    roundTrips("+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 " +
      "+x_0=700000 +y_0=6600000 +ellps=GRS80", europePts)
    roundTrips("+proj=longlat +ellps=bessel " +
      "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725", worldPts)
    roundTrips("+proj=sterea +lat_0=52.1561605555556 +lon_0=5.38763888888889 " +
      "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel", europePts)
    roundTrips("+proj=webmerc +ellps=WGS84", worldPts)
  }

  test("format of an EPSG builtin round-trips") {
    // the reference kernel comes from the builtin table expansion, since
    // ProjString.parse of the bare code is the formatter's own input path
    val ref = graft.geo.proj.EpsgInit.lookup("epsg:32632").get
    val json = ProjJson.format("EPSG:32632")
    val crs = ProjJson.parseCrs(json)
    val d = maxDiff(crs.projString, ref, europePts)
    assert(d <= 1e-6, s"EPSG:32632 via PROJJSON diverges by $d: ${crs.projString}")
  }

  test("formatter output carries the schema marker and type tags") {
    val json = ProjJson.format("+proj=utm +zone=32 +ellps=WGS84")
    assert(json.contains("\"$schema\""))
    assert(json.contains("\"ProjectedCRS\""))
    assert(json.contains("\"Transverse Mercator\""))
    // and the WKT parser path and JSON parser path agree exactly
    val viaWkt = Wkt.parseCrs(WktFormat.format("+proj=utm +zone=32 +ellps=WGS84"))
    val viaJson = ProjJson.parseCrs(json)
    assert(viaWkt.projString == viaJson.projString,
      s"${viaWkt.projString} != ${viaJson.projString}")
  }

  // --- ProjString front-end integration --------------------------------------

  test("ProjString.parse accepts PROJJSON text directly") {
    val json = ProjJson.format("+proj=utm +zone=32 +ellps=WGS84")
    val k = ProjString.parse(json)
    val kRef = ProjString.parse("+proj=utm +zone=32 +ellps=WGS84")
    val a = Array(math.toRadians(9.5), math.toRadians(51.0), 0.0, 0.0)
    val b = a.clone()
    assert(k.fwd(a) && kRef.fwd(b))
    assert(math.abs(a(0) - b(0)) <= 1e-6 && math.abs(a(1) - b(1)) <= 1e-6)
  }
}
