package graft

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.geo.expr.{geo, Dms, GraftExtensions, GraftFunctions}

/** The SQL function surface must be plan-identical to the Column DSL,
  * and the DMS pair must match the reference's dmstor/rtodms semantics
  * (/root/reference/src/dmstor.cpp, /root/reference/src/rtodms.cpp). */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sql-surface-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pts() = {
    val df = spark.range(200).select(col("id"),
      (col("id") * 1.7 - 170.0).as("lon"),
      (col("id") * 0.8 - 80.0).as("lat"))
    df.createOrReplaceTempView("pts_sqlsurface")
    df
  }

  test("proj_trans SQL text equals the crsTransform Column DSL, bit for bit") {
    val df = pts()
    val viaSql = spark.sql(
      """SELECT id, proj_trans('EPSG:4326', 'EPSG:3857', lon, lat) AS p
        |FROM pts_sqlsurface""".stripMargin)
      .select(col("id"), col("p.x"), col("p.y")).collect()
    val p = geo.crsTransform("EPSG:4326", "EPSG:3857", col("lon"), col("lat"))
    val viaDsl = df.select(col("id"), p.getField("x"), p.getField("y")).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaDsl.map(_.toSeq).toSeq)
  }

  test("proj_trans accepts coordinate-epoch spellings through SQL (r5)") {
    // the epoch-aware front door composes into the SQL surface for free:
    // equal epochs short-circuit to the static path; differing epochs
    // without a usable point-motion operation refuse TYPED — never a
    // silent static transform (the same contract as the Scala API)
    val df = pts()
    val ok = spark.sql(
      """SELECT id, proj_trans('EPSG:4326@2015.0', 'EPSG:4326@2015.0',
        |  lon, lat) AS p FROM pts_sqlsurface""".stripMargin)
      .select(col("id"), col("p.x"), col("p.y")).collect()
    assert(ok.nonEmpty && ok.forall(!_.isNullAt(1)))
    val e = intercept[Exception] {
      spark.sql(
        """SELECT proj_trans('EPSG:8255@2002.0', 'EPSG:8255@2010.0',
          |  lon, lat) AS p FROM pts_sqlsurface""".stripMargin).collect()
    }
    assert(e.getMessage.contains("unavailable") ||
      e.getMessage.contains("epoch"), e.getMessage)
  }

  test("proj_fwd / proj_inv SQL roundtrip closes at UTM exactness") {
    val bad = spark.sql(
      """SELECT id, lon, lat,
        |  proj_inv('+proj=utm +zone=32 +ellps=GRS80',
        |    proj_fwd('+proj=utm +zone=32 +ellps=GRS80', lon / 40.0 + 9.0, lat / 3.0).x,
        |    proj_fwd('+proj=utm +zone=32 +ellps=GRS80', lon / 40.0 + 9.0, lat / 3.0).y) AS rt
        |FROM pts_sqlsurface""".stripMargin)
      .where(abs(col("rt.x") - (col("lon") / 40.0 + 9.0)) > 1e-9 ||
        abs(col("rt.y") - col("lat") / 3.0) > 1e-9)
      .count()
    assert(bad == 0)
  }

  test("cell functions through SQL match the DSL") {
    val df = pts()
    val sqlRows = spark.sql(
      """SELECT id, cell_id(lon, lat, 10) AS c,
        |       cell_parent(cell_id(lon, lat, 10), 4) AS par,
        |       cell_decode(cell_id(lon, lat, 10)).face AS face,
        |       size(cell_neighbors(cell_id(lon, lat, 10), 1)) AS nn
        |FROM pts_sqlsurface""".stripMargin).collect()
    val dslRows = df.select(col("id"),
      geo.cellId(col("lon"), col("lat"), 10).as("c"),
      geo.cellParent(geo.cellId(col("lon"), col("lat"), 10), 4).as("par"),
      geo.cellDecode(geo.cellId(col("lon"), col("lat"), 10)).getField("face"),
      size(geo.cellNeighbors(geo.cellId(col("lon"), col("lat"), 10), 1))).collect()
    assert(sqlRows.map(_.toSeq).toSeq == dslRows.map(_.toSeq).toSeq)
  }

  test("tile / quadkey / geohash functions through SQL match the DSL") {
    val df = pts()
    val sqlRows = spark.sql(
      """SELECT id, tile_id(lon, lat, 9) AS t,
        |       tile_decode(tile_id(lon, lat, 9)).x AS x,
        |       quadkey(tile_id(lon, lat, 9)) AS qk,
        |       quadkey_to_tile(quadkey(tile_id(lon, lat, 9))) AS qkt,
        |       geohash(lon, lat, 6) AS gh,
        |       geohash_decode(geohash(lon, lat, 6)).lon AS glon,
        |       quadkey_to_tile('21x') AS badqk,
        |       geohash_decode('ez4a2') AS badgh
        |FROM pts_sqlsurface""".stripMargin).collect()
    val dslRows = df.select(col("id"),
      geo.tileId(col("lon"), col("lat"), 9).as("t"),
      geo.tileDecode(geo.tileId(col("lon"), col("lat"), 9)).getField("x"),
      geo.quadkey(geo.tileId(col("lon"), col("lat"), 9)).as("qk"),
      geo.quadkeyToTile(geo.quadkey(geo.tileId(col("lon"), col("lat"), 9))),
      geo.geohash(col("lon"), col("lat"), 6).as("gh"),
      geo.geohashDecode(geo.geohash(col("lon"), col("lat"), 6)).getField("lon"),
      geo.quadkeyToTile(lit("21x")),
      geo.geohashDecode(lit("ez4a2"))).collect()
    assert(sqlRows.map(_.toSeq).toSeq == dslRows.map(_.toSeq).toSeq)
    assert(sqlRows.forall(r => r.isNullAt(7) && r.isNullAt(8)))
  }

  test("geod_distance / geod_direct / geod_waypoints through SQL") {
    // Flinders Peak -> Buninyong (the reference's canonical pair)
    val r = spark.sql(
      """SELECT geod_distance(144.42486788889, -37.95103341667,
        |                     143.92649552778, -37.65282113889) AS d,
        |       geod_direct(144.42486788889, -37.95103341667, 306.86815920333,
        |                   54972.271) AS dir,
        |       geod_waypoints(144.42486788889, -37.95103341667,
        |                      143.92649552778, -37.65282113889, 4) AS wps
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 54972.271) < 0.01)
    val dir = r.getStruct(1)
    assert(math.abs(dir.getDouble(0) - 143.92649552778) < 1e-6)
    assert(math.abs(dir.getDouble(1) - (-37.65282113889)) < 1e-6)
    val wps = r.getSeq[Row](2)
    assert(wps.length == 5)
    assert(math.abs(wps.last.getDouble(0) - 143.92649552778) < 1e-9)
  }

  test("point_in_polygon through SQL") {
    val inout = spark.sql(
      """SELECT point_in_polygon(0.5D, 0.5D, array(0D,0D, 1D,0D, 1D,1D, 0D,1D)) AS a,
        |       point_in_polygon(1.5D, 0.5D, array(0D,0D, 1D,0D, 1D,1D, 0D,1D)) AS b
        |""".stripMargin).head()
    assert(inout.getBoolean(0) && !inout.getBoolean(1))
  }

  test("proj_factors through SQL matches the ProjFactors API") {
    val r = spark.sql(
      """SELECT proj_factors('+proj=merc +ellps=WGS84', 0.0D, 55.5D) AS f""")
      .select(col("f.meridional_scale"), col("f.parallel_scale"),
        col("f.areal_scale"), col("f.meridian_convergence")).head()
    val f = graft.geo.proj.ProjFactors.at("+proj=merc +ellps=WGS84", 0.0, 55.5).get
    assert(r.getDouble(0) == f.meridionalScale)
    assert(r.getDouble(1) == f.parallelScale)
    assert(r.getDouble(2) == f.arealScale)
    assert(r.getDouble(3) == f.meridianConvergence)
    // conformal: h == k to the derivative step's accuracy
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
  }

  test("proj_trans_bounds through SQL matches the TransBounds API") {
    val r = spark.sql(
      """SELECT proj_trans_bounds('EPSG:4326', 'EPSG:3857',
        |  -10.0D, 40.0D, 15.0D, 55.0D) AS b""".stripMargin)
      .select(col("b.xmin"), col("b.ymin"), col("b.xmax"), col("b.ymax")).head()
    val k = graft.geo.proj.OperationFactory.crsToCrs("EPSG:4326", "EPSG:3857")
    val b = graft.geo.proj.TransBounds.transform(
      k, forward = true, -10.0, 40.0, 15.0, 55.0, 21).get
    assert(r.getDouble(0) == b.xmin && r.getDouble(1) == b.ymin &&
      r.getDouble(2) == b.xmax && r.getDouble(3) == b.ymax)
    // webmerc of lon -10/15 is a*(lon in rad): spot-check magnitudes
    assert(math.abs(r.getDouble(0) - 6378137.0 * math.toRadians(-10)) < 1e-3)
    assert(math.abs(r.getDouble(2) - 6378137.0 * math.toRadians(15)) < 1e-3)
  }

  test("geod_polygon_area through SQL matches the geodesic API and geometric bounds") {
    // GeographicLib Planimeter test polygon: ring of latitude 89N sampled
    // at 4 meridians (counter-clockwise seen from the pole)
    val r = spark.sql(
      """SELECT geod_polygon_area(
        |  array(0D,89D, 90D,89D, 180D,89D, 270D,89D)) AS s""".stripMargin)
      .select(col("s.area_m2"), col("s.perimeter_m")).head()
    val (area, per) = graft.geo.geodesic.Geodesic.WGS84.polygonArea(
      Seq((89.0, 0.0), (89.0, 90.0), (89.0, 180.0), (89.0, 270.0)))
    assert(math.abs(r.getDouble(0) - area) <= math.abs(area) * 1e-15)
    assert(math.abs(r.getDouble(1) - per) <= 1e-8)
    // geometric sanity: a near-polar square with circumradius r = the
    // 89->90 meridian arc (111.695 km) has side ~ r*sqrt(2) and area ~ 2r^2
    assert(per > 6.30e5 && per < 6.33e5, s"perimeter $per")
    assert(area > 2.46e10 && area < 2.52e10, s"area $area")
  }

  test("dmstor parses DMS text; unparseable input is null, 'r' means radians") {
    val r = spark.sql(
      """SELECT dmstor('45d30''15.3"N') AS a, dmstor('0.5r') AS b,
        |       dmstor('-12.25') AS c, dmstor('83d10''W') AS d,
        |       dmstor('not a coordinate') AS e""".stripMargin).head()
    assert(math.abs(r.getDouble(0) -
      math.toRadians(45 + 30 / 60.0 + 15.3 / 3600.0)) < 1e-15)
    assert(r.getDouble(1) == 0.5)
    assert(math.abs(r.getDouble(2) - math.toRadians(-12.25)) < 1e-15)
    assert(math.abs(r.getDouble(3) - math.toRadians(-(83 + 10 / 60.0))) < 1e-15)
    assert(r.isNullAt(4))
  }

  test("rtodms formats per the reference algorithm (zero-field elision)") {
    def f(deg: Double) = Dms.radToDms(math.toRadians(deg), 0, 0, 3).toString
    assert(f(45 + 30 / 60.0 + 15.3 / 3600.0) == "45d30'15.3\"")
    assert(f(-(45 + 30 / 60.0 + 15.3 / 3600.0)) == "-45d30'15.3\"")
    assert(f(45.5) == "45d30'")
    assert(f(45.0) == "45d")
    assert(f(10 + 0.25 / 3600.0) == "10d0'0.25\"")
    // .5 milli-arcsecond rounding, then full trailing-zero trim
    assert(f(10 + 15.0004 / 3600.0) == "10d0'15\"")
    // hemisphere suffixes: sign char consumes the leading '-'
    assert(Dms.radToDms(math.toRadians(-45.5), 'N', 'S', 3).toString == "45d30'S")
    assert(Dms.radToDms(math.toRadians(45.5), 'N', 'S', 3).toString == "45d30'N")
    // through SQL, with dmstor closing the loop
    val r = spark.sql(
      """SELECT rtodms(dmstor('117d38''42.1"W')) AS a,
        |       rtodms(dmstor('117d38''42.1"W'), 'E', 'W') AS b""".stripMargin).head()
    assert(r.getString(0) == "-117d38'42.1\"")
    assert(r.getString(1) == "117d38'42.1\"W")
  }

  test("non-literal CRS / level arguments are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT cell_id(1.0D, 2.0D, CAST(id AS INT)) FROM pts_sqlsurface").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("data-op SQL functions equal their library twins, bit for bit") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "the cat and the cat and the cat sat", "HTTPS://WWW.A.example.co.uk:443/x//?utm_x=1#f"),
      (2L, "der Hund ist nicht ein Hund 555-123-4567 a@b.cc", "http://u@b.io:80/p/"),
      (3L, "", "c.example.com/q?ref=r&k=2")).toDF("id", "text", "url")
    docs.createOrReplaceTempView("docs_sqlsurface")
    val viaSql = spark.sql(
      """SELECT id, doc_fingerprint(text) AS fp, simhash(text) AS sh,
        |  minhash(text, 8, 2) AS mh, repetition_stats(text) AS rs,
        |  token_count_ws(text) AS tw, token_count_bpe(text) AS tb,
        |  lang_id(text) AS lg, quality_score(text) AS q,
        |  redact_pii(text) AS rp, split_assign(text) AS sp,
        |  url_normalize(url) AS un, url_host(url) AS uh,
        |  url_domain(url) AS ud
        |FROM docs_sqlsurface""".stripMargin).collect()
    val d = graft.data.dataops
    val t = graft.data.TextOps
    val u = graft.data.UrlOps
    val viaDsl = docs.select(col("id"), d.fingerprint(col("text")),
      d.simhash(col("text")), d.minhash(col("text"), 8, 2),
      d.repetitionStats(col("text")), t.tokenCountWs(col("text")),
      t.tokenCountBpe(col("text")), t.langId(col("text")),
      t.qualityScore(col("text")), t.redactPii(col("text")),
      t.splitAssign(col("text")), u.normalizeUrl(col("url")),
      u.urlHost(col("url")),
      u.registeredDomain(u.urlHost(col("url")))).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaDsl.map(_.toSeq).toSeq)
    // spot-pin two url values so both paths can't be wrong together
    val r1 = viaSql.find(_.getLong(0) == 1L).get
    assert(r1.getString(11) == "https://a.example.co.uk/x" &&
      r1.getString(13) == "example.co.uk")
  }

  test("GraftExtensions injects the full surface at session build") {
    // the documented injection point: applying the extensions object must
    // accept every function description without error
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftFunctions.all.map(_._1.funcName).distinct.size ==
      GraftFunctions.all.size)
  }
}
