package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.geo.engine.GeoEngine
import graft.geo.synth.DocCorpus

class GeoEngineSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("geo-engine-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus(n: Long, parts: Int) =
    DocCorpus.generate(spark, n, seed = 42, parts = parts).toDF()

  test("corpus is deterministic and partition-count independent") {
    val h4 = DocCorpus.spanChecksum(corpus(2000, 4))
    val h13 = DocCorpus.spanChecksum(corpus(2000, 13))
    assert(h4 == h13)
  }

  test("geo-tag extraction preserves the span sequence and parses coords") {
    val docs = corpus(500, 3)
    val withGeo = GeoEngine.withGeoTag(docs)
    // span invariant: spans column byte-identical before/after
    assert(DocCorpus.spanChecksum(docs) == DocCorpus.spanChecksum(withGeo))
    // every doc has a parseable geo-tag matching the generator
    val rows = withGeo.select("doc_id", "lon", "lat").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getString(0).stripPrefix("doc").toLong
      val (lon, lat) = DocCorpus.lonLat(42, id)
      assert(r.getDouble(1) == lon && r.getDouble(2) == lat,
        s"doc $id geo mismatch")
    }
  }

  test("geo-tag extraction edges: no media span, no tag, malformed numerics") {
    val sp = spark; import sp.implicits._
    val spans = Seq(
      ("d_none", Seq[Option[String]]()),
      ("d_nulls", Seq[Option[String]](None, None)),
      ("d_notag", Seq(Option("img://a"))),
      ("d_short", Seq(Option("img://a?geo=35.5"))),
      ("d_bad", Seq(Option("img://a?geo=x,9.25"))),
      ("d_ok", Seq(None, Option("img://a?geo=-12.5,139.75"), Option("img://b?geo=1,2")))
    ).toDF("doc_id", "refs")
      .select(col("doc_id"), transform(col("refs"), r =>
        struct(lit("s").as("kind"), lit(null).cast("string").as("text"),
          r.as("media_ref"), lit(0).as("offset"))).as("spans"))
    val out = GeoEngine.withGeoTag(spans)
      .select("doc_id", "lat", "lon").collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out("d_none") == (None, None))
    assert(out("d_nulls") == (None, None))
    assert(out("d_notag") == (None, None))
    assert(out("d_short") == (Some(35.5), None))
    assert(out("d_bad") == (None, Some(9.25)))
    // first non-null ref wins; the later ref is ignored
    assert(out("d_ok") == (Some(-12.5), Some(139.75)))
  }

  test("tile assignments are bit-for-bit identical across parallelism") {
    def assignments(parts: Int, shuffle: Int): String = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", shuffle)
      val docs = DocCorpus.generate(s2, 3000, 42, parts).toDF()
      val t = GeoEngine.tiled(GeoEngine.withGeoTag(docs), 8)
      GeoEngine.canonicalChecksum(t, Seq("doc_id", "cell"))
    }
    assert(assignments(parts = 3, shuffle = 3) == assignments(parts = 11, shuffle = 11))
  }

  test("tile pyramid equals direct per-level tiling and conserves totals") {
    val pts = GeoEngine.withGeoTag(corpus(3000, 5))
    val pyr = GeoEngine.tilePyramid(pts, minLevel = 2, maxLevel = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every level must equal an independent single-level aggregation
    // (the parent ladder is exactly the per-level encoding)
    for (l <- 2 to 6) {
      val direct = GeoEngine.tileOccupancy(pts, l)
        .collect().map(r => (l, r.getLong(0)) -> r.getLong(1)).toMap
      assert(pyr.view.filterKeys(_._1 == l).toMap == direct, s"level $l")
    }
    // counts are conserved at every level
    for (l <- 2 to 6)
      assert(pyr.collect { case ((`l`, _), n) => n }.sum == 3000L)
  }

  test("geoSample caps each cell at n docs, chosen by content fingerprint") {
    val docs = GeoEngine.withGeoTag(corpus(3000, 4))
      .withColumn("text", concat(lit("doc "), col("doc_id")))
    val out = GeoEngine.geoSample(docs, level = 4, nPerCell = 3)
      .select("doc_id").collect().map(_.getString(0)).toSet
    // oracle: per-cell sort by (fingerprint, id), take 3 — driver-side
    val ranked = GeoEngine.tiled(docs, 4)
      .select(col("doc_id"), col("cell"),
        graft.data.dataops.fingerprint(
          concat(col("text"), lit(" "), col("doc_id"))).as("fp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ranked.groupBy(_._2).values.flatMap(g =>
      g.sortBy(x => (x._3, x._1)).take(3)).map(_._1).toSet
    assert(expected.size < 3000, "cap must bind on the hotspot corpus")
    assert(out == expected)
    // and the cap holds per cell by construction
    val perCell = ranked.filter(x => out(x._1)).groupBy(_._2).values.map(_.size)
    assert(perCell.max <= 3)
  }

  test("PIP join matches per-row evaluation of the same predicate") {
    val docs = GeoEngine.withGeoTag(corpus(3000, 4))
    // box around hotspot 1 (Tokyo-ish) and a triangle around hotspot 2
    val polys = Seq(
      GeoEngine.Polygon("box_tokyo",
        Array(139.0, 35.2, 140.4, 35.2, 140.4, 36.2, 139.0, 36.2)),
      GeoEngine.Polygon("tri_ny",
        Array(-74.6, 40.2, -73.4, 40.2, -74.0, 41.3)))
    val joined = GeoEngine.pipJoin(spark, docs, polys, coverLevel = 6)
      .select("doc_id", "poly_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // oracle: direct scalar evaluation per doc x poly
    val pts = docs.select("doc_id", "lon", "lat").collect()
    val expected = (for {
      r <- pts
      p <- polys
      if graft.geo.expr.PointInPolygonExpr.contains(r.getDouble(1), r.getDouble(2), p.ring)
    } yield (r.getString(0), p.poly_id)).toSet
    assert(expected.nonEmpty, "test polygons caught no points — bad fixture")
    assert(joined == expected)
  }

  test("PIP join cover is complete for continent-sized polygons") {
    val docs = GeoEngine.withGeoTag(corpus(4000, 4))
    // 60x40 degree box: would overflow any fine-level sampled cover
    val big = Seq(GeoEngine.Polygon("bigbox",
      Array(-120.3, -30.2, -60.1, -30.2, -60.1, 10.4, -120.3, 10.4)))
    val joined = GeoEngine.pipJoin(spark, docs, big)
      .select("doc_id").collect().map(_.getString(0)).toSet
    val expected = docs.select("doc_id", "lon", "lat").collect().filter { r =>
      graft.geo.expr.PointInPolygonExpr.contains(
        r.getDouble(1), r.getDouble(2), big.head.ring)
    }.map(_.getString(0)).toSet
    assert(expected.nonEmpty)
    assert(joined == expected, s"missing=${(expected -- joined).size} extra=${(joined -- expected).size}")
  }

  test("PIP join: mixed per-polygon cover levels resolve in one lookup table") {
    val docs = GeoEngine.withGeoTag(corpus(3000, 4))
    // natural cover levels differ: a city-block box covers at a fine
    // level, the continent box at a coarse one — both live in the same
    // level-tagged CoverTable and must both match through the multi-level
    // bit-chop lookup
    val polys = Seq(
      GeoEngine.Polygon("tiny_tokyo",
        Array(139.5, 35.4, 140.1, 35.4, 140.1, 36.0, 139.5, 36.0)),
      GeoEngine.Polygon("bigbox",
        Array(-120.3, -30.2, -60.1, -30.2, -60.1, 10.4, -120.3, 10.4)))
    val pts = docs.select("doc_id", "lon", "lat").collect()
    val expected = (for {
      r <- pts
      p <- polys
      if graft.geo.expr.PointInPolygonExpr.contains(
        r.getDouble(1), r.getDouble(2), p.ring)
    } yield (r.getString(0), p.poly_id)).toSet
    assert(expected.exists(_._2 == "tiny_tokyo") &&
      expected.exists(_._2 == "bigbox"), "fixture must hit both polygons")
    val joined = GeoEngine.pipJoin(spark, docs, polys)
      .select("doc_id", "poly_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(joined == expected)
  }

  test("CoverTable lookup: shared cells emit every polygon; misses are null") {
    val cells = graft.geo.cells.CellIndex
    // two polygons covering the same level-6 cell + one at level 3
    val c6 = cells.cellId(10.0, 50.0, 6)
    val c3 = cells.cellId(10.0, 50.0, 3)
    val other6 = cells.cellId(-100.0, -20.0, 6)
    val t = graft.geo.expr.CoverTable(
      Seq((c6, 0), (c6, 1), (c3, 2), (other6, 3)))
    val hit = t.lookup(10.0, 50.0)
    assert(hit != null && hit.toIntArray().toSet == Set(0, 1, 2))
    val miss = t.lookup(60.0, 10.0)
    assert(miss == null)
    val single = t.lookup(-100.0, -20.0)
    assert(single != null && single.toIntArray().toSeq == Seq(3))
  }

  test("childrenAt enumerates exactly the Morton block under the parent") {
    val cells = graft.geo.cells.CellIndex
    val parent = cells.cellId(139.7, 35.7, 6)
    val kids = cells.childrenAt(parent, 9)
    assert(kids.length == (1 << 6) && kids.toSet.size == kids.length)
    kids.foreach { k =>
      assert(cells.levelOf(k) == 9 && cells.parent(k, 6) == parent)
    }
    // identity at the same level
    assert(cells.childrenAt(parent, 6).toSeq == Seq(parent))
  }

  test("cell kNN matches brute force when ring covers the distance budget") {
    val docs = GeoEngine.withGeoTag(corpus(2000, 4))
    val data = docs.select(col("doc_id").as("data_id"), col("lon"), col("lat"))
    // queries: 30 docs re-used as query points (dense region guaranteed)
    val queries = docs.limit(30)
      .select(col("doc_id").as("query_id"), col("lon"), col("lat"))
    // level 4 cells are ~2000 km wide: ring 1 covers any plausible top-3
    // in the clustered corpus
    val cellKnn = GeoEngine.knnJoin(queries, data, k = 3, level = 4, ring = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3))).toSet
    val brute = GeoEngine.knnBruteForce(queries, data, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3))).toSet
    assert(cellKnn == brute)
  }

  test("neighborhood coverage guarantee holds across cube-face boundaries") {
    // knnJoin's settling rule and distanceJoin's cover both assume: any
    // point within ringSafeRadius(level, r) of a query lies in a cell of
    // neighborhood(cellOf(query), r).  On one face that is plain grid
    // geometry; across a face edge the gnomonic warp distorts the
    // adjacent face's grid and the off-face cells are found by
    // center-point re-projection, so this pins that ringSafeRadius's 0.5
    // safety factor really does absorb the warp (an exhaustive 14.5M-probe
    // sweep over face-edge cells at levels 5/8/11, rings 1-4 found zero
    // violations; this is the fast regression net).  Probe points hugging
    // the +/-45-degree face-edge meridians, walk the full azimuth circle
    // at 0.999x the guaranteed radius, and require every landing cell to
    // be in the neighborhood.
    import graft.geo.cells.CellIndex
    val g = graft.geo.geodesic.Geodesic.WGS84
    val rnd = new scala.util.Random(7)
    for (level <- Seq(6, 10); ring <- Seq(1, 2, 3)) {
      val safe = GeoEngine.ringSafeRadius(level, ring)
      var crossing = 0
      var attempts = 0
      while (crossing < 30 && attempts < 4000) {
        attempts += 1
        val lon = (rnd.nextInt(8) * 45.0 - 180.0) +
          (rnd.nextDouble() - 0.5) * 4.0 * math.pow(2.0, 6 - level)
        val lat = (rnd.nextDouble() - 0.5) * 176.0
        val c = CellIndex.cellId(lon, lat, level)
        val nb = CellIndex.neighborhood(c, ring)
        val home = CellIndex.faceOfId(c)
        if (nb.exists(CellIndex.faceOfId(_) != home)) {
          crossing += 1
          val nbSet = nb.toSet
          var az = 0
          while (az < 72) {
            val d = g.direct(lat, lon, az * 5.0, safe * 0.999)
            val hit = CellIndex.cellId(d.lon2, d.lat2, level)
            assert(nbSet.contains(hit),
              s"level=$level ring=$ring from ($lon,$lat) az=${az * 5} " +
                s"landed in cell $hit outside the ${nb.length}-cell neighborhood")
            az += 1
          }
        }
      }
      assert(crossing >= 30,
        s"level=$level ring=$ring: only $crossing face-crossing probes found")
    }
  }

  test("chord prune band keeps meridional-vs-zonal reorder candidates") {
    // regression for the squared-vs-linear band error: the nearest
    // GEODESIC neighbor of (0,0) is B on the meridian (11,101.7 m), but
    // B's unit-sphere chord^2 is 1.0080x A's — inside the true (a/b)^6
    // reorder band, outside the old (a/b)^2-as-squared 1.0068 cut, so
    // the old prune returned the farther zonal point A as rank 1
    val s = spark; import s.implicits._
    val queries = Seq(("q", 0.0, 0.0)).toDF("query_id", "lon", "lat")
    val data = Seq(("A", 0.1, 0.0), ("B", 0.0, 0.1004))
      .toDF("data_id", "lon", "lat")
    val top = GeoEngine.knnBruteForce(queries, data, k = 1).collect()
    assert(top.length == 1 && top(0).getString(1) == "B",
      s"rank-1 was ${top(0).getString(1)}, expected the meridional point B")
    val g = graft.geo.geodesic.Geodesic.WGS84
    assert(g.inverse(0.1004, 0.0, 0.0, 0.0).s12 <
           g.inverse(0.0, 0.1, 0.0, 0.0).s12) // sanity: B really is nearer
  }

  test("distance join matches the brute-force geodesic range filter") {
    import graft.geo.expr.geo
    val docs = GeoEngine.withGeoTag(corpus(2000, 4))
    val data = docs.select(col("doc_id").as("data_id"), col("lon"), col("lat"))
    val queries = docs.limit(25)
      .select(col("doc_id").as("query_id"), col("lon"), col("lat"))
    val radius = 250000.0 // 250 km
    val got = GeoEngine.distanceJoin(queries, data, radius)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val d = data.select(col("data_id"),
      col("lon").as("d_lon"), col("lat").as("d_lat"))
    val brute = queries
      .select(col("query_id"), col("lon").as("q_lon"), col("lat").as("q_lat"))
      .crossJoin(d)
      .where(geo.geodDistance(col("q_lon"), col("q_lat"),
        col("d_lon"), col("d_lat")) <= radius)
      .select("query_id", "data_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(brute.nonEmpty, "clustered corpus must have in-range pairs")
    assert(got == brute,
      s"missing=${(brute -- got).size} extra=${(got -- brute).size}")
  }

  test("chord-metric distance join equals the cross-join predicate") {
    val docs = GeoEngine.withGeoTag(corpus(1500, 4))
    val data = docs.select(col("doc_id").as("data_id"), col("lon"), col("lat"))
    val queries = docs.limit(20)
      .select(col("doc_id").as("query_id"), col("lon"), col("lat"))
    val maxChord2 = 0.002
    val got = GeoEngine.distanceJoinChord(queries, data, maxChord2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val d = data.select(col("data_id"),
      col("lon").as("d_lon"), col("lat").as("d_lat"))
    val brute = queries
      .select(col("query_id"), col("lon").as("q_lon"), col("lat").as("q_lat"))
      .crossJoin(d)
      .where(GeoEngine.chord2(col("q_lon"), col("q_lat"),
        col("d_lon"), col("d_lat")) <= maxChord2)
      .select("query_id", "data_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(brute.nonEmpty)
    assert(got == brute,
      s"missing=${(brute -- got).size} extra=${(got -- brute).size}")
  }

  test("hausdorffJoin equals the brute-force set distance") {
    val sp = spark; import sp.implicits._
    // 4 base routes; each with a near copy (sub-km jitter, inside tau)
    // and a far copy (~80 km off, outside tau); irregular coords so
    // trajectories straddle cell boundaries
    val base = Seq.tabulate(4) { b =>
      Seq.tabulate(8)(i =>
        (10.0 + b * 3.0 + i * 0.21, 45.0 + (i % 3) * 0.17 + b * 1.9))
    }
    val trajs: Seq[(Long, Seq[(Double, Double)])] =
      base.zipWithIndex.flatMap { case (route, b) =>
        Seq((b * 10L, route),
          (b * 10L + 1, route.map { case (lo, la) => (lo + 0.008, la - 0.006) }),
          (b * 10L + 2, route.map { case (lo, la) => (lo + 0.9, la + 0.7) }))
      }
    val pts = trajs.flatMap { case (id, ps) => ps.map(p => (id, p._1, p._2)) }
      .toDF("traj_id", "lon", "lat")
    val tau = 20000.0
    val maxC2 = GeoEngine.maxChord2For(tau)
    def xyz(p: (Double, Double)) = {
      val (l, f) = (math.toRadians(p._1), math.toRadians(p._2))
      (math.cos(f) * math.cos(l), math.cos(f) * math.sin(l), math.sin(f))
    }
    def cd(a: (Double, Double), b: (Double, Double)) = {
      val (x1, y1, z1) = xyz(a); val (x2, y2, z2) = xyz(b)
      (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) + (z1 - z2) * (z1 - z2)
    }
    def um(c: Double) = math.floor(2.0 * 6378137.0 *
      math.asin(math.sqrt(c) / 2.0) * 1e6 + 0.5).toLong
    // reference: full bipartite minima; pair passes iff EVERY point of
    // both sides has its min chord^2 within the bound (== H <= tau)
    val byId = trajs.toMap
    val ref = (for {
      (i, a) <- trajs; (j, b) <- trajs if i < j
      minsA = a.map(p => b.map(q => cd(p, q)).min)
      minsB = b.map(p => a.map(q => cd(p, q)).min)
      if minsA.forall(_ <= maxC2) && minsB.forall(_ <= maxC2)
    } yield (i, j) -> math.max(minsA.map(um).max, minsB.map(um).max)).toMap
    val got = GeoEngine.hausdorffJoin(pts, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ref.keySet == Set.tabulate(4)(b => (b * 10L, b * 10L + 1)).toSet,
      "exactly the near copies pair up")
    assert(got == ref, s"missing=${ref.keySet -- got.keySet} " +
      s"extra=${got.keySet -- ref.keySet}")
    assert(byId.nonEmpty)
    // partitioning independence of the exact micrometer output
    val got7 = GeoEngine.hausdorffJoin(pts.repartition(7), tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got7 == got)
  }

  test("frechetJoin equals the brute-force DP; order-aware vs Hausdorff") {
    val sp = spark; import sp.implicits._
    // same route families as the Hausdorff test, now time-ordered; one
    // extra pair: a route vs its REVERSE (same point set, so Hausdorff
    // pairs them but Frechet must not)
    val base = Seq.tabulate(3) { b =>
      Seq.tabulate(8)(i =>
        (10.0 + b * 3.0 + i * 0.21, 45.0 + (i % 3) * 0.17 + b * 1.9))
    }
    val trajs: Seq[(Long, Seq[(Double, Double)])] =
      base.zipWithIndex.flatMap { case (route, b) =>
        Seq((b * 10L, route),
          (b * 10L + 1, route.map { case (lo, la) => (lo + 0.008, la - 0.006) }),
          (b * 10L + 2, route.reverse))
      }
    val pts = trajs.flatMap { case (id, ps) =>
      ps.zipWithIndex.map { case (p, i) =>
        (id, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"),
          p._1, p._2)
      }
    }.toDF("traj_id", "ts", "lon", "lat")
    val tau = 20000.0
    val maxC2 = GeoEngine.maxChord2For(tau)
    def xyz(p: (Double, Double)) = {
      val (l, f) = (math.toRadians(p._1), math.toRadians(p._2))
      (math.cos(f) * math.cos(l), math.cos(f) * math.sin(l), math.sin(f))
    }
    def cd(a: (Double, Double), b: (Double, Double)) = {
      val (x1, y1, z1) = xyz(a); val (x2, y2, z2) = xyz(b)
      (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) + (z1 - z2) * (z1 - z2)
    }
    def frechet(a: Seq[(Double, Double)], b: Seq[(Double, Double)]): Double = {
      val memo = Array.fill(a.size, b.size)(-1.0)
      def go(i: Int, j: Int): Double = {
        if (memo(i)(j) >= 0) memo(i)(j)
        else {
          val d = cd(a(i), b(j))
          val v =
            if (i == 0 && j == 0) d
            else if (i == 0) math.max(go(0, j - 1), d)
            else if (j == 0) math.max(go(i - 1, 0), d)
            else math.max(math.min(math.min(go(i - 1, j - 1), go(i - 1, j)),
              go(i, j - 1)), d)
          memo(i)(j) = v; v
        }
      }
      go(a.size - 1, b.size - 1)
    }
    def um(c: Double) = math.floor(2.0 * 6378137.0 *
      math.asin(math.sqrt(c) / 2.0) * 1e6 + 0.5).toLong
    val ref = (for {
      (i, a) <- trajs; (j, b) <- trajs if i < j
      f = frechet(a, b) if f <= maxC2
    } yield (i, j) -> um(f)).toMap
    val got = GeoEngine.frechetJoin(pts, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == ref, s"missing=${ref.keySet -- got.keySet} " +
      s"extra=${got.keySet -- ref.keySet}")
    // the jittered twin pairs; the reversed copy does NOT, though its
    // point set is identical (Hausdorff DOES pair it)
    for (b <- 0 until 3) {
      assert(got.contains((b * 10L, b * 10L + 1)), s"twin $b")
      assert(!got.contains((b * 10L, b * 10L + 2)), s"reverse $b")
    }
    val haus = GeoEngine.hausdorffJoin(
        pts.select(col("traj_id"), col("lon"), col("lat")), tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (b <- 0 until 3)
      assert(haus.contains((b * 10L, b * 10L + 2)), s"haus reverse $b")
    // Frechet dominates Hausdorff wherever both pair
    for ((k, f) <- got if haus.contains(k)) assert(f >= haus(k))
    // partitioning independence
    val got7 = GeoEngine.frechetJoin(pts.repartition(7), tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got7 == got)
  }

  test("raster-vector stats are exact and partition independent") {
    val docs = GeoEngine.withGeoTag(corpus(2000, 4))
    val level = 3
    // raster: deterministic value per cell over the full face set
    val raster = GeoEngine.tiled(docs, level).select("cell").distinct()
      .withColumn("value", (col("cell") % 97).cast("double"))
    val stats = GeoEngine.rasterVectorStats(docs, raster, level)
    val total = stats.agg(sum("n_docs")).head.getLong(0)
    assert(total == 2000) // every doc lands in exactly one tile
    val h1 = GeoEngine.canonicalChecksum(stats, Seq("cell", "n_docs"))
    val h2 = GeoEngine.canonicalChecksum(
      GeoEngine.rasterVectorStats(docs.repartition(7), raster, level),
      Seq("cell", "n_docs"))
    assert(h1 == h2)
  }

  test("salted join equals plain join on skewed data") {
    val docs = GeoEngine.tiled(GeoEngine.withGeoTag(corpus(3000, 4)), 4)
    val dim = docs.select("cell").distinct().withColumn("w", col("cell") % 7)
    val hot = GeoEngine.hotCells(GeoEngine.withGeoTag(corpus(3000, 4)), 4,
      hotFraction = 0.05, sampleFraction = 0.5)
    assert(hot.nonEmpty, "clustered corpus must have hot cells")
    val salted = GeoEngine.saltedCellJoin(docs, dim, "doc_id", hot, salt = 4)
    val plain = docs.join(dim, "cell")
    assert(GeoEngine.canonicalChecksum(salted, Seq("doc_id", "w")) ==
      GeoEngine.canonicalChecksum(plain, Seq("doc_id", "w")))
  }

  test("checkpointStage computes once and resumes from disk with lineage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    var computes = 0
    def stage(): org.apache.spark.sql.DataFrame = {
      computes += 1
      GeoEngine.tileOccupancy(GeoEngine.withGeoTag(corpus(1000, 3)), 6)
    }
    val first = GeoEngine.checkpointStage(spark, dir, stage _, Seq("cell", "n_docs"))
    val h1 = GeoEngine.canonicalChecksum(first, Seq("cell", "n_docs"))
    val second = GeoEngine.checkpointStage(spark, dir, stage _, Seq("cell", "n_docs"))
    val h2 = GeoEngine.canonicalChecksum(second, Seq("cell", "n_docs"))
    assert(computes == 1, "resume must not recompute")
    assert(h1 == h2)
    val lin = spark.read.parquet(s"$dir/lineage")
    assert(lin.agg(sum("n_rows")).head.getLong(0) == first.count())
  }

  test("geodWaypoints through codegen equals the JVM-direct line API") {
    import graft.geo.expr.geo
    val geod = graft.geo.geodesic.Geodesic.WGS84
    val docs = GeoEngine.withGeoTag(corpus(200, 3))
      .select(col("doc_id"), col("lon"), col("lat"))
    // pair each doc with a fixed far point, densify into 6 segments
    val wp = docs
      .withColumn("w", geo.geodWaypoints(col("lon"), col("lat"),
        lit(144.42486788888888), lit(-37.95103341666667), n = 6))
      .select(col("doc_id"), col("lon"), col("lat"), posexplode(col("w")))
      .collect()
    assert(wp.length == 200 * 7)
    wp.foreach { r =>
      val lon1 = r.getDouble(1); val lat1 = r.getDouble(2)
      val i = r.getInt(3); val s = r.getStruct(4)
      val line = geod.inverseLine(lat1, lon1, -37.95103341666667, 144.42486788888888)
      val p = line.position(line.s13 * i / 6)
      assert(math.abs(s.getDouble(0) - p.lon2) < 1e-12)
      assert(math.abs(s.getDouble(1) - p.lat2) < 1e-12)
      assert(math.abs(s.getDouble(2) - p.azi2) < 1e-12)
    }
  }

  test("geo.crsTransform: factory planner kernel through codegen equals JVM-direct") {
    import graft.geo.expr.geo
    // grid + Helmert fallback dispatch THROUGH the Catalyst path — the
    // planner kernel (with its grid arrays) must serialize into the
    // generated code references intact
    val src = "+proj=longlat +ellps=GRS80" +
      " +nadgrids=@tests/test_hgrid_little_endian.gsb +towgs84=100,0,0"
    val k = graft.geo.proj.OperationFactory.crsToCrs(src, "+proj=longlat +datum=WGS84")
    val sp = spark; import sp.implicits._
    val pts = Seq((5.5, 53.5), (20.0, 20.0), (5.1, 52.2), (-40.0, 10.0))
      .toDF("lon", "lat")
    val out = pts.withColumn("o",
        geo.crsTransform(src, "+proj=longlat +datum=WGS84", col("lon"), col("lat")))
      .select(col("lon"), col("lat"),
        col("o").getField("x"), col("o").getField("y")).collect()
    out.foreach { r =>
      val v = Array(r.getDouble(0), r.getDouble(1), 0.0, 0.0)
      assert(k.fwd(v))
      assert(v(0) == r.getDouble(2) && v(1) == r.getDouble(3),
        s"codegen vs direct mismatch at ${r.getDouble(0)},${r.getDouble(1)}")
    }
  }
}
