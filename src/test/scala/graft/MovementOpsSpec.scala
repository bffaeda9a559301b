package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.geo.engine.GeoEngine

/** Movement-analytics operators: DBSCAN density clustering vs a
  * driver-side brute-force reference (identical arithmetic, so equality
  * is exact), OD flows / segment endpoints vs hand-walked expectations,
  * Douglas–Peucker simplification vs a recursive reference, and the
  * partitioning-independence + plan-shape guarantees. */
class MovementOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("movement-ops-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  // unit-sphere xyz with the exact expression shape the engine's codegen
  // uses (cos(radians(lat)) * cos(radians(lon)), ...) so reference
  // distances are bit-identical and thresholds can never flip
  private def xyz(lon: Double, lat: Double): (Double, Double, Double) = {
    val cl = math.cos(math.toRadians(lat))
    (cl * math.cos(math.toRadians(lon)), cl * math.sin(math.toRadians(lon)),
      math.sin(math.toRadians(lat)))
  }
  private def chord2(a: (Double, Double, Double),
                     b: (Double, Double, Double)): Double = {
    val dx = a._1 - b._1; val dy = a._2 - b._2; val dz = a._3 - b._3
    dx * dx + dy * dy + dz * dz
  }

  // --- DBSCAN ---------------------------------------------------------------

  /** Brute-force DBSCAN with the engine's deterministic label rules:
    * cluster id = min core id of the component, border = min adjacent
    * core label, noise = None. */
  private def refDbscan(pts: Seq[(Long, Double, Double)], maxChord2: Double,
                        minPts: Int): Map[Long, (Boolean, Option[Long])] = {
    val v = pts.map { case (id, lon, lat) => id -> xyz(lon, lat) }.toMap
    val ids = pts.map(_._1)
    val nbrs: Map[Long, Seq[Long]] = ids.map { i =>
      i -> ids.filter(j => j != i && chord2(v(i), v(j)) <= maxChord2)
    }.toMap
    val core = ids.filter(i => nbrs(i).size + 1 >= minPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map[Long, Long]() ++
      core.map(c => c -> c)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> core.filter(find(_) == find(c)).min).toMap
    ids.map { i =>
      if (core(i)) i -> (true, Some(label(i)))
      else {
        val coreNbrs = nbrs(i).filter(core)
        if (coreNbrs.nonEmpty) i -> (false, Some(coreNbrs.map(label).min))
        else i -> (false, None)
      }
    }.toMap
  }

  /** Blobs + a density-reachable chain + exact duplicates + noise. */
  private def dbscanCorpus(): Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(17)
    val blobA = (0 until 60).map(i =>
      (100L + i, 10.0 + rnd.nextDouble() * 0.3, 50.0 + rnd.nextDouble() * 0.2))
    val blobB = (0 until 50).map(i =>
      (300L + i, 11.8 + rnd.nextDouble() * 0.3, 50.0 + rnd.nextDouble() * 0.2))
    // chain northward, 0.3 deg lat spacing (~33 km): consecutive links
    // inside a 50 km eps, skip-one links outside -> one long thin cluster
    val chain = (0 until 40).map(i => (500L + i, -5.0, 40.0 + i * 0.3))
    val dups = Seq((900L, 10.1, 50.1), (901L, 10.1, 50.1), (902L, 10.1, 50.1))
    val noise = (0 until 15).map(i =>
      (700L + i, -150.0 + i * 3.0, -70.0 + (i % 5) * 2.0))
    blobA ++ blobB ++ chain ++ dups ++ noise
  }

  private def runDbscan(pts: Seq[(Long, Double, Double)], c2: Double,
                        minPts: Int, parts: Int = 4): Map[Long, (Boolean, Option[Long])] = {
    val sp = spark; import sp.implicits._
    val df = pts.toDF("pt_id", "lon", "lat").repartition(parts)
    GeoEngine.dbscanChord(df, "pt_id", c2, minPts)
      .collect().map { r =>
        r.getLong(0) -> (r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }.toMap
  }

  test("dbscan equals brute force on blobs + chain + duplicates + noise") {
    val pts = dbscanCorpus()
    for (minPts <- Seq(3, 5)) {
      val c2 = GeoEngine.maxChord2For(50000.0)
      val got = runDbscan(pts, c2, minPts)
      val want = refDbscan(pts, c2, minPts)
      assert(got == want, s"minPts=$minPts mismatch: " +
        (got.toSet -- want.toSet).take(5).toString)
      // structure sanity: noise points are noise; at minPts=3 the chain is
      // ONE density-reachable cluster (at 5 its 2-neighbor points are noise)
      assert(want(700L)._2.isEmpty)
      if (minPts == 3) {
        val chainLabels = (500L until 540L)
          .flatMap(i => got(i)._2).distinct
        assert(chainLabels.size == 1,
          s"density-reachable chain split into $chainLabels")
      }
    }
  }

  test("dbscan: chain ends are border, interior core (minPts=3)") {
    // isolated chain only: spacing ~33 km, eps 50 km
    val chain = (0 until 10).map(i => (1L + i, -5.0, 40.0 + i * 0.3))
    val got = runDbscan(chain, GeoEngine.maxChord2For(50000.0), minPts = 3)
    assert(!got(1L)._1 && !got(10L)._1, "chain ends must be border")
    assert(got(2L)._1 && got(5L)._1, "chain interior must be core")
    assert(got.values.forall(_._2.contains(2L)),
      "all chain points share the min-core-id cluster label")
  }

  test("dbscan: minimal pair is core (minPts=2); isolated point is noise") {
    val pts = Seq((5L, 0.0, 0.0), (6L, 0.0001, 0.0), (7L, 10.0, 10.0))
    val got = runDbscan(pts, GeoEngine.maxChord2For(1000.0), minPts = 2)
    assert(got(5L) == (true, Some(5L)) && got(6L) == (true, Some(5L)))
    assert(got(7L) == (false, None))
  }

  test("dbscan output is independent of input partitioning") {
    val pts = dbscanCorpus()
    val c2 = GeoEngine.maxChord2For(50000.0)
    assert(runDbscan(pts, c2, 4, parts = 2) == runDbscan(pts, c2, 4, parts = 13))
  }

  test("dbscan guards: minPts >= 2, null ids/coords dropped") {
    val sp = spark; import sp.implicits._
    intercept[IllegalArgumentException] {
      GeoEngine.dbscanChord(Seq((1L, 0.0, 0.0)).toDF("pt_id", "lon", "lat"),
        "pt_id", 1e-6, minPts = 1)
    }
    val withNulls = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(0.0)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(0.0)),
      (null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(0.0))
    ).toDF("pt_id", "lon", "lat")
    val out = GeoEngine.dbscanChord(withNulls, "pt_id",
      GeoEngine.maxChord2For(1000.0), minPts = 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }

  // --- segment endpoints / OD flows ------------------------------------------

  test("segmentEndpoints: known segments, tie broken by (ts, tiebreak)") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      // user 1, segment 1: three points 10 min apart, drifting east
      (1L, 10L, ts(0), 10.0, 50.0),
      (2L, 10L, ts(600), 10.1, 50.0),
      (3L, 10L, ts(1200), 10.2, 50.0),
      // 2 h gap -> segment 2: two points; the FIRST has a timestamp tie,
      // order falls to event_id
      (4L, 10L, ts(8400), 20.0, 40.0),
      (5L, 10L, ts(8400), 20.5, 40.0),
      (6L, 10L, ts(9000), 21.0, 40.0),
      // user 2: single point -> 1-point segment
      (7L, 20L, ts(0), 0.0, 0.0))
      .toDF("event_id", "user_id", "ts", "lon", "lat")
    val got = GeoEngine.segmentEndpoints(rows, Seq("user_id"),
        maxGap = "30 minutes", maxJumpMeters = 1e6, tiebreak = "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(4), r.getLong(6))).toMap
    assert(got((10L, 1L)) == (10.0, 10.2, 3L)) // o_lon, d_lon, n_points
    assert(got((10L, 2L)) == (20.0, 21.0, 3L)) // tie: event 4 before 5
    assert(got((20L, 1L)) == (0.0, 0.0, 1L))
  }

  test("odFlows counts trips per (origin cell, dest cell); 1-point trips dropped") {
    val sp = spark; import sp.implicits._
    // two users making the same A->B trip, one the reverse, one stationary
    def trip(u: Long, base: Long, from: (Double, Double), to: (Double, Double)) =
      Seq((base, u, ts(u * 100000), from._1, from._2),
        (base + 1, u, ts(u * 100000 + 600), to._1, to._2))
    val a = (10.0, 50.0); val b = (25.0, 55.0)
    val rows = (trip(1L, 100L, a, b) ++ trip(2L, 200L, a, b) ++
      trip(3L, 300L, b, a) ++ Seq((400L, 4L, ts(777777), 0.0, 0.0)))
      .toDF("event_id", "user_id", "ts", "lon", "lat")
    val level = 4
    val got = GeoEngine.odFlows(rows, Seq("user_id"), level,
        maxGap = "30 minutes", maxJumpMeters = 5e6, tiebreak = "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ca = graft.geo.cells.CellIndex.cellId(a._1, a._2, level)
    val cb = graft.geo.cells.CellIndex.cellId(b._1, b._2, level)
    assert(got == Map((ca, cb) -> 2L, (cb, ca) -> 1L))
  }

  test("plan shape: odFlows is TWO exchanges (sessionize + flow agg), no join") {
    val sp = spark; import sp.implicits._
    val rows = (0 until 100).map(i =>
      (i.toLong, (i % 5).toLong, ts(i.toLong * 300), 10.0 + i * 0.01, 50.0))
      .toDF("event_id", "user_id", "ts", "lon", "lat")
    val plan = GeoEngine.odFlows(rows, Seq("user_id"), 8,
        tiebreak = "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 2,
      s"endpoint rollup must reuse the sessionize exchange; got $exchanges:\n$plan")
    assert(!plan.contains("Join"), "no join expected")
  }

  // --- Douglas-Peucker simplification ----------------------------------------

  /** Recursive reference DP over (t, lon, lat) with the engine's exact
    * arithmetic (xyz then point-to-segment), first-max tie rule. */
  private def refDp(pts: IndexedSeq[(Long, Double, Double)],
                    tol2: Double): Set[Long] = {
    val v = pts.map(p => xyz(p._2, p._3))
    def segDist2(p: Int, a: Int, b: Int): Double = {
      val abx = v(b)._1 - v(a)._1; val aby = v(b)._2 - v(a)._2
      val abz = v(b)._3 - v(a)._3
      val apx = v(p)._1 - v(a)._1; val apy = v(p)._2 - v(a)._2
      val apz = v(p)._3 - v(a)._3
      val ab2 = abx * abx + aby * aby + abz * abz
      val tt =
        if (ab2 <= 0.0) 0.0
        else math.max(0.0, math.min(1.0, (apx * abx + apy * aby + apz * abz) / ab2))
      val dx = apx - tt * abx; val dy = apy - tt * aby; val dz = apz - tt * abz
      dx * dx + dy * dy + dz * dz
    }
    val keep = scala.collection.mutable.Set(pts.head._1, pts.last._1)
    def rec(a: Int, b: Int): Unit = if (b - a > 1) {
      var best = -1; var bestD = tol2
      for (p <- a + 1 until b) {
        val d = segDist2(p, a, b)
        if (d > bestD) { bestD = d; best = p }
      }
      if (best >= 0) { keep += pts(best)._1; rec(a, best); rec(best, b) }
    }
    rec(0, pts.length - 1)
    keep.toSet
  }

  test("simplify equals the recursive reference on random walks") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(29)
    val walks = (1 to 3).flatMap { u =>
      var lon = 10.0 * u; var lat = 45.0
      (0 until 200).map { i =>
        lon += rnd.nextGaussian() * 0.01; lat += rnd.nextGaussian() * 0.01
        (u.toLong, i.toLong * 60, lon, lat)
      }
    }
    val df = walks.map { case (u, t, lon, lat) => (u, ts(t), lon, lat) }
      .toDF("user_id", "ts", "lon", "lat")
    val got = GeoEngine.simplifyTrajectories(df, Seq("user_id"),
        toleranceMeters = 500.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tol2 = GeoEngine.maxChord2For(500.0)
    val want = (1 to 3).flatMap { u =>
      val pts = walks.filter(_._1 == u)
        .map(p => (p._2 * 1000000L, p._3, p._4)).toIndexedSeq
      refDp(pts, tol2).map(t => (u.toLong, t))
    }.toSet
    assert(got == want)
    assert(got.size < walks.size, "simplification must drop points")
  }

  test("simplify: collinear track collapses to endpoints; spikes survive") {
    val sp = spark; import sp.implicits._
    val line = (0 until 50).map(i => (1L, ts(i * 60L), 10.0, 40.0 + i * 0.01))
    val spiked = line.map { case p @ (u, t, lon, lat) =>
      if (t.getTime == 25 * 60000L) (u, t, lon + 0.5, lat) else p
    }
    val flat = GeoEngine.simplifyTrajectories(
      line.toDF("user_id", "ts", "lon", "lat"), Seq("user_id"), 100.0)
    assert(flat.count() == 2)
    val kept = GeoEngine.simplifyTrajectories(
        spiked.toDF("user_id", "ts", "lon", "lat"), Seq("user_id"), 100.0)
      .collect().map(_.getLong(1)).toSet
    assert(kept.contains(25 * 60 * 1000000L), "the spike must survive")
    assert(kept.contains(0L) && kept.contains(49 * 60 * 1000000L))
  }

  test("simplify: every dropped point is within tolerance of the kept polyline") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(31)
    var lon = 0.0; var lat = 0.0
    val pts = (0 until 300).map { i =>
      lon += rnd.nextGaussian() * 0.02; lat += rnd.nextGaussian() * 0.02
      (1L, i.toLong * 60, lon, lat)
    }
    val tolM = 800.0
    val keptT = GeoEngine.simplifyTrajectories(
        pts.map(p => (p._1, ts(p._2), p._3, p._4))
          .toDF("user_id", "ts", "lon", "lat"),
        Seq("user_id"), tolM)
      .collect().map(_.getLong(1)).toSet
    val tol2 = GeoEngine.maxChord2For(tolM)
    val kept = pts.filter(p => keptT.contains(p._2 * 1000000L))
    val keptIdx = kept.map(p => pts.indexWhere(_._2 == p._2))
    pts.indices.filterNot(i => keptIdx.contains(i)).foreach { i =>
      // the kept neighbors bracketing i
      val a = keptIdx.filter(_ < i).max
      val b = keptIdx.filter(_ > i).min
      val v = pts.map(p => xyz(p._3, p._4))
      val abx = v(b)._1 - v(a)._1; val aby = v(b)._2 - v(a)._2
      val abz = v(b)._3 - v(a)._3
      val apx = v(i)._1 - v(a)._1; val apy = v(i)._2 - v(a)._2
      val apz = v(i)._3 - v(a)._3
      val ab2 = abx * abx + aby * aby + abz * abz
      val tt = if (ab2 <= 0) 0.0
        else math.max(0.0, math.min(1.0, (apx * abx + apy * aby + apz * abz) / ab2))
      val dx = apx - tt * abx; val dy = apy - tt * aby; val dz = apz - tt * abz
      assert(dx * dx + dy * dy + dz * dz <= tol2,
        s"dropped point $i deviates beyond tolerance")
    }
  }

  test("simplify output is independent of input partitioning") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(37)
    val pts = (0 until 400).map { i =>
      (rnd.nextInt(4).toLong, ts(i.toLong * 60),
        rnd.nextDouble() * 2, 40.0 + rnd.nextDouble() * 2)
    }
    def run(parts: Int) = GeoEngine.simplifyTrajectories(
        pts.toDF("user_id", "ts", "lon", "lat").repartition(parts),
        Seq("user_id"), 1000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(2) == run(11))
  }

  // --- spatio-temporal co-location -------------------------------------------

  /** Deterministic fix set for the encounter tests: 8 entities moving in
    * a ~30 km box near (10E, 50N) with fixes every few minutes, plus two
    * far-away entities that can never pair spatially.  Seeded LCG so the
    * brute-force reference sees the identical doubles. */
  private def colocFixtures(): Seq[(Long, Long, Long, Double, Double)] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble)
    }
    // entities 0-7 on a 4x2 grid of ~3 km-spaced bases near (10E, 50N),
    // one fix per entity per 400 s round with <=120 s jitter and <=0.7 km
    // positional jitter: adjacent-base same-round pairs are ALWAYS inside
    // (5 km, 900 s) and same-entity consecutive rounds always inside when
    // exclusion is off — the fixture cannot go empty.  Entities 8-9 sit
    // at (120E, 30S), spatially unreachable from the main group.
    (0 until 160).map { i =>
      val ent = (i % 10).toLong
      val round = i / 10
      val far = ent >= 8
      val t = 1700000000L + round * 400L + ent * 7L + (next() * 120).toLong
      val baseLon = (if (far) 120.0 else 10.0) + (ent % 4) * 0.04
      val baseLat = (if (far) -30.0 else 50.0) + (ent.toInt / 4) * 0.027
      val lon = baseLon + (next() - 0.5) * 0.02
      val lat = baseLat + (next() - 0.5) * 0.013
      (i.toLong, ent, t, lon, lat)
    }
  }

  private def colocDf(rows: Seq[(Long, Long, Long, Double, Double)]): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.map { case (id, e, t, lon, lat) => (id, e, ts(t), lon, lat) }
      .toDF("fix_id", "entity_id", "ts", "lon", "lat")
  }

  test("colocation chord join equals brute force, canonical pairs once") {
    val rows = colocFixtures()
    val c2 = GeoEngine.maxChord2For(5000.0)
    val tau = 900L
    val got = GeoEngine.colocationJoinChord(colocDf(rows), "fix_id",
        "entity_id", c2, tau)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
      .toSeq.sortBy(t => (t._1, t._2))
    val v = rows.map(r => r._1 -> ((r._3, xyz(r._4, r._5), r._2))).toMap
    val want = (for {
      a <- rows.map(_._1); b <- rows.map(_._1)
      if a < b && v(a)._3 != v(b)._3
      if math.abs(v(a)._1 - v(b)._1) * 1000000L <=
        tau * 1000000L // seconds -> micros on integer epochs
      cd = chord2(v(a)._2, v(b)._2) if cd <= c2
    } yield (a, b, (v(b)._1 - v(a)._1) * 1000000L, cd))
      .sortBy(t => (t._1, t._2))
    assert(got.nonEmpty, "fixture produced no encounters — widen it")
    assert(got == want)
    // canonical: each unordered pair exactly once, a < b
    assert(got.map(t => (t._1, t._2)).distinct.size == got.size)
    assert(got.forall(t => t._1 < t._2))
  }

  test("colocation: same-entity pairs excluded by default, kept on demand") {
    val rows = colocFixtures()
    val c2 = GeoEngine.maxChord2For(5000.0)
    val excl = GeoEngine.colocationJoinChord(colocDf(rows), "fix_id",
      "entity_id", c2, 900L).collect()
    assert(excl.forall(r => r.getLong(2) != r.getLong(3)))
    val incl = GeoEngine.colocationJoinChord(colocDf(rows), "fix_id",
      "entity_id", c2, 900L, excludeSameEntity = false).collect()
    assert(incl.exists(r => r.getLong(2) == r.getLong(3)),
      "dense same-entity fixes must pair when exclusion is off")
    assert(incl.length > excl.length)
  }

  test("colocation meters variant equals brute-force Karney filter") {
    val rows = colocFixtures()
    val g = graft.geo.geodesic.Geodesic.WGS84
    val radius = 5000.0
    val tau = 900L
    val got = GeoEngine.colocationJoin(colocDf(rows), "fix_id", "entity_id",
        radius, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byId = rows.map(r => r._1 -> r).toMap
    val want = (for {
      a <- rows.map(_._1); b <- rows.map(_._1)
      if a < b && byId(a)._2 != byId(b)._2
      if math.abs(byId(a)._3 - byId(b)._3) <= tau
      if g.inverse(byId(a)._5, byId(a)._4, byId(b)._5, byId(b)._4).s12 <= radius
    } yield (a, b)).toSet
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("colocation is partitioning-independent and join-planned (no cartesian)") {
    val rows = colocFixtures()
    val c2 = GeoEngine.maxChord2For(5000.0)
    def run(parts: Int): Seq[(Long, Long, Long)] =
      GeoEngine.colocationJoinChord(colocDf(rows).repartition(parts),
          "fix_id", "entity_id", c2, 900L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
        .toSeq.sorted
    assert(run(1) == run(7))
    val plan = GeoEngine.colocationJoinChord(colocDf(rows), "fix_id",
        "entity_id", c2, 900L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no cross join allowed")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "no BNLJ allowed")
  }
}
