package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.geo.engine.SpatialStats

/** Gi* hot-spot scores and Moran's I vs driver-side references computed
  * from the engine's own cell assignments (the statistics' algebra is
  * re-derived independently; the binning is shared so thresholds can
  * never flip), plus the sign properties that make the diagnostics
  * useful: a planted hot blob scores positive z / positive I, a
  * checkerboard scores negative I. */
class SpatialStatsSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("spatial-stats-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** `counts(r)(q)` points planted exactly at the CENTER of axial hex
    * (q, r) for the 250 km grid (webmerc center (x, y) inverted back to
    * lon/lat), so the engine's binning provably lands each batch in its
    * intended hex and the reference's axial adjacency is the engine's
    * hex adjacency — no boundary cases anywhere. */
  private val HexSize = 250000.0
  private def lattice(counts: Seq[Seq[Int]]): DataFrame = {
    val sp = spark; import sp.implicits._
    val R = 6378137.0
    val rows = for {
      (rowCounts, r) <- counts.zipWithIndex
      (c, q) <- rowCounts.zipWithIndex
      k <- 0 until c
    } yield {
      val x = HexSize * math.sqrt(3.0) * (q + r / 2.0)
      val y = HexSize * 1.5 * r
      (r.toLong * 1000 + q * 100 + k,
        math.toDegrees(x / R), math.toDegrees(math.atan(math.sinh(y / R))))
    }
    rows.toDF("pt_id", "lon", "lat")
  }

  /** Reference Gi* / Moran over (cell -> count) with a caller-supplied
    * adjacency (distance <= 1 incl. self for Gi*, excl. self for I). */
  private def refStats(cells: Map[(Long, Long), Long])
      : (Map[(Long, Long), (Long, Long, Option[Double])], Option[Double]) = {
    def hexDist(a: (Long, Long), b: (Long, Long)): Long =
      (math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs((a._1 - b._1) + (a._2 - b._2))) / 2
    val n = cells.size.toLong
    val sumX = cells.values.sum
    val sumX2 = cells.values.map(x => x * x).sum
    val m = sumX.toDouble / n
    val s = math.sqrt(sumX2.toDouble / n - m * m)
    val gi = cells.keys.map { c =>
      val nb = cells.filter { case (d, _) => hexDist(c, d) <= 1 }
      val wsum = nb.values.sum
      val wn = nb.size.toLong
      val z =
        if (n > 1 && wn < n && sumX2.toDouble / n - m * m > 0)
          Some((wsum.toDouble - m * wn) /
            (s * math.sqrt((n * wn - wn * wn).toDouble / (n - 1).toDouble)))
        else None
      c -> (wsum, wn, z)
    }.toMap
    val edges = for {
      a <- cells.keys.toSeq; b <- cells.keys.toSeq
      if a != b && hexDist(a, b) <= 1
    } yield (cells(a), cells(b))
    val i =
      if (edges.nonEmpty && sumX2.toDouble - n * m * m > 0) {
        val num = edges.map { case (xi, xj) => xi.toDouble * xj }.sum -
          m * edges.map(_._1).sum - m * edges.map(_._2).sum +
          edges.size * m * m
        Some((n.toDouble / edges.size) * num / (sumX2.toDouble - n * m * m))
      } else None
    (gi, i)
  }

  private lazy val blob = lattice(Seq(
    Seq(1, 1, 1, 1, 1, 1),
    Seq(1, 8, 9, 1, 1, 1),
    Seq(1, 9, 10, 8, 1, 1),
    Seq(1, 1, 8, 1, 1, 1),
    Seq(1, 1, 1, 1, 1, 2)))

  test("giStarHex matches the independent reference on a planted blob") {
    val got = SpatialStats.giStarHex(blob, HexSize).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    val cells = got.map { case (k, v) => k -> v._1 }
    val (ref, _) = refStats(cells)
    assert(got.keySet == ref.keySet)
    for ((c, (_, wsum, wn, z)) <- got) {
      assert((wsum, wn) == (ref(c)._1, ref(c)._2), s"cell $c sums")
      (z, ref(c)._3) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"cell $c z")
        case (a, b) => assert(a.isEmpty == b.isEmpty, s"cell $c z nullity")
      }
    }
    // the 10-count blob center must be the hottest cell
    val hottest = got.maxBy(_._2._4.getOrElse(Double.MinValue))
    assert(got(hottest._1)._1 >= 8, "hottest z must sit on the blob")
    assert(hottest._2._4.get > 1.0)
  }

  test("moranHex: positive on the blob, negative on a checkerboard") {
    val gotBlob = SpatialStats.moranHex(blob, HexSize).collect()(0)
    val cells = SpatialStats.giStarHex(blob, HexSize).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (_, refI) = refStats(cells)
    assert(!gotBlob.isNullAt(2))
    assert(math.abs(gotBlob.getDouble(2) - refI.get) < 1e-9)
    assert(gotBlob.getDouble(2) > 0.1, "clustered blob => positive I")

    val checker = lattice(
      (0 until 6).map(i => (0 until 6).map(j => if ((i + j) % 2 == 0) 9 else 1)))
    val gotCheck = SpatialStats.moranHex(checker, HexSize).collect()(0)
    assert(gotCheck.getDouble(2) < -0.1, "checkerboard => negative I")
  }

  test("gearyHex: reference equality; blob < 1, checkerboard > 1") {
    def hexDist(a: (Long, Long), b: (Long, Long)): Long =
      (math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs((a._1 - b._1) + (a._2 - b._2))) / 2
    def refC(cells: Map[(Long, Long), Long]): (Long, Long, Option[Double]) = {
      val n = cells.size.toLong
      val m = cells.values.sum.toDouble / n
      val den = cells.values.map(x => x.toDouble * x).sum - n * m * m
      val edges = for {
        a <- cells.keys.toSeq; b <- cells.keys.toSeq
        if a != b && hexDist(a, b) <= 1
      } yield (cells(a) - cells(b)) * (cells(a) - cells(b))
      val c = if (edges.nonEmpty && den > 0)
        Some((n - 1).toDouble * edges.sum / (2.0 * edges.size * den))
      else None
      (edges.size.toLong, edges.sum, c)
    }
    val cells = SpatialStats.giStarHex(blob, HexSize).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (e, sd2, refBlob) = refC(cells)
    val gotBlob = SpatialStats.gearyHex(blob, HexSize).collect()(0)
    assert(gotBlob.getLong(0) == cells.size.toLong)
    assert(gotBlob.getLong(1) == e && gotBlob.getLong(2) == sd2)
    assert(math.abs(gotBlob.getDouble(3) - refBlob.get) < 1e-9)
    assert(gotBlob.getDouble(3) < 0.9, "clustered blob => C < 1")

    val checker = lattice(
      (0 until 6).map(i => (0 until 6).map(j => if ((i + j) % 2 == 0) 9 else 1)))
    val gotCheck = SpatialStats.gearyHex(checker, HexSize).collect()(0)
    assert(gotCheck.getDouble(3) > 1.1, "checkerboard => C > 1")

    // degenerate: a single occupied cell has no edges -> null C
    val single = SpatialStats.gearyHex(lattice(Seq(Seq(5))), HexSize)
      .collect()(0)
    assert(single.getLong(1) == 0L && single.isNullAt(3))
  }

  test("joinCountsHex: reference equality and planted clumping") {
    def hexDist(a: (Long, Long), b: (Long, Long)): Long =
      (math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs((a._1 - b._1) + (a._2 - b._2))) / 2
    val thr = 5L
    val cells = SpatialStats.giStarHex(blob, HexSize).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val black = cells.filter(_._2 >= thr).keySet
    // unordered reference counts straight from the definition
    val und = (for {
      a <- cells.keys.toSeq; b <- cells.keys.toSeq
      if (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) && hexDist(a, b) <= 1
    } yield (black(a), black(b))).toSeq
    val bb = und.count { case (x, y) => x && y }.toLong
    val bw = und.count { case (x, y) => x != y }.toLong
    val ww = und.count { case (x, y) => !x && !y }.toLong
    val r = SpatialStats.joinCountsHex(blob, HexSize, thr).collect()(0)
    assert(r.getLong(0) == cells.size.toLong, "n_cells")
    assert(r.getLong(1) == black.size.toLong, "n_black")
    assert(r.getLong(2) == und.size.toLong, "n_edges")
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((bb, bw, ww)))
    val n = cells.size.toDouble; val nB = black.size.toDouble
    val e = und.size.toDouble
    assert(math.abs(r.getDouble(6) - e * nB * (nB - 1) / (n * (n - 1))) < 1e-9)
    assert(math.abs(r.getDouble(7) -
      2.0 * e * nB * (n - nB) / (n * (n - 1))) < 1e-9)
    assert(math.abs(r.getDouble(8) -
      e * (n - nB) * (n - nB - 1) / (n * (n - 1))) < 1e-9)
    // the blob's black cells are contiguous: BB must beat its expectation
    assert(r.getLong(3).toDouble > r.getDouble(6), "planted clump: BB > E[BB]")
  }

  test("cube-grid variants agree with a reference over engine cell ids") {
    val pts = blob
    val level = 5
    val got = SpatialStats.giStarCells(pts, level).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // independent neighbor sets from the expression layer, one cell a row
    val sp = spark; import sp.implicits._
    val nbrs = got.keys.toSeq.toDF("cell")
      .select(col("cell"), graft.geo.expr.geo.cellNeighbors(col("cell"), 1)
        .as("nb"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).toSet).toMap
    val x = got.map { case (c, v) => c -> v._1 }
    val n = x.size.toLong
    val sumX = x.values.sum
    val sumX2 = x.values.map(v => v * v).sum
    val m = sumX.toDouble / n
    val s = math.sqrt(sumX2.toDouble / n - m * m)
    for ((c, (_, wsum, wn, z)) <- got) {
      val occ = nbrs(c).filter(x.contains)
      // occ is a Set: map to a Seq BEFORE summing or equal counts collapse
      assert(occ.toSeq.map(x).sum == wsum, s"cell $c wsum")
      assert(occ.size.toLong == wn, s"cell $c wn")
      val refZ = (wsum.toDouble - m * wn) /
        (s * math.sqrt((n * wn - wn * wn).toDouble / (n - 1).toDouble))
      assert(math.abs(z.get - refZ) < 1e-9, s"cell $c z")
    }
    val i = SpatialStats.moranCells(pts, level).collect()(0)
    assert(i.getLong(0) == n && !i.isNullAt(2))
  }

  test("localMoranHex: reference equality, HH core, LH outlier, isolates") {
    // blob of highs with a planted LOW hole at (2,2) and an isolated
    // far-away cell at (30,0) with no occupied neighbors
    val grid = Seq(
      Seq(1, 1, 1, 1, 1),
      Seq(1, 9, 9, 9, 1),
      Seq(1, 9, 1, 9, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 7),
      Seq(1, 9, 9, 9, 1),
      Seq(1, 1, 1, 1, 1))
    val pts = lattice(grid)
    val got = SpatialStats.localMoranHex(pts, HexSize).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getInt(6)))).toMap
    val cells = got.map { case (k, v) => k -> v._1 }
    // independent reference
    def hexDist(a: (Long, Long), b: (Long, Long)): Long =
      (math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs((a._1 - b._1) + (a._2 - b._2))) / 2
    val n = cells.size.toLong
    val m = cells.values.sum.toDouble / n
    val m2 = cells.values.map(x => x * x).sum.toDouble / n - m * m
    for ((c, (x, nbrsum, nbrn, i, quad)) <- got) {
      val nb = cells.filter { case (d, _) => d != c && hexDist(c, d) <= 1 }
      assert(nbrsum == nb.values.sum && nbrn == nb.size.toLong, s"cell $c sums")
      if (nbrn == 0) assert(i.isEmpty && quad.isEmpty, s"isolate $c")
      else {
        val zi = x - m
        val lag = nbrsum - nbrn * m
        assert(math.abs(i.get - zi * lag / m2) < 1e-9, s"cell $c I")
        val refQuad =
          if (zi > 0 && lag > 0) Some(1) else if (zi < 0 && lag > 0) Some(2)
          else if (zi < 0 && lag < 0) Some(3) else if (zi > 0 && lag < 0) Some(4)
          else None
        assert(quad == refQuad, s"cell $c quad")
      }
    }
    // planted structure: blob member (2,1) is HH; the hole (2,2) is LH
    assert(got((2L, 1L))._5.contains(1), "blob member must be HH")
    assert(got((2L, 2L))._5.contains(2), "planted hole must be LH outlier")
    assert(got((30L, 2L))._4.isEmpty, "isolate has null I")
  }

  /** Points at hex centers with one timestamp per (cell, day-bin):
    * counts(cell)(t) points in bin t.  Epochs start 2024-01-01. */
  private def cube(counts: Map[(Int, Int), Seq[Int]]): DataFrame = {
    val sp = spark; import sp.implicits._
    val R = 6378137.0
    val t0 = 1704067200L // 2024-01-01T00:00:00Z
    val rows = for {
      ((q, r), series) <- counts.toSeq
      (c, t) <- series.zipWithIndex
      k <- 0 until c
    } yield {
      val x = HexSize * math.sqrt(3.0) * (q + r / 2.0)
      val y = HexSize * 1.5 * r
      (q.toLong * 100000 + r * 1000 + t * 10 + k,
        math.toDegrees(x / R), math.toDegrees(math.atan(math.sinh(y / R))),
        new java.sql.Timestamp((t0 + t.toLong * 86400L + 3600L) * 1000L))
    }
    rows.toDF("pt_id", "lon", "lat", "ts")
  }

  /** Reference Mann–Kendall + Sen slope over a dense series. */
  private def refMk(xs: Seq[Long]): (Long, Long, Option[Double], Double) = {
    val t = xs.length.toLong
    val pairs = for {
      i <- xs.indices; j <- xs.indices if i < j
    } yield (i, j)
    val s = pairs.map { case (i, j) =>
      java.lang.Long.signum(xs(j) - xs(i)).toLong }.sum
    val tie18 = xs.groupBy(identity).values
      .map(g => { val tg = g.size.toLong; tg * (tg - 1) * (2 * tg + 5) }).sum
    val var18 = t * (t - 1) * (2 * t + 5) - tie18
    val z =
      if (var18 > 0) {
        val sd = math.sqrt(var18.toDouble / 18.0)
        Some(if (s > 0) (s - 1).toDouble / sd
        else if (s < 0) (s + 1).toDouble / sd else 0.0)
      } else None
    val slopes = pairs.map { case (i, j) =>
      (xs(j) - xs(i)).toDouble / (j - i).toDouble }.sorted
    val n = slopes.length
    val sen = if (n % 2 == 1) slopes(n / 2)
      else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
    (s, var18, z, sen)
  }

  test("mannKendallHex matches the reference on planted trends") {
    val series = Map(
      (0, 0) -> Seq(1, 2, 3, 4, 5, 6, 7, 8),      // monotone up
      (3, 0) -> Seq(8, 7, 6, 5, 4, 3, 2, 1),      // monotone down
      (0, 3) -> Seq(5, 5, 5, 5, 5, 5, 5, 5),      // all tied -> z null
      (3, 3) -> Seq(2, 9, 1, 7, 3, 8, 2, 6),      // zigzag
      (6, 0) -> Seq(0, 0, 4, 0, 0, 9, 0, 0))      // sparse: dense-fill path
    val got = SpatialStats.mannKendallHex(cube(series), HexSize, 86400L)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          r.getDouble(6))).toMap
    assert(got.keySet == series.keySet)
    for ((c, xs0) <- series) {
      // the engine sees the dense global-range series; all series here
      // span the same 8 bins, zeros included explicitly above
      val (s, var18, z, sen) = refMk(xs0.map(_.toLong))
      val (gotT, gotS, gotVar, gotZ, gotSen) = got(c)
      assert(gotT == 8L, s"cell $c bins")
      assert(gotS == s, s"cell $c S")
      assert(gotVar == var18, s"cell $c var18")
      (gotZ, z) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"cell $c z")
        case (a, b) => assert(a.isEmpty == b.isEmpty, s"cell $c z nullity")
      }
      assert(math.abs(gotSen - sen) < 1e-9, s"cell $c sen")
    }
    // trend signs land where planted
    assert(got((0, 0))._4.get > 2.0)
    assert(got((3, 0))._4.get < -2.0)
    assert(math.abs(got((3, 3))._4.get) < 2.0)
  }

  test("mannKendall: global-range dense fill gives absent bins count 0") {
    // cell B occupied only in bins {2, 5} of A's 6-bin range: its dense
    // series must be (0,0,4,0,0,9) — NOT the 2-bin series (4,9)
    val series = Map(
      (0, 0) -> Seq(1, 1, 1, 1, 1, 1),
      (3, 0) -> Seq(0, 0, 4, 0, 0, 9))
    val got = SpatialStats.mannKendallHex(cube(series), HexSize, 86400L)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (s, var18, _, _) = refMk(Seq(0L, 0L, 4L, 0L, 0L, 9L))
    assert(got((3, 0)) == ((6L, s, var18)))
    // the all-ones cell: S = 0 and zero variance
    assert(got((0, 0))._2 == 0L && got((0, 0))._3 == 0L)
  }

  test("mannKendallCells runs on the cube grid and is deterministic") {
    val pts = cube(Map((0, 0) -> Seq(1, 2, 3, 4), (5, 5) -> Seq(4, 3, 2, 1)))
    def run(parts: Int): Seq[(Long, Long, Long, Long, Long, Long)] =
      SpatialStats.mannKendallCells(pts.repartition(parts), 5, 86400L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          math.round(r.getDouble(5) * 1e9),
          if (r.isNullAt(4)) 0L else math.round(r.getDouble(4) * 1e9)))
        .toSeq.sorted
    val a = run(1)
    assert(a == run(7))
    assert(a.nonEmpty && a.forall(_._2 == 4L))
  }

  /** Full driver-side reference of emergingHotSpotsHex over a
    * (q,r) -> series map (dense, all series the same length). */
  private def refEmerging(series: Map[(Int, Int), Seq[Int]],
                          zCrit: Double, hotFrac: Double)
      : Map[(Long, Long), (Long, Long, Double, Option[Double], String)] = {
    def hexDist(a: (Int, Int), b: (Int, Int)): Int =
      (math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs((a._1 - b._1) + (a._2 - b._2))) / 2
    val t = series.values.head.length
    val nn = series.size.toLong * t
    val sumX = series.values.flatten.map(_.toLong).sum
    val sumX2 = series.values.flatten.map(v => v.toLong * v).sum
    val m = sumX.toDouble / nn
    val sd = math.sqrt(sumX2.toDouble / nn - m * m)
    def z(c: (Int, Int), b: Int): Option[Double] = {
      val nbs = for {
        d <- series.keys.toSeq if hexDist(c, d) <= 1
        bb <- math.max(0, b - 1) to math.min(t - 1, b + 1)
      } yield series(d)(bb).toLong
      val wsum = nbs.sum; val wn = nbs.size.toLong
      val varTerm = (nn * wn - wn * wn).toDouble / (nn - 1).toDouble
      val denom = sd * math.sqrt(varTerm)
      if (nn > 1 && denom > 0) Some((wsum.toDouble - m * wn) / denom)
      else None
    }
    series.keys.map { c =>
      val zs = (0 until t).map(z(c, _))
      val hotF = zs.map(_.exists(_ >= zCrit))
      val coldF = zs.map(_.exists(_ <= -zCrit))
      val nHot = hotF.count(identity).toLong
      val nCold = coldF.count(identity).toLong
      val lastHot = hotF.last; val lastCold = coldF.last
      // MK over the z series (null-safe: null never increments S)
      val s = (for { i <- 0 until t; j <- i + 1 until t } yield (zs(i), zs(j)))
        .map {
          case (Some(a), Some(b)) =>
            if (b > a) 1L else if (b < a) -1L else 0L
          case _ => 0L
        }.sum
      val tie18 = zs.groupBy(identity).values
        .map(g => { val tg = g.size.toLong; tg * (tg - 1) * (2 * tg + 5) }).sum
      val var18 = t.toLong * (t - 1) * (2L * t + 5) - tie18
      val mkZ = if (var18 > 0) Some(
        if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
        else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
        else 0.0) else None
      val fracHot = nHot.toDouble >= hotFrac * t
      val fracCold = nCold.toDouble >= hotFrac * t
      def trailing(f: Seq[Boolean], n: Long): Boolean = {
        val lastNot = f.zipWithIndex.filter(!_._1).map(_._2).maxOption
        lastNot.exists(ln => (t - 1 - ln).toLong == n)
      }
      val up = mkZ.exists(_ >= zCrit); val down = mkZ.exists(_ <= -zCrit)
      val cat =
        if (lastHot && nHot == 1 && nCold == 0) "new_hot"
        else if (lastHot && trailing(hotF, nHot) && !fracHot && nCold == 0)
          "consecutive_hot"
        else if (lastHot && fracHot && up) "intensifying_hot"
        else if (lastHot && fracHot && down) "diminishing_hot"
        else if (lastHot && fracHot) "persistent_hot"
        else if (!lastHot && fracHot && nCold == 0) "historical_hot"
        else if (lastHot && nCold == 0) "sporadic_hot"
        else if (lastHot) "oscillating_hot"
        else if (lastCold && nCold == 1 && nHot == 0) "new_cold"
        else if (lastCold && trailing(coldF, nCold) && !fracCold && nHot == 0)
          "consecutive_cold"
        else if (lastCold && fracCold && down) "intensifying_cold"
        else if (lastCold && fracCold && up) "diminishing_cold"
        else if (lastCold && fracCold) "persistent_cold"
        else if (!lastCold && fracCold && nHot == 0) "historical_cold"
        else if (lastCold && nHot == 0) "sporadic_cold"
        else if (lastCold) "oscillating_cold"
        else "none"
      (c._1.toLong, c._2.toLong) ->
        (nHot, nCold, zs.last.getOrElse(Double.NaN), mkZ, cat)
    }.toMap
  }

  test("emergingHotSpotsHex matches the full reference on a planted cube") {
    // 5x4 background of flat-1 cells plus planted actors — mutually
    // isolated, every q <= 45 (the lattice x must stay inside webmerc's
    // +-pi*R or the longitude wraps past 180); T = 10 day bins.
    // Magnitudes are tuned so each actor's category is >= 0.1 z away
    // from flipping THROUGH a category boundary (the space-time window
    // bleeds each spike one bin back/forward, so e.g. an end spike is
    // hot in its last TWO bins -> consecutive, never new).
    val t = 10
    val flat = (for { q <- 0 until 5; r <- 0 until 4 }
      yield (q, r) -> Seq.fill(t)(1)).toMap
    val series = flat ++ Map(
      (10, 0) -> Seq(1, 1, 1, 1, 1, 1, 1, 1, 1, 300),  // end spike
      (20, 0) -> Seq(60, 70, 80, 90, 100, 110, 120, 130, 140, 150), // ramp
      (30, 0) -> Seq(70, 70, 70, 70, 70, 70, 70, 70, 70, 70), // always hot
      (40, 0) -> Seq(80, 80, 80, 80, 80, 80, 80, 1, 1, 1), // hot then quiet
      (44, 0) -> Seq(1, 1, 1, 1, 1, 200, 1, 1, 1, 200)) // scattered, hot now
    val hotFrac = 0.6
    val got = SpatialStats.emergingHotSpotsHex(cube(series), HexSize, 86400L,
        hotFrac = hotFrac)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          r.getString(7))).toMap
    val ref = refEmerging(series, 1.96, hotFrac)
    assert(got.keySet == ref.keySet)
    // threshold stability: no reference z within 1e-6 of +-zCrit
    for ((c, (nHot, nCold, lastZ, mkZ, cat)) <- ref) {
      val (gh, gc, glz, gmk, gcat) = got(c)
      assert(gh == nHot && gc == nCold, s"cell $c flag counts")
      assert((glz.isNaN && lastZ.isNaN) || math.abs(glz - lastZ) < 1e-9,
        s"cell $c last_z")
      (gmk, mkZ) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"$c mk")
        case (a, b) => assert(a.isEmpty == b.isEmpty, s"$c mk nullity")
      }
      assert(gcat == cat, s"cell $c category")
    }
    // the planted actors land on five distinct branches of the chain
    val cats = Seq((10, 0), (20, 0), (30, 0), (40, 0), (44, 0))
      .map(c => got((c._1.toLong, c._2.toLong))._5)
    assert(cats == Seq("consecutive_hot", "intensifying_hot",
      "persistent_hot", "historical_hot", "sporadic_hot"),
      s"planted actors: $cats")
    assert(flat.keys.forall(c =>
      got((c._1.toLong, c._2.toLong))._5 == "none"),
      "flat background must be none")
  }

  test("emergingHotSpots is partitioning-independent") {
    val series = Map(
      (0, 0) -> Seq(1, 1, 1, 1), (3, 0) -> Seq(1, 2, 30, 40),
      (0, 3) -> Seq(9, 9, 1, 1), (3, 3) -> Seq(5, 1, 5, 1))
    val pts = cube(series)
    def run(parts: Int) =
      SpatialStats.emergingHotSpotsHex(pts.repartition(parts), HexSize, 86400L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(7))).toSeq.sorted
    assert(run(1) == run(6))
  }

  test("ripleysK matches a brute-force reference; cluster reads clustered") {
    val sp = spark; import sp.implicits._
    import graft.geo.engine.GeoEngine
    // deterministic scatter: a tight 12-point cluster near (10,10) plus
    // a sparse far-flung background
    val pts = ((0 until 12).map(i =>
        (i.toLong, 10.0 + (i % 4) * 0.03, 10.0 + (i / 4) * 0.03)) ++
      (0 until 20).map(i =>
        (100L + i, -120.0 + i * 7.3, -40.0 + (i * 11 % 70))))
      .toDF("pt_id", "lon", "lat")
    val radii = Seq(50000.0, 200000.0, 800000.0)
    val area = 4.0 * math.Pi * 6371007.18 * 6371007.18
    val got = SpatialStats.ripleysK(pts, radii, area).collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // brute-force ordered-pair counts with the same chord thresholds
    val rows = pts.collect().map(r => (r.getDouble(1), r.getDouble(2)))
    def c2(a: (Double, Double), b: (Double, Double)): Double = {
      def xyz(p: (Double, Double)) = {
        val (lon, lat) = (math.toRadians(p._1), math.toRadians(p._2))
        (math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon),
          math.sin(lat))
      }
      val (x1, y1, z1) = xyz(a); val (x2, y2, z2) = xyz(b)
      math.pow(x1 - x2, 2) + math.pow(y1 - y2, 2) + math.pow(z1 - z2, 2)
    }
    val n = rows.length
    for (r <- radii) {
      val bound = GeoEngine.maxChord2For(r)
      val cnt = (for {
        i <- rows.indices; j <- rows.indices if i != j
        if c2(rows(i), rows(j)) <= bound
      } yield 1).size.toLong
      val (gotN, gotPairs, gotK, gotL) = got(Math.round(r))
      assert(gotN == n.toLong)
      assert(gotPairs == cnt, s"pairs at r=$r")
      val k = area * cnt / (n.toDouble * (n - 1))
      assert(math.abs(gotK - k) / k < 1e-12, s"K at r=$r")
      assert(math.abs(gotL - math.sqrt(k / math.Pi)) < 1e-6, s"L at r=$r")
    }
    // the tight cluster dominates the 50 km rung: L(50km) >> 50km
    assert(got(50000L)._4 > 50000.0 * 3, "cluster must read clustered")
  }

  test("ripleysK: counts are partitioning-independent; n<2 gives null K") {
    val sp = spark; import sp.implicits._
    val pts = (0 until 40).map(i =>
      (i.toLong, (i * 13 % 360) - 180.0 + 0.5, (i * 7 % 160) - 80.0 + 0.5))
      .toDF("pt_id", "lon", "lat")
    def run(parts: Int) =
      SpatialStats.ripleysK(pts.repartition(parts), Seq(3e5, 2e6), 5.1e14)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(run(1) == run(5))
    val single = SpatialStats.ripleysK(
      Seq((1L, 0.0, 0.0)).toDF("pt_id", "lon", "lat"), Seq(1e5), 5.1e14)
      .collect()
    assert(single.length == 1 && single(0).getLong(2) == 0L &&
      single(0).isNullAt(3))
  }

  test("annStat / annStatChord equal brute force; cluster reads R < 1") {
    val sp = spark; import sp.implicits._
    import graft.geo.engine.GeoEngine
    val rows = ((0 until 12).map(i =>
        (i.toLong, 10.0 + (i % 4) * 0.03, 10.0 + (i / 4) * 0.03)) ++
      (0 until 20).map(i =>
        (100L + i, -120.0 + i * 7.3, -40.0 + (i * 11 % 70))))
    val pts = rows.toDF("pt_id", "lon", "lat")
    val area = 4.0 * math.Pi * 6371007.18 * 6371007.18
    def xyz(lon: Double, lat: Double) = {
      val (l, p) = (math.toRadians(lon), math.toRadians(lat))
      (math.cos(p) * math.cos(l), math.cos(p) * math.sin(l), math.sin(p))
    }
    def cd(a: (Long, Double, Double), b: (Long, Double, Double)) = {
      val (x1, y1, z1) = xyz(a._2, a._3); val (x2, y2, z2) = xyz(b._2, b._3)
      math.pow(x1 - x2, 2) + math.pow(y1 - y2, 2) + math.pow(z1 - z2, 2)
    }
    // chord twin: brute-force per-point min of the quantized arc
    val bound = GeoEngine.maxChord2For(2000000.0)
    val nnCh = rows.map { a =>
      rows.filter(b => b._1 != a._1 && cd(a, b) <= bound)
        .map(b => math.floor(2.0 * 6378137.0 *
          math.asin(math.sqrt(cd(a, b)) / 2.0) * 1e6 + 0.5).toLong)
    }.filter(_.nonEmpty).map(_.min)
    val gotC = SpatialStats.annStatChord(pts, area, bound).collect()(0)
    assert(gotC.getLong(0) == nnCh.size.toLong)
    assert(gotC.getLong(1) == nnCh.sum)
    val n = nnCh.size.toDouble
    val obs = nnCh.sum.toDouble / n / 1e6
    val exp = 0.5 / math.sqrt(n / area)
    assert(math.abs(gotC.getDouble(2) - obs) < 1e-9)
    assert(math.abs(gotC.getDouble(4) - obs / exp) < 1e-12)
    assert(math.abs(gotC.getDouble(5) -
      (obs - exp) / (0.26136 / math.sqrt(n * n / area))) < 1e-9)
    // the 12-point cluster pulls the mean NN far below CSR: R << 1
    assert(gotC.getDouble(4) < 0.5, "clustered scatter must read R < 1")
    // exact-geodesic variant: brute-force Karney min per point
    val nnGeo: Seq[Long] = rows.map { a =>
      rows.filter(_._1 != a._1)
        .map(b => math.floor(graft.geo.geodesic.Geodesic.WGS84
          .inverse(a._3, a._2, b._3, b._2).s12 * 1e6 + 0.5).toLong)
        .min
    }
    val gotG = SpatialStats.annStat(pts, area).collect()(0)
    assert(gotG.getLong(0) == rows.size.toLong)
    assert(gotG.getLong(1) == nnGeo.sum, "geodesic NN um sum")
    // partitioning independence of the exact sums
    def run(parts: Int) = SpatialStats
      .annStatChord(pts.toDF("pt_id", "lon", "lat").repartition(parts),
        area, bound).collect()(0)
    assert((run(1).getLong(0), run(1).getLong(1)) ==
      ((run(7).getLong(0), run(7).getLong(1))))
  }

  test("value-weighted cell statistics: v=1 equals counts; values flip the map") {
    val sp = spark; import sp.implicits._
    // ONE point per hex (uniform incidence) with a value surface hot in
    // the middle: count-based stats see nothing, value-based stats must
    // light up the center
    val vals = Seq(
      Seq(1, 1, 1, 1, 1),
      Seq(1, 9, 9, 9, 1),
      Seq(1, 9, 20, 9, 1),
      Seq(1, 9, 9, 9, 1),
      Seq(1, 1, 1, 1, 1))
    val R = 6378137.0
    val rows = for {
      (rowVals, r) <- vals.zipWithIndex
      (v, q) <- rowVals.zipWithIndex
    } yield {
      val x = HexSize * math.sqrt(3.0) * (q + r / 2.0)
      val y = HexSize * 1.5 * r
      (r.toLong * 100 + q, math.toDegrees(x / R),
        math.toDegrees(math.atan(math.sinh(y / R))), v.toLong)
    }
    val pts = rows.toDF("pt_id", "lon", "lat", "v")
    // counts: every cell holds exactly 1 => zero variance => null z
    val gotC = SpatialStats.giStarHex(pts, HexSize).collect()
    assert(gotC.forall(_.isNullAt(5)), "uniform counts must have null z")
    // weighted: full reference equality against refStats on value sums
    val gotW = SpatialStats.giStarHex(pts, HexSize, valueCol = "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    val cellsRef = rows.map(t =>
      ((t._1 % 100), (t._1 / 100)) -> t._4).toMap
    val (refW, _) = refStats(cellsRef)
    assert(gotW.keySet == refW.keySet)
    for ((c, (x, wsum, wn, z)) <- gotW) {
      assert(x == cellsRef(c))
      assert((wsum, wn) == (refW(c)._1, refW(c)._2), s"cell $c")
      (z, refW(c)._3) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"cell $c z")
        case (a, b) => assert(a.isEmpty == b.isEmpty, s"cell $c")
      }
    }
    val hottest = gotW.maxBy(_._2._4.getOrElse(Double.MinValue))._1
    assert(hottest == ((2L, 2L)), "value blob center must be hottest")
    // valueCol of constant 1 reproduces the count variant exactly
    val one = pts.withColumn("one", lit(1L))
    val eqW = SpatialStats.moranHex(one, HexSize, valueCol = "one").collect()(0)
    val eqC = SpatialStats.moranHex(pts, HexSize).collect()(0)
    assert(eqW.getLong(0) == eqC.getLong(0) && eqW.getLong(1) == eqC.getLong(1))
    // uniform counts degenerate to null I in BOTH variants — and the
    // weighted Gi* frame must also equal the count frame cell-for-cell
    assert(eqW.isNullAt(2) && eqC.isNullAt(2))
    val gsW1 = SpatialStats.giStarHex(one, HexSize, valueCol = "one")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val gsC1 = SpatialStats.giStarHex(pts, HexSize)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(gsW1 == gsC1)
    // the smooth value hill: weighted Moran positive, Geary < 1,
    // General G clusters high-high, local Moran center reads HH
    assert(SpatialStats.moranHex(pts, HexSize, valueCol = "v")
      .collect()(0).getDouble(2) > 0.1)
    assert(SpatialStats.gearyHex(pts, HexSize, valueCol = "v")
      .collect()(0).getDouble(3) < 0.9)
    assert(SpatialStats.generalGHex(pts, HexSize, valueCol = "v")
      .collect()(0).getDouble(4) > 1.0)
    val lm = SpatialStats.localMoranHex(pts, HexSize, valueCol = "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(6)).toMap
    assert(lm((2L, 2L)) == 1, "center quadrant must be HH (1)")
    // weighted KDE: the center numerator is the value-weighted sum
    val kdeW = SpatialStats.kdeHex(pts, HexSize, 600000.0, valueCol = "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val kdeC = SpatialStats.kdeHex(pts, HexSize, 600000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(kdeW((2L, 2L)) > kdeC((2L, 2L)), "values amplify the center mass")
  }

  test("lEnvelope: brute-force envelope replay; clustered pattern escapes it") {
    val sp = spark; import sp.implicits._
    import graft.geo.engine.GeoEngine
    // 24 observed points: a tight 16-point clump + 8 background
    val obsRows = ((0 until 16).map(i =>
        (i.toLong, 10.0 + (i % 4) * 0.02, 10.0 + (i / 4) * 0.02)) ++
      (0 until 8).map(i => (100L + i, -150.0 + i * 37.0, -60.0 + i * 14.0)))
    val pts = obsRows.toDF("pt_id", "lon", "lat")
    val radii = Seq(10000.0, 1000000.0)
    val area = 4.0 * math.Pi * 6371007.18 * 6371007.18
    val nSims = 19
    val seed = 7L
    val got = SpatialStats.lEnvelope(pts, radii, area, nSims = nSims,
      seed = seed).orderBy("r_meters").collect()
    // replay the generator through the engine's own hash expression,
    // then count pairs by brute force per sim
    val n = obsRows.size
    val lcgM = 2147483647L
    // chained consecutive-pair LCG, the engine's own construction
    val s0 = pmod(col("id") * lit(48271L) + lit(seed), lit(lcgM))
    val s1 = pmod(s0 * lit(69621L) + lit(7919L), lit(lcgM))
    val s2 = pmod(s1 * lit(69621L) + lit(7919L), lit(lcgM))
    val simPts = sp.range(nSims.toLong * n).select(
        expr(s"id DIV ${n}L").as("sim"),
        (s1.cast("double") / lcgM.toDouble * 360.0 - 180.0).as("lon"),
        degrees(asin(s2.cast("double") / lcgM.toDouble * 2.0 - 1.0)).as("lat"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // regression for the round-4 defect: the two unit draws must NOT
    // differ by a constant mod 1 (the salt-after-multiply form put every
    // CSR point on one lat(lon) curve, voiding the envelope's statistics)
    val offsets = simPts.map { case (_, lon, lat) =>
      val uLon = (lon + 180.0) / 360.0
      val uLat = (math.sin(math.toRadians(lat)) + 1.0) / 2.0
      math.floor((((uLat - uLon) % 1.0) + 1.0) % 1.0 * 1e6) / 1e6
    }.distinct
    assert(offsets.length > simPts.length / 2,
      s"sim draws look affinely coupled: ${offsets.length} distinct offsets")
    def cd(a: (Double, Double), b: (Double, Double)) = {
      def xyz(p: (Double, Double)) = {
        val (l, f) = (math.toRadians(p._1), math.toRadians(p._2))
        (math.cos(f) * math.cos(l), math.cos(f) * math.sin(l), math.sin(f))
      }
      val (x1, y1, z1) = xyz(a); val (x2, y2, z2) = xyz(b)
      math.pow(x1 - x2, 2) + math.pow(y1 - y2, 2) + math.pow(z1 - z2, 2)
    }
    def pairCount(ps: Seq[(Double, Double)], c2: Double): Long =
      (for { a <- ps; b <- ps if a != b } yield
        if (cd(a, b) <= c2) 1L else 0L).sum
    for ((r, row) <- radii.zip(got)) {
      val c2 = GeoEngine.maxChord2For(r)
      val obsC = pairCount(obsRows.map(t => (t._2, t._3)), c2)
      val simCs = (0 until nSims).map(s =>
        pairCount(simPts.filter(_._1 == s).map(t => (t._2, t._3)), c2))
      assert(row.getLong(3) == obsC, s"obs at $r")
      assert(row.getLong(4) == simCs.min, s"lo at $r")
      assert(row.getLong(5) == simCs.max, s"hi at $r")
      assert(row.getLong(6) == simCs.count(_ >= obsC).toLong, s"n_ge at $r")
      assert(math.abs(row.getDouble(10) -
        (simCs.count(_ >= obsC) + 1.0) / (nSims + 1)) < 1e-12)
    }
    // the clump at 10 km: far above anything CSR produces worldwide
    assert(got(0).getLong(3) > got(0).getLong(5),
      "clustered obs must escape the envelope")
    assert(got(0).getDouble(10) == 1.0 / (nSims + 1))
    // deterministic across partitioning and reruns
    val again = SpatialStats.lEnvelope(pts.repartition(7), radii, area,
      nSims = nSims, seed = seed).orderBy("r_meters").collect()
    assert(again.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq)
  }

  test("crossK equals the brute-force bipartite count; attraction reads L > r") {
    val sp = spark; import sp.implicits._
    import graft.geo.engine.GeoEngine
    // type A: 10 anchors; type B: a twin ~1.1 km from each anchor plus
    // 10 far-away background points
    val aRows = (0 until 10).map(i => (i.toLong, 10.0 + i * 0.9, 20.0 + (i % 3) * 0.8))
    val bRows = aRows.map { case (i, lo, la) => (100L + i, lo + 0.01, la + 0.005) } ++
      (0 until 10).map(i => (200L + i, -60.0 + i * 5.0, -30.0 + i * 2.1))
    val radii = Seq(2000.0, 50000.0, 300000.0)
    val area = 4.0 * math.Pi * 6371007.18 * 6371007.18
    def xyz(lon: Double, lat: Double) = {
      val (l, p) = (math.toRadians(lon), math.toRadians(lat))
      (math.cos(p) * math.cos(l), math.cos(p) * math.sin(l), math.sin(p))
    }
    val counts = radii.map(GeoEngine.maxChord2For).map { c2 =>
      (for { a <- aRows; b <- bRows } yield {
        val (x1, y1, z1) = xyz(a._2, a._3); val (x2, y2, z2) = xyz(b._2, b._3)
        val cd = math.pow(x1 - x2, 2) + math.pow(y1 - y2, 2) +
          math.pow(z1 - z2, 2)
        if (cd <= c2) 1L else 0L
      }).sum
    }
    val got = graft.geo.engine.SpatialStats.crossK(
        aRows.toDF("pt_id", "lon", "lat"), bRows.toDF("pt_id", "lon", "lat"),
        radii, area)
      .orderBy("r_meters").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(10L, 10L, 10L))
    assert(got.map(_.getLong(1)).toSeq == Seq(20L, 20L, 20L))
    assert(got.map(_.getLong(3)).toSeq == counts)
    for ((r, row) <- radii.zip(got)) {
      val k = area * row.getLong(3).toDouble / (10.0 * 20.0)
      assert(math.abs(row.getDouble(4) - k) < 1e-6 * math.max(1.0, k))
      assert(math.abs(row.getDouble(5) - math.sqrt(k / math.Pi)) < 1e-9 *
        math.max(1.0, row.getDouble(5)))
    }
    // every anchor has a planted twin inside 2 km: strong attraction
    assert(got(0).getLong(3) == 10L)
    assert(got(0).getDouble(5) > radii.head, "planted twins => L(r) > r")
    // empty side: null K/L, zero pairs
    val empty = graft.geo.engine.SpatialStats.crossK(
      aRows.toDF("pt_id", "lon", "lat"),
      bRows.toDF("pt_id", "lon", "lat").where(col("pt_id") < 0),
      radii, area).orderBy("r_meters").collect()
    assert(empty.forall(r => r.getLong(3) == 0L && r.isNullAt(4)))
  }

  test("convexHull: gift-wrap reference, degenerates, determinism") {
    val sp = spark; import sp.implicits._
    import graft.geo.engine.Centrography
    // group 0: a tilted cloud with interior and duplicate points (webmerc
    // curvature makes the (1.0, 0.15) mid-edge point a true lower-hull
    // vertex in mm space — both sides must agree on that); group 1: two
    // points; group 2: one point
    val g0 = Seq((0.0, 0.0), (2.0, 0.3), (2.3, 2.1), (0.2, 1.9),
      (1.0, 1.0), (1.2, 0.8), (2.0, 0.3), (1.0, 0.15), (1.15, 1.2))
    val rows = g0.map(p => (0L, p._1, p._2)) ++
      Seq((1L, 10.0, 10.0), (1L, 10.4, 10.2), (2L, -20.0, 5.0))
    val pts = rows.toDF("grp", "lon", "lat")
    val got = Centrography.convexHull(pts, groupCols = Seq("grp"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getSeq[Long](3), r.getSeq[Long](4),
          r.getDouble(5), r.getDouble(6))).toMap
    // independent reference: quantize like the engine, Jarvis gift wrap
    val R = 6378137.0
    def mm(p: (Double, Double)): (Long, Long) = {
      val x = R * math.toRadians(p._1)
      val t = math.tan(math.toRadians(p._2))
      val y = R * math.log(t + math.sqrt(t * t + 1.0))
      (math.floor(x * 1000.0 + 0.5).toLong, math.floor(y * 1000.0 + 0.5).toLong)
    }
    def wrap(ps: Set[(Long, Long)]): Seq[(Long, Long)] = {
      if (ps.size <= 2) return ps.toSeq.sorted
      def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)) =
        (BigInt(a._1 - o._1) * BigInt(b._2 - o._2) -
          BigInt(a._2 - o._2) * BigInt(b._1 - o._1)).signum
      val start = ps.min
      val out = scala.collection.mutable.ArrayBuffer(start)
      var cur = start
      var done = false
      while (!done) {
        var cand = ps.find(_ != cur).get
        for (p <- ps if p != cur) {
          val c = cross(cur, cand, p)
          // keep the most counterclockwise; on ties the farther one
          if (c < 0 || (c == 0 &&
            (math.abs(p._1 - cur._1).max(math.abs(p._2 - cur._2)) >
              math.abs(cand._1 - cur._1).max(math.abs(cand._2 - cur._2)))))
            cand = p
        }
        if (cand == start) done = true
        else { out += cand; cur = cand }
      }
      out.toSeq
    }
    val refHull = wrap(g0.map(mm).toSet)
    val (n0, nv0, hx0, hy0, area0, perim0) = got(0L)
    assert(n0 == g0.size.toLong)
    assert(hx0.zip(hy0) == refHull, s"got=${hx0.zip(hy0)} ref=$refHull")
    assert(nv0 == refHull.size)
    // exact shoelace + fixed-order perimeter from the reference hull
    val sh = refHull.indices.map { i =>
      val (x1, y1) = refHull(i); val (x2, y2) = refHull((i + 1) % refHull.size)
      BigInt(x1) * BigInt(y2) - BigInt(x2) * BigInt(y1)
    }.sum
    assert(math.abs(area0 - sh.toDouble.abs / 2.0 / 1e6) < 1e-6)
    val pr = refHull.indices.map { i =>
      val (x1, y1) = refHull(i); val (x2, y2) = refHull((i + 1) % refHull.size)
      math.hypot((x2 - x1).toDouble, (y2 - y1).toDouble)
    }.sum / 1000.0
    assert(math.abs(perim0 - pr) < 1e-6)
    // two-point group: both vertices, zero area, one-segment perimeter
    val (n1, nv1, hx1, hy1, area1, perim1) = got(1L)
    val Seq(p1a, p1b) = Seq((10.0, 10.0), (10.4, 10.2)).map(mm).sorted
    assert(n1 == 2L && nv1 == 2 && hx1.zip(hy1) == Seq(p1a, p1b))
    assert(area1 == 0.0)
    assert(math.abs(perim1 - math.hypot((p1b._1 - p1a._1).toDouble,
      (p1b._2 - p1a._2).toDouble) / 1000.0) < 1e-9)
    // single point
    val (n2, nv2, _, _, area2, perim2) = got(2L)
    assert(n2 == 1L && nv2 == 1 && area2 == 0.0 && perim2 == 0.0)
    // partitioning independence (exercises Aggregator merge paths)
    val got7 = Centrography.convexHull(pts.repartition(5), Seq("grp"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](3), r.getSeq[Long](4))).toMap
    assert(got7(0L) == ((hx0, hy0)))
    // buffer cap: 500 points on a circle (hull = all ~distinct rim pts)
    val big = (0 until 500).map { i =>
      val a = 2 * math.Pi * i / 500
      (0L, 1.0 + 0.5 * math.cos(a), 30.0 + 0.4 * math.sin(a))
    }.toDF("grp", "lon", "lat")
    val gotBig = Centrography.convexHull(big, Seq("grp")).collect()(0)
    val refBig = wrap(big.collect().map(r =>
      mm((r.getDouble(1), r.getDouble(2)))).toSet)
    assert(gotBig.getSeq[Long](3).zip(gotBig.getSeq[Long](4)) == refBig)
  }

  test("idwHex: reference equality, exact-hit rule, lone cell, determinism") {
    val sp = spark; import sp.implicits._
    val R = 6378137.0
    // (q, r, value) points at hex centers; cell (0,0) holds two points
    val raw = Seq((0L, 0L, 100L), (0L, 0L, 200L), (1L, 0L, 60L),
      (0L, 1L, 30L), (0L, 30L, 7L)) // last: lone far-away cell
    val pts = raw.zipWithIndex.map { case ((q, r, v), i) =>
      val x = HexSize * math.sqrt(3.0) * (q + r / 2.0)
      val y = HexSize * 1.5 * r
      (i.toLong, math.toDegrees(x / R),
        math.toDegrees(math.atan(math.sinh(y / R))), v)
    }.toDF("pt_id", "lon", "lat", "v")
    val radius = 800000.0
    val got = SpatialStats.idwHex(pts, HexSize, radius, "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    // reference: quantized-weight IDW over the occupied-cell aggregate
    val cells = raw.groupBy(t => (t._1, t._2))
      .map { case (k, vs) => k -> (vs.size.toLong, vs.map(_._3).sum) }
    val k = math.ceil(radius / (1.5 * HexSize)).toInt
    val targets = cells.keySet.flatMap { case (q, r) =>
      for { dq <- -k to k; dr <- -k to k
            if math.abs(dq + dr) <= k } yield (q + dq, r + dr)
    }
    def wq(dq: Long, dr: Long): Long = {
      val dx = math.sqrt(3.0) * HexSize * (dq + dr / 2.0)
      val dy = 1.5 * HexSize * dr
      val d2 = dx * dx + dy * dy
      if (d2 > 0 && d2 <= radius * radius)
        math.floor(HexSize / math.sqrt(d2) * (HexSize / math.sqrt(d2)) *
          1048576.0 + 0.5).toLong
      else 0L
    }
    val ref = targets.flatMap { case (tq, tr) =>
      val (wnum, wden) = cells.foldLeft((0L, 0L)) {
        case ((n, d), ((sq, sr), (c, sv))) =>
          val w = wq(tq - sq, tr - sr)
          (n + sv * w, d + c * w)
      }
      val own = cells.get((tq, tr))
      if (wden > 0 || own.isDefined) {
        val (c, sv) = own.getOrElse((0L, 0L))
        val est = if (c > 0) sv.toDouble / c else wnum.toDouble / wden
        Some((tq, tr) -> (c, sv, wnum, wden, est))
      } else None
    }.toMap
    assert(got.keySet == ref.keySet)
    for ((cell, (c, sv, wnum, wden, est)) <- ref) {
      val g = got(cell)
      assert((g._1, g._2, g._3, g._4) == ((c, sv, wnum, wden)), s"cell $cell")
      assert(math.abs(g._5 - est) < 1e-12, s"cell $cell estimate")
    }
    // exact-hit: the double-occupied cell reads its own mean, not a blend
    assert(math.abs(got((0L, 0L))._5 - 150.0) < 1e-12)
    // the lone cell survives with its own mean and no neighbor mass
    assert(got((0L, 30L)) == ((1L, 7L, 0L, 0L, 7.0)))
    // partitioning independence of the exact longs
    val got7 = SpatialStats.idwHex(pts.repartition(7), HexSize, radius, "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getLong(5))).toMap
    assert(got7 == got.map { case (k2, v) => k2 -> (v._3, v._4) })
  }

  test("quadratHex: closed form from exact integers; cluster vs uniform") {
    // 12 points piled in one hex + 3 singletons spanning a 4x3 frame
    val counts = Seq(Seq(12, 0, 0, 1), Seq(0, 0, 0, 0), Seq(1, 0, 0, 1))
    val got = SpatialStats.quadratHex(lattice(counts), HexSize).collect()(0)
    val occ = counts.flatten.count(_ > 0)
    val n = counts.flatten.sum
    val nCells = 4L * 3L
    val sumX2 = counts.flatten.map(c => c.toLong * c).sum
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == nCells)
    assert(got.getLong(2) == occ)
    val m = n.toDouble / nCells
    val ss = sumX2 - n.toDouble * n / nCells
    assert(math.abs(got.getDouble(3) - m) < 1e-12)
    assert(math.abs(got.getDouble(4) - ss / (nCells - 1) / m) < 1e-9)
    assert(math.abs(got.getDouble(5) - ss / m) < 1e-9)
    assert(math.abs(got.getDouble(6) -
      (math.sqrt(2 * ss / m) - math.sqrt(2.0 * (nCells - 1) - 1))) < 1e-9)
    assert(got.getDouble(4) > 2.0, "pile => strongly over-dispersed VMR")
    // perfectly uniform frame: VMR = 0 (every quadrat identical)
    val flat = lattice((0 until 3).map(_ => (0 until 3).map(_ => 4)))
    val gotF = SpatialStats.quadratHex(flat, HexSize).collect()(0)
    assert(math.abs(gotF.getDouble(4)) < 1e-12)
    assert(gotF.getDouble(6) < 0, "uniform => z below CSR")
    // degenerate single-quadrat frame: null statistics
    val one = SpatialStats.quadratHex(lattice(Seq(Seq(5))), HexSize)
      .collect()(0)
    assert(one.getLong(1) == 1 && one.isNullAt(4) && one.isNullAt(6))
  }

  test("generalGHex: reference equality; high-high clusters, checkerboard disperses") {
    def hexDist(a: (Long, Long), b: (Long, Long)): Long =
      (math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs((a._1 - b._1) + (a._2 - b._2))) / 2
    def ref(cells: Map[(Long, Long), Long]): (Long, Double, Double, Double) = {
      val n = cells.size
      val ids = cells.keys.toSeq
      val edges = for { a <- ids; b <- ids if a != b && hexDist(a, b) <= 1 }
        yield (a, b)
      val w = edges.size.toDouble
      val numG = edges.map { case (a, b) =>
        BigInt(cells(a)) * BigInt(cells(b)) }.sum
      val deg = edges.groupBy(_._1).map(_._2.size.toLong)
      val s1 = 2.0 * w
      val s2 = 4.0 * deg.map(d => d * d).sum
      val m1 = cells.values.map(BigInt(_)).sum
      val m2 = cells.values.map(x => BigInt(x) * x).sum
      val m3 = cells.values.map(x => BigInt(x) * x * x).sum
      val m4 = cells.values.map(x => BigInt(x) * x * x * x).sum
      val (m1d, m2d, m3d, m4d) =
        (m1.toDouble, m2.toDouble, m3.toDouble, m4.toDouble)
      val nD = n.toDouble
      val b0 = (nD * nD - 3 * nD + 3) * s1 - nD * s2 + 3 * w * w
      val b1 = -((nD * nD - nD) * s1 - 2 * nD * s2 + 6 * w * w)
      val b2 = -(2 * nD * s1 - (nD + 3) * s2 + 6 * w * w)
      val b3 = 4 * (nD - 1) * s1 - 2 * (nD + 1) * s2 + 8 * w * w
      val b4 = s1 - s2 + w * w
      val dp = m1d * m1d - m2d
      val g = numG.toDouble / dp
      val eG = w / (nD * (nD - 1))
      val eG2 = (b0 * m2d * m2d + b1 * m4d + b2 * m1d * m1d * m2d +
          b3 * m1d * m3d + b4 * m1d * m1d * m1d * m1d) /
        (dp * dp * nD * (nD - 1) * (nD - 2) * (nD - 3))
      (edges.size.toLong, g, eG, (g - eG) / math.sqrt(eG2 - eG * eG))
    }
    val cells = SpatialStats.giStarHex(blob, HexSize).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (refW, refG, refE, refZ) = ref(cells)
    val got = SpatialStats.generalGHex(blob, HexSize).collect()(0)
    assert(got.getLong(0) == cells.size.toLong)
    assert(got.getLong(1) == refW)
    assert(math.abs(got.getDouble(2) - refG) < 1e-12)
    assert(math.abs(got.getDouble(3) - refE) < 1e-12)
    assert(math.abs(got.getDouble(4) - refZ) < 1e-9)
    assert(got.getDouble(4) > 1.0, "blob of high counts => high-high G")
    // checkerboard: neighboring high-low pairs pull G below E[G]
    val checker = lattice(
      (0 until 6).map(i => (0 until 6).map(j => if ((i + j) % 2 == 0) 9 else 1)))
    val gotCheck = SpatialStats.generalGHex(checker, HexSize).collect()(0)
    assert(gotCheck.getDouble(4) < -1.0, "checkerboard => z < 0")
    // n = 3 occupied cells: (n-3) moment term degenerates => null z
    val tiny = SpatialStats.generalGHex(
      lattice(Seq(Seq(2, 3, 4))), HexSize).collect()(0)
    assert(tiny.isNullAt(2) && tiny.isNullAt(4))
  }

  test("kdeHex: reference equality, empty-cell spill, quantized determinism") {
    val bw = 600000.0
    val got = SpatialStats.kdeHex(blob, HexSize, bw).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val cells = SpatialStats.giStarHex(blob, HexSize).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force reference with the same quantized weights over ALL
    // targets reached by any source's 2-ring fan
    val k = math.ceil(bw / (1.5 * HexSize)).toInt
    assert(k == 2)
    def hexDist(a: (Long, Long), b: (Long, Long)): Long =
      (math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs((a._1 - b._1) + (a._2 - b._2))) / 2
    val targets = (for {
      (s, _) <- cells.toSeq
      dq <- -k to k; dr <- -k to k
      if (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2 <= k
    } yield (s._1 + dq, s._2 + dr)).distinct
    val ref = targets.map { t =>
      val wnum = cells.toSeq.map { case (s, x) =>
        val dq = (t._1 - s._1).toDouble; val dr = (t._2 - s._2).toDouble
        if (hexDist(s, t) > k) 0L
        else {
          val dx = math.sqrt(3.0) * HexSize * (dq + dr / 2.0)
          val dy = 1.5 * HexSize * dr
          val u2 = (dx * dx + dy * dy) / (bw * bw)
          if (u2 < 1.0)
            x * math.floor((1.0 - u2) * (1.0 - u2) * 1048576.0 + 0.5).toLong
          else 0L
        }
      }.sum
      t -> wnum
    }.filter(_._2 > 0).toMap
    assert(got.keySet == ref.keySet, "reached-cell sets")
    val norm = 3.0 / (math.Pi * bw * bw)
    for ((t, wnum) <- ref) {
      assert(got(t)._2 == wnum, s"cell $t wnum")
      assert(got(t)._1 == cells.getOrElse(t, 0L), s"cell $t own count")
      assert(math.abs(got(t)._3 - wnum / 1048576.0 * norm) < 1e-24,
        s"cell $t density")
    }
    // cells outside the occupied lattice but within bandwidth must appear
    assert(got.keys.exists(t => !cells.contains(t)), "empty-cell spill")
    // density peaks on the blob center
    val peak = got.maxBy(_._2._3)._1
    assert(cells(peak) >= 8, "peak density on the blob")
    // partitioning independence (exact long numerators)
    def run(parts: Int) = SpatialStats
      .kdeHex(blob.repartition(parts), HexSize, bw).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq.sorted
    assert(run(1) == run(7))
  }

  test("knoxChord equals brute force; meters variant agrees off-boundary") {
    val sp = spark; import sp.implicits._
    import graft.geo.engine.GeoEngine
    val t0 = 1704067200L
    // two clusters ~7,600 km apart, intra-cluster spread <= ~33 km (50 km
    // cut has >1.5x margin on both sides); timestamps 900 s apart with
    // parity-interleaved cluster membership, so time-close pairs cross
    // clusters and space-close pairs span the time cut
    val rows = (0 until 14).map { i =>
      val lon = (if (i % 2 == 0) 10.0 else 80.0) + (i / 2) * 0.05
      val lat = if (i % 2 == 0) 10.0 else -20.0
      (i.toLong, lon, lat, new java.sql.Timestamp((t0 + i * 900L) * 1000L))
    }
    val pts = rows.toDF("pt_id", "lon", "lat", "ts")
    val c2 = GeoEngine.maxChord2For(50000.0)
    val tau = 1800L
    val got = SpatialStats.knoxChord(pts, c2, tau).collect()(0)
    def xyz(lon: Double, lat: Double) = {
      val (l, p) = (math.toRadians(lon), math.toRadians(lat))
      (math.cos(p) * math.cos(l), math.cos(p) * math.sin(l), math.sin(p))
    }
    val prs = for {
      i <- rows.indices; j <- rows.indices if i < j
    } yield {
      val (x1, y1, z1) = xyz(rows(i)._2, rows(i)._3)
      val (x2, y2, z2) = xyz(rows(j)._2, rows(j)._3)
      val cd = math.pow(x1 - x2, 2) + math.pow(y1 - y2, 2) +
        math.pow(z1 - z2, 2)
      val dt = math.abs(rows(j)._4.getTime - rows(i)._4.getTime) * 1000L
      (cd, dt)
    }
    val ns = prs.count(_._1 <= c2).toLong
    val nt = prs.count(_._2 <= tau * 1000000L).toLong
    val nst = prs.count(p => p._1 <= c2 && p._2 <= tau * 1000000L).toLong
    val n = rows.size.toLong
    assert(got.getLong(0) == n)
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((ns, nt, nst)),
      "pair counts")
    val e = ns.toDouble * nt.toDouble / (n * (n - 1) / 2).toDouble
    assert(math.abs(got.getDouble(4) - e) < 1e-9)
    assert(math.abs(got.getDouble(5) - (nst - e) / math.sqrt(e)) < 1e-9)
    // exact-meters variant: identical classification off the boundary
    val gotM = SpatialStats.knox(pts, 50000.0, tau).collect()(0)
    assert((gotM.getLong(1), gotM.getLong(2), gotM.getLong(3)) ==
      ((ns, nt, nst)), "meters variant counts")
    // partitioning independence
    def run(parts: Int) = SpatialStats
      .knoxChord(pts.repartition(parts), c2, tau).collect()(0)
    val a = run(1); val b = run(7)
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) ==
      ((b.getLong(1), b.getLong(2), b.getLong(3))))
    // single point: no pairs, null e/z
    val single = SpatialStats.knoxChord(
      Seq((1L, 0.0, 0.0, new java.sql.Timestamp(t0 * 1000L)))
        .toDF("pt_id", "lon", "lat", "ts"), c2, tau).collect()(0)
    assert(single.getLong(0) == 1L && single.isNullAt(4) && single.isNullAt(5))
  }

  test("centrography: reference equality, tilted-line orientation, groups") {
    val sp = spark; import sp.implicits._
    // a 45-degree-ish elongated cloud (webmerc x meters == y meters along
    // the diagonal) in group 0, a tight symmetric blob in group 1
    val R = 6378137.0
    def lonOf(x: Double) = math.toDegrees(x / R)
    def latOf(y: Double) = math.toDegrees(math.atan(math.sinh(y / R)))
    val rows =
      (0 until 40).map { i =>
        val t = i * 25000.0
        val off = (i % 5 - 2) * 3000.0 // perpendicular jitter
        (0L, lonOf(t - off), latOf(t + off))
      } ++ (0 until 25).map { i =>
        (1L, lonOf(2e6 + (i % 5) * 10000.0), latOf(-1e6 + (i / 5) * 10000.0))
      }
    val pts = rows.toDF("grp", "lon", "lat")
    val got = graft.geo.engine.Centrography
      .summary(pts, groupCols = Seq("grp")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    // independent reference: same mm quantization, BigInt sums
    for (g <- Seq(0L, 1L)) {
      val xs = rows.filter(_._1 == g).map { case (_, lon, lat) =>
        val x = R * math.toRadians(lon)
        val phi = math.toRadians(lat)
        val y = R * math.log(math.tan(phi) +
          math.sqrt(math.tan(phi) * math.tan(phi) + 1.0))
        (BigInt(math.floor(x * 1000.0 + 0.5).toLong),
          BigInt(math.floor(y * 1000.0 + 0.5).toLong))
      }
      val n = xs.size
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val syy = xs.map(p => p._2 * p._2).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val nD = n.toDouble
      val a = sxx.toDouble - sx.toDouble * sx.toDouble / nD
      val b = syy.toDouble - sy.toDouble * sy.toDouble / nD
      val c = sxy.toDouble - sx.toDouble * sy.toDouble / nD
      val disc = math.sqrt((a - b) * (a - b) + 4.0 * c * c)
      val (gn, mx, my, sd, maj, min_, th) = got(g)
      assert(gn == n.toLong)
      assert(math.abs(mx - sx.toDouble / nD / 1000.0) < 1e-6, s"g$g mean_x")
      assert(math.abs(my - sy.toDouble / nD / 1000.0) < 1e-6, s"g$g mean_y")
      assert(math.abs(sd - math.sqrt((a + b) / nD) / 1000.0) < 1e-6, s"g$g sd")
      assert(math.abs(maj -
        math.sqrt(2.0 * (a + b + disc) / (2.0 * nD)) / 1000.0) < 1e-6)
      assert(math.abs(min_ -
        math.sqrt(2.0 * math.max(0.0, (a + b - disc) / (2.0 * nD))) / 1000.0)
        < 1e-6)
      assert(math.abs(th - math.atan2(2.0 * c, a - b) / 2.0) < 1e-9)
    }
    // the diagonal cloud: major axis ~45 degrees, strongly elongated
    val line = got(0L)
    assert(math.abs(line._7 - math.Pi / 4) < 0.05, "diagonal orientation")
    assert(line._5 > 4 * line._6, "elongation: major >> minor")
    // partitioning independence (exact decimal sums)
    def run(parts: Int) = graft.geo.engine.Centrography
      .summary(pts.repartition(parts), groupCols = Seq("grp")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6), math.round(r.getDouble(4) * 1e6),
        math.round(r.getDouble(6) * 1e6))).toSeq.sorted
    assert(run(1) == run(7))
  }

  test("statistics are partitioning-independent (exact long aggregates)") {
    def run(parts: Int): (Seq[(Long, Long, Long, Long, Long)], Long) = {
      val g = SpatialStats.giStarHex(blob.repartition(parts), HexSize)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          math.round(r.getDouble(5) * 1e9)))
        .toSeq.sorted
      val i = SpatialStats.moranHex(blob.repartition(parts), HexSize)
        .collect()(0)
      (g, math.round(i.getDouble(2) * 1e9))
    }
    assert(run(1) == run(7))
  }
}
