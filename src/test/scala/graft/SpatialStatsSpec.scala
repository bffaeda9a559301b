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
