package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.cells.CellIndex
import graft.geo.engine.GeoTable

/** Iceberg-style manifest layer: per-file cell ranges written from
  * parquet footers, driver-side file pruning for spatial reads, exact
  * results vs the full scan. */
class GeoTableSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _
  private var dir: java.nio.file.Path = _
  private val Level = 12

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("geo-table-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-table")
    // deterministic world-spread points with an id payload
    val pts = spark.range(0, 60000).selectExpr(
      "id",
      "pmod(id * 0.0137, 340.0) - 170.0 AS lon",
      "pmod(id * 0.0071, 160.0) - 80.0 AS lat")
    GeoTable.write(pts, Level, dir.toString + "/t", numFiles = 16)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("manifest has one row per data file with tight disjoint ranges") {
    val m = spark.read.parquet(s"$dir/t/${GeoTable.ManifestDir}").collect()
    assert(m.length == 16, s"${m.length} manifest rows")
    assert(m.map(_.getAs[Long]("rows")).sum == 60000L)
    val ranges = m.map(r => (r.getAs[Long]("cell_min"), r.getAs[Long]("cell_max")))
      .sortBy(_._1)
    ranges.foreach { case (mn, mx) => assert(mn <= mx) }
    // range-partitioned files are disjoint in cell space
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax <= bMin)
      case _ =>
    }
    // and the manifest is invisible to a plain parquet read
    assert(spark.read.parquet(s"$dir/t").count() == 60000L)
  }

  test("descendant ranges are exact: membership == prefix containment") {
    val id = CellIndex.cellId(11.3, 47.2, 8)
    val (lo, hi) = GeoTable.descendantRange(id, Level)
    // a point inside the level-8 cell lands in the range at the data level
    val fine = CellIndex.cellId(11.3, 47.2, Level)
    assert(fine >= lo && fine < hi)
    // the parent of any in-range id is the cover cell
    assert(CellIndex.levelOf(lo) == Level && CellIndex.levelOf(hi - 64 | Level) == Level)
  }

  test("bbox read prunes files and returns exactly the full-scan rows") {
    val (lonMin, latMin, lonMax, latMax) = (10.0, 45.0, 14.0, 48.0)
    val (pruned, nSel, nTot) = GeoTable.readBBox(spark, s"$dir/t",
      lonMin, latMin, lonMax, latMax, coverLevel = 7, dataLevel = Level)
    assert(nTot == 16)
    assert(nSel < nTot, s"no pruning: $nSel/$nTot")
    val ranges = GeoTable.bboxCellRanges(lonMin, latMin, lonMax, latMax, 7, Level)
    assert(ranges.nonEmpty)
    // exactness: pruned result == full scan with the same residual
    import org.apache.spark.sql.functions._
    val residual = ranges.map { case (lo, hi) =>
      col("cell") >= lo && col("cell") < hi
    }.reduce(_ || _)
    val full = spark.read.parquet(s"$dir/t").where(residual)
    val prunedIds = pruned.select("id").collect().map(_.getLong(0)).sorted
    val fullIds = full.select("id").collect().map(_.getLong(0)).sorted
    assert(prunedIds.sameElements(fullIds),
      s"pruned ${prunedIds.length} vs full ${fullIds.length}")
    // completeness: every point inside the bbox is in the result
    val inBox = spark.read.parquet(s"$dir/t")
      .where(col("lon") >= lonMin && col("lon") <= lonMax &&
        col("lat") >= latMin && col("lat") <= latMax)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(inBox.subsetOf(prunedIds.toSet),
      s"${(inBox -- prunedIds.toSet).size} in-box points lost")
  }

  test("disjoint far-away bbox selects nothing but stays a valid frame") {
    val (df, nSel, _) = GeoTable.readBBox(spark, s"$dir/t",
      -179.9, -89.5, -179.5, -89.1, coverLevel = 8, dataLevel = Level)
    assert(df.count() >= 0) // executable
    assert(nSel <= 2, s"south-pole sliver selected $nSel files")
  }
}
