package graft.geo.engine

import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.cells.CellIndex

/** Iceberg-style table layer over cell-clustered parquet: a MANIFEST of
  * per-file cell ranges, written once at commit time from parquet
  * footers only (no data IO), lets a spatial query select the files it
  * needs on the DRIVER before any scan task is planned.
  *
  * Why this matters at 100 TB: [[GeoEngine.writeCellClustered]] already
  * gives every file a disjoint cell range, so parquet footer min/max
  * pruning works — but footer pruning still *opens every file* (or
  * fetches every footer from object storage).  At 10^12 documents a
  * table is millions of files; one small manifest (a few MB of
  * (file, rows, cell_min, cell_max) rows) replaces millions of footer
  * reads with one driver-side range intersection — the same economics
  * that motivate Iceberg/Delta manifests.  The manifest lives under
  * `_graft_manifest/` inside the table directory: the underscore prefix
  * makes it invisible to plain `spark.read.parquet(table)` readers
  * (Hadoop hidden-file convention, like `_SUCCESS`), so the table stays
  * a valid vanilla parquet directory.
  *
  * Reads stay EXACT: file selection is a superset (range intersection),
  * and the residual cell-range predicate is applied in the scan, where
  * it also drives row-group pruning inside the touched files.
  */
object GeoTable {

  final val ManifestDir = "_graft_manifest"

  /** Write `pts` cell-clustered at `level` and commit the manifest. */
  def write(pts: DataFrame, level: Int, path: String, numFiles: Int = 0): Unit = {
    GeoEngine.writeCellClustered(pts, level, path, numFiles)
    writeManifest(pts.sparkSession, path)
  }

  /** Build the manifest for an existing cell-clustered table: one footer
    * read per file (driver-side, metadata only), one small parquet out. */
  def writeManifest(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val stats = fs.listStatus(dir).toSeq
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val in = HadoopInputFile.fromPath(f.getPath, conf)
        val reader = ParquetFileReader.open(in)
        try {
          val footer = reader.getFooter
          var rows = 0L
          var cellMin = Long.MaxValue
          var cellMax = Long.MinValue
          val blocks = footer.getBlocks
          var i = 0
          while (i < blocks.size()) {
            val b = blocks.get(i)
            rows += b.getRowCount
            val cols = b.getColumns
            var j = 0
            while (j < cols.size()) {
              val c = cols.get(j)
              if (c.getPath.toDotString == "cell") {
                val st = c.getStatistics
                if (st != null && !st.isEmpty) {
                  st.genericGetMin match {
                    case l: java.lang.Long =>
                      if (l < cellMin) cellMin = l
                    case _ =>
                  }
                  st.genericGetMax match {
                    case l: java.lang.Long =>
                      if (l > cellMax) cellMax = l
                    case _ =>
                  }
                }
              }
              j += 1
            }
            i += 1
          }
          // no usable INT64 statistics (stats disabled, or a non-long
          // cell column): record the CONSERVATIVE full range so the
          // file is always selected — exactness over pruning
          if (cellMin > cellMax) {
            cellMin = Long.MinValue; cellMax = Long.MaxValue
          }
          (f.getPath.getName, rows, cellMin, cellMax)
        } finally reader.close()
      }
    import spark.implicits._
    stats.toDF("file", "rows", "cell_min", "cell_max")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$ManifestDir")
  }

  /** Contiguous data-level id range [lo, hi) of all descendants of a
    * cover cell — cell ids are Morton-ordered within a face, so a
    * parent's descendants at a finer level are one id interval
    * (CellIndex.encode: `((face<<2L | morton) << 6) | level`). */
  def descendantRange(coverId: Long, dataLevel: Int): (Long, Long) = {
    val l = CellIndex.levelOf(coverId)
    require(dataLevel >= l, s"data level $dataLevel coarser than cover $l")
    val pos = coverId >>> 6
    val lo = pos << (2 * (dataLevel - l))
    val hi = (pos + 1) << (2 * (dataLevel - l))
    ((lo << 6) | dataLevel.toLong, (hi << 6) | dataLevel.toLong)
  }

  /** Merged, sorted data-level id ranges covering a lon/lat bbox:
    * complete cover at `coverLevel`, each cover cell lowered to its
    * descendant interval at `dataLevel`, adjacent/overlapping intervals
    * coalesced. */
  def bboxCellRanges(lonMin: Double, latMin: Double, lonMax: Double,
                     latMax: Double, coverLevel: Int,
                     dataLevel: Int): Array[(Long, Long)] = {
    val cover = CellIndex.coverBBox(lonMin, latMin, lonMax, latMax, coverLevel)
    val ranges = cover.map(descendantRange(_, dataLevel)).sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (r <- ranges) {
      if (out.nonEmpty && r._1 <= out.last._2) {
        val last = out.remove(out.length - 1)
        out += ((last._1, math.max(last._2, r._2)))
      } else out += r
    }
    out.toArray
  }

  /** Manifest-pruned read: select the files whose cell range intersects
    * any query range (driver-side, manifest only), scan just those, and
    * apply the residual range predicate.  Returns (frame, filesSelected,
    * filesTotal) so callers can assert/report the pruning. */
  def readRanges(spark: SparkSession, path: String,
                 ranges: Array[(Long, Long)]): (DataFrame, Int, Int) = {
    if (ranges.isEmpty) {
      val schema = spark.read.parquet(path).schema
      val total = spark.read.parquet(s"$path/$ManifestDir").count().toInt
      return (spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), 0, total)
    }
    val manifest = spark.read.parquet(s"$path/$ManifestDir")
      .select("file", "cell_min", "cell_max").collect()
    // staleness guard: the manifest must describe exactly the data files
    // present, else pruning silently omits rows (files appended without
    // re-running writeManifest) or scans deleted paths.  Driver-side
    // listStatus is cheap; mismatch falls back to an exact full scan.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    val inManifest = manifest.map(_.getString(0)).toSet
    if (onDisk != inManifest) {
      val residual = ranges.map { case (lo, hi) =>
        col("cell") >= lo && col("cell") < hi
      }.reduce(_ || _)
      val n = onDisk.size
      return (spark.read.parquet(path).where(residual), n, n)
    }
    val selected = manifest.filter { r =>
      val mn = r.getLong(1); val mx = r.getLong(2)
      ranges.exists { case (lo, hi) => mn < hi && mx >= lo }
    }.map(r => s"$path/${r.getString(0)}")
    val total = manifest.length
    val schema = spark.read.parquet(path).schema
    val df =
      if (selected.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(selected.toIndexedSeq: _*)
    val residual = ranges.map { case (lo, hi) =>
      col("cell") >= lo && col("cell") < hi
    }.reduce(_ || _)
    (df.where(residual), selected.length, total)
  }

  /** Manifest-pruned bbox read over a table written at `dataLevel`. */
  def readBBox(spark: SparkSession, path: String,
               lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
               coverLevel: Int, dataLevel: Int): (DataFrame, Int, Int) =
    readRanges(spark, path,
      bboxCellRanges(lonMin, latMin, lonMax, latMax, coverLevel, dataLevel))
}
