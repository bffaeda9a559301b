package graft.geo.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.expr.geo

/** The relational layer: spatial joins + tiling over interleaved-document
  * tables (SURVEY.md §2.6).  Every function is declarative DataFrame
  * algebra — Catalyst owns the physical plan — with explicit partitioning
  * and broadcast decisions where the optimizer can't infer them.
  *
  * Scale notes (designed for ~10^12 docs / 1000 executors):
  *  - geo-tag extraction is a per-row projection over the spans array via
  *    higher-order functions: no explode, no shuffle, never reorders spans;
  *  - tiling adds a LongType cell column inside whole-stage codegen;
  *  - the PIP join broadcasts (cell -> polygon) covers — polygons are the
  *    small side by construction — so the big fact table is never shuffled;
  *  - the kNN join shuffles once on candidate cell, with the (2r+1)^2
  *    neighborhood explode on the (small) query side only;
  *  - skew: hot cells are detected from a sampled histogram and the salt
  *    factor applied on the *data* side, replicated on the probe side —
  *    plus AQE skew-join as backstop;
  *  - everything is order-insensitive so results are partition-count
  *    independent (bit-for-bit across local[8]/local[32]).
  */
object GeoEngine {

  /** Geo-tag extraction: first media span's `?geo=lat,lon` -> (lon, lat)
    * columns.  Pure projection; spans column untouched (order preserved). */
  def withGeoTag(docs: DataFrame): DataFrame = {
    val mediaRef = element_at(
      filter(col("spans"), s => s.getField("kind") === lit("media")), 1)
      .getField("media_ref")
    docs
      .withColumn("lat",
        regexp_extract(mediaRef, "\\?geo=([-0-9.]+),([-0-9.]+)", 1)
          .cast("double"))
      .withColumn("lon",
        regexp_extract(mediaRef, "\\?geo=([-0-9.]+),([-0-9.]+)", 2)
          .cast("double"))
  }

  /** Tile assignment at `level`: adds the S2-style cell id column. */
  def tiled(pts: DataFrame, level: Int, lonCol: String = "lon",
            latCol: String = "lat"): DataFrame =
    pts.withColumn("cell", geo.cellId(col(lonCol), col(latCol), level))

  /** Per-tile occupancy — one map-side-combinable aggregation. */
  def tileOccupancy(pts: DataFrame, level: Int): DataFrame =
    tiled(pts, level).groupBy("cell").agg(count(lit(1)).as("n_docs"))

  // --- point-in-polygon join ------------------------------------------------

  /** A polygon: closed simple ring as flat [lon0,lat0, lon1,lat1, ...]. */
  final case class Polygon(poly_id: String, ring: Array[Double]) {
    def bbox: (Double, Double, Double, Double) = {
      var lonMin = Double.MaxValue; var latMin = Double.MaxValue
      var lonMax = Double.MinValue; var latMax = Double.MinValue
      var i = 0
      while (i < ring.length) {
        val lon = ring(i); val lat = ring(i + 1)
        if (lon < lonMin) lonMin = lon; if (lon > lonMax) lonMax = lon
        if (lat < latMin) latMin = lat; if (lat > latMax) latMax = lat
        i += 2
      }
      (lonMin, latMin, lonMax, latMax)
    }
  }

  /** Point-in-polygon join, broadcast flavor (polygons are always the
    * small side at any corpus scale):
    *   1. driver: each polygon -> covering cells at `coverLevel`
    *      (coarse filter, the quadtree-ancestor pattern of SURVEY §2.6);
    *   2. equi-join points' cell against the broadcast cover;
    *   3. exact even-odd refine via the codegen'd PIP expression.
    * The fact side is scanned once, never shuffled. */
  def pipJoin(spark: SparkSession, pts: DataFrame, polys: Seq[Polygon],
              coverLevel: Int): DataFrame = {
    import spark.implicits._
    val covers: Seq[(Long, String, Array[Double])] = polys.flatMap { p =>
      val (lonMin, latMin, lonMax, latMax) = p.bbox
      graft.geo.cells.CellIndex
        .coverBBox(lonMin, latMin, lonMax, latMax, coverLevel)
        .map(cell => (cell, p.poly_id, p.ring))
    }
    val coverDf = covers.toDF("cell", "poly_id", "ring")
    tiled(pts, coverLevel)
      .join(broadcast(coverDf), "cell")
      .where(geo.pointInPolygon(col("lon"), col("lat"), col("ring")))
      .drop("ring")
  }

  // --- kNN join -------------------------------------------------------------

  /** k nearest data points for each query point.
    *
    * Plan: tile both sides at `level`; explode the query side into the
    * (2r+1)^2 cell neighborhood (candidate generation — query side is the
    * smaller by convention); equi-join on cell (one shuffle, AQE-skew
    * tolerant); rank candidates per query by squared chord distance with a
    * total-order tie-break on data id; keep row_number <= k.
    *
    * Correctness bound: a neighborhood of radius r at `level` covers all
    * true neighbors within ~r * cellWidth(level); callers size (level, r)
    * for their distance budget, or use [[knnBruteForce]] when data is
    * small enough to broadcast.  Ties break on (dist, id) so output is
    * partition-independent. */
  /** One fixed-ring candidate pass (internal; possibly incomplete). */
  private def knnRingPass(queries: DataFrame, data: DataFrame, k: Int,
                          level: Int, ring: Int,
                          queryId: String, dataId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = tiled(queries, level)
      .withColumn("cand_cell", explode(geo.cellNeighbors(col("cell"), ring)))
      .select(col(queryId), col("lon").as("q_lon"), col("lat").as("q_lat"),
        col("cand_cell"))
    val d = tiled(data, level)
      .select(col(dataId), col("lon").as("d_lon"), col("lat").as("d_lat"),
        col("cell").as("cand_cell"))
    val dist = geo.geodDistance(col("q_lon"), col("q_lat"), col("d_lon"), col("d_lat"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("dist").asc, col(dataId).asc)
    q.join(d, "cand_cell")
      .withColumn("dist", dist)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(dataId), col("dist"), col("rank"))
  }

  /** Lower bound (metres) on the distance from any point in a cell to
    * outside its ring-r neighborhood at `level`.  Min ST-step 2^-level,
    * min quadratic dUV/dST = 4/3, min sphere dAngle/dUV = 1/2 at the face
    * corner, times the polar radius — then a 0.5 safety factor. */
  def ringSafeRadius(level: Int, ring: Int): Double =
    ring * math.pow(2.0, -level) * (4.0 / 3.0) * 0.5 * 6356752.3 * 0.5

  /** k nearest data points per query — adaptive cell-ring expansion.
    *
    * Each pass tiles both sides at `level`, explodes the query side into
    * the (2r+1)^2 neighborhood, equi-joins on cell (one shuffle per pass,
    * only pending queries re-join) and ranks by geodesic distance with a
    * total-order (dist, id) tie-break.  A query is settled when it found k
    * candidates whose kth distance is within the geometrically guaranteed
    * covered radius of ring r; unsettled queries escalate to ring 3r, and
    * after `maxPasses` the stragglers (isolated points) fall back to the
    * broadcast brute-force.  Output is partition-count independent. */
  def knnJoin(queries: DataFrame, data: DataFrame, k: Int, level: Int,
              ring: Int = 1, maxPasses: Int = 3,
              queryId: String = "query_id", dataId: String = "data_id"): DataFrame = {
    var pending = queries.select(col(queryId), col("lon"), col("lat"))
    var settled: DataFrame = null
    var r = ring
    var pass = 0
    while (pass < maxPasses && !pending.isEmpty) {
      val cand = knnRingPass(pending, data, k, level, r, queryId, dataId)
        .cache()
      val safe = ringSafeRadius(level, r)
      val ok = cand.groupBy(queryId)
        .agg(count(lit(1)).as("n_cand"), max("dist").as("kth_dist"))
        .where(col("n_cand") === k && col("kth_dist") <= safe)
        .select(queryId)
      val okRows = cand.join(broadcast(ok), queryId)
        .select(col(queryId), col(dataId), col("dist"), col("rank"))
      settled = if (settled == null) okRows else settled.unionByName(okRows)
      pending = pending.join(broadcast(ok), Seq(queryId), "left_anti")
      r *= 3
      pass += 1
    }
    val rest =
      if (pending.isEmpty) null
      else knnBruteForce(pending, data, k, queryId, dataId)
    (settled, rest) match {
      case (null, b) => b
      case (s, null) => s
      case (s, b)    => s.unionByName(b)
    }
  }

  /** Exact kNN by broadcast cross join — the small-data baseline and the
    * correctness oracle for [[knnJoin]]. */
  def knnBruteForce(queries: DataFrame, data: DataFrame, k: Int,
                    queryId: String = "query_id", dataId: String = "data_id",
                    geodesic: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = broadcast(data.select(col(dataId),
      col("lon").as("d_lon"), col("lat").as("d_lat")))
    val q = queries.select(col(queryId), col("lon").as("q_lon"), col("lat").as("q_lat"))
    val dist =
      if (geodesic) geo.geodDistance(col("q_lon"), col("q_lat"), col("d_lon"), col("d_lat"))
      else chord2(col("q_lon"), col("q_lat"), col("d_lon"), col("d_lat"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("dist").asc, col(dataId).asc)
    q.crossJoin(d)
      .withColumn("dist", dist)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(dataId), col("dist"), col("rank"))
  }

  /** Squared 3D chord distance on the unit sphere, written in built-in
    * functions so DuckDB can mirror it verbatim (monotone in great-circle
    * distance — safe for ranking). */
  def chord2(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val x1 = cos(radians(lat1)) * cos(radians(lon1))
    val y1 = cos(radians(lat1)) * sin(radians(lon1))
    val z1 = sin(radians(lat1))
    val x2 = cos(radians(lat2)) * cos(radians(lon2))
    val y2 = cos(radians(lat2)) * sin(radians(lon2))
    val z2 = sin(radians(lat2))
    pow(x1 - x2, 2) + pow(y1 - y2, 2) + pow(z1 - z2, 2)
  }

  // --- raster <-> vector ----------------------------------------------------

  /** Assign each point the value of the raster tile containing it and
    * aggregate per tile.  `raster` is (cell LONG, value DOUBLE) at
    * `level`; broadcast if small, else plain equi-join (one shuffle). */
  def rasterVectorAssign(pts: DataFrame, raster: DataFrame, level: Int,
                         broadcastRaster: Boolean = true): DataFrame = {
    val r = if (broadcastRaster) broadcast(raster) else raster
    tiled(pts, level).join(r, "cell")
  }

  /** Per-tile stats of raster-joined points: the "tile assignment"
    * headline aggregation. */
  def rasterVectorStats(pts: DataFrame, raster: DataFrame, level: Int): DataFrame =
    rasterVectorAssign(pts, raster, level)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_docs"), sum("value").as("sum_value"))

  // --- skew handling --------------------------------------------------------

  /** Sampled cell histogram -> hot cells (those holding more than
    * `hotFraction` of the sample). */
  def hotCells(pts: DataFrame, level: Int, hotFraction: Double = 0.01,
               sampleFraction: Double = 0.05): Array[Long] = {
    val sampled = tiled(pts.sample(sampleFraction, seed = 42), level)
      .groupBy("cell").agg(count(lit(1)).as("n"))
    val total = math.max(1L, sampled.agg(sum("n")).head.getLong(0))
    sampled.where(col("n") > total * hotFraction)
      .select("cell").collect().map(_.getLong(0))
  }

  /** Salted equi-join on `cell` for skewed fact tables: fact rows in hot
    * cells get a deterministic salt in [0, S); the dim side is replicated
    * S ways for hot cells only.  Deterministic (hash of the row key, not
    * rand()) so replays are exact. */
  def saltedCellJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                     hot: Array[Long], salt: Int): DataFrame = {
    val hotSet = hot.toSet
    val isHot = col("cell").isin(hotSet.toSeq: _*)
    val saltedFact = fact.withColumn("salt",
      when(isHot, pmod(xxhash64(col(factKey)), lit(salt))).otherwise(lit(0)))
    val salts = (0 until salt).toArray
    val saltedDim = dim
      .withColumn("salt",
        explode(when(isHot, lit(salts)).otherwise(array(lit(0)))))
    saltedFact.join(saltedDim, Seq("cell", "salt")).drop("salt")
  }

  // --- lineage / metrics / checkpoint resume --------------------------------

  /** Per-partition lineage record: (partition_id, rows, order-insensitive
    * checksum over `cols`).  Written next to every stage output so a
    * resumed run can prove exact replay. */
  def lineage(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("part_id", spark_partition_id())
      .groupBy("part_id")
      .agg(count(lit(1)).as("n_rows"),
        // decimal(38,0) accumulator: exact and overflow-proof under ANSI
        sum(xxhash64(cols.map(col): _*).cast("decimal(38,0)")).as("checksum"))

  /** Global order-insensitive checksum (sum of per-row xxhash64) — equal
    * across any partitioning iff the row multiset is equal. */
  def canonicalChecksum(df: DataFrame, cols: Seq[String]): BigDecimal = {
    val r = df.agg(
      sum(xxhash64(cols.map(col): _*).cast("decimal(38,0)"))).head
    if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
  }

  /** Checkpointed stage execution: stage output is written per cell-prefix
    * partition under `dir`; a `_GRAFT_DONE` marker commits it.  Re-running
    * with the marker present skips the compute entirely (exact replay =
    * re-read).  Lineage parquet rides along for audit. */
  def checkpointStage(spark: SparkSession, dir: String,
                      compute: () => DataFrame,
                      lineageCols: Seq[String]): DataFrame = {
    val fs = new java.io.File(dir)
    val marker = new java.io.File(fs, "_GRAFT_DONE")
    if (!marker.exists()) {
      val out = compute()
      out.write.mode("overwrite").parquet(s"$dir/data")
      lineage(spark.read.parquet(s"$dir/data"), lineageCols)
        .write.mode("overwrite").parquet(s"$dir/lineage")
      marker.createNewFile()
    }
    spark.read.parquet(s"$dir/data")
  }
}
