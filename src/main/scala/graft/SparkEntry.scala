package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.expr.geo
import graft.geo.kernels.{MercKernel, WebMercKernel}
import graft.geo.math.Ellipsoid

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared by every query/oracle pair:
  *  - deterministic lon/lat derived in-query from lineitem numeric columns
  *    (FIXTURES.md §5) so Spark and the DuckDB oracle see identical doubles;
  *  - output columns are BIGINT/STRING only (projected metres scaled to
  *    integer centimetres etc.), so cross-engine libm ulp differences can't
  *    flip a hash compare;
  *  - every aggregate sums integers or counts — exact in IEEE double
  *    regardless of accumulation order, hence partition-count independent.
  */
object SparkEntry {

  /** lineitem scan + derived deterministic geo columns (lon, lat). */
  private def geoLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.withColumn("lon", pmod(col("l_extendedprice"), lit(360.0)) - lit(180.0))
      .withColumn("lat", pmod(col("l_discount") * lit(1000.0) + col("l_partkey"), lit(170.0)) - lit(85.0))
  }

  /** SQL fragment mirrored by the DuckDB oracle for the same geo columns.
    * DuckDB has no pmod; its `mod` keeps the dividend sign, so spell out
    * the floored-mod identity used by Spark's pmod. */
  private val lonSql = "(mod(mod(l_extendedprice, 360.0) + 360.0, 360.0) - 180.0)"
  private val latSql = "(mod(mod(l_discount*1000.0 + l_partkey, 170.0) + 170.0, 170.0) - 85.0)"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Tile occupancy of the synthetic corpus: lon/lat -> Web Mercator ->
    * S2-style cell at level 6 -> occupancy counts (SURVEY.md §7.2 slice 0). */
  def entry(spark: SparkSession): DataFrame = {
    val pts = geoLineitem(spark, "/root/testdata/sf0.001")
    pts.select(geo.cellId(col("lon"), col("lat"), 6).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .orderBy(col("cell"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- coordinate transforms (per-row numeric kernels) ---------------
    "q_webmerc_fwd" -> ((s, dir) => {
      val pts = geoLineitem(s, dir)
      val xy = geo.transform(WebMercKernel(), forward = true, outDims = 2,
        col("lon"), col("lat"))
      pts.select(col("l_orderkey"), col("l_linenumber"),
          xy.getField("x").as("wx"), xy.getField("y").as("wy"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("wx") * 10).cast("long").as("x_dm"),
          round(col("wy") * 10).cast("long").as("y_dm"))
    }),
    "q_merc_roundtrip" -> ((s, dir) => {
      // fwd o inv closure (PROJ proj_roundtrip analogue): count rows whose
      // roundtrip error exceeds 1e-9 deg — must be 0 — plus total rows.
      val pts = geoLineitem(s, dir)
      val k = MercKernel(Ellipsoid.GRS80)
      val xy = geo.transform(k, forward = true, outDims = 2, col("lon"), col("lat"))
      val back = geo.transform(k, forward = false, outDims = 2,
        col("xy").getField("x"), col("xy").getField("y"))
      pts.withColumn("xy", xy)
        .withColumn("ll2", back)
        .select(
          (abs(col("ll2").getField("x") - col("lon")) +
            abs(col("ll2").getField("y") - col("lat"))).as("err"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("err") > 1e-9, 1L).otherwise(0L)).as("n_bad"))
    }),
    // --- tiling ---------------------------------------------------------
    "q_tile_occupancy" -> ((s, dir) => {
      // cell occupancy at level 4, keyed by the cell's (face, i, j) so the
      // oracle can recompute the key with explicit SQL math.
      val pts = geoLineitem(s, dir)
      pts.select(geo.cellId(col("lon"), col("lat"), 4).as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .select(
          shiftrightunsigned(col("cell"), 6 + 8).cast("long").as("face"),
          col("n"))
        .groupBy(col("face")).agg(sum(col("n")).as("n_points"))
    }),
    // --- dedup / text ops on documents -----------------------------------
    "q_dedup_exact" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
    }),
    "q_text_stats" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        (length(col("text")) -
          length(regexp_replace(col("text"), lit(" "), lit("")))).cast("long")
          .as("n_spaces"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    // y = R asinh(tan lat) spelled as ln(t + sqrt(t^2+1)) — the same
    // formula family the Spark kernel evaluates, so cross-engine drift is
    // a few ulp, far inside the decimetre rounding grid.
    "q_webmerc_fwd" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(round(6378137.0 * radians($lonSql) * 10) AS BIGINT) AS x_dm,
         |  CAST(round(6378137.0 * ln(tan(radians($latSql)) +
         |    sqrt(tan(radians($latSql))*tan(radians($latSql)) + 1.0)) * 10) AS BIGINT) AS y_dm
         |FROM lineitem""".stripMargin,
    "q_merc_roundtrip" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_bad FROM lineitem",
    // face of the cube-face cell: argmax(|x|,|y|,|z|) of the unit vector,
    // +axis -> 0..2, -axis -> 3..5, ties broken exactly like
    // CellIndex.faceOf (strict > comparisons).
    "q_tile_occupancy" ->
      s"""WITH pts AS (
         |  SELECT cos(radians($latSql)) * cos(radians($lonSql)) AS x,
         |         cos(radians($latSql)) * sin(radians($lonSql)) AS y,
         |         sin(radians($latSql)) AS z
         |  FROM lineitem
         |), faced AS (
         |  SELECT CASE
         |    WHEN abs(x) > abs(y) THEN
         |      CASE WHEN abs(x) > abs(z) THEN (CASE WHEN x >= 0 THEN 0 ELSE 3 END)
         |           ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END
         |    ELSE
         |      CASE WHEN abs(y) > abs(z) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)
         |           ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END
         |    END AS face
         |  FROM pts
         |)
         |SELECT CAST(face AS BIGINT) AS face, CAST(count(*) AS BIGINT) AS n_points
         |FROM faced GROUP BY face""".stripMargin,
    "q_dedup_exact" ->
      "SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text",
    "q_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
        |CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
        |FROM documents""".stripMargin
  )
}
