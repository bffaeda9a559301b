package graft.geo.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geo.expr.geo

/** Centrography — the "measuring geographic distributions" suite (mean
  * center, standard distance, standard deviational ellipse; ArcGIS
  * spatial-statistics toolbox, CrimeStat): one summary row per group
  * describing where a point set sits, how dispersed it is, and along
  * which axis it stretches.
  *
  * Numeric design for determinism + oracle replay: double sums over an
  * unordered distributed dataset are order-dependent (floating-point
  * addition does not associate), so the engine quantizes webmerc
  * coordinates ONCE to integer millimeters and aggregates exact
  * DECIMAL(38,0) sums (Σx, Σy, Σx², Σy², Σxy) — partitioning-independent
  * and bit-replayable (DuckDB mirrors them as HUGEINT sums).  The final
  * statistics are closed-form doubles from those exact integers.  The
  * ≤0.5 mm quantization bias is negligible against the multi-meter
  * scales the statistics describe, and is part of the documented output
  * contract (same stance as the cell indexes' integer ids).
  *
  * The ellipse is the covariance-eigenvector form: with the centered
  * second moments A = Σ(x−x̄)², B = Σ(y−ȳ)², C = Σ(x−x̄)(y−ȳ), the
  * covariance eigenvalues are λ± = ((A+B) ± √((A−B)² + 4C²)) / (2n) and
  * the axes are the Yuill/ArcGIS √2-scaled standard deviations √(2λ±)
  * (so a circular normal cloud's ellipse holds ≈63 % of points);
  * `sde_theta` is the major-axis direction atan2(2C, A−B)/2 in radians
  * counterclockwise from east, in (−π/2, π/2].
  *
  * Scale shape: ONE map-side-combined aggregation from points straight
  * to the per-group summary row — no joins, no windows, nothing after
  * the shuffle but per-group closed-form arithmetic.  At 10¹² points
  * this is the cheapest possible distributed shape.
  *
  * A Weiszfeld median center is deliberately out of scope: it is an
  * iterative driver-synchronized loop per group; the mean center +
  * ellipse pair covers the descriptive use. */
object Centrography {

  /** Per-group centrographic summary over webmerc meters.  Output:
    * groupCols ++ (n_points, mean_x, mean_y, std_dist, sde_major,
    * sde_minor, sde_theta) — meters (webmerc), theta in radians CCW
    * from east.  std_dist is 0 for a single-point group; sde_* are null
    * when the total variance is zero (single point or all points in one
    * mm cell).  Rows with null/unprojectable coordinates are dropped
    * before aggregation. */
  def summary(pts: DataFrame, groupCols: Seq[String] = Nil,
              lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val xy = geo.transform(graft.geo.kernels.WebMercKernel(),
      forward = true, outDims = 2, col(lonCol), col(latCol))
    val q = pts
      .select(groupCols.map(col) :+ xy.as("_xy"): _*)
      .select(groupCols.map(col) :+
        floor(col("_xy").getField("x") * 1000.0 + 0.5).cast("long").as("xq") :+
        floor(col("_xy").getField("y") * 1000.0 + 0.5).cast("long").as("yq"): _*)
      .where(col("xq").isNotNull && col("yq").isNotNull)
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val agg = q.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(dec(col("xq"))).as("sx"),
      sum(dec(col("yq"))).as("sy"),
      sum(dec(col("xq")) * dec(col("xq"))).as("sxx"),
      sum(dec(col("yq")) * dec(col("yq"))).as("syy"),
      sum(dec(col("xq")) * dec(col("yq"))).as("sxy"))
    val nD = col("n").cast("double")
    // centered second moments in mm^2, from the exact integer sums
    val a = col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD
    val b = col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / nD
    val cc = col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / nD
    val disc = sqrt((a - b) * (a - b) + lit(4.0) * cc * cc)
    val lam1 = (a + b + disc) / (lit(2.0) * nD)
    val lam2 = (a + b - disc) / (lit(2.0) * nD)
    agg.select(groupCols.map(col) ++ Seq(
      col("n").as("n_points"),
      (col("sx").cast("double") / nD / 1000.0).as("mean_x"),
      (col("sy").cast("double") / nD / 1000.0).as("mean_y"),
      (sqrt((a + b) / nD) / 1000.0).as("std_dist"),
      when(a + b > 0, sqrt(lit(2.0) * greatest(lam1, lit(0.0))) / 1000.0)
        .as("sde_major"),
      when(a + b > 0, sqrt(lit(2.0) * greatest(lam2, lit(0.0))) / 1000.0)
        .as("sde_minor"),
      when(a + b > 0, atan2(lit(2.0) * cc, a - b) / 2.0).as("sde_theta")): _*)
  }
}
