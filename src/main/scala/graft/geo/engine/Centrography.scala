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

  /** Per-group convex hull over mm-quantized webmerc coordinates — the
    * minimum-area convex polygon containing the group (ArcGIS Minimum
    * Bounding Geometry / ST_ConvexHull as a distributed AGGREGATE):
    * output groupCols ++ (n_points, n_vertices, hull_x_mm, hull_y_mm,
    * area_m2, perimeter_m) with the hull in counter-clockwise order from
    * the lexicographic-minimum vertex.
    *
    * Determinism: coordinates quantize ONCE to integer mm (the
    * [[summary]] contract); the Andrew monotone chain runs on longs with
    * BigInt cross products (mm deltas reach 4·10¹⁰, whose products
    * overflow a long), so the hull — and the exact-BigInt shoelace area
    * — is a pure function of the point SET, never of partitioning or
    * order.  Collinear boundary points are dropped (strict turns only);
    * duplicates collapse.
    *
    * Scale shape: a typed [[org.apache.spark.sql.expressions.Aggregator]]
    * whose buffer holds ONLY the running hull (re-hulled whenever the
    * scratch buffer exceeds 192 points) — state is O(hull size), the
    * merge is hull-of-union, and the whole operator is ONE
    * map-side-combined aggregation: no collect_list of the corpus, no
    * shuffle of raw points.  Hulls of mm-quantized real data are tiny
    * (≤ a few hundred vertices), so executor memory is bounded at any
    * corpus size. */
  def convexHull(pts: DataFrame, groupCols: Seq[String] = Nil,
                 lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val xy = geo.transform(graft.geo.kernels.WebMercKernel(),
      forward = true, outDims = 2, col(lonCol), col(latCol))
    val q = pts
      .select(groupCols.map(col) :+ xy.as("_xy"): _*)
      .select(groupCols.map(col) :+
        floor(col("_xy").getField("x") * 1000.0 + 0.5).cast("long").as("xq") :+
        floor(col("_xy").getField("y") * 1000.0 + 0.5).cast("long").as("yq"): _*)
      .where(col("xq").isNotNull && col("yq").isNotNull)
    val hull = udaf(HullAggregator,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    q.groupBy(groupCols.map(col): _*)
      .agg(hull(col("xq"), col("yq")).as("h"))
      .select(groupCols.map(col) ++ Seq(
        col("h.nPoints").as("n_points"),
        size(col("h.xs")).as("n_vertices"),
        col("h.xs").as("hull_x_mm"), col("h.ys").as("hull_y_mm"),
        col("h.areaM2").as("area_m2"),
        col("h.perimeterM").as("perimeter_m")): _*)
  }

  /** Hull aggregation state: total count + scratch points (re-hulled
    * past 192 so the buffer stays O(hull)). */
  case class HullBuf(n: Long, xs: Array[Long], ys: Array[Long])
  /** Finished hull: CCW vertex arrays + exact-shoelace area and
    * fixed-order perimeter. */
  case class HullOut(nPoints: Long, xs: Seq[Long], ys: Seq[Long],
                     areaM2: Double, perimeterM: Double)

  /** Andrew monotone chain on (Long, Long) with BigInt cross signs. */
  private[engine] def monotoneChain(
      pts: Array[(Long, Long)]): Array[(Long, Long)] = {
    val s = pts.distinct.sorted
    if (s.length <= 2) return s
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Int =
      (BigInt(a._1 - o._1) * BigInt(b._2 - o._2) -
        BigInt(a._2 - o._2) * BigInt(b._1 - o._1)).signum
    val buf = new Array[(Long, Long)](2 * s.length)
    var k = 0
    for (p <- s) { // lower hull
      while (k >= 2 && cross(buf(k - 2), buf(k - 1), p) <= 0) k -= 1
      buf(k) = p; k += 1
    }
    val lower = k + 1
    for (i <- s.length - 2 to 0 by -1) { // upper hull
      val p = s(i)
      while (k >= lower && cross(buf(k - 2), buf(k - 1), p) <= 0) k -= 1
      buf(k) = p; k += 1
    }
    buf.take(k - 1) // last point == first
  }

  object HullAggregator
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), HullBuf, HullOut] {
    private val Cap = 192
    private def rehull(b: HullBuf): HullBuf = {
      val h = monotoneChain(b.xs.zip(b.ys))
      HullBuf(b.n, h.map(_._1), h.map(_._2))
    }
    def zero: HullBuf = HullBuf(0L, Array.empty, Array.empty)
    def reduce(b: HullBuf, p: (Long, Long)): HullBuf = {
      val nb = HullBuf(b.n + 1, b.xs :+ p._1, b.ys :+ p._2)
      if (nb.xs.length > Cap) rehull(nb) else nb
    }
    def merge(a: HullBuf, b: HullBuf): HullBuf = {
      val m = HullBuf(a.n + b.n, a.xs ++ b.xs, a.ys ++ b.ys)
      if (m.xs.length > Cap) rehull(m) else m
    }
    def finish(b: HullBuf): HullOut = {
      if (b.n == 0) return HullOut(0L, Nil, Nil, 0.0, 0.0)
      val h = monotoneChain(b.xs.zip(b.ys))
      val n = h.length
      var shoelace = BigInt(0)
      var perim = 0.0
      var i = 0
      while (i < n && n >= 2) {
        val (x1, y1) = h(i); val (x2, y2) = h((i + 1) % n)
        shoelace += BigInt(x1) * BigInt(y2) - BigInt(x2) * BigInt(y1)
        val dx = (x2 - x1).toDouble; val dy = (y2 - y1).toDouble
        perim += math.sqrt(dx * dx + dy * dy)
        i += 1
      }
      val area = (shoelace.toDouble / 2.0).abs / 1e6
      val perimM = (if (n == 2) perim / 2.0 else perim) / 1000.0
      HullOut(b.n, h.map(_._1).toSeq, h.map(_._2).toSeq, area, perimM)
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[HullBuf] =
      org.apache.spark.sql.Encoders.product[HullBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[HullOut] =
      org.apache.spark.sql.Encoders.product[HullOut]
  }
}
