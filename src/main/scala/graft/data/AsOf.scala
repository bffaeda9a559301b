package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-in-time) join — the temporal analogue of the engine's
  * spatial distance join: enrich each left row with the single nearest
  * right row by time within the same key (trajectory point → latest
  * position fix, click → latest prior view, measurement → latest prior
  * calibration).  Spark has no native as-of join; the naive spelling is
  * a range join (`l.key = r.key AND r.ts <= l.ts`) plus a top-1 window,
  * which explodes to |matches| intermediate rows per left row — quadratic
  * per key in the worst case and a scale-killer on dense keys.
  *
  * This operator instead unions both sides tagged by origin, shuffles
  * ONCE on the key, sorts each partition by (time, side, tiebreak) and
  * takes a running `last(right_payload, ignoreNulls)` over the preceding
  * frame — O(n log n) per key with no join operator and no intermediate
  * blow-up, the same plan shape at 60k rows and at 100 TB (one exchange,
  * whose skew AQE handles like any keyed aggregation).  Window `last`
  * over an UNBOUNDED PRECEDING frame is evaluated incrementally by
  * Spark's running-frame machinery, not re-scanned per row.
  *
  * Semantics (mirrors DuckDB/kdb/pandas `merge_asof`):
  *   - `backward` (default): match the latest right row with
  *     `r.time <= l.time`; `forward`: the earliest with `r.time >= l.time`.
  *   - Ties on time are broken by the GREATEST `tiebreak` value (a right
  *     column, e.g. a unique id); without one, a deterministic 64-bit
  *     hash of the right payload breaks ties so results never depend on
  *     partitioning.
  *   - `tolerance` (an SQL interval literal, e.g. "30 minutes") nulls the
  *     match when it is further than the interval from the left time —
  *     equivalent to filtering the join range, since the nearest match
  *     being out of tolerance implies all others are too.
  *   - Null left times and null left keys match nothing (SQL join
  *     semantics: null keys never equal); null right times/keys are
  *     discarded as match candidates.
  *
  * Output: every left column unchanged, plus the matched right time and
  * every non-key right column as `{rightPrefix}{name}` (null when no
  * match).  Exactly one row out per left row in.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String = "ts", rightTime: String = "ts",
               direction: String = "backward",
               tolerance: String = null,
               tiebreak: String = null,
               rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val backward = direction match {
      case "backward" => true
      case "forward"  => false
      case other => throw new IllegalArgumentException(
        s"asofJoin direction must be backward|forward, got '$other'")
    }
    // Right payload: the right time plus every non-key right column (the
    // keys are equal on a match by construction), one struct through the
    // union so the window carries a single value.
    val rpCols: Seq[String] =
      rightTime +: right.columns.toSeq.filterNot(c =>
        keys.contains(c) || c == rightTime)
    val rClean = right.where(
      (keys :+ rightTime).map(col(_).isNotNull).reduce(_ && _))
    val tb: Column =
      if (tiebreak != null) col(tiebreak)
      else xxhash64(struct(rpCols.map(col): _*))

    val rpType = rClean.select(struct(rpCols.map(col): _*).as("p"))
      .schema("p").dataType
    val lrowType = left.select(struct(left.columns.map(col): _*).as("p"))
      .schema("p").dataType
    val tbType = rClean.select(tb.as("t")).schema("t").dataType

    val lhs = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__graft_t"),
        lit(1).as("__graft_side"),
        lit(null).cast(tbType).as("__graft_tb"),
        struct(left.columns.map(col): _*).as("__graft_l"),
        lit(null).cast(rpType).as("__graft_r")): _*)
    val rhs = rClean.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__graft_t"),
        lit(0).as("__graft_side"),
        tb.as("__graft_tb"),
        lit(null).cast(lrowType).as("__graft_l"),
        struct(rpCols.map(col): _*).as("__graft_r")): _*)

    // Sort order inside each key partition: right rows must precede left
    // rows at EQUAL time (both directions include equality), and among
    // equal-time right rows the greatest tiebreak must sort last so the
    // running last() picks it.  Forward reuses the backward machinery on
    // negated time order; nulls-first keeps null-time left rows ahead of
    // every candidate so they match nothing.
    val ord =
      if (backward)
        Seq(col("__graft_t").asc_nulls_first, col("__graft_side").asc,
          col("__graft_tb").asc_nulls_first)
      else
        Seq(col("__graft_t").desc_nulls_first, col("__graft_side").asc,
          col("__graft_tb").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lhs.unionByName(rhs)
      .withColumn("__graft_m",
        last(col("__graft_r"), ignoreNulls = true).over(w))
      .where(col("__graft_side") === 1)

    val m0 = col("__graft_m")
    val m =
      if (tolerance == null) m0
      else {
        val iv = expr(s"INTERVAL $tolerance")
        val inTol =
          if (backward) m0.getField(rightTime) >= col("__graft_t") - iv
          else m0.getField(rightTime) <= col("__graft_t") + iv
        when(inTol, m0) // null match when out of tolerance (or unmatched)
      }
    matched.select(
      left.columns.toSeq.map(c => col("__graft_l").getField(c).as(c)) ++
        rpCols.map(c => m.getField(c).as(rightPrefix + c)): _*)
  }

  /** Interval (validity-window) join — the SCD-2 dimension lookup: enrich
    * each left row with the interval row whose `[start, end)` window
    * contains the left time (`(start, end]` with `endInclusive`), within
    * the same key.  PRECONDITION: intervals of one key must not overlap
    * (the slowly-changing-dimension invariant) — under it the containing
    * interval is exactly the latest-starting one not after the left time,
    * so this is the as-of join on the start column with a post-check that
    * the left time has not run past the matched end (a null end is an
    * open-ended current version).  Same scale shape as [[asofJoin]]: one
    * keyed shuffle, no join operator, no per-row interval explosion —
    * versus the naive range join which multiplies every left row by the
    * key's interval count before filtering.  Gaps between intervals
    * behave correctly: a left time in a gap as-of-matches the previous
    * interval and the end check nulls it.
    *
    * Overlapping intervals violate the precondition silently (the
    * latest-starting containing interval wins); [[overlapViolations]]
    * audits a dimension table cheaply if the invariant is in doubt.
    */
  def intervalJoin(left: DataFrame, intervals: DataFrame, keys: Seq[String],
                   leftTime: String = "ts",
                   startCol: String = "valid_from",
                   endCol: String = "valid_to",
                   endInclusive: Boolean = false,
                   tiebreak: String = null,
                   rightPrefix: String = "r_"): DataFrame = {
    val base = asofJoin(left, intervals, keys, leftTime, startCol,
      direction = "backward", tolerance = null, tiebreak = tiebreak,
      rightPrefix = rightPrefix)
    val lt = col(leftTime)
    val e = col(rightPrefix + endCol)
    val keep = e.isNull || (if (endInclusive) lt <= e else lt < e)
    // the matched columns are exactly asofJoin's payload: start first,
    // then every non-key interval column
    val matchedCols: Seq[String] =
      (startCol +: intervals.columns.toSeq.filterNot(c =>
        keys.contains(c) || c == startCol)).map(rightPrefix + _)
    base.select(base.columns.toSeq.map { c =>
      if (matchedCols.contains(c)) when(keep, col(c)).as(c) else col(c)
    }: _*)
  }

  /** Audit helper for [[intervalJoin]]'s non-overlap precondition: the
    * interval rows whose window overlaps the NEXT interval of the same
    * key (by start order).  Empty result = invariant holds.  One keyed
    * shuffle + lead() window. */
  def overlapViolations(intervals: DataFrame, keys: Seq[String],
                        startCol: String = "valid_from",
                        endCol: String = "valid_to",
                        endInclusive: Boolean = false): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol).asc, col(endCol).asc_nulls_last)
    val e = col(endCol)
    val ns = col("next_start")
    intervals.withColumn("next_start", lead(col(startCol), 1).over(w))
      .where(ns.isNotNull &&
        (e.isNull || (if (endInclusive) ns <= e else ns < e)))
  }
}
