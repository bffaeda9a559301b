package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — gaps-and-islands over event time: consecutive
  * events of the same key belong to one session while each gap to the
  * previous event is within `gap`; a larger gap opens a new session.
  * The batch twin of the engine's streaming event-time cell sessions
  * (`GeoStreams`, flatMapGroupsWithState): same semantics, but over a
  * complete table the stateful operator collapses to ONE keyed shuffle
  * and two window passes sharing the partitioning (lag to flag session
  * starts, running sum to number them) — no state store, no join, no
  * per-session explosion, and downstream per-session aggregations reuse
  * the exchange (hash partitioning on the key satisfies the groupBy's
  * clustering requirement), so sessionize + rollup is still one shuffle.
  *
  * Determinism: the window order is (time, tiebreak).  The tiebreak
  * matters — with ties on time and ORDER BY time alone, which row of an
  * equal-time run sorts first is engine- and partitioning-dependent, and
  * the running sum would assign the run's rows to different sessions in
  * different runs.  A caller-named unique column (or, by default, a
  * 64-bit hash of the whole row) makes the order total, so session
  * numbers never depend on partitioning.
  *
  * Null keys group together (SQL GROUP BY semantics, matching window
  * PARTITION BY in any engine).  Null times cannot be ordered: rows with
  * a null time get a null `session_seq` (or are dropped when
  * `dropNullTimes`), never a session of their own.
  *
  * Output: every input column plus `session_seq` — 1-based session
  * number per key, in time order.
  *
  * Relation to Spark's built-in `session_window`: that is an
  * AGGREGATION grouping (events collapse into merged windows; no
  * per-row session label survives) with a fixed inactivity-gap rule and
  * the opposite boundary convention (an event exactly `gap` after the
  * previous one opens a NEW window there; here it stays — `>` vs `>=`).
  * This operator labels every row, supports arbitrary split predicates
  * ([[sessionizeBy]] — e.g. spatial jumps), and its label feeds joins
  * and windows, not just aggregates.  Use `session_window` when a
  * plain windowed aggregate is all that's needed, especially in
  * streaming.
  */
object Sessions {

  def sessionize(events: DataFrame, keys: Seq[String],
                 timeCol: String = "ts",
                 gap: String = "30 minutes",
                 tiebreak: String = null,
                 sessionCol: String = "session_seq",
                 dropNullTimes: Boolean = false): DataFrame =
    sessionizeBy(events, keys, timeCol,
      (prev, cur) =>
        cur.getField(timeCol) > prev.getField(timeCol) + expr(s"INTERVAL $gap"),
      tiebreak, sessionCol, dropNullTimes)

  /** Generalized sessionization: the session-split rule is an arbitrary
    * predicate over (previous row, current row) — both passed as structs
    * of every input column, in time order within the key.  This is the
    * building block for trajectory segmentation (split on a spatial jump
    * OR a time gap), dose/burst detection (split when a value resets),
    * etc.  A null/true predicate result on the first row of a key is
    * irrelevant: the first row always opens session 1.  A predicate
    * evaluating to null (e.g. null-valued fields) does NOT split —
    * express "split on null" explicitly if wanted.  Same plan as
    * [[sessionize]]: one keyed shuffle, two windows sharing it. */
  def sessionizeBy(events: DataFrame, keys: Seq[String],
                   timeCol: String,
                   newSession: (Column, Column) => Column,
                   tiebreak: String = null,
                   sessionCol: String = "session_seq",
                   dropNullTimes: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    val tb: Column =
      if (tiebreak != null) col(tiebreak)
      else xxhash64(struct(events.columns.map(col): _*))
    val good = events.where(col(timeCol).isNotNull)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, tb.asc_nulls_first)
    val cur = struct(events.columns.map(col): _*)
    val prev = lag(cur, 1).over(w)
    val isNew = when(
      prev.isNull || newSession(prev, cur) === true, 1L).otherwise(0L)
    val sessioned = good
      .withColumn("__graft_new", isNew)
      .withColumn(sessionCol,
        sum(col("__graft_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__graft_new")
    if (dropNullTimes) sessioned
    else sessioned.unionByName(
      events.where(col(timeCol).isNull)
        .withColumn(sessionCol, lit(null).cast("long")))
  }
}
