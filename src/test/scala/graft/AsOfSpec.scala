package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.data.AsOf

/** As-of join: equality against the brute-force range-join + top-1 window
  * spelling (the semantics reference, quadratic and therefore only a test
  * oracle), tie and null rules, tolerance, forward direction, and the
  * plan shape that makes it scale — one exchange, no join operator. */
class AsOfSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("asof-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  /** Deterministic corpus with dense per-key collisions: duplicate times
    * on both sides, null keys, null times, keys with no right rows. */
  private def corpus(): (DataFrame, DataFrame) = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val lrows = (0 until 400).map { i =>
      val key = if (i % 37 == 0) null.asInstanceOf[java.lang.Long]
                else java.lang.Long.valueOf(rnd.nextInt(6).toLong)
      val t = if (i % 41 == 0) null.asInstanceOf[Timestamp]
              else ts(rnd.nextInt(50).toLong * 60)
      (i.toLong, key, t, rnd.nextInt(100).toDouble)
    }
    // right side: key 5 never appears (no-match key); heavy time ties
    val rrows = (0 until 300).map { i =>
      val key = if (i % 53 == 0) null.asInstanceOf[java.lang.Long]
                else java.lang.Long.valueOf(rnd.nextInt(5).toLong)
      val t = if (i % 47 == 0) null.asInstanceOf[Timestamp]
              else ts(rnd.nextInt(25).toLong * 120) // coarser → many ties
      (1000L + i, key, t, rnd.nextInt(100).toDouble)
    }
    (lrows.toDF("event_id", "user_id", "ts", "value"),
      rrows.toDF("event_id", "user_id", "ts", "value"))
  }

  /** Brute-force reference: range join + top-1 window with the operator's
    * documented tie rule (greatest right time nearest, then greatest
    * tiebreak id). */
  private def brute(l: DataFrame, r: DataFrame, backward: Boolean,
                    tolSeconds: Long): DataFrame = {
    val ll = l.select(col("event_id").as("click_id"), col("user_id"),
      col("ts").as("l_ts"), col("value").as("l_value"))
    val rr = r.where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_key"),
        col("ts").as("r_ts"), col("value").as("r_value"))
    val timeCond =
      if (backward)
        col("r_ts") <= col("l_ts") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $tolSeconds seconds")
      else
        col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $tolSeconds seconds")
    val joined = ll.join(rr, col("user_id") === col("r_key") && timeCond, "left")
    val ord =
      if (backward) Seq(col("r_ts").desc_nulls_last, col("r_event_id").desc_nulls_last)
      else Seq(col("r_ts").asc_nulls_last, col("r_event_id").desc_nulls_last)
    joined.withColumn("rn", row_number().over(
        Window.partitionBy(col("click_id")).orderBy(ord: _*)))
      .where(col("rn") === 1)
      .select(col("click_id"), col("r_event_id"), col("r_ts"), col("r_value"))
  }

  private def runEngine(l: DataFrame, r: DataFrame, direction: String,
                        tolSeconds: Long): DataFrame =
    AsOf.asofJoin(l, r, Seq("user_id"), direction = direction,
        tolerance = s"$tolSeconds seconds", tiebreak = "event_id")
      .select(col("event_id").as("click_id"), col("r_event_id"),
        col("r_ts"), col("r_value"))

  private def asSet(df: DataFrame): Set[(Long, Option[Long], Option[Long], Option[Double])] =
    df.collect().map(row => (
      row.getLong(0),
      if (row.isNullAt(1)) None else Some(row.getLong(1)),
      if (row.isNullAt(2)) None else Some(row.getTimestamp(2).getTime),
      if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toSet

  test("backward as-of join equals the brute-force range join + top-1") {
    val (l, r) = corpus()
    val got = asSet(runEngine(l, r, "backward", 3600))
    val want = asSet(brute(l, r, backward = true, 3600))
    assert(got.size == l.count(), "exactly one output row per left row")
    assert(got == want,
      s"diff: engine-only=${(got -- want).take(5)} brute-only=${(want -- got).take(5)}")
  }

  test("forward as-of join equals brute force") {
    val (l, r) = corpus()
    val got = asSet(runEngine(l, r, "forward", 3600))
    val want = asSet(brute(l, r, backward = false, 3600))
    assert(got == want,
      s"diff: engine-only=${(got -- want).take(5)} brute-only=${(want -- got).take(5)}")
  }

  test("tight tolerance equals brute force (matches become nulls, rows survive)") {
    val (l, r) = corpus()
    val got = asSet(runEngine(l, r, "backward", 60))
    val want = asSet(brute(l, r, backward = true, 60))
    assert(got == want)
    assert(got.size == l.count())
    // tolerance must only ever null matches vs the loose run, never move them
    val loose = asSet(runEngine(l, r, "backward", 3600))
      .map { case (id, e, t, v) => id -> ((e, t, v)) }.toMap
    got.foreach { case (id, e, t, v) =>
      if (e.isDefined) assert(loose(id) == ((e, t, v)),
        s"tolerance changed the match for $id")
    }
  }

  test("null keys and null times match nothing; exact-tie timestamps match with max-id tiebreak") {
    val sp = spark; import sp.implicits._
    val l = Seq(
      (1L, java.lang.Long.valueOf(1L), ts(100), 0.0),
      (2L, null.asInstanceOf[java.lang.Long], ts(100), 0.0), // null key
      (3L, java.lang.Long.valueOf(1L), null.asInstanceOf[Timestamp], 0.0), // null time
      (4L, java.lang.Long.valueOf(2L), ts(100), 0.0) // key without right rows
    ).toDF("event_id", "user_id", "ts", "value")
    val r = Seq(
      (10L, java.lang.Long.valueOf(1L), ts(100), 1.0), // exact tie with l1
      (11L, java.lang.Long.valueOf(1L), ts(100), 2.0), // same ts, larger id wins
      (12L, null.asInstanceOf[java.lang.Long], ts(50), 3.0), // null right key: never a candidate
      (13L, java.lang.Long.valueOf(1L), null.asInstanceOf[Timestamp], 4.0) // null right time: never a candidate
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.asofJoin(l, r, Seq("user_id"), tiebreak = "event_id")
      .select("event_id", "r_event_id").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
    assert(out == Map(1L -> 11L, 2L -> -1L, 3L -> -1L, 4L -> -1L), out)
  }

  test("without a tiebreak column, tie resolution is deterministic across runs") {
    val (l, r) = corpus()
    def run() = AsOf.asofJoin(l.repartition(7), r.repartition(3), Seq("user_id"))
      .select(col("event_id"), col("r_event_id")).collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
    assert(run() == run())
  }

  /** Non-overlapping per-key interval ladder with deliberate gaps and an
    * open-ended (null end) final interval on some keys: for key k,
    * version v covers [v*100 + k*7, v*100 + k*7 + 60) seconds — a 40 s
    * gap between consecutive windows. */
  private def intervalCorpus(): (DataFrame, DataFrame) = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(13)
    val iv = for (k <- 0L until 5L; v <- 0L until 8L) yield {
      val start = v * 100 + k * 7
      val end = if (v == 7 && k % 2 == 0) None else Some(start + 60)
      (k, v, ts(start), end.map(e => ts(e)).orNull)
    }
    val probes = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(6).toLong /* key 5 has no intervals */,
        ts(rnd.nextInt(900).toLong), rnd.nextInt(100).toDouble)
    }
    (probes.toDF("event_id", "user_id", "ts", "value"),
      iv.toDF("user_id", "version", "vstart", "vend"))
  }

  test("interval join equals the brute-force range join (gaps, open ends, both end rules)") {
    val (l, iv) = intervalCorpus()
    for (inclusive <- Seq(false, true)) {
      val got = AsOf.intervalJoin(l, iv, Seq("user_id"), "ts",
          startCol = "vstart", endCol = "vend", endInclusive = inclusive,
          tiebreak = "version")
        .select("event_id", "r_version").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val endOk =
        if (inclusive) col("ts") <= col("vend") else col("ts") < col("vend")
      val wantRows = l.as("l").join(iv.as("i"),
          col("l.user_id") === col("i.user_id") &&
            col("ts") >= col("vstart") && (col("vend").isNull || endOk),
          "left")
        .select(col("event_id"), col("version")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      // the brute join must not have duplicated any left row (intervals
      // really are non-overlapping, so the comparison is meaningful)
      assert(wantRows.length == l.count())
      assert(got == wantRows.toMap, s"endInclusive=$inclusive")
    }
  }

  test("a time in the gap between intervals matches nothing (end check nulls the as-of hit)") {
    val sp = spark; import sp.implicits._
    val iv = Seq((1L, 0L, ts(0), ts(60)), (1L, 1L, ts(100), ts(160)))
      .toDF("user_id", "version", "vstart", "vend")
    val l = Seq((1L, 1L, ts(80), 0.0), (2L, 1L, ts(30), 0.0),
      (3L, 1L, ts(60), 0.0) // exactly at exclusive end: gap
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOf.intervalJoin(l, iv, Seq("user_id"), "ts",
        startCol = "vstart", endCol = "vend", tiebreak = "version")
      .select("event_id", "r_version").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(1L -> -1L, 2L -> 0L, 3L -> -1L), got)
  }

  test("overlapViolations: empty on a valid SCD table, catches planted overlaps") {
    val sp = spark; import sp.implicits._
    val (_, good) = intervalCorpus()
    assert(AsOf.overlapViolations(good, Seq("user_id"),
      startCol = "vstart", endCol = "vend").isEmpty)
    val bad = Seq(
      (1L, 0L, ts(0), ts(100)), (1L, 1L, ts(50), ts(150)), // overlap
      (2L, 0L, ts(0), null.asInstanceOf[Timestamp]), // open-ended ...
      (2L, 1L, ts(50), ts(80)) // ... overlapped by a later start
    ).toDF("user_id", "version", "vstart", "vend")
    val hits = AsOf.overlapViolations(bad, Seq("user_id"),
        startCol = "vstart", endCol = "vend")
      .select("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 0L), (2L, 0L)), hits)
  }

  test("plan shape: one exchange, no join operator, window over union") {
    val (l, r) = corpus()
    val plan = runEngine(l, r, "backward", 3600)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), "expected a window operator")
    assert(plan.contains("Union"), "expected the tagged union")
  }
}
