package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.data.Sessions

/** Sessionization: equality against a driver-side reference walk, the
  * exact gap-boundary rule, null handling, partitioning-independence of
  * session numbers, and the one-shuffle plan for sessionize + rollup. */
class SessionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sessions-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def corpus(): DataFrame = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 500).map { i =>
      val key = if (i % 61 == 0) null.asInstanceOf[java.lang.Long]
                else java.lang.Long.valueOf(rnd.nextInt(7).toLong)
      val t = if (i % 53 == 0) null.asInstanceOf[Timestamp]
              else ts(rnd.nextInt(200).toLong * 300) // 5-min grid → many ties
      (i.toLong, key, t, rnd.nextInt(100).toDouble)
    }.toDF("event_id", "user_id", "ts", "value")
  }

  /** Driver-side reference: per key (nulls grouped), sort by (ts, id),
    * walk and open a session on every gap strictly greater than gapSec. */
  private def reference(df: DataFrame, gapSec: Long): Map[Long, Option[Long]] = {
    val rows = df.collect().map(r => (
      r.getLong(0),
      if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getTimestamp(2).getTime / 1000)))
    val out = scala.collection.mutable.Map[Long, Option[Long]]()
    rows.filter(_._3.isEmpty).foreach { case (id, _, _) => out(id) = None }
    rows.filter(_._3.isDefined).groupBy(_._2).foreach { case (_, grp) =>
      var seq = 0L
      var prev = Long.MinValue
      grp.sortBy(r => (r._3.get, r._1)).foreach { case (id, _, Some(t)) =>
        if (seq == 0L || t - prev > gapSec) seq += 1
        prev = t
        out(id) = Some(seq)
      }
    }
    out.toMap
  }

  private def engine(df: DataFrame, gapSec: Long): Map[Long, Option[Long]] =
    Sessions.sessionize(df, Seq("user_id"), gap = s"$gapSec seconds",
        tiebreak = "event_id")
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("session numbering equals the reference walk (ties, null keys, null times)") {
    val df = corpus()
    assert(engine(df, 900) == reference(df, 900))
    assert(engine(df, 300) == reference(df, 300))
  }

  test("gap boundary: a gap exactly equal to the threshold stays in session") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, 1L, ts(0), 0.0), (2L, 1L, ts(1800), 0.0),   // exactly 30 min: same
      (3L, 1L, ts(3601), 0.0)                          // 1801 s after: new
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Sessions.sessionize(df, Seq("user_id"), gap = "30 minutes",
        tiebreak = "event_id")
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L), got)
  }

  test("default hash tiebreak: session numbers independent of partitioning") {
    val df = corpus().where(col("ts").isNotNull)
    def run(parts: Int) =
      Sessions.sessionize(df.repartition(parts), Seq("user_id"))
        .select("event_id", "session_seq").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(3) == run(13))
  }

  test("dropNullTimes drops; default keeps them with null session_seq") {
    val df = corpus()
    val nNull = df.where(col("ts").isNull).count()
    val kept = Sessions.sessionize(df, Seq("user_id"), tiebreak = "event_id")
    assert(kept.count() == df.count())
    assert(kept.where(col("session_seq").isNull).count() == nNull)
    assert(Sessions.sessionize(df, Seq("user_id"), tiebreak = "event_id",
      dropNullTimes = true).count() == df.count() - nNull)
  }

  test("trajectorySegments splits on time gaps OR spatial jumps, equal to a reference walk") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(17)
    // per key: mostly small moves at 5-min cadence; planted >50km jumps
    // and planted >30-min gaps
    val rows = (0 until 400).map { i =>
      val key = (i % 4).toLong
      val step = i / 4
      val t = step.toLong * 300 +
        (if (step % 17 == 0 && step > 0) 2400L * step else 0L) // gaps grow
      val jump = if (step % 11 == 5) 1.0 else 0.0 // ~110 km lat jump
      (i.toLong, key, ts(t),
        10.0 + key + step * 0.001 + rnd.nextDouble() * 1e-4,
        45.0 + step * 0.001 + jump)
    }
    val df = rows.toDF("event_id", "user_id", "ts", "lon", "lat")
    val got = graft.geo.engine.GeoEngine.trajectorySegments(
        df, Seq("user_id"), maxGap = "30 minutes", maxJumpMeters = 50000.0,
        tiebreak = "event_id")
      .select("event_id", "segment_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference walk with the identical chord threshold and Math trig
    // (Spark codegen lowers sin/cos/pow to java.lang.Math — bit-identical)
    val c2max = graft.geo.engine.GeoEngine.maxChord2For(50000.0)
    def chord2(lon1: Double, lat1: Double, lon2: Double, lat2: Double) = {
      import java.lang.Math._
      val (x1, y1, z1) = (cos(toRadians(lat1)) * cos(toRadians(lon1)),
        cos(toRadians(lat1)) * sin(toRadians(lon1)), sin(toRadians(lat1)))
      val (x2, y2, z2) = (cos(toRadians(lat2)) * cos(toRadians(lon2)),
        cos(toRadians(lat2)) * sin(toRadians(lon2)), sin(toRadians(lat2)))
      pow(x1 - x2, 2) + pow(y1 - y2, 2) + pow(z1 - z2, 2)
    }
    val want = scala.collection.mutable.Map[Long, Long]()
    rows.groupBy(_._2).foreach { case (_, grp) =>
      var seq = 0L
      var prev: (Long, Double, Double) = null
      grp.sortBy(r => (r._3.getTime, r._1)).foreach { case (id, _, t, lon, lat) =>
        val tSec = t.getTime / 1000
        if (prev == null || tSec - prev._1 > 1800 ||
          chord2(prev._2, prev._3, lon, lat) > c2max) seq += 1
        prev = (tSec, lon, lat)
        want(id) = seq
      }
    }
    assert(got == want.toMap)
    // sanity: the rules actually fired — several segments per key
    assert(got.values.max > 5, s"expected several segments, got max ${got.values.max}")
  }

  test("stayPoints finds planted stays, skips short ones, centroids are antimeridian-safe") {
    val sp = spark; import sp.implicits._
    // key 1: a 40-min stay within ~50 m, travel, a 25-min cluster that is
    // TOO SHORT for minDuration=30min, travel, a second 35-min stay.
    // key 2: a 40-min stay straddling the antimeridian.
    val rows = Seq.newBuilder[(Long, Long, Timestamp, Double, Double)]
    var id = 0L
    def add(key: Long, t: Long, lon: Double, lat: Double): Unit = {
      rows += ((id, key, ts(t), lon, lat)); id += 1
    }
    for (p <- 0 until 9) add(1L, p * 300L, 10.0 + p * 1e-4, 45.0) // 40 min, ~8m steps
    for (p <- 0 until 4) add(1L, 3000 + p * 60L, 10.5 + p * 0.1, 45.0) // travel
    for (p <- 0 until 6) add(1L, 4000 + p * 300L, 11.0, 46.0 + p * 1e-4) // 25 min: short
    add(1L, 5600, 12.0, 47.0) // travel
    for (p <- 0 until 8) add(1L, 6000 + p * 300L, 13.0 + p * 1e-4, 48.0) // 35 min
    for (p <- 0 until 9) // straddles ±180
      add(2L, p * 300L, (if (p % 2 == 0) 179.9995 else -179.9995), 0.0)
    val df = rows.result().toDF("event_id", "user_id", "ts", "lon", "lat")
    val got = graft.geo.engine.GeoEngine.stayPoints(df, Seq("user_id"),
        maxRadiusMeters = 200.0, minDurationSeconds = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6)))
      .sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 1L, 9L), (1L, 2L, 8L), (2L, 1L, 9L)), got.mkString("\n"))
    val s1 = got(0)
    assert(math.abs(s1._4 - 10.0004) < 1e-3 && math.abs(s1._5 - 45.0) < 1e-6)
    assert(s1._6 == 0L && s1._7 == 2400L * 1000000L)
    // antimeridian centroid: |lon| near 180, never near 0
    val s3 = got(2)
    assert(math.abs(s3._4) > 179.99, s"centroid lon ${s3._4}")
    assert(math.abs(s3._5) < 1e-6)
  }

  test("stayPoints: deterministic across partitioning, drops null coords/times") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map { i =>
      val key = (i % 3).toLong
      val lon = if (i % 71 == 0) null.asInstanceOf[java.lang.Double]
                else java.lang.Double.valueOf(10.0 + (i / 40) * 0.3 + rnd.nextDouble() * 1e-4)
      val t = if (i % 67 == 0) null.asInstanceOf[Timestamp]
              else ts((i / 3).toLong * 240)
      (i.toLong, key, t, lon, java.lang.Double.valueOf(45.0))
    }
    val df = rows.toDF("event_id", "user_id", "ts", "lon", "lat")
    def run(parts: Int) = graft.geo.engine.GeoEngine.stayPoints(
        df.repartition(parts), Seq("user_id"),
        maxRadiusMeters = 500.0, minDurationSeconds = 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6))).toSet
    val a = run(2)
    assert(a == run(11))
    assert(a.nonEmpty)
  }

  test("plan shape: sessionize + per-session rollup is ONE exchange, no join") {
    val df = corpus().where(col("ts").isNotNull)
    val plan = Sessions.sessionize(df, Seq("user_id"), tiebreak = "event_id",
        dropNullTimes = true)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"the rollup must reuse the window's partitioning; got $exchanges exchanges:\n$plan")
    assert(!plan.contains("Join"), "no join expected")
  }
}
