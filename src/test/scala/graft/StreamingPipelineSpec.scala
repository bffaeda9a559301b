package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.geo.kernels._
import graft.geo.pipeline.PipelineBuilder
import graft.geo.streaming.GeoStreams

class StreamingPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      // in-JVM state store: the RocksDB default needs native libs and
      // stalls snapshot uploads in this container
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .config("spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // --- pipeline builder -----------------------------------------------------

  test("builder cancels fwd/inv pairs and drops identities") {
    val utm = UtmKernel(31)
    val k = PipelineBuilder.build(Seq(
      NoopKernel, utm, InverseKernel(utm),
      UnitConvertKernel(1.0, 1.0, IOUnits.Whatever, IOUnits.Whatever),
      HelmertKernel()))
    assert(k == NoopKernel)
  }

  test("builder keeps non-cancelling steps and preserves semantics") {
    val s = "+proj=pipeline +step +proj=utm +zone=31 +ellps=WGS84 " +
      "+step +proj=utm +zone=31 +ellps=WGS84 +inv " +
      "+step +proj=webmerc +ellps=WGS84"
    val simplified = PipelineBuilder.fromProjString(s)
    // utm / utm-inv cancel: only webmerc remains
    assert(simplified.isInstanceOf[MercKernel])
    val full = graft.geo.proj.ProjString.parse(s)
    val v1 = Array(math.toRadians(3.0), math.toRadians(47.0), 0.0, 0.0)
    val v2 = v1.clone()
    assert(full.fwd(v1) && simplified.fwd(v2))
    assert(math.abs(v1(0) - v2(0)) < 1e-6 && math.abs(v1(1) - v2(1)) < 1e-6)
  }

  test("builder cancels self-inverse axisswap pairs") {
    val sw = AxisSwapKernel(Array(2, 1))
    assert(PipelineBuilder.build(Seq(sw, sw)) == NoopKernel)
    val sw3 = AxisSwapKernel(Array(3, 1, 2)) // NOT self-inverse
    assert(PipelineBuilder.build(Seq(sw3, sw3)) != NoopKernel)
  }

  // --- streaming ------------------------------------------------------------

  test("windowed tile occupancy over a memory stream matches batch") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double, Double, Double)]
    val events = input.toDF().toDF("ts", "lon", "lat", "value")
    val q = GeoStreams.windowedTileOccupancy(events, level = 6,
        windowDur = "1 minute", watermark = "2 minutes")
      .writeStream.format("memory").queryName("tiles")
      .outputMode("update").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:10")
    val rows = Seq(
      (t0, 139.69, 35.68, 1.0), (t0, 139.70, 35.69, 2.0),
      (t0, -74.0, 40.71, 3.0))
    input.addData(rows)
    q.processAllAvailable()
    val out = sp.sql("select cell, n_events from tiles").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch oracle
    val batch = GeoStreams.windowedTileOccupancy(
      rows.toDF("ts", "lon", "lat", "value"), 6).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    q.stop()
    assert(out == batch)
    assert(out.values.sum == 3)
    assert(out.size == 2) // two hotspot cells
  }

  test("per-cell sessions accumulate state across batches") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[GeoStreams.CellEvent]
    val q = GeoStreams.cellSessions(input.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    input.addData(GeoStreams.CellEvent(42L, ts, 1.0),
      GeoStreams.CellEvent(42L, ts, 2.0))
    q.processAllAvailable()
    input.addData(GeoStreams.CellEvent(42L, ts, 3.0))
    q.processAllAvailable()
    val out = sp.sql(
      "select nEvents, sumValue from sessions where cell = 42 order by nEvents")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    q.stop()
    assert(out.contains((2L, 3.0)))  // after batch 1
    assert(out.contains((3L, 6.0)))  // after batch 2 (state carried over)
  }

  test("stream-static geofence join matches the batch PIP join") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    import graft.geo.engine.GeoEngine
    // a lon/lat box around Tokyo and a triangle over the US east coast
    val polys = Seq(
      GeoEngine.Polygon("tokyo",
        Array(139.0, 35.0, 141.0, 35.0, 141.0, 36.5, 139.0, 36.5)),
      GeoEngine.Polygon("east",
        Array(-78.0, 38.0, -70.0, 38.0, -74.0, 43.0)))
    val rows = Seq(
      (1L, 139.69, 35.68), (2L, 140.5, 36.0),   // inside tokyo
      (3L, -74.0, 40.71),                       // inside east
      (4L, 2.35, 48.85), (5L, 139.69, 37.5))    // outside both
    val input = MemoryStream[(Long, Double, Double)]
    val events = input.toDF().toDF("pt_id", "lon", "lat")
    val q = GeoStreams.geofenceJoin(events, polys)
      .select("pt_id", "poly_id")
      .writeStream.format("memory").queryName("fences")
      .outputMode("append").start()
    input.addData(rows.take(3))
    q.processAllAvailable()
    input.addData(rows.drop(3))
    q.processAllAvailable()
    val out = sp.sql("select pt_id, poly_id from fences").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    q.stop()
    val batch = GeoEngine.pipJoin(sp, rows.toDF("pt_id", "lon", "lat"), polys)
      .select("pt_id", "poly_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == batch)
    assert(out == Set((1L, "tokyo"), (2L, "tokyo"), (3L, "east")))
  }

  test("streaming exact dedup keeps first-seen doc per fingerprint across batches") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = GeoStreams.streamingDedup(docs, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    input.addData(Seq(
      (ts, "a1", "the quick brown fox"),
      (ts, "a2", "the quick brown fox"), // in-batch dup
      (ts, "b1", "another document")))
    q.processAllAvailable()
    input.addData(Seq(
      (ts, "a3", "the quick brown fox"), // cross-batch dup (state hit)
      (ts, "c1", "a third document")))
    q.processAllAvailable()
    val kept = sp.sql("select doc_id from deduped").collect()
      .map(_.getString(0)).toSet
    q.stop()
    assert(kept.intersect(Set("a1", "a2", "a3")).size == 1,
      s"expected exactly one of the dup family, got $kept")
    assert(kept.contains("b1") && kept.contains("c1"))
  }

  test("streaming snapshot dedup drops docs already in the static snapshot") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val snapshot = Seq((900L, "alpha beta gamma delta"),
      (901L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // stateless: no watermark, no state store — the Bloom filter is a
    // plan constant and the verify join's right side is static
    val q = GeoStreams.streamingSnapshotDedup(docs, snapshot)
      .writeStream.format("memory").queryName("snap_dedup")
      .outputMode("append").start()
    input.addData(Seq(
      ("n1", "alpha beta gamma delta"),   // snapshot dup: drop
      ("n2", "fresh text one"),           // keep
      ("n3", null.asInstanceOf[String]))) // null text: keep (matches nothing)
    q.processAllAvailable()
    input.addData(Seq(
      ("n4", "epsilon zeta eta theta"),   // snapshot dup, later batch: drop
      ("n5", "fresh text two")))          // keep
    q.processAllAvailable()
    val kept = sp.sql("select doc_id from snap_dedup").collect()
      .map(_.getString(0)).toSet
    q.stop()
    assert(kept == Set("n2", "n3", "n5"), kept)
    // stream-vs-batch parity: the batch incrementalDedup gives the same
    // verdicts on the same rows
    val batch = Seq(("n1", "alpha beta gamma delta"), ("n2", "fresh text one"),
      ("n3", null.asInstanceOf[String]), ("n4", "epsilon zeta eta theta"),
      ("n5", "fresh text two")).toDF("doc_id", "text")
    assert(graft.data.Dedup.incrementalDedup(batch, snapshot)
      .select("doc_id").collect().map(_.getString(0)).toSet == kept)
  }

  test("streaming corpus clean chains url dedup, content dedup, quality gate") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text", "url")
    val q = GeoStreams.streamingCorpusClean(docs)
      .writeStream.format("memory").queryName("cleaned")
      .outputMode("append").start()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    // dup pairs split ACROSS batches: within one batch the dedup keeps an
    // arbitrary member; across batches first-seen wins deterministically
    // docs need >= 7 tokens: the Gopher top-bigram cap (<= 0.2) drops
    // anything shorter by construction (top bigram = 1/n_bigrams)
    input.addData(Seq(
      (ts, "u1", "one two three four five six seven", "https://WWW.A.com/x?utm_x=1"),
      (ts, "u2", "other text entirely here now indeed yes", "http://a.com/x"), // http != https: survives
      (ts, "q1", "too short", "https://b.com/2")))                   // quality drop
    q.processAllAvailable()
    input.addData(Seq(
      (ts, "u3", "a different doc with some more text", "https://a.com/x/"), // url dup of u1
      (ts, "t1", "one two three four five six seven", "https://b.com/1"),    // text dup of u1
      (ts, "u4", "late spelling of the first url twin", "https://a.com/x?utm_y=2"), // url dup of u1
      (ts, "k1", "a keeper in batch two okay yes", "https://c.com/1")))
    q.processAllAvailable()
    val kept = sp.sql("select doc_id from cleaned").collect()
      .map(_.getString(0)).toSet
    q.stop()
    assert(kept == Set("u1", "u2", "k1"), kept)
  }

  test("streaming corpus clean: the LM perplexity gate streams statelessly") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // batch-trained model (a stream cannot see its own future counts)
    val vocab = Array("astro", "galaxy", "nebula", "quasar", "pulsar",
      "comet", "orbit", "lens")
    def vDoc(seed: Long): String =
      (0 until 12).map(i =>
        vocab((graft.data.DedupHash.mix(seed * 31 + i) % vocab.length).toInt.abs))
        .mkString(" ")
    val ref = (0L until 40L).map(i => (i, vDoc(i))).toDF("doc_id", "text")
    val m = graft.data.Corpus.lmTrain(ref, buckets = 1024)
    val input = MemoryStream[(java.sql.Timestamp, String, String, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text", "url")
    val q = GeoStreams.streamingCorpusClean(docs,
        maxDupWordFrac = 1.0, maxTopBigramFrac = 1.0,
        lmModel = Some(m), minLmLogProbPerBigramE6 = -5500000L)
      .writeStream.format("memory").queryName("cleaned_lm")
      .outputMode("append").start()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    input.addData(Seq(
      (ts, "d1", vDoc(100L), "https://d1.example.com/"),   // dialect: keep
      (ts, "d2", vDoc(101L), "https://d2.example.com/"),   // dialect: keep
      (ts, "g1", (0 until 12).map(i => s"zq$i").mkString(" "),
        "https://g1.example.com/")))                       // gibberish: drop
    q.processAllAvailable()
    val kept = sp.sql("select doc_id from cleaned_lm").collect()
      .map(_.getString(0)).toSet
    q.stop()
    assert(kept == Set("d1", "d2"), kept)
    // stream-vs-batch parity: the same gate expression on a batch frame
    // gives the identical verdicts
    val batch = Seq(("d1", vDoc(100L)), ("g1",
        (0 until 12).map(i => s"zq$i").mkString(" ")))
      .toDF("doc_id", "text")
      .where(graft.data.dataops.lmGate(
        org.apache.spark.sql.functions.col("text"),
        m.uni, m.bi, m.buckets, -5500000L))
      .select("doc_id").as[String].collect().toSet
    assert(batch == Set("d1"))
  }

  test("streaming corpus clean: null urls dedup by content, not with each other") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text", "url")
    val q = GeoStreams.streamingCorpusClean(docs)
      .writeStream.format("memory").queryName("cleaned_nulls")
      .outputMode("append").start()
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    input.addData(Seq(
      (ts, "n1", "first doc with a missing source url", null),
      (ts, "n2", "second doc also lacking any url here", null)))
    q.processAllAvailable()
    input.addData(Seq(
      // same text as n1, null url -> content-dedup at the url stage
      (ts, "n3", "first doc with a missing source url", null)))
    q.processAllAvailable()
    val kept = sp.sql("select doc_id from cleaned_nulls").collect()
      .map(_.getString(0)).toSet
    q.stop()
    assert(kept == Set("n1", "n2"), kept)
  }
}
