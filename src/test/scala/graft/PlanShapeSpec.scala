package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.geo.engine.GeoEngine
import graft.geo.synth.DocCorpus

/** Physical-plan assertions: the properties that keep the engine fast at
  * 100 TB must be visible in `.explain` output, not assumed — nested
  * schema pruning reaching the parquet scan, partition pruning on the
  * cell-prefix layout, broadcast (not shuffle) joins for the polygon
  * side, and whole-stage codegen over the kernel expressions. */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _
  private var corpusDir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-shape-spec")
      .config("spark.sql.shuffle.partitions", 4)
      // AQE re-plans lazily; assertions need the static physical plan
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    corpusDir = java.nio.file.Files.createTempDirectory("graft-plan").toString
    DocCorpus.write(spark, 2000, corpusDir, parts = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("geo-tag extraction prunes the scan to spans.media_ref") {
    val plan = planOf(GeoEngine.withGeoTag(spark.read.parquet(corpusDir))
      .select("doc_id", "lon", "lat"))
    assert(plan.contains("ReadSchema: struct<doc_id:string,spans:array<struct<media_ref:string>>>"),
      s"spans not pruned:\n${plan.split("\n").filter(_.contains("ReadSchema")).mkString}")
  }

  test("cell-prefix predicate prunes partitions at the scan") {
    val docs = spark.read.parquet(corpusDir)
    val somePrefix = docs.select("cell_p2").head.getAs[Number](0).longValue
    val plan = planOf(docs.where(col("cell_p2") === somePrefix))
    assert(plan.contains("PartitionFilters: [isnotnull(cell_p2"),
      s"no partition filter:\n${plan.split("\n").filter(_.contains("PartitionFilters")).mkString}")
  }

  test("PIP join is fully map-side: no join, no exchange, one codegen scan") {
    val docs = GeoEngine.withGeoTag(spark.read.parquet(corpusDir))
    val polys = Seq(GeoEngine.Polygon("box",
      Array(139.0, 35.1, 140.4, 35.1, 140.4, 36.3, 139.0, 36.3)))
    val plan = planOf(GeoEngine.pipJoin(spark, docs, polys))
    // candidate generation is a plan-constant lookup inside the scan —
    // the strongest possible 100-TB shape: zero shuffles, zero joins
    assert(plan.contains("cell_cover_lookup"), "expected the cover lookup")
    assert(plan.contains("Generate"), "expected candidate explode")
    assert(!plan.contains("Join"), "PIP must not plan any join")
    assert(!plan.contains("Exchange"), "PIP must not shuffle or broadcast")
    assert(plan.contains("*("), "expected whole-stage codegen")
  }

  test("tile occupancy runs inside whole-stage codegen with a partial aggregate") {
    val docs = GeoEngine.withGeoTag(spark.read.parquet(corpusDir))
    val plan = planOf(GeoEngine.tileOccupancy(docs, 8))
    // WholeStageCodegen stages print as "*(n) Operator" in toString
    assert(plan.contains("*("), "expected codegen stages")
    // map-side combine: a HashAggregate below the exchange
    val exchangeIdx = plan.indexOf("Exchange")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(exchangeIdx >= 0 && aggIdx > exchangeIdx,
      "expected partial HashAggregate under the shuffle")
  }

  test("tile pyramid: one scan, one shuffle, partial aggregate per level") {
    val docs = GeoEngine.withGeoTag(spark.read.parquet(corpusDir))
    val plan = planOf(GeoEngine.tilePyramid(docs, minLevel = 2, maxLevel = 8))
    // the whole pyramid must be a single exchange — the parent ladder is
    // map-side, never one aggregation chain per level
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges == 1, s"expected exactly 1 Exchange, got $exchanges")
    val exchangeIdx = plan.indexOf("Exchange")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(aggIdx > exchangeIdx, "expected partial HashAggregate under the shuffle")
    assert(plan.contains("*("), "expected codegen stages")
  }

  test("distance join broadcasts the query side (data side never shuffles)") {
    val docs = GeoEngine.withGeoTag(spark.read.parquet(corpusDir))
    val data = docs.select(col("doc_id").as("data_id"), col("lon"), col("lat"))
    val queries = docs.limit(20)
      .select(col("doc_id").as("query_id"), col("lon"), col("lat"))
    val plan = planOf(GeoEngine.distanceJoin(queries, data, 100000.0))
    assert(plan.contains("BroadcastHashJoin"), "expected a broadcast join")
    assert(!plan.contains("SortMergeJoin"), "data side must not shuffle")
    assert(!plan.contains("CartesianProduct"), "no cross join allowed")
  }

  test("similarity joins: no cartesian anywhere; exact stage keyed on pairs") {
    val sp = spark; import sp.implicits._
    val pts = (0 until 60).map(i =>
      (i.toLong % 6, 10.0 + (i % 6) * 0.5 + (i / 6) * 0.01,
        40.0 + (i % 6) * 0.3)).toDF("traj_id", "lon", "lat")
    val hPlan = planOf(GeoEngine.hausdorffJoin(pts, 20000.0))
    // the bipartite product must arrive through keyed joins on the
    // candidate-pair ids, never a cross product, and the per-point min
    // must partial-aggregate map-side before the pair shuffle
    assert(!hPlan.contains("CartesianProduct"), "no cross join allowed")
    assert(hPlan.contains("partial_min") || hPlan.contains("partial_"),
      "per-point min must combine map-side")
    val tsPts = pts.withColumn("ts",
      timestamp_seconds(col("traj_id") * 60 + col("lon").cast("long")))
    val fPlan = planOf(GeoEngine.frechetJoin(tsPts, 20000.0))
    assert(!fPlan.contains("CartesianProduct"), "no cross join allowed")
    // sequences are collected once per id (sort-based or hash objagg),
    // then joined to candidate pairs by key
    assert(fPlan.contains("ObjectHashAggregate") || fPlan.contains("SortAggregate"),
      "collect_list must aggregate per id")
  }

  test("decontamination broadcasts the eval postings; corpus scans map-side") {
    val sp = spark; import sp.implicits._
    val corpus = Seq(("c1", "alpha beta gamma delta"),
      ("c2", "one two three four")).toDF("doc_id", "text")
    val evalSet = Seq(("e1", "alpha beta gamma")).toDF("eval_id", "text")
    val plan = planOf(graft.data.Dedup.decontaminate(corpus, evalSet))
    assert(plan.contains("BroadcastHashJoin"), "expected a broadcast join")
    assert(!plan.contains("SortMergeJoin"), "corpus postings must not shuffle")
    // the only SHUFFLE exchange is the final (doc,eval)-keyed aggregate
    // (BroadcastExchange is the point, so count hash-partitioned ones only)
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"expected at most one shuffle:\n$plan")
  }

  test("paragraph dedup: ownership aggregate combines map-side, ids+hashes only") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "x\ny"), (2L, "y\nz")).toDF("doc_id", "text")
    val plan = planOf(graft.data.Corpus.paragraphDedup(docs))
    // ownership pass: partial min/count under the pd_h exchange
    assert(plan.contains("partial_min") && plan.contains("partial_count"),
      "expected map-side combine in the ownership aggregate")
    // the ownership branch's aggregate keys on the 64-bit hash (min-of-
    // struct forces a SortAggregate, which prints singular "key=")
    assert(plan.contains("key=[pd_h") || plan.contains("keys=[pd_h"),
      s"ownership aggregate must key on the paragraph hash:\n$plan")
    // the ownership branch projects ids + hash only — paragraph text is
    // projected away before the pd_h exchange (the verdict-join branch,
    // by contrast, carries pd_para between pd_idx and the hash)
    val idsOnly = """Project \[doc_id#\d+L AS pd_id#\d+L, pd_idx#\d+, xxhash64""".r
    assert(idsOnly.findFirstIn(plan).isDefined,
      "ownership projection must exclude paragraph text")
  }

  test("stratified sample: broadcast thresholds, no per-stratum sort or window") {
    val sp = spark; import sp.implicits._
    val docs = (0L until 100L).map(i => (i, s"text $i", s"l${i % 3}"))
      .toDF("doc_id", "text", "lang")
    val plan = planOf(graft.data.Corpus.stratifiedSample(docs, "lang", 5))
    assert(plan.contains("BroadcastHashJoin"),
      "thresholds must broadcast — the corpus side never shuffles")
    assert(!plan.contains("Window"),
      "no stratum is ever sorted: the threshold replaces a row_number window")
    assert(plan.contains("ObjectHashAggregate"),
      "kth-smallest must run as a partial-aggregable Aggregator")
  }

  test("duplicate spans: occurrence counts combine map-side, no cartesian") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val plan = planOf(graft.data.Dedup.duplicateSpans(docs, window = 3))
    // pass 1 must be partial-aggregable (the skew-safety claim: every
    // task collapses to its distinct window hashes before the exchange)
    assert(plan.contains("partial_count") && plan.contains("partial_min"),
      s"expected map-side combine in the occurrence aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct"), "no cross join allowed")
    // the span merge groups duplicate windows only, keyed by document
    assert(plan.contains("partial_collect_list") ||
      plan.contains("collect_list"),
      "expected the per-doc span merge aggregate")
    // (the duplicate-hash side broadcasts at runtime under AQE; this
    // spec pins the static plan, so no join-strategy assertion here)
  }

  test("the LM gate is one codegen expression inside the filter") {
    val sp = spark; import sp.implicits._
    val ref = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val m = graft.data.Corpus.lmTrain(ref, buckets = 1024)
    // a range-backed source so the filter cannot constant-fold away
    val docs = sp.range(10).select(col("id"),
      concat(lit("alpha beta gamma "), col("id")).as("text"))
    val plan = planOf(docs.where(graft.data.dataops.lmGate(
      col("text"), m.uni, m.bi, m.buckets, -9500000L)))
    assert(plan.contains("lm_gate_1024"),
      s"expected the fused gate expression:\n$plan")
    assert(plan.contains("*(1)"),
      s"the gate must run inside whole-stage codegen:\n$plan")
  }

  test("sequence packing: the output pass is shuffle-free over pinned partitions") {
    val sp = spark; import sp.implicits._
    val docs = (0L until 50L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val plan = planOf(graft.data.Corpus.packSequences(docs, 16))
    // the range shuffle happened once at localCheckpoint materialization;
    // the assignment pass itself reads pinned partitions map-side
    assert(plan.contains("Scan ExistingRDD"),
      "expected the checkpointed narrow projection as the source")
    assert(!plan.contains("Exchange"),
      s"the packing output pass must not shuffle:\n$plan")
  }

  test("filters on derived geo columns push down to the scan") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .where(col("l_orderkey") === 1L)
    val plan = planOf(li)
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]"),
      s"pushdown missing:\n${plan.split("\n").filter(_.contains("PushedFilters")).mkString}")
  }

  test("cell-clustered write: disjoint per-file cell ranges + pushed range filter") {
    val sp = spark; import sp.implicits._
    val pts = (0L until 20000L).map { i =>
      val h = graft.data.DedupHash.mix(i)
      (i, (h % 36000L).toDouble / 100.0 - 180.0,
        ((h >>> 17) % 17000L).toDouble / 100.0 - 85.0)
    }.toDF("id", "lon", "lat")
    val dir = java.nio.file.Files.createTempDirectory("graft-clustered").toString
    val cellCol = GeoEngine.writeCellClustered(pts, level = 8, s"$dir/pts",
      numFiles = 8)
    val back = spark.read.parquet(s"$dir/pts")
    assert(back.count() == 20000)
    // the pruning precondition: every file owns a disjoint cell range
    val ranges = back
      .select(input_file_name().as("f"), col(cellCol))
      .groupBy("f").agg(min(cellCol).as("lo"), max(cellCol).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2")
    }
    // a cell-range predicate reaches the scan as a pushed filter
    val mid = ranges(ranges.length / 2)
    val q = back.where(col(cellCol).between(mid._1, mid._2))
    val plan = planOf(q)
    assert(plan.contains("GreaterThanOrEqual(cell,") &&
      plan.contains("LessThanOrEqual(cell,"),
      s"cell range not pushed:\n${plan.split("\n").filter(_.contains("PushedFilters")).mkString}")
    assert(q.count() > 0)
  }
}
