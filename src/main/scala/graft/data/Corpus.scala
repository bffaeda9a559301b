package graft.data

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Row of the narrow packing projection: range-partition id (stamped at
  * materialization), deterministic shuffle key, integral document id,
  * whitespace token count. */
case class PackTok(pid: Int, key: Long, id: Long, tok: Long)

/** Corpus-assembly operators — the stage between cleaning/dedup and the
  * trainer: paragraph-level exact dedup (the C4/CCNet boilerplate pass),
  * deterministic stratified sampling (domain/language mixing), and
  * token-budget sequence packing (concatenate-and-cut document packing).
  *
  * Scale notes (the 100-TB contract of each op):
  *  - paragraphDedup shuffles paragraph HASHES (64-bit) + owner ids for
  *    the ownership pass; paragraph text travels exactly once, keyed by
  *    (doc, idx), never by content;
  *  - stratifiedSample never sorts a stratum: the per-stratum acceptance
  *    threshold is an exact kth-smallest computed by a partial-aggregable
  *    Aggregator (map-side combine), so a single giant stratum costs one
  *    (stratum, threshold) row through the exchange, not a sorted window;
  *  - packSequences is a textbook two-pass distributed prefix sum: one
  *    range shuffle of (key, id, tok) rows, one driver-side collect of
  *    PER-PARTITION totals (numPartitions rows, not data rows).
  */
object Corpus {

  /** Paragraph-level exact deduplication with document reassembly
    * (C4 / CCNet-style boilerplate removal): split each document into
    * paragraphs, keep every paragraph whose text occurs exactly once in
    * the corpus, and keep the FIRST occurrence (minimum (id, position))
    * of each duplicated paragraph; documents are reassembled in original
    * paragraph order.  Documents whose every paragraph is removed drop
    * out of the result (the C4 empty-document rule).
    *
    * Two logical shuffles: (1) ownership — 64-bit paragraph hashes with
    * (id, idx) owners, aggregated map-side, kept only for DUPLICATED
    * hashes (usually a small fraction, so AQE broadcasts the verdicts
    * and the text side stays map-side); (2) reassembly — surviving
    * paragraphs grouped by document id.
    *
    * Duplicate detection is content-hash-based (xxhash64); at 10^12
    * paragraphs the birthday-bound collision odds are the standard
    * content-hash dedup contract (see Dedup.exact). */
  def paragraphDedup(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val paras = docs
      .select(col(idCol).as("pd_id"),
        posexplode(split(col(textCol), sepRe)).as(Seq("pd_idx", "pd_para")))
      .withColumn("pd_h", xxhash64(col("pd_para")))
    // ownership pass: ids + 64-bit hashes only (text projected away
    // before the exchange); only DUPLICATED hashes survive — usually a
    // small fraction, which AQE turns into a broadcast for the verdict
    // join below, leaving the text-bearing side entirely map-side
    val owners = paras.select(col("pd_id"), col("pd_idx"), col("pd_h"))
      .groupBy("pd_h")
      .agg(min(struct(col("pd_id"), col("pd_idx"))).as("pd_own"),
        count(lit(1)).as("pd_n"))
      .where(col("pd_n") > 1)
      .select(col("pd_h"), col("pd_own"))
    // verdict join directly on the text-bearing frame (one join, not a
    // keep-set join back): a paragraph survives if its hash is unique or
    // it IS the first occurrence.  Empty/whitespace paragraphs are
    // STRUCTURE, not content — a blank line between two paragraphs
    // hash-collides corpus-wide and dedup would delete every document's
    // paragraph breaks except one global first occurrence
    paras.join(owners, Seq("pd_h"), "left")
      .where(col("pd_own").isNull ||
        trim(col("pd_para")) === "" ||
        (col("pd_own.pd_id") === col("pd_id") &&
          col("pd_own.pd_idx") === col("pd_idx")))
      .groupBy("pd_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pd_idx"), col("pd_para")))),
          x => x.getField("pd_para")), sep).as("clean"))
      .select(col("pd_id").as(idCol), col("clean"))
  }

  /** Exact kth-smallest Long with map-side combine (the integral sibling
    * of GeoEngine's chord-prune aggregator, engineered for LARGE k —
    * sample sizes in the 10^5+ range).  A naive keep-the-k-smallest
    * buffer costs O(k) per insert (10M rows x k=100k = 10^12 ops); this
    * buffer appends until 2k values, then sort-prunes to the k smallest
    * and remembers the kth as a skip bound, so inserts are amortized
    * O(log k) and most values are rejected with one comparison.
    *
    * Buffer layout: b(0) = value count n, b(1) = skip bound (MaxValue
    * until the first prune), b(2..n+1) = values.  Order-insensitive,
    * hence partition-count independent.  Returns Long.MaxValue when the
    * group has fewer than k values (then nothing is filtered out). */
  private final class KthSmallestLong(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Long] {
    def zero: Array[Long] = {
      val b = new Array[Long](2 * k + 2)
      b(1) = Long.MaxValue
      b
    }
    /** sort values, keep the k smallest, tighten the skip bound */
    private def prune(b: Array[Long]): Unit = {
      val n = b(0).toInt
      if (n > k) {
        java.util.Arrays.sort(b, 2, n + 2)
        b(0) = k
        b(1) = b(k + 1)
      }
    }
    private def insert(b: Array[Long], v: Long): Unit = {
      if (v < b(1)) {
        val n = b(0).toInt
        b(n + 2) = v
        b(0) = n + 1
        if (n + 1 == 2 * k) prune(b)
      }
    }
    def reduce(b: Array[Long], v: Long): Array[Long] = { insert(b, v); b }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 2; val end = b2(0).toInt + 2
      while (i < end) { insert(b1, b2(i)); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Long = {
      val n = b(0).toInt
      if (n < k) Long.MaxValue
      else { java.util.Arrays.sort(b, 2, n + 2); b(k + 1) }
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** Deterministic stratified sampling: keep exactly `n` documents per
    * stratum (fewer if the stratum is smaller), chosen by smallest
    * content-addressed rank — the FNV fingerprint of (text + " " + id),
    * so membership is a pure function of content, reproducible across
    * runs, partitionings and cluster sizes (the same property as
    * TextOps.splitAssign's split buckets).
    *
    * No stratum is ever sorted: the acceptance threshold per stratum is
    * an exact kth-smallest partial aggregate (map-side combine), then a
    * broadcast join + filter.  A Zipf-skewed stratum (one language = 90%
    * of the web) costs one threshold row, not a window over its rows. */
  def stratifiedSample(docs: DataFrame, stratumCol: String, n: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(n > 0, "sample size must be positive")
    val rk = dataops.fingerprint(
      concat(col(textCol), lit(" "), col(idCol).cast("string")))
    val ranked = docs.withColumn("ss_rank", rk)
    val kthAgg = udaf(new KthSmallestLong(n))
    val thresholds = ranked.groupBy(col(stratumCol).as("ss_stratum"))
      .agg(kthAgg(col("ss_rank")).as("ss_kth"))
    // null-safe equality: a NULL stratum (common in real language-id
    // output) is a legitimate group — plain === would silently drop
    // every such row from the sample
    ranked.join(broadcast(thresholds),
        ranked(stratumCol) <=> col("ss_stratum"))
      .where(col("ss_rank") <= col("ss_kth"))
      .drop("ss_stratum", "ss_kth", "ss_rank")
  }

  /** Corpus-wide hashed n-gram bucket occurrence counts: one partial
    * aggregate (map-side combine bounds every task at `buckets` rows),
    * collected to a driver array for plan-constant scoring tables. */
  private def bucketCounts(df: DataFrame, n: Int, buckets: Int,
                           textCol: String): Array[Long] = {
    val rows = df.select(
        explode(dataops.ngramBuckets(col(textCol), n, buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c")).collect()
    val out = new Array[Long](buckets)
    rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", arXiv:2302.03169): hashed
    * word-n-gram bucket features; per-bucket weight = add-one-smoothed
    * log ratio of target vs raw corpus bucket frequencies.  Weights are
    * INTEGER micro-units (floor(1e6·(ln p̂_b − ln q̂_b) + 0.5)) so document
    * scores are exact integer sums — reproducible across partitionings
    * and replayable by the SQL oracle.
    *
    * Scale shape: each frequency estimate is one partial aggregate over
    * the exploded n-gram buckets (map-side combine collapses every task
    * to ≤ `buckets` rows before the exchange); the returned table is a
    * few KB that rides into the scoring scan as a plan constant. */
  def dsirWeights(raw: DataFrame, target: DataFrame, n: Int = 2,
                  buckets: Int = 4096,
                  textCol: String = "text"): Array[Long] = {
    val p = bucketCounts(target, n, buckets, textCol)
    val q = bucketCounts(raw, n, buckets, textCol)
    val pTot = p.sum.toDouble + buckets
    val qTot = q.sum.toDouble + buckets
    Array.tabulate(buckets) { b =>
      math.round(1e6 *
        (math.log((p(b) + 1) / pTot) - math.log((q(b) + 1) / qTot)))
    }
  }

  /** Per-document DSIR score: exact integer sum of the weight table over
    * the document's (multiplicity-preserving) n-gram buckets — a single
    * codegen expression, no join. */
  def dsirScore(weights: Array[Long], n: Int = 2, buckets: Int = 4096)(
      text: Column): Column =
    dataops.bucketSum(dataops.ngramBuckets(text, n, buckets), weights)

  /** Hashed-bigram language model for perplexity-style quality filtering
    * (the CCNet pipeline's KenLM component — Wenzek et al.,
    * arXiv:1911.00359 — re-expressed with hashed count tables so the
    * model is a pair of plan-constant integer arrays instead of an
    * external LM binary).  Add-one smoothing over the bucket vocabulary:
    * P(w2|w1) ≈ (c(w1w2)+1) / (c(w1)+B), so an unseen bigram scores
    * ln(1/B) — the strongly negative out-of-vocabulary penalty a real LM
    * assigns, NOT zero (a zero-for-unseen table would rank gibberish
    * above fluent reference text, whose true conditional log-probs are
    * negative).  `bi(b)` holds round(1e6·ln(c+1)), `uni(b)` holds
    * round(1e6·ln(c+B)), both integer micro-units. */
  final case class LmModel(buckets: Int, uni: Array[Long], bi: Array[Long])

  /** Train the hashed LM on a reference corpus (the "good text" sample —
    * CCNet uses Wikipedia): two bucket-count partial aggregates, then the
    * integer log tables. */
  def lmTrain(reference: DataFrame, buckets: Int = 65536,
              textCol: String = "text"): LmModel = {
    val cu = bucketCounts(reference, 1, buckets, textCol)
    val cb = bucketCounts(reference, 2, buckets, textCol)
    LmModel(buckets,
      cu.map(c => math.round(1e6 * math.log(c + buckets.toDouble))),
      cb.map(c => math.round(1e6 * math.log(c + 1.0))))
  }

  /** One-pass LM evaluation: struct(lp_e6, n_bi, n_tok) — lp_e6 is the
    * exact integer micro-unit sum over bigrams of
    * ln(count(bigram_i)+1) − ln(count(word_i)+B) (the add-one-smoothed
    * conditional log-probability); callers derive the per-token quality
    * score (perplexity analogue) as −lp_e6 / (1e6 · n_bi) and threshold
    * on it.  A single codegen expression; both tables ride as plan
    * constants — no join, no shuffle. */
  def lmScore(m: LmModel)(text: Column): Column =
    dataops.lmScore(text, m.uni, m.bi, m.buckets)

  /** The document log-probability sum alone (see [[lmScore]]). */
  def lmLogProbSum(m: LmModel)(text: Column): Column =
    lmScore(m)(text).getField("lp_e6")

  /** Gumbel-top-k importance resampling (the paper's sampler): select
    * `k` documents with probability ∝ exp(score/1e6) without
    * replacement, deterministically — the Gumbel noise derives from the
    * content fingerprint, so the selection is a pure function of the
    * corpus (same reproducibility contract as [[stratifiedSample]]).
    * The kth-largest acceptance threshold is an exact partial aggregate;
    * nothing is globally sorted. */
  def dsirResample(raw: DataFrame, target: DataFrame, k: Int, n: Int = 2,
                   buckets: Int = 4096, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(k > 0, "sample size must be positive")
    val w = dsirWeights(raw, target, n, buckets, textCol)
    val score = dsirScore(w, n, buckets)(col(textCol))
    val fp = dataops.fingerprint(concat(col(textCol), lit(" "),
      col(idCol).cast("string")))
    val u = (pmod(fp, lit(1000000000L)).cast("double") + lit(0.5)) / lit(1e9)
    // nano-unit key (clamped to 2^49 so the packed key cannot overflow)
    // with 13 fingerprint tie-break bits: a quantized micro-unit key would
    // tie at the acceptance threshold on large corpora and admit > k rows;
    // a residual tie now needs an exact nano-unit collision AND a 13-bit
    // fingerprint collision — the content-hash-dedup class of odds
    val cont = score.cast("double") + lit(1e6) * -log(-log(u))
    val nano = least(greatest((cont * 1000).cast("long"),
      lit(-(1L << 49))), lit(1L << 49))
    val key = nano * lit(8192L) + pmod(fp, lit(8192L))
    val ranked = raw.withColumn("ds_key", -key)
    val kthAgg = udaf(new KthSmallestLong(k))
    val th = ranked.agg(kthAgg(col("ds_key"))).head.getLong(0)
    ranked.where(col("ds_key") <= th).drop("ds_key")
  }

  /** Token-budget sequence packing (concatenate-and-cut): order the
    * corpus by a deterministic multiplicative-hash shuffle key, lay the
    * token streams end to end, and cut every `budget` tokens; a document
    * belongs to the sequence where it STARTS (documents may run across
    * cuts, the standard packed-pretraining layout).  Output columns:
    * (idCol, seq_id, seq_off, n_tok) with seq_off = the document's token
    * offset inside its sequence.
    *
    * Scale shape — an exact global prefix sum in two passes: one range
    * repartition + in-partition sort of the NARROW (key, id, tok)
    * projection (24 bytes/row — the text column never moves), a driver
    * collect of per-partition token totals (one row per partition), then
    * a map-side pass that adds the broadcast partition offsets.  The
    * sorted projection is localCheckpoint-ed so both passes read the
    * same materialized partitions (assignment correctness must not
    * depend on shuffle-boundary replay).  mapPartitions is justified
    * here: a running sum over a partition's rows is genuinely
    * per-partition imperative logic with no declarative equivalent short
    * of a single-partition global window.
    *
    * The assignment is a pure function of the total order (key, id) and
    * the token counts — independent of `numParts` and cluster size
    * (asserted in DataOpsSpec). */
  def packSequences(docs: DataFrame, budget: Long, idCol: String = "doc_id",
                    textCol: String = "text", numParts: Int = 0,
                    tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                      TextOps.tokenCountWs): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    // numeric ids keep the exact historical key derivation (the
    // q_pack_sequences oracle replays it); string ids — the production
    // norm — get a content-addressed 64-bit stand-in.  ANSI mode would
    // otherwise throw CAST_INVALID_INPUT on e.g. "doc000000000042".
    val idNum = docs.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => col(idCol).cast("long")
      case _ => xxhash64(col(idCol))
    }
    val keyed = docs.select(
        // mod-first keeps the product under 2^47 (ANSI forbids wrap; a
        // hashed 64-bit id times 48271 overflows); for the small numeric
        // ids of the oracle tables the value is identical by the modular
        // identity pmod(a*b, M) == pmod(pmod(a, M)*b, M)
        pmod(pmod(idNum, lit(2147483647L)) * lit(48271L),
          lit(2147483647L)).as("key"),
        idNum.as("id"),
        tokenCount(col(textCol)).cast("long").as("tok"))
    // stamp the range-partition id as DATA at materialization time: a
    // downstream coalesce() merges tasks, making TaskContext partition
    // ids unusable — the row's own pid survives any re-tasking
    val sorted: Dataset[PackTok] = keyed
      .repartitionByRange(p, col("key"), col("id"))
      .sortWithinPartitions("key", "id")
      .select(spark_partition_id().as("pid"), col("key"), col("id"), col("tok"))
      .as[PackTok]
      .localCheckpoint(true)
    // pass 1: per-partition totals -> driver (numPartitions rows, not
    // data rows); plain partial aggregation, combined map-side
    val totals = sorted.groupBy("pid").agg(sum("tok").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // range partitions are ordered by key, so pid order == stream order
    val offsets = {
      val pids = totals.keys.toArray.sorted
      var acc = 0L
      pids.map { pid => val o = (pid, acc); acc += totals(pid); o }.toMap
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    val b = budget
    // pass 2: running sum per SOURCE partition, reset on pid change (a
    // coalesced task sees several source partitions' rows, each block
    // contiguous and in order)
    sorted.mapPartitions { it =>
      var curPid = -1
      var cum = 0L
      it.map { r =>
        if (r.pid != curPid) { curPid = r.pid; cum = bOff.value(curPid) }
        val start = cum
        cum += r.tok
        (r.id, start / b, start % b, r.tok)
      }
    }.toDF(idCol, "seq_id", "seq_off", "n_tok")
  }
}
