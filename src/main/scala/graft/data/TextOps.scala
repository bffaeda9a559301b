package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, n-gram language ID, fingerprinting.  Everything is built-in
  * Catalyst functions (codegen'd, shuffle-free projections) except the
  * fingerprint (custom expression in [[dataops]]). */
object TextOps {

  /** Whitespace token count.  Empty / whitespace-only / NULL text counts
    * 0 tokens — split("") yields [""] (a phantom token) and size(NULL) is
    * -1 under Spark's legacy default, either of which would corrupt
    * downstream token budgets (a -1 decrements packSequences' running
    * prefix sum and shifts every later document's sequence assignment). */
  def tokenCountWs(text: Column): Column =
    when(text.isNull || trim(text) === "", 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** PII-style scrubbing: replace e-mail addresses, simple phone
    * numbers and URLs with typed placeholders — the standard
    * training-corpus redaction stage.  Pure codegen'd regexp_replace
    * chain (patterns restricted to the regex subset Java and RE2 agree
    * on, so the DuckDB oracle replays them identically). */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>")
    val url = regexp_replace(email,
      "https?://[A-Za-z0-9./_%+-]+", "<URL>")
    regexp_replace(url,
      "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]", "<PHONE>")
  }

  /** BPE-ish sub-word token count: runs of letters, runs of digits, and
    * single punctuation marks each count as one token (the usual
    * pre-tokenizer granularity; a trained BPE would split further by a
    * roughly constant factor). */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality heuristics struct: n_chars, n_tokens, punct ratio, stopword
    * ratio, mean token length — the standard cheap web-text filters. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nTokens = tokenCountWs(text)
    val nPunct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val nStop = stopwordHits(text, stopwordsEn)
    val meanTokLen = (length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(nTokens, lit(1)).cast("double"))
    struct(
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      (nPunct.cast("double") / greatest(nChars, lit(1)).cast("double")).as("punct_ratio"),
      (nStop.cast("double") / greatest(nTokens, lit(1)).cast("double")).as("stopword_ratio"),
      meanTokLen.as("mean_token_len"))
  }

  /** Case-insensitive whole-word hit count for a fixed word list. */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val pattern = "(?i)\\b(" + words.mkString("|") + ")\\b"
    size(regexp_extract_all(text, lit(pattern), lit(0)))
  }

  // Top-frequency function words per language — the standard cheap
  // language-ID signal (stopword profiles).
  val stopwordsEn = Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "was")
  val stopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von")
  val stopwordsFr = Seq("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "des")
  val stopwordsEs = Seq("el", "la", "los", "las", "es", "una", "para", "que", "con", "por")

  /** Language guess from stopword-profile hit counts; deterministic
    * tie-break by profile order (en > de > fr > es > unknown). */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, stopwordsEn)
    val de = stopwordHits(text, stopwordsDe)
    val fr = stopwordHits(text, stopwordsFr)
    val es = stopwordHits(text, stopwordsEs)
    val top = greatest(en, de, fr, es)
    when(top === 0, lit("und"))
      .when(en === top, lit("en"))
      .when(de === top, lit("de"))
      .when(fr === top, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Gopher-style repetition signals (struct of 9 ints — totals,
    * distinct counts and top-gram frequency for words / bigrams /
    * trigrams): the standard "remove documents that repeat themselves"
    * corpus filters.  Single-pass custom expression; derive the filter
    * fractions as e.g. `1 - distinct_words/words` (duplicate-word
    * fraction) or `top_bigram/bigrams` (top-bigram fraction). */
  def repetitionStats(text: Column): Column = dataops.repetitionStats(text)

  /** Duplicate-gram and top-gram filter fractions (doubles in [0,1])
    * derived from [[repetitionStats]] — the thresholdable form of the
    * Gopher repetition rules. */
  def repetitionFractions(text: Column): Column = {
    val r = repetitionStats(text)
    def frac(num: Column, den: Column): Column =
      num.cast("double") / greatest(den, lit(1)).cast("double")
    struct(
      (lit(1.0) - frac(r.getField("distinct_words"), r.getField("words")))
        .as("dup_word_frac"),
      (lit(1.0) - frac(r.getField("distinct_bigrams"), r.getField("bigrams")))
        .as("dup_bigram_frac"),
      (lit(1.0) - frac(r.getField("distinct_trigrams"), r.getField("trigrams")))
        .as("dup_trigram_frac"),
      frac(r.getField("top_word"), r.getField("words")).as("top_word_frac"),
      frac(r.getField("top_bigram"), r.getField("bigrams")).as("top_bigram_frac"),
      frac(r.getField("top_trigram"), r.getField("trigrams")).as("top_trigram_frac"))
  }

  /** Deterministic content-addressed train/valid/test assignment: the
    * document fingerprint bucketed into 100 cells, split named by the
    * first cumulative upper bound at or above the bucket.  Content
    * addressing (not doc_id) keeps exact duplicates in the SAME split —
    * the property that prevents train/eval leakage through dup pairs.
    * Pure projection: no shuffle, stable under repartitioning and
    * re-runs. */
  def splitAssign(text: Column,
                  bounds: Seq[(String, Int)] =
                    Seq("train" -> 90, "valid" -> 95, "test" -> 100)): Column = {
    require(bounds.nonEmpty && bounds.last._2 == 100 &&
      bounds.map(_._2) == bounds.map(_._2).sorted,
      "bounds must be ascending cumulative percentages ending at 100")
    val bucket = pmod(dataops.fingerprint(text), lit(100L))
    bounds.init.foldRight(lit(bounds.last._1): Column) { case ((name, hi), rest) =>
      when(bucket < hi, lit(name)).otherwise(rest)
    }
  }

  /** Standard projection bundle over a (id, text) table. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens_ws", tokenCountWs(col(textCol)))
      .withColumn("n_tokens_bpe", tokenCountBpe(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_guess", langId(col(textCol)))
      .withColumn("fingerprint", dataops.fingerprint(col(textCol)))
}
