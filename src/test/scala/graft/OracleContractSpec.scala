package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract surface: the query census and exactly which
  * queries carry DuckDB oracles.  The oracle builders for the pinned
  * sweeps run REAL work here (registry scan, grid load, JVM-direct
  * evaluation) — so an asset that silently went missing, or a guarded
  * builder quietly degrading an entry to rows-only, fails THIS test
  * instead of shrinking hash coverage invisibly (Verify's resilient
  * dump must never be the only thing noticing). */
class OracleContractSpec extends AnyFunSuite {

  test("oracle coverage is pinned: 95 of 107 queries hash-verified") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
    assert(q.size == 107, s"query census moved: ${q.size} (update this pin)")
    assert(o.size == 95,
      s"oracled count moved: ${o.size} — either update this pin for a new" +
        " oracle, or a guarded builder silently degraded (check stderr)")
    // the rows-only tail, each with its justification in the query doc:
    // probabilistic LSH banding (minhash/simhash/embedding), driver-side
    // k-means (ivf/pq), trained BPE merges, codec output (media_*), the
    // near-dup-dependent pipeline census, and the Douglas-Peucker split
    // (its DuckDB lambda formulation segfaults duckdb 1.0 — see the
    // frechet oracle for the recursion pattern that IS safe)
    val rowsOnly = Set("q_ann_ivf", "q_ann_pq", "q_bpe_tokens",
      "q_corpus_pipeline", "q_dedup_embedding", "q_dedup_minhash",
      "q_dedup_simhash", "q_media_features", "q_media_jdk",
      "q_media_neardup", "q_media_probe", "q_simplify")
    assert((q -- o) == rowsOnly,
      s"rows-only set drifted: ${(q -- o).toSeq.sorted}")
    // every oracle is non-trivial SQL (no sentinel leaked through)
    assert(SparkEntry.oracleSql.values.forall(s =>
      s.length > 20 && s.toUpperCase.contains("SELECT")))
  }
}
