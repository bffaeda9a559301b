package graft.data

/** Corpus-size-derived LSH parameters with a logged sizing decision.
  *
  * Fixed LSH constants are a scale bug: 12 bits = 4,096 buckets keeps
  * bucket self-joins quadratic at 10^9 vectors, while blindly raising bits
  * destroys recall (per-bit SRP collision probability < 1).  The sizing
  * here bounds BOTH failure modes:
  *
  *  - `srpBits` grows with the corpus so expected bucket occupancy stays
  *    near a constant (`targetBucket`), keeping the per-bucket pair
  *    explosion O(targetBucket^2) however large the corpus;
  *  - `srpTables` compensates the per-table recall loss with independent
  *    hyperplane families: detect probability 1-(1-p^bits)^tables >= the
  *    recall target, where p = 1 - acos(tau)/pi is the classic SRP
  *    collision probability at cosine threshold tau (Charikar 2002);
  *  - `bucketCap` is a skew guard sized as a multiple of the *expected*
  *    occupancy, so it only drops pathological hot buckets (near-constant
  *    embedding regions), never healthy ones.
  *
  * Every decision is logged so a 100-TB run leaves an audit trail of what
  * was sized and what a cap may silently drop.
  */
object LshSizing {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Signature width so that expected SRP bucket occupancy n / 2^bits is
    * at most `targetBucket`. */
  def srpBits(corpusSize: Long, targetBucket: Long = 256,
              minBits: Int = 6, maxBits: Int = 24): Int = {
    require(corpusSize > 0, "corpus size must be known (or pass bits explicitly)")
    val ideal = math.ceil(
      math.log(corpusSize.toDouble / targetBucket) / math.log(2.0)).toInt
    val b = math.min(maxBits, math.max(minBits, ideal))
    log.info(f"LSH sizing: corpus=$corpusSize targetBucket=$targetBucket -> " +
      f"bits=$b (expected occupancy ${corpusSize / math.pow(2.0, b)}%.1f)")
    b
  }

  /** Per-hyperplane collision probability of two vectors at cosine `tau`
    * (Charikar 2002: 1 - theta/pi). */
  def srpCollisionProb(tau: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, tau))) / math.Pi

  /** Independent tables needed for detection probability >= `recall` of a
    * pair at cosine `tau` under `bits`-wide signatures. */
  def srpTables(tau: Double, bits: Int, recall: Double = 0.9,
                maxTables: Int = 32): Int = {
    val p = math.pow(srpCollisionProb(tau), bits)
    val t =
      if (p >= 1.0 - 1e-12) 1
      else {
        val ideal = math.ceil(math.log1p(-recall) / math.log1p(-p)).toInt
        math.min(maxTables, math.max(1, ideal))
      }
    val achieved = 1.0 - math.pow(1.0 - p, t)
    log.info(f"LSH sizing: tau=$tau bits=$bits perTableHit=$p%.4f -> " +
      f"tables=$t (detect prob $achieved%.3f vs target $recall)" +
      (if (achieved < recall) " [CAPPED below target by maxTables]" else ""))
    t
  }

  /** Skew-guard bucket cap: `skewFactor` times the expected occupancy
    * (floor 4096 so small corpora are never capped). */
  def bucketCap(corpusSize: Long, bits: Int, skewFactor: Int = 64): Int = {
    val expected = corpusSize.toDouble / math.pow(2.0, bits)
    val cap = math.max(4096.0, skewFactor * expected).toInt
    log.info(s"LSH sizing: bucket cap $cap (${skewFactor}x expected " +
      f"occupancy $expected%.1f; buckets above it are dropped as degenerate)")
    cap
  }
}
