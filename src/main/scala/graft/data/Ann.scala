package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an embedding column.
  *
  * Baseline: broadcast brute-force cosine top-k (exact; O(Q x N) but one
  * scan of N, no shuffle of the data side).  Scale path: SRP-LSH with
  * multi-probe (query joins its bucket plus all 1-bit-flip neighbors) or
  * an IVF-style coarse quantizer built from a deterministic sample. */
object Ann {

  /** Exact top-k by cosine: queries broadcast against the data scan when
    * queries are the small side (typical); ties break on data id so the
    * result is partition independent. */
  def bruteForceTopK(queries: DataFrame, data: DataFrame, k: Int,
                     queryId: String = "query_id", dataId: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(queryId), col(vecCol).as("q_vec")))
    val d = data.select(col(dataId), col(vecCol).as("d_vec"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(dataId).asc)
    d.crossJoin(q)
      .withColumn("cosine", dataops.cosineSim(col("q_vec"), col("d_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(dataId), col("cosine"), col("rank"))
  }

  /** SRP-LSH approximate top-k with multi-probe: each query probes its own
    * bucket and every bucket at hamming distance 1 in signature space
    * (bits+1 probes), then exact cosine re-ranks the candidates.
    * One shuffle on bucket; recall rises with `bits` low and probes high.
    * `bits = 0` derives the width from the corpus size ([[LshSizing]], one
    * count job) so expected bucket occupancy — and with it the per-query
    * candidate set — stays constant as the corpus grows. */
  def lshTopK(queries: DataFrame, data: DataFrame, k: Int, bits: Int = 0,
              queryId: String = "query_id", dataId: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val bitsEff = if (bits > 0) bits else LshSizing.srpBits(data.count())
    val d = data.select(col(dataId), col(vecCol).as("d_vec"),
      dataops.srpSignature(col(vecCol), bitsEff).as("bucket"))
    val probes = array(
      col("sig") +: (0 until bitsEff).map(b =>
        col("sig").bitwiseXOR(lit(1L << b))): _*)
    val q = queries.select(col(queryId), col(vecCol).as("q_vec"),
      dataops.srpSignature(col(vecCol), bitsEff).as("sig"))
      .withColumn("bucket", explode(probes))
      .drop("sig")
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(dataId).asc)
    q.join(d, "bucket")
      .withColumn("cosine", dataops.cosineSim(col("q_vec"), col("d_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(dataId), col("cosine"), col("rank"))
  }

  /** IVF-style coarse index: `nCentroids` hash-sampled centroid vectors
    * (optionally refined by `refineIters` Lloyd steps), every vector
    * assigned to its nearest list MAP-SIDE by a centroid-matrix
    * expression — no shuffle, no per-row window — and queries probing the
    * `nProbe` nearest lists.  The standard billion-scale layout: the only
    * data movement is the probe equi-join on list_id; queries touch
    * nProbe/nCentroids of the corpus.
    *
    * `refineIters` defaults to 0 because a parallel mean is not bit-for-
    * bit order-stable; turn it on when representative lists matter more
    * than exact replayability. */
  def ivfTopK(queries: DataFrame, data: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4, refineIters: Int = 0,
              queryId: String = "query_id", dataId: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    // deterministic, representative sample: smallest nCentroids by id
    // hash (TakeOrdered — per-partition top-n, no full sort/shuffle)
    var centroids: Array[Array[Float]] = data
      .orderBy(xxhash64(col(dataId)).asc, col(dataId).asc)
      .limit(nCentroids)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(centroids.nonEmpty, "ivfTopK: empty data")
    val dim = centroids.head.length
    // optional Lloyd refinement: one aggregation per iteration (partial
    // means combine map-side); empty lists keep their previous centroid
    var it = 0
    while (it < refineIters) {
      val mean = udaf(new VecMean(dim))
      val next = data
        .withColumn("list_id",
          element_at(dataops.centroidTop(col(vecCol), centroids, 1), 1))
        .groupBy("list_id").agg(mean(col(vecCol)).as("c_vec"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      centroids = Array.tabulate(centroids.length)(i =>
        next.getOrElse(i, centroids(i)))
      it += 1
    }

    val indexed = data
      .select(col(dataId), col(vecCol).as("d_vec"),
        element_at(dataops.centroidTop(col(vecCol), centroids, 1), 1)
          .as("list_id"))
    val probed = queries
      .select(col(queryId), col(vecCol).as("q_vec"),
        explode(dataops.centroidTop(col(vecCol), centroids, nProbe))
          .as("list_id"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(dataId).asc)
    broadcast(probed).join(indexed, "list_id")
      .withColumn("cosine", dataops.cosineSim(col("q_vec"), col("d_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(dataId), col("cosine"), col("rank"))
  }

  /** Element-wise running mean of float vectors (the Lloyd-step reducer);
    * buffer = sums + count in one array so partial aggregation stays a
    * single fixed-width value. */
  private final class VecMean(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Float], Array[Double], Seq[Float]] {
    def zero: Array[Double] = new Array[Double](dim + 1)
    def reduce(b: Array[Double], a: Seq[Float]): Array[Double] = {
      var i = 0
      while (i < dim && i < a.length) { b(i) += a(i); i += 1 }
      b(dim) += 1
      b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i <= dim) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Double]): Seq[Float] =
      if (b(dim) == 0) null
      else (0 until dim).map(i => (b(i) / b(dim)).toFloat)
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
