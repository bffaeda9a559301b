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
    * One shuffle on bucket; recall rises with `bits` low and probes high. */
  def lshTopK(queries: DataFrame, data: DataFrame, k: Int, bits: Int = 12,
              queryId: String = "query_id", dataId: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val d = data.select(col(dataId), col(vecCol).as("d_vec"),
      dataops.srpSignature(col(vecCol), bits).as("bucket"))
    val probes = array(
      col("sig") +: (0 until bits).map(b =>
        col("sig").bitwiseXOR(lit(1L << b))): _*)
    val q = queries.select(col(queryId), col(vecCol).as("q_vec"),
      dataops.srpSignature(col(vecCol), bits).as("sig"))
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

  /** IVF-style coarse index: pick `nCentroids` deterministic sample
    * vectors as centroids, assign every vector to its nearest centroid
    * (broadcast), and answer queries by probing the `nProbe` nearest
    * centroid lists.  The standard billion-scale layout: the data shuffle
    * is one partition-by-centroid; queries touch nProbe/nCentroids of the
    * corpus. */
  def ivfTopK(queries: DataFrame, data: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              queryId: String = "query_id", dataId: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    // deterministic centroids: the nCentroids lowest ids (stable, cheap;
    // k-means refinement is an optional offline step)
    val centroids = broadcast(
      data.orderBy(col(dataId).asc).limit(nCentroids)
        .select(col(dataId).as("centroid_id"), col(vecCol).as("c_vec")))
    def nearestCentroids(df: DataFrame, vec: String, id: String, n: Int,
                         outCol: String): DataFrame = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("c_sim").desc, col("centroid_id").asc)
      df.crossJoin(centroids)
        .withColumn("c_sim", dataops.cosineSim(col(vec), col("c_vec")))
        .withColumn("c_rank", row_number().over(w))
        .where(col("c_rank") <= n)
        .drop("c_vec", "c_sim", "c_rank")
        .withColumnRenamed("centroid_id", outCol)
    }
    val indexed = nearestCentroids(
      data.select(col(dataId), col(vecCol).as("d_vec")), "d_vec", dataId,
      1, "list_id")
    val probed = nearestCentroids(
      queries.select(col(queryId), col(vecCol).as("q_vec")), "q_vec", queryId,
      nProbe, "list_id")
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(dataId).asc)
    probed.join(indexed, "list_id")
      .withColumn("cosine", dataops.cosineSim(col("q_vec"), col("d_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(dataId), col("cosine"), col("rank"))
  }
}
