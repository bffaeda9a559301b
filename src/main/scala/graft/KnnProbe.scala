package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.engine.GeoEngine
import graft.geo.expr.geo

object KnnProbe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .appName("knnprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = t("corpus read+geo") {
      val d = GeoEngine.withGeoTag(spark.read.parquet("/tmp/graft_bench_corpus_1000000"))
        .select(col("doc_id"), col("lon"), col("lat")).cache()
      d.count(); d
    }
    val queries = docs.where(col("doc_id") < f"doc${2000}%012d")
      .select(col("doc_id").as("query_id"), col("lon"), col("lat"))
    val data = docs.select(col("doc_id").as("data_id"), col("lon"), col("lat"))

    // replicate knnJoin internals with per-pass timing
    val level = 12; val k = 10; val ring = 1
    val fineData = t("tile data") {
      val fd = GeoEngine.tiled(data, level)
        .select(col("data_id"), col("lon").as("d_lon"), col("lat").as("d_lat"),
          col("cell").as("fine_cell")).persist()
      fd.count(); fd
    }
    var pending = queries
    var total = 0L
    for (lp <- (level to 2 by -3)) {
      val np = t(s"pass L$lp isEmpty") { pending.isEmpty }
      if (!np) {
        val dataAtLp =
          if (lp == level) fineData.withColumnRenamed("fine_cell", "cand_cell")
          else fineData.withColumn("cand_cell", geo.cellParent(col("fine_cell"), lp)).drop("fine_cell")
        val q = GeoEngine.tiled(pending, lp)
          .withColumn("cand_cell", explode(geo.cellNeighbors(col("cell"), ring)))
          .select(col("query_id"), col("lon").as("q_lon"), col("lat").as("q_lat"), col("cand_cell"))
        val cand = t(s"pass L$lp cand+cache") {
          val c = GeoEngine.geodesicTopK(broadcast(q).join(dataAtLp, "cand_cell"), k, "query_id", "data_id").cache()
          c.count(); c
        }
        val safe = GeoEngine.ringSafeRadius(lp, ring)
        val ok = cand.groupBy("query_id")
          .agg(count(lit(1)).as("n_cand"), max("dist").as("kth_dist"))
          .where(col("n_cand") === k && col("kth_dist") <= safe)
          .select("query_id")
        val nOk = t(s"pass L$lp settle") {
          cand.join(broadcast(ok), "query_id").count()
        }
        total += nOk
        pending = t(s"pass L$lp anti+ckpt") {
          val pp = pending.join(broadcast(ok), Seq("query_id"), "left_anti").localCheckpoint(true)
          pp
        }
        println(s"PROBE pass L$lp settled rows=$nOk pendingLeft=${pending.count()}")
      }
    }
    val nPend = pending.count()
    println(s"PROBE fallback queries=$nPend")
    if (nPend > 0) t("brute fallback") {
      println("rows=" + GeoEngine.knnBruteForce(pending, data, k, "query_id", "data_id").count())
    }
    spark.stop()
  }
}
