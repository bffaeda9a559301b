package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale measurement for the corpus-assembly ops (paragraph
  * dedup, stratified sampling, sequence packing) on a synthetic N-doc
  * corpus — NOT part of the driver's headline Bench (whose job set is
  * held stable for round-over-round comparison); results are recorded
  * in BENCH.md.
  *
  * Corpus shape: every doc has a boilerplate header paragraph shared by
  * n/1000 docs (the C4 boilerplate situation), a unique body paragraph
  * with 1..37 filler tokens, and a unique trailer — so paragraph dedup
  * strips ~1/3 of paragraphs, sampling strata are 5 synthetic langs,
  * and packing sees realistic token-count variance.
  */
object CorpusBench {
  def synth(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws("\n",
        concat(lit("shared boilerplate header variant "), pmod(col("id"), lit(1000))),
        concat(trim(repeat(lit("tok "), (pmod(col("id"), lit(37)) + 1).cast("int"))),
          lit(" body "), col("id")),
        concat(lit("trailer of document "), col("id"))).as("text"),
      concat(lit("l"), pmod(col("id"), lit(5))).as("lang"))

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = synth(spark, n)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"$label","sec":$s%.2f,"rows":$rows,"rows_per_s":${(rows / s).toLong}}""")
    }

    time("paragraph_dedup")(
      graft.data.Corpus.paragraphDedup(docs).count())
    time("stratified_sample")(
      graft.data.Corpus.stratifiedSample(docs, "lang", n = 100000).count())
    time("pack_sequences")(
      graft.data.Corpus.packSequences(docs, budget = 2048).count())
    spark.stop()
  }
}
