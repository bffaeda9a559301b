package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.geo.engine.GeoEngine

/** Two-cluster-size scaling evidence (BASELINE.md protocol): run the same
  * tile-assignment + PIP-join job on the same materialized corpus at
  * local[N] and local[4N], assert bit-for-bit equal outputs (canonical
  * order-insensitive checksums over the tile assignments and join rows),
  * and report throughput at both plus efficiency = T(4N) / (4 x T(N)).
  * Appends a markdown table to BASELINE.md.
  *
  * Usage: sbt "runMain graft.ScalingBench [nDocs] [N]"  (default 1M, N=8)
  */
object ScalingBench {

  final case class RunStats(cpus: Int, wallSec: Double, tileAssignments: Long,
                            pipRows: Long, tileChecksum: BigDecimal,
                            pipChecksum: BigDecimal) {
    def assignmentsPerSec: Double = tileAssignments / wallSec
    def pipRowsPerSec: Double = pipRows / wallSec
  }

  def runAt(cpus: Int, corpusPath: String): RunStats = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(corpusPath)
      val geoDocs = GeoEngine.withGeoTag(docs)
      val t0 = System.nanoTime()
      val tiled = GeoEngine.tiled(geoDocs, 12).select("doc_id", "cell")
      val tileN = tiled.count()
      val tileCk = GeoEngine.canonicalChecksum(tiled, Seq("doc_id", "cell"))
      val pip = GeoEngine.pipJoin(spark, geoDocs, Bench.benchPolys)
        .select("doc_id", "poly_id")
      val pipN = pip.count()
      val pipCk = GeoEngine.canonicalChecksum(pip, Seq("doc_id", "poly_id"))
      val wall = (System.nanoTime() - t0) / 1e9
      RunStats(cpus, wall, tileN, pipN, tileCk, pipCk)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val baseN = if (args.length > 1) args(1).toInt else 8
    val corpusPath = s"/tmp/graft_bench_corpus_$nDocs"

    // materialize once with a neutral session
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      val s = SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      Bench.materializeCorpus(s, nDocs, corpusPath)
      s.stop()
    }

    // warm JVM/JIT once at small scale so neither timed run pays compile cost
    runAt(baseN, corpusPath)

    val small = runAt(baseN, corpusPath)
    val big = runAt(baseN * 4, corpusPath)

    require(small.tileAssignments == big.tileAssignments &&
      small.tileChecksum == big.tileChecksum,
      "tile assignments differ between parallelism levels!")
    require(small.pipRows == big.pipRows && small.pipChecksum == big.pipChecksum,
      "PIP join rows differ between parallelism levels!")

    val eff = (big.tileAssignments + big.pipRows) / big.wallSec /
      (4.0 * (small.tileAssignments + small.pipRows) / small.wallSec)

    val stamp = java.time.Instant.now().toString
    val table =
      s"""
         |## Scaling run $stamp — $nDocs docs, local[$baseN] vs local[${baseN * 4}]
         |
         || parallelism | wall s | tile assignments | tile assign/s | PIP join rows | PIP rows/s |
         ||---|---|---|---|---|---|
         || local[$baseN] | ${f"${small.wallSec}%.2f"} | ${small.tileAssignments} | ${small.assignmentsPerSec.toLong} | ${small.pipRows} | ${small.pipRowsPerSec.toLong} |
         || local[${baseN * 4}] | ${f"${big.wallSec}%.2f"} | ${big.tileAssignments} | ${big.assignmentsPerSec.toLong} | ${big.pipRows} | ${big.pipRowsPerSec.toLong} |
         |
         |Bit-for-bit: tile checksum ${small.tileChecksum == big.tileChecksum},
         |PIP checksum ${small.pipChecksum == big.pipChecksum} (order-insensitive
         |xxhash64 sums equal across parallelism levels).
         |**Scaling efficiency (throughput@4N / (4 x throughput@N)) = ${f"$eff%.3f"}**
         |(target >= 0.8; single-host caveat: local[8] vs local[32] share memory
         |bandwidth, so this under-states multi-node scaling).
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("BASELINE.md"),
      table.getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
    println(table)
    println(s"""{"metric":"scaling_efficiency","value":${f"$eff%.4f"},"unit":"ratio","small_cpus":$baseN,"big_cpus":${baseN * 4},"docs":$nDocs}""")
  }
}
