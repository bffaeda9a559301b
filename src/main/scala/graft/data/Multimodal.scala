package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media ride as opaque `binary` columns with a typed metadata struct —
  * the Spark-side contract (schema, batching, partition sizing) is real
  * and tested; the actual codec calls are STUBBED behind
  * [[MediaCodec.decodeStub]] (no image/audio libraries in this container)
  * with a deterministic fake that parses the synthetic header, so the
  * pipeline shape is exercised end-to-end.  On a real cluster, replace
  * the stub body with the JNI/library call — every other line stays.
  *
  * Scale notes: media rows are orders of magnitude wider than text rows,
  * so the repartition step targets a byte budget per partition (not a row
  * count), and decode runs per-partition (amortized codec init). */
object Multimodal {

  final case class MediaMeta(kind: String, widthHint: Int, heightHint: Int,
                             sampleRateHint: Int)
  final case class MediaRow(media_id: String, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: String, kind: String, width: Int,
                                 height: Int, nBytes: Long, checksum: Long)

  /** Deterministic synthetic media table: a fake header (magic, width,
    * height) + payload bytes derived from the id. */
  def synthesize(spark: SparkSession, n: Long, parts: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map { id =>
      val h = DedupHash.mix(id)
      val w = 64 + (h & 0x3ff).toInt
      val ht = 64 + ((h >>> 10) & 0x3ff).toInt
      val payloadLen = 128 + ((h >>> 20) & 0xfff).toInt
      val bytes = new Array[Byte](12 + payloadLen)
      // fake header: "GIMG" + width + height (big-endian)
      bytes(0) = 'G'; bytes(1) = 'I'; bytes(2) = 'M'; bytes(3) = 'G'
      writeInt(bytes, 4, w); writeInt(bytes, 8, ht)
      var i = 12
      while (i < bytes.length) {
        bytes(i) = (DedupHash.mix(id * 131 + i) & 0xff).toByte
        i += 1
      }
      MediaRow(f"media$id%010d", bytes, MediaMeta("image", w, ht, 0))
    }
  }

  private def writeInt(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = (v >>> 24).toByte; b(at + 1) = (v >>> 16).toByte
    b(at + 2) = (v >>> 8).toByte; b(at + 3) = v.toByte
  }

  /** Repartition a media table to roughly `targetBytes` per partition
    * using the actual binary sizes — the knob that keeps decode tasks
    * within executor memory at 100 TB. */
  def repartitionByBytes(media: DataFrame, targetBytes: Long,
                         contentCol: String = "content"): DataFrame = {
    val row = media.agg(
      sum(length(col(contentCol)).cast("long")).as("total")).head
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val parts = math.max(1, math.min(200000, (total / math.max(1L, targetBytes)) + 1)).toInt
    media.repartition(parts)
  }

  /** Decode + feature-extract, batched per partition (codec init is
    * amortized across the partition like a real decoder pool would be). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: initialize the codec once per partition here
      it.map(r => MediaCodec.decodeStub(r))
    }
  }
}

object MediaCodec {
  /** STUB — deterministic fake decode.
    *
    * A real deployment replaces this body with the actual image/audio
    * decode (e.g. TwelveMonkeys/JavaCV); the container has no codec
    * libraries, so this parses the synthetic "GIMG" header and checksums
    * the payload, keeping the distributed plumbing (schema, batching,
    * failure surface) identical to production. */
  def decodeStub(r: Multimodal.MediaRow): Multimodal.MediaFeatures = {
    val b = r.content
    val valid = b.length >= 12 && b(0) == 'G' && b(1) == 'I' && b(2) == 'M' && b(3) == 'G'
    val w = if (valid) readInt(b, 4) else -1
    val h = if (valid) readInt(b, 8) else -1
    var cs = DedupHash.FnvOffset
    var i = 12
    while (i < b.length) { cs = (cs ^ (b(i) & 0xffL)) * DedupHash.FnvPrime; i += 1 }
    Multimodal.MediaFeatures(r.media_id, r.meta.kind, w, h, b.length.toLong, cs)
  }

  private def readInt(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 24) | ((b(at + 1) & 0xff) << 16) |
      ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
}
