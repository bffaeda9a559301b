package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media ride as opaque `binary` columns with a typed metadata struct.
  * Decode is REAL for every container the JVM can parse without any
  * EXTERNAL codec library:
  *
  *  - pure-Scala readers for binary Netpbm (P5 grayscale / P6 RGB, the
  *    public netpbm spec) and RIFF/WAVE PCM16 — the formats we also
  *    synthesize deterministically;
  *  - the JDK's own platform codecs (`javax.imageio` from java.desktop,
  *    `javax.sound.sampled` — part of the JDK, not a dependency) for
  *    JPEG / PNG / GIF / BMP / TIFF images and AIFF / AU audio, run
  *    headless with the ImageIO disk cache disabled so executors never
  *    touch local tmp.
  *
  * Resize (box-average resample), perceptual average-hash and frame
  * sampling over concatenated-Netpbm streams (a valid multi-frame netpbm
  * file) run on the decoded pixels regardless of source container.
  * MP4 and WebP get TYPED metadata probes (width/height/duration read
  * from the public container headers — ISO BMFF box walk, VP8/VP8L/VP8X
  * frame tags) without any codec; truly unknown containers fall back to
  * a documented metadata-only path ([[MediaCodec.decode]] kind =
  * "unsupported"); on a real cluster that branch is where the
  * JNI/library call goes — every other line stays.
  *
  * Scale notes: media rows are orders of magnitude wider than text rows,
  * so the repartition step targets a byte budget per partition (not a row
  * count), and decode runs per-partition (amortized codec init). */
object Multimodal {

  final case class MediaMeta(kind: String, widthHint: Int, heightHint: Int,
                             sampleRateHint: Int)
  final case class MediaRow(media_id: String, content: Array[Byte], meta: MediaMeta)

  /** Unified features across modalities: images fill width/height/channels
    * and ahash; audio fills sampleRate/durationMs; both fill nBytes,
    * meanLevel (mean luma 0-255 or mean |PCM16| amplitude) and a payload
    * checksum. Unknown containers fill only nBytes + checksum. */
  final case class MediaFeatures(media_id: String, kind: String, width: Int,
                                 height: Int, channels: Int, sampleRate: Int,
                                 durationMs: Long, nBytes: Long,
                                 meanLevel: Double, ahash: Long, checksum: Long)

  /** Deterministic synthetic media table cycling through the three real
    * container formats: P5 PGM (id%3==0), P6 PPM (id%3==1), WAV PCM16
    * (id%3==2). Bytes are fully derived from the id. */
  def synthesize(spark: SparkSession, n: Long, parts: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map { id =>
      val h = DedupHash.mix(id)
      (id % 3) match {
        case 0 =>
          val w = 16 + (h & 63).toInt; val ht = 16 + ((h >>> 6) & 63).toInt
          MediaRow(f"media$id%010d", synthPgm(id, w, ht), MediaMeta("image", w, ht, 0))
        case 1 =>
          val w = 16 + (h & 63).toInt; val ht = 16 + ((h >>> 6) & 63).toInt
          MediaRow(f"media$id%010d", synthPpm(id, w, ht), MediaMeta("image", w, ht, 0))
        case _ =>
          val ns = 256 + (h & 1023).toInt
          MediaRow(f"media$id%010d", synthWav(id, 8000, ns), MediaMeta("audio", 0, 0, 8000))
      }
    }
  }

  def synthPgm(seed: Long, w: Int, h: Int): Array[Byte] = {
    val hdr = s"P5\n# synthetic\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + w * h)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    var i = 0
    while (i < w * h) {
      out(hdr.length + i) = (DedupHash.mix(seed * 131 + i) & 0xff).toByte; i += 1
    }
    out
  }

  def synthPpm(seed: Long, w: Int, h: Int): Array[Byte] = {
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](hdr.length + 3 * w * h)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    var i = 0
    while (i < 3 * w * h) {
      out(hdr.length + i) = (DedupHash.mix(seed * 137 + i) & 0xff).toByte; i += 1
    }
    out
  }

  def synthWav(seed: Long, rate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def le32(at: Int, v: Int): Unit = {
      out(at) = v.toByte; out(at + 1) = (v >>> 8).toByte
      out(at + 2) = (v >>> 16).toByte; out(at + 3) = (v >>> 24).toByte
    }
    def le16(at: Int, v: Int): Unit = {
      out(at) = v.toByte; out(at + 1) = (v >>> 8).toByte
    }
    def tag(at: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, out, at, 4)
    }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, rate); le32(28, rate * 2); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < nSamples) {
      le16(44 + 2 * i, (DedupHash.mix(seed * 139 + i) & 0xffff).toInt); i += 1
    }
    out
  }

  /** Deterministic smooth RGB test card (two gradients + a seed-shifted
    * diagonal band): JPEG-friendly, unlike white-noise rasters, so the
    * lossy round-trip keeps the perceptual hash stable. */
  def synthCard(seed: Long, w: Int, h: Int): MediaCodec.Image = {
    require(w >= 4 && h >= 2, s"card needs w>=4, h>=2 (got $w x $h)")
    val off = ((DedupHash.mix(seed) & 0x7fffffffL) % w).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val at = (y * w + x) * 3
        px(at) = (x * 255 / (w - 1)).toByte
        px(at + 1) = (y * 255 / (h - 1)).toByte
        px(at + 2) = (if ((x + y + off) % (w / 2) < w / 4) 200 else 40).toByte
        x += 1
      }
      y += 1
    }
    MediaCodec.Image(w, h, 3, px)
  }

  /** Synthetic media table through the JDK platform codecs: each
    * deterministic test card encoded twice — lossless PNG and lossy JPEG
    * — so decode dispatch, pixel parity and perceptual-hash stability are
    * exercised end-to-end on the executors. */
  def synthesizeJdk(spark: SparkSession, nCards: Long,
                    parts: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, nCards, 1, parts).flatMap { id =>
      val h = DedupHash.mix(id)
      val w = 32 + (h & 31).toInt
      val ht = 24 + ((h >>> 5) & 15).toInt
      val img = synthCard(id, w, ht)
      Seq(
        MediaRow(f"png$id%07d", MediaCodec.encodeImage(img, "png"),
          MediaMeta("image", w, ht, 0)),
        MediaRow(f"jpg$id%07d", MediaCodec.encodeImage(img, "jpg"),
          MediaMeta("image", w, ht, 0)))
    }
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
      // real pipeline: initialize a decoder pool once per partition here
      it.map(r => MediaCodec.decode(r.media_id, r.content))
    }
  }

  /** Perceptual near-duplicate IMAGE pairs: the 64-bit average-hash from
    * [[extractFeatures]] through the generic block-pair hamming LSH
    * ([[Dedup.signatureHammingPairs]] — recall guaranteed to hamming 3
    * by pigeonhole).  Only (media_id, ahash) rows enter the bucket
    * shuffle; image bytes never leave the decode stage.  A re-encoded /
    * lightly-edited copy lands within a few ahash bits of its source
    * (asserted in DataOpsSpec), which is the standard web-scale
    * image-dedup recipe. */
  def nearDupPairs(features: DataFrame, maxHamming: Int = 3,
                   maxBucketSize: Int = 1000): DataFrame =
    Dedup.signatureHammingPairs(
      features.where(col("kind").isin(
        "pgm", "ppm", "jpeg", "png", "gif", "bmp", "tiff"))
        .select(col("media_id"), col("ahash").as("sig")),
      maxHamming, idCol = "media_id", sigCol = "sig",
      maxBucketSize = maxBucketSize)
}

/** Minimal WELL-FORMED container builders for the probe formats — the
  * synthesis side of [[MediaCodec.probeWebp]]/[[MediaCodec.probeMp4]]/
  * [[MediaCodec.probeHeif]]/[[MediaCodec.probeFlac]], used by tests and
  * the q_media_probe driver query to exercise the probes on executors
  * with deterministic bytes. */
object MediaProbes {
  private def be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le24(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte)
  private def asciiB(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** RIFF/WEBP with a VP8X chunk declaring the given canvas. */
  def synthWebpVp8x(w: Int, h: Int): Array[Byte] =
    asciiB("RIFF") ++ Array[Byte](22, 0, 0, 0) ++ asciiB("WEBPVP8X") ++
      Array[Byte](10, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0) ++
      le24(w - 1) ++ le24(h - 1)

  /** ftyp(isom) + moov(mvhd v0 + trak(tkhd 16.16 w x h)). */
  def synthMp4(w: Int, h: Int, durMs: Long): Array[Byte] =
    be32(16) ++ asciiB("ftypisom") ++ be32(0) ++
      be32(68) ++ asciiB("moov") ++
      be32(28) ++ asciiB("mvhd") ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(durMs) ++
      be32(32) ++ asciiB("trak") ++
      be32(24) ++ asciiB("tkhd") ++ be32(0) ++ be32(0) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16)

  /** ftyp(avif) + meta(fullbox)/iprp/ipco/ispe(w x h). */
  def synthAvif(w: Int, h: Int): Array[Byte] =
    be32(16) ++ asciiB("ftypavif") ++ be32(0) ++
      be32(48) ++ asciiB("meta") ++ be32(0) ++
      be32(36) ++ asciiB("iprp") ++
      be32(28) ++ asciiB("ipco") ++
      be32(20) ++ asciiB("ispe") ++ be32(0) ++ be32(w) ++ be32(h)

  /** fLaC magic + STREAMINFO header carrying rate/channels/samples. */
  def synthFlac(sampleRate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    val b = new Array[Byte](26)
    System.arraycopy(asciiB("fLaC"), 0, b, 0, 4)
    b(7) = 34
    b(18) = (sampleRate >> 12).toByte
    b(19) = (sampleRate >> 4).toByte
    b(20) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1)).toByte
    b(21) = ((totalSamples >> 32) & 0xf).toByte
    b(22) = (totalSamples >> 24).toByte
    b(23) = (totalSamples >> 16).toByte
    b(24) = (totalSamples >> 8).toByte
    b(25) = totalSamples.toByte
    b
  }
}

/** Pure-JVM decoders for the container formats that need no codec
  * library. Formats are public specs: Netpbm P5/P6 (netpbm.sourceforge
  * .net/doc/pgm.html, /ppm.html) and RIFF/WAVE PCM, plus the JDK's own
  * platform codecs (javax.imageio / javax.sound.sampled) for
  * JPEG/PNG/GIF/BMP/TIFF and AIFF/AU. */
object MediaCodec {

  /** One-time per-JVM codec setup: executors must never pop a display or
    * write ImageIO's temp-file cache (decode stays pure in-memory). */
  private lazy val jdkReady: Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte]) {
    /** luma of pixel (x,y) in 0-255 (BT.601 integer weights for RGB). */
    def luma(x: Int, y: Int): Int = {
      val at = (y * width + x) * channels
      if (channels == 1) pixels(at) & 0xff
      else ((pixels(at) & 0xff) * 299 + (pixels(at + 1) & 0xff) * 587 +
        (pixels(at + 2) & 0xff) * 114) / 1000
    }
  }

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Dispatch on magic bytes; returns unified features. Containers with
    * no JVM codec at all take the metadata-only fallback — the single
    * branch a real deployment swaps for its codec library. */
  def decode(mediaId: String, b: Array[Byte]): Multimodal.MediaFeatures =
    try decodeImpl(mediaId, b)
    catch {
      // corrupt container: surface in-band (kind="corrupt") rather than
      // killing the executor — one bad file must not fail a 100-TB job.
      // IOException covers ImageIO's IIOException on truncated streams;
      // UnsupportedAudioFileException covers a mangled AIFF/AU header.
      case _: IllegalArgumentException | _: IndexOutOfBoundsException |
           _: NegativeArraySizeException | _: java.io.IOException |
           _: javax.sound.sampled.UnsupportedAudioFileException =>
        Multimodal.MediaFeatures(mediaId, "corrupt", -1, -1, -1, 0, 0L,
          b.length.toLong, 0.0, 0L, fnv(b))
    }

  private def decodeImpl(mediaId: String, b: Array[Byte]): Multimodal.MediaFeatures = {
    if (b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6'))
      imageFeatures(mediaId, null, decodeNetpbm(b), b.length.toLong)
    else if (b.length >= 12 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE")
      audioFeatures(mediaId, "wav", decodeWav(b), b.length.toLong)
    else containerKind(b) match {
      case Some(k) if JdkImageKinds(k) =>
        imageFeatures(mediaId, k, decodeJdkImage(b), b.length.toLong)
      case Some("webp") =>
        val (w, h) = probeWebp(b)
        Multimodal.MediaFeatures(mediaId, "webp", w, h, -1, 0, 0L,
          b.length.toLong, 0.0, 0L, fnv(b))
      case Some("mp4") =>
        val (w, h, durMs) = probeMp4(b)
        Multimodal.MediaFeatures(mediaId, "mp4", w, h, -1, 0, durMs,
          b.length.toLong, 0.0, 0L, fnv(b))
      case Some(k @ ("avif" | "heic")) =>
        val (w, h) = probeHeif(b)
        Multimodal.MediaFeatures(mediaId, k, w, h, -1, 0, 0L,
          b.length.toLong, 0.0, 0L, fnv(b))
      case Some("flac") =>
        val (sr, ch, durMs) = probeFlac(b)
        Multimodal.MediaFeatures(mediaId, "flac", -1, -1, ch, sr, durMs,
          b.length.toLong, 0.0, 0L, fnv(b))
      case Some(k @ ("ogg" | "mp3")) =>
        // kind-typed sniff only: duration needs a page/frame walk over
        // the whole payload (VBR), which is codec territory
        Multimodal.MediaFeatures(mediaId, k, -1, -1, -1, 0, 0L,
          b.length.toLong, 0.0, 0L, fnv(b))
      case Some(k) =>
        audioFeatures(mediaId, k, decodeJdkAudio(b), b.length.toLong)
      case None =>
        // honest fallback: no JVM codec for this container
        Multimodal.MediaFeatures(mediaId, "unsupported", -1, -1, -1, 0, 0L,
          b.length.toLong, 0.0, 0L, fnv(b))
    }
  }

  private def imageFeatures(mediaId: String, kind: String, img: Image,
                            nBytes: Long): Multimodal.MediaFeatures = {
    val k = if (kind != null) kind else if (img.channels == 1) "pgm" else "ppm"
    val n = img.width.toLong * img.height
    var sum = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) { sum += img.luma(x, y); x += 1 }
      y += 1
    }
    Multimodal.MediaFeatures(mediaId, k, img.width, img.height, img.channels,
      0, 0L, nBytes, if (n == 0) 0.0 else sum.toDouble / n, averageHash(img),
      fnv(img.pixels))
  }

  private def audioFeatures(mediaId: String, kind: String, a: Audio,
                            nBytes: Long): Multimodal.MediaFeatures = {
    val frames = a.samples.length / math.max(1, a.channels)
    var sumAbs = 0L
    var i = 0
    while (i < a.samples.length) { sumAbs += math.abs(a.samples(i).toLong); i += 1 }
    val mean = if (a.samples.length == 0) 0.0 else sumAbs.toDouble / a.samples.length
    Multimodal.MediaFeatures(mediaId, kind, -1, -1, a.channels, a.sampleRate,
      if (a.sampleRate == 0) 0L else frames.toLong * 1000 / a.sampleRate,
      nBytes, mean, audioHash(a), fnvShorts(a.samples))
  }

  /** Container kinds decoded by the JDK's bundled platform codecs. */
  private val JdkImageKinds = Set("jpeg", "png", "gif", "bmp", "tiff")

  /** Magic-byte sniff for the JDK-codec containers; None = no JVM codec. */
  def containerKind(b: Array[Byte]): Option[String] = {
    if (b.length < 12) None
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) Some("jpeg")
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some("png")
    else if (ascii(b, 0, 4) == "GIF8") Some("gif")
    else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) Some("tiff")
    else if (ascii(b, 0, 4) == "FORM" &&
      (ascii(b, 8, 4) == "AIFF" || ascii(b, 8, 4) == "AIFC")) Some("aiff")
    else if (ascii(b, 0, 4) == ".snd") Some("au")
    else if (ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WEBP")
      Some("webp")
    else if (b.length >= 12 && ascii(b, 4, 4) == "ftyp") {
      // ISO BMFF splits by brand: movie brands carry tkhd dimensions,
      // HEIF image brands (HEIC/AVIF) carry theirs in meta/iprp/ipco/
      // ispe — typing an image as "mp4" would hand video consumers junk
      // -1x-1 frames, so each family gets its own probe
      val brand = ascii(b, 8, 4)
      if (Seq("avif", "avis").exists(brand.startsWith)) Some("avif")
      else if (Seq("heic", "heix", "hevc", "mif1", "msf1")
        .exists(brand.startsWith)) Some("heic")
      else if (Seq("iso", "mp4", "avc", "3gp", "M4V", "M4A", "qt", "mmp",
        "dash").exists(brand.startsWith)) Some("mp4")
      else None
    }
    else if (ascii(b, 0, 4) == "fLaC") Some("flac")
    else if (ascii(b, 0, 4) == "OggS") Some("ogg")
    else if (ascii(b, 0, 3) == "ID3" ||
      (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0))
      Some("mp3")
    else None
  }

  /** FLAC sample rate / channels / duration from the mandatory
    * STREAMINFO block (public spec RFC 9639): fixed offsets after the
    * fLaC magic — sample rate 20 bits, channels-1 3 bits, total samples
    * 36 bits, all in the 8 bytes at offset 18. */
  def probeFlac(b: Array[Byte]): (Int, Int, Long) = {
    require(b.length >= 26 && (b(4) & 0x7f) == 0, "no FLAC STREAMINFO")
    def u(at: Int) = b(at) & 0xff
    val sr = (u(18) << 12) | (u(19) << 4) | (u(20) >> 4)
    val ch = ((u(20) >> 1) & 7) + 1
    val total = ((u(21) & 0xfL) << 32) | (u(22).toLong << 24) |
      (u(23) << 16) | (u(24) << 8) | u(25)
    require(sr > 0, "FLAC sample rate 0")
    (sr, ch, total * 1000 / sr)
  }

  /** HEIF still-image (HEIC/AVIF) pixel dimensions from the
    * meta → iprp → ipco → ispe box chain (ISO/IEC 23008-12) — `meta` is
    * a FULLBOX (4 extra version/flags bytes before its children), ispe
    * is width(4)+height(4) after its own fullbox header.  The largest
    * ispe wins: property containers also list thumbnail sizes. */
  def probeHeif(b: Array[Byte]): (Int, Int) = {
    def be32(at: Int): Long =
      ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
        ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
    var w = 0
    var h = 0
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var at = from
      while (at + 8 <= until) {
        val size = be32(at)
        if (size < 8 || at + size > until) return
        ascii(b, at + 4, 4) match {
          case "meta" if depth < 6 => walk(at + 12, at + size.toInt, depth + 1)
          case "iprp" | "ipco" if depth < 6 =>
            walk(at + 8, at + size.toInt, depth + 1)
          case "ispe" if size >= 20 =>
            val iw = be32(at + 12).toInt
            val ih = be32(at + 16).toInt
            if (iw.toLong * ih > w.toLong * h) { w = iw; h = ih }
          case _ => ()
        }
        at += size.toInt
      }
    }
    walk(0, b.length, 0)
    (if (w > 0) w else -1, if (h > 0) h else -1)
  }

  /** WebP canvas dimensions from the container HEADER (public spec
    * RFC 9649) — pixel decode needs a codec library, but width/height do
    * not: VP8X carries the canvas size explicitly; lossy VP8 carries it
    * in the frame tag; lossless VP8L in its 28-bit size field. */
  def probeWebp(b: Array[Byte]): (Int, Int) = {
    require(b.length >= 30, "truncated webp")
    ascii(b, 12, 4) match {
      case "VP8X" => (le24(b, 24) + 1, le24(b, 27) + 1)
      case "VP8 " =>
        require((b(23) & 0xff) == 0x9d && (b(24) & 0xff) == 0x01 &&
          (b(25) & 0xff) == 0x2a, "bad VP8 sync code")
        (le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff)
      case "VP8L" =>
        require((b(20) & 0xff) == 0x2f, "bad VP8L signature")
        val v = le24(b, 21) | ((b(24) & 0xff) << 24)
        ((v & 0x3fff) + 1, ((v >>> 14) & 0x3fff) + 1)
      case other => throw new IllegalArgumentException(s"webp chunk $other")
    }
  }

  /** MP4 (ISO BMFF) video dimensions + duration from the box tree
    * (public spec ISO/IEC 14496-12): mvhd carries timescale/duration,
    * tkhd carries 16.16 fixed-point track width/height (audio tracks are
    * 0x0, so the max across tracks is the video size).  Box walk only —
    * no sample decode. */
  def probeMp4(b: Array[Byte]): (Int, Int, Long) = {
    def be32(at: Int): Long =
      ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
        ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
    var w = -1
    var h = -1
    var durMs = 0L
    // best-effort walk: a malformed or truncated box (the usual crawl
    // corruption — an mdat whose size exceeds the download, a 64-bit
    // largesize box) STOPS the walk at that level instead of throwing,
    // so metadata already extracted from an earlier moov survives
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var at = from
      while (at + 8 <= until) {
        val size = be32(at)
        if (size < 8 || at + size > until) return
        val typ = ascii(b, at + 4, 4)
        typ match {
          case "moov" | "trak" if depth < 4 =>
            walk(at + 8, at + size.toInt, depth + 1)
          case "mvhd" =>
            val v = b(at + 8) & 0xff
            // v0 needs 28 bytes to reach duration, v1 needs 40
            if (v == 1 && size >= 40) {
              val ts = be32(at + 28)
              val dur = (be32(at + 32) << 32) | be32(at + 36)
              if (ts > 0) durMs = dur * 1000 / ts
            } else if (v == 0 && size >= 28) {
              val ts = be32(at + 20)
              if (ts > 0) durMs = be32(at + 24) * 1000 / ts
            }
          case "tkhd" if size >= 16 =>
            // width/height are the LAST 8 bytes of tkhd, 16.16 fixed
            val tw = (be32(at + size.toInt - 8) >> 16).toInt
            val th = (be32(at + size.toInt - 4) >> 16).toInt
            if (tw > w) w = tw
            if (th > h) h = th
          case _ => ()
        }
        at += size.toInt
      }
    }
    walk(0, b.length, 0)
    (w, h, durMs)
  }

  /** JPEG/PNG/GIF/BMP/TIFF via `javax.imageio` (the JDK's java.desktop
    * module — a platform API, not an external library). Grayscale images
    * are read from the raster directly (exact 8-bit samples — `getRGB`
    * would run them through a gray→sRGB color-space transform); color
    * images land as interleaved RGB, the same layout as netpbm P6, so
    * resize / average-hash / luma behave identically across containers. */
  /** Decompression-bomb budgets: a crafted header claiming 60000x60000
    * would otherwise allocate ~14 GB inside ImageIO.read / readAllBytes
    * BEFORE any post-hoc size check could run, OOMing the executor (an
    * Error, uncatchable by design) — so dimensions are checked from the
    * container HEADER before the full decode is attempted.  Oversized
    * media surface in-band as kind="corrupt" like any other bad file. */
  val MaxDecodedPixels: Long = 64L * 1024 * 1024
  val MaxDecodedAudioBytes: Int = 64 * 1024 * 1024

  def decodeJdkImage(b: Array[Byte]): Image = {
    jdkReady
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "JDK ImageIO could not decode container")
    val reader = readers.next()
    val buf =
      try {
        reader.setInput(iis, true, true)
        // header-declared dimensions — no pixel allocation yet
        val hw = reader.getWidth(0)
        val hh = reader.getHeight(0)
        require(hw > 0 && hh > 0 && hw.toLong * hh <= MaxDecodedPixels,
          s"image $hw x $hh exceeds the decode pixel budget")
        reader.read(0)
      } finally {
        reader.dispose()
        iis.close()
      }
    require(buf != null, "JDK ImageIO could not decode container")
    val w = buf.getWidth
    val h = buf.getHeight
    val gray = buf.getColorModel.getNumColorComponents == 1 &&
      buf.getColorModel.getPixelSize == 8
    val ch = if (gray) 1 else 3
    val n = w.toLong * h * ch
    require(w > 0 && h > 0 && n <= Int.MaxValue - 8, s"decoded image $w x $h too large")
    val px = new Array[Byte](n.toInt)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      if (gray) {
        buf.getRaster.getSamples(0, y, w, 1, 0, row)
        var x = 0
        while (x < w) { px(y * w + x) = (row(x) & 0xff).toByte; x += 1 }
      } else {
        buf.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val v = row(x)
          val at = (y * w + x) * 3
          px(at) = ((v >>> 16) & 0xff).toByte
          px(at + 1) = ((v >>> 8) & 0xff).toByte
          px(at + 2) = (v & 0xff).toByte
          x += 1
        }
      }
      y += 1
    }
    Image(w, h, ch, px)
  }

  /** Encode via the JDK's bundled ImageIO writers ("png" lossless, "jpg"
    * lossy, "bmp"/"gif" also available) — the re-encode half of the media
    * pipeline (thumbnails, format normalization). Grayscale input is
    * replicated into RGB. */
  def encodeImage(img: Image, format: String): Array[Byte] = {
    jdkReady
    val buf = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // fill row buffers and blit per ROW (setRGB per pixel pays a color-
    // model conversion + bounds check per call — this is an executor hot
    // path over wide media rows, same batching as the decode side)
    val row = new Array[Int](img.width)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        row(x) =
          if (img.channels == 1) {
            val v = img.pixels(y * img.width + x) & 0xff
            (v << 16) | (v << 8) | v
          } else {
            val at = (y * img.width + x) * 3
            ((img.pixels(at) & 0xff) << 16) |
              ((img.pixels(at + 1) & 0xff) << 8) | (img.pixels(at + 2) & 0xff)
          }
        x += 1
      }
      buf.setRGB(0, y, img.width, 1, row, 0, img.width)
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(buf, format, bos),
      s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** AIFF/AU via `javax.sound.sampled`, normalized to little-endian
    * PCM16 at the source rate/channel count so all audio containers meet
    * the same [[Audio]] shape as the pure-Scala WAV path. */
  def decodeJdkAudio(b: Array[Byte]): Audio = {
    jdkReady
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val src = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b))
    try {
      val f = src.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
        f.getSampleRate, false)
      val pcm = if (f.matches(target)) src
                else AudioSystem.getAudioInputStream(target, src)
      // header-declared frame count first; then a bounded read for the
      // streams that declare -1 (unknown length) — never readAllBytes
      require(pcm.getFrameLength < 0 ||
        pcm.getFrameLength * (2L * f.getChannels) <= MaxDecodedAudioBytes,
        s"audio ${pcm.getFrameLength} frames exceeds the decode budget")
      val bytes = pcm.readNBytes(MaxDecodedAudioBytes + 1)
      require(bytes.length <= MaxDecodedAudioBytes,
        "audio stream exceeds the decode budget")
      val n = bytes.length / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        i += 1
      }
      Audio(math.round(f.getSampleRate), f.getChannels, samples)
    } finally src.close()
  }

  /** Binary Netpbm P5 (grayscale) / P6 (RGB): whitespace-separated header
    * tokens with `#` comments, maxval <= 255, raster follows the single
    * whitespace byte after maxval. */
  def decodeNetpbm(b: Array[Byte]): Image = {
    require(b.length >= 2 && b(0) == 'P', "not netpbm")
    val channels = b(1) match {
      case '5' => 1
      case '6' => 3
      case c   => throw new IllegalArgumentException(s"unsupported netpbm P$c")
    }
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < b.length && (inComment || isWs(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') inComment = true
        else if (b(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0L
      val start = pos
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
        require(v <= Int.MaxValue, "netpbm header value overflows")
      }
      require(pos > start, "bad netpbm header")
      v.toInt
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval > 0 && maxval <= 255, s"unsupported maxval $maxval")
    pos += 1 // exactly one whitespace byte before the raster
    // Long product: adversarial dimensions must fail typed, not overflow
    val n = w.toLong * h * channels
    require(n >= 0 && n <= Int.MaxValue - 8, s"netpbm raster $w x $h too large")
    require(b.length - pos >= n, "truncated netpbm raster")
    val px = new Array[Byte](n.toInt)
    System.arraycopy(b, pos, px, 0, n.toInt)
    Image(w, h, channels, px)
  }

  /** A netpbm file may contain several concatenated images (multi-frame
    * stream — the lib-free stand-in for video): split them. */
  def netpbmFrames(b: Array[Byte]): Seq[Image] = {
    val out = Seq.newBuilder[Image]
    var pos = 0
    while (pos + 2 <= b.length && b(pos) == 'P') {
      val sub = java.util.Arrays.copyOfRange(b, pos, b.length)
      val img = decodeNetpbm(sub)
      out += img
      pos += netpbmByteLength(sub, img)
    }
    out.result()
  }

  /** Sample every `every`-th frame of a concatenated-netpbm stream. */
  def frameSample(b: Array[Byte], every: Int): Seq[Image] = {
    require(every >= 1, "every >= 1")
    netpbmFrames(b).zipWithIndex.collect { case (f, i) if i % every == 0 => f }
  }

  private def netpbmByteLength(sub: Array[Byte], img: Image): Int = {
    // re-scan the header to find where the raster starts
    var pos = 2
    var seen = 0
    var inComment = false
    while (seen < 3) {
      while (pos < sub.length && (inComment || isWs(sub(pos)) || sub(pos) == '#')) {
        if (sub(pos) == '#') inComment = true
        else if (sub(pos) == '\n') inComment = false
        pos += 1
      }
      while (pos < sub.length && sub(pos) >= '0' && sub(pos) <= '9') pos += 1
      seen += 1
    }
    pos + 1 + img.width * img.height * img.channels
  }

  /** RIFF/WAVE chunk walk; PCM16 only (format tag 1, 16-bit). */
  def decodeWav(b: Array[Byte]): Audio = {
    require(b.length >= 12 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE",
      "not wav")
    var pos = 12
    var rate = 0; var channels = 0; var bits = 0; var fmt = 0
    var samples: Array[Short] = Array.emptyShortArray
    while (pos + 8 <= b.length) {
      val id = ascii(b, pos, 4)
      val len = le32(b, pos + 4)
      // signed le32: a negative length would stall the walk (pos would
      // stop advancing) — fail typed instead
      require(len >= 0, s"bad wav chunk length $len")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(len >= 16 && body + 16 <= b.length, "truncated fmt chunk")
          fmt = le16(b, body); channels = le16(b, body + 2)
          rate = le32(b, body + 4); bits = le16(b, body + 14)
        case "data" =>
          require(fmt == 1 && bits == 16, s"unsupported wav fmt=$fmt bits=$bits")
          val n = math.min(len, b.length - body) / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = ((b(body + 2 * i) & 0xff) |
              (b(body + 2 * i + 1) << 8)).toShort
            i += 1
          }
        case _ => // skip unknown chunk
      }
      pos = body + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0, "wav missing fmt chunk")
    Audio(rate, channels, samples)
  }

  /** Box-average resample to (outW, outH); returns a grayscale image.
    * This is the real `resize` op — each output pixel averages its source
    * box, so downsampling is antialiased. */
  def resize(img: Image, outW: Int, outH: Int): Image = {
    require(outW > 0 && outH > 0, "bad target size")
    val px = new Array[Byte](outW * outH)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * img.height / outH
      val y1 = math.max(y0 + 1, (oy + 1) * img.height / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * img.width / outW
        val x1 = math.max(x0 + 1, (ox + 1) * img.width / outW)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += img.luma(x, y); x += 1 }
          y += 1
        }
        px(oy * outW + ox) = (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
        ox += 1
      }
      oy += 1
    }
    Image(outW, outH, 1, px)
  }

  /** Perceptual average-hash: box-resize luma to 8x8, threshold at the
    * mean -> 64-bit fingerprint. Near-duplicate images differ in few bits. */
  def averageHash(img: Image): Long = {
    val small = resize(img, 8, 8)
    var sum = 0
    var i = 0
    while (i < 64) { sum += small.pixels(i) & 0xff; i += 1 }
    val mean = sum / 64
    var bits = 0L
    i = 0
    while (i < 64) {
      if ((small.pixels(i) & 0xff) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Audio analog of averageHash: 64 equal time buckets, bit set when the
    * bucket's mean |amplitude| exceeds the global mean. */
  def audioHash(a: Audio): Long = {
    val n = a.samples.length
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < n) { total += math.abs(a.samples(i).toLong); i += 1 }
    val mean = total.toDouble / n
    var bits = 0L
    var k = 0
    while (k < 64) {
      val s = k * n / 64
      val e = math.max(s + 1, (k + 1) * n / 64)
      var sum = 0L
      i = s
      while (i < e) { sum += math.abs(a.samples(i).toLong); i += 1 }
      if (sum.toDouble / (e - s) > mean) bits |= 1L << k
      k += 1
    }
    bits
  }

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  private def ascii(b: Array[Byte], at: Int, len: Int): String =
    new String(b, at, len, "US-ASCII")

  private def le16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

  private def le24(b: Array[Byte], at: Int): Int =
    le16(b, at) | ((b(at + 2) & 0xff) << 16)

  private def le32(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)

  // one FNV implementation in the codebase: DedupHash owns it
  private def fnv(b: Array[Byte]): Long = DedupHash.fnv64(b, 0, b.length)

  private def fnvShorts(s: Array[Short]): Long = {
    var cs = DedupHash.FnvOffset
    var i = 0
    while (i < s.length) { cs = (cs ^ (s(i) & 0xffffL)) * DedupHash.FnvPrime; i += 1 }
    cs
  }
}
