package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.data.{MediaCodec, Multimodal}
import graft.data.Multimodal.{MediaMeta, MediaRow}

/** JDK platform-codec decode paths (javax.imageio / javax.sound.sampled —
  * part of the JDK, not external libraries): JPEG/PNG/GIF/BMP images and
  * AIFF audio must flow through the same unified feature extraction as
  * the pure-Scala netpbm/WAV readers.  Lossless containers are held to
  * BIT-IDENTICAL features vs their netpbm/WAV twins; lossy JPEG is held
  * to perceptual-hash stability. */
class JdkCodecSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("jdk-codec-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)

  /** RGB encode goes through the library's own ImageIO wrapper so the
    * encode half is exercised too. */
  private def encodeRgb(img: MediaCodec.Image, fmt: String): Array[Byte] =
    MediaCodec.encodeImage(img, fmt)

  private def encodeGray(img: MediaCodec.Image, fmt: String): Array[Byte] = {
    require(img.channels == 1)
    val buf = new BufferedImage(img.width, img.height, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until img.height; x <- 0 until img.width)
      buf.getRaster.setSample(x, y, 0, img.pixels(y * img.width + x) & 0xff)
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(buf, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** A smooth deterministic RGB test card (gradients + a diagonal band):
    * JPEG-friendly, unlike white-noise rasters. */
  private def testCard(w: Int, h: Int): MediaCodec.Image = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val at = (y * w + x) * 3
      px(at) = (x * 255 / (w - 1)).toByte
      px(at + 1) = (y * 255 / (h - 1)).toByte
      px(at + 2) = (if ((x + y) % (w / 2) < w / 4) 200 else 40).toByte
    }
    MediaCodec.Image(w, h, 3, px)
  }

  test("PNG and BMP decode bit-identically to the netpbm P6 twin") {
    val ppmBytes = Multimodal.synthPpm(21L, 37, 23)
    val twin = MediaCodec.decode("t", ppmBytes)
    val img = MediaCodec.decodeNetpbm(ppmBytes)
    for ((fmt, kind) <- Seq("png" -> "png", "bmp" -> "bmp")) {
      val enc = encodeRgb(img, fmt)
      val f = MediaCodec.decode("j", enc)
      assert(f.kind == kind, f.toString)
      assert(f.width == 37 && f.height == 23 && f.channels == 3)
      // lossless container => identical pixels => identical features
      assert(f.checksum == twin.checksum && f.ahash == twin.ahash &&
        f.meanLevel == twin.meanLevel, s"$fmt features diverge from P6 twin")
    }
  }

  test("grayscale PNG decodes bit-identically to the netpbm P5 twin") {
    val pgmBytes = Multimodal.synthPgm(22L, 41, 29)
    val twin = MediaCodec.decode("t", pgmBytes)
    val enc = encodeGray(MediaCodec.decodeNetpbm(pgmBytes), "png")
    val f = MediaCodec.decode("g", enc)
    assert(f.kind == "png" && f.channels == 1 && f.width == 41 && f.height == 29)
    assert(f.checksum == twin.checksum && f.ahash == twin.ahash &&
      f.meanLevel == twin.meanLevel)
  }

  test("GIF (palette) preserves gray values: ahash equals the P5 twin") {
    val pgmBytes = Multimodal.synthPgm(23L, 32, 32)
    val twin = MediaCodec.decode("t", pgmBytes)
    val enc = encodeGray(MediaCodec.decodeNetpbm(pgmBytes), "gif")
    val f = MediaCodec.decode("g", enc)
    assert(f.kind == "gif" && f.width == 32 && f.height == 32)
    // the gif palette replicates gray into RGB; integer BT.601 luma of
    // (v,v,v) is exactly v, so the perceptual features survive the
    // palette round-trip even though the raw pixel layout differs
    assert(f.ahash == twin.ahash && f.meanLevel == twin.meanLevel)
  }

  test("JPEG decodes with a perceptually-stable average hash") {
    val card = testCard(64, 48)
    val png = MediaCodec.decode("p", encodeRgb(card, "png"))
    val jpg = MediaCodec.decode("j", encodeRgb(card, "jpg"))
    assert(jpg.kind == "jpeg" && jpg.width == 64 && jpg.height == 48 &&
      jpg.channels == 3)
    assert(ham(png.ahash, jpg.ahash) <= 4,
      s"jpeg ahash drifted ${ham(png.ahash, jpg.ahash)} bits")
    assert(math.abs(png.meanLevel - jpg.meanLevel) < 3.0)
  }

  test("AIFF decodes to the same samples as the WAV twin") {
    val wavBytes = Multimodal.synthWav(31L, 8000, 600)
    val twin = MediaCodec.decode("t", wavBytes)
    val audio = MediaCodec.decodeWav(wavBytes)
    // re-encode the identical PCM16 frames big-endian as AIFF
    val be = new Array[Byte](audio.samples.length * 2)
    for (i <- audio.samples.indices) {
      be(2 * i) = (audio.samples(i) >> 8).toByte
      be(2 * i + 1) = audio.samples(i).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, true)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(be), fmt,
      audio.samples.length.toLong), AudioFileFormat.Type.AIFF, bos)
    val f = MediaCodec.decode("a", bos.toByteArray)
    assert(f.kind == "aiff" && f.sampleRate == 8000 && f.channels == 1)
    assert(f.checksum == twin.checksum && f.meanLevel == twin.meanLevel &&
      f.ahash == twin.ahash && f.durationMs == twin.durationMs)
  }

  test("corrupt JDK containers surface in-band, never as exceptions") {
    val jpg = encodeRgb(testCard(32, 32), "jpg")
    // valid JPEG magic, garbage body
    val garbage = jpg.take(3) ++ Array.fill[Byte](64)(0x55)
    assert(MediaCodec.decode("c1", garbage).kind == "corrupt")
    // AIFF magic with a mangled body
    val badAiff = "FORM\u0000\u0000\u0000\u0010AIFFjunkjunk".getBytes("US-ASCII")
    assert(MediaCodec.decode("c2", badAiff).kind == "corrupt")
    // severely truncated JPEG: either decodes partially or is corrupt,
    // but must not throw
    val trunc = MediaCodec.decode("c3", jpg.take(jpg.length / 4))
    assert(trunc.kind == "corrupt" || trunc.kind == "jpeg")
  }

  test("WebP and MP4 probe typed metadata from container headers, no codec") {
    // minimal VP8X WebP: RIFF + WEBP + VP8X(flags, canvas 640x360)
    val webp = new java.io.ByteArrayOutputStream()
    def le24(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    webp.write("RIFF".getBytes("US-ASCII")); webp.write(Array[Byte](22, 0, 0, 0))
    webp.write("WEBPVP8X".getBytes("US-ASCII"))
    webp.write(Array[Byte](10, 0, 0, 0))             // chunk size
    webp.write(Array[Byte](0, 0, 0, 0))              // flags + reserved
    webp.write(le24(639)); webp.write(le24(359))     // canvas - 1
    val fw = MediaCodec.decode("w1", webp.toByteArray)
    assert(fw.kind == "webp" && fw.width == 640 && fw.height == 360, fw)

    // minimal ISO BMFF: ftyp + moov(mvhd timescale 1000 dur 2500,
    // trak(tkhd 1280x720 as 16.16 fixed))
    val bb = java.nio.ByteBuffer.allocate(16 + 68)   // big-endian default
    bb.putInt(16); bb.put("ftypisom".getBytes("US-ASCII")); bb.putInt(0)
    bb.putInt(68); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(28); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0); bb.putInt(0); bb.putInt(0)         // v0, ctime, mtime
    bb.putInt(1000); bb.putInt(2500)                 // timescale, duration
    bb.putInt(32); bb.put("trak".getBytes("US-ASCII"))
    bb.putInt(24); bb.put("tkhd".getBytes("US-ASCII"))
    bb.putInt(0); bb.putInt(0)                       // v0/flags, pad
    bb.putInt(1280 << 16); bb.putInt(720 << 16)      // 16.16 width/height
    val fm = MediaCodec.decode("m1", bb.array())
    assert(fm.kind == "mp4" && fm.width == 1280 && fm.height == 720 &&
      fm.durationMs == 2500, fm)

    // lossy VP8 and lossless VP8L width paths
    val vp8 = webp.toByteArray.clone()
    System.arraycopy("VP8 ".getBytes("US-ASCII"), 0, vp8, 12, 4)
    vp8(20) = 0; vp8(21) = 0; vp8(22) = 0
    vp8(23) = 0x9d.toByte; vp8(24) = 0x01; vp8(25) = 0x2a
    vp8(26) = 64; vp8(27) = 0; vp8(28) = 48; vp8(29) = 0
    val fv = MediaCodec.decode("w2", vp8)
    assert(fv.kind == "webp" && fv.width == 64 && fv.height == 48, fv)

    // a truncated/garbage webp surfaces in-band
    assert(MediaCodec.decode("w3", webp.toByteArray.take(20)).kind == "corrupt")

    // AVIF: ftyp(avif) + meta(FULLBOX)/iprp/ipco with two ispe boxes —
    // primary 1024x768 and a 160x120 thumbnail; the largest wins
    val hb = java.nio.ByteBuffer.allocate(16 + 12 + 8 + 8 + 40)
    hb.putInt(16); hb.put("ftypavif".getBytes("US-ASCII")); hb.putInt(0)
    hb.putInt(68); hb.put("meta".getBytes("US-ASCII")); hb.putInt(0) // fullbox
    hb.putInt(56); hb.put("iprp".getBytes("US-ASCII"))
    hb.putInt(48); hb.put("ipco".getBytes("US-ASCII"))
    hb.putInt(20); hb.put("ispe".getBytes("US-ASCII")); hb.putInt(0)
    hb.putInt(1024); hb.putInt(768)
    hb.putInt(20); hb.put("ispe".getBytes("US-ASCII")); hb.putInt(0)
    hb.putInt(160); hb.putInt(120)
    val fh = MediaCodec.decode("h1", hb.array())
    assert(fh.kind == "avif" && fh.width == 1024 && fh.height == 768, fh)
    // heic brand maps to its own kind; a dimensionless file reports -1
    val heicOnly = java.nio.ByteBuffer.allocate(16)
    heicOnly.putInt(16); heicOnly.put("ftypheic".getBytes("US-ASCII"))
    heicOnly.putInt(0)
    val fh2 = MediaCodec.decode("h2", heicOnly.array())
    assert(fh2.kind == "heic" && fh2.width == -1, fh2)

    // FLAC STREAMINFO: 44100 Hz stereo, 441000 samples = exactly 10 s
    val flac = new Array[Byte](26)
    System.arraycopy("fLaC".getBytes("US-ASCII"), 0, flac, 0, 4)
    flac(4) = 0; flac(5) = 0; flac(6) = 0; flac(7) = 34
    flac(18) = 0x0a; flac(19) = 0xc4.toByte; flac(20) = 0x42
    flac(21) = 0; flac(22) = 0; flac(23) = 6
    flac(24) = 0xba.toByte; flac(25) = 0xa8.toByte
    val ff = MediaCodec.decode("f1", flac)
    assert(ff.kind == "flac" && ff.sampleRate == 44100 && ff.channels == 2 &&
      ff.durationMs == 10000, ff)

    // Ogg / MP3: kind-typed sniffs (duration needs a codec frame walk)
    assert(MediaCodec.decode("o1",
      "OggSxxxxxxxxxxxx".getBytes("US-ASCII")).kind == "ogg")
    assert(MediaCodec.decode("p1",
      "ID3xxxxxxxxxxxxx".getBytes("US-ASCII")).kind == "mp3")

    // the MediaProbes builders (q_media_probe's synthesis side) must
    // round-trip through the probes — an independent construction from
    // the hand-assembled buffers above
    import graft.data.MediaProbes
    assert(MediaCodec.decode("b1", MediaProbes.synthWebpVp8x(640, 360)).width == 640)
    assert(MediaCodec.decode("b2", MediaProbes.synthMp4(1280, 720, 2500)).durationMs == 2500)
    assert(MediaCodec.decode("b3", MediaProbes.synthAvif(1024, 768)).height == 768)
    assert(MediaCodec.decode("b4",
      MediaProbes.synthFlac(44100, 2, 441000L)).durationMs == 10000)
  }

  test("decompression bomb: a 60000x60000 PNG header is rejected before decode") {
    // take a real 16x16 PNG and patch the IHDR dimensions (big-endian at
    // byte offsets 16/20) to claim a ~14 GB raster; the budget check must
    // read the HEADER and bail in-band before ImageIO allocates pixels
    val png = encodeRgb(testCard(16, 16), "png")
    val bomb = png.clone()
    for (at <- Seq(16, 20)) {
      bomb(at) = 0; bomb(at + 1) = 0
      bomb(at + 2) = ((60000 >> 8) & 0xff).toByte
      bomb(at + 3) = (60000 & 0xff).toByte
    }
    val t0 = System.nanoTime()
    val f = MediaCodec.decode("bomb", bomb)
    assert(f.kind == "corrupt", f)
    // header rejection is cheap; a full decode attempt would OOM or stall
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
  }

  test("synthesizeJdk: every lossy twin stays within the perceptual budget") {
    val feats = Multimodal.extractFeatures(
      Multimodal.synthesizeJdk(spark, 60, parts = 4)).collect()
    assert(feats.length == 120)
    val byCard = feats.groupBy(_.media_id.drop(3))
    assert(byCard.size == 60 && byCard.forall(_._2.length == 2))
    byCard.foreach { case (card, fs) =>
      val png = fs.find(_.kind == "png").get
      val jpg = fs.find(_.kind == "jpeg").get
      assert(png.width == jpg.width && png.height == jpg.height)
      assert(ham(png.ahash, jpg.ahash) <= 8,
        s"card $card drifted ${ham(png.ahash, jpg.ahash)} ahash bits")
    }
  }

  test("q_media_jdk driver query: every card perceptually matches its twin") {
    val row = SparkEntry.queries("q_media_jdk")(spark, "unused").head()
    assert(row.getAs[Long]("n_cards") == 300)
    assert(row.getAs[Long]("n_perceptual_match") == 300)
    assert(row.getAs[Long]("sum_pixels") > 300L * 32 * 24)
  }

  test("JDK containers flow through the Spark decode path and near-dup join") {
    val sp = spark
    import sp.implicits._
    val card = testCard(48, 48)
    val other = testCard(48, 48) match { // inverted card = far image
      case MediaCodec.Image(w, h, c, px) =>
        MediaCodec.Image(w, h, c, px.map(b => (255 - (b & 0xff)).toByte))
    }
    val rows = Seq(
      MediaRow("png0", encodeRgb(card, "png"), MediaMeta("image", 48, 48, 0)),
      MediaRow("jpg0", encodeRgb(card, "jpg"), MediaMeta("image", 48, 48, 0)),
      MediaRow("far0", encodeRgb(other, "png"), MediaMeta("image", 48, 48, 0)))
    val feats = Multimodal.extractFeatures(rows.toDS().repartition(3))
    val collected = feats.collect().map(f => f.media_id -> f).toMap
    assert(collected("png0").kind == "png" && collected("jpg0").kind == "jpeg")
    // the JPEG re-encode of the same card is found as a perceptual
    // near-duplicate of the PNG original; the inverted card is not
    val pairs = Multimodal.nearDupPairs(feats.toDF(), maxHamming = 3)
      .select("left_id", "right_id").as[(String, String)].collect().toSet
    assert(pairs.contains(("jpg0", "png0")) || pairs.contains(("png0", "jpg0")),
      pairs.toString)
    assert(!pairs.exists(p => p._1 == "far0" || p._2 == "far0"))
  }
}
