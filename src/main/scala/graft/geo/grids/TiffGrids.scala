package graft.geo.grids

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import scala.collection.mutable

/** GeoTIFF shift-grid reader — the engine's equivalent of the reference's
  * libtiff-backed grid path (/root/reference/src/grids.cpp:388-1610 for
  * the raster layer, :2346-2660 for the horizontal wrapper, :1420-1610
  * for the vertical one).  Grids are materialized into the same
  * [[HGrid]]/[[VGrid]] arrays the binary formats use, so all downstream
  * interpolation/apply logic is shared.
  *
  * Supported: classic + BigTIFF, little/big endian, strips + tiles,
  * deflate compression with horizontal (2) and floating-point (3)
  * predictors, int16/uint16/int32/uint32/float32/float64 samples with
  * per-sample scale/offset, contiguous + separate planar layouts,
  * multi-IFD files (sub-grids by grid_name/parent_grid_name or bbox
  * nesting; reduced-resolution overviews skipped), GDAL metadata
  * (DESCRIPTION / UNITTYPE / positive_value / nodata).
  */
object TiffGrids {
  import Grids.BadGrid

  private final val ArcSecToRad = (math.Pi / 180.0) / 3600.0

  // --- low-level TIFF structure --------------------------------------------

  private final case class Entry(typ: Int, count: Long, valueOff: Long,
                                 inline: Boolean)

  private final class Reader(bytes: Array[Byte]) {
    val order: ByteOrder =
      if (bytes(0) == 'I' && bytes(1) == 'I') ByteOrder.LITTLE_ENDIAN
      else if (bytes(0) == 'M' && bytes(1) == 'M') ByteOrder.BIG_ENDIAN
      else throw BadGrid("not a TIFF file")
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(order)
    val magic: Int = buf.getShort(2) & 0xffff
    val big: Boolean = magic == 43
    if (!big && magic != 42) throw BadGrid("bad TIFF magic")
    if (big) {
      if ((buf.getShort(4) & 0xffff) != 8) throw BadGrid("bad BigTIFF header")
    }

    def u16(o: Long): Int = buf.getShort(o.toInt) & 0xffff
    def u32(o: Long): Long = buf.getInt(o.toInt) & 0xffffffffL
    def u64(o: Long): Long = buf.getLong(o.toInt)
    def f32(o: Long): Float = buf.getFloat(o.toInt)
    def f64(o: Long): Double = buf.getDouble(o.toInt)

    val firstIfd: Long = if (big) u64(8) else u32(4)

    /** IFD entry table at `off`; returns (tags, nextIfdOffset). */
    def ifdAt(off: Long): (Map[Int, Entry], Long) = {
      val n = if (big) u64(off) else u16(off).toLong
      if (n > 65535) throw BadGrid("oversized IFD")
      val entSize = if (big) 20 else 12
      val base = off + (if (big) 8 else 2)
      val tags = mutable.Map.empty[Int, Entry]
      var i = 0L
      while (i < n) {
        val e = base + i * entSize
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = if (big) u64(e + 4) else u32(e + 4)
        val valueFieldOff = e + (if (big) 12 else 8)
        val sz = typeSize(typ) * count
        val inline = sz <= (if (big) 8 else 4)
        val valueOff =
          if (inline) valueFieldOff
          else if (big) u64(valueFieldOff)
          else u32(valueFieldOff)
        tags(tag) = Entry(typ, count, valueOff, inline)
        i += 1
      }
      val next = base + n * entSize
      (tags.toMap, if (big) u64(next) else u32(next))
    }

    private def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1  // BYTE/ASCII/SBYTE/UNDEFINED
      case 3 | 8         => 2  // SHORT/SSHORT
      case 4 | 9 | 11    => 4  // LONG/SLONG/FLOAT
      case 5 | 10 | 12 | 16 | 17 | 18 => 8 // RATIONAL/SRATIONAL/DOUBLE/LONG8
      case _ => 1
    }

    def scalarLong(e: Entry, idx: Long = 0): Long = {
      val sz = typeSize(e.typ)
      val o = e.valueOff + idx * sz
      e.typ match {
        case 1 | 7 => bytes(o.toInt) & 0xffL
        case 3 => u16(o).toLong
        case 4 => u32(o)
        case 8 => buf.getShort(o.toInt).toLong
        case 9 => buf.getInt(o.toInt).toLong
        case 16 | 17 => u64(o)
        case _ => throw BadGrid(s"unexpected tag type ${e.typ}")
      }
    }

    def scalarDouble(e: Entry, idx: Long): Double = e.typ match {
      case 11 => f32(e.valueOff + idx * 4).toDouble
      case 12 => f64(e.valueOff + idx * 8)
      case _ => scalarLong(e, idx).toDouble
    }

    def ascii(e: Entry): String = {
      val out = new Array[Byte](e.count.toInt)
      System.arraycopy(bytes, e.valueOff.toInt, out, 0, e.count.toInt)
      val z = out.indexOf(0.toByte)
      new String(out, 0, if (z < 0) out.length else z, "ISO-8859-1")
    }

    def raw(off: Long, len: Long): Array[Byte] = {
      if (off < 0 || off + len > bytes.length)
        throw BadGrid("block outside file (truncated?)")
      val out = new Array[Byte](len.toInt)
      System.arraycopy(bytes, off.toInt, out, 0, len.toInt)
      out
    }
  }

  // --- one raster IFD -------------------------------------------------------

  /** Decoded view of one grid IFD, values materialized on demand. */
  private final class Raster(r: Reader, tags: Map[Int, Entry],
                             val name: String) {
    private def tagLong(t: Int, dflt: => Long): Long =
      tags.get(t).map(r.scalarLong(_)).getOrElse(dflt)
    private def req(t: Int, what: String): Entry =
      tags.getOrElse(t, throw BadGrid(s"missing $what tag"))

    val width: Int = r.scalarLong(req(256, "ImageWidth")).toInt
    val height: Int = r.scalarLong(req(257, "ImageLength")).toInt
    if (width <= 0 || height <= 0) throw BadGrid("invalid image size")
    val spp: Int = r.scalarLong(req(277, "SamplesPerPixel")).toInt
    if (spp <= 0) throw BadGrid("invalid SamplesPerPixel")
    val bits: Int = r.scalarLong(req(258, "BitsPerSample")).toInt
    // SampleFormat is optional with default 1 = unsigned int (TIFF 6.0 §19,
    // libtiff TIFFGetFieldDefaulted semantics)
    val sampleFormat: Int = tagLong(339, 1L).toInt
    val planarSeparate: Boolean = tagLong(284, 1) == 2
    val compression: Int = tagLong(259, 1).toInt
    if (compression != 1 && compression != 8 && compression != 32946)
      throw BadGrid(s"unsupported compression $compression")
    val predictor: Int = tagLong(317, 1).toInt
    val subfileType: Long = tagLong(254, 0)
    val photometric: Long = tagLong(262, 0)
    if (photometric != 0 && photometric != 1)
      throw BadGrid("unsupported Photometric value")

    // sample kind: 0 = int, 1 = uint, 2 = float; reject other combos like
    // the reference (grids.cpp:1135-1160)
    val bytesPerSample: Int = bits / 8
    locally {
      val ok = (sampleFormat, bits) match {
        case (2, 16) | (1, 16) | (2, 32) | (1, 32) => true
        case (3, 32) | (3, 64) => true
        case _ => false
      }
      if (!ok) throw BadGrid(
        s"unsupported SampleFormat=$sampleFormat/BitsPerSample=$bits")
    }

    val tiled: Boolean = tags.contains(322)
    val blockWidth: Int =
      if (tiled) r.scalarLong(req(322, "TileWidth")).toInt else width
    val blockHeight: Int =
      if (tiled) r.scalarLong(req(323, "TileLength")).toInt
      else math.min(height.toLong, tagLong(278, height.toLong)).toInt
    val blocksPerRow: Int = (width + blockWidth - 1) / blockWidth
    val blocksPerCol: Int = (height + blockHeight - 1) / blockHeight
    private val offsetsTag = if (tiled) req(324, "TileOffsets") else req(273, "StripOffsets")
    private val countsTag = if (tiled) req(325, "TileByteCounts") else req(279, "StripByteCounts")

    // --- GDAL metadata (poor-man XML parse, like GTiffGrid's ctor) ----------
    private val metadataAndRoles: (Map[(Int, String), String],
                                   Array[Double], Array[Double]) = {
      val out = mutable.Map.empty[(Int, String), String]
      var sc: Array[Double] = null
      var of: Array[Double] = null
      tags.get(42112).foreach { e =>
        val text = r.ascii(e)
        var pos = 0
        var continue = true
        while (continue) {
          val it = text.indexOf("<Item ", pos)
          if (it < 0) continue = false
          else {
            val endTag = text.indexOf('>', it)
            val endValue = if (endTag < 0) -1 else text.indexOf('<', endTag)
            if (endTag < 0 || endValue < 0) continue = false
            else {
              val attrs = text.substring(it, endTag)
              val value = text.substring(endTag + 1, endValue)
              def attr(k: String): Option[String] = {
                val p = attrs.indexOf(k + "=\"")
                if (p < 0) None
                else {
                  val s = p + k.length + 2
                  val q = attrs.indexOf('"', s)
                  if (q < 0) None else Some(attrs.substring(s, q))
                }
              }
              attr("name") match {
                case Some(n) =>
                  val sample = attr("sample").map(_.toInt).getOrElse(-1)
                  out((sample, n)) = value
                  attr("role").foreach { role =>
                    if ((role == "offset" || role == "scale") && sample >= 0 &&
                        sample < spp) {
                      if (sc == null) {
                        sc = Array.fill(spp)(1.0); of = Array.fill(spp)(0.0)
                      }
                      try {
                        if (role == "offset") of(sample) = value.toDouble
                        else sc(sample) = value.toDouble
                      } catch { case _: NumberFormatException => }
                    }
                  }
                case None => continue = false
              }
              pos = endValue + 1
            }
          }
        }
      }
      (out.toMap, sc, of)
    }
    val metadata: Map[(Int, String), String] = metadataAndRoles._1
    private val scales: Array[Double] = metadataAndRoles._2
    private val offsets: Array[Double] = metadataAndRoles._3

    def metadataItem(key: String, sample: Int = -1): String =
      metadata.getOrElse((sample, key), "")

    val (hasNodata, noData): (Boolean, Float) = tags.get(42113) match {
      case Some(e) =>
        try (true, r.ascii(e).trim.toDouble.toFloat)
        catch { case _: NumberFormatException => (false, 0.0f) }
      case None => (false, 0.0f)
    }

    // --- georeferencing -----------------------------------------------------
    val (extent, bottomUp): (GridExtent, Boolean) = {
      var geographic = true
      var pixelIsArea = false
      tags.get(34735).foreach { e =>
        val count = e.count.toInt
        if (count < 4 || count % 4 != 0) throw BadGrid("bad GeoKeys tag")
        if (r.scalarLong(e, 0) != 1) throw BadGrid("unsupported GeoTIFF version")
        var i = 4
        while (i + 3 < count) {
          val key = r.scalarLong(e, i)
          val value = r.scalarLong(e, i + 3)
          if (key == 1024) { // GTModelTypeGeoKey
            if (value == 1) geographic = false
            else if (value != 2) throw BadGrid("unsupported model type")
          } else if (key == 1025 && value == 1) pixelIsArea = true
          i += 4
        }
      }
      var west = 0.0; var north = 0.0; var hRes = 0.0; var vRes = 0.0
      tags.get(34264) match {
        case Some(m) if m.count == 16 =>
          if (r.scalarDouble(m, 1) != 0 || r.scalarDouble(m, 4) != 0)
            throw BadGrid("rotational terms not supported")
          west = r.scalarDouble(m, 3)
          hRes = r.scalarDouble(m, 0)
          north = r.scalarDouble(m, 7)
          vRes = -r.scalarDouble(m, 5)
        case _ =>
          val ps = tags.getOrElse(33550, throw BadGrid("no GeoPixelScale tag"))
          if (ps.count != 3) throw BadGrid("bad GeoPixelScale tag")
          hRes = r.scalarDouble(ps, 0)
          vRes = r.scalarDouble(ps, 1)
          val tp = tags.getOrElse(33922, throw BadGrid("no GeoTiePoints tag"))
          if (tp.count != 6) throw BadGrid("bad GeoTiePoints tag")
          west = r.scalarDouble(tp, 3) - r.scalarDouble(tp, 0) * hRes
          north = r.scalarDouble(tp, 4) + r.scalarDouble(tp, 1) * vRes
      }
      if (pixelIsArea) { west += 0.5 * hRes; north -= 0.5 * vRes }
      val mul = if (geographic) math.Pi / 180.0 else 1.0
      var n0 = north * mul
      var s0 = (north - vRes * (height - 1)) * mul
      if (vRes < 0) { val t = n0; n0 = s0; s0 = t }
      val ext = GridExtent(
        west = west * mul, south = s0,
        east = (west + hRes * (width - 1)) * mul, north = n0,
        resX = hRes * mul, resY = math.abs(vRes) * mul,
        geographic = geographic)
      if (!((!geographic ||
             (math.abs(ext.west) <= 4 * math.Pi && math.abs(ext.east) <= 4 * math.Pi &&
              math.abs(ext.north) <= math.Pi + 1e-5 &&
              math.abs(ext.south) <= math.Pi + 1e-5)) &&
            ext.west < ext.east && ext.south < ext.north &&
            ext.resX > 1e-10 && ext.resY > 1e-10))
        throw BadGrid("inconsistent georeferencing")
      (ext, vRes < 0)
    }

    // --- block decode + sample materialization -----------------------------

    private def inflate(data: Array[Byte], outLen: Int): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new Array[Byte](outLen)
      var n = 0
      try {
        while (n < outLen && !inf.finished()) {
          val got = inf.inflate(out, n, outLen - n)
          if (got == 0 && inf.needsInput()) throw BadGrid("truncated deflate block")
          n += got
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw BadGrid(s"bad deflate stream: ${e.getMessage}")
      } finally inf.end()
      out
    }

    /** decoded block bytes (predictor undone), natural file byte order.
      * Tiles are padded to full tile size; the LAST strip holds only the
      * remaining image rows. */
    // decoded-block memo: a contiguous multi-channel raster re-reads every
    // block once PER CHANNEL (loadH twice, loadGeneric spp times) — memoize
    // the inflate/unpredict work for the loader's lifetime (load-time only;
    // the Raster object is discarded after the grid arrays are built, like
    // the reference's per-grid block cache)
    private val blockMemo = mutable.Map.empty[Int, Array[Byte]]
    private def block(blockId: Int): Array[Byte] =
      blockMemo.getOrElseUpdate(blockId, blockImpl(blockId))

    private def blockImpl(blockId: Int): Array[Byte] = {
      val rowSamples = blockWidth * (if (planarSeparate) 1 else spp)
      val rowBytes = rowSamples * bytesPerSample
      val rowsInBlock =
        if (tiled) blockHeight
        else {
          val stripIdx = blockId % math.max(1, blocksPerRow * blocksPerCol)
          math.min(blockHeight, height - (stripIdx / blocksPerRow) * blockHeight)
        }
      val outLen = rowBytes * rowsInBlock
      val off = r.scalarLong(offsetsTag, blockId)
      val cnt = r.scalarLong(countsTag, blockId)
      val encoded = r.raw(off, cnt)
      val data =
        if (compression == 1) {
          if (encoded.length < outLen) throw BadGrid("truncated block")
          encoded
        } else inflate(encoded, outLen)
      predictor match {
        case 1 => data
        case 2 =>
          // horizontal differencing on sample values, per row
          val stride = if (planarSeparate) 1 else spp
          val bb = ByteBuffer.wrap(data).order(r.order)
          var row = 0
          while (row < rowsInBlock) {
            val base = row * rowSamples
            var i = stride
            while (i < rowSamples) {
              if (bytesPerSample == 2)
                bb.putShort((base + i) * 2,
                  (bb.getShort((base + i) * 2) + bb.getShort((base + i - stride) * 2)).toShort)
              else if (bytesPerSample == 4)
                bb.putInt((base + i) * 4,
                  bb.getInt((base + i) * 4) + bb.getInt((base + i - stride) * 4))
              else throw BadGrid("predictor 2 on unsupported sample size")
              i += 1
            }
            row += 1
          }
          data
        case 3 =>
          // floating-point predictor: per row, byte-delta accumulate with
          // stride = samples-per-pixel, then reassemble from MSB-first
          // byte planes (libtiff fpAcc convention)
          val stride = if (planarSeparate) 1 else spp
          val out = new Array[Byte](outLen)
          var row = 0
          while (row < rowsInBlock) {
            val base = row * rowBytes
            var i = stride
            while (i < rowBytes) {
              data(base + i) = (data(base + i) + data(base + i - stride)).toByte
              i += 1
            }
            // plane b holds byte (bps-1-b) of each value (big-endian planes)
            var s = 0
            while (s < rowSamples) {
              var b = 0
              while (b < bytesPerSample) {
                out(base + s * bytesPerSample + b) = data(base + b * rowSamples + s)
                b += 1
              }
              s += 1
            }
            row += 1
          }
          // reassembled values are big-endian regardless of container order
          return out
        case p => throw BadGrid(s"unsupported predictor $p")
      }
    }

    /** materialize one sample channel as float rows SOUTH -> NORTH,
      * x west -> east; scale/offset applied except on nodata (mirrors
      * GTiffGrid::readValue). */
    def sampleArray(sample: Int): Array[Float] = {
      val out = new Array[Float](width * height)
      val blocks = blocksPerRow * blocksPerCol
      val valOrder = if (predictor == 3) ByteOrder.BIG_ENDIAN else r.order
      val scale = if (scales != null) scales(sample) else 1.0
      val offset = if (offsets != null) offsets(sample) else 0.0
      val applyScale = scales != null
      var by = 0
      while (by < blocksPerCol) {
        var bx = 0
        while (bx < blocksPerRow) {
          var blockId = by * blocksPerRow + bx
          if (planarSeparate) blockId += sample * blocks
          val data = block(blockId)
          val bb = ByteBuffer.wrap(data).order(valOrder)
          val rowSamples = blockWidth * (if (planarSeparate) 1 else spp)
          val x0 = bx * blockWidth
          val yT0 = by * blockHeight
          val w = math.min(blockWidth, width - x0)
          val h = math.min(blockHeight, height - yT0)
          var ry = 0
          while (ry < h) {
            val yTIFF = yT0 + ry
            val y = if (bottomUp) yTIFF else height - 1 - yTIFF
            var rx = 0
            while (rx < w) {
              val idxInRow =
                if (planarSeparate) rx else rx * spp + sample
              val o = (ry * rowSamples + idxInRow) * bytesPerSample
              val raw: Double = (sampleFormat, bits) match {
                case (2, 16) => bb.getShort(o).toDouble
                case (1, 16) => (bb.getShort(o) & 0xffff).toDouble
                case (2, 32) => bb.getInt(o).toDouble
                case (1, 32) => (bb.getInt(o) & 0xffffffffL).toDouble
                case (3, 32) => bb.getFloat(o).toDouble
                case _       => bb.getDouble(o)
              }
              val v =
                if (applyScale && !(hasNodata && raw.toFloat == noData))
                  (raw * scale + offset).toFloat
                else raw.toFloat
              out(y * width + (x0 + rx)) = v
              rx += 1
            }
            ry += 1
          }
          bx += 1
        }
        by += 1
      }
      out
    }
  }

  // --- public loaders -------------------------------------------------------

  /** Parse IFDs into rasters; a malformed IFD after the first one ends
    * the grid list (the reference's nextGrid() returns null there and
    * open() breaks out of its loop) instead of failing the whole file. */
  private def rasters(fileName: String, bytes: Array[Byte]): List[Raster] = {
    val r = new Reader(bytes)
    val out = mutable.ListBuffer.empty[Raster]
    var off = r.firstIfd
    var idx = 0
    var stop = false
    while (off != 0 && !stop) {
      val (tags, next) = r.ifdAt(off)
      try out += new Raster(r, tags, s"$fileName (ifd ${idx + 1})")
      catch {
        case e: BadGrid => if (idx == 0) throw e else stop = true
      }
      off = next
      idx += 1
      if (idx > 10000) throw BadGrid("runaway IFD chain")
    }
    if (out.isEmpty) throw BadGrid("no IFD")
    out.toList
  }

  /** reference: GTiffHGridShiftSet::open (grids.cpp:2492-2655). */
  def loadH(fileName: String, bytes: Array[Byte]): List[HGrid] = {
    val top = mutable.ListBuffer.empty[HGrid]
    val byName = mutable.Map.empty[String, HGrid]
    var ifd = 0
    for (g <- rasters(fileName, bytes)) {
      val ok = g.subfileType == 0 || g.subfileType == 2 // FILETYPE_PAGE
      if (!ok) {
        if (ifd == 0) throw BadGrid("invalid subfileType")
        // reduced-resolution overview: skip
      } else if (g.spp < 2) {
        if (ifd == 0) throw BadGrid("at least 2 samples per pixel needed")
      } else {
        var idxLat = 0
        var idxLon = 1
        var anyDesc = false
        var foundLat = false
        var foundLon = false
        for (i <- 0 until g.spp) {
          val d = g.metadataItem("DESCRIPTION", i)
          if (d.nonEmpty) anyDesc = true
          if (d == "latitude_offset") { idxLat = i; foundLat = true }
          else if (d == "longitude_offset") { idxLon = i; foundLon = true }
        }
        if (anyDesc && !foundLat && !foundLon) {
          if (ifd == 0)
            throw BadGrid("IFD 0 has channel descriptions but no offset channels")
          // else: auxiliary IFD, skip
        } else if (foundLat != foundLon) {
          throw BadGrid("only one of latitude_offset/longitude_offset found")
        } else {
          var positiveEast = true
          if (foundLon) {
            g.metadataItem("positive_value", idxLon) match {
              case "" | "east" => positiveEast = true
              case "west"      => positiveEast = false
              case o => throw BadGrid(s"unsupported positive_value $o")
            }
          }
          val unitLat = g.metadataItem("UNITTYPE", idxLat)
          val unitLon = g.metadataItem("UNITTYPE", idxLon)
          if (unitLat != unitLon)
            throw BadGrid("different units for lat/lon offsets")
          val conv = unitLat match {
            case "" | "arc-second" | "arc-seconds per year" => ArcSecToRad
            case "radian" => 1.0
            case "degree" => math.Pi / 180.0
            case o => throw BadGrid(s"unsupported unit $o")
          }
          val latRaw = g.sampleArray(idxLat)
          val lonRaw = g.sampleArray(idxLon)
          val lat = new Array[Float](latRaw.length)
          val lon = new Array[Float](lonRaw.length)
          var i = 0
          while (i < latRaw.length) {
            lat(i) = (latRaw(i) * conv).toFloat
            val l = (lonRaw(i) * conv).toFloat
            lon(i) = if (positiveEast) l else -l
            i += 1
          }
          val hg = new HGrid(g.name, g.width, g.height, g.extent, lon, lat,
            rawWestPositive = false)
          insertHierarchyH(hg, g.metadataItem("grid_name"),
            g.metadataItem("parent_grid_name"), top, byName)
        }
      }
      ifd += 1
    }
    if (top.isEmpty) throw BadGrid(s"$fileName: no usable horizontal grid")
    top.toList
  }

  /** reference: GTiffVGridShiftSet::open (grids.cpp:1430-1610). */
  def loadV(fileName: String, bytes: Array[Byte]): List[VGrid] = {
    val top = mutable.ListBuffer.empty[VGrid]
    val byName = mutable.Map.empty[String, VGrid]
    var ifd = 0
    for (g <- rasters(fileName, bytes)) {
      val ok = g.subfileType == 0 || g.subfileType == 2
      if (!ok) {
        if (ifd == 0) throw BadGrid("invalid subfileType")
      } else {
        var idxSample = 0
        var anyDesc = false
        var found = false
        for (i <- 0 until g.spp) {
          val d = g.metadataItem("DESCRIPTION", i)
          if (d.nonEmpty) anyDesc = true
          if (d == "geoid_undulation" || d == "vertical_offset" ||
              d == "hydroid_height" || d == "ellipsoidal_height_offset") {
            idxSample = i
            found = true
          }
        }
        if (anyDesc && !found) {
          if (ifd == 0)
            throw BadGrid("IFD 0 has channel descriptions but no vertical channel")
          // else skip auxiliary IFD
        } else {
          val vals = g.sampleArray(idxSample)
          val vg = new VGrid(g.name, g.width, g.height, g.extent, vals,
            nodataOverride = if (g.hasNodata) Some(g.noData) else None)
          insertHierarchyV(vg, g.metadataItem("grid_name"),
            g.metadataItem("parent_grid_name"), top, byName)
        }
      }
      ifd += 1
    }
    if (top.isEmpty) throw BadGrid(s"$fileName: no usable vertical grid")
    top.toList
  }

  /** reference: GTiffGenericGridShiftSet::open (grids.cpp:3005-3055) —
    * every sample channel retained; TYPE metadata inherited from the
    * file's first grid when absent. */
  def loadGeneric(fileName: String, bytes: Array[Byte]): List[GenGrid] = {
    val top = mutable.ListBuffer.empty[GenGrid]
    val byName = mutable.Map.empty[String, GenGrid]
    var first: GenGrid = null
    var ifd = 0
    for (g <- rasters(fileName, bytes)) {
      val ok = g.subfileType == 0 || g.subfileType == 2
      if (!ok) {
        if (ifd == 0) throw BadGrid("invalid subfileType")
      } else {
        val samples = Array.tabulate(g.spp)(g.sampleArray)
        val gg = new GenGrid(g.name, g.width, g.height, g.extent, samples,
          g.metadata, g.hasNodata, g.noData)
        if (first != null && gg.meta.getOrElse((-1, "TYPE"), "").isEmpty &&
            first.meta.getOrElse((-1, "TYPE"), "").nonEmpty)
          gg.firstMeta = first.meta
        if (first == null) first = gg
        insertHierarchyG(gg, g.metadataItem("grid_name"),
          g.metadataItem("parent_grid_name"), top, byName)
      }
      ifd += 1
    }
    if (top.isEmpty) throw BadGrid(s"$fileName: no usable grid")
    top.toList
  }

  // --- hierarchy (reference: insertIntoHierarchy, grids.cpp:1382-1440) -----

  /** One body for all three grid types (the reference templates this):
    * named-parent insertion with extent check, else bbox-containment
    * descent from the top-level grids.  The type is abstracted by its
    * extent/children accessors since HGrid/VGrid/GenGrid share no trait. */
  private def insertHierarchy[G](g: G, gridName: String, parentName: String,
                                 top: mutable.ListBuffer[G],
                                 byName: mutable.Map[String, G],
                                 extentOf: G => GridExtent,
                                 childrenOf: G => List[G],
                                 addChild: (G, G) => Unit): Unit = {
    def insertByBbox(parent: G, child: G): Unit = {
      for (c <- childrenOf(parent))
        if (containsExt(extentOf(c), extentOf(child))) {
          insertByBbox(c, child); return
        }
      addChild(parent, child)
    }
    if (gridName.nonEmpty) byName(gridName) = g
    if (parentName.nonEmpty) {
      byName.get(parentName) match {
        case Some(p) if containsExt(extentOf(p), extentOf(g)) =>
          addChild(p, g)
          return
        case _ =>
      }
    } else if (gridName.nonEmpty) { top += g; return }
    // bbox fallback
    for (cand <- top)
      if (containsExt(extentOf(cand), extentOf(g))) { insertByBbox(cand, g); return }
    top += g
  }

  private def insertHierarchyG(g: GenGrid, gridName: String, parentName: String,
                               top: mutable.ListBuffer[GenGrid],
                               byName: mutable.Map[String, GenGrid]): Unit =
    insertHierarchy[GenGrid](g, gridName, parentName, top, byName,
      _.extent, _.children, (p, c) => p.children = p.children :+ c)

  private def insertHierarchyH(g: HGrid, gridName: String, parentName: String,
                               top: mutable.ListBuffer[HGrid],
                               byName: mutable.Map[String, HGrid]): Unit =
    insertHierarchy[HGrid](g, gridName, parentName, top, byName,
      _.extent, _.children, (p, c) => p.children = p.children :+ c)

  private def insertHierarchyV(g: VGrid, gridName: String, parentName: String,
                               top: mutable.ListBuffer[VGrid],
                               byName: mutable.Map[String, VGrid]): Unit =
    insertHierarchy[VGrid](g, gridName, parentName, top, byName,
      _.extent, _.children, (p, c) => p.children = p.children :+ c)

  /** reference: ExtentAndRes::contains (grids.cpp:97-100) */
  private def containsExt(a: GridExtent, b: GridExtent): Boolean =
    b.west >= a.west && b.east <= a.east && b.south >= a.south &&
      b.north <= a.north
}
