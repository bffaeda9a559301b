package graft.geo.grids

import com.fasterxml.jackson.databind.ObjectMapper

/** GeoPackage-backed triangulation loader — the reference's
  * `tinshift_gpkg` path (/root/reference/src/transformations/
  * tinshift.cpp:103, tinshift_gpkg.hpp): the same TIN model as the JSON
  * format, stored as a `gpkg_metadata` JSON blob (everything except the
  * arrays) plus `vertices` (fid, point geometry, value columns) and
  * `triangles_def` (fid, idx_vertex1..3) tables.  Decoded with the
  * from-scratch [[SqliteFile]] page reader into the same [[TinModel]]
  * the JSON path builds, so evaluation (quadtree walk, barycentric
  * interpolation, fallbacks) is shared.
  */
object TinShiftGpkg {
  import TinShift.BadModel

  /** Does this payload look like an SQLite database?  (The reference
    * dispatches on the .gpkg extension OR the file magic.) */
  def isSqlite(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 &&
      new String(bytes, 0, 15, java.nio.charset.StandardCharsets.US_ASCII) ==
        "SQLite format 3" && bytes(15) == 0

  def parse(bytes: Array[Byte]): TinModel =
    try parseImpl(bytes)
    catch {
      case e: SqliteFile.NotSqlite => throw BadModel(e.getMessage)
      case _: IndexOutOfBoundsException => throw BadModel("gpkg: corrupt database file")
    }

  private def parseImpl(bytes: Array[Byte]): TinModel = {
    val db = new SqliteFile(bytes)

    def table(name: String): (List[db.Row], List[String]) = {
      val (root, sql) = db.tables.getOrElse(name,
        throw BadModel(s"gpkg: no $name table"))
      (db.scanTable(root), SqliteFile.columnsOf(sql))
    }

    // --- metadata JSON: the triangulation header without its arrays
    val (mdRows, mdCols) = table("gpkg_metadata")
    val mdIdx = mdCols.indexOf("metadata")
    if (mdIdx < 0 || mdRows.isEmpty) throw BadModel("gpkg: no metadata row")
    val mdJson = mdRows.head.values(mdIdx) match {
      case s: String => s
      case _ => throw BadModel("gpkg: metadata not text")
    }
    val root =
      try new ObjectMapper().readTree(mdJson)
      catch { case e: Exception => throw BadModel(s"gpkg metadata not JSON: ${e.getMessage}") }
    if (root == null || !root.isObject) throw BadModel("gpkg metadata not a JSON object")
    if (!root.has("file_type") ||
        root.get("file_type").asText() != "triangulation_file")
      throw BadModel("gpkg: not a triangulation_file")
    val formatVersion =
      if (root.has("format_version")) root.get("format_version").asText() else ""

    var fallback = TinShift.FallbackNone
    if (root.has("fallback_strategy")) {
      if (formatVersion != "1.1")
        throw BadModel("fallback_strategy needs format_version 1.1")
      root.get("fallback_strategy").asText() match {
        case "nearest_side"     => fallback = TinShift.FallbackNearestSide
        case "nearest_centroid" => fallback = TinShift.FallbackNearestCentroid
        case "none"             => fallback = TinShift.FallbackNone
        case o => throw BadModel(s"invalid fallback_strategy $o")
      }
    }
    var horizontal = false
    var vertical = false
    val tc = root.get("transformed_components")
    if (tc == null || !tc.isArray) throw BadModel("gpkg: missing transformed_components")
    tc.forEach { c =>
      c.asText() match {
        case "horizontal" => horizontal = true
        case "vertical"   => vertical = true
        case o => throw BadModel(s"transformed_components $o not handled")
      }
    }

    // --- vertices: fid + point geometry (source x/y) + value columns
    val (vRows, vCols) = table("vertices")
    def col(name: String): Int = vCols.indexOf(name)
    val geomIdx = col("geom")
    if (geomIdx < 0) throw BadModel("gpkg: vertices has no geom column")
    val tgtX = col("target_x"); val tgtY = col("target_y")
    val srcZ = col("source_z"); val tgtZ = col("target_z")
    val offZ = col("offset_z")
    if (horizontal && (tgtX < 0 || tgtY < 0))
      throw BadModel("gpkg: target_x/target_y required")
    if (vertical && offZ < 0 && (srcZ < 0 || tgtZ < 0))
      throw BadModel("gpkg: offset_z or source_z/target_z required")
    val fidIdx = col("fid")

    val colCount = 2 + (if (horizontal) 2 else 0) + (if (vertical) 1 else 0)
    val ordered = vRows.sortBy(_.rowid)
    val verts = new Array[Double](colCount * ordered.size)
    val posOfFid = new java.util.HashMap[Long, Int](ordered.size * 2)
    var i = 0
    for (r <- ordered) {
      // fid is usually the rowid alias (NULL in the record payload)
      val fid = (if (fidIdx >= 0) r.values(fidIdx) else null) match {
        case l: java.lang.Long => l.longValue()
        case _ => r.rowid
      }
      posOfFid.put(fid, i)
      def num(idx: Int): Double = r.values(idx) match {
        case d: java.lang.Double => d.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case _ => throw BadModel("gpkg: vertex value not numeric")
      }
      val (sx, sy) = r.values(geomIdx) match {
        case b: Array[Byte] => decodePoint(b)
        case _ => throw BadModel("gpkg: geom not a blob")
      }
      var o = colCount * i
      verts(o) = sx; o += 1
      verts(o) = sy; o += 1
      if (horizontal) { verts(o) = num(tgtX); o += 1; verts(o) = num(tgtY); o += 1 }
      if (vertical)
        verts(o) = if (offZ >= 0) num(offZ) else num(tgtZ) - num(srcZ)
      i += 1
    }

    // --- triangles: vertex references are fids
    val (tRows, tCols) = table("triangles_def")
    val iv = Array("idx_vertex1", "idx_vertex2", "idx_vertex3").map(tCols.indexOf)
    if (iv.exists(_ < 0)) throw BadModel("gpkg: idx_vertex1..3 required")
    val tris = new Array[Int](3 * tRows.size)
    var t = 0
    for (r <- tRows.sortBy(_.rowid)) {
      var j = 0
      while (j < 3) {
        val fid = r.values(iv(j)) match {
          case l: java.lang.Long => l.longValue()
          case _ => throw BadModel("gpkg: triangle index not integer")
        }
        val pos = posOfFid.getOrDefault(fid, -1)
        if (pos < 0) throw BadModel(s"gpkg: triangle references unknown vertex $fid")
        tris(3 * t + j) = pos
        j += 1
      }
      t += 1
    }
    new TinModel(horizontal, vertical, fallback, colCount, verts, tris)
  }

  /** GeoPackage geometry blob -> (x, y): "GP" magic, version, flags
    * (envelope indicator + endianness), srs_id, optional envelope, then a
    * WKB 2D/Z point (OGC GeoPackage §2.1.3 BLOB format). */
  private def decodePoint(b: Array[Byte]): (Double, Double) = {
    if (b.length < 8 + 5 + 16 || b(0) != 'G' || b(1) != 'P')
      throw BadModel("gpkg: bad geometry blob")
    val flags = b(3) & 0xff
    val envSize = ((flags >> 1) & 7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case _ => throw BadModel("gpkg: invalid envelope indicator")
    }
    var o = 8 + envSize
    val little = b(o) == 1
    o += 1
    def u32(): Long = {
      val v =
        if (little)
          (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
            ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        else
          ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
            ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      o += 4
      v
    }
    def f64(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) {
        val by = b(o + (if (little) i else 7 - i)) & 0xffL
        bits |= by << (8 * i)
        i += 1
      }
      o += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    val wkbType = u32() & 0xffffffL // mask Z/M/SRID flag bits
    if (wkbType % 1000 != 1) throw BadModel(s"gpkg: geometry is not a point ($wkbType)")
    val x = f64()
    val y = f64()
    (x, y)
  }
}
