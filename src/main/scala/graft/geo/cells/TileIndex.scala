package graft.geo.cells

/** Slippy-map web tiles (XYZ / Bing quadkey) and Geohash — the two
  * remaining industry-standard cell addressings next to the S2-style
  * cube-face index ([[CellIndex]]) and the hex tiers ([[HexIndex]]).
  *
  * Both are closed-form in elementary functions, so unlike S2/ISEA they
  * are fully SQL-expressible: the driver verifies each against a complete
  * DuckDB replay (q_tile_xyz / q_quadkey / q_geohash).
  *
  *  1. '''XYZ web tiles''' — the spherical-Mercator tile pyramid every
  *     web map serves (z/x/y addressing; the raster layout of the
  *     reference's `webmerc`, /root/reference/src/projections/merc.cpp:
  *     76-84, discretized).  `x = floor((lon+180)/360 * 2^z)`,
  *     `y = floor((1 - asinh(tan lat)/pi)/2 * 2^z)`, indexes clamped to
  *     [0, 2^z-1] (no longitude wrap — callers normalize with adjlon
  *     semantics first if inputs may exceed +-180).  The Bing '''quadkey'''
  *     is the same tile spelled as base-4 digits MSB-first, so a parent
  *     tile is a string prefix — the string twin of [[CellIndex]]'s
  *     bit-prefix property, and the join/pruning key format raster tile
  *     stores actually use.
  *
  *  2. '''Geohash''' — the public base-32 alternating lon/lat bit
  *     interleave (Niemeyer), MSB-first starting with longitude; a parent
  *     geohash is again a string prefix.  Kept bit-compatible with the
  *     published scheme (verified against the canonical test vectors).
  *
  * All methods are static and allocation-light; the scalar ones are
  * called from generated code inside whole-stage codegen.
  */
object TileIndex extends Serializable {
  final val MaxZoom = 28 // 5 zoom bits + 2x28 xy bits = 61 < 64

  /** clamped tile index from a [0,1) fraction (NaN routes to 0 — the
    * deterministic in-range fallback; mirrors CellIndex.stIndex) */
  private def idx(frac: Double, n: Long): Long = {
    val i = math.floor(frac * n).toLong
    if (i < 0) 0L else if (i >= n) n - 1 else i
  }

  def tileX(lonDeg: Double, z: Int): Long =
    idx((lonDeg + 180.0) / 360.0, 1L << z)

  /** spherical-Mercator row.  Written as ln(tan+sqrt(tan^2+1)) — not
    * a library asinh — so the DuckDB oracle replay is the literally
    * identical floating-point expression. */
  def tileY(latDeg: Double, z: Int): Long = {
    val t = math.tan(math.toRadians(latDeg))
    val n = math.log(t + math.sqrt(t * t + 1.0))
    idx((1.0 - n / math.Pi) / 2.0, 1L << z)
  }

  /** id layout: [x:28][y:28][z:5] — parent at z-d is a shift of both
    * coordinate fields, so range-partitioning on ids co-locates the
    * pyramid exactly like CellIndex's Morton prefix. */
  def pack(z: Int, x: Long, y: Long): Long = {
    require(z >= 0 && z <= MaxZoom, s"zoom $z outside [0, $MaxZoom]")
    require(x >= 0 && x < (1L << z) && y >= 0 && y < (1L << z),
      s"tile ($x, $y) outside zoom-$z range")
    (x << 33) | (y << 5) | z.toLong
  }

  def tileId(lonDeg: Double, latDeg: Double, z: Int): Long =
    pack(z, tileX(lonDeg, z), tileY(latDeg, z))

  def zoomOf(id: Long): Int = (id & 0x1FL).toInt
  def xOf(id: Long): Long = id >>> 33
  def yOf(id: Long): Long = (id >>> 5) & ((1L << 28) - 1)

  /** ancestor tile — pure shift arithmetic (prefix chop in base 4) */
  def parent(id: Long, parentZ: Int): Long = {
    val z = zoomOf(id)
    require(parentZ >= 0 && parentZ <= z,
      s"parent zoom $parentZ outside [0, $z]")
    val d = z - parentZ
    pack(parentZ, xOf(id) >>> d, yOf(id) >>> d)
  }

  /** Bing quadkey: z base-4 digits MSB-first, digit = 2*yBit + xBit
    * (zoom 0 = the empty string, the Bing convention). */
  def quadkey(id: Long): String = {
    val z = zoomOf(id); val x = xOf(id); val y = yOf(id)
    val sb = new java.lang.StringBuilder(z)
    var i = z - 1
    while (i >= 0) {
      sb.append(('0' + (((y >>> i) & 1L) << 1 | ((x >>> i) & 1L)).toInt).toChar)
      i -= 1
    }
    sb.toString
  }

  /** quadkey text -> packed tile id; -1 for a malformed key (in-band:
    * the expression layer surfaces it as null) */
  def fromQuadkey(qk: String): Long = {
    val z = qk.length
    if (z > MaxZoom) return -1L
    var x = 0L; var y = 0L; var i = 0
    while (i < z) {
      val d = qk.charAt(i) - '0'
      if (d < 0 || d > 3) return -1L
      x = (x << 1) | (d & 1L); y = (y << 1) | ((d >> 1) & 1L)
      i += 1
    }
    pack(z, x, y)
  }

  /** tile center as (lonDeg, latDeg) — inverse spherical Mercator */
  def center(id: Long): (Double, Double) = {
    val z = zoomOf(id); val n = (1L << z).toDouble
    val lon = (xOf(id) + 0.5) / n * 360.0 - 180.0
    val lat = math.toDegrees(math.atan(math.sinh(
      math.Pi * (1.0 - 2.0 * (yOf(id) + 0.5) / n))))
    (lon, lat)
  }

  // ---- Geohash ----

  final val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  final val MaxPrecision = 12 // 60 bits < 64
  private val Rev: Array[Byte] = {
    val a = Array.fill[Byte](128)(-1)
    var i = 0
    while (i < Base32.length) {
      a(Base32.charAt(i)) = i.toByte
      // geohash is conventionally case-insensitive on decode
      a(Character.toUpperCase(Base32.charAt(i))) = i.toByte
      i += 1
    }
    a
  }

  def lonBits(precision: Int): Int = (5 * precision + 1) / 2
  def latBits(precision: Int): Int = (5 * precision) / 2

  /** the interleaved 5p-bit integer code (lon first, MSB-first) */
  def geohashCode(lonDeg: Double, latDeg: Double, precision: Int): Long = {
    require(precision >= 1 && precision <= MaxPrecision,
      s"geohash precision $precision outside [1, $MaxPrecision]")
    val lb = lonBits(precision); val tb = latBits(precision)
    val li = idx((lonDeg + 180.0) / 360.0, 1L << lb)
    val ti = idx((latDeg + 90.0) / 180.0, 1L << tb)
    val bits = 5 * precision
    var code = 0L; var j = 0
    while (j < bits) {
      val b =
        if ((j & 1) == 0) (li >>> (lb - 1 - (j >> 1))) & 1L
        else (ti >>> (tb - 1 - (j >> 1))) & 1L
      code = (code << 1) | b
      j += 1
    }
    code
  }

  def geohash(lonDeg: Double, latDeg: Double, precision: Int): String = {
    val code = geohashCode(lonDeg, latDeg, precision)
    val sb = new java.lang.StringBuilder(precision)
    var i = precision - 1
    while (i >= 0) {
      sb.append(Base32.charAt(((code >>> (5 * i)) & 31L).toInt))
      i -= 1
    }
    sb.toString
  }

  /** geohash text -> cell-center (lonDeg, latDeg); null for malformed
    * input (bad char / empty / too long) — the in-band error channel */
  def geohashCenter(gh: String): Array[Double] = {
    val p = gh.length
    if (p < 1 || p > MaxPrecision) return null
    var li = 0L; var ti = 0L; var lc = 0; var tc = 0
    var j = 0
    while (j < 5 * p) {
      val c = gh.charAt(j / 5)
      if (c >= 128) return null
      val v = Rev(c)
      if (v < 0) return null
      val b = (v >>> (4 - j % 5)) & 1
      if ((j & 1) == 0) { li = (li << 1) | b; lc += 1 }
      else { ti = (ti << 1) | b; tc += 1 }
      j += 1
    }
    Array((li + 0.5) / (1L << lc) * 360.0 - 180.0,
      (ti + 0.5) / (1L << tc) * 180.0 - 90.0)
  }
}
