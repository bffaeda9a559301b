package graft.geo.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._

import graft.geo.kernels.{IOUnits, PointKernel}
import graft.geo.math.{ProjMath => M}

/** Runtime evaluator for a [[PointKernel]]: one monomorphic call site per
  * generated loop, so the JIT inlines the kernel body into the
  * whole-stage-codegen loop.  Degrees<->radians conversion happens here at
  * the column boundary (kernels are radians-internal, user columns are
  * degrees — mirroring PROJ's gie convention). */
final class PointEvaluator(kernel: PointKernel, forward: Boolean,
                           outDims: Int) extends Serializable {
  private val degIn =
    (if (forward) kernel.left else kernel.right) == IOUnits.Radians
  private val degOut =
    (if (forward) kernel.right else kernel.left) == IOUnits.Radians

  def eval(x: Double, y: Double, z: Double, t: Double): InternalRow = {
    val v = new Array[Double](4)
    if (degIn) { v(0) = x * M.DegToRad; v(1) = y * M.DegToRad }
    else { v(0) = x; v(1) = y }
    v(2) = z; v(3) = t
    val ok = if (forward) kernel.fwd(v) else kernel.inv(v)
    if (!ok) return null
    if (degOut) { v(0) = v(0) * M.RadToDeg; v(1) = v(1) * M.RadToDeg }
    new DoubleVecRow(v, outDims)
  }
}

/** Boxing-free InternalRow over a primitive double vector — the struct
  * consumers in the codegen stage only call getDouble/numFields (struct
  * field access), and stage sinks copy into unsafe rows, so the minimal
  * surface suffices. */
final class DoubleVecRow(vals: Array[Double], n: Int) extends InternalRow {
  override def numFields: Int = n
  override def getDouble(i: Int): Double = vals(i)
  override def isNullAt(i: Int): Boolean = false
  override def get(i: Int, dt: DataType): AnyRef = java.lang.Double.valueOf(vals(i))
  override def copy(): InternalRow = new DoubleVecRow(vals.clone(), n)
  override def setNullAt(i: Int): Unit = throw new UnsupportedOperationException
  override def update(i: Int, v: Any): Unit = throw new UnsupportedOperationException
  override def getBoolean(i: Int): Boolean = throw new UnsupportedOperationException
  override def getByte(i: Int): Byte = throw new UnsupportedOperationException
  override def getShort(i: Int): Short = throw new UnsupportedOperationException
  override def getInt(i: Int): Int = throw new UnsupportedOperationException
  override def getLong(i: Int): Long = throw new UnsupportedOperationException
  override def getFloat(i: Int): Float = throw new UnsupportedOperationException
  override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
    throw new UnsupportedOperationException
  override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
    throw new UnsupportedOperationException
  override def getBinary(i: Int): Array[Byte] = throw new UnsupportedOperationException
  override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval =
    throw new UnsupportedOperationException
  override def getStruct(i: Int, numFields: Int): InternalRow =
    throw new UnsupportedOperationException
  override def getArray(i: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    throw new UnsupportedOperationException
  override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
    throw new UnsupportedOperationException
  override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
    throw new UnsupportedOperationException
  override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
    throw new UnsupportedOperationException
  override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
    throw new UnsupportedOperationException
}

/** Coordinate transform as a Catalyst expression: (x|lon, y|lat, z, t) ->
  * struct of `outDims` doubles.  The kernel's setup-time constants ride
  * along in the serialized plan (PROJ's setup/apply split, SURVEY.md
  * §1.2); evaluation participates in whole-stage codegen via a reference
  * object — no UDF, no interpreter fallback. */
case class PointTransformExpr(first: Expression, second: Expression,
                              third: Expression, fourth: Expression,
                              kernel: PointKernel, forward: Boolean,
                              outDims: Int)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  require(outDims >= 2 && outDims <= 4)

  @transient private lazy val evaluator = new PointEvaluator(kernel, forward, outDims)

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String =
    (if (forward) "proj_fwd_" else "proj_inv_") + kernel.getClass.getSimpleName

  override def dataType: DataType = {
    val names = Array("x", "y", "z", "t")
    StructType((0 until outDims).map(i =>
      StructField(names(i), DoubleType, nullable = false)))
  }

  override def inputTypes =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    evaluator.eval(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val refName = ctx.addReferenceObj("pointEval", evaluator,
        classOf[PointEvaluator].getName)
      val row = ctx.freshName("projRow")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row =
         |  $refName.eval($a, $b, $c, $d);
         |if ($row == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $row; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** lon/lat (degrees) -> S2-style cell id at a fixed level (LongType).
  * Single scalar output: no boxing, fully codegen'd via a static call. */
case class CellIdExpr(left: Expression, right: Expression, level: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(level >= 0 && level <= graft.geo.cells.CellIndex.MaxUsableLevel)
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def prettyName: String = s"cell_id_l$level"

  protected override def nullSafeEval(lon: Any, lat: Any): Any =
    graft.geo.cells.CellIndex.cellId(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"graft.geo.cells.CellIndex$$.MODULE$$.cellId($lon, $lat, $level)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** parent cell at a coarser level — pure bit arithmetic, inlined. */
case class CellParentExpr(child: Expression, parentLevel: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  // plan-time bound (the child-relative check stays per-row in
  // CellIndex.parent): a negative level would OR sign-extended garbage
  // into every emitted id with no error
  require(parentLevel >= 0 &&
    parentLevel <= graft.geo.cells.CellIndex.MaxUsableLevel,
    s"cell_parent level $parentLevel outside [0, ${graft.geo.cells.CellIndex.MaxUsableLevel}]")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes = Seq(LongType)
  override def prettyName: String = s"cell_parent_l$parentLevel"
  protected override def nullSafeEval(id: Any): Any =
    graft.geo.cells.CellIndex.parent(id.asInstanceOf[Long], parentLevel)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"graft.geo.cells.CellIndex$$.MODULE$$.parent($id, $parentLevel)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** cell id -> struct(face, i, j): de-interleaves the Morton index (the
  * inverse of the encoder; lets tiling outputs be keyed by coordinates an
  * independent SQL implementation can recompute). */
case class CellDecodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("face", IntegerType, nullable = false),
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false)))
  override def inputTypes = Seq(LongType)
  override def prettyName: String = "cell_decode"
  protected override def nullSafeEval(idAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val c = graft.geo.cells.CellIndex
    val level = c.levelOf(id)
    val mask = (1L << level) - 1
    new GenericInternalRow(Array[Any](
      c.faceOfId(id), c.iOf(id) & mask, c.jOf(id) & mask))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id => {
      val c = "graft.geo.cells.CellIndex$.MODULE$"
      val lvl = ctx.freshName("lvl")
      val mask = ctx.freshName("mask")
      s"""
         |int $lvl = $c.levelOf($id);
         |long $mask = (1L << $lvl) - 1;
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ (Object)(Integer)$c.faceOfId($id),
         |                (Object)(Long)($c.iOf($id) & $mask),
         |                (Object)(Long)($c.jOf($id) & $mask) });
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** The (2k+1)^2 neighborhood of a cell (array<long>) — kNN candidate
  * generation; explodes into an equi-join key. */
case class CellNeighborsExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  // plan-time bounds: k < 0 silently returns an empty neighborhood
  // (emptying a kNN candidate set with no error) and a huge k runs
  // (2k+1)^2 set insertions per row
  require(k >= 0 && k <= 32,
    s"cell_neighbors ring k=$k outside [0, 32] ((2k+1)^2 cells per row)")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(LongType)
  override def prettyName: String = s"cell_neighbors_$k"
  protected override def nullSafeEval(id: Any): Any =
    new GenericArrayData(
      graft.geo.cells.CellIndex.neighborhood(id.asInstanceOf[Long], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.geo.cells.CellIndex$$.MODULE$$.neighborhood($id, $k))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Projected (x, y) metres -> packed planar axial hex id (pointy-top,
  * circumradius `size` metres) — the planar tier of the hex index
  * ([[graft.geo.cells.HexIndex]]).  Closed-form, fully codegen'd, and
  * mirrored verbatim by the DuckDB oracle of q_hex_occupancy. */
case class HexBinExpr(left: Expression, right: Expression, size: Double)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(size > 0.0 && java.lang.Double.isFinite(size),
    s"hex size $size must be a positive finite length in metres")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def prettyName: String = s"hex_bin_$size"

  protected override def nullSafeEval(x: Any, y: Any): Any =
    graft.geo.cells.HexIndex.bin(
      x.asInstanceOf[Double], y.asInstanceOf[Double], size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.geo.cells.HexIndex$$.MODULE$$.bin($x, $y, $size)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** packed hex id -> struct(q, r, x, y): axial coordinates plus the hex
  * center in projected metres (lets an independent SQL implementation
  * recompute the binning, and maps ids back to geometry). */
case class HexDecodeExpr(child: Expression, size: Double)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("q", LongType, nullable = false),
    StructField("r", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
  override def inputTypes = Seq(LongType)
  override def prettyName: String = "hex_decode"
  protected override def nullSafeEval(idAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val h = graft.geo.cells.HexIndex
    new GenericInternalRow(Array[Any](
      h.unpackQ(id), h.unpackR(id), h.centerX(id, size), h.centerY(id, size)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id => {
      val h = "graft.geo.cells.HexIndex$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ (Object)(Long)$h.unpackQ($id),
         |                (Object)(Long)$h.unpackR($id),
         |                (Object)(Double)$h.centerX($id, $size),
         |                (Object)(Double)$h.centerY($id, $size) });
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** all hexes within grid distance k of a packed hex id (3k^2+3k+1 cells,
  * array<long>) — candidate generation for hex-indexed joins, the hex
  * counterpart of CellNeighborsExpr. */
case class HexDiskExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 0 && k <= 64, s"hex_disk k=$k outside [0, 64]")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(LongType)
  override def prettyName: String = s"hex_disk_$k"
  protected override def nullSafeEval(id: Any): Any =
    new GenericArrayData(
      graft.geo.cells.HexIndex.disk(id.asInstanceOf[Long], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.geo.cells.HexIndex$$.MODULE$$.disk($id, $k))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** lon/lat degrees -> ISEA equal-area hex DGGS id (aperture 3 or 4) —
  * the icosahedral tier of the hex index; the binning math is the
  * gie-validated IseaKernel (`+proj=isea +mode=hex`).  Nullable: a
  * non-finite coordinate fails the kernel and yields null. */
case class IseaHexIdExpr(left: Expression, right: Expression,
                         resolution: Int, aperture: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  @transient private lazy val binner =
    new graft.geo.cells.HexIndex.IseaBinner(resolution, aperture)
  // validate plan-time (the lazy binner would otherwise defer the
  // require to first row)
  new graft.geo.cells.HexIndex.IseaBinner(resolution, aperture)

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def prettyName: String = s"isea_hex_r${resolution}_a$aperture"

  protected override def nullSafeEval(lon: Any, lat: Any): Any = {
    val r = binner.id(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("iseaBinner", binner,
      classOf[graft.geo.cells.HexIndex.IseaBinner].getName)
    nullSafeCodeGen(ctx, ev, (lon, lat) => {
      val boxed = ctx.freshName("iseaId")
      s"""
         |java.lang.Long $boxed = $ref.id($lon, $lat);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** lon/lat degrees -> packed XYZ web-map tile id at a fixed zoom
  * (slippy-map spherical-Mercator pyramid, [[graft.geo.cells.TileIndex]]).
  * Closed-form, fully codegen'd, and mirrored verbatim by the DuckDB
  * oracle of q_tile_xyz. */
case class TileIdExpr(left: Expression, right: Expression, zoom: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(zoom >= 0 && zoom <= graft.geo.cells.TileIndex.MaxZoom,
    s"tile zoom $zoom outside [0, ${graft.geo.cells.TileIndex.MaxZoom}]")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def prettyName: String = s"tile_id_z$zoom"

  protected override def nullSafeEval(lon: Any, lat: Any): Any =
    graft.geo.cells.TileIndex.tileId(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double], zoom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"graft.geo.cells.TileIndex$$.MODULE$$.tileId($lon, $lat, $zoom)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** packed tile id -> struct(z, x, y) — the raster-store addressing an
  * independent SQL implementation can recompute. */
case class TileDecodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("z", IntegerType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false)))
  override def inputTypes = Seq(LongType)
  override def prettyName: String = "tile_decode"
  protected override def nullSafeEval(idAny: Any): Any = {
    val id = idAny.asInstanceOf[Long]
    val t = graft.geo.cells.TileIndex
    new GenericInternalRow(Array[Any](t.zoomOf(id), t.xOf(id), t.yOf(id)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id => {
      val t = "graft.geo.cells.TileIndex$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ (Object)(Integer)$t.zoomOf($id),
         |                (Object)(Long)$t.xOf($id),
         |                (Object)(Long)$t.yOf($id) });
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** packed tile id -> Bing quadkey text (z base-4 digits, parent = string
  * prefix — the key format raster tile stores actually use). */
case class QuadkeyExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def inputTypes = Seq(LongType)
  override def prettyName: String = "quadkey"
  protected override def nullSafeEval(id: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.geo.cells.TileIndex.quadkey(id.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.geo.cells.TileIndex$$.MODULE$$.quadkey($id))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** quadkey text -> packed tile id; malformed input -> null (in-band). */
case class QuadkeyToTileExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "quadkey_to_tile"
  protected override def nullSafeEval(s: Any): Any = {
    val id = graft.geo.cells.TileIndex.fromQuadkey(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    if (id < 0) null else id
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val tmp = ctx.freshName("qkId")
      s"""
         |long $tmp = graft.geo.cells.TileIndex$$.MODULE$$.fromQuadkey($s.toString());
         |if ($tmp < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** lon/lat degrees -> geohash text at a fixed precision (Niemeyer base-32
  * alternating bit interleave; parent = string prefix).  Closed-form and
  * mirrored verbatim by the DuckDB oracle of q_geohash. */
case class GeohashExpr(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(precision >= 1 && precision <= graft.geo.cells.TileIndex.MaxPrecision,
    s"geohash precision $precision outside [1, ${graft.geo.cells.TileIndex.MaxPrecision}]")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def prettyName: String = s"geohash_p$precision"

  protected override def nullSafeEval(lon: Any, lat: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.geo.cells.TileIndex.geohash(
        lon.asInstanceOf[Double], lat.asInstanceOf[Double], precision))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.geo.cells.TileIndex$$.MODULE$$.geohash($lon, $lat, $precision))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** geohash text -> struct(lon, lat) cell center; malformed -> null. */
case class GeohashDecodeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "geohash_decode"
  protected override def nullSafeEval(s: Any): Any = {
    val c = graft.geo.cells.TileIndex.geohashCenter(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    if (c == null) null else new GenericInternalRow(Array[Any](c(0), c(1)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val tmp = ctx.freshName("ghCenter")
      s"""
         |double[] $tmp = graft.geo.cells.TileIndex$$.MODULE$$.geohashCenter($s.toString());
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ (Object)(Double)$tmp[0], (Object)(Double)$tmp[1] });
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Karney geodesic inverse distance (metres) between two lon/lat points
  * in degrees — the kNN ranking metric (SURVEY.md §2.5).  The Geodesic
  * instance (with its setup-time series constants) serializes with the
  * plan; codegen emits one virtual call per row, which the JIT
  * devirtualizes (single receiver). */
case class GeodesicDistExpr(first: Expression, second: Expression,
                            third: Expression, fourth: Expression,
                            geod: graft.geo.geodesic.Geodesic)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def prettyName: String = "geod_distance"

  override protected def nullSafeEval(lon1: Any, lat1: Any, lon2: Any, lat2: Any): Any =
    geod.distance(lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geod", geod,
      classOf[graft.geo.geodesic.Geodesic].getName)
    defineCodeGen(ctx, ev, (lon1, lat1, lon2, lat2) =>
      s"$ref.distance($lat1, $lon1, $lat2, $lon2)")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Karney geodesic direct problem: (lon1, lat1, azi deg, s12 m) ->
  * struct(lon2, lat2, azi2) — cell-ring kNN radius expansion. */
case class GeodesicDirectExpr(first: Expression, second: Expression,
                              third: Expression, fourth: Expression,
                              geod: graft.geo.geodesic.Geodesic)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("azi", DoubleType, nullable = false)))
  override def inputTypes = Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def prettyName: String = "geod_direct"

  override protected def nullSafeEval(lon1: Any, lat1: Any, azi: Any, s: Any): Any = {
    val d = geod.direct(lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      azi.asInstanceOf[Double], s.asInstanceOf[Double])
    new GenericInternalRow(Array[Any](d.lon2, d.lat2, d.azi2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geod", geod,
      classOf[graft.geo.geodesic.Geodesic].getName)
    nullSafeCodeGen(ctx, ev, (lon1, lat1, azi, s) => {
      val d = ctx.freshName("geodDirect")
      s"""
         |graft.geo.geodesic.GeodDirect $d = $ref.direct($lat1, $lon1, $azi, $s);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ (Object)(Double)$d.lon2(), (Object)(Double)$d.lat2(),
         |                (Object)(Double)$d.azi2() });
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Geodesic densification: the line between two lon/lat points split into
  * `n` equal-length segments -> array of n+1 struct(lon, lat, azi)
  * waypoints, endpoints included.  One line init (inverse solve + series
  * expansion) per row, then n cheap position evaluations — the
  * geod_lineinit/geod_position cost split (reference src/geodesic.c:419,
  * 662).  Trajectory tiling explodes the array and cell-encodes each
  * waypoint. */
case class GeodesicWaypointsExpr(first: Expression, second: Expression,
                                 third: Expression, fourth: Expression,
                                 n: Int, geod: graft.geo.geodesic.Geodesic)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  require(n >= 1 && n <= 100000,
    s"waypoint count n=$n outside [1, 100000] (allocates n+1 structs per row)")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("azi", DoubleType, nullable = false))), containsNull = false)
  override def inputTypes = Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def prettyName: String = s"geod_waypoints_$n"

  override protected def nullSafeEval(lon1: Any, lat1: Any, lon2: Any, lat2: Any): Any =
    GeodesicWaypointsExpr.waypoints(geod,
      lon1.asInstanceOf[Double], lat1.asInstanceOf[Double],
      lon2.asInstanceOf[Double], lat2.asInstanceOf[Double], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geod", geod,
      classOf[graft.geo.geodesic.Geodesic].getName)
    defineCodeGen(ctx, ev, (lon1, lat1, lon2, lat2) =>
      s"graft.geo.expr.GeodesicWaypointsExpr$$.MODULE$$.waypoints(" +
        s"$ref, $lon1, $lat1, $lon2, $lat2, $n)")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

object GeodesicWaypointsExpr {
  def waypoints(geod: graft.geo.geodesic.Geodesic,
                lon1: Double, lat1: Double, lon2: Double, lat2: Double,
                n: Int): GenericArrayData = {
    val line = geod.inverseLine(lat1, lon1, lat2, lon2)
    val out = new Array[Any](n + 1)
    var i = 0
    while (i <= n) {
      val p = line.position(line.s13 * i / n)
      out(i) = new GenericInternalRow(Array[Any](p.lon2, p.lat2, p.azi2))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Point-in-polygon test: (lon, lat, ring) where ring is a flat
  * array<double> [lon0,lat0, lon1,lat1, ...] of a closed (first==last not
  * required) simple polygon in lon/lat space.  Even-odd ray crossing with
  * the boundary counted as inside.  This is the refine step of the PIP
  * join (the coarse step is the cell-id equi-join); the pattern follows
  * PROJ's quadtree+triangle-walk in tinshift
  * (/root/reference/src/quadtree.hpp:85-199) re-expressed relationally. */
case class PointInPolygonExpr(first: Expression, second: Expression,
                              third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def inputTypes =
    Seq(DoubleType, DoubleType, ArrayType(DoubleType, containsNull = false))
  override def prettyName: String = "point_in_polygon"

  protected override def nullSafeEval(lon: Any, lat: Any, ring: Any): Any =
    PointInPolygonExpr.containsAd(lon.asInstanceOf[Double],
      lat.asInstanceOf[Double],
      ring.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, ring) =>
      // read the ArrayData in place: a per-row toDoubleArray() copy turns
      // the refine into a GC-bound stage at scale
      s"graft.geo.expr.PointInPolygonExpr$$.MODULE$$.containsAd(" +
        s"$lon, $lat, $ring)")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
}

/** Indexed point-in-polygon refine: the candidate row carries only a
  * small int ring index and the ring table rides the serialized plan
  * once per executor (a codegen reference object, the same shape as the
  * grid registry).  This replaces a broadcast-rings join whose output
  * copied the ring array into every candidate UnsafeRow — at 10^8
  * candidates that copy is the dominant allocation of the whole PIP
  * stage (measured: the refine leg of the 32M-point scaling probe
  * dropped ~40% wall when the per-row array copy went away). */
case class PointInPolygonIdxExpr(first: Expression, second: Expression,
                                 third: Expression,
                                 rings: Array[Array[Double]])
    extends TernaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def inputTypes = Seq(DoubleType, DoubleType, IntegerType)
  override def prettyName: String = "point_in_polygon_idx"

  protected override def nullSafeEval(lon: Any, lat: Any, idx: Any): Any =
    PointInPolygonExpr.contains(lon.asInstanceOf[Double],
      lat.asInstanceOf[Double], rings(idx.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rings", rings, "double[][]")
    defineCodeGen(ctx, ev, (lon, lat, idx) =>
      s"graft.geo.expr.PointInPolygonExpr$$.MODULE$$.contains(" +
        s"$lon, $lat, $ref[$idx])")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
}

/** One-pass geo-tag extraction from a document's media_ref span array:
  * first non-null ref, text after its last `?geo=`, two comma-separated
  * decimals -> struct(lat, lon); null struct / null fields when absent or
  * malformed.  Replaces a higher-order-function chain
  * (`element_at(filter(refs, isNotNull), 1)` + substring_index + split +
  * cast) that Catalyst cannot fuse into whole-stage codegen (ArrayFilter
  * is interpreted) and that the twin lat/lon projections re-evaluated up
  * to 6x per row — this walk touches each array slot at most once and
  * parses in place.  Semantics deliberately mirror the old chain on
  * well-formed tags; malformed numerics yield null instead of an ANSI
  * cast error (the engine's scans must never die on one bad document). */
case class SpanGeoTagExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("lat", DoubleType), StructField("lon", DoubleType)))
  override def inputTypes = Seq(ArrayType(StringType))
  override def prettyName: String = "span_geo_tag"

  protected override def nullSafeEval(arr: Any): Any =
    SpanGeoTagExpr.extract(
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = graft.geo.expr.SpanGeoTagExpr$$.MODULE$$.extract($arr);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SpanGeoTagExpr {
  def extract(arr: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = arr.numElements()
    var ref: org.apache.spark.unsafe.types.UTF8String = null
    var i = 0
    while (i < n && ref == null) {
      if (!arr.isNullAt(i)) ref = arr.getUTF8String(i)
      i += 1
    }
    if (ref == null) return null
    val s = ref.toString
    val g = s.lastIndexOf("?geo=")
    if (g < 0) return null
    val rest = s.substring(g + 5)
    val c = rest.indexOf(',')
    val latS = if (c < 0) rest else rest.substring(0, c)
    val lonS = if (c < 0) null else {
      val c2 = rest.indexOf(',', c + 1)
      if (c2 < 0) rest.substring(c + 1) else rest.substring(c + 1, c2)
    }
    def d(x: String): Any =
      if (x == null || x.isEmpty) null
      else try java.lang.Double.valueOf(java.lang.Double.parseDouble(x))
      catch { case _: NumberFormatException => null }
    new GenericInternalRow(Array[Any](d(latS), d(lonS)))
  }
}

/** Plan-constant polygon cover table: level-tagged cell ids (sorted) with
  * ring-index postings.  Because a cell id carries its level in the low
  * bits, covers computed at DIFFERENT per-polygon levels coexist in one
  * sorted array with no (level, cell) composite key.  A point probes the
  * table once per distinct cover level — its finest-level cell is computed
  * once, coarser ones are pure bit chops — so the whole candidate
  * generation is ~L binary searches over a few-thousand-entry array inside
  * the scan, with NO join, NO broadcast exchange and NO row inflation:
  * only actual candidates leave the lookup (most rows return null and are
  * dropped by the explode).  The table rides the serialized plan once per
  * stage, like the grid registry. */
final class CoverTable(val levels: Array[Int], keys: Array[Long],
                       offs: Array[Int], vals: Array[Int])
    extends Serializable {
  require(levels.nonEmpty && keys.length + 1 == offs.length &&
    offs.last == vals.length, "malformed cover table")

  override def toString: String =
    s"cover[${keys.length} cells @ levels ${levels.mkString("/")}]"

  /** ring indexes of every polygon whose cover contains this point, or
    * null when none (the common case — callers explode, which drops null
    * without allocating). */
  def lookup(lon: Double, lat: Double): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cells = graft.geo.cells.CellIndex
    val finest = cells.cellId(lon, lat, levels(0))
    var out: Array[Int] = null
    var n = 0
    var i = 0
    while (i < levels.length) {
      val c = if (i == 0) finest else cells.parent(finest, levels(i))
      val j = java.util.Arrays.binarySearch(keys, c)
      if (j >= 0) {
        var k = offs(j); val e = offs(j + 1)
        while (k < e) {
          if (out == null) out = new Array[Int](e - k)
          else if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
          out(n) = vals(k); n += 1; k += 1
        }
      }
      i += 1
    }
    if (out == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }
}

object CoverTable {
  /** Build from (level-tagged cell id, ring index) pairs; a cell shared by
    * several polygons at the same level gets a multi-entry posting. */
  def apply(entries: Seq[(Long, Int)]): CoverTable = {
    require(entries.nonEmpty, "empty cover")
    val sorted = entries.sortBy(identity).toArray
    val levels = sorted.map(e => graft.geo.cells.CellIndex.levelOf(e._1))
      .distinct.sorted(Ordering[Int].reverse)
    val nKeys = 1 + (1 until sorted.length).count(i => sorted(i)._1 != sorted(i - 1)._1)
    val keys = new Array[Long](nKeys)
    val offs = new Array[Int](nKeys + 1)
    val vals = new Array[Int](sorted.length)
    var ki = -1
    var i = 0
    while (i < sorted.length) {
      if (ki < 0 || sorted(i)._1 != keys(ki)) { ki += 1; keys(ki) = sorted(i)._1; offs(ki) = i }
      vals(i) = sorted(i)._2
      i += 1
    }
    offs(nKeys) = sorted.length
    new CoverTable(levels, keys, offs, vals)
  }
}

/** Candidate generation for the PIP join: emits the ring indexes of every
  * polygon whose cover cell (at that polygon's own cover level) contains
  * the point — see [[CoverTable]].  Null (dropped by explode) when no
  * cover matches. */
case class CellCoverLookupExpr(left: Expression, right: Expression,
                               table: CoverTable)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def prettyName: String = "cell_cover_lookup"

  protected override def nullSafeEval(lon: Any, lat: Any): Any =
    table.lookup(lon.asInstanceOf[Double], lat.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("coverTable", table,
      "graft.geo.expr.CoverTable")
    nullSafeCodeGen(ctx, ev, (lon, lat) =>
      s"""
         |${ev.value} = $ref.lookup($lon, $lat);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Geodesic polygon area + perimeter over the same flat
  * [lon0,lat0,lon1,lat1,...] ring encoding as point_in_polygon —
  * `geod_polygonarea` (/root/reference/src/geodesic.c:1974) as a scalar
  * expression: struct(area_m2, perimeter_m), counter-clockwise positive,
  * area reduced into (-A/2, A/2] of the ellipsoid total like
  * geod_polygon_compute. */
case class GeodPolygonAreaExpr(child: Expression,
                               geod: graft.geo.geodesic.Geodesic)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("area_m2", DoubleType, nullable = false),
    StructField("perimeter_m", DoubleType, nullable = false)))
  override def inputTypes = Seq(ArrayType(DoubleType, containsNull = false))
  override def prettyName: String = "geod_polygon_area"

  protected override def nullSafeEval(ring: Any): Any =
    GeodPolygonAreaExpr.compute(geod,
      ring.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geod", geod,
      classOf[graft.geo.geodesic.Geodesic].getName)
    defineCodeGen(ctx, ev, ring =>
      s"graft.geo.expr.GeodPolygonAreaExpr$$.MODULE$$.compute($ref, $ring)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object GeodPolygonAreaExpr {
  def compute(geod: graft.geo.geodesic.Geodesic,
              ring: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = ring.numElements() / 2
    // parallel primitive arrays, no per-vertex boxing (hot path —
    // same discipline as PointInPolygonExpr.containsAd)
    val lats = new Array[Double](n); val lons = new Array[Double](n)
    var i = 0
    while (i < n) {
      lons(i) = ring.getDouble(2 * i)
      lats(i) = ring.getDouble(2 * i + 1)
      i += 1
    }
    val (area, per) = geod.polygonArea(lats, lons, n)
    new GenericInternalRow(Array[Any](area, per))
  }
}

object PointInPolygonExpr {
  /** allocation-free variant over Catalyst ArrayData (hot join path) */
  def containsAd(lon: Double, lat: Double,
                 ring: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val n = ring.numElements() / 2
    if (n < 3) return false
    var inside = false
    var j = n - 1
    var i = 0
    while (i < n) {
      val xi = ring.getDouble(2 * i); val yi = ring.getDouble(2 * i + 1)
      val xj = ring.getDouble(2 * j); val yj = ring.getDouble(2 * j + 1)
      if ((yi > lat) != (yj > lat)) {
        val xCross = xi + (lat - yi) * (xj - xi) / (yj - yi)
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Even-odd crossing test on the lon/lat plane; points exactly on a
    * horizontal edge resolve via the half-open rule (consistent and
    * partition-independent). */
  def contains(lon: Double, lat: Double, ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    if (n < 3) return false
    var inside = false
    var j = n - 1
    var i = 0
    while (i < n) {
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if ((yi > lat) != (yj > lat)) {
        val xCross = xi + (lat - yi) * (xj - xi) / (yj - yi)
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
}

/** Column-level DSL over the expression layer. */
object geo {
  private def col(e: Expression): Column = GraftSqlShim.column(e)
  private def ex(c: Column): Expression = GraftSqlShim.expression(c)
  private val litNaN = Literal(Double.NaN, DoubleType)
  private val lit0 = Literal(0.0, DoubleType)

  /** generic kernel application: (x,y[,z[,t]]) -> struct(x,y[,z[,t]]) */
  def transform(kernel: PointKernel, forward: Boolean, outDims: Int,
                x: Column, y: Column, z: Column = null, t: Column = null): Column =
    col(PointTransformExpr(ex(x), ex(y),
      if (z == null) lit0 else ex(z),
      if (t == null) litNaN else ex(t),
      kernel, forward, outDims))

  /** CRS→CRS transform straight from two CRS descriptions (proj-string /
    * `EPSG:nnnn` / WKT) — `proj_create_crs_to_crs` ergonomics: the
    * operation factory derives the candidate operations and the per-point
    * planner compiles into the same whole-stage-codegen row kernel as a
    * hand-written pipeline.  Build once, reuse across columns/queries
    * (factory work happens at plan time, on the driver). */
  def crsTransform(srcCrs: String, dstCrs: String,
                   x: Column, y: Column, z: Column = null, t: Column = null,
                   outDims: Int = 2, forward: Boolean = true): Column =
    transform(graft.geo.proj.OperationFactory.crsToCrs(srcCrs, dstCrs),
      forward, outDims, x, y, z, t)

  /** As [[crsTransform]] with the full `proj_create_crs_to_crs` option
    * set (area of interest, desired accuracy, ballpark policy,
    * ONLY_BEST, authority axis order). */
  def crsTransform(srcCrs: String, dstCrs: String,
                   opts: graft.geo.proj.OperationFactory.CrsToCrsOptions,
                   x: Column, y: Column, z: Column, t: Column,
                   outDims: Int, forward: Boolean): Column =
    transform(graft.geo.proj.OperationFactory.crsToCrs(srcCrs, dstCrs, opts),
      forward, outDims, x, y, z, t)

  def cellId(lon: Column, lat: Column, level: Int): Column =
    col(CellIdExpr(ex(lon), ex(lat), level))

  def cellParent(cell: Column, parentLevel: Int): Column =
    col(CellParentExpr(ex(cell), parentLevel))

  def cellDecode(cell: Column): Column = col(CellDecodeExpr(ex(cell)))

  def cellNeighbors(cell: Column, k: Int): Column =
    col(CellNeighborsExpr(ex(cell), k))

  /** projected (x, y) metres -> packed planar axial hex id */
  def hexBin(x: Column, y: Column, sizeMeters: Double): Column =
    col(HexBinExpr(ex(x), ex(y), sizeMeters))

  /** packed hex id -> struct(q, r, x, y) (axial coords + center metres) */
  def hexDecode(hex: Column, sizeMeters: Double): Column =
    col(HexDecodeExpr(ex(hex), sizeMeters))

  /** all hexes within grid distance k (3k^2+3k+1 ids) */
  def hexDisk(hex: Column, k: Int): Column =
    col(HexDiskExpr(ex(hex), k))

  /** lon/lat degrees -> ISEA equal-area hex DGGS id */
  def iseaHexId(lon: Column, lat: Column, resolution: Int,
                aperture: Int = 4): Column =
    col(IseaHexIdExpr(ex(lon), ex(lat), resolution, aperture))

  /** lon/lat degrees -> packed XYZ web-map tile id at `zoom` */
  def tileId(lon: Column, lat: Column, zoom: Int): Column =
    col(TileIdExpr(ex(lon), ex(lat), zoom))

  /** packed tile id -> struct(z, x, y) */
  def tileDecode(tile: Column): Column = col(TileDecodeExpr(ex(tile)))

  /** packed tile id -> Bing quadkey text (parent = string prefix) */
  def quadkey(tile: Column): Column = col(QuadkeyExpr(ex(tile)))

  /** quadkey text -> packed tile id (malformed -> null) */
  def quadkeyToTile(qk: Column): Column = col(QuadkeyToTileExpr(ex(qk)))

  /** lon/lat degrees -> geohash text at `precision` chars */
  def geohash(lon: Column, lat: Column, precision: Int): Column =
    col(GeohashExpr(ex(lon), ex(lat), precision))

  /** geohash text -> struct(lon, lat) cell center (malformed -> null) */
  def geohashDecode(gh: Column): Column = col(GeohashDecodeExpr(ex(gh)))

  def pointInPolygon(lon: Column, lat: Column, ring: Column): Column =
    col(PointInPolygonExpr(ex(lon), ex(lat), ex(ring)))

  /** one-pass geo-tag extraction from a media_ref span array (see
    * SpanGeoTagExpr): struct(lat, lon). */
  def spanGeoTag(mediaRefs: Column): Column = col(SpanGeoTagExpr(ex(mediaRefs)))

  /** PIP-join candidate generation against a plan-constant polygon cover
    * table (see CoverTable / CellCoverLookupExpr). */
  def cellCoverLookup(lon: Column, lat: Column, table: CoverTable): Column =
    col(CellCoverLookupExpr(ex(lon), ex(lat), table))

  /** point-in-polygon against a plan-constant ring table, addressed by a
    * small int index column (see PointInPolygonIdxExpr). */
  def pointInPolygonIdx(lon: Column, lat: Column, idx: Column,
                        rings: Array[Array[Double]]): Column =
    col(PointInPolygonIdxExpr(ex(lon), ex(lat), ex(idx), rings))

  def geodDistance(lon1: Column, lat1: Column, lon2: Column, lat2: Column,
                   geod: graft.geo.geodesic.Geodesic =
                     graft.geo.geodesic.Geodesic.WGS84): Column =
    col(GeodesicDistExpr(ex(lon1), ex(lat1), ex(lon2), ex(lat2), geod))

  def geodDirect(lon1: Column, lat1: Column, azi: Column, s12: Column,
                 geod: graft.geo.geodesic.Geodesic =
                   graft.geo.geodesic.Geodesic.WGS84): Column =
    col(GeodesicDirectExpr(ex(lon1), ex(lat1), ex(azi), ex(s12), geod))

  /** n+1 evenly spaced waypoints along the geodesic between two points
    * (array of struct(lon, lat, azi)) — trajectory densification. */
  def geodWaypoints(lon1: Column, lat1: Column, lon2: Column, lat2: Column,
                    n: Int,
                    geod: graft.geo.geodesic.Geodesic =
                      graft.geo.geodesic.Geodesic.WGS84): Column =
    col(GeodesicWaypointsExpr(ex(lon1), ex(lat1), ex(lon2), ex(lat2), n, geod))
}
