package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.geo.cells.TileIndex
import graft.geo.expr.geo

/** XYZ web tiles / Bing quadkeys / Geohash: external grounding (the
  * canonical published test vectors; tile rows cross-checked against the
  * gie-validated webmerc kernel), prefix/parent invariants, decode
  * round-trips, clamping, and the Catalyst expression path vs JVM-direct
  * evaluation. */
class TileIndexSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("tile-index-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val rnd = new scala.util.Random(20260819L)
  private def rndLon() = rnd.nextDouble() * 360.0 - 180.0
  private def rndLat() = rnd.nextDouble() * 170.0 - 85.0

  // ---- XYZ tiles ----

  test("tile ids agree with the gie-validated webmerc kernel") {
    // independent grounding: x/y must equal the affine-discretized output
    // of the webmerc projection itself (validated against the reference's
    // own fixtures), x_tile = floor((x_m + pi R)/(2 pi R) * 2^z).
    val k = graft.geo.proj.ProjString.parse("+proj=webmerc")
    val R = 6378137.0
    for (_ <- 1 to 500) {
      val lon = rndLon(); val lat = rndLat()
      val z = rnd.nextInt(19)
      val v = Array(math.toRadians(lon), math.toRadians(lat), 0.0, Double.NaN)
      assert(k.fwd(v))
      val n = (1L << z).toDouble
      val xk = math.floor((v(0) + math.Pi * R) / (2 * math.Pi * R) * n).toLong
      val yk = math.floor((math.Pi * R - v(1)) / (2 * math.Pi * R) * n).toLong
      val id = TileIndex.tileId(lon, lat, z)
      assert(TileIndex.xOf(id) == math.min(xk, (1L << z) - 1),
        s"x at ($lon, $lat, z$z)")
      assert(TileIndex.yOf(id) == math.min(yk, (1L << z) - 1),
        s"y at ($lon, $lat, z$z)")
      assert(TileIndex.zoomOf(id) == z)
    }
  }

  test("tile pack/parent/center invariants; indexes clamp") {
    for (_ <- 1 to 300) {
      val lon = rndLon(); val lat = rndLat()
      val z = 2 + rnd.nextInt(17)
      val id = TileIndex.tileId(lon, lat, z)
      // parent chop: re-binning at the parent zoom gives the parent tile
      val pz = rnd.nextInt(z + 1)
      assert(TileIndex.parent(id, pz) == TileIndex.tileId(lon, lat, pz),
        s"parent at ($lon, $lat) z$z->z$pz")
      // the tile's center bins back to the tile
      val (clon, clat) = TileIndex.center(id)
      assert(TileIndex.tileId(clon, clat, z) == id, s"center of z$z/$id")
    }
    // clamps: poles, antimeridian, NaN all land in range
    for (z <- Seq(0, 1, 8, 28);
         (lon, lat) <- Seq((-180.0, 90.0), (180.0, -90.0), (181.0, 91.0),
           (-181.0, -91.0), (Double.NaN, Double.NaN))) {
      val id = TileIndex.tileId(lon, lat, z)
      assert(TileIndex.xOf(id) >= 0 && TileIndex.xOf(id) < (1L << z))
      assert(TileIndex.yOf(id) >= 0 && TileIndex.yOf(id) < (1L << z))
    }
    assertThrows[IllegalArgumentException](TileIndex.pack(29, 0, 0))
    assertThrows[IllegalArgumentException](TileIndex.pack(3, 8, 0))
  }

  test("quadkey matches the published Bing scheme and is prefix-stable") {
    // canonical Bing documentation example: tile (3, 5) at level 3 -> "213"
    assert(TileIndex.quadkey(TileIndex.pack(3, 3L, 5L)) == "213")
    assert(TileIndex.quadkey(TileIndex.pack(0, 0L, 0L)) == "")
    assert(TileIndex.quadkey(TileIndex.pack(1, 0L, 0L)) == "0")
    assert(TileIndex.quadkey(TileIndex.pack(1, 1L, 1L)) == "3")
    for (_ <- 1 to 300) {
      val lon = rndLon(); val lat = rndLat()
      val z = 1 + rnd.nextInt(18)
      val id = TileIndex.tileId(lon, lat, z)
      val qk = TileIndex.quadkey(id)
      assert(qk.length == z)
      // parent = string prefix
      assert(TileIndex.quadkey(TileIndex.parent(id, z - 1)) == qk.dropRight(1))
      // round-trip
      assert(TileIndex.fromQuadkey(qk) == id)
    }
    // malformed
    assert(TileIndex.fromQuadkey("0124") == -1L)
    assert(TileIndex.fromQuadkey("21x") == -1L)
    assert(TileIndex.fromQuadkey("2" * 29) == -1L)
    assert(TileIndex.fromQuadkey("") == TileIndex.pack(0, 0, 0))
  }

  // ---- Geohash ----

  test("geohash matches the canonical published vectors") {
    // the two standard reference examples of the public scheme
    assert(TileIndex.geohash(-5.603, 42.605, 5) == "ezs42")
    assert(TileIndex.geohash(10.40744, 57.64911, 11) == "u4pruydqqvj")
    // a few fixed sanity anchors (center of each hemisphere quadrant)
    assert(TileIndex.geohash(0.0, 0.0, 1) == "s")
    assert(TileIndex.geohash(-90.0, 45.0, 1) == "f")
  }

  test("geohash is precision-prefix-stable and decode round-trips") {
    for (_ <- 1 to 300) {
      val lon = rndLon(); val lat = rnd.nextDouble() * 180.0 - 90.0
      val full = TileIndex.geohash(lon, lat, 12)
      for (p <- Seq(1, 3, 5, 8)) {
        assert(TileIndex.geohash(lon, lat, p) == full.take(p),
          s"prefix at ($lon, $lat) p$p")
      }
      // center decode re-encodes to the same hash
      val p = 1 + rnd.nextInt(12)
      val gh = TileIndex.geohash(lon, lat, p)
      val c = TileIndex.geohashCenter(gh)
      assert(c != null)
      assert(TileIndex.geohash(c(0), c(1), p) == gh, s"roundtrip $gh")
    }
    // decode is case-insensitive (the conventional geohash contract)
    assert(TileIndex.geohashCenter("EZS42").toSeq ==
      TileIndex.geohashCenter("ezs42").toSeq)
    // malformed: bad char ('a' and 'i' are not in the alphabet), empty,
    // overlong
    assert(TileIndex.geohashCenter("ez4a2") == null)
    assert(TileIndex.geohashCenter("i") == null)
    assert(TileIndex.geohashCenter("") == null)
    assert(TileIndex.geohashCenter("0123456789bcd") == null)
  }

  // ---- Catalyst expression path ----

  test("expression path equals JVM-direct evaluation bit-for-bit") {
    val pts = (1 to 400).map(_ => (rndLon(), rndLat()))
    val df = spark.createDataFrame(pts).toDF("lon", "lat")
    val rows = df.select(
      col("lon"), col("lat"),
      geo.tileId(col("lon"), col("lat"), 11).as("tile"),
      geo.quadkey(geo.tileId(col("lon"), col("lat"), 11)).as("qk"),
      geo.tileDecode(geo.tileId(col("lon"), col("lat"), 11)).as("dec"),
      geo.geohash(col("lon"), col("lat"), 7).as("gh"),
      geo.quadkeyToTile(geo.quadkey(geo.tileId(col("lon"), col("lat"), 11))).as("qkrt"),
      geo.geohashDecode(geo.geohash(col("lon"), col("lat"), 7)).as("ghc")
    ).collect()
    for (r <- rows) {
      val lon = r.getDouble(0); val lat = r.getDouble(1)
      val id = TileIndex.tileId(lon, lat, 11)
      assert(r.getLong(2) == id)
      assert(r.getString(3) == TileIndex.quadkey(id))
      val dec = r.getStruct(4)
      assert(dec.getInt(0) == 11 && dec.getLong(1) == TileIndex.xOf(id) &&
        dec.getLong(2) == TileIndex.yOf(id))
      assert(r.getString(5) == TileIndex.geohash(lon, lat, 7))
      assert(r.getLong(6) == id, "quadkey -> tile round-trip via expressions")
      val ghc = r.getStruct(7)
      val c = TileIndex.geohashCenter(TileIndex.geohash(lon, lat, 7))
      assert(ghc.getDouble(0) == c(0) && ghc.getDouble(1) == c(1))
    }
    // malformed inputs surface as null through the expression layer
    val bad = spark.createDataFrame(Seq(Tuple1("21x"), Tuple1("ez4a2")))
      .toDF("s")
      .select(geo.quadkeyToTile(col("s")).as("t"),
        geo.geohashDecode(col("s")).as("g")).collect()
    assert(bad.forall(r => r.isNullAt(0)))
    assert(bad.exists(_.isNullAt(1)))
  }
}
