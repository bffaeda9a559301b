package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.proj.{ProjJson, ProjString, Wkt, WktFormat}

/** Cross-dialect consistency: for each CRS definition, every format the
  * engine can emit (WKT2:2019, classic WKT1, ESRI WKT1, PROJJSON) must
  * parse back to a kernel that is numerically identical to the original —
  * one shared object model behind four spellings, the property the
  * reference maintains across its WKTFormatter/JSONFormatter conventions.
  * Dialects that cannot represent a definition must REJECT it (typed
  * Unsupported), never approximate — so a surviving format+parse pair is
  * always exact. */
class InterchangeMatrixSpec extends AnyFunSuite {

  private val samples = Seq(
    (0.12, 0.65), (-0.8, -0.4), (1.9, 0.1), (0.01, -1.2), (2.8, 1.05))

  private val defs = Seq(
    "+proj=longlat +ellps=GRS80",
    "+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320 +pm=paris",
    "+proj=utm +zone=31 +ellps=WGS84",
    "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 +x_0=500000 +ellps=bessel",
    "+proj=merc +lat_ts=42 +lon_0=51 +ellps=krass",
    "+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +ellps=bessel",
    "+proj=webmerc +ellps=WGS84",
    "+proj=lcc +lat_1=49 +lat_2=77 +lat_0=44 +lon_0=-91.86 +ellps=clrk66",
    "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 +k_0=0.99987742" +
      " +x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356515",
    "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84",
    "+proj=stere +lat_0=-90 +lat_ts=-71 +ellps=WGS84",
    "+proj=sterea +lat_0=52.15616055 +lon_0=5.38763888 +k=0.9999079" +
      " +x_0=155000 +y_0=463000 +ellps=bessel",
    "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=GRS80",
    "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",
    "+proj=aeqd +lat_0=40 +lon_0=-100 +ellps=WGS84",
    "+proj=eqc +lat_ts=30 +lon_0=11 +ellps=WGS84",
    "+proj=cass +lat_0=10.44 +lon_0=-61.33 +ellps=intl",
    "+proj=omerc +no_uoff +lat_0=4 +lonc=115 +alpha=53.31582047" +
      " +gamma=53.13010236 +k=0.99984 +ellps=evrstSS",
    "EPSG:32631", "EPSG:3857")

  private def kernelsAgree(defStr: String, back: String,
                           via: String): Unit = {
    val k1 = ProjString.parse(defStr)
    val k2 = ProjString.parse(back)
    for ((lam, phi) <- samples) {
      val a = Array(lam, phi, 0.0, 0.0)
      val b = Array(lam, phi, 0.0, 0.0)
      val ok1 = k1.fwd(a); val ok2 = k2.fwd(b)
      assert(ok1 == ok2, s"[$via] fwd status diverged at ($lam,$phi) for $defStr")
      if (ok1) {
        val scale = math.max(1.0, math.max(math.abs(a(0)), math.abs(a(1))))
        assert(math.abs(a(0) - b(0)) <= 1e-9 * scale &&
               math.abs(a(1) - b(1)) <= 1e-9 * scale,
          s"[$via] (${a(0)},${a(1)}) vs (${b(0)},${b(1)}) for $defStr\nback: $back")
      }
    }
  }

  test("all four emitted dialects parse back to the identical kernel") {
    var pairs = 0
    val formatters = Seq[(String, String => String)](
      ("wkt2", WktFormat.format),
      ("wkt1", WktFormat.formatWkt1),
      ("esri", WktFormat.formatEsri),
      ("projjson", ProjJson.format))
    for (d <- defs; (via, fmt) <- formatters) {
      val text =
        try Some(fmt(d))
        catch { case _: ProjString.Unsupported => None } // honest rejection
      text.foreach { t =>
        ProjString.parse(t) // every emitted dialect passes the front door
        val back =
          if (ProjJson.looksLikeProjJson(t)) ProjJson.parseCrs(t).projString
          else Wkt.parseCrs(t).projString
        kernelsAgree(d, back, via)
        pairs += 1
      }
    }
    // the matrix must be substantially populated, not vacuously green
    assert(pairs >= 60, s"only $pairs format+parse pairs exercised")
  }
}
