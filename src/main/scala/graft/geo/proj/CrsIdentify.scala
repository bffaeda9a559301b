package graft.geo.proj

import scala.util.Try

import graft.geo.kernels.{Glue, PointKernel}
import graft.geo.math.Ellipsoid

/** CRS identification — given CRS text in any supported front-end form
  * (proj-string, WKT2 / WKT1 / ESRI WKT, PROJJSON, bare `EPSG:nnnn`),
  * return the EPSG codes in the builtin table whose definitions are
  * equivalent, with a confidence score.
  *
  * Behavioral reference: `proj_identify` (`/root/reference/src/4D_api.cpp`)
  * over `CRS::identify` (`/root/reference/src/iso19111/crs.cpp`).  The
  * reference matches a parsed CRS against its SQLite registry and scores
  * name + parameter agreement; this engine matches against the builtin
  * EPSG definition table ([[EpsgInit.defs]]) plus the arithmetic UTM code
  * families, and — for projected CRS — the full parsed authority
  * registry ([[AuthorityDb.allProjected]], ~8.8k EPSG/ESRI/IAU codes,
  * bucket-indexed by semi-major axis + natural-origin longitude so a
  * lookup probes tens of kernels), with the same confidence semantics
  * re-expressed for a name-free table:
  *
  *  - '''100''' — parameter-equivalent AND the input itself declares the
  *    code (WKT `ID[...]` / PROJJSON `id`), the analogue of the
  *    reference's name-confirmed full match;
  *  - '''70''' — parameter-equivalent: the projection is numerically
  *    identical over in-domain probe points, on the same ellipsoid and
  *    prime meridian, with the same datum bridge (towgs84 / nadgrids);
  *  - '''25''' — same projection numerics + ellipsoid, but a different
  *    (or absent) datum bridge — the low-confidence "geometric twin" the
  *    reference reports when only the coordinate system agrees.
  *
  * Like the classic proj.4 registry, several EPSG codes share one
  * definition (ETRS89 / NAD83 / RGF93 … are all GRS80 + null towgs84), so
  * identification of such a definition legitimately returns several codes
  * at confidence 70 — the reference disambiguates those by name and area,
  * which the builtin table intentionally does not model.
  *
  * Identification is a driver-side catalog operation (the analogue of
  * plan-time candidate derivation in [[OperationFactory]]) — it never
  * runs per row.
  */
object CrsIdentify {

  final case class Match(code: String, confidence: Int)

  /** Everything equivalence needs from one CRS definition. */
  private final case class Sig(kind: String, ell: Ellipsoid,
                               pmDeg: Double,
                               bridge: Option[Either[String, Array[Double]]],
                               kernel: PointKernel,
                               lonRef: Double, latRef: Double)

  private val GeogNames = Set("longlat", "latlong", "latlon", "lonlat")

  /** Canonical datum bridge: `None` = no bridge declared OR an explicit
    * no-op bridge (all-zero towgs84, `nadgrids=@null`) — a null bridge
    * carries no geometric content, so a bridge-free WKT2 import still
    * fully matches a classic definition spelling `+towgs84=0,...,0`.
    * `Left` = grid bridge (compared by name); `Right` = the 7 Helmert
    * parameters (compared NUMERICALLY — a WKT round trip converts
    * rotations/scale through arc-seconds and the 1+ds·1e-6 ratio, so the
    * values come back with ~1e-10 drift, far below the smallest real
    * datum distinction, e.g. CH1903 vs CH1903+ at 0.026 m). */
  private def bridgeOf(p: ProjString.Params): Option[Either[String, Array[Double]]] =
    p.get("nadgrids") match {
      case Some(g) if g.split(',').forall(_ == "@null") => None
      case Some(g) => Some(Left(s"nadgrids=$g"))
      case None => p.get("towgs84").flatMap { t =>
        val raw = t.split(',').map(x => ProjString.parseDouble(x.trim))
        // >7 values is a malformed definition (the reference rejects it):
        // throw so sigOf's Try yields the documented empty result —
        // truncating would FABRICATE a confident match for garbage input.
        // Null detection uses the same 1e-6 tolerance as the comparison
        // (a 1e-9 drift off the zero bridge must match the zero bridge).
        if (raw.length > 7)
          throw ProjString.BadProjString(s"towgs84 has ${raw.length} values")
        val v = raw.padTo(7, 0.0)
        if (v.forall(x => math.abs(x) <= 1e-6)) None else Some(Right(v))
      }
    }

  private def bridgeEq(a: Option[Either[String, Array[Double]]],
                       b: Option[Either[String, Array[Double]]]): Boolean =
    (a, b) match {
      case (None, None) => true
      case (Some(Left(x)), Some(Left(y))) => x == y
      case (Some(Right(x)), Some(Right(y))) =>
        x.indices.forall(i => math.abs(x(i) - y(i)) <= 1e-6)
      case _ => false
    }

  /** Probe region for a definition: its own natural origin (the reference
    * compares parameter VALUES; numeric probing near the origin is the
    * table-free equivalent, and catches cross-parameterization equivalence
    * such as `+proj=utm +zone=31` vs its expanded tmerc spelling). */
  private def refPoint(p: ProjString.Params): (Double, Double) = {
    val lon = p.double("lon_0").orElse(p.double("lonc"))
      .orElse(p.double("zone").map(_ * 6.0 - 183.0)).getOrElse(0.0)
    val lat0 = p.angle("lat_ts").orElse(p.angle("lat_1"))
      .orElse(p.angle("lat_0")).map(math.toDegrees).getOrElse(0.0)
    val lat = if (math.abs(lat0) > 88.0) math.signum(lat0) * 75.0 else lat0
    (lon, lat)
  }

  private def sigOf(projString: String): Option[Sig] = Try {
    val tokens = ProjString.tokenize(projString)
    if (tokens.contains("step")) throw new IllegalArgumentException(
      "pipeline") // identify applies to CRS definitions, not transformations
    val p0 = ProjString.toParams(tokens)
    val proj = p0.get("proj").getOrElse(throw new IllegalArgumentException("no proj"))
    val p = ProjString.expandDatum(p0)
    val kind =
      if (GeogNames(proj)) "geog"
      else if (proj == "geocent" || proj == "cart") "geocent"
      else "projected"
    val pmDeg = p.get("pm")
      .map(v => ProjString.parseDms(Glue.primeMeridians.getOrElse(v, v)))
      .getOrElse(0.0)
    val (lonRef, latRef) = refPoint(p)
    val declared = ProjString.ellipsoidOfString(projString)
    // webmerc runs on a sphere of radius a regardless of the declared
    // ellipsoid (the reference's Popular Visualisation convention), so its
    // EFFECTIVE ellipsoid must match EPSG:3857's classic `+a=+b` spelling
    val ell = if (proj == "webmerc") Ellipsoid(declared.a, 0.0) else declared
    // the probe kernel must be the bare projection: ProjString.parse glues
    // a declared datum bridge into fwd (cs2cs semantics), which would make
    // numeric probing compare projection+bridge instead of the projection —
    // the bridge is compared separately as a canonical token
    val probeTokens = tokens.flatMap { t =>
      if (t.startsWith("towgs84=") || t.startsWith("nadgrids=") ||
          t.startsWith("geoidgrids=")) Nil
      else if (t.startsWith("datum="))
        Glue.datums.get(t.drop(6)).map(d => "ellps=" + d._2).toList
      else List(t)
    }
    Sig(kind, ell, pmDeg, bridgeOf(p),
      ProjString.parse(probeTokens.map("+" + _).mkString(" ")), lonRef, latRef)
  }.toOption

  /** Probe offsets (degrees) around the candidate's reference point. */
  private val ProbeOffsets = Seq(
    (0.0, 0.0), (1.2, -0.8), (-0.7, 0.5), (0.4, 1.0), (-1.1, -1.3))

  /** 0 = different; 1 = projection twin (datum bridge differs);
    * 2 = parameter-equivalent. */
  private def equivalence(a: Sig, b: Sig): Int = {
    if (a.kind != b.kind) return 0
    if (math.abs(a.ell.a - b.ell.a) > 1e-6) return 0
    // 1e-8 passes registry roundoff (GRS80's rf is published to 9 decimals,
    // 1.2e-10 off the defining constant) while still separating WGS84 from
    // GRS80 (rf differ by 1.5e-6)
    if (math.abs(a.ell.rf - b.ell.rf) > 1e-8) return 0
    if (math.abs(a.pmDeg - b.pmDeg) > 1e-12) return 0
    if (a.kind == "projected") {
      // fwd both kernels over the CANDIDATE's region; equivalence needs
      // >=3 mutually-valid points agreeing to a micrometre and no
      // disagreeing point
      var ok = 0
      for ((dLon, dLat) <- ProbeOffsets) {
        val lon = b.lonRef + dLon
        val lat = math.max(-88.0, math.min(88.0, b.latRef + dLat))
        val va = Array(math.toRadians(lon), math.toRadians(lat), 0.0, 0.0)
        val vb = va.clone()
        val fa = Try(a.kernel.fwd(va)).getOrElse(false)
        val fb = Try(b.kernel.fwd(vb)).getOrElse(false)
        if (fa && fb) {
          if (math.abs(va(0) - vb(0)) > 1e-6 ||
              math.abs(va(1) - vb(1)) > 1e-6) return 0
          ok += 1
        }
      }
      if (ok < 3) return 0
    }
    if (bridgeEq(a.bridge, b.bridge)) 2 else 1
  }

  /** The builtin candidate list: the explicit definition table plus the
    * arithmetic UTM families ([[EpsgInit]] resolves those without table
    * entries). */
  private lazy val candidates: Seq[(String, Sig)] = {
    val utm =
      (1 to 60).map(z => s"epsg:${32600 + z}") ++
        (1 to 60).map(z => s"epsg:${32700 + z}") ++
        (28 to 38).map(z => s"epsg:${25800 + z}") ++
        (1 to 23).map(z => s"epsg:${26900 + z}")
    val codes = (EpsgInit.defs.keys.toSeq ++ utm).distinct
    codes.flatMap { code =>
      EpsgInit.lookup(code).flatMap(sigOf).map(code -> _)
    }.sortBy(_._1)
  }

  /** Authority-database candidates (projected CRS only — geographic
    * identification over the registry would return every CRS on the
    * ellipsoid, which the reference disambiguates by NAME; the builtin
    * table covers the geographic hubs).  Pre-filtered by a coarse bucket
    * key (semi-major to the cm + natural-origin longitude to 1e-4°) so an
    * identify() call probes tens of kernels, not 8,800; signatures are
    * built lazily per bucket and cached. */
  private lazy val dbIndex: Map[(Long, Long), Vector[(String, String)]] =
    if (!AuthorityDb.available) Map.empty
    else AuthorityDb.allProjected.flatMap { case (code, spec) =>
      Try {
        val p = ProjString.toParams(ProjString.tokenize(spec))
        val ell = ProjString.ellipsoidOfString(spec)
        val (lonRef, _) = refPoint(p)
        (bucketKey(ell.a, lonRef), (code.toLowerCase, spec))
      }.toOption
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  private def bucketKey(a: Double, lonRef: Double): (Long, Long) =
    (math.rint(a * 100).toLong, math.rint(lonRef * 1e4).toLong)

  private val dbSigCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[Sig]]

  private def dbMatches(sig: Sig, declared: Option[Int]): Seq[Match] = {
    if (sig.kind != "projected") return Seq.empty
    // probe the +/-1 neighboring buckets in both key dimensions: a
    // candidate whose a/lon_0 differ by sub-equivalence-tolerance amounts
    // can round across a bucket edge, and a missed probe is a silent
    // false negative
    val (ka, kl) = bucketKey(sig.ell.a, sig.lonRef)
    val bucket = (for { da <- -1 to 1; dl <- -1 to 1 } yield
      dbIndex.getOrElse((ka + da, kl + dl), Vector.empty))
      .flatten.distinct
    bucket.flatMap { case (code, spec) =>
      dbSigCache.getOrElseUpdate(code, sigOf(spec)).flatMap { cand =>
        equivalence(sig, cand) match {
          case 2 =>
            val conf =
              if (code.startsWith("epsg:") &&
                  declared.contains(code.drop(5).toInt)) 100 else 70
            Some(Match(code, conf))
          case 1 => Some(Match(code, 25))
          case _ => None
        }
      }
    }
  }

  /** Lower input text to (proj-string, declared EPSG id). */
  private def lower(text: String): (String, Option[Int]) = {
    val t = text.trim
    if (t.matches("(?i)epsg:\\d+")) {
      val code = t.toLowerCase
      (EpsgInit.lookup(code).getOrElse(
        throw ProjString.Unsupported(s"+init=$code")),
        Some(code.drop(5).toInt))
    } else if (Wkt.looksLikeWkt(t)) {
      val crs = Wkt.parseCrs(t); (crs.projString, crs.epsg)
    } else if (ProjJson.looksLikeProjJson(t)) {
      val crs = ProjJson.parseCrs(t); (crs.projString, crs.epsg)
    } else (t, None)
  }

  /** Identify `text` against the builtin EPSG table.  Matches sorted by
    * confidence (descending), then code.  Empty when the text is a
    * transformation/pipeline, malformed, an unknown authority code, or
    * matches nothing — identification never throws. */
  def identify(text: String): Seq[Match] = {
    val (projString, declared) = Try(lower(text)).getOrElse(return Seq.empty)
    sigOf(projString) match {
      case None => Seq.empty
      case Some(sig) =>
        val builtin = candidates.flatMap { case (code, cand) =>
          equivalence(sig, cand) match {
            case 2 =>
              val conf =
                if (declared.contains(code.drop(5).toInt)) 100 else 70
              Some(Match(code, conf))
            case 1 => Some(Match(code, 25))
            case _ => None
          }
        }
        // authority-database candidates fill in codes the builtin table
        // doesn't carry; on overlap the builtin result wins (identical
        // confidence semantics, bridge-aware)
        val seen = builtin.map(_.code).toSet
        val db = Try(dbMatches(sig, declared)).getOrElse(Seq.empty)
          .filterNot(m => seen.contains(m.code))
        (builtin ++ db).sortBy(m => (-m.confidence, m.code))
    }
  }
}
