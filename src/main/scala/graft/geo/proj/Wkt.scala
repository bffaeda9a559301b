package graft.geo.proj

/** WKT CRS parser: ISO 19162 WKT2 (2015/2019 keywords) and legacy GIS WKT1
  * for geographic, geocentric, projected and bound CRS, lowered to the
  * engine's proj-string pipeline language.
  *
  * Behavioral reference: the reference's `WKTParser::createFromWKT`
  * (/root/reference/src/iso19111/io.cpp:8432) + its PROJ-string export;
  * this implementation targets the subset that covers CRS interchange in
  * the wild — named-method projected CRS over ellipsoidal datums with
  * optional TOWGS84/ABRIDGEDTRANSFORMATION bridges — not the full ISO
  * object model (no CompoundCRS/VerticalCRS/DerivedCRS, no WKT output).
  *
  * The output [[Crs]] carries a ready-to-parse proj string in GIS axis
  * order plus the authority-order metadata (`latFirst`, `axis`) the
  * CRS->CRS composer needs, so a WKT definition can stand anywhere an
  * `EPSG:xxxx` builtin can.
  */
object Wkt {
  final case class BadWkt(msg: String) extends RuntimeException(msg)

  // --- generic WKT tree -----------------------------------------------------

  sealed trait Arg
  final case class WStr(s: String) extends Arg
  final case class WNum(v: Double) extends Arg
  final case class WWord(s: String) extends Arg
  final case class WNode(kw: String, args: List[Arg]) extends Arg {
    def nodes(names: String*): List[WNode] = {
      val set = names.map(_.toUpperCase).toSet
      args.collect { case n: WNode if set(n.kw) => n }
    }
    def node(names: String*): Option[WNode] = nodes(names: _*).headOption
    def str(i: Int): String = args.lift(i) match {
      case Some(WStr(s)) => s
      case Some(WWord(s)) => s
      case o => throw BadWkt(s"$kw: expected string arg $i, got $o")
    }
    def num(i: Int): Double = args.lift(i) match {
      case Some(WNum(v)) => v
      case Some(WStr(s)) => try s.toDouble catch {
        case _: NumberFormatException => throw BadWkt(s"$kw: non-numeric '$s'")
      }
      case o => throw BadWkt(s"$kw: expected number arg $i, got $o")
    }
  }

  private val crsKeywords = Set(
    "GEOGCRS", "GEOGRAPHICCRS", "GEODCRS", "GEODETICCRS", "GEOGCS", "GEOCCS",
    "PROJCRS", "PROJECTEDCRS", "PROJCS", "BOUNDCRS",
    // compound CRS must pass the dispatch gate or buildCompound is
    // unreachable from ProjString.parse / the operation factory
    "COMPOUNDCRS", "COMPD_CS",
    // derived + engineering forms (io.cpp:2927-5552); the exotic rest
    // (parametric/temporal) also dispatches here so it rejects with a
    // TYPED reason instead of falling through to the proj-string parser
    "DERIVEDPROJCRS", "DERIVEDPROJECTEDCRS",
    "ENGCRS", "ENGINEERINGCRS", "LOCAL_CS",
    "PARAMETRICCRS", "TIMECRS")

  /** Cheap dispatch test: does this text start like a WKT CRS? */
  def looksLikeWkt(s: String): Boolean = {
    val t = s.dropWhile(_.isWhitespace)
    val kw = t.takeWhile(c => c.isLetter || c == '_').toUpperCase
    crsKeywords(kw) && t.drop(kw.length).dropWhile(_.isWhitespace)
      .headOption.exists(c => c == '[' || c == '(')
  }

  /** Serialize a parsed node back to WKT text (numbers via Double's
    * shortest round-trip form, so re-parsing yields bit-identical
    * values) — used to hand the CRS child of a COORDINATEMETADATA node
    * back to the spec front doors. */
  def render(n: WNode): String = {
    def arg(a: Arg): String = a match {
      case WStr(s) => "\"" + s.replace("\"", "\"\"") + "\""
      case WNum(v) =>
        if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
        else v.toString
      case WWord(s) => s
      case c: WNode => render(c)
    }
    n.kw + "[" + n.args.map(arg).mkString(",") + "]"
  }

  /** Tokenize + parse one WKT node (keyword [ arg, arg, ... ]); `(` `)` are
    * accepted as bracket alternates per ISO 19162 §6.3. */
  def parseNode(text: String): WNode = {
    val in = text
    var pos = 0
    var depth = 0 // recursion bound: fail typed, never StackOverflowError
    def skipWs(): Unit = { while (pos < in.length && in(pos).isWhitespace) pos += 1 }
    def peek: Char = if (pos < in.length) in(pos) else '\u0000'

    def word(): String = {
      val start = pos
      // ':' admits the unquoted WKT2 datetime literal of TIMEORIGIN
      // (1980-01-01T00:00:00.0Z, ISO 19162 §7.3.3); it appears nowhere
      // else unquoted, so ordinary words are unaffected
      while (pos < in.length &&
             (in(pos).isLetterOrDigit || in(pos) == '_' || in(pos) == '-' ||
              in(pos) == '.' || in(pos) == '+' || in(pos) == ':')) pos += 1
      if (pos == start) throw BadWkt(s"expected token at offset $start")
      in.substring(start, pos)
    }

    def quoted(): String = {
      pos += 1 // opening "
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (pos >= in.length) throw BadWkt("unterminated string")
        val c = in(pos)
        if (c == '"') {
          if (pos + 1 < in.length && in(pos + 1) == '"') { sb += '"'; pos += 2 }
          else { pos += 1; done = true }
        } else { sb += c; pos += 1 }
      }
      sb.toString
    }

    def parseArgs(close: Char): List[Arg] = {
      val out = List.newBuilder[Arg]
      var first = true
      skipWs()
      while ({ skipWs(); peek != close }) {
        if (!first) {
          if (peek != ',') throw BadWkt(s"expected ',' at offset $pos")
          pos += 1; skipWs()
        }
        first = false
        out += parseArg()
      }
      pos += 1 // consume close
      out.result()
    }

    def parseArg(): Arg = {
      skipWs()
      peek match {
        case '"' => WStr(quoted())
        case c if c.isDigit || c == '-' || c == '+' || c == '.' =>
          val w = word()
          try WNum(w.toDouble)
          catch { case _: NumberFormatException => WWord(w) }
        case c if c.isLetter =>
          val w = word()
          skipWs()
          if (peek == '[' || peek == '(') {
            val close = if (peek == '[') ']' else ')'
            pos += 1
            depth += 1
            if (depth > 64) throw BadWkt(s"nesting deeper than 64 at offset $pos")
            val n = WNode(w.toUpperCase, parseArgs(close))
            depth -= 1
            n
          } else WWord(w)
        case c => throw BadWkt(s"unexpected '$c' at offset $pos")
      }
    }

    parseArg() match {
      case n: WNode => n
      case o => throw BadWkt(s"not a WKT node: $o")
    }
  }

  // --- units ----------------------------------------------------------------

  private val DegToRad = math.Pi / 180.0

  /** (radians|metres|unity) per unit from a UNIT-family node.  Factors a
    * hair off the exact degree (ESRI/GDAL print 0.0174532925199433) snap to
    * pi/180 so degree parameters survive the to-radians-and-back roundtrip
    * bit-exact (the reference's common-unit identification by value). */
  private def unitFactor(n: WNode): Double = {
    val f = n.num(1)
    if (math.abs(f - DegToRad) < 1e-12) DegToRad else f
  }

  private def angleUnitOf(n: WNode, default: Double): Double =
    n.node("ANGLEUNIT", "UNIT").map(unitFactor).getOrElse(default)
  private def lengthUnitOf(n: WNode, default: Double): Double =
    n.node("LENGTHUNIT", "UNIT").map(unitFactor).getOrElse(default)

  // --- CRS model ------------------------------------------------------------

  /** A parsed CRS lowered to engine terms.  `projString` is in GIS axis
    * order (lon,lat degrees in / projected units out); `axis` is the
    * authority axis spec ("enu" when GIS-native), `latFirst` the
    * geographic authority order. */
  final case class Crs(name: String, kind: String, projString: String,
                       a: Double, rf: Double, datum: String,
                       latFirst: Boolean, axis: String, epsg: Option[Int])

  def parseCrs(text: String): Crs = build(parseNode(text))

  /** Build a [[Crs]] from an already-assembled WKT node tree (used by the
    * PROJJSON front-end, which lowers JSON to the same tree). */
  private[proj] def buildCrs(root: WNode): Crs = build(root)

  private def epsgId(n: WNode): Option[Int] =
    n.nodes("ID", "AUTHORITY").collectFirst {
      case id if id.args.nonEmpty && id.str(0).equalsIgnoreCase("EPSG") &&
                 id.args.size >= 2 =>
        id.args(1) match {
          case WNum(v) => v.toInt
          case WStr(s) => s.toInt
          case o => throw BadWkt(s"bad ID value $o")
        }
    }

  private def build(root: WNode): Crs = root.kw match {
    case "GEOGCRS" | "GEOGRAPHICCRS" =>
      // WKT2-2019: a GEOGCRS carrying BASEGEOGCRS + DERIVINGCONVERSION is
      // a DerivedGeographicCRS (rotated-pole grids, io.cpp:3474)
      if (root.node("BASEGEOGCRS", "BASEGEODCRS").isDefined &&
          root.node("DERIVINGCONVERSION").isDefined)
        buildDerivedGeographic(root)
      else buildGeog(root, isWkt1 = false)
    case "GEOGCS" => buildGeog(root, isWkt1 = true)
    case "GEODCRS" | "GEODETICCRS" =>
      if (root.node("BASEGEOGCRS", "BASEGEODCRS").isDefined &&
          root.node("DERIVINGCONVERSION").isDefined)
        buildDerivedGeographic(root)
      else {
        // WKT2 geodetic: ellipsoidal CS -> geographic; Cartesian -> geocentric
        val cs = root.node("CS")
        if (cs.exists(_.args.headOption.exists {
              case WWord(w) => w.equalsIgnoreCase("Cartesian"); case _ => false }))
          buildGeocent(root)
        else buildGeog(root, isWkt1 = false)
      }
    case "GEOCCS" => buildGeocent(root)
    case "PROJCRS" | "PROJECTEDCRS" | "PROJCS" => buildProjected(root)
    case "BOUNDCRS" => buildBound(root)
    case "COMPOUNDCRS" | "COMPD_CS" => buildCompound(root)
    case "DERIVEDPROJCRS" | "DERIVEDPROJECTEDCRS" => buildDerivedProjected(root)
    case "ENGCRS" | "ENGINEERINGCRS" | "LOCAL_CS" => buildEngineering(root)
    case "PARAMETRICCRS" => buildParametric(root)
    case "TIMECRS" => buildTemporal(root)
    case kw => throw BadWkt(s"unsupported WKT object $kw")
  }

  /** Derived projected CRS (WKT2 DERIVEDPROJCRS, io.cpp:2927): the base
    * projected CRS followed by the deriving conversion.  The result is a
    * *pipeline* proj-string (radians in, derived units out) — numerically
    * complete for transform use; the operation factory intentionally
    * rejects pipelines as CRS definitions, so factory use stays typed.
    * Deriving methods supported: EPSG 9624 Affine parametric
    * transformation (the common case for derived grids). */
  private def buildDerivedProjected(root: WNode): Crs = {
    val baseNode = root.node("BASEPROJCRS")
      .getOrElse(throw BadWkt("DERIVEDPROJCRS: no BASEPROJCRS"))
    val base = buildProjected(baseNode)
    val conv = root.node("DERIVINGCONVERSION")
      .getOrElse(throw BadWkt("DERIVEDPROJCRS: no DERIVINGCONVERSION"))
    val mName = conv.node("METHOD").map(_.str(0))
      .getOrElse(throw BadWkt("DERIVINGCONVERSION: no METHOD"))
    val step = norm(mName) match {
      case m if m == norm("Affine parametric transformation") =>
        // EPSG 9624: X' = A0 + A1*X + A2*Y ; Y' = B0 + B1*X + B2*Y
        val ps = conv.nodes("PARAMETER")
          .map(pn => norm(pn.str(0)) -> pn.num(1)).toMap
        def p(n: String, d: Double) = ps.getOrElse(norm(n), d)
        s"+proj=affine +xoff=${fmt(p("A0", 0))} +s11=${fmt(p("A1", 1))}" +
          s" +s12=${fmt(p("A2", 0))} +yoff=${fmt(p("B0", 0))}" +
          s" +s21=${fmt(p("B1", 0))} +s22=${fmt(p("B2", 1))}"
      case _ =>
        throw BadWkt(s"deriving conversion method '$mName' is not supported")
    }
    val linUnit = axisUnit(root, angular = false).getOrElse(1.0)
    val unitStep =
      if (math.abs(linUnit - 1.0) < 1e-12) ""
      else s" +step +proj=unitconvert +xy_in=1 +xy_out=${fmt(linUnit)}"
    val axes = root.nodes("AXIS")
    val axisSpec =
      if (axes.size >= 2) axes.take(3).map(axisLetter).mkString.padTo(3, 'u')
      else "enu"
    Crs(root.str(0), "derived-projected",
      s"+proj=pipeline +step ${base.projString} +step $step$unitStep",
      base.a, base.rf, base.datum,
      latFirst = axisSpec.headOption.exists(c => c == 'n' || c == 's'),
      axis = axisSpec, epsg = epsgId(root))
  }

  /** Derived geographic CRS (WKT2 GEOGCRS/GEODCRS with BASEGEOGCRS +
    * DERIVINGCONVERSION — io.cpp:3474): the rotated-pole graticules of
    * climate/NWP grids.  The deriving methods with a PROJ lowering are
    * exactly the reference's (crs.cpp:6685
    * DerivedGeographicCRS::_exportToPROJString): the two pole-rotation
    * conventions, mapped to ob_tran as in conversion.cpp:4125-4160 —
    * GRIB: o_lon_p=−rotation, o_lat_p=−southPoleLat, lon_0=southPoleLon;
    * netCDF CF: o_lon_p=northPoleGridLon, o_lat_p=gridNorthPoleLat,
    * lon_0=180+gridNorthPoleLon — and the literal "PROJ ob_tran
    * o_proj=…" method spelling (tokens in the method name, numbers in
    * PARAMETER nodes).  Anything else (e.g. the plain WMO "Pole
    * rotation") is a typed reject there too.  Lowered to a pipeline:
    * ob_tran forward (base radians → rotated graticule) + rad→deg, so
    * transforms emit the derived CRS's degree coordinates. */
  private def buildDerivedGeographic(root: WNode): Crs = {
    val baseNode = root.node("BASEGEOGCRS", "BASEGEODCRS").get
    val b = geodeticBase(baseNode)
    val conv = root.node("DERIVINGCONVERSION").get
    val mName = conv.node("METHOD").map(_.str(0))
      .getOrElse(throw BadWkt("DERIVINGCONVERSION: no METHOD"))
    val ps = conv.nodes("PARAMETER")
      .map(pn => norm(pn.str(0)) -> pn.num(1)).toMap
    def p(n: String) = ps.getOrElse(norm(n),
      throw BadWkt(s"'$mName': missing parameter '$n'"))
    val obtran = norm(mName) match {
      case m if m == norm("Pole rotation (GRIB convention)") =>
        val sLat = p("Latitude of the southern pole (GRIB convention)")
        val sLon = p("Longitude of the southern pole (GRIB convention)")
        val rot = p("Axis rotation (GRIB convention)")
        s"+proj=ob_tran +o_proj=longlat +o_lon_p=${fmt(-rot)}" +
          s" +o_lat_p=${fmt(-sLat)} +lon_0=${fmt(sLon)}"
      case m if m == norm("Pole rotation (netCDF CF convention)") =>
        val npLat = p("Grid north pole latitude (netCDF CF convention)")
        val npLon = p("Grid north pole longitude (netCDF CF convention)")
        val gLon = p("North pole grid longitude (netCDF CF convention)")
        s"+proj=ob_tran +o_proj=longlat +o_lon_p=${fmt(gLon)}" +
          s" +o_lat_p=${fmt(npLat)} +lon_0=${fmt(180 + npLon)}"
      case m if m.startsWith(norm("PROJ ob_tran o_proj=")) =>
        // first token is the operation name, the rest are parameters
        // (the reference's createPROJExtensionFromCustomProj convention)
        val raw = mName.stripPrefix("PROJ ").trim.split("\\s+")
        val toks = (s"+proj=${raw.head}" +: raw.tail.map(t =>
          if (t.startsWith("+")) t else "+" + t).toSeq).mkString(" ")
        val extra = conv.nodes("PARAMETER")
          .map(pn => s" +${pn.str(0)}=${fmt(pn.num(1))}").mkString
        s"$toks$extra"
      case _ => throw BadWkt(s"deriving conversion method '$mName' has no" +
        " PROJ lowering (the reference's DerivedGeographicCRS exporter" +
        " rejects it too)")
    }
    val axes = root.nodes("AXIS")
    val latFirst =
      if (axes.nonEmpty) "ns".contains(axisLetter(axes.head)) else true
    Crs(root.str(0), "derived-geog",
      s"+proj=pipeline +step $obtran ${ellFragment(b)}" +
        " +step +proj=unitconvert +xy_in=rad +xy_out=deg",
      b.a, b.rf, b.datumName, latFirst,
      axis = if (latFirst) "neu" else "enu", epsg = epsgId(root))
  }

  /** Engineering (local) CRS (WKT2 ENGCRS / WKT1 LOCAL_CS): a Cartesian
    * frame with no geodetic anchor.  Lowered to the identity map with
    * axis-unit scaling to metres — usable for same-frame unit/axis glue;
    * there is by definition no datum path to any geodetic CRS. */
  private def buildEngineering(root: WNode): Crs = {
    val unit = axisUnit(root, angular = false).getOrElse(1.0)
    val projString =
      if (math.abs(unit - 1.0) < 1e-12) "+proj=affine"
      else s"+proj=affine +s11=${fmt(unit)} +s22=${fmt(unit)} +s33=${fmt(unit)}"
    val datumName = root.node("EDATUM", "ENGINEERINGDATUM", "LOCAL_DATUM")
      .map(_.str(0)).getOrElse("")
    val axes = root.nodes("AXIS")
    val axisSpec =
      if (axes.size >= 2) axes.take(3).map(axisLetter).mkString.padTo(3, 'u')
      else "enu"
    Crs(root.str(0), "engineering", projString, 6378137.0, 298.257223563,
      datumName, latFirst = false, axis = axisSpec, epsg = epsgId(root))
  }

  /** Parametric CRS (WKT2 PARAMETRICCRS, io.cpp:2927): a single
    * non-spatial axis (pressure level, density …).  Parsed like the
    * reference, with the ENGCRS stance for computation: an identity
    * frame carrying the PARAMETRICUNIT factor to the SI base (usable for
    * same-frame unit glue); by definition no operation path to any
    * spatial CRS. */
  private def buildParametric(root: WNode): Crs = {
    val datumName = root.node("PDATUM", "PARAMETRICDATUM")
      .map(_.str(0)).getOrElse("")
    val unit = root.nodes("AXIS")
      .flatMap(_.node("PARAMETRICUNIT", "UNIT")).headOption
      .orElse(root.node("PARAMETRICUNIT", "UNIT"))
      .map(unitFactor).getOrElse(1.0)
    val projString =
      if (math.abs(unit - 1.0) < 1e-12) "+proj=affine"
      else s"+proj=affine +s11=${fmt(unit)}"
    Crs(root.str(0), "parametric", projString, 6378137.0, 298.257223563,
      datumName, latFirst = false, axis = "enu", epsg = epsgId(root))
  }

  /** Temporal CRS (WKT2 TIMECRS, io.cpp:2935): one time axis anchored at
    * the TDATUM's TIMEORIGIN.  Identity frame with the TIMEUNIT factor
    * to seconds when the axis is a measured duration (a calendar
    * TemporalDateTime axis has no unit → factor 1). */
  private def buildTemporal(root: WNode): Crs = {
    val datum = root.node("TDATUM", "TIMEDATUM")
      .getOrElse(throw BadWkt("TIMECRS: no TDATUM"))
    val unit = root.nodes("AXIS")
      .flatMap(_.node("TIMEUNIT", "TEMPORALQUANTITY", "UNIT")).headOption
      .orElse(root.node("TIMEUNIT", "TEMPORALQUANTITY", "UNIT"))
      .flatMap(n => if (n.args.size >= 2) Some(unitFactor(n)) else None)
      .getOrElse(1.0)
    val projString =
      if (math.abs(unit - 1.0) < 1e-12) "+proj=affine"
      else s"+proj=affine +s11=${fmt(unit)}"
    Crs(root.str(0), "temporal", projString, 6378137.0, 298.257223563,
      datum.str(0), latFirst = false, axis = "enu", epsg = epsgId(root))
  }

  /** Compound = horizontal CRS + vertical CRS.  Without a grid-backed
    * geoid model the vertical component lowers to its height unit
    * (`+vunits`/`+vto_meter` semantics — the reference's
    * `VerticalCRS::exportToPROJString` behavior when no geoidgrids
    * apply); a GEOIDMODEL name is accepted and ignored since the model
    * grids are catalog assets, not computation. */
  private def buildCompound(root: WNode): Crs = {
    val comps = root.args.collect { case n: WNode => n }
      .filter(n => crsKeywords(n.kw) || n.kw == "VERTCRS" || n.kw == "VERT_CS" ||
        n.kw == "VERTICALCRS")
    val horiz = comps.find(n => n.kw != "VERTCRS" && n.kw != "VERT_CS" &&
        n.kw != "VERTICALCRS")
      .getOrElse(throw BadWkt("COMPOUNDCRS without a horizontal component"))
    val vert = comps.find(n => n.kw == "VERTCRS" || n.kw == "VERT_CS" ||
        n.kw == "VERTICALCRS")
      .getOrElse(throw BadWkt("COMPOUNDCRS without a vertical component"))
    val crs = build(horiz)
    val vUnit = vert.nodes("AXIS").flatMap(_.node("LENGTHUNIT", "UNIT")).headOption
      .orElse(vert.node("LENGTHUNIT", "UNIT")).map(unitFactor).getOrElse(1.0)
    val proj2 =
      if (math.abs(vUnit - 1.0) < 1e-12) crs.projString
      else s"${crs.projString} +vto_meter=${fmt(vUnit)}"
    crs.copy(name = root.str(0), projString = proj2)
  }

  // datum + ellipsoid + prime meridian + optional WKT1 TOWGS84
  private final case class GeodeticBase(datumName: String, a: Double, rf: Double,
                                        pmDeg: Double, towgs84: Option[String])

  private def geodeticBase(crsNode: WNode): GeodeticBase = {
    val datum = crsNode.node("DATUM", "TRF", "GEODETICDATUM", "ENSEMBLE")
      .getOrElse(throw BadWkt(s"${crsNode.kw}: no datum"))
    val ell = datum.node("ELLIPSOID", "SPHEROID")
      .orElse(datum.nodes("MEMBER").headOption.flatMap(_.node("ELLIPSOID")))
      .orElse(crsNode.node("ELLIPSOID", "SPHEROID")) // ENSEMBLE puts it at datum level
      .getOrElse(throw BadWkt("no ellipsoid"))
    val aUnit = lengthUnitOf(ell, 1.0)
    val a = ell.num(1) * aUnit
    val rf = ell.num(2)
    // PRIMEM sits inside GEOGCS (WKT1) or at CRS level (WKT2)
    val pm = crsNode.node("PRIMEM", "PRIMEMERIDIAN")
      .orElse(datum.node("PRIMEM", "PRIMEMERIDIAN"))
    val pmDeg = pm.map { n =>
      val f = angleUnitOf(n, DegToRad)
      n.num(1) * f / DegToRad
    }.getOrElse(0.0)
    val towgs = datum.node("TOWGS84").orElse(crsNode.node("TOWGS84")).map { t =>
      t.args.collect { case WNum(v) => fmt(v) }.mkString(",")
    }
    GeodeticBase(datum.str(0), a, rf, pmDeg, towgs)
  }

  private[proj] def fmt(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else {
      val s = v.toString
      // Locale.ROOT: a comma decimal separator would corrupt +towgs84 lists
      if (s.contains('E') || s.contains('e'))
        String.format(java.util.Locale.ROOT, "%.17g", java.lang.Double.valueOf(v))
      else s
    }

  private def ellFragment(b: GeodeticBase): String =
    if (b.rf == 0.0) s"+a=${fmt(b.a)} +b=${fmt(b.a)}"
    else s"+a=${fmt(b.a)} +rf=${fmt(b.rf)}"

  private def commonTail(b: GeodeticBase): String = {
    val sb = new StringBuilder(ellFragment(b))
    if (b.pmDeg != 0.0) sb.append(s" +pm=${fmt(b.pmDeg)}")
    b.towgs84.foreach(t => sb.append(s" +towgs84=$t"))
    sb.toString
  }

  /** First-axis abbreviation letters for an AXIS node: direction word
    * (arg 1) -> e/w/n/s/u/d. */
  private def axisLetter(n: WNode): Char = {
    val dir = n.args.lift(1) match {
      case Some(WWord(w)) => w.toLowerCase
      case Some(WStr(s)) => s.toLowerCase
      case _ => throw BadWkt("AXIS without direction")
    }
    dir match {
      case "east" => 'e'; case "west" => 'w'
      case "north" => 'n'; case "south" => 's'
      case "up" => 'u'; case "down" => 'd'
      case o => throw BadWkt(s"unsupported axis direction $o")
    }
  }

  private def buildGeog(root: WNode, isWkt1: Boolean): Crs = {
    val b = geodeticBase(root)
    // angular unit of the coordinates themselves: only degree-based WKT is
    // lowered (grad-coordinate CRS would need a unitconvert wrapper)
    val csUnit = root.node("CS").flatMap(_ => axisUnit(root, angular = true))
      .orElse(root.node("ANGLEUNIT", "UNIT").map(unitFactor))
      .getOrElse(DegToRad)
    if (math.abs(csUnit - DegToRad) > 1e-12 * DegToRad)
      throw BadWkt(f"geographic CS unit $csUnit%.9g rad is not degree " +
        "(non-degree geographic coordinates are out of scope)")
    val axes = root.nodes("AXIS")
    // EPSG geographic order is lat,lon; GIS WKT1 without axes is lon,lat
    val latFirst =
      if (axes.nonEmpty) "ns".contains(axisLetter(axes.head))
      else !isWkt1
    Crs(root.str(0), "geog", s"+proj=longlat ${commonTail(b)}",
      b.a, b.rf, b.datumName, latFirst, if (latFirst) "neu" else "enu",
      epsgId(root))
  }

  private def buildGeocent(root: WNode): Crs = {
    val b = geodeticBase(root)
    Crs(root.str(0), "geocent", s"+proj=cart ${commonTail(b)}",
      b.a, b.rf, b.datumName, latFirst = false, "enu", epsgId(root))
  }

  /** Unit of the first matching coordinate axis (angular or linear),
    * looking at per-axis unit nodes then a trailing CS-level unit. */
  private def axisUnit(crsNode: WNode, angular: Boolean): Option[Double] = {
    val names = if (angular) Seq("ANGLEUNIT", "UNIT") else Seq("LENGTHUNIT", "UNIT")
    val fromAxis = crsNode.nodes("AXIS").flatMap(_.node(names: _*)).headOption
    fromAxis.orElse(crsNode.node(names: _*)).map(unitFactor)
  }

  // --- projection method lowering ------------------------------------------

  /** Normalized method name -> (proj name, parameter-name mapping).
    * EPSG method names (WKT2) and GDAL/ESRI WKT1 projection names. */
  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  // canonical proj parameter targets
  private val paramMap: Map[String, String] = Map(
    "latitude of natural origin" -> "lat_0",
    "latitude of origin" -> "lat_0",
    "latitude of center" -> "lat_0",
    "latitude of centre" -> "lat_0",
    "latitude of projection centre" -> "lat_0",
    "latitude of projection center" -> "lat_0",
    "latitude of false origin" -> "lat_0",
    "longitude of natural origin" -> "lon_0",
    "central meridian" -> "lon_0",
    "longitude of center" -> "lon_0",
    "longitude of centre" -> "lon_0",
    "longitude of origin" -> "lon_0",
    "longitude of false origin" -> "lon_0",
    "scale factor at natural origin" -> "k_0",
    "scale factor" -> "k_0",
    "scale factor on initial line" -> "k_0",
    "scale factor on pseudo standard parallel" -> "k_0",
    "false easting" -> "x_0",
    "false northing" -> "y_0",
    "easting at false origin" -> "x_0",
    "northing at false origin" -> "y_0",
    "easting at projection centre" -> "x_0",
    "northing at projection centre" -> "y_0",
    "easting at projection center" -> "x_0",
    "northing at projection center" -> "y_0",
    "latitude of 1st standard parallel" -> "lat_1",
    "standard parallel 1" -> "lat_1",
    "latitude of 2nd standard parallel" -> "lat_2",
    "standard parallel 2" -> "lat_2",
    "latitude of standard parallel" -> "lat_ts",
    "azimuth of initial line" -> "alpha",
    "azimuth at projection centre" -> "alpha",
    "azimuth" -> "alpha",
    "angle from rectified to skew grid" -> "gamma",
    "rectified grid angle" -> "gamma",
    "xy plane rotation" -> "gamma", // ESRI RSO spelling
    "co latitude of cone axis" -> "alpha",
    "latitude of pseudo standard parallel" -> "lat_1",
    "longitude of projection centre" -> "lonc",
    "longitude of projection center" -> "lonc",
    "pseudo standard parallel 1" -> "lat_1",
    "central parallel" -> "lat_1", // ESRI Loximuthal
    // two-point Hotine (ESRI Hotine_Oblique_Mercator_Two_Point_*)
    "latitude of 1st point" -> "lat_1",
    "longitude of 1st point" -> "lon_1",
    "latitude of 2nd point" -> "lat_2",
    "longitude of 2nd point" -> "lon_2",
    "height" -> "h", // ESRI Vertical_Near_Side_Perspective
    "viewpoint height" -> "h", // EPSG 8840 equivalent name
    // ESRI variant selector (Peirce shape, geos option): captured under a
    // "_"-prefixed key so it never lands in the proj string as-is
    "option" -> "_option")

  private val angularParams =
    Set("lat_0", "lon_0", "lat_1", "lat_2", "lat_ts", "alpha", "gamma", "lonc",
      "lon_1", "lon_2")
  private val linearParams = Set("x_0", "y_0", "h")

  /** EPSG operation-parameter codes -> canonical proj targets (used when a
    * PARAMETER is identified by ID rather than a recognizable name). */
  private val paramCodeMap: Map[Int, String] = Map(
    8801 -> "lat_0", 8802 -> "lon_0", 8805 -> "k_0", 8806 -> "x_0",
    8807 -> "y_0", 8811 -> "lat_0", 8812 -> "lonc", 8813 -> "alpha",
    8814 -> "gamma", 8815 -> "k_0", 8816 -> "x_0", 8817 -> "y_0",
    8818 -> "lat_1", 8819 -> "k_0", 8821 -> "lat_0", 8822 -> "lon_0",
    8823 -> "lat_1", 8824 -> "lat_2", 8826 -> "x_0", 8827 -> "y_0",
    8832 -> "lat_ts", 8833 -> "lon_0", 1036 -> "alpha")

  private def epsgParamCode(n: WNode): Option[Int] =
    n.nodes("ID", "AUTHORITY").collectFirst {
      case id if id.args.nonEmpty && id.str(0).equalsIgnoreCase("EPSG") &&
                 id.args.size >= 2 =>
        id.args(1) match {
          case WNum(v) => v.toInt
          case WStr(s) => s.toInt
          case _ => -1
        }
    }.filter(_ > 0)

  private final case class Method(proj: String, extra: List[String] = Nil,
                                  special: String = "")

  private val methodMap: Map[String, Method] = Map(
    "transverse mercator" -> Method("tmerc"),
    // ESRI "complex" TM = the exact (Poder-Engsager) series — our tmerc
    "transverse mercator complex" -> Method("tmerc"),
    "gauss kruger" -> Method("tmerc"),
    "equidistant conic" -> Method("eqdc"),
    "equidistant cylindrical ellipsoidal" -> Method("eqc", special = "stdPar1IsTs"),
    // Behrmann = cylindrical equal area with fixed 30 deg std parallel
    "behrmann" -> Method("cea", List("+lat_ts=30")),
    // ESRI Rectified Skew Orthomorphic (natural origin) = HOM variant A
    "rectified skew orthomorphic natural origin" -> Method("omerc", List("+no_uoff")),
    "transverse mercator south orientated" -> Method("tmerc", List("+axis=wsu")),
    "universal transverse mercator" -> Method("utm", special = "utm"),
    "mercator variant a" -> Method("merc"),
    "mercator 1sp" -> Method("merc"),
    "mercator variant b" -> Method("merc", special = "stdPar1IsTs"),
    "mercator 2sp" -> Method("merc", special = "stdPar1IsTs"),
    "popular visualisation pseudo mercator" -> Method("webmerc"),
    "pseudo mercator" -> Method("webmerc"),
    "mercator auxiliary sphere" -> Method("webmerc"),
    "lambert conic conformal 1sp" -> Method("lcc", special = "lcc1sp"),
    "lambert conformal conic 1sp" -> Method("lcc", special = "lcc1sp"),
    "lambert conic conformal 2sp" -> Method("lcc"),
    "lambert conformal conic 2sp" -> Method("lcc"),
    "lambert conformal conic" -> Method("lcc"),
    "oblique stereographic" -> Method("sterea"),
    "double stereographic" -> Method("sterea"),
    "polar stereographic variant a" -> Method("stere", special = "polarA"),
    "polar stereographic variant b" -> Method("stere", special = "polarB"),
    "polar stereographic" -> Method("stere", special = "polarWkt1"),
    "stereographic" -> Method("stere"),
    "lambert azimuthal equal area" -> Method("laea"),
    "albers equal area" -> Method("aea"),
    "albers conic equal area" -> Method("aea"),
    "albers" -> Method("aea"),
    "equidistant cylindrical" -> Method("eqc", special = "stdPar1IsTs"),
    "equidistant cylindrical spherical" -> Method("eqc", special = "stdPar1IsTs"),
    "equirectangular" -> Method("eqc", special = "stdPar1IsTs"),
    "cassini soldner" -> Method("cass"),
    "cassini" -> Method("cass"),
    "sinusoidal" -> Method("sinu"),
    "mollweide" -> Method("moll"),
    "robinson" -> Method("robin"),
    "american polyconic" -> Method("poly"),
    "polyconic" -> Method("poly"),
    "orthographic" -> Method("ortho"),
    "gnomonic" -> Method("gnom"),
    "azimuthal equidistant" -> Method("aeqd"),
    "modified azimuthal equidistant" -> Method("aeqd"),
    "miller cylindrical" -> Method("mill"),
    "van der grinten" -> Method("vandg"),
    "gall stereographic" -> Method("gall"),
    "eckert iv" -> Method("eck4"),
    "eckert vi" -> Method("eck6"),
    "krovak" -> Method("krovak", List("+axis=swu")),
    "krovak north orientated" -> Method("krovak"),
    "krovak modified" -> Method("mod_krovak", List("+axis=swu")),
    "krovak modified north orientated" -> Method("mod_krovak"),
    "new zealand map grid" -> Method("nzmg"),
    "hotine oblique mercator variant a" -> Method("omerc", List("+no_uoff")),
    "hotine oblique mercator" -> Method("omerc", List("+no_uoff")),
    "hotine oblique mercator variant b" -> Method("omerc"),
    "hotine oblique mercator azimuth center" -> Method("omerc"),
    "oblique mercator" -> Method("omerc"),
    "hotine oblique mercator two point natural origin" -> Method("omerc", special = "omerc2pt"),
    // ESRI exotic set the reference's esriparammappings also carries
    "two point equidistant" -> Method("tpeqd"),
    "geostationary satellite" -> Method("geos"), // sweep-Y = proj default
    "peirce quincuncial" -> Method("peirce_q", special = "peirceOpt"),
    "laborde oblique mercator" -> Method("labrd"),
    "swiss oblique cylindrical" -> Method("somerc"),
    "swiss oblique mercator" -> Method("somerc"),
    "hotine oblique mercator azimuth natural origin" -> Method("omerc", List("+no_uoff")),
    // --- ESRI WKT1 dialect names (the reference's esriparammappings.cpp;
    //     ArcGIS spells methods with underscores, normalized to spaces here)
    "mercator" -> Method("merc", special = "stdPar1IsTs"), // ESRI: std par 1 = true-scale lat
    "plate carree" -> Method("eqc", special = "stdPar1IsTs"),
    "cylindrical equal area" -> Method("cea", special = "stdPar1IsTs"),
    "stereographic north pole" -> Method("stere", special = "polarEsriN"),
    "stereographic south pole" -> Method("stere", special = "polarEsriS"),
    "winkel tripel" -> Method("wintri"),
    "winkel i" -> Method("wink1"),
    "winkel ii" -> Method("wink2"),
    "aitoff" -> Method("aitoff"),
    "hammer aitoff" -> Method("hammer"),
    "goode homolosine" -> Method("goode"),
    "interrupted goode homolosine" -> Method("igh"),
    "bonne" -> Method("bonne"),
    "vertical near side perspective" -> Method("nsper"),
    "eckert i" -> Method("eck1"),
    "eckert ii" -> Method("eck2"),
    "eckert iii" -> Method("eck3"),
    "eckert v" -> Method("eck5"),
    "van der grinten i" -> Method("vandg"),
    "loximuthal" -> Method("loxim"),
    "quartic authalic" -> Method("qua_aut"),
    "craster parabolic" -> Method("crast"),
    "flat polar quartic" -> Method("mbtfpq"),
    "times" -> Method("times"),
    "natural earth" -> Method("natearth"),
    "natural earth ii" -> Method("natearth2"),
    "compact miller" -> Method("comill"),
    "patterson" -> Method("patterson"),
    "equal earth" -> Method("eqearth"),
    "wagner iv" -> Method("wag4"),
    "wagner v" -> Method("wag5"),
    "wagner vii" -> Method("wag7"))

  private def buildProjected(root: WNode): Crs = {
    val isWkt1 = root.kw == "PROJCS"
    val baseNode = root.node("BASEGEOGCRS", "BASEGEODCRS", "GEOGCS")
      .getOrElse(throw BadWkt(s"${root.kw}: no base geographic CRS"))
    val b = geodeticBase(baseNode)
    // angular unit of the base CRS (WKT1 parameters inherit it)
    val baseAngUnit = baseNode.node("ANGLEUNIT", "UNIT").map(unitFactor)
      .getOrElse(DegToRad)

    // conversion: WKT2 nests it; WKT1 has PROJECTION/PARAMETER at top level
    val conv = root.node("CONVERSION", "DERIVINGCONVERSION")
    val methodName = conv.flatMap(_.node("METHOD", "PROJECTION"))
      .orElse(root.node("PROJECTION"))
      .map(_.str(0)).getOrElse(throw BadWkt("no projection method"))
    val paramNodes = conv.map(_.nodes("PARAMETER")).getOrElse(root.nodes("PARAMETER"))

    // projected linear unit: per-axis LENGTHUNIT (WKT2) or CS-level UNIT
    val linUnit = axisUnit(root, angular = false).getOrElse(1.0)

    val method = methodMap.getOrElse(norm(methodName),
      throw BadWkt(s"unsupported projection method '$methodName'"))

    // collect parameters in canonical proj terms (degrees / metres / unity)
    val params = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    paramNodes.foreach { pn =>
      val rawName = norm(pn.str(0))
      paramMap.get(rawName)
        .orElse(epsgParamCode(pn).flatMap(paramCodeMap.get)).foreach { target =>
        val v = pn.num(1)
        val canon =
          if (angularParams(target)) {
            val f = pn.node("ANGLEUNIT", "UNIT").map(unitFactor)
              .getOrElse(if (isWkt1) baseAngUnit else DegToRad)
            v * f / DegToRad
          } else if (linearParams(target)) {
            val f = pn.node("LENGTHUNIT", "UNIT").map(unitFactor)
              .getOrElse(if (isWkt1) linUnit else 1.0)
            v * f
          } else v // scale factors are unity-unit
        params(target) = canon
      }
    }

    // method-specific fixups (the reference's PROJString export rules)
    var specialTail = ""
    method.special match {
      case "peirceOpt" =>
        // ESRI Peirce_Quincuncial Option: 0 = square, 1 = diamond
        // (esriparammappings.cpp alt1/alt2)
        val diamond = params.remove("_option")
          .exists(v => math.abs(v - 1.0) < 1e-9)
        specialTail = if (diamond) " +shape=diamond" else " +shape=square"
      case _ =>
    }
    method.special match {
      case "lcc1sp" =>
        // 1SP: the single standard parallel IS the origin latitude
        params.get("lat_0").foreach(l0 => params.getOrElseUpdate("lat_1", l0))
      case "stdPar1IsTs" =>
        // EPSG spells the true-scale parallel as "1st standard parallel"
        // for Mercator (variant B) and Equidistant Cylindrical; proj wants
        // lat_ts
        params.remove("lat_1").foreach(v => params("lat_ts") = v)
      case "polarA" => // lat_0 = +-90 with k_0: proj stere handles directly
      case "polarB" =>
        // variant B: standard parallel -> lat_ts, origin at matching pole
        params.get("lat_ts").orElse(params.get("lat_1")).foreach { ts =>
          params("lat_ts") = ts
          params("lat_0") = if (ts < 0) -90.0 else 90.0
        }
      case "polarEsriN" | "polarEsriS" =>
        // ESRI spells polar stereographic as a hemisphere-specific method
        // with Standard_Parallel_1 as the true-scale latitude
        params.remove("lat_1").foreach(v => params("lat_ts") = v)
        params("lat_0") = if (method.special == "polarEsriS") -90.0 else 90.0
      case "polarWkt1" =>
        // WKT1 Polar_Stereographic: |lat| < 90 means variant B with the
        // latitude as true-scale parallel (io.cpp WKT1 import convention)
        params.get("lat_0").foreach { l0 =>
          if (math.abs(l0) < 90.0 - 1e-9 &&
              math.abs(params.getOrElse("k_0", 1.0) - 1.0) < 1e-12) {
            params("lat_ts") = l0
            params("lat_0") = if (l0 < 0) -90.0 else 90.0
          }
        }
      case "utm" =>
        // EPSG 9824: "UTM zone" parameter pair (zone number + hemisphere)
        throw BadWkt("UTM-method WKT should spell Transverse Mercator parameters")
      case "omerc2pt" =>
        // two-point form: lat_1/lon_1/lat_2/lon_2 flow through; the
        // dispatch picks OmercKernel.fromTwoPoints when alpha/gamma are
        // absent, so nothing to fix up here
        if (!params.contains("lat_1") || !params.contains("lat_2"))
          throw BadWkt("two-point Hotine needs both defining points")
      case _ =>
    }

    // ESRI/GDAL WKT1 spell the Hotine centre longitude "Longitude_Of_Center",
    // which the generic parameter table maps to lon_0; omerc takes +lonc
    // (not in the two-point form, whose longitudes are the defining points)
    if (method.proj == "omerc" && method.special != "omerc2pt" &&
        !params.contains("lonc"))
      params.remove("lon_0").foreach(v => params("lonc") = v)

    val sb = new StringBuilder(s"+proj=${method.proj}")
    params.foreach { case (k, v) =>
      if (!k.startsWith("_")) { // "_option"-style selectors never emit
        val key = if (k == "k_0") "k" else k
        sb.append(s" +$key=${fmt(v)}")
      }
    }
    method.extra.foreach(e => sb.append(' ').append(e))
    sb.append(specialTail)
    sb.append(' ').append(commonTail(b))
    if (math.abs(linUnit - 1.0) > 1e-12) sb.append(s" +to_meter=${fmt(linUnit)}")

    // authority axis order of the projected CS
    val axes = root.nodes("AXIS")
    val axisSpec =
      if (axes.size >= 2) axes.take(3).map(axisLetter).mkString.padTo(3, 'u')
      else "enu"
    val northFirst = axisSpec.headOption.exists(c => c == 'n' || c == 's')

    Crs(root.str(0), "projected", sb.toString, b.a, b.rf, b.datumName,
      latFirst = northFirst, axis = axisSpec, epsgId(root))
  }

  private def buildBound(root: WNode): Crs = {
    val src = root.node("SOURCECRS").flatMap(_.args.collectFirst { case n: WNode => n })
      .getOrElse(throw BadWkt("BOUNDCRS without SOURCECRS"))
    val crs = build(src)
    val tf = root.node("ABRIDGEDTRANSFORMATION")
      .getOrElse(throw BadWkt("BOUNDCRS without ABRIDGEDTRANSFORMATION"))
    // abridged-transformation parameters: matched by name or EPSG code
    // (8605-8611), since WKT may carry arbitrary local names.  Units are
    // honored when PARAMETER carries a unit node — real exports spell
    // translations in millimetres and rotations in milliarc-seconds
    // (PROJ's own BoundCRS JSON output does) — with the ISO abridged
    // defaults otherwise: metres, arc-seconds, and scale difference as
    // the RATIO (1.000007 = 7 ppm)
    val arcSec = DegToRad / 3600.0
    def pNode(name: String, code: Int): Option[WNode] =
      tf.nodes("PARAMETER").find { n =>
        norm(n.str(0)) == name || epsgParamCode(n).contains(code)
      }
    def lin(name: String, code: Int): Option[Double] = pNode(name, code).map {
      n => n.num(1) * n.node("LENGTHUNIT", "UNIT").map(unitFactor).getOrElse(1.0)
    }
    def ang(name: String, code: Int): Option[Double] = pNode(name, code).map {
      n => n.node("ANGLEUNIT", "UNIT").map(unitFactor) match {
        // snap the printed arc-second factor (4.84813681109536e-06 etc.)
        // so standard-unit values survive bit-exact, then convert any
        // genuinely different angular unit
        case Some(toRad) if math.abs(toRad / arcSec - 1) < 1e-12 => n.num(1)
        case Some(toRad) if math.abs(toRad / arcSec - 1e-3) < 1e-15 =>
          n.num(1) / 1000.0 // milliarc-second
        case Some(toRad) => n.num(1) * toRad / arcSec
        case None => n.num(1) // abridged default: already arc-seconds
      }
    }
    val tx = lin("x axis translation", 8605).getOrElse(0.0)
    val ty = lin("y axis translation", 8606).getOrElse(0.0)
    val tz = lin("z axis translation", 8607).getOrElse(0.0)
    val rx = ang("x axis rotation", 8608); val ry = ang("y axis rotation", 8609)
    val rz = ang("z axis rotation", 8610)
    // scale difference: a unit factor != 1 (ppm = 1e-6, ppb = 1e-9) marks
    // the DIFFERENCE form; factor 1 / no unit is the abridged RATIO form
    val ds = pNode("scale difference", 8611).map { n =>
      n.node("SCALEUNIT", "UNIT").map(unitFactor) match {
        case Some(f) if math.abs(f - 1e-6) < 1e-18 => n.num(1) // ppm verbatim
        case Some(f) if math.abs(f - 1e-9) < 1e-21 => n.num(1) / 1000.0 // ppb
        case Some(f) if f != 1.0 => n.num(1) * f * 1e6
        case _ => (n.num(1) - 1.0) * 1e6
      }
    }
    val seven = rx.isDefined || ry.isDefined || rz.isDefined || ds.isDefined
    val vec =
      if (seven)
        Seq(tx, ty, tz, rx.getOrElse(0.0), ry.getOrElse(0.0),
          rz.getOrElse(0.0), ds.getOrElse(0.0))
      else Seq(tx, ty, tz)
    val towgs = vec.map(fmt).mkString(",")
    val proj2 =
      if (crs.projString.contains("+towgs84=")) crs.projString
      else s"${crs.projString} +towgs84=$towgs"
    crs.copy(projString = proj2)
  }

}
