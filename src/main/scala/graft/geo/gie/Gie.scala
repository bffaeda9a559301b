package graft.geo.gie

import scala.collection.mutable.ListBuffer

import graft.geo.geodesic.Geodesic
import graft.geo.kernels.{IOUnits, PointKernel}
import graft.geo.proj.ProjString

/** Parser + runner for PROJ's `gie` golden-fixture grammar
  * (/root/reference/src/apps/gie.cpp:158-176 for the verb set,
  * :1440-1530 for the free-format tokenizer): `operation` starts a block;
  * `accept`/`expect` pairs run it; `tolerance`, `direction`, `roundtrip`
  * modify the check.  Instructions extend until the next verb or a
  * "decorative element" (>=5 identical leading chars); material outside
  * `<gie>`/`<gie-strict>` blocks is prose.
  *
  * Comparison rule mirrors gie.cpp:1128-1164: angular outputs compare by
  * geodesic distance (+z euclidean), linear outputs by euclidean distance,
  * against a tolerance parsed with a unit suffix (default 0.5 mm).
  *
  * Operations whose proj-string our engine does not support are counted
  * as `skippedOps` — the scalatest suites assert lower bounds on the
  * supported counts so silent skips can't hollow out the suite.
  */
object Gie {

  sealed trait Cmd
  final case class Operation(projString: String, line: Int) extends Cmd
  final case class Accept(v: Array[Double], dims: Int) extends Cmd
  final case class Expect(v: Array[Double], dims: Int, failure: Boolean,
                          line: Int) extends Cmd
  final case class Tolerance(metres: Double) extends Cmd
  final case class Direction(forward: Boolean) extends Cmd
  final case class Roundtrip(n: Int, tolMetres: Option[Double], line: Int) extends Cmd
  final case class RequireGrid(names: List[String]) extends Cmd
  final case class CrsSrc(code: String) extends Cmd
  final case class CrsDst(code: String, line: Int) extends Cmd

  final case class Failure(file: String, line: Int, op: String, msg: String)

  final case class Stats(file: String,
                         supportedOps: Int, skippedOps: Int, badOps: Int,
                         checks: Int, failures: List[Failure],
                         checksByProj: Map[String, Int]) {
    def ok: Boolean = failures.isEmpty
    def summary: String =
      s"$file: ops supported=$supportedOps skipped=$skippedOps bad=$badOps " +
        s"checks=$checks failures=${failures.size}"
  }

  private val Verbs = List("operation", "accept", "expect", "roundtrip",
    "banner", "verbose", "direction", "tolerance", "ignore", "require_grid",
    "echo", "skip", "use_proj4_init_rules", "crs_src", "crs_dst")

  /** Parse gie file content into commands (only the verbs we act on). */
  def parse(content: String): List[Cmd] = {
    val out = ListBuffer.empty[Cmd]
    var inBlock = false
    var lineNo = 0
    // gather instruction lines: a verb line plus continuation lines until
    // the next verb / decoration / blank-ish prose
    var pending: Option[(String, String, Int)] = None // (verb, args, line)

    def decorative(l: String): Boolean =
      l.length >= 5 && l.take(5).distinct.length == 1 && !l.head.isLetterOrDigit

    def flush(): Unit = {
      pending.foreach { case (verb, args, ln) =>
        emit(verb, args.trim, ln, out)
      }
      pending = None
    }

    content.linesIterator.foreach { raw =>
      lineNo += 1
      // pj_chomp strips BOTH pre- and postfix whitespace (and '#'
      // comments) before tag matching — some fixtures indent verbs
      val line = raw.takeWhile(_ != '#')
        .replaceAll("^[\\s;]+", "").replaceAll("[\\s;]+$", "")
      if (!inBlock) {
        if (line.startsWith("<gie>") || line.startsWith("<gie-strict>"))
          inBlock = true
      } else if (line.startsWith("</gie")) {
        flush(); inBlock = false
      } else if (decorative(line)) {
        flush()
      } else {
        Verbs.find(v => line.startsWith(v)) match {
          case Some(v) =>
            flush()
            pending = Some((v, line.drop(v.length), lineNo))
          case None =>
            // continuation of the pending instruction
            if (pending.isDefined && line.trim.nonEmpty) {
              val (v, a, ln) = pending.get
              pending = Some((v, a + " " + line.trim, ln))
            }
        }
      }
    }
    flush()
    out.toList
  }

  private def emit(verb: String, args: String, line: Int,
                   out: ListBuffer[Cmd]): Unit = verb match {
    case "operation" => out += Operation(args, line)
    case "tolerance" => out += Tolerance(parseTolerance(args))
    case "direction" =>
      val d = args.trim
      out += Direction(forward = !(d.startsWith("inverse") || d.startsWith("reverse")))
    case "accept" =>
      parseCoord(args).foreach { case (v, d) => out += Accept(v, d) }
    case "expect" =>
      if (args.trim.startsWith("failure")) out += Expect(null, 0, failure = true, line)
      else parseCoord(args).foreach { case (v, d) =>
        out += Expect(v, d, failure = false, line)
      }
    case "roundtrip" =>
      val parts = args.trim.split("\\s+").filter(_.nonEmpty)
      if (parts.nonEmpty) {
        val n = parts(0).toDouble.toInt
        val tol = if (parts.length > 1)
          Some(parseTolerance(parts.drop(1).mkString(" "))) else None
        out += Roundtrip(n, tol, line)
      }
    case "require_grid" =>
      val names = args.trim.split("\\s+").filter(_.nonEmpty).toList
      if (names.nonEmpty) out += RequireGrid(names)
    case "crs_src" => out += CrsSrc(args.trim)
    case "crs_dst" => out += CrsDst(args.trim, line)
    case _ => // banner/verbose/echo/ignore/skip: no-op
  }

  /** "0.1 mm" / "50 nm" / "1 um" / "10 cm" -> metres (gie strtod_scaled,
    * gie.cpp:502-546; deg/rad scale by GRS80 metres-per-degree). */
  def parseTolerance(s: String): Double = {
    val t = s.trim
    // strtod-style split: leading numeric, remainder (possibly after
    // whitespace) is the unit — handles both "0.1 mm" and "1cm"
    val numEnd = {
      var i = 0
      while (i < t.length &&
             (t(i).isDigit || "+-.eE".contains(t(i)) &&
               !(i > 0 && (t(i) == '+' || t(i) == '-') &&
                 t(i - 1) != 'e' && t(i - 1) != 'E'))) i += 1
      i
    }
    val v = t.substring(0, numEnd).toDouble
    val unit0 = t.substring(numEnd).trim.split("\\s+").headOption.getOrElse("")
    val unit = if (unit0.isEmpty) "m" else unit0
    val GRS80Deg = 111319.4908
    unit match {
      case "km" => v * 1000
      case "m"  => v
      case "dm" => v / 10
      case "cm" => v / 100
      case "mm" => v / 1000
      case "um" => v / 1e6
      case "nm" => v / 1e9
      case "deg" => v * GRS80Deg
      case "rad" => v * GRS80Deg * 180 / math.Pi
      case _    => v
    }
  }

  private def parseCoord(s: String): Option[(Array[Double], Int)] = {
    val parts = s.trim.split("\\s+").filter(_.nonEmpty)
    if (parts.isEmpty) return None
    val v = new Array[Double](4)
    val n = math.min(4, parts.length)
    try {
      var i = 0
      while (i < n) {
        // gie numbers may use '_' group separators (2_138_028.224) and
        // the literal HUGE_VAL sentinel (missing component)
        v(i) =
          if (parts(i) == "HUGE_VAL") Double.PositiveInfinity // C HUGE_VAL
          else if (parts(i).equalsIgnoreCase("nan")) Double.NaN
          else ProjString.parseDms(parts(i).replace("_", ""))
        i += 1
      }
      // unset temporal coordinate rides along as NaN-free 0; PROJ uses 0
      Some((v, n))
    } catch {
      case _: NumberFormatException          => None
      case _: ProjString.BadProjString       => None // parseDms typed failure
    }
  }

  // --- runner ---------------------------------------------------------------

  def runFile(path: String): Stats = {
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    run(path.split('/').last, parse(content))
  }

  def run(file: String, cmds: List[Cmd]): Stats = {
    var kernel: Option[PointKernel] = None
    var opBad = false // operation failed to build (for expect-failure)
    var opString = ""
    var tolerance = 0.0005
    var forward = true
    var accept: Array[Double] = null
    var acceptDims = 0
    var supported = 0; var skipped = 0; var bad = 0; var checks = 0
    val failures = ListBuffer.empty[Failure]
    val byProj = scala.collection.mutable.Map.empty[String, Int]
    // crs_src/crs_dst state: EPSG authority order means a lat/northing-
    // first dst — gie.cpp:1147-1157 swaps outputs back to GIS order
    // before the distance comparison
    var crsSrcCode = ""
    var swapOut = false

    def projName(s: String): String =
      s.split("\\s+").find(t => t.stripPrefix("+").startsWith("proj="))
        .map(_.stripPrefix("+").drop(5)).getOrElse("?")

    var geod = Geodesic.GRS80

    // proj_angular_* (side tagged RADIANS -> gie converts degrees<->radians
    // at the boundary); sides tagged DEGREES pass through raw but still
    // compare geodesically (gie.cpp:1131-1143)
    def side(k: PointKernel, input: Boolean): IOUnits.Value =
      if (input == forward) k.left else k.right
    def angular(k: PointKernel, input: Boolean): Boolean =
      side(k, input) == IOUnits.Radians
    def degreeish(k: PointKernel, input: Boolean): Boolean = {
      val s = side(k, input)
      s == IOUnits.Radians || s == IOUnits.Degrees
    }

    def applyOp(k: PointKernel, v: Array[Double]): Option[Array[Double]] = {
      // proj_trans NaN rule (trans.cpp:352): any NaN component -> all
      // components NaN, operation skipped
      if (v.exists(_.isNaN))
        return Some(Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN))
      val w = v.clone()
      if (angular(k, input = true)) {
        w(0) = math.toRadians(w(0)); w(1) = math.toRadians(w(1))
      }
      val ok = if (forward) k.fwd(w) else k.inv(w)
      if (!ok) None
      else {
        if (angular(k, input = false)) {
          w(0) = math.toDegrees(w(0)); w(1) = math.toDegrees(w(1))
        }
        Some(w)
      }
    }

    def dist(k: PointKernel, e: Array[Double], o: Array[Double],
             dims: Int): Double = {
      if (degreeish(k, input = false)) {
        val d2 = geod.distance(e(1), e(0), o(1), o(0))
        if (dims >= 3) math.hypot(d2, o(2) - e(2)) else d2
      } else {
        var s = 0.0
        var i = 0
        val nd = math.min(dims, 3)
        while (i < nd) { val d = o(i) - e(i); s += d * d; i += 1 }
        math.sqrt(s)
      }
    }

    cmds.foreach {
      case Operation(ps, _) =>
        opString = ps
        kernel = None; opBad = false; swapOut = false
        // reference operation() resets direction/tolerance but NOT the
        // accepted coordinate (T.a persists, gie.cpp:627-652): an expect
        // right after a new operation reuses the previous accept — nulling
        // it here silently skipped those checks
        tolerance = 0.0005; forward = true
        try {
          kernel = Some(ProjString.parse(ps))
          // angular comparisons use the operation's own ellipsoid
          // (proj_lpz_dist(P, ...), gie.cpp:1139-1152)
          val ell = ProjString.ellipsoidOfString(ps)
          geod = new Geodesic(ell.a, ell.f)
          supported += 1
        } catch {
          case _: ProjString.Unsupported => skipped += 1
          case _: ProjString.BadProjString => bad += 1; opBad = true
          case _: IllegalArgumentException => bad += 1; opBad = true
        }
      case Tolerance(m) => tolerance = m
      case Direction(f) => forward = f
      case CrsSrc(code) => crsSrcCode = code
      case CrsDst(code, _) =>
        // authority-code pair -> composed pipeline (proj_create_crs_to_crs);
        // unlike `operation`, gie keeps the previous `accept` alive across
        // crs blocks (gie.cpp T.a persists), which epsg_no_grid.gie relies
        // on (an expect-before-accept block)
        opString = s"$crsSrcCode -> $code"
        kernel = None; opBad = false; swapOut = false
        tolerance = 0.0005; forward = true
        graft.geo.proj.EpsgInit.crsToCrs(crsSrcCode, code) match {
          case Some(ps) =>
            try {
              kernel = Some(ProjString.parse(ps))
              val d = graft.geo.proj.EpsgInit.crsDefs(code.trim.toLowerCase)
              swapOut = d.latFirst
              geod = {
                val ell = ProjString.ellipsoidOfString(s"+proj=longlat +ellps=${d.ellps}")
                new Geodesic(ell.a, ell.f)
              }
              supported += 1
            } catch {
              case _: ProjString.Unsupported => skipped += 1
              case _: ProjString.BadProjString => bad += 1; opBad = true
              // kernel-constructor require failures, same as `operation`
              case _: IllegalArgumentException => bad += 1; opBad = true
            }
          case None => skipped += 1
        }
      case RequireGrid(names) =>
        // gie semantics: skip the remaining checks of this operation when a
        // required grid is not in the resource path (gie.cpp require_grid)
        if (!names.forall(graft.geo.grids.Grids.available)) {
          if (kernel.isDefined) { supported -= 1; skipped += 1 }
          kernel = None; opBad = false
        }
      case Accept(v, d) => accept = v; acceptDims = d
      case Expect(e, dims, expectFail, line) =>
        if (kernel.isEmpty && !opBad) {
          // unsupported: skip silently (counted at op level)
        } else if (opBad) {
          // op failed to build: success iff failure was expected
          checks += 1
          if (!expectFail)
            failures += Failure(file, line, opString, "operation failed to build")
        } else if (accept != null) {
          val k = kernel.get
          checks += 1
          byProj.updateWith(projName(opString))(c => Some(c.getOrElse(0) + 1))
          applyOp(k, accept) match {
            case None =>
              if (!expectFail)
                failures += Failure(file, line, opString, "kernel returned error")
            case Some(o) =>
              if (expectFail) {
                failures += Failure(file, line, opString, "expected failure, got result")
              } else {
                // mask dims not given in the expectation
                val oo = o.clone()
                if (dims < 4) oo(3) = 0
                if (dims < 3) oo(2) = 0
                val ee = e.clone()
                if (swapOut) { // lat/northing-first dst: compare in GIS order
                  val t0 = oo(0); oo(0) = oo(1); oo(1) = t0
                  val t1 = ee(0); ee(0) = ee(1); ee(1) = t1
                }
                // gie.cpp:1136: both-NaN first ordinates compare equal
                val d =
                  if (oo(0).isNaN && ee(0).isNaN) 0.0
                  else dist(k, ee, oo, math.max(dims, 2))
                if (!(d <= tolerance))
                  failures += Failure(file, line, opString,
                    f"deviation ${d * 1000}%.6f mm > tol ${tolerance * 1000}%.6f mm " +
                      s"(got ${oo.take(dims).mkString(", ")}; want ${ee.take(dims).mkString(", ")})")
                else if (dims == 4 && math.abs(ee(3) - oo(3)) > 1e-4)
                  failures += Failure(file, line, opString,
                    s"temporal deviation ${math.abs(ee(3) - oo(3))}")
              }
          }
        }
      case Roundtrip(n, tolOpt, line) =>
        kernel.foreach { k =>
          if (accept != null && k.invertible) {
            checks += 1
            val tol = tolOpt.getOrElse(tolerance)
            var v = accept.clone()
            // proj_roundtrip NaN rule (trans.cpp:619): a NaN input
            // collapses the whole chain to all-NaN via proj_trans, and
            // the deviation is defined as 0
            val nanInput = v.exists(_.isNaN)
            val angIn = angular(k, input = true)
            if (angIn) { v(0) = math.toRadians(v(0)); v(1) = math.toRadians(v(1)) }
            var ok = true
            var i = 0
            while (i < n && ok && !nanInput) {
              ok = (if (forward) k.fwd(v) else k.inv(v)) &&
                (if (forward) k.inv(v) else k.fwd(v))
              i += 1
            }
            if (!ok)
              failures += Failure(file, line, opString, "roundtrip errored")
            else {
              if (angIn) { v(0) = math.toDegrees(v(0)); v(1) = math.toDegrees(v(1)) }
              // roundtrip compares in the INPUT space: pick geodesic vs
              // euclidean from the input side's units (gie.cpp input-space
              // comparison), not the output side's
              val dd =
                if (nanInput) 0.0
                else if (degreeish(k, input = true))
                  geod.distance(accept(1), accept(0), v(1), v(0))
                else {
                  var s = 0.0
                  var i = 0
                  val nd = math.min(acceptDims, 3)
                  while (i < nd) { val d0 = v(i) - accept(i); s += d0 * d0; i += 1 }
                  math.sqrt(s)
                }
              if (!(dd <= tol))
                failures += Failure(file, line, opString,
                  f"roundtrip deviation ${dd * 1000}%.6f mm > ${tol * 1000}%.6f mm")
            }
          }
        }
      case _ =>
    }
    Stats(file, supported, skipped, bad, checks, failures.toList, byProj.toMap)
  }
}
