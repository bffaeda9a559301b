package graft.geo.proj

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import Wkt.{Arg, WNode, WNum, WStr, WWord}

/** PROJJSON CRS parser + formatter — the third CRS interchange format
  * next to proj-strings and WKT.
  *
  * Behavioral reference: the reference's `JSONParser`
  * (/root/reference/src/iso19111/io.cpp:5954, `createFromUserInput` JSON
  * branch) and `JSONFormatter` exports, against the published schema
  * (/root/reference/schemas/v0.7/projjson.schema.json).  PROJJSON is by
  * construction "WKT2 as JSON" — the same ISO 19111 object model with the
  * same method/parameter names — so this implementation is a *structural
  * transcoder*: parsing lowers the JSON document to the exact [[Wkt.WNode]]
  * tree the WKT2 parser consumes (one method/parameter table, not two),
  * and formatting renders [[WktFormat]]'s WKT2 output tree as JSON.  That
  * guarantees the three front-ends can never drift apart numerically.
  *
  * Covered object types: GeographicCRS, GeodeticCRS (ellipsoidal and
  * geocentric), ProjectedCRS, BoundCRS, CompoundCRS (+VerticalCRS
  * component), with GeodeticReferenceFrame / DynamicGeodeticReferenceFrame
  * / datum_ensemble datums, value-and-unit measures and EPSG ids.
  */
object ProjJson {
  final case class BadProjJson(msg: String) extends RuntimeException(msg)

  private val DegToRad = math.Pi / 180.0

  /** Cheap dispatch test: does this text start like a PROJJSON document? */
  def looksLikeProjJson(s: String): Boolean = {
    val t = s.dropWhile(_.isWhitespace)
    t.startsWith("{") && t.contains("\"type\"")
  }

  /** Parse PROJJSON text to the same lowered CRS model as [[Wkt.parseCrs]]. */
  def parseCrs(text: String): Wkt.Crs = {
    val root =
      try new ObjectMapper().readTree(text)
      catch { case e: Exception => throw BadProjJson(s"not JSON: ${e.getMessage}") }
    if (root == null || !root.isObject) throw BadProjJson("not a JSON object")
    try Wkt.buildCrs(crsNode(root))
    catch { case e: Wkt.BadWkt => throw BadProjJson(e.msg) }
  }

  // --- JSON -> WKT node tree -------------------------------------------------

  private def str(j: JsonNode, key: String): String = {
    val v = j.get(key)
    if (v == null || !v.isTextual) throw BadProjJson(s"missing \"$key\" string")
    v.asText()
  }
  private def strOpt(j: JsonNode, key: String): Option[String] =
    Option(j.get(key)).filter(_.isTextual).map(_.asText())
  private def obj(j: JsonNode, key: String): JsonNode = {
    val v = j.get(key)
    if (v == null || !v.isObject) throw BadProjJson(s"missing \"$key\" object")
    v
  }

  private def typeOf(j: JsonNode): String = strOpt(j, "type").getOrElse("")

  /** Dispatch any PROJJSON CRS object to its WKT2 node equivalent. */
  private def crsNode(j: JsonNode): WNode = typeOf(j) match {
    case "GeographicCRS" => geodeticNode(j, "GEOGCRS")
    case "GeodeticCRS" => geodeticNode(j, "GEODCRS")
    case "ProjectedCRS" => projectedNode(j)
    case "BoundCRS" => boundNode(j)
    case "CompoundCRS" => compoundNode(j)
    case "VerticalCRS" => verticalNode(j)
    case t => throw BadProjJson(s"unsupported PROJJSON type \"$t\"")
  }

  /** Required key whose value may be any JSON type (measures are a bare
    * number or a {value, unit} object). */
  private def req(j: JsonNode, key: String): JsonNode = {
    val v = j.get(key)
    if (v == null) throw BadProjJson(s"missing \"$key\"")
    v
  }

  /** A measure that is either a bare number (in `defaultFactor` units of
    * the SI base) or a {value, unit} object; returns SI base units. */
  private def measure(j: JsonNode, defaultFactor: Double): Double = {
    if (j == null) throw BadProjJson("missing measure")
    if (j.isNumber) j.asDouble() * defaultFactor
    else if (j.isObject) {
      val v = j.get("value")
      if (v == null || !v.isNumber) throw BadProjJson("measure without value")
      v.asDouble() * unitFactor(j.get("unit"))
    } else throw BadProjJson(s"bad measure $j")
  }

  /** Conversion factor to the SI base (metre/radian/unity) of a PROJJSON
    * unit, which is either a well-known name string or a unit object. */
  private def unitFactor(u: JsonNode): Double = {
    if (u == null) throw BadProjJson("measure without unit")
    if (u.isTextual) u.asText() match {
      case "metre" => 1.0
      case "degree" => DegToRad
      case "unity" => 1.0
      case o => throw BadProjJson(s"unknown unit name \"$o\"")
    } else if (u.isObject) {
      val f = u.get("conversion_factor")
      if (f == null || !f.isNumber)
        throw BadProjJson(s"unit ${strOpt(u, "name").getOrElse("?")} without conversion_factor")
      f.asDouble()
    } else throw BadProjJson(s"bad unit $u")
  }

  /** Unit node for the WKT tree (keyword chosen by unit type/kind). */
  private def unitNode(u: JsonNode, angularDefault: Boolean): Option[WNode] = {
    if (u == null) None
    else if (u.isTextual) u.asText() match {
      case "metre" => Some(WNode("LENGTHUNIT", List(WStr("metre"), WNum(1.0))))
      case "degree" => Some(WNode("ANGLEUNIT", List(WStr("degree"), WNum(DegToRad))))
      case "unity" => Some(WNode("SCALEUNIT", List(WStr("unity"), WNum(1.0))))
      case o => throw BadProjJson(s"unknown unit name \"$o\"")
    } else if (u.isObject) {
      val kw = typeOf(u) match {
        case "LinearUnit" => "LENGTHUNIT"
        case "AngularUnit" => "ANGLEUNIT"
        case "ScaleUnit" => "SCALEUNIT"
        case _ => if (angularDefault) "ANGLEUNIT" else "UNIT"
      }
      Some(WNode(kw, List(WStr(strOpt(u, "name").getOrElse("unnamed")),
        WNum(unitFactor(u)))))
    } else throw BadProjJson(s"bad unit $u")
  }

  private def idNodes(j: JsonNode): List[WNode] = {
    def one(n: JsonNode): Option[WNode] =
      for {
        auth <- strOpt(n, "authority")
        code <- Option(n.get("code"))
      } yield WNode("ID", List(WStr(auth),
        if (code.isNumber) WNum(code.asDouble()) else WStr(code.asText())))
    val id = Option(j.get("id")).filter(_.isObject).flatMap(one)
    val ids = Option(j.get("ids")).filter(_.isArray).toList
      .flatMap(a => (0 until a.size()).flatMap(i => one(a.get(i))))
    id.toList ++ ids
  }

  private def ellipsoidNode(j: JsonNode): WNode = {
    val name = str(j, "name")
    val rf =
      if (j.has("inverse_flattening")) j.get("inverse_flattening").asDouble()
      else if (j.has("semi_minor_axis")) {
        val a = measure(req(j, "semi_major_axis"), 1.0)
        val b = measure(req(j, "semi_minor_axis"), 1.0)
        if (b == a) 0.0 else a / (a - b)
      } else if (j.has("radius")) 0.0
      else throw BadProjJson(s"ellipsoid $name without flattening definition")
    val a =
      if (j.has("radius")) measure(req(j, "radius"), 1.0)
      else measure(req(j, "semi_major_axis"), 1.0)
    WNode("ELLIPSOID", List(WStr(name), WNum(a), WNum(rf),
      WNode("LENGTHUNIT", List(WStr("metre"), WNum(1.0)))))
  }

  private def datumNodes(j: JsonNode): List[WNode] = {
    val pm = Option(j.get("datum")).flatMap(d => Option(d.get("prime_meridian")))
      .orElse(Option(j.get("datum_ensemble")).flatMap(d => Option(d.get("prime_meridian"))))
      .map { p =>
        val lonDeg =
          if (p.get("longitude") == null) 0.0
          else measure(p.get("longitude"), DegToRad) / DegToRad
        WNode("PRIMEM", List(WStr(strOpt(p, "name").getOrElse("unnamed")),
          WNum(lonDeg), WNode("ANGLEUNIT", List(WStr("degree"), WNum(DegToRad)))))
      }
    val datum = Option(j.get("datum")).map { d =>
      typeOf(d) match {
        case "GeodeticReferenceFrame" | "DynamicGeodeticReferenceFrame" | "" =>
          WNode("DATUM", List[Arg](WStr(str(d, "name")),
            ellipsoidNode(obj(d, "ellipsoid"))) ++ idNodes(d))
        case t => throw BadProjJson(s"unsupported datum type \"$t\"")
      }
    }.orElse(Option(j.get("datum_ensemble")).map { d =>
      WNode("ENSEMBLE", List[Arg](WStr(str(d, "name")),
        ellipsoidNode(obj(d, "ellipsoid"))) ++ idNodes(d))
    }).getOrElse(throw BadProjJson(
      s"${strOpt(j, "name").getOrElse("CRS")}: no datum or datum_ensemble"))
    datum :: pm.toList
  }

  private def csNodes(j: JsonNode): List[WNode] = {
    val cs = Option(j.get("coordinate_system")).getOrElse(return Nil)
    val subtype = str(cs, "subtype")
    val axisArr = Option(cs.get("axis")).filter(_.isArray)
      .getOrElse(throw BadProjJson("coordinate_system without axis"))
    val angular = subtype == "ellipsoidal" || subtype == "spherical"
    val axes = (0 until axisArr.size()).map { i =>
      val ax = axisArr.get(i)
      val name = strOpt(ax, "name").getOrElse("unnamed")
      val abbrev = strOpt(ax, "abbreviation").getOrElse("")
      val dir = str(ax, "direction")
      val label = if (abbrev.nonEmpty) s"$name ($abbrev)" else name
      WNode("AXIS", List[Arg](WStr(label), WWord(dir)) ++
        unitNode(ax.get("unit"), angular).toList)
    }.toList
    WNode("CS", List(WWord(subtype), WNum(axes.size.toDouble))) :: axes
  }

  private def geodeticNode(j: JsonNode, kw: String): WNode =
    WNode(kw, List[Arg](WStr(str(j, "name"))) ++ datumNodes(j) ++ csNodes(j) ++
      idNodes(j))

  private def parameterNodes(j: JsonNode): List[WNode] = {
    val params = Option(j.get("parameters")).filter(_.isArray).toList
    params.flatMap(a => (0 until a.size()).map { i =>
      val p = a.get(i)
      val v = Option(p.get("value")).getOrElse(throw BadProjJson("parameter without value"))
      val vArg: Arg = if (v.isNumber) WNum(v.asDouble()) else WStr(v.asText())
      WNode("PARAMETER", List[Arg](WStr(str(p, "name")), vArg) ++
        unitNode(p.get("unit"), angularDefault = false).toList ++ idNodes(p))
    })
  }

  private def methodNode(j: JsonNode): WNode = {
    val m = Option(j.get("method")).getOrElse(throw BadProjJson("no method"))
    WNode("METHOD", List[Arg](WStr(str(m, "name"))) ++ idNodes(m))
  }

  private def projectedNode(j: JsonNode): WNode = {
    val base = Option(j.get("base_crs"))
      .getOrElse(throw BadProjJson("ProjectedCRS without base_crs"))
    val baseNode = geodeticNode(base, "BASEGEOGCRS")
    val conv = Option(j.get("conversion"))
      .getOrElse(throw BadProjJson("ProjectedCRS without conversion"))
    val convNode = WNode("CONVERSION",
      List[Arg](WStr(strOpt(conv, "name").getOrElse("unnamed")),
        methodNode(conv)) ++ parameterNodes(conv))
    WNode("PROJCRS", List[Arg](WStr(str(j, "name")), baseNode, convNode) ++
      csNodes(j) ++ idNodes(j))
  }

  private def boundNode(j: JsonNode): WNode = {
    val src = crsNode(obj(j, "source_crs"))
    val tgt = crsNode(obj(j, "target_crs"))
    val tf = obj(j, "transformation")
    val tfNode = WNode("ABRIDGEDTRANSFORMATION",
      List[Arg](WStr(strOpt(tf, "name").getOrElse("unnamed")),
        methodNode(tf)) ++ parameterNodes(tf))
    WNode("BOUNDCRS", List(
      WNode("SOURCECRS", List(src)), WNode("TARGETCRS", List(tgt)), tfNode))
  }

  private def compoundNode(j: JsonNode): WNode = {
    val comps = Option(j.get("components")).filter(_.isArray)
      .getOrElse(throw BadProjJson("CompoundCRS without components"))
    val nodes = (0 until comps.size()).map(i => crsNode(comps.get(i))).toList
    WNode("COMPOUNDCRS", WStr(str(j, "name")) :: (nodes: List[Arg]))
  }

  private def verticalNode(j: JsonNode): WNode =
    WNode("VERTCRS", List[Arg](WStr(str(j, "name"))) ++ csNodes(j) ++ idNodes(j))

  // --- formatter: WKT2 tree -> PROJJSON --------------------------------------

  private val mapper = new ObjectMapper()

  /** Format any accepted CRS definition (proj-string / `EPSG:nnnn` / WKT)
    * as PROJJSON text.  Implemented as a structural rendering of the WKT2
    * formatter's output tree, so the two exports cannot disagree. */
  def format(spec: String): String = {
    val wkt =
      if (Wkt.looksLikeWkt(spec)) spec
      else WktFormat.format(spec)
    val node = Wkt.parseNode(wkt)
    val o = nodeToJson(node)
    o.put("$schema", "https://proj.org/schemas/v0.7/projjson.schema.json")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  private def nodeToJson(n: WNode): ObjectNode = n.kw match {
    case "GEOGCRS" | "GEOGRAPHICCRS" => geodeticToJson(n, "GeographicCRS")
    case "GEODCRS" | "GEODETICCRS" => geodeticToJson(n, "GeodeticCRS")
    case "PROJCRS" | "PROJECTEDCRS" => projectedToJson(n)
    case "BOUNDCRS" => boundToJson(n)
    case kw => throw BadProjJson(s"PROJJSON export of WKT $kw")
  }

  private def putId(o: ObjectNode, n: WNode): Unit =
    n.node("ID", "AUTHORITY").foreach { id =>
      val ido = o.putObject("id")
      ido.put("authority", id.str(0))
      id.args.lift(1) match {
        case Some(WNum(v)) => ido.put("code", v.toLong)
        case Some(WStr(s)) => ido.put("code", s)
        case _ =>
      }
    }

  private def ellipsoidToJson(ell: WNode): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", ell.str(0))
    val a = ell.num(1); val rf = ell.num(2)
    if (rf == 0.0) o.put("radius", a)
    else { o.put("semi_major_axis", a); o.put("inverse_flattening", rf) }
    o
  }

  private def datumToJson(crsNode: WNode): ObjectNode = {
    val datum = crsNode.node("DATUM", "TRF", "ENSEMBLE")
      .getOrElse(throw BadProjJson("WKT CRS without datum"))
    val o = mapper.createObjectNode()
    o.put("type", "GeodeticReferenceFrame")
    o.put("name", datum.str(0))
    val ell = datum.node("ELLIPSOID", "SPHEROID")
      .getOrElse(throw BadProjJson("WKT datum without ellipsoid"))
    o.set[ObjectNode]("ellipsoid", ellipsoidToJson(ell))
    crsNode.node("PRIMEM").orElse(datum.node("PRIMEM")).foreach { pm =>
      val deg = pm.num(1) *
        pm.node("ANGLEUNIT", "UNIT").map(_.num(1)).getOrElse(DegToRad) / DegToRad
      if (deg != 0.0 || !pm.str(0).equalsIgnoreCase("greenwich")) {
        val p = o.putObject("prime_meridian")
        p.put("name", pm.str(0)); p.put("longitude", deg)
      }
    }
    o
  }

  private def unitToJson(u: Option[WNode], fallback: String): Object = {
    u match {
      case None => fallback
      case Some(un) =>
        val name = un.str(0); val f = un.num(1)
        (un.kw, name) match {
          case (_, "metre") if f == 1.0 => "metre"
          case (_, "degree") if math.abs(f - DegToRad) < 1e-24 => "degree"
          case (_, "unity") if f == 1.0 => "unity"
          case (kw, _) =>
            val o = mapper.createObjectNode()
            o.put("type", kw match {
              case "LENGTHUNIT" => "LinearUnit"
              case "ANGLEUNIT" => "AngularUnit"
              case "SCALEUNIT" => "ScaleUnit"
              case _ => "Unit"
            })
            o.put("name", name)
            o.put("conversion_factor", f)
            o
        }
    }
  }

  private def putUnit(o: ObjectNode, key: String, u: Option[WNode], fallback: String): Unit =
    unitToJson(u, fallback) match {
      case s: String => o.put(key, s)
      case n: ObjectNode => o.set[ObjectNode](key, n)
    }

  private def csToJson(crsNode: WNode, subtypeDefault: String): ObjectNode = {
    val o = mapper.createObjectNode()
    val cs = crsNode.node("CS")
    val subtype = cs.map(_.args.head match {
      case WWord(w) => w
      case WStr(s) => s
      case a => throw BadProjJson(s"bad CS subtype $a")
    }).getOrElse(subtypeDefault)
    o.put("subtype", subtype)
    val angular = subtype == "ellipsoidal" || subtype == "spherical"
    // WKT2 shares a trailing unit node at CRS level when axes carry none
    val sharedUnit = crsNode.node(
      if (angular) "ANGLEUNIT" else "LENGTHUNIT", "UNIT")
    val fallback = if (angular) "degree" else "metre"
    val axes: ArrayNode = o.putArray("axis")
    val axisNodes = crsNode.nodes("AXIS") match {
      case Nil if angular =>
        // WKT2 base-CRS blocks may omit axes; the schema requires them —
        // emit the GIS-order ellipsoidal default
        List(
          WNode("AXIS", List(WStr("geodetic longitude (Lon)"), WWord("east"))),
          WNode("AXIS", List(WStr("geodetic latitude (Lat)"), WWord("north"))))
      case ns => ns
    }
    axisNodes.foreach { ax =>
      val a = axes.addObject()
      val label = ax.str(0)
      // WKT spells "name (Abbrev)" or "(Abbrev)"
      val (name, abbrev) = {
        val i = label.indexOf('(')
        if (i >= 0 && label.endsWith(")")) {
          val nm = label.take(i).trim
          val ab = label.substring(i + 1, label.length - 1)
          (if (nm.isEmpty) ab else nm, ab)
        } else (label, "")
      }
      a.put("name", if (name.isEmpty) "unnamed" else name.capitalize)
      if (abbrev.nonEmpty) a.put("abbreviation", abbrev)
      ax.args.lift(1) match {
        case Some(WWord(dir)) => a.put("direction", dir)
        case Some(WStr(dir)) => a.put("direction", dir)
        case _ => throw BadProjJson("AXIS without direction")
      }
      putUnit(a, "unit",
        ax.node("ANGLEUNIT", "LENGTHUNIT", "UNIT").orElse(sharedUnit), fallback)
    }
    o
  }

  private def geodeticToJson(n: WNode, tpe: String): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", tpe)
    o.put("name", n.str(0))
    o.set[ObjectNode]("datum", datumToJson(n))
    val geocentric = n.node("CS").exists(_.args.headOption.exists {
      case WWord(w) => w.equalsIgnoreCase("Cartesian"); case _ => false })
    o.set[ObjectNode]("coordinate_system",
      csToJson(n, if (geocentric) "Cartesian" else "ellipsoidal"))
    putId(o, n)
    o
  }

  private def projectedToJson(n: WNode): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", "ProjectedCRS")
    o.put("name", n.str(0))
    val base = n.node("BASEGEOGCRS", "BASEGEODCRS")
      .getOrElse(throw BadProjJson("PROJCRS without base CRS"))
    o.set[ObjectNode]("base_crs", geodeticToJson(base, "GeographicCRS"))
    val conv = n.node("CONVERSION")
      .getOrElse(throw BadProjJson("PROJCRS without CONVERSION"))
    val co = o.putObject("conversion")
    co.put("name", conv.str(0))
    val m = conv.node("METHOD").getOrElse(throw BadProjJson("CONVERSION without METHOD"))
    val mo = co.putObject("method")
    mo.put("name", m.str(0))
    putId(mo, m)
    val params = conv.nodes("PARAMETER")
    if (params.nonEmpty) {
      val pa = co.putArray("parameters")
      params.foreach { p =>
        val po = pa.addObject()
        po.put("name", p.str(0))
        po.put("value", p.num(1))
        val u = p.node("ANGLEUNIT", "LENGTHUNIT", "SCALEUNIT", "UNIT")
        val fallback = u.map(_.kw) match {
          case Some("ANGLEUNIT") => "degree"
          case Some("SCALEUNIT") => "unity"
          case _ => "metre"
        }
        putUnit(po, "unit", u, fallback)
        putId(po, p)
      }
    }
    o.set[ObjectNode]("coordinate_system", csToJson(n, "Cartesian"))
    putId(o, n)
    o
  }

  private def boundToJson(n: WNode): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", "BoundCRS")
    def inner(kw: String): WNode = n.node(kw)
      .flatMap(_.args.collectFirst { case c: WNode => c })
      .getOrElse(throw BadProjJson(s"BOUNDCRS without $kw"))
    o.set[ObjectNode]("source_crs", nodeToJson(inner("SOURCECRS")))
    o.set[ObjectNode]("target_crs", nodeToJson(inner("TARGETCRS")))
    val tf = n.node("ABRIDGEDTRANSFORMATION")
      .getOrElse(throw BadProjJson("BOUNDCRS without ABRIDGEDTRANSFORMATION"))
    val to = o.putObject("transformation")
    to.put("name", tf.str(0))
    val m = tf.node("METHOD").getOrElse(throw BadProjJson("transformation without METHOD"))
    val mo = to.putObject("method")
    mo.put("name", m.str(0))
    putId(mo, m)
    val pa = to.putArray("parameters")
    tf.nodes("PARAMETER").foreach { p =>
      val po = pa.addObject()
      po.put("name", p.str(0))
      po.put("value", p.num(1))
      // abridged-transformation convention (ISO 19162 §9.4 / the
      // reference's JSON export): translations metres, rotations
      // arc-seconds, scale difference as the unity ratio
      val nm = p.str(0).toLowerCase
      if (nm.contains("translation")) po.put("unit", "metre")
      else if (nm.contains("rotation")) {
        val u = po.putObject("unit")
        u.put("type", "AngularUnit"); u.put("name", "arc-second")
        u.put("conversion_factor", 4.84813681109536e-06)
      } else po.put("unit", "unity")
      putId(po, p)
    }
    o
  }
}
