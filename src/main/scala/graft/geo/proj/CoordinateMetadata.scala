package graft.geo.proj

/** A CRS together with an optional coordinate epoch (decimal year) — the
  * reference's coordinates::CoordinateMetadata.  Dynamic-datum
  * observations (NAD83(CSRS), NZGD2000, the ITRF family) are only fully
  * specified with the epoch at which they were observed; transforming
  * between epochs composes a point-motion operation
  * ([[OperationFactory.crsToCrs(src:CoordinateMetadata*]]).
  *
  * Accepted user-input spellings (reference io.cpp:7716 createFromUserInput
  * and :5673 buildCoordinateMetadata):
  *  - `"EPSG:8255@2002.0"` / `"NAD83(CSRSv7 @ 2002.0"` — CRS text,
  *    `'@'`, decimal year (the last `'@'` with a numeric remainder; a
  *    `'@'` inside proj tokens like `+nadgrids=@file` never parses as a
  *    number, so plain proj-strings are unaffected);
  *  - `COORDINATEMETADATA[<crs wkt>, EPOCH[2002.0]]`;
  *  - any plain CRS spec (no epoch).
  */
final case class CoordinateMetadata(crs: String, epoch: Option[Double] = None)

object CoordinateMetadata {

  /** Parse any accepted spelling; plain CRS specs pass through with no
    * epoch. */
  def of(spec: String): CoordinateMetadata = {
    val t = spec.trim
    val kw = t.takeWhile(c => c.isLetter || c == '_').toUpperCase
    if (kw == "COORDINATEMETADATA") {
      val n = Wkt.parseNode(t)
      val crsNode = n.args.collectFirst { case c: Wkt.WNode => c }.getOrElse(
        throw Wkt.BadWkt("COORDINATEMETADATA needs a CRS child"))
      val epoch = n.node("EPOCH").map(_.num(0))
      return CoordinateMetadata(Wkt.render(crsNode), epoch)
    }
    val at = t.lastIndexOf('@')
    // a '@' directly after '=' or ',' is a proj-token optional-grid
    // marker whose name merely LOOKS numeric (+grids=@2002) — never an
    // epoch; the epoch spelling follows a CRS body (']', ')' or a
    // name/code character)
    if (at > 0 && t.charAt(at - 1) != '=' && t.charAt(at - 1) != ',' &&
        t.charAt(at - 1) != '@') {
      val year = t.substring(at + 1).trim
      try return CoordinateMetadata(t.substring(0, at).trim,
        Some(year.toDouble))
      catch { case _: NumberFormatException => /* '@' belongs to the CRS */ }
    }
    CoordinateMetadata(t)
  }
}
