package graft.geo.proj

import java.nio.file.{Files, Path}
import scala.collection.mutable

/** Reader for the reference's authority-database *source* files — the
  * `data/sql` INSERT scripts from which the reference builds its
  * SQLite `proj.db` (reference: /root/reference/data/sql/README.md,
  * build glue `data/generate_proj_db.cmake`).  The EPSG/ESRI/IGNF/NKG
  * registry content in those files is public data; this reader parses the
  * INSERT statements directly instead of modelling SQLite.
  *
  * Two statement shapes occur in the scripts
  * (e.g. `data/sql/ellipsoid.sql:4`, `data/sql/nkg.sql:143-168`):
  *
  * {{{
  * INSERT INTO "table" VALUES('EPSG','1024',...,NULL,0);
  * INSERT INTO "table" (colA, colB, ...) VALUES (...), (...);
  * }}}
  *
  * Values are single-quoted strings (with `''` escapes), numbers, or
  * NULL.  Rows are returned as `Array[String]` in the table's canonical
  * column order (null entries for SQL NULL); explicit-column inserts are
  * mapped onto that order via [[AuthoritySql.columns]].  Everything else
  * in the scripts (CREATE, triggers, comments) is skipped.
  */
object AuthoritySql {

  /** Canonical column orders for the tables that appear with explicit
    * column lists in the scripts (the majority shape — bare `VALUES` —
    * already matches these orders; reference
    * `data/sql/proj_db_table_defs.sql:852,945,1221`).  Only the tables
    * the resolver consumes need entries. */
  val columns: Map[String, Vector[String]] = Map(
    "other_transformation" -> (Vector(
      "auth_name", "code", "name", "description",
      "method_auth_name", "method_code", "method_name",
      "source_crs_auth_name", "source_crs_code",
      "target_crs_auth_name", "target_crs_code", "accuracy") ++
      (1 to 9).flatMap(i => Vector(
        s"param${i}_auth_name", s"param${i}_code", s"param${i}_name",
        s"param${i}_value", s"param${i}_uom_auth_name", s"param${i}_uom_code")) ++
      Vector("grid_param_auth_name", "grid_param_code", "grid_param_name",
        "grid_name", "interpolation_crs_auth_name", "interpolation_crs_code",
        "operation_version", "deprecated")),
    "concatenated_operation" -> Vector(
      "auth_name", "code", "name", "description",
      "source_crs_auth_name", "source_crs_code",
      "target_crs_auth_name", "target_crs_code",
      "accuracy", "operation_version", "deprecated"),
    "concatenated_operation_step" -> Vector(
      "operation_auth_name", "operation_code", "step_number",
      "step_auth_name", "step_code", "step_direction"),
    "usage" -> Vector(
      "auth_name", "code", "object_table_name",
      "object_auth_name", "object_code",
      "extent_auth_name", "extent_code", "scope_auth_name", "scope_code"),
    "geodetic_crs" -> Vector(
      "auth_name", "code", "name", "description", "type",
      "coordinate_system_auth_name", "coordinate_system_code",
      "datum_auth_name", "datum_code", "text_definition", "deprecated"),
    "grid_alternatives" -> Vector(
      "original_grid_name", "proj_grid_name", "old_proj_grid_name",
      "proj_grid_format", "proj_method", "inverse_direction",
      "package_name", "url", "direct_download", "open_license", "directory")
  )

  final case class BadAuthoritySql(msg: String) extends RuntimeException(msg)

  /** Parse every `.sql` file in `dir`, keeping INSERT rows for the
    * requested tables.  Rows for explicit-column inserts are re-ordered
    * to the canonical order (unknown listed columns are an error; absent
    * canonical columns are null). */
  def load(dir: Path, tables: Set[String]): Map[String, Vector[Array[String]]] = {
    val out = mutable.Map.empty[String, mutable.ArrayBuffer[Array[String]]]
    val stream = Files.list(dir)
    val files =
      try stream.toArray.map(_.asInstanceOf[Path])
        .filter(_.toString.endsWith(".sql")).sortBy(_.getFileName.toString)
      finally stream.close()
    for (f <- files) {
      val text = new String(Files.readAllBytes(f), "UTF-8")
      try parseInto(text, tables, out, f.getFileName.toString)
      catch {
        case BadAuthoritySql(m) if !m.startsWith(f.getFileName.toString) =>
          throw BadAuthoritySql(s"${f.getFileName}: $m")
        case e: IndexOutOfBoundsException =>
          // truncated/malformed file: keep the file-name context instead
          // of a raw out-of-bounds escaping with no provenance
          throw BadAuthoritySql(s"${f.getFileName}: truncated or malformed (${e.getMessage})")
      }
    }
    out.view.mapValues(_.toVector).toMap
  }

  private def parseInto(text: String, tables: Set[String],
                        out: mutable.Map[String, mutable.ArrayBuffer[Array[String]]],
                        file: String): Unit = {
    var i = 0
    val n = text.length
    while (i < n) {
      i = text.indexOf("INSERT INTO", i)
      if (i < 0) return
      // must be at a statement start (line start or after ';'), not inside
      // a comment/trigger body — the scripts only use INSERT at column 0
      val atLineStart = i == 0 || text.charAt(i - 1) == '\n'
      i += "INSERT INTO".length
      if (atLineStart) {
        i = skipWs(text, i)
        val (table, i1) = readIdent(text, i)
        i = skipWs(text, i1)
        if (tables.contains(table)) {
          // optional explicit column list
          var cols: Vector[String] = null
          if (i < n && text.charAt(i) == '(') {
            val (cs, i2) = readColumnList(text, i)
            cols = cs; i = skipWs(text, i2)
          }
          if (!text.regionMatches(true, i, "VALUES", 0, 6)) {
            // INSERT INTO … SELECT …: derived rows (e.g. customizations.sql
            // grid aliasing) — not evaluable here, skip the statement
            val semi = text.indexOf(';', i)
            i = if (semi < 0) n else semi + 1
          } else {
          i = skipWs(text, i + 6)
          // one or more parenthesized tuples, comma-separated, ';' ends
          var more = true
          while (more) {
            if (i >= n || text.charAt(i) != '(')
              throw BadAuthoritySql(s"$file: expected '(' near offset $i for $table")
            val (vals, i3) = readTuple(text, i)
            i = skipWs(text, i3)
            val row =
              if (cols == null) vals.toArray
              else remap(table, cols, vals, file)
            out.getOrElseUpdate(table, mutable.ArrayBuffer.empty) += row
            if (i < n && text.charAt(i) == ',') { i = skipWs(text, i + 1) }
            else more = false
          }
          }
        }
      }
    }
  }

  private def remap(table: String, cols: Vector[String], vals: Vector[String],
                    file: String): Array[String] = {
    val canon = columns.getOrElse(table,
      throw BadAuthoritySql(
        s"$file: explicit column list for $table but no canonical order known"))
    if (cols.length != vals.length)
      throw BadAuthoritySql(s"$file: $table insert has ${cols.length} columns" +
        s" but ${vals.length} values")
    val row = new Array[String](canon.length)
    var k = 0
    while (k < cols.length) {
      val idx = canon.indexOf(cols(k))
      if (idx < 0)
        throw BadAuthoritySql(s"$file: unknown column ${cols(k)} for $table")
      row(idx) = vals(k)
      k += 1
    }
    row
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' ||
      s.charAt(i) == '\r' || s.charAt(i) == '\t')) i += 1
    // line comments between tokens (nkg.sql annotates values with `-- …`)
    if (i + 1 < s.length && s.charAt(i) == '-' && s.charAt(i + 1) == '-') {
      val nl = s.indexOf('\n', i)
      if (nl < 0) return s.length
      return skipWs(s, nl + 1)
    }
    i
  }

  private def readIdent(s: String, i0: Int): (String, Int) = {
    var i = i0
    if (i < s.length && s.charAt(i) == '"') {
      val end = s.indexOf('"', i + 1)
      (s.substring(i + 1, end), end + 1)
    } else {
      val b = new StringBuilder
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) {
        b.append(s.charAt(i)); i += 1
      }
      (b.toString, i)
    }
  }

  private def readColumnList(s: String, i0: Int): (Vector[String], Int) = {
    var i = i0 + 1 // past '('
    val cols = Vector.newBuilder[String]
    var done = false
    while (!done) {
      i = skipWs(s, i)
      val (id, i1) = readIdent(s, i)
      if (id.isEmpty) throw BadAuthoritySql(s"empty column name at offset $i")
      cols += id
      i = skipWs(s, i1)
      if (i < s.length && s.charAt(i) == ',') i += 1
      else if (i < s.length && s.charAt(i) == ')') { i += 1; done = true }
      else throw BadAuthoritySql(s"bad column list at offset $i")
    }
    (cols.result(), i)
  }

  /** Read one `(v1, v2, …)` tuple starting at `i0` (which must be '('). */
  private def readTuple(s: String, i0: Int): (Vector[String], Int) = {
    var i = i0 + 1
    val vals = Vector.newBuilder[String]
    var done = false
    while (!done) {
      i = skipWs(s, i)
      val c = s.charAt(i)
      if (c == '\'') {
        val b = new StringBuilder
        var concat = true
        while (concat) {
          i += 1 // past opening quote
          var strDone = false
          while (!strDone) {
            val ch = s.charAt(i)
            if (ch == '\'') {
              if (i + 1 < s.length && s.charAt(i + 1) == '\'') { b.append('\''); i += 2 }
              else { i += 1; strDone = true }
            } else { b.append(ch); i += 1 }
          }
          // SQL '…' || '…' concatenation (transformations_czechia.sql)
          val j = skipWs(s, i)
          if (j + 1 < s.length && s.charAt(j) == '|' && s.charAt(j + 1) == '|') {
            i = skipWs(s, j + 2)
            if (s.charAt(i) != '\'')
              throw BadAuthoritySql(s"|| not followed by a string at offset $i")
          } else concat = false
        }
        vals += b.toString
      } else if (c == ')' ) {
        // empty tuple () — not expected, but terminate cleanly
        done = true
      } else {
        // bare token: number, NULL, or an expression we keep verbatim.
        // A depth-0 "--" starts a SQL line comment (nkg.sql ends inserts
        // with `0  -- deprecated` before the `)`): skip to end of line and
        // KEEP scanning — the token still ends at the next depth-0 ',' or
        // ')', so a comment placed before the value (`, -- note\n 0)`)
        // parses to the same value as one placed after it, instead of
        // emitting an empty string and shifting the row's arity.
        val b = new StringBuilder
        var depth = 0
        while ({
          if (i >= s.length) throw BadAuthoritySql("unterminated tuple")
          val ch = s.charAt(i)
          !(depth == 0 && (ch == ',' || ch == ')'))
        }) {
          val ch = s.charAt(i)
          if (depth == 0 && ch == '-' && i + 1 < s.length &&
              s.charAt(i + 1) == '-') {
            while (i < s.length && s.charAt(i) != '\n') i += 1
          } else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            b.append(ch); i += 1
          }
        }
        val tok = b.toString.trim
        vals += (if (tok.equalsIgnoreCase("NULL")) null else tok)
      }
      i = skipWs(s, i)
      if (!done) {
        if (s.charAt(i) == ',') i += 1
        else if (s.charAt(i) == ')') { i += 1; done = true }
        else throw BadAuthoritySql(s"bad tuple near offset $i")
      } else i += 1
    }
    (vals.result(), i)
  }
}
