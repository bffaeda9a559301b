package graft.geo.grids

import java.nio.charset.StandardCharsets

/** Minimal read-only SQLite database file reader — just enough of the
  * public, stable file format (sqlite.org/fileformat2.html) to full-scan
  * the small tables a GeoPackage triangulation carries: header + table
  * b-tree walk + record decoding + overflow-page chains.  No indices, no
  * freelist, no WAL, no writing.
  *
  * The reference reads these files through the bundled libsqlite3
  * (src/sqlite3_utils.hpp); a from-scratch page reader keeps this engine
  * dependency-free.
  */
final class SqliteFile(bytes: Array[Byte]) {
  import SqliteFile._

  if (bytes.length < 100 ||
      !magic.zipWithIndex.forall { case (b, i) => bytes(i) == b })
    throw NotSqlite("not an SQLite database")

  private val pageSize: Int = {
    val raw = u16(16)
    if (raw == 1) 65536 else raw
  }
  private val reserved: Int = bytes(20) & 0xff
  private val usable: Int = pageSize - reserved
  if (pageSize < 512 || usable < 480)
    throw NotSqlite("bad page size")

  private def u16(off: Int): Int =
    ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
  private def u32(off: Int): Long =
    ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
      ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)

  /** (value, bytesRead) of the big-endian base-128 varint at `off`. */
  private def varint(off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = bytes(off + i)
      v = (v << 7) | (b & 0x7f)
      if ((b & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (bytes(off + 8) & 0xff), 9)
  }

  /** One decoded row: rowid + column values (null / Long / Double /
    * String / Array[Byte]). */
  final case class Row(rowid: Long, values: IndexedSeq[Any])

  /** Full scan of the table b-tree rooted at `rootPage` (1-based). */
  def scanTable(rootPage: Int): List[Row] = {
    val out = List.newBuilder[Row]
    walk(rootPage, out)
    out.result()
  }

  private def walk(page: Int, out: scala.collection.mutable.Builder[Row, List[Row]]): Unit = {
    val base = (page - 1) * pageSize
    val hdr = if (page == 1) base + 100 else base
    val ptype = bytes(hdr) & 0xff
    val nCells = u16(hdr + 3)
    ptype match {
      case 13 => // leaf table
        var i = 0
        while (i < nCells) {
          val cellOff = base + u16(hdr + 8 + 2 * i)
          val (payloadLen, n1) = varint(cellOff)
          val (rowid, n2) = varint(cellOff + n1)
          val payload = readPayload(cellOff + n1 + n2, payloadLen.toInt)
          out += decodeRecord(rowid, payload)
          i += 1
        }
      case 5 => // interior table
        var i = 0
        while (i < nCells) {
          val cellOff = base + u16(hdr + 12 + 2 * i)
          walk(u32(cellOff).toInt, out)
          i += 1
        }
        walk(u32(hdr + 8).toInt, out) // right-most pointer
      case o => throw NotSqlite(s"unexpected page type $o on page $page")
    }
  }

  /** Inline payload plus any overflow chain (leaf-table K/M split,
    * fileformat2.html §1.6). */
  private def readPayload(off: Int, total: Int): Array[Byte] = {
    val maxLocal = usable - 35
    if (total <= maxLocal) {
      java.util.Arrays.copyOfRange(bytes, off, off + total)
    } else {
      val minLocal = (usable - 12) * 32 / 255 - 23
      val k = minLocal + (total - minLocal) % (usable - 4)
      val local = if (k <= maxLocal) k else minLocal
      val buf = new Array[Byte](total)
      System.arraycopy(bytes, off, buf, 0, local)
      var got = local
      var next = u32(off + local).toInt
      while (next != 0 && got < total) {
        val pbase = (next - 1) * pageSize
        val chunk = math.min(usable - 4, total - got)
        System.arraycopy(bytes, pbase + 4, buf, got, chunk)
        got += chunk
        next = u32(pbase).toInt
      }
      if (got != total) throw NotSqlite("truncated overflow chain")
      buf
    }
  }

  private def decodeRecord(rowid: Long, p: Array[Byte]): Row = {
    def varintAt(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = p(off + i)
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (p(off + 8) & 0xff), 9)
    }
    val (hdrLen, n0) = varintAt(0)
    val types = List.newBuilder[Long]
    var o = n0
    while (o < hdrLen) {
      val (t, n) = varintAt(o)
      types += t
      o += n
    }
    var body = hdrLen.toInt
    val values = types.result().map { t =>
      def beInt(n: Int): Long = {
        var v = if ((p(body) & 0x80) != 0) -1L else 0L
        var i = 0
        while (i < n) { v = (v << 8) | (p(body + i) & 0xff); i += 1 }
        body += n
        v
      }
      t match {
        case 0 => null
        case 1 => beInt(1)
        case 2 => beInt(2)
        case 3 => beInt(3)
        case 4 => beInt(4)
        case 5 => beInt(6)
        case 6 => beInt(8)
        case 7 => java.lang.Double.longBitsToDouble(beInt(8))
        case 8 => 0L
        case 9 => 1L
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val s = new String(p, body, len, StandardCharsets.UTF_8)
          body += len
          s
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          val b = java.util.Arrays.copyOfRange(p, body, body + len)
          body += len
          b
        case o => throw NotSqlite(s"unsupported serial type $o")
      }
    }
    Row(rowid, values.toIndexedSeq)
  }

  /** sqlite_master: table name -> (rootpage, CREATE sql). */
  lazy val tables: Map[String, (Int, String)] =
    scanTable(1).flatMap { r =>
      // schema: (type, name, tbl_name, rootpage, sql)
      (r.values(0), r.values(1), r.values(3), r.values(4)) match {
        case ("table", name: String, root: java.lang.Long, sql) =>
          Some(name -> ((root.toInt, if (sql == null) "" else sql.toString)))
        case _ => None
      }
    }.toMap
}

object SqliteFile {
  final case class NotSqlite(msg: String) extends RuntimeException(msg)

  private val magic: Array[Byte] =
    "SQLite format 3".getBytes(StandardCharsets.US_ASCII) :+ 0.toByte

  /** Column names from a CREATE TABLE statement (enough for the
    * machine-written GeoPackage schemas this reader targets). */
  def columnsOf(sql: String): List[String] = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    if (open < 0 || close <= open) return Nil
    // split on top-level commas only (types may carry e.g. DECIMAL(10,2))
    val body = sql.substring(open + 1, close)
    val cols = List.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    (body + ",").foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 =>
        val d = cur.toString.trim
        cur.clear()
        val first = d.takeWhile(c => !c.isWhitespace).stripPrefix("\"")
          .stripSuffix("\"").stripPrefix("`").stripSuffix("`")
        val upper = first.toUpperCase
        if (first.nonEmpty && upper != "PRIMARY" && upper != "UNIQUE" &&
            upper != "CHECK" && upper != "FOREIGN" && upper != "CONSTRAINT")
          cols += first
      case c => cur += c
    }
    cols.result()
  }
}
