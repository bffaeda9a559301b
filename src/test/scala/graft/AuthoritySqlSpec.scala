package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.proj.AuthoritySql

/** Tokenizer edge cases of the registry INSERT-script parser — driven
  * black-box through [[AuthoritySql.load]] on a synthetic script dir.
  * Reference behavior: SQLite's tokenizer treats a `--` line comment as
  * plain whitespace, so a comment before or after a bare value parses to
  * the same row (nkg.sql ends inserts with `0  -- deprecated`). */
class AuthoritySqlSpec extends AnyFunSuite {

  private def parse(sql: String): Vector[Array[String]] = {
    val dir = Files.createTempDirectory("authsql")
    try {
      Files.write(dir.resolve("t.sql"), sql.getBytes("UTF-8"))
      AuthoritySql.load(dir, Set("t")).getOrElse("t", Vector.empty)
    } finally {
      Files.list(dir).forEach(p => Files.delete(p))
      Files.delete(dir)
    }
  }

  test("trailing comment after a bare value parses clean") {
    val rows = parse("INSERT INTO t VALUES('a', 1, 0  -- deprecated\n);\n")
    assert(rows.map(_.toSeq) == Vector(Seq("a", "1", "0")))
  }

  test("leading comment before a bare value does not shift the arity") {
    // round-4 defect: the comment terminated the token scan, emitting an
    // empty value and re-parsing the real value as an extra column
    val rows = parse("INSERT INTO t VALUES('a', -- note\n 1, 0);\n")
    assert(rows.map(_.toSeq) == Vector(Seq("a", "1", "0")))
  }

  test("comment placement is value-neutral: before == after") {
    val before = parse("INSERT INTO t VALUES('x', -- c\n 7);\n")
    val after = parse("INSERT INTO t VALUES('x', 7 -- c\n);\n")
    assert(before.map(_.toSeq) == after.map(_.toSeq))
    assert(before.head.toSeq == Seq("x", "7"))
  }

  test("comment inside a parenthesized expression value survives") {
    val rows = parse("INSERT INTO t VALUES(1, -- lead\n NULL, 'q''s');\n")
    assert(rows.map(_.toSeq) == Vector(Seq("1", null, "q's")))
  }
}
