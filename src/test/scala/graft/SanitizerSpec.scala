package graft

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven sanitizer cases per FIXTURES.md §C (behaviors of
  * app.py:253-265). The prose-prefixed fixture reproduces the *shape* of
  * the captured production failure (error_query.sql:26-46: explanation
  * prose followed by SQL) without copying its text. */
class SanitizerSpec extends AnyFunSuite {

  test("fenced sql block preferred") {
    val raw = "Here you go:\n```sql\nSELECT 1 AS x\n```\nHope that helps!"
    assert(Sanitizer.extract(raw) == "SELECT 1 AS x")
  }

  test("generic fence used when no sql fence") {
    val raw = "```\nSELECT 2 AS y\n```"
    assert(Sanitizer.extract(raw) == "SELECT 2 AS y")
  }

  test("sql fence wins over generic fence") {
    val raw = "```\nnot this\n```\n```sql\nSELECT 3 AS z\n```"
    assert(Sanitizer.extract(raw) == "SELECT 3 AS z")
  }

  test("raw SQL passes through") {
    assert(Sanitizer.extract("SELECT a FROM t") == "SELECT a FROM t")
  }

  test("all semicolons stripped (even inside literals — bug-compat app.py:260)") {
    assert(Sanitizer.extract("SELECT 1;") == "SELECT 1")
    assert(Sanitizer.extract("SELECT ';x' AS a;") == "SELECT 'x' AS a")
    assert(!Sanitizer.extract("SELECT 1; SELECT 2;").contains(";"))
  }

  test("prose-prefixed output sliced from first SELECT (error_query.sql shape)") {
    val raw =
      """To rank the top spenders per store we need to group the sales
        |table by store and customer, then order within each store.
        |
        |SELECT store_id, customer_id FROM sales ORDER BY store_id""".stripMargin
    val got = Sanitizer.extract(raw)
    assert(got.startsWith("SELECT store_id"))
    assert(!got.toLowerCase.contains("rank the top"))
  }

  test("DOTALL slice spans newlines inside the query") {
    val raw = "The query:\nSELECT a,\n  b\nFROM t"
    assert(Sanitizer.extract(raw) == "SELECT a,\n  b\nFROM t")
  }

  test("LIMIT injected when absent") {
    assert(Sanitizer.injectLimit("SELECT a FROM t") == "SELECT a FROM t LIMIT 100")
  }

  test("LIMIT not injected when a limit token exists anywhere (bug-compat app.py:265)") {
    assert(Sanitizer.injectLimit("SELECT a FROM t LIMIT 5") == "SELECT a FROM t LIMIT 5")
    // token inside a string literal suppresses injection — reproduced deliberately
    val disguised = "SELECT 'over the limit' AS msg FROM t"
    assert(Sanitizer.injectLimit(disguised) == disguised)
    // underscore is a word char, so speed_limit is NOT a `limit` token and
    // injection proceeds (same \blimit\b semantics as the reference)
    assert(Sanitizer.injectLimit("SELECT speed_limit FROM roads") == "SELECT speed_limit FROM roads LIMIT 100")
    assert(Sanitizer.injectLimit("SELECT limits FROM t") == "SELECT limits FROM t LIMIT 100")
  }

  test("read-only gate accepts SELECT and WITH, rejects DML/DDL") {
    assert(Sanitizer.isReadOnly("SELECT 1"))
    assert(Sanitizer.isReadOnly("  with x as (select 1) select * from x"))
    assert(!Sanitizer.isReadOnly("DROP TABLE t"))
    assert(!Sanitizer.isReadOnly("INSERT INTO t VALUES (1)"))
    assert(!Sanitizer.isReadOnly("UPDATE t SET a = 1"))
  }

  test("full pipeline: fenced prose with no limit") {
    val raw = "Sure!\n```sql\nSELECT a FROM t;\n```"
    assert(Sanitizer.sanitize(raw) == "SELECT a FROM t LIMIT 100")
  }
}
