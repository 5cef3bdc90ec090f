package graft

import org.scalatest.funsuite.AnyFunSuite

/** LlmFrontend prompt assembly + end-to-end Ask loop with a stubbed
  * completion (no network — SURVEY.md §7.2 item 7). */
class FrontendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def catalog() = {
    Tables.register(spark, TestSpark.sf0001)
    new Catalog(spark)
  }

  test("schema serialization matches the app.py:246 line shape") {
    val fe = new LlmFrontend(catalog(), "postgresql", identity)
    val lines = fe.schemaDescription().split("\n")
    assert(lines.forall(_.matches("""TABLE "\w+" \(columns: .+\)""")))
    assert(lines.exists(_.startsWith("TABLE \"customer\"")))
  }

  test("dialect routing: MySQL branch forbids windows/CTEs, PG branch does not") {
    val my = new LlmFrontend(catalog(), "mysql", identity).systemPrompt()
    val pg = new LlmFrontend(catalog(), "postgresql", identity).systemPrompt()
    assert(my.contains("no window functions") && my.contains("no CTEs"))
    assert(my.contains("LIMIT 1000"))
    assert(!pg.contains("no window functions"))
    assert(pg.contains("LIMIT 100"))
    assert(pg.contains("schema is:"))
  }

  test("Ask end to end with stubbed completion: fenced answer executes") {
    val stub: String => String =
      _ => "Here is the query:\n```sql\nSELECT c_custkey FROM customer ORDER BY c_custkey\n```"
    val fe = new LlmFrontend(catalog(), "postgresql", stub)
    val res = Ask(spark, fe, "list customers")
    assert(res.isRight)
    assert(res.toOption.get.count() == 100) // LIMIT injected by sanitizer
  }

  test("completion failure becomes the literal error query, which runs") {
    val fe = new LlmFrontend(catalog(), "postgresql", _ => throw new RuntimeException("boom"))
    val res = Ask(spark, fe, "anything")
    val rows = res.toOption.get.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0).contains("SQL generation failed"))
  }
}
