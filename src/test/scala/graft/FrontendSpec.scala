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

  test("join-path rules are generated from the FK graph, incl. go-through corrections") {
    val prompt = new LlmFrontend(catalog(), "postgresql", identity).systemPrompt()
    // direct edges appear as join rules
    assert(prompt.contains("orders joins customer on orders.o_custkey = customer.c_custkey"))
    assert(prompt.contains("lineitem joins orders on lineitem.l_orderkey = orders.o_orderkey"))
    // multi-hop pairs get an explicit never-direct correction with the path
    assert(prompt.contains("NEVER join customer directly to lineitem: " +
      "go through orders.o_custkey = customer.c_custkey AND lineitem.l_orderkey = orders.o_orderkey"))
    assert(prompt.contains("NEVER join customer directly to region: " +
      "go through customer.c_nationkey = nation.n_nationkey AND nation.n_regionkey = region.r_regionkey"))
  }

  test("few-shot examples are dialect-routed: MySQL raw values, PG window forms") {
    val my = new LlmFrontend(catalog(), "mysql", identity).systemPrompt()
    val pg = new LlmFrontend(catalog(), "postgresql", identity).systemPrompt()
    // both carry the UNION trailing-ORDER BY worked example
    assert(my.contains("UNION ALL SELECT s_suppkey AS id") && pg.contains("UNION ALL SELECT s_suppkey AS id"))
    // the MySQL branch must never exemplify window functions; raw RFM only
    val myExamples = my.split("\n").filter(_.startsWith("  "))
    assert(!myExamples.exists(l => l.contains("OVER") || l.contains("ROW_NUMBER") || l.contains("NTILE")))
    assert(my.contains("DATEDIFF(CURDATE(), MAX(o_orderdate))"))
    // the PG branch exemplifies ROW_NUMBER top-N-per-group and NTILE scores
    assert(pg.contains("ROW_NUMBER() OVER (PARTITION BY l_suppkey"))
    assert(pg.contains("NTILE(4) OVER (ORDER BY SUM(o_totalprice) DESC)"))
  }

  test("LlmClient: request carries the chat-completions shape, response content extracted") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String], String)]
    val fixture =
      """{"id":"chatcmpl-1","object":"chat.completion","choices":[{"index":0,
        |"message":{"role":"assistant","content":"```sql\nSELECT c_custkey FROM customer ORDER BY c_custkey\n```"},
        |"finish_reason":"stop"}]}""".stripMargin
    val client = new LlmClient("http://llm.test/v1", "test-model", "sk-fixture",
      transport = (url, headers, body) => { sent += ((url, headers, body)); fixture })
    val fe = LlmFrontend.withClient(catalog(), "postgresql", client)
    val res = Ask(spark, fe, "list customers")
    assert(res.isRight && res.toOption.get.count() == 100)
    val (url, headers, body) = sent.head
    assert(url == "http://llm.test/v1/chat/completions")
    assert(headers("Authorization") == "Bearer sk-fixture")
    assert(headers("Content-Type") == "application/json")
    // parse the request back: model, temperature 0, system+user roles, and
    // the user message is ONLY the question (system carries the schema)
    val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    assert(req.get("model").asText() == "test-model")
    assert(req.get("temperature").asDouble() == 0.0)
    val roles = (0 until req.get("messages").size()).map(req.get("messages").get(_).get("role").asText())
    assert(roles == Seq("system", "user"))
    assert(req.get("messages").get(1).get("content").asText() == "list customers")
    assert(req.get("messages").get(0).get("content").asText().contains("TABLE \"customer\""))
  }

  test("LlmClient transport/shape failures fall back to the literal error query") {
    val noChoices = new LlmClient("http://x", "m", "k", transport = (_, _, _) => """{"choices":[]}""")
    val fe1 = LlmFrontend.withClient(catalog(), "postgresql", noChoices)
    val r1 = Ask(spark, fe1, "q").toOption.get.collect()
    assert(r1.length == 1 && r1(0).getString(0).contains("SQL generation failed"))
    val down = new LlmClient("http://x", "m", "k",
      transport = (_, _, _) => throw new java.net.ConnectException("refused"))
    val fe2 = LlmFrontend.withClient(catalog(), "postgresql", down)
    val r2 = Ask(spark, fe2, "q").toOption.get.collect()
    assert(r2.length == 1 && r2(0).getString(0).contains("SQL generation failed"))
  }
}
