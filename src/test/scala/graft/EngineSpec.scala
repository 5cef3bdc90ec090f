package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine facade: the user-facing switch path from the reference app. */
class EngineSpec extends AnyFunSuite {

  test("open → run → describe → export, end to end") {
    // wrap the shared test session rather than opening a second one
    Tables.register(TestSpark.spark, TestSpark.sf0001)
    val engine = Engine.wrap(TestSpark.spark)
    val res = engine.run("SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment")
    assert(res.isRight)
    val df = res.toOption.get
    assert(engine.describeResult(df) == "5 rows")
    val p = java.nio.file.Files.createTempFile("graft", ".csv")
    engine.exportCsv(df, p.toString)
    val csv = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(csv.startsWith("c_mktsegment,n\n"))
    assert(csv.trim.split("\n").length == 6)
    java.nio.file.Files.delete(p)
  }

  test("empty result message matches reference wording shape") {
    val engine = Engine.wrap(TestSpark.spark)
    val df = engine.runOrEmpty("SELECT c_custkey FROM customer WHERE c_custkey < 0")
    assert(engine.describeResult(df).contains("no results"))
  }

  test("catalog reachable through the facade") {
    val engine = Engine.wrap(TestSpark.spark)
    assert(engine.catalog.listTables().contains("customer"))
  }
}
