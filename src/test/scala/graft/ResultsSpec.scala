package graft

import org.scalatest.funsuite.AnyFunSuite

/** Canonical serialization + hashing (SURVEY.md §2.3 rule 4) and CSV sink. */
class ResultsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cell rendering: decimals keep declared scale, timestamps UTC-second") {
    assert(Results.renderCell(new java.math.BigDecimal("123.40")) == "123.40")
    assert(Results.renderCell(null) == "")
    assert(Results.renderCell(java.sql.Timestamp.valueOf("2024-01-02 03:04:05")) == "2024-01-02 03:04:05")
    assert(Results.renderCell(Seq(1, 2)) == "[1,2]")
  }

  test("csv escaping of commas and quotes") {
    val df = spark.sql("SELECT 'a,b' AS x, 'say \"hi\"' AS y, 'plain' AS z")
    val csv = Results.canonicalCsv(df)
    assert(csv == "x,y,z\n\"a,b\",\"say \"\"hi\"\"\",plain\n")
  }

  test("hash is stable and order-sensitive") {
    val a = spark.sql("SELECT 1 AS a UNION ALL SELECT 2 ORDER BY a")
    val b = spark.sql("SELECT 1 AS a UNION ALL SELECT 2 ORDER BY a DESC")
    assert(Results.resultHash(a) == Results.resultHash(a))
    assert(Results.resultHash(a) != Results.resultHash(b))
  }

  test("csv sink writes canonical form (app.py:301-302)") {
    val p = java.nio.file.Files.createTempFile("graft", ".csv")
    val df = spark.sql("SELECT 1 AS a, 'x' AS b")
    Results.writeCsv(df, p.toString)
    assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8") == "a,b\n1,x\n")
    java.nio.file.Files.delete(p)
  }

  test("decimal sum renders at scale 2 (determinism rule 2)") {
    Tables.register(spark, TestSpark.sf0001)
    val df = spark.sql(
      "SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s FROM orders")
    val cell = Results.canonicalCsv(df).split("\n")(1)
    assert(cell.matches("""\d+\.\d{2}"""), s"got $cell")
  }
}
