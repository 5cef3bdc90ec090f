package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property tests per SURVEY.md §5 item 4 (raw scalacheck — the
  * scalatestplus bridge is not in the offline dependency cache). */
class SanitizerPropSpec extends AnyFunSuite {

  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val sqlish: Gen[String] = for {
    cols <- Gen.nonEmptyListOf(Gen.identifier).map(_.take(4))
    tbl <- Gen.identifier
    fence <- Gen.oneOf("", "```sql\n", "```\n")
    prose <- Gen.oneOf("", "Sure, here it is:\n", "The answer;\n")
    semi <- Gen.oneOf("", ";")
  } yield {
    val close = if (fence.nonEmpty) "\n```" else ""
    s"$prose${fence}SELECT ${cols.mkString(", ")} FROM $tbl$semi$close"
  }

  test("sanitize is idempotent") {
    check(forAll(sqlish) { raw =>
      val once = Sanitizer.sanitize(raw)
      Sanitizer.sanitize(once) == once
    }, "idempotence")
  }

  test("sanitize always yields a limit token") {
    check(forAll(sqlish) { raw =>
      "(?i)\\blimit\\b".r.findFirstIn(Sanitizer.sanitize(raw)).isDefined
    }, "limit-token")
  }

  test("sanitize output never contains semicolons or fences") {
    check(forAll(sqlish) { raw =>
      val s = Sanitizer.sanitize(raw)
      !s.contains(";") && !s.contains("```")
    }, "no-semis-no-fences")
  }

  test("dedupColumns: unique names, arity and prefix preserved") {
    val spark = TestSpark.spark
    val names = Gen.listOfN(5, Gen.oneOf("a", "b", "c"))
    check(forAll(names) { ns =>
      ns.isEmpty || {
        val df = spark.sql(s"SELECT ${ns.zipWithIndex.map { case (n, i) => s"$i AS $n" }.mkString(", ")}")
        val cols = Runner.dedupColumns(df).columns.toSeq
        cols.length == ns.length &&
          cols.distinct.length == cols.length &&
          ns.zip(cols).forall { case (orig, got) =>
            got == orig || got.startsWith(orig + "_")
          }
      }
    }, "dedup-columns")
  }
}
