package graft

import graft.operators.Bpe
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the BPE trainer/segmenter over arbitrary small
  * corpora: training determinism, merge-count bounds, and the
  * segmentation invariants a token budgeter relies on (1 ≤ subwords per
  * word ≤ chars+1; zero merges ⇒ character-level; fertility floor). */
class BpePropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // small alphabet forces heavy pair collisions (the interesting regime)
  private val wordGen: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val docGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, docGen))

  test("training is deterministic and never emits more merges than requested") {
    check(forAll(corpusGen, Gen.choose(0, 12)) { (docs, nMerges) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val m1 = Bpe.train(df, "text", nMerges)
      val m2 = Bpe.train(df, "text", nMerges)
      m1 == m2 && m1.size <= nMerges &&
        m1.zipWithIndex.forall { case (m, i) => m.rank == i }
    }, "bpe train determinism")
  }

  test("segmentation invariants: per-word subword count in [1, chars+1]; totals consistent") {
    check(forAll(corpusGen, Gen.choose(0, 12)) { (docs, nMerges) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val merges = Bpe.train(df, "text", nMerges)
      val rows = Bpe.segmentStats(df, "doc_id", "text", merges)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      docs.zipWithIndex.forall { case (t, i) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        val (nt, ns, fert) = rows(i.toLong)
        nt == toks.length.toLong &&
          ns >= nt && // at least one subword per token
          ns <= toks.map(_.length.toLong + 1).sum && // at most chars + </w> each
          (nt == 0 || fert == ns * 10000L / nt)
      }
    }, "bpe segmentation bounds")
  }

  test("zero merges segments every word into characters + end marker") {
    val df = Seq((1L, "abc ab a"), (2L, "ccc")).toDF("doc_id", "text")
    val rows = Bpe.segmentStats(df, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(1L) == (4L + 3L + 2L)) // chars+1 per word
    assert(rows(2L) == 4L)
  }
}
