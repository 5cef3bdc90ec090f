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

  /** INDEPENDENT scalar segmenter (round-11 verdict #4 — q163 is the one
    * rows-only entry whose core stage had only a hand fixture): applies
    * each merge EXHAUSTIVELY IN RANK ORDER with one left-to-right scan
    * per merge — the canonical Sennrich/HF formulation — where
    * `Bpe.segmentStats` repeatedly merges the LOWEST-RANK pair present.
    * The two algorithms are textbook-equivalent but share no code or
    * structure, so corpus-wide agreement is a real cross-check, not a
    * tautology. */
  private def segmentRef(word: String, merges: Seq[Bpe.Merge]): Int = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ Bpe.EndOfWord
    merges.sortBy(_.rank).foreach { m =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == m.left && syms(i + 1) == m.right) {
          out += (m.left + m.right); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length
  }

  private def refStats(docs: Seq[(Long, String)], merges: Seq[Bpe.Merge]): Map[Long, (Long, Long, Long)] = {
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val nt = toks.length.toLong
      val ns = toks.map(w => memo.getOrElseUpdate(w, segmentRef(w, merges)).toLong).sum
      id -> ((nt, ns, if (nt == 0) 0L else ns * 10000L / nt))
    }.toMap
  }

  test("segmentStats equals the independent rank-order segmenter on arbitrary corpora") {
    check(forAll(corpusGen, Gen.choose(0, 12)) { (docs, nMerges) =>
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = ids.toDF("doc_id", "text")
      val merges = Bpe.train(df, "text", nMerges)
      val got = Bpe.segmentStats(df, "doc_id", "text", merges)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      got == refStats(ids, merges)
    }, "bpe segmentation cross-implementation equality")
  }

  test("segmentStats equals the independent segmenter over the FULL sf0.01 corpus (q163)") {
    // the q163 entry's exact configuration (50 merges, real documents) —
    // the corpus-wide second-implementation check standing in for the
    // DuckDB replay an iterative trainer can't have
    val df = Tables.table(spark, TestSpark.sf01, "documents")
    val merges = Bpe.train(df, "text", nMerges = 50)
    val docs = df.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = Bpe.segmentStats(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = refStats(docs, merges)
    assert(got.size == want.size)
    val diffs = want.collect { case (id, w) if got(id) != w => s"$id: got ${got(id)}, want $w" }
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))
  }

  test("zero merges segments every word into characters + end marker") {
    val df = Seq((1L, "abc ab a"), (2L, "ccc")).toDF("doc_id", "text")
    val rows = Bpe.segmentStats(df, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(1L) == (4L + 3L + 2L)) // chars+1 per word
    assert(rows(2L) == 4L)
  }
}
