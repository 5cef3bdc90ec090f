package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-4 distributed operators: ntileExact must
  * agree with the window NTILE on arbitrary inputs, and packSequences
  * must satisfy its packing invariants under arbitrary token lists. */
class ScalePropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val rowsGen: Gen[List[Long]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.choose(-1000L, 1000L)))

  test("ntileExact equals the scalar NTILE on arbitrary values/buckets/partitions") {
    // scalar reference: first N mod n buckets take one extra row over the
    // totally ordered (value, id) sequence
    def scalarNtile(values: Seq[Long], n: Int): Map[Long, Long] = {
      val order = values.zipWithIndex.map { case (v, i) => (v, i.toLong) }.sortBy(identity)
      val total = order.length
      val q = total / n; val r = total % n
      order.zipWithIndex.map { case ((_, id), idx) =>
        val b = if (idx < r * (q + 1)) idx / (q + 1) + 1
                else r + (idx - r * (q + 1)) / q + 1
        id -> b.toLong
      }.toMap
    }
    check(forAll(rowsGen, Gen.choose(1, 8), Gen.choose(1, 6)) { (vals, n, parts) =>
      val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
      val got = Scale.ntileExact(df, Seq(col("v"), col("id")), n, "nt", partitions = parts)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      got == scalarNtile(vals, n)
    }, "ntileExact")
  }

  test("groupedPrefixSum equals the scalar per-group running sum on arbitrary inputs") {
    // arbitrary (group, value) rows over a handful of group keys so
    // groups collide, plus arbitrary partition counts so groups land
    // fully inside, spanning, and straddling partition boundaries
    val grpRowsGen: Gen[List[(Int, Long)]] =
      Gen.choose(0, 50).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(0, 4), Gen.choose(-1000L, 1000L))))
    def scalar(rows: Seq[(Int, Long, Long)]): Map[Long, Long] = // (g, id, v) -> id -> cum
      rows.groupBy(_._1).values.flatMap { grp =>
        val ordered = grp.sortBy(_._2)
        ordered.zip(ordered.scanLeft(0L)(_ + _._3).tail).map { case ((_, id, _), c) => id -> c }
      }.toMap
    check(forAll(grpRowsGen, Gen.choose(1, 7)) { (rows, parts) =>
      val tagged = rows.zipWithIndex.map { case ((g, v), i) => (g.toString, i.toLong, v) }
      val df = tagged.toDF("g", "id", "v")
      val got = Scale.groupedPrefixSum(df, "g", Seq(col("id")), "v", "cum", partitions = parts)
        .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
      got == scalar(tagged.map { case (g, id, v) => (g.toInt, id, v) })
    }, "groupedPrefixSum")
  }

  test("packSequences invariants hold on arbitrary token lists") {
    val tokensGen: Gen[List[Long]] =
      Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 150L)))
    check(forAll(tokensGen, Gen.choose(50L, 200L), Gen.choose(1, 4)) { (toks, budget, shards) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "n")
      val packed = Scale.packSequences(df, "doc_id", "n", budget, shards)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val tokOf = toks.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
      val complete = packed.map(_._1).sorted.sameElements(toks.indices.map(_.toLong))
      val budgetOk = packed.groupBy(p => (p._2, p._3)).forall { case (_, ms) =>
        ms.map(m => tokOf(m._1)).sum <= budget || ms.length == 1
      }
      // packs are contiguous in id order within a shard: sorting members
      // of a shard by id must give non-decreasing pack numbers
      val contiguous = packed.groupBy(_._2).forall { case (_, ms) =>
        val inOrder = ms.sortBy(_._1).map(_._3)
        inOrder.zip(inOrder.drop(1)).forall { case (a, b) => a <= b }
      }
      complete && budgetOk && contiguous
    }, "packSequences")
  }
}
