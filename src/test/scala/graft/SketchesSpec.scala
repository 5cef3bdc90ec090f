package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch correctness: (1) the EXACT regime — when k covers the whole
  * union, the estimator degenerates to the exact Jaccard (the sketches ARE
  * the sets), pinned as an equality; (2) the SKETCH regime — at small k the
  * estimate must land within a few standard errors (σ ≈ √(J(1−J)/k)) of
  * the true Jaccard on a deterministic fixture; (3) sketch shape — sorted,
  * capped at k, distinct. Elements are hashed through xxhash64 so the
  * k-min values are a uniform sample (the estimator's requirement); the
  * fixture is deterministic, so the assertions are exact reruns, not
  * flaky tolerances. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two overlapping integer sets: A = [0, 1200), B = [800, 2000) →
    * |A∩B| = 400, |A∪B| = 2000, J = 0.2 exactly. */
  private lazy val elems = {
    val a = (0 until 1200).map(i => ("A", i.toLong))
    val b = (800 until 2000).map(i => ("B", i.toLong))
    (a ++ b).toDF("src", "v").withColumn("h", xxhash64(col("v")))
  }

  test("k >= |union| degenerates to the exact Jaccard") {
    val out = Sketches.kmvJaccard(elems, "src", "h", k = 4096).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("src_a") == "A" && r.getAs[String]("src_b") == "B")
    assert(r.getAs[Long]("k_union") == 2000L)
    assert(r.getAs[Long]("n_shared") == 400L)
    assert(r.getAs[Long]("est_bp") == 2000L) // 400 * 10000 / 2000
  }

  test("small-k estimate lands within 4 sigma of the true Jaccard") {
    val k = Sketches.DefaultKmvK
    val r = Sketches.kmvJaccard(elems, "src", "h", k).collect().head
    val est = r.getAs[Long]("est_bp") / 10000.0
    val j = 0.2
    val sigma = math.sqrt(j * (1 - j) / k) // ≈ 0.05 at k = 64
    assert(math.abs(est - j) <= 4 * sigma,
      s"est $est vs true $j beyond 4σ (${4 * sigma})")
  }

  test("sketches are sorted, distinct, and capped at k") {
    val sk = Sketches.kmvSketch(
      elems.union(elems), // duplicates must not inflate the sketch
      "src", "h", k = 50).collect()
    assert(sk.length == 2)
    sk.foreach { row =>
      val s = row.getSeq[Long](row.fieldIndex("sketch")).toList
      assert(s.length == 50)
      assert(s == s.sorted)
      assert(s.distinct.length == s.length)
    }
  }

  test("disjoint sources produce no pair (equi-join candidate rule)") {
    val disjoint = Seq(("X", 1L), ("X", 2L), ("Y", 3L), ("Y", 4L))
      .toDF("src", "v").withColumn("h", xxhash64(col("v")))
    assert(Sketches.kmvJaccard(disjoint, "src", "h", 64).count() == 0L)
  }
}
