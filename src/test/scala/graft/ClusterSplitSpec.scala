package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q195's raison d'être, pinned as a property the hash oracle cannot
  * express: under the CLUSTER-aware split no verified near-dup pair
  * crosses the train/test boundary (every pair is within a connected
  * component by construction, and components are assigned whole),
  * while the naive doc-id split DOES leak on the same pair set — the
  * exact failure q178 detects. Runs on the real sf0.001 corpus. */
class ClusterSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def md5Split(key: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    if (h % 100 < 80) "train" else "test"
  }

  /** Scalar adjacent-Jaccard pairs + union-find closure over the corpus. */
  private lazy val (pairs, comp) = {
    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).distinct.toSet).toMap
    val ps = docs.keys.toSeq.sorted.flatMap { a =>
      docs.get(a + 1).map { tb =>
        val ta = docs(a)
        (a, a + 1L, (ta & tb).size * 10 >= (ta | tb).size * 9)
      }
    }.collect { case (a, b, true) => (a, b) }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    ps.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (ps, docs.keys.map(id => id -> find(id)).toMap)
  }

  test("cluster-aware split leaks zero verified pairs; the doc-id split leaks on the same pairs") {
    assert(pairs.nonEmpty, "fixture lost its adjacent near-dup pairs — q180/q195 are vacuous")
    val clusterLeaks = pairs.count { case (a, b) => md5Split(comp(a)) != md5Split(comp(b)) }
    assert(clusterLeaks === 0, "a verified pair crossed the cluster-split boundary")
    val docLeaks = pairs.count { case (a, b) => md5Split(a) != md5Split(b) }
    assert(docLeaks > 0,
      "the doc-id split no longer leaks on this corpus — the contrast q195 demonstrates is gone; re-check the fixture")
  }

  test("q197 admission inherits corpus-side reps; q198 (streamed) equals q197") {
    val out = SparkEntry.queries("q197_incremental_cluster_split")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(out.nonEmpty)
    // the fixture must exercise BOTH paths: inherited and novel
    assert(out.exists(_._4 > 0L), "no batch doc inherited a corpus twin — admission fixture vacuous")
    assert(out.exists(_._4 === 0L), "every batch doc inherited — novel path untested")
    out.foreach { case (id, rep, split, nTwins) =>
      if (nTwins > 0)
        assert(rep < SparkEntry.IncrementalSplitId,
          s"doc $id: inherited rep $rep is not a corpus id")
      else
        assert(rep === id, s"doc $id: novel doc must be its own representative")
      // the split column is exactly the md5 rule on the representative
      assert(split === md5Split(rep), s"doc $id: split drifted from md5(rep)")
    }
    val streamed = SparkEntry.queries("q198_stream_admission")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(streamed === out)
  }

  test("q195 counts equal the scalar closure + split over the full sf0.001 corpus") {
    val langs = Tables.table(spark, dir, "documents")
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = comp.toSeq.map { case (id, c) => (md5Split(c), langs(id), c) }
      .groupBy { case (s, l, _) => (s, l) }
      .map { case ((s, l), rows) => (s, l, rows.size.toLong, rows.map(_._3).distinct.size.toLong) }
      .toSeq.sortBy { case (s, l, _, _) => (s, l) }
    val got = SparkEntry.queries("q195_cluster_split")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
  }
}
