package graft

import graft.operators.TextDedup
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 adaptive CC regime switch: past `CcContractionMinEdges`
  * symmetric edges, `connectedComponents` runs a round-1 contraction
  * prelude (quotient by the first hash-min labels, flat loop on the
  * contracted graph, label composition) instead of the flat loop — the
  * measured winner at 150M+ edges (BASELINE.md round 17). The switch
  * must be INVISIBLE: both branches label every vertex with the minimum
  * reachable id, per-vertex-identically. This spec forces each branch
  * via the threshold parameter and pins that equality on the shapes
  * that exercise the composition hardest (multi-round chains, cliques,
  * bridges, one-round stars whose contracted graph is EMPTY), plus the
  * leak discipline the flat branch already guarantees. */
class CcContractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // localMaxEdges = 0 keeps these helpers on the DISTRIBUTED branches the
  // spec exists to compare (the r17-optimization driver-local regime would
  // otherwise swallow every small fixture); the local regime gets its own
  // forced-equality test below.
  private def labels(edges: DataFrame, threshold: Long): Map[Long, Long] =
    TextDedup.connectedComponents(edges, contractionMinEdges = threshold,
        localMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def flat(edges: DataFrame) = labels(edges, Long.MaxValue)
  private def contracted(edges: DataFrame) = labels(edges, 0L)
  private def local(edges: DataFrame): Map[Long, Long] =
    TextDedup.connectedComponents(edges, localMaxEdges = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("contraction branch equals flat branch on a planted multi-shape graph") {
    import spark.implicits._
    // chain (multi-round propagation), triangle + bridge, pairs — the
    // TierESpec planted graph, run through BOTH forced branches
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (12L, 13L), (20L, 21L), (31L, 30L)).toDF("src", "dst")
    val f = flat(edges)
    val c = contracted(edges)
    assert(c == f, s"branches diverged: only-contracted=${c.toSet -- f.toSet}")
    assert(c(4L) == 1L && c(13L) == 10L)
    val l = local(edges)
    assert(l == f, s"local regime diverged: only-local=${l.toSet -- f.toSet}")
  }

  test("driver-local regime equals the flat branch and union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(53L)
    for (trial <- 1 to 2) {
      val chain = (0 until 80).map(i => (trial * 10000L + i, trial * 10000L + i + 1))
      val randEdges = (0 until 150).map { _ =>
        (trial * 10000L + rng.nextInt(1200), trial * 10000L + rng.nextInt(1200))
      }.filter { case (a, b) => a != b }
      val all = chain ++ randEdges
      val df = all.toDF("src", "dst")
      val l = local(df)
      assert(l == flat(df), s"trial $trial: local regime diverged from flat")
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r } }
      all.foreach { case (a, b) => parent(find(a)) = find(b) }
      val expect = parent.keys.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m) }
      assert(l == expect, s"trial $trial: local regime diverged from union-find")
    }
  }

  test("driver-local regime handles the empty edge set") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(TextDedup.connectedComponents(empty).collect().isEmpty)
  }

  test("contraction branch equals flat branch and union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(41L)
    for (trial <- 1 to 2) {
      val chain = (0 until 90).map(i => (trial * 10000L + i, trial * 10000L + i + 1))
      val cliques = (0 until 3).flatMap { cl =>
        val base = trial * 10000L + 1000 + cl * 100
        for (i <- 0 until 10; j <- i + 1 until 10 if rng.nextBoolean())
          yield (base + i, base + j)
      }
      val randEdges = (0 until 120).map { _ =>
        (trial * 10000L + rng.nextInt(1500), trial * 10000L + rng.nextInt(1500))
      }.filter { case (a, b) => a != b }
      val all = chain ++ cliques ++ randEdges
      val df = all.toDF("src", "dst")
      val f = flat(df)
      val c = contracted(df)
      assert(c == f, s"trial $trial: branches diverged")
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r } }
      all.foreach { case (a, b) => parent(find(a)) = find(b) }
      val expect = parent.keys.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m) }
      assert(c == expect, s"trial $trial: contraction diverged from union-find")
    }
  }

  test("one-round star: contracted graph is empty, composition keeps round-1 labels") {
    import spark.implicits._
    // every edge touches the min vertex, so round 1 converges and the
    // quotient graph has no edges — the composition's left-join must
    // pass the round-1 labels through unchanged
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (7L, 8L)).toDF("src", "dst")
    val c = contracted(edges)
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("contraction branch frees its checkpoint generations like the flat branch") {
    import spark.implicits._
    val sc = spark.sparkContext
    val edges = (1L until 101L).map(i => (i, i + 1)).toDF("src", "dst")
    val before = sc.getPersistentRDDs.size
    val out = TextDedup.connectedComponents(edges, contractionMinEdges = 0L)
    assert(out.collect().forall(_.getLong(1) == 1L))
    val after = sc.getPersistentRDDs.size
    assert(after - before <= 1,
      s"contraction branch leaked ${after - before} persisted RDD generations")
  }
}
