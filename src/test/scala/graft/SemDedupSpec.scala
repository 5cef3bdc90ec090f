package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup family (q186/q187) vs an INDEPENDENT scalar reference: the
  * whole pipeline — quantization, lowest-id centroids, integer-dot argmax
  * assignment, within-cluster pair verification, greedy keep-lowest-id
  * drops, prototype ranking — recomputed with plain Scala collections and
  * compared exactly. Also pins cluster recovery on planted structure and
  * run-to-run determinism (the property the DuckDB oracle relies on). */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Scale = 10000L
  // the DataFrame column is array<float>: quantization sees the FLOAT32
  // value widened back to double (exactly what the engine computes)
  private def quant(v: Seq[Double]): Seq[Long] =
    v.map(x => math.floor(x.toFloat.toDouble * Scale).toLong)
  private def dot(a: Seq[Long], b: Seq[Long]): Long = a.zip(b).map { case (x, y) => x * y }.sum

  /** Scalar replay of semAssign: nearest of the `nlist` lowest-id vectors
    * by quantized dot, ties to the lowest centroid id. */
  private def refAssign(vecs: Map[Long, Seq[Double]], nlist: Int): Map[Long, (Long, Long)] = {
    val q = vecs.map { case (id, v) => id -> quant(v) }
    val cents = q.keys.toSeq.sorted.take(nlist).map(id => id -> q(id))
    q.map { case (id, v) =>
      val (cid, s) = cents.map { case (c, cv) => (c, dot(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }
      id -> (cid, s)
    }
  }

  private def refStats(vecs: Map[Long, Seq[Double]], nlist: Int, minScore: Long,
                       cap: Int = graft.operators.TextDedup.DefaultMaxBucketSize)
  : Map[Long, (Long, Long, Long)] = {
    val q = vecs.map { case (id, v) => id -> quant(v) }
    val asg = refAssign(vecs, nlist)
    val byCluster = asg.toSeq.groupBy(_._2._1).map { case (cid, m) => cid -> m.map(_._1).sorted }
    byCluster.map { case (cid, ids) =>
      val pairs =
        if (ids.size < 2 || ids.size > cap) Seq.empty
        else for { a <- ids; b <- ids if a < b && dot(q(a), q(b)) >= minScore } yield (a, b)
      cid -> (ids.size.toLong, pairs.size.toLong, pairs.map(_._2).distinct.size.toLong)
    }
  }

  private def refProtoDrops(vecs: Map[Long, Seq[Double]], nlist: Int, dropBp: Int)
  : Seq[(Long, Long, Long, Long)] = {
    val asg = refAssign(vecs, nlist)
    asg.toSeq.groupBy(_._2._1).toSeq.flatMap { case (cid, m) =>
      val ranked = m.map { case (id, (_, s)) => (id, s) }.sortBy { case (id, s) => (-s, id) }
      val quota = ranked.size.toLong * dropBp / 10000
      ranked.zipWithIndex.take(quota.toInt)
        .map { case ((id, s), i) => (cid, id, (i + 1).toLong, s) }
    }.sortBy { case (cid, _, r, _) => (cid, r) }
  }

  /** 3 planted clusters in dim 8: members are axis-aligned prototypes with
    * small deterministic jitter, ids interleaved so centroid ids (lowest
    * nlist) span all clusters. */
  private def plantedVecs(n: Int): Map[Long, Seq[Double]] = {
    (0 until n).map { i =>
      val axis = i % 3
      val base = Seq.tabulate(8)(d => if (d == axis) 1.0 else 0.0)
      val jit = Seq.tabulate(8)(d => ((i * 31 + d * 7) % 11 - 5) * 0.01)
      i.toLong -> base.zip(jit).map { case (b, j) => b + j }
    }.toMap
  }

  private def toDf(vecs: Map[Long, Seq[Double]]) = {
    import spark.implicits._
    vecs.toSeq.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  test("semAssign matches the scalar argmax and recovers the planted clusters") {
    val vecs = plantedVecs(60)
    val ref = refAssign(vecs, nlist = 3)
    val got = Similarity.semAssign(toDf(vecs), "vec_id", "embedding", nlist = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === ref)
    // planted recovery: members of one axis share their centroid (ids
    // 0/1/2 are one prototype of each axis, so cid == id % 3's centroid)
    val byAxis = got.groupBy(_._1 % 3).view.mapValues(_.values.map(_._1).toSet).toMap
    byAxis.foreach { case (axis, cids) =>
      assert(cids.size == 1 && cids.head == axis,
        s"axis $axis scattered over centroids $cids")
    }
  }

  test("semDedupStats equals the scalar reference (planted + threshold that splits)") {
    val vecs = plantedVecs(60)
    // within-axis dots ≈ 1.0×Scale² ≥ minScore; cross-axis ≈ 0 — the
    // threshold genuinely splits
    val minScore = 50000000L
    val ref = refStats(vecs, nlist = 3, minScore = minScore)
    val got = Similarity.semDedupStats(toDf(vecs), "vec_id", "embedding",
        minScore = minScore, nlist = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === ref)
    assert(got.values.map(_._2).sum > 0 && got.values.map(_._3).sum < 60,
      "fixture degenerated: no pairs or everything dropped")
  }

  test("semDedupStats skips clusters over the cap but still reports their size") {
    val vecs = plantedVecs(30)
    val ref = refStats(vecs, nlist = 3, minScore = 50000000L, cap = 9)
    val got = Similarity.semDedupStats(toDf(vecs), "vec_id", "embedding",
        minScore = 50000000L, nlist = 3, maxClusterSize = 9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === ref)
    assert(got.values.exists { case (m, p, _) => m > 9 && p == 0L },
      "cap fixture degenerated: no over-cap cluster present")
  }

  test("semPrototypeDrops equals the scalar rank reference") {
    val vecs = plantedVecs(60)
    val ref = refProtoDrops(vecs, nlist = 3, dropBp = 2000)
    val got = Similarity.semPrototypeDrops(toDf(vecs), "vec_id", "embedding",
        nlist = 3, dropBp = 2000)
      .orderBy("cid", "proto_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getLong(3))).toSeq
    assert(got === ref)
    assert(got.nonEmpty && got.size < 60, "prune fixture degenerated")
  }

  test("run-to-run determinism (what the cross-engine hash relies on)") {
    val df = toDf(plantedVecs(45))
    def run() = Similarity.semDedupStats(df, "vec_id", "embedding",
      minScore = 50000000L, nlist = 3).orderBy("cid").collect().toSeq
    assert(run() === run())
  }

  /** Scalar reference for the cross-pair family (q207/q208): existing
    * members of eligible clusters (existing-side size ≤ cap) × incoming
    * vectors assigned to the same EXISTING-derived centroid, verified by
    * quantized dot. */
  private def refCrossPairs(vecs: Map[Long, Seq[Double]], split: Long, nlist: Int,
                            minScore: Long, cap: Int): Set[(Long, Long, Long, Long)] = {
    val q = vecs.map { case (id, v) => id -> quant(v) }
    val existing = vecs.filter(_._1 < split)
    val cents = existing.keys.toSeq.sorted.take(nlist).map(id => id -> q(id))
    def assign(id: Long): Long =
      cents.map { case (c, cv) => (c, dot(q(id), cv)) }.maxBy { case (c, s) => (s, -c) }._1
    val asgE = existing.keys.map(id => id -> assign(id)).toMap
    val eligible = asgE.groupBy(_._2).collect { case (cid, m) if m.size <= cap => cid }.toSet
    (for {
      (e, cidE) <- asgE if eligible(cidE)
      i <- vecs.keys if i >= split && assign(i) == cidE
      s = dot(q(e), q(i)) if s >= minScore
    } yield (cidE, e, i, s)).toSet
  }

  test("semCrossPairs equals the scalar cross reference (q207)") {
    val vecs = plantedVecs(60)
    val split = 30L
    val got = Similarity.semCrossPairs(
        toDf(vecs.filter(_._1 < split)), toDf(vecs.filter(_._1 >= split)),
        "vec_id", "embedding", minScore = 50000000L, nlist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val ref = refCrossPairs(vecs, split, nlist = 3, minScore = 50000000L,
      cap = graft.operators.TextDedup.DefaultMaxBucketSize)
    assert(got === ref)
    assert(got.nonEmpty, "cross fixture degenerated: no cross pairs")
  }

  test("semCrossPairs honors the existing-side cap (micro-batch-invariant by construction)") {
    val vecs = plantedVecs(60)
    val split = 30L
    // cap 9 < the 10 existing members per planted cluster → everything
    // ineligible → empty; the incoming batch size can never change that
    val got = Similarity.semCrossPairs(
        toDf(vecs.filter(_._1 < split)), toDf(vecs.filter(_._1 >= split)),
        "vec_id", "embedding", minScore = 1L, nlist = 3, maxExistingCluster = 9)
      .count()
    assert(got == 0L, s"over-cap existing clusters must be ineligible, got $got pairs")
  }

  test("semStreamCrossPairs equals semCrossPairs on the closed input (q208 streaming = batch)") {
    val vecs = plantedVecs(60)
    val split = 30L
    val existing = toDf(vecs.filter(_._1 < split))
    val incoming = toDf(vecs.filter(_._1 >= split))
    val batch = Similarity.semCrossPairs(existing, incoming,
        "vec_id", "embedding", minScore = 50000000L, nlist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_semstream").toString
    incoming.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(incoming.schema).parquet(dir)
    val idx = Similarity.semExistingIndex(existing, "vec_id", "embedding", nlist = 3)
    val cents = Similarity.collectCentroids(
      Similarity.semCentroids(existing, "vec_id", "embedding", nlist = 3))
    val streamed = graft.streaming.StreamOps.runAppend(spark,
        Similarity.semStreamCrossPairs(stream, "vec_id", "embedding",
          cents, idx, minScore = 50000000L),
        "semstream_probe")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty, "streaming fixture degenerated")
    spark.catalog.dropTempView("semstream_probe")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("semStreamCrossPairs = semCrossPairs at a realistic centroid count (nlist=64 literal tree)") {
    // the literal-centroid expression's measured envelope reaches 1024
    // centroids (Similarity.semAssignExpr scaladoc); this pins
    // correctness of the big-literal tree where codegen may fall back
    // to interpreted evaluation — the values must not care.
    import spark.implicits._
    val rng = new scala.util.Random(11L)
    val all = (0 until 300).map(i =>
      (i.toLong, Seq.fill(64)((rng.nextFloat() * 2 - 1) / 8))).toDF("vec_id", "embedding")
    val split = 150L
    val existing = all.filter(org.apache.spark.sql.functions.col("vec_id") < split)
    val incoming = all.filter(org.apache.spark.sql.functions.col("vec_id") >= split)
    val batch = Similarity.semCrossPairs(existing, incoming,
        "vec_id", "embedding", minScore = 1L, nlist = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_semstream64").toString
    incoming.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(incoming.schema).parquet(dir)
    val idx = Similarity.semExistingIndex(existing, "vec_id", "embedding", nlist = 64)
    val cents = Similarity.collectCentroids(
      Similarity.semCentroids(existing, "vec_id", "embedding", nlist = 64))
    assert(cents.size == 64)
    val streamed = graft.streaming.StreamOps.runAppend(spark,
        Similarity.semStreamCrossPairs(stream, "vec_id", "embedding",
          cents, idx, minScore = 1L),
        "semstream64_probe")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty, "nlist=64 streaming fixture degenerated")
    spark.catalog.dropTempView("semstream64_probe")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("visibility floor + the seeding structural bound (round 17, verdict #3)") {
    // The receipt's spec pins (BASELINE.md round 17): same-cluster
    // visibility of the exact truth at the gate fixture must (a) hold
    // its measured floor under the declared lowest-id seeding — a
    // regression guard on the fixture and the scorer — and (b) NOT be
    // seeding-limited: greedy farthest-point (Gonzalez) must land
    // within noise of lowest-id, and even the max of 200 random seed
    // sets must stay below 0.30 — visibility at this k is set by the
    // truth pairs' ~73° geometry, not centroid placement (the fixtures
    // hold zero pairs at cosine >= 0.7, so the SemDeDup same-cluster
    // premise — built for >= 0.95-cosine duplicates — cannot hold at
    // the q84 threshold).
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val (lowest, farthest, randMax, _) =
      graft.tools.DedupQuality.measureSemSeedingBound(spark, emb, nlist = 16,
        trials = 200, hillEvals = 0)
    assert(lowest >= 0.14, f"lowest-id visibility regressed: $lowest%.3f")
    assert(math.abs(farthest - lowest) < 0.05,
      f"farthest-point seeding moved visibility materially ($lowest%.3f -> " +
        f"$farthest%.3f) — re-measure the structural-bound claim")
    assert(randMax < 0.30,
      f"a random seeding reached $randMax%.3f — the structural bound claim is stale")
  }

  test("semCentroidsFarthest: distributed seeder equals the scalar greedy k-center") {
    // the operator itself (the measured-no-better alternative) must be
    // deterministic and match a direct scalar replay of argmin-max-dot
    // with lowest-id ties
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings").limit(120)
    val got = Similarity.semCentroidsFarthest(emb, "vec_id", "embedding", nlist = 6)
    val rows = Similarity.semQuantized(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val seeds = scala.collection.mutable.ArrayBuffer(rows.head)
    while (seeds.size < 6) {
      val next = rows.filterNot(r => seeds.exists(_._1 == r._1))
        .map(r => (seeds.map(sd => dot(r._2, sd._2)).max, r))
        .minBy { case (md, (id, _)) => (md, id) }._2
      seeds += next
    }
    assert(got.map(_._1) == seeds.map(_._1).toSeq,
      s"seeder diverged: got=${got.map(_._1)} ref=${seeds.map(_._1)}")
  }
}
