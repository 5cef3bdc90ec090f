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

  test("kmvDistinct: exact below k, estimator within 4 sigma above it") {
    // group "A": 1200 distinct (above k=64 → estimator regime); tiny
    // group: 5 distinct (below k → exact regime). Hashes MUST be in the
    // 32-bit portable domain the estimator's M assumes (the full-range
    // signed xxhash64 `elems` uses for rank-only Jaccard work would
    // break the (k−1)·M/h_k arithmetic).
    val big = (0 until 1200).map(i => ("A", i.toLong)).toDF("src", "v")
      .withColumn("h", pmod(xxhash64(col("v")), lit(1L << 32)))
    val tiny = Seq.tabulate(5)(i => ("T", 90000L + i)).toDF("src", "v")
      .withColumn("h", pmod(xxhash64(col("v")), lit(1L << 32)))
    val sk = Sketches.kmvSketch(big.unionByName(tiny), "src", "h", 64)
    val out = Sketches.kmvDistinct(sk, "src", 64)
      .collect().map(r => r.getAs[String]("src") ->
        (r.getAs[Long]("n_sketch"), r.getAs[Long]("est_distinct"))).toMap
    assert(out("T") == ((5L, 5L))) // sketch IS the set
    val (nk, est) = out("A")
    assert(nk == 64L)
    val sigma = 1200.0 / math.sqrt(64 - 2) // SE ≈ n/√(k−2)
    assert(math.abs(est - 1200.0) <= 4 * sigma, s"est $est vs 1200")
  }

  // --- Bloom filter (q145's operator) ---------------------------------
  // Keys mimic the production surface: nonnegative 32-bit values (the
  // PortableShingleHash range the portability contract assumes).

  private def keys32(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(_.toLong).toDF("id")
      .withColumn("h", pmod(xxhash64(col("id")), lit(1L << 32)))

  test("bloom: no false negatives — every inserted key probes true") {
    val members = keys32(0 until 3000)
    val filt = Sketches.bloomBuild(members, "h")
    val probed = Sketches.bloomMaybeContains(members, filt, "h", Seq("id"))
    assert(probed.filter(!col("maybe_in")).count() == 0L)
  }

  test("bloom: false-positive rate near the (1 - e^(-kn/M))^k bound") {
    val filt = Sketches.bloomBuild(keys32(0 until 3000), "h")
    val nonMembers = keys32(100000 until 120000)
    val fp = Sketches.bloomMaybeContains(nonMembers, filt, "h", Seq("id"))
      .filter(col("maybe_in")).count()
    // n=3000, M=2^20, k=3 → p ≈ (1 - e^(-9000/2^20))^3 ≈ 6.2e-7: over
    // 20k probes the expected count is ~0.01; allow a generous ceiling
    // (any systematic position bug yields thousands of hits, not ≤ 5)
    assert(fp <= 5L, s"false positives: $fp over 20k probes")
  }

  test("bloom: empty filter rejects everything (left-join coalesce path)") {
    val empty = Sketches.bloomBuild(keys32(0 until 0), "h")
    val probed = Sketches.bloomMaybeContains(keys32(0 until 100), empty, "h", Seq("id"))
    assert(probed.filter(col("maybe_in")).count() == 0L)
  }

  test("bloom: positions stay in-range BIGINT (no ANSI overflow at h = 2^32 - 1)") {
    val edge = Seq((0L, (1L << 32) - 1), (1L, 0L)).toDF("id", "h")
    val ps = edge.select(explode(Sketches.bloomPositions(col("h"))).as("p"))
      .collect().map(_.getLong(0))
    assert(ps.forall(p => p >= 0 && p < Sketches.BloomBits))
  }

  // --- Count-Min sketch (q146's operator) ------------------------------

  /** Zipf-ish fixture: key i appears 3000/(i+1) times — heavy head, long
    * tail; per-key exact counts are the ground truth. */
  private lazy val zipf = {
    val rows = (0 until 400).flatMap(i => Seq.fill(3000 / (i + 1))(i.toLong))
    rows.toDF("v")
      .withColumn("h", pmod(xxhash64(col("v")), lit(1L << 32)))
      .groupBy("h").agg(count(lit(1)).as("c"))
  }

  test("cms: estimates never undercount and heavy hitters are near-exact") {
    val cms = Sketches.countMinBuild(zipf, "h", "c")
    val est = Sketches.countMinEstimate(zipf, cms, "h")
    // one-sided error: est >= exact for EVERY key
    assert(est.filter(col("est") < col("c")).count() == 0L)
    // the top key (3000 occurrences) collides with ≤ 399 tail keys over
    // width 1024 × depth 3 — its min-over-rows estimate stays within the
    // total tail mass in the worst case, and in practice much closer
    val top = est.orderBy(col("c").desc).limit(1).collect().head
    assert(top.getAs[Long]("est") - top.getAs[Long]("c") <= 500L,
      s"heavy hitter overcount ${top.getAs[Long]("est")} vs ${top.getAs[Long]("c")}")
  }

  test("cms join-size estimate: one-sided and bounded on the zipf fixture") {
    val cms = Sketches.countMinBuild(zipf, "h", "c")
    val est = Sketches.countMinJoinSize(cms, cms)
      .collect().head.getAs[Long]("est_join_size")
    val exact = zipf.agg(sum(expr("c * c"))).collect().head.getLong(0)
    assert(est >= exact, s"inner-product estimate must never undercount: $est < $exact")
    // per depth row the expected excess is (Σc)²/w; min over the 3 rows
    // of the fixed fixture stays within a 3x margin of that mean
    val total = zipf.agg(sum(col("c"))).collect().head.getLong(0)
    val bound = 3L * total * total / Sketches.CmsWidth
    assert(est - exact <= bound, s"excess ${est - exact} beyond bound $bound")
  }

  test("merges equal the single-shot build (distributed-aggregation identity)") {
    // Bloom: bit_or by word
    val bAll = Sketches.bloomBuild(keys32(0 until 2000), "h")
    val bMerged = Sketches.bloomMerge(
      Sketches.bloomBuild(keys32(0 until 700), "h"),
      Sketches.bloomBuild(keys32(700 until 2000), "h"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits")).toMap
    assert(asMap(bMerged) == asMap(bAll))
    // CMS: cell-wise sum — split the per-key counts across two shards,
    // with overlapping keys so linearity is actually exercised
    val all = zipf
    import org.apache.spark.sql.functions.{col => c}
    val shardA = all.withColumn("c", c("c") - (c("c") / 2).cast("long"))
    val shardB = all.withColumn("c", (c("c") / 2).cast("long")).filter(c("c") > 0)
    val mMerged = Sketches.countMinMerge(
      Sketches.countMinBuild(shardA, "h", "c"),
      Sketches.countMinBuild(shardB, "h", "c"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("i"), r.getAs[Long]("p")) -> r.getAs[Long]("s")).toMap
    assert(cells(mMerged) == cells(Sketches.countMinBuild(all, "h", "c")))
    // KMV: k smallest of the union
    val kAll = Sketches.kmvSketch(elems, "src", "h", 50)
    val kMerged = Sketches.kmvMerge(
      Sketches.kmvSketch(elems.filter(col("v") % 2 === 0), "src", "h", 50),
      Sketches.kmvSketch(elems.filter(col("v") % 2 =!= 0), "src", "h", 50), "src", 50)
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("src") ->
        r.getSeq[Long](r.fieldIndex("sketch")).toList).toMap
    assert(sk(kMerged) == sk(kAll))
  }

  // --- HyperLogLog (q148's operator) -----------------------------------

  test("hll: estimate lands within the standard-error bound at 1024 registers") {
    // 50k distinct 32-bit keys — far past the small-range regime, so the
    // RAW estimate (the hashed column) is the one under test
    val n = 50000
    val regs = Sketches.hllBuild(keys32(0 until n), Seq.empty, "h")
    val est = Sketches.hllEstimate(regs, Seq.empty).collect().head
    val raw = est.getAs[Long]("est_hll").toDouble
    val sigma = 1.04 / math.sqrt(Sketches.HllM.toDouble) // ≈ 3.3 %
    assert(math.abs(raw - n) / n <= 4 * sigma,
      s"raw estimate $raw vs true $n beyond 4σ (${4 * sigma})")
    // corrected estimate equals raw outside the small-range regime
    assert(est.getAs[Long]("est_corrected") == est.getAs[Long]("est_hll"))
  }

  test("hll: small-range (linear-counting) correction beats the raw estimate") {
    val n = 300 // << 2.5m = 2560: raw HLL is biased here, LC is not
    val est = Sketches.hllEstimate(
      Sketches.hllBuild(keys32(0 until n), Seq.empty, "h"), Seq.empty)
      .collect().head
    val corrected = est.getAs[Long]("est_corrected").toDouble
    assert(math.abs(corrected - n) / n <= 0.15,
      s"linear-counting estimate $corrected vs true $n")
  }

  test("hll: duplicates never move a register and ranks stay in range") {
    val a = keys32(0 until 4000)
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("reg")).toMap
    val once = regMap(Sketches.hllBuild(a, Seq.empty, "h"))
    assert(regMap(Sketches.hllBuild(a.union(a), Seq.empty, "h")) == once)
    assert(once.keys.forall(b => b >= 0 && b < Sketches.HllM))
    assert(once.values.forall(r => r >= 1 && r <= Sketches.HllWBits + 1))
  }

  test("hll: merge equals the single-shot build (register-wise max)") {
    val all = keys32(0 until 9000)
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("reg")).toMap
    val grouped = all.withColumn("g", when(col("id") % 3 === 0, "x").otherwise("y"))
    val merged = Sketches.hllMerge(
      Sketches.hllBuild(grouped.filter(col("id") < 4000), Seq("g"), "h"),
      Sketches.hllBuild(grouped.filter(col("id") >= 4000), Seq("g"), "h"), Seq("g"))
    assert(regMap(merged) == regMap(Sketches.hllBuild(grouped, Seq("g"), "h")))
  }

  // --- Hash-sample quantiles (q150's operator) --------------------------

  /** 10k rows, values 0..9999 (uniform), grouped into one stratum; ids
    * are the values themselves (unique), hashes 32-bit as in prod. */
  private lazy val vals = (0 until 10000).map(i => ("g", i.toLong))
    .toDF("grp", "v")
    .withColumn("id", col("v"))
    .withColumn("h", pmod(xxhash64(col("id")), lit(1L << 32)))

  test("hash sample: bounded, deterministic, and merge equals single-shot") {
    val s = Sketches.hashSample(vals, Seq("grp"), "id", "h", 256)
    assert(s.count() == 256L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(s) == ids(Sketches.hashSample(vals, Seq("grp"), "id", "h", 256)))
    val merged = Sketches.hashSampleMerge(
      Sketches.hashSample(vals.filter(col("v") % 2 === 0), Seq("grp"), "id", "h", 256),
      Sketches.hashSample(vals.filter(col("v") % 2 =!= 0), Seq("grp"), "id", "h", 256),
      Seq("grp"), "id", "h", 256)
    assert(ids(merged) == ids(s))
  }

  test("sample quantiles: CDF error within the DKW bound on a uniform fixture") {
    val samp = Sketches.hashSample(vals, Seq("grp"), "id", "h", 256)
    val qs = Seq(2500, 5000, 7500, 9000)
    val out = Sketches.sampleQuantiles(samp, Seq("grp"), "v", "id", "h", qs)
      .collect().map(r => r.getAs[Int]("q_bp") -> r.getAs[Long]("v_at_q")).toMap
    assert(out.keySet == qs.toSet)
    // true CDF of v is v/10000; sample quantile error ~ 1.36/sqrt(256) at
    // 95% — assert a 3x margin on the fixed (deterministic) fixture
    qs.foreach { q =>
      val cdfErr = math.abs(out(q) / 10000.0 - q / 10000.0)
      assert(cdfErr <= 0.12, s"q=$q estimate ${out(q)} off by $cdfErr")
    }
  }

  test("sample quantiles: a group smaller than k yields exact order statistics") {
    val tiny = (1 to 10).map(i => ("t", i.toLong)).toDF("grp", "v")
      .withColumn("id", col("v"))
      .withColumn("h", pmod(xxhash64(col("id")), lit(1L << 32)))
    val out = Sketches.sampleQuantiles(
      Sketches.hashSample(tiny, Seq("grp"), "id", "h", 256),
      Seq("grp"), "v", "id", "h", Seq(5000, 9000, 10000))
      .collect().map(r => r.getAs[Int]("q_bp") -> r.getAs[Long]("v_at_q")).toMap
    // ceil(q*n/1e4) over n=10 distinct values 1..10: exact order stats
    assert(out(5000) == 5L && out(9000) == 9L && out(10000) == 10L)
  }

  test("cms: sketch is depth x width bounded and totals each row exactly") {
    val cms = Sketches.countMinBuild(zipf, "h", "c").collect()
    assert(cms.length <= Sketches.BloomHashes.size * Sketches.CmsWidth)
    val totalPerRow = cms.groupBy(_.getAs[Int]("i")).view.mapValues(_.map(_.getAs[Long]("s")).sum)
    val exact = zipf.agg(sum("c")).collect().head.getLong(0)
    // every depth row partitions the full mass — each must sum to the total
    totalPerRow.foreach { case (i, s) => assert(s == exact, s"row $i mass $s != $exact") }
  }
}
