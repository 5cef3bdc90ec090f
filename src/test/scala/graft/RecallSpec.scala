package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN recall regression guard (round-11 verdict #8): the q45/q53
  * operating points were confirmed MANUALLY against each regenerated
  * vector fixture (tools/Recall, commit 90e0f5a) — a regenerated
  * embeddings table whose distribution craters recall would previously
  * have shipped silently, since the oracle only checks determinism, not
  * quality. This spec pins minimum recall@k against brute force on the
  * CURRENT driver testdata. Thresholds sit well under the round-11
  * measured values (recorded inline) so regeneration noise passes and a
  * distribution collapse fails. */
class RecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fixtures(k: Int, nQ: Int) = {
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val queries = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val truth = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k))
    (emb, queries, truth)
  }

  /** The self-sized search point at the FIXTURE's corpus size — the same
    * rule the q45/q220/q222 entries interpolate (round 16, verdict #4). */
  private def searchPoint(emb: DataFrame): (Int, Int, Int) =
    Similarity.recommendedSearchPoint(emb.count())

  test("lshTopK at the SELF-SIZED q45 operating point holds recall@10") {
    val (emb, queries, truth) = fixtures(k = 10, nQ = 50)
    // round 13 measured 0.940 at the then-declared 4×4+4 point; round 16
    // self-sizes (tables, bits, probes) from the corpus count
    // (recommendedSearchPoint — holds the 4×4+4 collision probability by
    // construction, so the floor carries over)
    val (t, b, p) = searchPoint(emb)
    val got = pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10, numTables = t, bitsPerTable = b, probes = p))
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.70,
      f"lshTopK(${t}x$b+${p}probes) recall@10 = $recall%.3f < 0.70 — regenerated embeddings distribution " +
        "no longer suits the self-sized q45 point (re-tune via graft.tools.Recall)")
    // the probed point must not UNDERPERFORM the former home-only point:
    // probing trades table count for probe fan-out, never recall
    val home = pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10, numTables = 16, bitsPerTable = 4))
    val homeRecall = home.intersect(truth).size.toDouble / truth.size
    assert(recall >= homeRecall - 0.10,
      f"probed recall $recall%.3f fell >0.10 under the 16x4 home-only point's $homeRecall%.3f")
  }

  test("lshTopKInt (the q220 oracle twin) holds recall@10 vs the integer brute force") {
    // same SELF-SIZED operating point as the declared q220 entry
    // (portable ±1 planes); ground truth from the SAME integer scorer so
    // the floor isolates BANDING loss, not quantization drift
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val truth = pairs(Similarity.bruteForceTopKInt(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10))
    val (t, b, p) = searchPoint(emb)
    val got = pairs(Similarity.lshTopKInt(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10, numTables = t, bitsPerTable = b, probes = p))
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.70,
      f"lshTopKInt(${t}x$b+${p}probes) recall@10 = $recall%.3f < 0.70 — the portable-plane " +
        "self-sized point no longer suits the regenerated embeddings (re-tune via graft.tools.Recall)")
  }

  test("recommendedSearchPoint: landmarks, base-point reproduction, collision invariant (round 16)") {
    // at n ≤ 8·2^4 the occupancy rule floors at 4 bits and the table rule
    // must reproduce the DECLARED r15 base point exactly — 4×4+4
    assert(Similarity.recommendedSearchPoint(100) == ((4, 4, 4)),
      "small corpus must reproduce the declared 4x4+4 base point")
    // the two gate SFs (DriftGuard pins the corpus sizes): these are the
    // values the q220/q222 oracle texts interpolate this round
    assert(Similarity.recommendedSearchPoint(500) == ((11, 6, 6)))
    assert(Similarity.recommendedSearchPoint(2000) == ((26, 8, 8)))
    // collision-probability invariant: every point the rule emits (until
    // the 128-table shard-first cap) holds the base point's PROBED
    // threshold collision probability
    val pBit = 1.0 - math.acos(0.25) / math.Pi
    def pT(b: Int) = math.pow(pBit, b) + b * math.pow(pBit, b - 1) * (1 - pBit)
    val base = 1.0 - math.pow(1.0 - pT(4), 4)
    Seq(1L, 500L, 2000L, 20000L, 200000L).foreach { n =>
      val (t, b, p) = Similarity.recommendedSearchPoint(n)
      assert(p == b, "probes must equal bits (full 1-flip neighborhood)")
      if (t < 128)
        assert(1.0 - math.pow(1.0 - pT(b), t) >= base - 1e-9,
          s"n=$n point ($t, $b): collision fell below the base point's")
    }
  }

  test("adaptiveBits widens past the count rule on a clustered corpus, fits the occupancy bound") {
    import spark.implicits._
    // 4 tight clusters × 200 members: the count rule sees n=800 →
    // recommendedBits(800, 32) = 5, but members share most hyperplane
    // signs, so real occupancy is cluster-sized — the exact blind spot
    // the round-11 verdict called out. Jittered (not identical) vectors
    // split once enough planes are in play.
    val rng = new scala.util.Random(3L)
    val centers = Array.fill(4)(Array.fill(64)(rng.nextDouble() * 2 - 1))
    val vecs = (0 until 800).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + (rng.nextDouble() - 0.5) * 0.6).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val countRule = Similarity.recommendedBits(800, 32)
    val sized = Similarity.adaptiveBits(vecs, "vec_id", "embedding", maxOccupancy = 50)
    assert(sized > countRule,
      s"clustered corpus should force widening past the count rule ($countRule)")
    val mx = Similarity.portableEmbedBucketSizes(vecs, "vec_id", "embedding", bits = sized)
      .agg(max("n")).head().getLong(0)
    assert(mx <= 50, s"adaptive width $sized still has max occupancy $mx > 50")
  }

  test("adaptiveBits gives up at the width cap on sign-identical clusters (boilerplate is the cap's job)") {
    import spark.implicits._
    // 64 IDENTICAL vectors: no hyperplane count separates them — the
    // residual oversize bucket is genuine boilerplate for
    // DefaultMaxBucketSize, and the sizing loop must terminate at 24
    // rather than spin.
    val v = Array.fill(64)(0.5f).toSeq
    val vecs = (0 until 64).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    assert(Similarity.adaptiveBits(vecs, "vec_id", "embedding", maxOccupancy = 8) == 24)
  }

  test("recommendedTables holds the threshold collision probability as bits widen (round 12)") {
    // The rule's whole point: 1−(1−pBit^bits)^L(bits) stays ≥ the base
    // operating point's value, so occupancy-driven widening can never
    // silently convert scale into recall loss again (the measured 0.298
    // → 0.043 failure this rule closed — BASELINE.md round 12). Pin the
    // landmark values, monotonicity, floor and cap.
    val pBit = 1.0 - math.acos(0.25) / math.Pi
    def collide(bits: Int, l: Int) = 1.0 - math.pow(1.0 - math.pow(pBit, bits), l)
    val base = collide(6, 8)
    assert(Similarity.recommendedTables(6) == 8, "base operating point must stay 8 tables")
    assert(Similarity.recommendedTables(4) == 8, "floor: never fewer than the base tables")
    assert(Similarity.recommendedTables(10) == 72, "the measured 10x operating point (recall 0.327)")
    assert(Similarity.recommendedTables(24) == 128, "cap: shard the corpus past 128 tables")
    (7 to 14).foreach { b =>
      val l = Similarity.recommendedTables(b)
      assert(l >= Similarity.recommendedTables(b - 1),
        s"tables must be non-decreasing in bits (bits=$b)")
      if (l < 128)
        assert(collide(b, l) >= base - 1e-9,
          f"bits=$b L=$l: threshold collision ${collide(b, l)}%.3f fell below base $base%.3f")
    }
  }

  test("recommendedTablesProbed holds the base collision probability with ~bits-fold fewer tables (round 13)") {
    // Multi-probe (Lv et al. 2007): per-table collision for a threshold
    // pair is P(hamming ≤ 1) = p^b + b·p^(b−1)(1−p); the rule picks the
    // minimal L whose 1−(1−pTable)^L still clears the base operating
    // point's collision probability — same guarantee as
    // recommendedTables, ~(1 + b(1−p)/p)× cheaper. Pin the landmarks
    // (incl. the 10× point: L=72 home-only → L=9 probed), the floor/cap
    // and the invariant.
    val pBit = 1.0 - math.acos(0.25) / math.Pi
    def pTable(bits: Int) = math.pow(pBit, bits) + bits * math.pow(pBit, bits - 1) * (1 - pBit)
    def collide(bits: Int, l: Int) = 1.0 - math.pow(1.0 - pTable(bits), l)
    val base = 1.0 - math.pow(1.0 - math.pow(pBit, 6), 8)
    assert(Similarity.recommendedTablesProbed(4) == 2, "floor: never a single table")
    assert(Similarity.recommendedTablesProbed(6) == 2, "base-width probed point")
    assert(Similarity.recommendedTablesProbed(10) == 9, "the 10x operating point: 72 -> 9 tables")
    assert(Similarity.recommendedTablesProbed(24) == 128, "cap: shard the corpus past 128 tables")
    (5 to 14).foreach { b =>
      val l = Similarity.recommendedTablesProbed(b)
      if (l < 128)
        assert(collide(b, l) >= base - 1e-9,
          f"bits=$b L=$l: probed threshold collision ${collide(b, l)}%.3f fell below base $base%.3f")
    }
  }

  test("multi-probe pair generation is a superset of home-only at the same (tables, bits)") {
    // probe set includes the home bucket and the cap semantics align on
    // ham-0 pairs (an over-cap home bucket yields nothing in either
    // mode), so probing can only ADD ham-1 pairs — the recall direction
    // is one-sided by construction; this pins it on the real fixture.
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    def pairSet(probes: Int) = Similarity.portableEmbedPairs(
        emb, "vec_id", "embedding", minScore = graft.SparkEntry.EmbedMinScore,
        tables = 4, bits = 6, probes = probes)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val homeOnly = pairSet(0)
    val probed = pairSet(6)
    assert(homeOnly.subsetOf(probed),
      s"home-only found ${(homeOnly -- probed).size} pairs the probed mode missed")
    assert(probed.size > homeOnly.size,
      "probing added no ham-1 pairs at bits=6 on the real fixture — probe keys are not reaching neighbor buckets")
  }

  test("probed pair set is verification-regime-invariant (broadcast vs shuffle)") {
    // the two-regime claim (BroadcastVerifyMaxRows): dedup before or
    // after exact verification commutes, so the found (id_a, id_b,
    // score) SET cannot depend on which regime ran — pinned here so a
    // future regime change can't silently alter oracle output
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    def found(hint: Long) = Similarity.portableEmbedPairs(
        emb, "vec_id", "embedding", minScore = graft.SparkEntry.EmbedMinScore,
        tables = 2, bits = 6, probes = 6, corpusRowsHint = hint)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val broadcastRegime = found(emb.count()) // under the bound
    val shuffleRegime = found(-1L)           // no hint → distinct-first
    assert(broadcastRegime == shuffleRegime,
      s"regimes diverged: only-broadcast=${(broadcastRegime -- shuffleRegime).take(3)}, " +
        s"only-shuffle=${(shuffleRegime -- broadcastRegime).take(3)}")
    assert(broadcastRegime.nonEmpty, "regime fixture degenerated: no pairs")
  }

  test("broadcast-verify row bound derives from the vector dimension (round 14)") {
    // the former flat 100000L silently encoded dim=64 (53 MB of
    // array<long> payload); the bound now scales as budget/(dim*4) so a
    // dim change moves the regime switch proportionally. Round 15: the
    // fused single-broadcast verify admits 2x the rows of the r13
    // two-broadcast point at the SAME measured peak memory. Round 17:
    // the packed Array[Int] map representation (IntDotLookup.pack,
    // lossless at the ±10⁴ quantization scale) halves per-row bytes
    // again — 400k rows at dim 64 inside the same byte budget.
    assert(Similarity.broadcastVerifyMaxRows(64) == 400000L,
      "dim=64 must reproduce the measured byte envelope at the packed-Int representation")
    assert(Similarity.BroadcastVerifyMaxRows == 400000L)
    assert(Similarity.broadcastVerifyMaxRows(512) == 50000L,
      "8x the dimension must shrink the broadcastable row bound 8x")
    assertThrows[IllegalArgumentException](Similarity.broadcastVerifyMaxRows(0))
  }

  test("shuffle-regime dedup partitioning is sized by the keys-only candidate estimate (round 14)") {
    // Estimator exactness on the real fixture: est = raw probed stream +
    // home self-matches. Each key row whose home bucket survives the cap
    // probes ITSELF exactly once (through its home key — the pid != hid
    // filter drops it from the raw stream); directional flipped probes
    // land on a DIFFERENT bucket of the same table, where the doc's home
    // key cannot be, so they never self-match. Pinning the closed form
    // (not an inequality) means any drift between the estimator and the
    // generator — cap semantics, probe direction, fan-out — fails loudly.
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val planes = Similarity.portableHyperplanes(64, 2, 6)
    val q = Similarity.portableQuantized(emb, "vec_id", "embedding", scale = 10000)
    val keys = Similarity.portableBucketKeys(q, "vec_id", planes)
    val cap = graft.operators.TextDedup.DefaultMaxBucketSize
    val raw = Similarity.probedRawPairs(keys, "vec_id", cap, probes = 6).count()
    val selfMatches = keys.groupBy("__t", "__bkt").agg(count(lit(1)).as("n"))
      .filter(col("n") <= cap).agg(sum(col("n"))).head().getLong(0)
    val est = Similarity.estimatedRawCandidates(keys, probes = 6, maxBucketSize = cap)
    assert(raw > 0, "fixture degenerated: no raw candidates")
    assert(est == raw + selfMatches,
      s"estimator drifted from the generator: est=$est raw=$raw self=$selfMatches")
    // The chooser: floor at the session default, ceil(est / target) above
    // it, hard cap 2048 (a 100-TB deployment tunes cluster-wide shuffle
    // sizing, not one operator's repartition).
    assert(Similarity.dedupPartitionsFor(0L, 32) == 32, "small streams keep the session sizing")
    assert(Similarity.dedupPartitionsFor(44900000L, 32) == 129,
      "the r13-measured 44.9M-row point must land at ~350k rows/partition")
    assert(Similarity.dedupPartitionsFor(Long.MaxValue / 4, 32) == 2048, "hard cap")
  }

  test("embed-LSH pair recall at the SHIPPED multi-probe point holds the floor (q84 family, round 13)") {
    // the round-12 verdict's recall receipt, re-taken at the round-13
    // multi-probe operating point (tables from recommendedTablesProbed,
    // probes = bits — exactly what q84/q97/q125 run). r13 measured
    // 0.298+ at sf0.01; floor 0.25 leaves regen noise room while
    // catching a probing/cap regression (the 10× receipt lives in
    // BASELINE.md via ScaleTenX).
    val (found, truth, recall) = graft.tools.DedupQuality.measureEmbedPairs(
      spark, Tables.table(spark, TestSpark.sf01, "embeddings"))
    assert(truth > 0, "no exact near-dup vector pairs at the oracle SF — the embedding fixture degenerated")
    assert(recall >= 0.25,
      f"embed-LSH pair recall $found/$truth = $recall%.3f < 0.25 at the shipped multi-probe point — " +
        "re-measure via DedupQuality and re-derive (bits, tables, probes)")
  }

  test("float embed pair recall at the SHIPPED q43 point holds the floor (round 13)") {
    // the production float path's twin of the portable receipt — r13
    // measured 0.711 at sf0.01 / 0.396 at sf0.1, essentially identical
    // to the portable twin's 0.712/0.402 (different hyperplane family,
    // same collision theory). Same 0.25 floor as the portable pin.
    val (found, truth, recall) = graft.tools.DedupQuality.measureEmbedPairsFloat(
      spark, Tables.table(spark, TestSpark.sf01, "embeddings"))
    assert(truth > 0, "no exact float near-dup pairs at the oracle SF — the embedding fixture degenerated")
    assert(recall >= 0.25,
      f"float embed pair recall $found/$truth = $recall%.3f < 0.25 at the shipped q43 point — " +
        "re-measure via DedupQuality and re-derive (bits, tables, probes)")
  }

  test("minhash banding recall vs exact all-pairs Jaccard truth holds the floor (q82 family)") {
    // the text twin of the q84 pair-recall receipt (round 12): found ⊆
    // truth because verification is exact on the same shingle sets, so
    // the one statistic is banding RECALL — what the 16-hash/4-band
    // signature can lose on near-threshold pairs plus bucket-cap drops.
    // Theory at the 0.9-Jaccard verify threshold: 1−(1−0.9⁴)⁴ ≈ 0.986;
    // r12 measured on regenerated data: 24/25 = 0.960 at sf0.01,
    // 243/249 = 0.976 at sf0.1 (graft.tools.DedupQuality). Floor 0.80
    // leaves regen noise room while catching a banding/cap regression.
    val (found, truth, recall) = graft.tools.DedupQuality.measure(
      spark, Tables.table(spark, TestSpark.sf01, "documents"))
    assert(truth > 0, "no exact near-dup pairs at the oracle SF — the minhash fixture degenerated")
    assert(recall >= 0.80,
      f"minhash banding recall $found/$truth = $recall%.3f < 0.80 — bands/hashes or the " +
        "bucket cap no longer suit the regenerated corpus (re-measure via DedupQuality)")
  }

  test("edit-distance blocking recall holds on the near-identical band (q136 family)") {
    // r12 measured: the ≤EditMaxDist truth is BIMODAL — 25 pairs at
    // d ≤ 16 (planted near-dups, all prefix/suffix-reachable: found
    // 25/25 = 1.000) vs 436 at d 33–64 (word-shuffled semi-similars
    // sharing NEITHER affix — structurally invisible to blocking and
    // the minhash family's job; see BASELINE.md round 12). The pin is
    // on the band blocking is FOR: a regen where planted near-dups
    // start differing in both affixes would silently hollow q136.
    val (fn, tn, rn, _, _) = graft.tools.DedupQuality.measureEdit(
      spark, Tables.table(spark, TestSpark.sf01, "documents"))
    assert(tn > 0, "no near-identical pairs at the oracle SF — the edit fixture degenerated")
    assert(rn >= 0.90,
      f"edit blocking recall $fn/$tn = $rn%.3f < 0.90 on the d<=${graft.tools.DedupQuality.EditNearBand} band — " +
        "the planted near-dups no longer share a prefix/suffix (re-tune EditPrefixLen)")
  }

  test("ivfTopKInt at the declared q53 operating point (nlist=16, nprobe=4) holds recall@10") {
    // ground truth from the SAME integer scorer (bruteForceTopKInt), so
    // the statistic isolates the IVF probe loss from quantization noise
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val truth = pairs(Similarity.bruteForceTopKInt(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10))
    val got = pairs(Similarity.ivfTopKInt(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10, nlist = 16, nprobe = 4))
    val recall = got.intersect(truth).size.toDouble / truth.size
    // r11 measured 0.630 on the regenerated sf0.01 fixture (nprobe/nlist
    // = 1/4 of the lists scanned bounds recall on near-uniform vectors)
    assert(recall >= 0.40,
      f"ivfTopKInt(16/4) recall@10 = $recall%.3f < 0.40 — regenerated embeddings distribution " +
        "no longer suits the declared q53 parameters (re-tune via graft.tools.Recall)")
  }
}
