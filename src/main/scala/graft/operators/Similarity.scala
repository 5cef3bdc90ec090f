package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings.embedding`: array<float>[64] — FIXTURES.md), the
  * similarity-search tier of the build brief.
  *
  * Two paths:
  *   - `bruteForceTopK` — exact cosine top-k per query. The join is a
  *     broadcast of the (small) query set against the corpus, so the corpus
  *     is scanned once with no shuffle of vectors; ranking shuffles only
  *     (query_id, vec_id, sim). Correctness baseline + the right answer
  *     whenever |queries| is small.
  *   - `lshTopK` — sign-random-projection LSH (Charikar hyperplane LSH):
  *     `numTables` independent tables of `bitsPerTable` seeded hyperplanes;
  *     a vector's bucket in a table is the integer of its dot-product signs.
  *     Candidates = bucket collisions in ANY table; exact cosine re-ranks.
  *     At 100 TB the bucket join replaces the cartesian product — shuffle is
  *     linear in corpus size × numTables.
  *
  * Hyperplanes are generated driver-side from a fixed seed and inlined as
  * literal arrays, so signatures are pure codegen'd column math (zip_with /
  * aggregate) — no UDF, no extra shuffle, deterministic across runs.
  */
object Similarity {

  /** Fused-loop native cosine (graft.functions.CosineSim) for the scoring
    * hot paths; registered lazily on the frame's session. Semantics equal
    * VectorFunctions.cosine (tested). */
  private def fastCosine(df: DataFrame, a: Column, b: Column): Column = {
    graft.functions.CosineSim.register(df.sparkSession)
    call_function("cosine_sim", a, b)
  }

  /** Sizing rule for hyperplane-LSH signature width: with n corpus
    * vectors and b bits per table, expected bucket occupancy is n/2^b, so
    * b ≈ log₂(n / targetOccupancy). Occupancy is the knob that matters:
    * candidate generation is quadratic per bucket (and verification cost
    * linear in candidates), so bits must GROW with log₂(n) — a fixed b
    * that is right at 10⁶ vectors is 2¹⁰× over-occupied at 10⁹. Targets
    * used by the defaults here: ~32 for near-dup pair generation
    * (recall-leaning — exact verification prunes false candidates) and
    * ~8 for top-k search (per-query candidate cost). The oracle twins pin
    * bits (q84: 6 ≈ recommendedBits(2000, 32)) because the DuckDB replay
    * interpolates the same constants; production callers should derive
    * from a corpus count. Clamped to [4, 24]: below 4 bits buckets are
    * meaningless, above 24 empty-bucket overhead dominates and more
    * tables (not more bits) buy recall. */
  def recommendedBits(corpusSize: Long, targetOccupancy: Long = 32): Int = {
    require(corpusSize > 0 && targetOccupancy > 0)
    val raw = math.ceil(
      math.log(math.max(1.0, corpusSize.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    math.max(4, math.min(24, raw))
  }

  /** Recall-preserving table count to pair with `recommendedBits` (round
    * 12): widening buckets by Δ bits multiplies the per-table collision
    * probability of a threshold pair by pBit^Δ, so holding RECALL
    * constant needs the table count to grow by (1/pBit)^Δ — the
    * classical LSH n^(1+ρ) trade (Indyk–Motwani 1998; Gionis et al.
    * 1999): occupancy-only sizing silently converts scale into recall
    * loss (measured at 10×: pair recall 0.298 → 0.043 with tables
    * pinned at 8 — BASELINE.md round 12), while bits+tables sizing
    * holds the threshold collision probability 1−(1−pBit^bits)^L fixed
    * by construction. pBit defaults to the sign-agreement probability
    * of the q84 design threshold (cosine 0.25): 1 − arccos(0.25)/π ≈
    * 0.580. Floor at `baseTables` (never fewer than the base operating
    * point); cap at 128 — past that, per-table work is cheap but the
    * banding fan-out constant matters, and a corpus needing >128 tables
    * (bits ≈ 17, n ≈ 4M per partition-group) should shard the corpus
    * before the LSH instead. */
  def recommendedTables(bits: Int, baseBits: Int = 6, baseTables: Int = 8,
                        pBit: Double = 1.0 - math.acos(0.25) / math.Pi): Int = {
    require(bits >= 1 && baseTables >= 1 && pBit > 0 && pBit < 1)
    // minimal L with 1−(1−pBit^bits)^L ≥ the base point's collision
    // probability — exact by construction (a multiplicative
    // (1/pBit)^Δ scale-up undershoots by the ceil discretization);
    // the 1e-9 slack absorbs float error at bits == baseBits, where
    // the quotient is 8.000000x and must ceil to 8, not 9
    val baseCollide = 1.0 - math.pow(1.0 - math.pow(pBit, baseBits.toDouble), baseTables.toDouble)
    val l = math.ceil(
      math.log1p(-baseCollide) / math.log1p(-math.pow(pBit, bits.toDouble)) - 1e-9).toInt
    math.max(baseTables, math.min(128, l))
  }

  /** Recall-preserving table count under 1-bit MULTI-PROBE (round 13;
    * Lv et al. 2007 "Multi-probe LSH"): when every vector also probes
    * the `bits` buckets at Hamming distance 1 from its own signature, a
    * threshold pair collides in a table iff its signatures agree on all
    * bits OR differ in exactly one — per-table collision rises from
    * pBit^b to pBit^b + b·pBit^(b−1)·(1−pBit), an ≈(1 + b(1−p)/p)×
    * boost — so holding the SAME base collision probability as
    * `recommendedTables` needs ~that-factor fewer tables. At the
    * measured 10× operating point (bits=10) this is L=72 → L=9: an 8×
    * cut in signature work and bucket exchanges, bought with a
    * (bits+1)× probe-key fan-out on the candidate join's probe side
    * (keys only — the fan-out never carries vectors). Floor 2 (never a
    * single table — one bad table would be the whole pair stream); cap
    * 128 as in the base rule. */
  def recommendedTablesProbed(bits: Int, baseBits: Int = 6, baseTables: Int = 8,
                              pBit: Double = 1.0 - math.acos(0.25) / math.Pi,
                              baseProbed: Boolean = false): Int = {
    require(bits >= 1 && baseTables >= 1 && pBit > 0 && pBit < 1)
    def pT(b: Int): Double = math.pow(pBit, b.toDouble) +
      b * math.pow(pBit, (b - 1).toDouble) * (1.0 - pBit)
    // baseProbed: the base operating point itself ran multi-probe (the
    // search family's declared 4×4+4 — recommendedSearchPoint), so the
    // collision probability to hold is the PROBED one; the pair family's
    // base (6×8 home-only) keeps the home-only default
    val basePerTable = if (baseProbed) pT(baseBits) else math.pow(pBit, baseBits.toDouble)
    val baseCollide = 1.0 - math.pow(1.0 - basePerTable, baseTables.toDouble)
    val l = math.ceil(
      math.log1p(-baseCollide) / math.log1p(-pT(bits)) - 1e-9).toInt
    math.max(2, math.min(128, l))
  }

  /** Self-sizing operating point (tables, bits, probes) for the ANN
    * SEARCH family (q45/q220/q222) — the round-16 application of the
    * pair family's recommendedBits/recommendedTablesProbed pattern to
    * the last hardcoded point (round-15 verdict #4: a fixed 4×4+4
    * under-buckets at 100× corpus).
    *
    * bits: occupancy-driven at the SEARCH target (~8 candidates per
    * bucket — per-query candidate cost is L·(1+probes)·n/2^bits, so
    * bits must grow with log₂(n) to keep a query's verify work flat).
    * probes = bits: the full 1-flip XOR neighborhood, query-side only —
    * fan-out rides the broadcast-small query frame, never the corpus.
    * tables: minimal L holding the DECLARED r15 base point's collision
    * probability (4 tables × 4 bits + 4 probes — recall@10 0.940
    * measured at r13, RecallSpec floor 0.70) under multi-probe, i.e.
    * recommendedTablesProbed at the search base. The 128-table cap is
    * the same shard-first contract as the pair family. */
  def recommendedSearchPoint(corpusSize: Long): (Int, Int, Int) = {
    val bits = recommendedBits(corpusSize, targetOccupancy = 8)
    val tables = recommendedTablesProbed(bits, baseBits = 4, baseTables = 4,
      baseProbed = true)
    (tables, bits, bits)
  }

  /** Deterministic unit-free hyperplanes: numTables × bitsPerTable × dim. */
  def hyperplanes(dim: Int, numTables: Int, bitsPerTable: Int, seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numTables)(Seq.fill(bitsPerTable)(Array.fill(dim)(rng.nextGaussian())))
  }

  /** Bucket id of `vec` in one table: Σ (dot(vec, plane_b) >= 0) << b —
    * the composed REFERENCE form (HOF dot per plane); hot paths go
    * through [[allBuckets]]'s native expression, whose sign decisions
    * NativeExprPropSpec pins against this spelling. */
  def bucketFor(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(dot(vec, typedLit(p.toSeq)) >= 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (table, bucket) pairs for a vector across all tables, as array<long>
    * indexed by table. Round 16: ONE native expression
    * (graft.functions.GaussianBuckets) — the composed per-plane HOF form
    * allocated two arrays per plane per row (measured 4.26 s vs 0.32 s
    * against the portable twin at the self-sized q45 point) and
    * outgrows the 64 KB codegen method limit at wide rule points. */
  def allBuckets(vec: Column, planes: Seq[Seq[Array[Double]]]): Column =
    graft.functions.GaussianBuckets.column(vec, planes)

  /** Exact cosine top-k of `corpus` for each row of `queries`.
    * Output: (query_id, vec_id, sim, rank), rank 1..k per query. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, queryIdCol: String, queryVecCol: String,
                     k: Int): DataFrame = {
    val joined = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(queries.select(col(queryIdCol), col(queryVecCol))))
      .filter(col(queryIdCol) =!= col(idCol)) // a vector is trivially its own neighbor
      .withColumn("sim", fastCosine(corpus, col(vecCol), col(queryVecCol)))
    val w = Window.partitionBy(queryIdCol).orderBy(col("sim").desc, col(idCol))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol).as("query_id"), col(idCol).as("vec_id"), col("sim"), col("rank"))
  }

  /** LSH-bucketed approximate top-k. Same output shape as bruteForceTopK;
    * recall < 1 by construction, tunable via numTables/bitsPerTable.
    *
    * `probes` > 0 enables QUERY-SIDE multi-probe (Lv et al. 2007 — the
    * search-shaped use): each query additionally probes the buckets at
    * Hamming distance 1 in the first `probes` signature bits (full XOR
    * flips, not the pair-gen path's directional ones — search has no
    * second orientation: only the query probes), so a near neighbor is
    * found when the signatures differ in ≤ 1 bit. The same recall then
    * needs fewer TABLES, and tables are what the CORPUS side pays for —
    * its bucket stream is n×L keys while the probe fan-out rides the
    * broadcast-small query side. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, queryIdCol: String, queryVecCol: String,
              k: Int, numTables: Int = 4, bitsPerTable: Int = 8,
              dim: Int = 64, seed: Long = 42L, probes: Int = 0,
              maxBucketSize: Int = TextDedup.DefaultMaxBucketSize): DataFrame = {
    require(probes <= bitsPerTable,
      s"probes ($probes) beyond the $bitsPerTable-bit signature flip bits no bucket key carries")
    val planes = hyperplanes(dim, numTables, bitsPerTable, seed)
    // Keys-only candidate generation: the bucket join and the distinct
    // carry (query_id, vec_id) ids, never the vectors (the narrow-band
    // discipline of embeddingNearDupPairs). The query side is small by
    // contract → broadcast at both the bucket join and the re-rank join,
    // so the corpus never shuffles; only candidate ids do.
    // Round 16: corpus-side posting lists are CAPPED per (table, bucket)
    // — the phashTopK discipline: a degenerate bucket (near-identical
    // vectors keying together) otherwise multiplies EVERY query probing
    // it; its members remain reachable through their other tables.
    def withBuckets(df: DataFrame, id: String, vec: String, aId: String) =
      df.select(col(id).as(aId),
          posexplode(allBuckets(col(vec), planes)).as(Seq("__table", "__bucket")))
    // corpus keys referenced twice (cap aggregate + probe join) — the
    // lineage cut was A/B'd and rejected on measurement, same negative
    // receipt as lshAnnIndex (round-17 ADVICE #4, BASELINE.md)
    val cAll = withBuckets(corpus, idCol, vecCol, "vec_id")
    val eligible = cAll.groupBy("__table", "__bucket")
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucketSize)
      .select("__table", "__bucket")
    val c = cAll.join(eligible, Seq("__table", "__bucket"))
    val qHome = withBuckets(queries, queryIdCol, queryVecCol, "query_id")
    val q =
      if (probes <= 0) qHome
      else qHome.select(col("query_id"), col("__table"),
        explode(array((col("__bucket") +: (0 until probes).map(j =>
          col("__bucket").bitwiseXOR(lit(1L << j)))): _*)).as("__bucket"))
    val candidates = c.join(broadcast(q), Seq("__table", "__bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
      .distinct()
    val cv = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cvec"))
    val qv = queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qvec"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    candidates
      .join(cv, Seq("vec_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("sim", fastCosine(corpus, col("__cvec"), col("__qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer
    * alternative to hyperplane LSH. `nlist` centroids are chosen as a
    * deterministic sample of the corpus (k-means would refine them; the
    * sampled quantizer keeps the operator dependency-free and is the
    * standard bootstrap), every vector is assigned to its nearest
    * centroid, and a query probes only the `nprobe` nearest lists.
    *
    * The centroid set stays a DataFrame end to end: list assignment is a
    * broadcast join + max_by aggregation whose partial (map-side) phase
    * collapses each vector's nlist candidates before the shuffle — never a
    * collect() into a plan literal, so nlist can grow with the corpus
    * (256, 4096, …) with zero plan/codegen growth (round-3 verdict item
    * 2). A list is named by its centroid's id; ties on cosine break to the
    * lowest centroid id, matching the former stable-sort behavior.
    * Shuffle is one pass of (vec_id, vector, list); the query side
    * broadcasts. Recall/latency tune via nlist and nprobe. */
  /** Distributed Lloyd (k-means) refinement for the IVF coarse quantizer.
    * Seeds from the deterministic lowest-id sample, then `iters` rounds of
    * assign (broadcast join + max_by — the same nlist-independent shape as
    * ivfTopK's list assignment) and re-center (per-dimension mean via
    * posexplode + avg, rebuilt with a sorted collect_list of `dim` floats
    * per centroid — `dim` rows per list, metadata-sized). A centroid keeps
    * its seed's id as a stable list label; a list that empties simply
    * disappears (k shrinks, never crashes). Each round is two shuffles of
    * (vec, list) / (list, dim, mean) — linear in corpus size. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 2): DataFrame = {
    graft.functions.CosineSim.register(corpus.sparkSession)
    var centroids = corpus.select(col(idCol).cast("long").as("__cid"), col(vecCol).as("__cvec"))
      .orderBy("__cid").limit(k)
    for (_ <- 1 to iters) {
      val assigned = corpus.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
        .crossJoin(broadcast(centroids))
        .groupBy("__vid")
        .agg(first(col("__v")).as("__v"),
          max_by(col("__cid"),
            struct(call_function("cosine_sim", col("__v"), col("__cvec")).as("s"),
              (-col("__cid")).as("tb"))).as("__list"))
      centroids = assigned
        .select(col("__list"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy("__list", "__dim").agg(avg("__x").as("__m"))
        .groupBy("__list")
        .agg(transform(array_sort(collect_list(struct(col("__dim"), col("__m")))),
          x => x.getField("__m").cast("float")).as("__cvec"))
        .select(col("__list").as("__cid"), col("__cvec"))
    }
    centroids
  }

  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, queryIdCol: String, queryVecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              refineIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.CosineSim.register(spark)
    // refineIters = 0 keeps the deterministic id-sample quantizer (cheap,
    // reproducible — the declared q53 form); > 0 runs Lloyd refinement for
    // real clustered corpora, same downstream plan either way
    val base =
      if (refineIters > 0) kmeansCentroids(corpus, idCol, vecCol, nlist, refineIters)
      else corpus.select(col(idCol).cast("long").as("__cid"), col(vecCol).as("__cvec"))
        .orderBy("__cid").limit(nlist)
    val centroids = broadcast(base)
    val assigned = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"))
      .crossJoin(centroids)
      .groupBy("vec_id")
      .agg(first(col("__cv")).as("__cv"),
        max_by(col("__cid"),
          struct(call_function("cosine_sim", col("__cv"), col("__cvec")).as("s"),
            (-col("__cid")).as("tb"))).as("__list"))
    val pw = Window.partitionBy("query_id").orderBy(col("__s").desc, col("__cid"))
    val probed = queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qv"))
      .crossJoin(centroids)
      .withColumn("__s", call_function("cosine_sim", col("__qv"), col("__cvec")))
      .withColumn("__r", row_number().over(pw))
      .filter(col("__r") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__cid").as("__list"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    assigned.join(broadcast(probed), Seq("__list"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", call_function("cosine_sim", col("__cv"), col("__qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
  }

  /** Fixed-point quantization: floor(x · 10^4) per component, BIGINT.
    * float→double widening is exact and floor is rounding-mode-free, so
    * Spark and any IEEE-double SQL engine derive the IDENTICAL integer
    * vector from the same parquet floats — what makes similarity scores
    * hash-comparable cross-engine (float cosine never is: summation order
    * and ulp drift differ). For unit-norm embeddings the integer dot
    * product is a monotone stand-in for cosine up to quantization error. */
  def quantize(vec: Column, scale: Int = 10000): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Integer dot product of two quantized vectors. |x_i| ≤ scale ⇒ each
    * term ≤ scale², 64 dims ≈ 6.4e9 ≪ Long.Max — no ANSI overflow.
    *
    * Round 13: resolves to the NATIVE fused-loop expression
    * (graft.functions.IntDot) — the integer-family hot paths evaluate
    * this millions of times per action and the interpreted HOF chain was
    * the dominant per-row cost at 10× (the CosineSim lesson applied).
    * Value-identical to [[intDotHof]] incl. null edges
    * (NativeExprPropSpec). Callers outside this object must register the
    * function on their session first (graft.functions.IntDot.register —
    * Tables.register does it for every gate path; the operators here do
    * it themselves). */
  def intDot(a: Column, b: Column): Column = call_function("int_dot", a, b)

  /** The composed HOF spelling of [[intDot]] — kept as the
    * registration-free reference form the property spec pins the native
    * expression against. */
  def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Lazy per-session registration of the native integer-dot expression
    * — the fastCosine pattern; idempotent, called at every operator
    * entry that has a frame in hand. */
  private def registerIntDot(df: DataFrame): Unit =
    graft.functions.IntDot.register(df.sparkSession)

  /** Exact top-k by quantized integer dot product — the hash-checkable
    * twin of `bruteForceTopK` (float cosine stays the production scorer;
    * this is the cross-engine-verifiable form, and the shape is identical:
    * broadcast query set, one corpus scan, narrow rank shuffle).
    * Output: (query_id, vec_id, score BIGINT, rank). */
  def bruteForceTopKInt(corpus: DataFrame, idCol: String, vecCol: String,
                        queries: DataFrame, queryIdCol: String, queryVecCol: String,
                        k: Int, scale: Int = 10000): DataFrame = {
    registerIntDot(corpus)
    val c = corpus.select(col(idCol), quantize(col(vecCol), scale).as("__cq"))
    val q = queries.select(col(queryIdCol), quantize(col(queryVecCol), scale).as("__qq"))
    val w = Window.partitionBy(queryIdCol).orderBy(col("score").desc, col(idCol))
    c.crossJoin(broadcast(q))
      .filter(col(queryIdCol) =!= col(idCol))
      .withColumn("score", intDot(col("__cq"), col("__qq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol).as("query_id"), col(idCol).as("vec_id"), col("score"), col("rank"))
  }

  /** LSH-bucketed approximate top-k with PORTABLE integer scoring end to
    * end — the hash-checkable twin of `lshTopK` (the q44/q53 twin
    * pattern applied to the last rows-only ANN entry): quantized
    * vectors, ±1 integer hyperplane buckets (sign decisions exact
    * cross-engine), query-side full-XOR multi-probe (search has no
    * second orientation — only the broadcast-small query side fans
    * out), BIGINT dot scoring, ties to the lower vec_id. Same keys-only
    * candidate plan as `lshTopK`: the corpus never shuffles; only
    * (query_id, vec_id) candidate ids do. */
  def lshTopKInt(corpus: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, queryIdCol: String, queryVecCol: String,
                 k: Int, numTables: Int = 4, bitsPerTable: Int = 4,
                 dim: Int = 64, seed: Long = 11L, probes: Int = 4,
                 scale: Int = 10000,
                 maxBucketSize: Int = TextDedup.DefaultMaxBucketSize): DataFrame = {
    val (cq, cKeys) = lshAnnIndex(corpus, idCol, vecCol, numTables,
      bitsPerTable, dim, seed, scale, maxBucketSize)
    lshTopKIntAgainstIndex(cq, cKeys, queries, queryIdCol, queryVecCol,
      k, numTables, bitsPerTable, dim, seed, probes, scale)
  }

  /** The CORPUS side of the portable LSH ANN, factored as a persisted
    * index: (quantized frame (vec_id, __qv), bucket keys (vec_id, __t,
    * __bkt)). A deployment builds this once per corpus snapshot (and
    * lineage-cuts / persists it); the streaming twin (q222) serves every
    * query micro-batch against the SAME materialized frames instead of
    * re-deriving signatures per trigger. */
  def lshAnnIndex(corpus: DataFrame, idCol: String, vecCol: String,
                  numTables: Int = 4, bitsPerTable: Int = 4,
                  dim: Int = 64, seed: Long = 11L,
                  scale: Int = 10000,
                  maxBucketSize: Int = TextDedup.DefaultMaxBucketSize): (DataFrame, DataFrame) = {
    val planes = portableHyperplanes(dim, numTables, bitsPerTable, seed)
    val cq = portableQuantized(corpus, idCol, vecCol, scale)
      .select(col(idCol).as("vec_id"), col("__qv"))
    // capped at BUILD time (round 16 — the phashTopK posting-list
    // discipline): an over-cap bucket's keys never enter the index, so
    // no query can fan out on a degenerate cluster; its members stay
    // reachable through their other tables. Mirrored in the q220/q222
    // DuckDB texts so drops agree cross-engine when the cap fires.
    // the key subtree feeds BOTH the cap aggregate and the join probe
    // side — the q82 cut rule was A/B'd here and REJECTED on measurement
    // (round-17 ADVICE #4, RegimeProbe ann stage at the 10x fixture's
    // self-sized 128x12+12 point: 3.53 s min-of-3 re-derived vs 3.68 s
    // cut — native-PortableBuckets signatures re-derive as cheaply as
    // the 2.56M-row key materialization reads back; the one-shot wall is
    // candidate-join/rank-bound). Deployment callers persist the index
    // anyway (the scaladoc contract); re-derivation stays.
    val keys = portableBucketKeys(cq, "vec_id", planes)
    val eligible = keys.groupBy("__t", "__bkt")
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucketSize)
      .select("__t", "__bkt")
    (cq, keys.join(eligible, Seq("__t", "__bkt")))
  }

  /** Query-side top-k against a prebuilt [[lshAnnIndex]]: query
    * signatures + full-XOR probes (broadcast-small by contract), the
    * keys-only candidate join, integer-dot ranking. Per-query output is
    * independent of how queries are batched (the corpus side is static
    * and no cross-query state exists), so a streaming caller scoring
    * each micro-batch gets exactly the batch answer — the q222
    * streaming ≡ batch contract. */
  def lshTopKIntAgainstIndex(cq: DataFrame, cKeys: DataFrame,
                             queries: DataFrame, queryIdCol: String, queryVecCol: String,
                             k: Int, numTables: Int = 4, bitsPerTable: Int = 4,
                             dim: Int = 64, seed: Long = 11L, probes: Int = 4,
                             scale: Int = 10000): DataFrame = {
    require(probes <= bitsPerTable,
      s"probes ($probes) beyond the $bitsPerTable-bit signature flip bits no bucket key carries")
    registerIntDot(queries)
    val planes = portableHyperplanes(dim, numTables, bitsPerTable, seed)
    val qq = queries.select(col(queryIdCol).as("query_id"),
      quantize(col(queryVecCol), scale).as("__qq"))
    val qHome = portableBucketKeys(
      qq.select(col("query_id"), col("__qq").as("__qv")), "query_id", planes)
    val qKeys =
      if (probes <= 0) qHome
      else qHome.select(col("query_id"), col("__t"),
        explode(array((col("__bkt") +: (0 until probes).map(j =>
          col("__bkt").bitwiseXOR(lit(1L << j)))): _*)).as("__bkt"))
    val candidates = cKeys.join(broadcast(qKeys), Seq("__t", "__bkt"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    candidates
      .join(cq.select(col("vec_id"), col("__qv").as("__cv")), Seq("vec_id"))
      .join(broadcast(qq), Seq("query_id"))
      .withColumn("score", intDot(col("__cv"), col("__qq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "score", "rank")
  }

  /** IVF top-k with quantized integer scoring end to end (assignment,
    * probe, and final rank all on BIGINT dot products) — the
    * hash-checkable twin of `ivfTopK`, replicable exactly in any SQL
    * engine. Same nlist-independent plan: centroids are a broadcast
    * frame, assignment a broadcast join + max_by. */
  def ivfTopKInt(corpus: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, queryIdCol: String, queryVecCol: String,
                 k: Int, nlist: Int = 16, nprobe: Int = 4,
                 scale: Int = 10000): DataFrame = {
    registerIntDot(corpus)
    val cq = corpus.select(col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol), scale).as("__v"))
    val centroids = broadcast(cq.orderBy("vec_id").limit(nlist)
      .select(col("vec_id").as("__cid"), col("__v").as("__cvec")))
    val assigned = cq.crossJoin(centroids)
      .groupBy("vec_id")
      .agg(first(col("__v")).as("__v"),
        max_by(col("__cid"),
          struct(intDot(col("__v"), col("__cvec")).as("s"), (-col("__cid")).as("tb"))).as("__list"))
    val pw = Window.partitionBy("query_id").orderBy(col("__s").desc, col("__cid"))
    val probed = queries.select(col(queryIdCol).cast("long").as("query_id"),
        quantize(col(queryVecCol), scale).as("__qv"))
      .crossJoin(centroids)
      .withColumn("__s", intDot(col("__qv"), col("__cvec")))
      .withColumn("__r", row_number().over(pw))
      .filter(col("__r") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__cid").as("__list"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    assigned.join(broadcast(probed), Seq("__list"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", intDot(col("__v"), col("__qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "score", "rank")
  }

  /** Deterministic ±1 hyperplanes for the PORTABLE embedding-LSH twin:
    * with quantized integer vectors, sign(dot(qv, plane)) is exact
    * integer arithmetic any engine reproduces — unlike the production
    * Gaussian hyperplanes whose float dots can straddle zero differently
    * at the last ulp. |dot| ≤ 64·10^4 ≪ Long.Max. */
  def portableHyperplanes(dim: Int, tables: Int, bits: Int,
                          seed: Long = 11L): Seq[Seq[Array[Long]]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(if (rng.nextBoolean()) 1L else -1L)))
  }

  /** Portable embedding near-dup pairs: integer-quantized vectors, ±1
    * integer hyperplane buckets, integer-dot verification — the
    * hash-checkable twin of `embeddingNearDupPairs` (float cosine stays
    * the production scorer). Same single-pass bucketing shape: one
    * shuffle of (table, bucket, id, qv), in-bucket pairs by double
    * explode. `minScore` is the quantized-dot threshold (≈ cosine·10^8
    * for unit-norm inputs). Output: (id_a, id_b, score BIGINT). */
  /** Quantized-vector frame (id, __qv) — materialized in its own
    * projection: the bucket expressions reference __qv tables×bits times
    * (CollapseProject, cf. signatureFrame). */
  private[graft] def portableQuantized(df: DataFrame, idCol: String, vecCol: String,
                                scale: Int): DataFrame = {
    registerIntDot(df)
    df.select(col(idCol), quantize(col(vecCol), scale).as("__qv"))
  }

  /** One integer bucket id per table from the ±1 hyperplane sign bits of
    * a quantized frame's __qv column. */
  /** (table, bucket) key stream of the portable embedding-LSH bucketing —
    * the EXACT keys `portableEmbedPairs` pairs on, factored out so the
    * occupancy audit below and the pair generator can never drift.
    * Round 16: the signature is ONE native expression
    * (graft.functions.PortableBuckets — the constant plane matrix loops
    * inside compiled code) instead of tables × bits inlined
    * `when(intDot ≥ 0)` sums: the composed form's generated method
    * outgrew janino's 64 KB limit at the 100× rule point (bits 13 ×
    * tables 36), dropping the whole signature pass out of whole-stage
    * codegen exactly where it matters. Value-identical, incl. the
    * null/length-mismatch → key-0 edge (NativeExprPropSpec pins it). */
  private[graft] def portableBucketKeys(q: DataFrame, idCol: String,
                                 planes: Seq[Seq[Array[Long]]],
                                 carry: Seq[String] = Nil): DataFrame =
    q.select(col(idCol) +: carry.map(col) :+
      posexplode(graft.functions.PortableBuckets.column(col("__qv"), planes))
        .as(Seq("__t", "__bkt")): _*)

  /** Occupancy-ADAPTIVE sizing — the clustered-corpus guard the
    * size-only rule lacks (round-11 verdict: `recommendedBits` keys on
    * corpus COUNT, but a heavily clustered corpus can overload buckets
    * at any average occupancy, and the cap then silently drops them —
    * recall collapse with no signal). Starts at the count-derived width
    * and widens one bit at a time until the MAX bucket occupancy fits
    * `maxOccupancy`, or the width cap (24) is reached — in which case
    * the residual oversize buckets are sign-identical vector clusters
    * no hyperplane count separates (genuine boilerplate;
    * `DefaultMaxBucketSize`'s job, auditable via
    * `portableEmbedBucketSizes`). Each probe is ONE aggregate over the
    * keys-only bucket stream (no vectors move) — a bounded setup cost a
    * production pipeline pays once per corpus snapshot. The DECLARED
    * q84/q97 entries keep the pure count rule because their DuckDB
    * replays interpolate a static width; production callers wanting the
    * clustered-corpus guarantee size with this — and must pair the
    * returned width with `recommendedTables(bits)` when generating
    * pairs, or the extra bits silently trade recall for the occupancy
    * they bought (the measured round-12 failure mode). */
  def adaptiveBits(corpus: DataFrame, idCol: String, vecCol: String,
                   targetOccupancy: Long = 32,
                   maxOccupancy: Long = TextDedup.DefaultMaxBucketSize / 2,
                   tables: Int = 8, dim: Int = 64, seed: Long = 11L,
                   scale: Int = 10000): Int = {
    val start = recommendedBits(corpus.count(), targetOccupancy)
    var bits = start
    while (bits < 24 && {
      val mx = portableEmbedBucketSizes(corpus, idCol, vecCol,
        tables, bits, dim, seed, scale).agg(max("n")).head().getLong(0)
      mx > maxOccupancy
    }) bits += 1
    bits
  }

  /** Occupancy audit for the portable embedding-LSH buckets: (t, bkt, n)
    * per bucket — what DriftGuardSpec asserts margins on after the driver
    * regenerates the testdata (a clustered or bigger corpus shows up here
    * as occupancy approaching the cap — the silent recall-drop /
    * quadratic-work failure mode, cf. TextDedup.portableOversizeBuckets).
    * Aggregate-only; never collects bucket members. */
  def portableEmbedBucketSizes(corpus: DataFrame, idCol: String, vecCol: String,
                               tables: Int = 8, bits: Int = 6,
                               dim: Int = 64, seed: Long = 11L,
                               scale: Int = 10000): DataFrame = {
    val planes = portableHyperplanes(dim, tables, bits, seed)
    portableBucketKeys(portableQuantized(corpus, idCol, vecCol, scale), idCol, planes)
      .groupBy(col("__t").as("t"), col("__bkt").as("bkt"))
      .agg(count(lit(1)).as("n"))
  }

  /** The DIRECTIONAL 1-bit-flip probe key stream: each (t, bkt, id)
    * home key fans out to its own bucket plus the buckets obtained by
    * flipping each UNSET bit among the first `probes` signature bits to
    * 1 (probes = bits ⇒ the full directional 1-flip neighborhood of Lv
    * et al. 2007). Directionality (0→1 only) means a Hamming-1 pair is
    * probed by exactly ONE member — the one holding 0 on the differing
    * bit — instead of both, halving the candidate stream the verifier
    * pays for at identical Hamming-≤1 coverage; a Hamming-0 pair pairs
    * through the shared home bucket as before. Cap consequence
    * (mirrored in the DuckDB texts): a ham-1 pair survives iff the
    * 1-side member's home bucket is under the cap; a ham-0 pair iff
    * the shared bucket is. Keys only — ≈(probes/2 + 1)× key rows,
    * never a vector. */
  private def probedBucketKeys(keys: DataFrame, idCol: String,
                               probes: Int): DataFrame = {
    val flips = (0 until probes).map { j =>
      when(col("__bkt").bitwiseAND(lit(1L << j)) === 0L,
        col("__bkt").bitwiseOR(lit(1L << j)))
    }
    keys.select(col(idCol), col("__t"),
      explode(filter(array((col("__bkt") +: flips): _*), x => x.isNotNull))
        .as("__bkt"))
  }

  /** Row-count bound under which the verification join-back broadcasts
    * the quantized vector frame (≈53 MB of array<long> payload at the
    * bound) and verifies candidate DUPLICATES map-side, deduplicating
    * only the ham-≤1 survivors: the 10× profile (ProfileQ84) measured
    * the pre-verification DISTINCT over the 21M-candidate key stream as
    * the dominant cost (29.5 s → 11.6 s end-to-end without it), while
    * duplicate verification through a broadcast join is pure codegen.
    * Past the bound the operator keeps the distinct-first shuffle shape
    * — there the distinct is load-bearing: it is what keeps the
    * payload-carrying join intermediate (candidates × vector bytes)
    * minimal when the vector side no longer broadcasts. The found SET
    * is identical in both regimes (dedup before or after exact
    * verification commutes), so oracles and recall receipts are
    * regime-independent. */
  // Round 15: the fused IntDotLookup verify broadcasts the frame ONCE
  // where the former two-join shape shipped it TWICE, so the SAME
  // measured r13 memory envelope (2 × 100k rows × 64 dims × 8 B ≈
  // 106 MB peak) now admits 200k rows — the regime bound doubles with
  // zero new memory exposure (receipt: ProfileQ84 at 100×, BASELINE.md).
  // The budget is BYTES of packed vector payload, representation-
  // independent; the per-row cost is what the representation sets.
  val BroadcastVerifyBudgetBytes = 200000L * 64 * 8

  /** The row bound DERIVED from the vector dimension (round-14 verdict
    * #5: the former flat 100000L silently encoded dim=64 — at dim=512
    * the same row count is 8× the broadcast payload). rows ≈ budget /
    * (dim × 4 bytes per PACKED component): round 17 (verdict #5) stores
    * the verify maps as Array[Int] — ±10⁴-scaled components are
    * lossless in 4 B (`IntDotLookup.pack` guards it) — so the SAME
    * measured byte envelope admits 2× the rows of the r15 Array[Long]
    * representation: 400k at dim 64 (RegimeProbe re-measured, see
    * BASELINE.md round 17). */
  def broadcastVerifyMaxRows(dim: Int): Long = {
    require(dim > 0, s"dim must be positive, got $dim")
    BroadcastVerifyBudgetBytes / (dim * 4L)
  }

  /** The dim=64 point of [[broadcastVerifyMaxRows]] (the corpus'
    * embedding contract — DriftGuard pins it); kept as the named
    * constant docs and specs reference. */
  val BroadcastVerifyMaxRows: Long = broadcastVerifyMaxRows(64)

  /** Raw-candidate rows per dedup shuffle partition in the shuffle
    * verification regime — the operating point of the round-13
    * measurement (ProfileQ84: a 44.9M-row raw stream deduped at 128
    * partitions ≈ 350k rows each cost 12.8–13.6 s where the session
    * default's 32 partitions cost ~24 s: the partial HashAggregate over
    * a nearly-unique 2-long key stream thrashes when partitions carry
    * millions of mostly-distinct keys). */
  val DedupTargetRowsPerPartition = 350000L

  /** EXACT keys-only size of the raw (pre-dedup) candidate stream the
    * probed generator will emit: Σ over capped home buckets (t, k) of
    * probesInto(t, k) × homeSize(t, k), where probesInto counts the home
    * keys of k itself plus the directional donors — buckets at one
    * CLEARED bit among the first `probes` bits of k (a key at k′ probes
    * k iff k = k′ OR (1<<j) for an unset j < probes of k′). This is the
    * join-size inner product `Sketches.countMinJoinSize` (q152)
    * estimates from two CMS sketches — exact here, and cheaper than the
    * sketches, because the per-bucket count frame (≤ tables·min(2^bits,
    * n) rows) is already grouped: ONE keys-only aggregation pass, then
    * arithmetic on the tiny bucket frame. (Self-matches the generator's
    * `pid ≠ hid` filter drops are included — the figure is a ≤1%-slack
    * upper bound for partition sizing, not an emitted-row count.) */
  private[graft] def estimatedRawCandidates(keys: DataFrame, probes: Int,
                                            maxBucketSize: Int): Long = {
    val bc = keys.groupBy("__t", "__bkt").agg(count(lit(1)).as("__n"))
    val home = bc.filter(col("__n") <= maxBucketSize)
      .select(col("__t"), col("__bkt"), col("__n").as("__h"))
    val donors = home.select(col("__t"), col("__h"),
      explode(filter(
        array((col("__bkt") +: (0 until probes).map(j =>
          when(col("__bkt").bitwiseAND(lit(1L << j)) =!= 0L,
            col("__bkt").bitwiseXOR(lit(1L << j))))): _*),
        x => x.isNotNull)).as("__bkt"))
    val est = donors.join(bc, Seq("__t", "__bkt"))
      .agg(sum(col("__h") * col("__n")).as("__est")).head()
    if (est.isNullAt(0)) 0L else est.getLong(0)
  }

  /** Dedup shuffle-partition count for the shuffle regime's pre-verify
    * distinct, chosen BY CODE from the estimated raw candidate-stream
    * size (round-14: the r13 BASELINE measured the session-default
    * partitioning ~1.8× worse on the 10× stream and left the knob as
    * documentation — this wires it). Floor at the session default
    * (small streams keep the session's sizing), cap 2048 (past that a
    * 100-TB deployment tunes the cluster-wide shuffle sizing, not one
    * operator's repartition). */
  def dedupPartitionsFor(estRows: Long, sessionDefault: Int): Int = {
    val byRows = math.ceil(estRows.toDouble / DedupTargetRowsPerPartition).toInt
    math.min(2048, math.max(sessionDefault, byRows))
  }

  /** DISTINCT within-bucket id pairs of a (id, __t, __bkt) key stream —
    * the home-only candidate generator (probes = 0), shared by the
    * portable and float pair pipelines. */
  private def homeOnlyPairs(keys: DataFrame, idCol: String,
                            maxBucketSize: Int): DataFrame =
    keys
      .groupBy("__t", "__bkt")
      .agg(collect_list(col(idCol)).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucketSize))
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()

  /** RAW (with multiplicity) multi-probe candidate pairs of a
    * (id, __t, __bkt) key stream — directional probe keys joined to the
    * capped home buckets; the dedup regime (before vs after exact
    * verification — the found set commutes) is the caller's decision.
    * Shared by the portable and float pair pipelines.
    *
    * MULTI-PROBE (round 13, Lv et al. 2007): a pair collides in a table
    * iff its signatures differ in ≤ 1 bit — each doc's probe keys (home
    * + DIRECTIONAL 0→1 flips, probedBucketKeys) join the capped HOME
    * buckets, so the same threshold recall needs ~(1 + bits(1−p)/p)×
    * fewer tables (recommendedTablesProbed) while each ham-1 pair costs
    * the verifier exactly ONE candidate row (probed by its 0-bit member
    * alone). Home lists of size 1 stay eligible: a singleton bucket can
    * still receive probes from neighbors. */
  private[graft] def probedRawPairs(keys: DataFrame, idCol: String,
                             maxBucketSize: Int, probes: Int,
                             broadcastHome: Boolean = false): DataFrame = {
    val home = keys
      .groupBy("__t", "__bkt")
      .agg(collect_list(col(idCol)).as("__ids"))
      .filter(size(col("__ids")) <= maxBucketSize)
    // broadcastHome: in the bounded regime the capped home lists carry
    // ≤ n×L ids total (metadata-sized by the regime bound) — forcing the
    // broadcast keeps the candidate join map-side at data sizes where
    // AQE's post-aggregate size estimate would fall back to a shuffle
    // join (measured at 10×: the probe stream then flows through ONE
    // codegen stage from probe-key explode to verified score)
    probedBucketKeys(keys, idCol, probes)
      .join(if (broadcastHome) broadcast(home) else home, Seq("__t", "__bkt"))
      .select(col(idCol).as("__pid"), explode(col("__ids")).as("__hid"))
      .filter(col("__pid") =!= col("__hid"))
      .select(least(col("__pid"), col("__hid")).as("id_a"),
        greatest(col("__pid"), col("__hid")).as("id_b"))
  }

  /** Driver-side packed verify map over one or more (id, __qv) frames —
    * toLocalIterator build (the driver holds the HashMap plus ONE
    * partition of rows at a time, never a collect()'d Array[Row] copy)
    * into the Array[Int] representation (`IntDotLookup.pack`). Callers
    * bound total rows by the broadcast regime's contract
    * (`broadcastVerifyMaxRows`). */
  private[graft] def packedVerifyMap(frames: Seq[DataFrame]): java.util.HashMap[java.lang.Long, Array[Int]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Int]]()
    frames.foreach(_.toLocalIterator().forEachRemaining { r =>
      m.put(r.getLong(0), graft.functions.IntDotLookup.pack(r.getSeq[Long](1)))
    })
    m
  }

  /** Fused broadcast-lookup verification of a raw (id_a, id_b) candidate
    * stream: two hash lookups + the integer dot per candidate inside
    * whole-stage codegen, threshold filter, survivor-set distinct (dedup
    * commutes with exact verification — the q84 two-regime rule). */
  private[graft] def fusedVerify(cands: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[java.util.HashMap[java.lang.Long, Array[Int]]],
      minScore: Long): DataFrame =
    cands
      .select(col("id_a"), col("id_b"),
        graft.functions.IntDotLookup.column(col("id_a"), col("id_b"), bc).as("score"))
      .filter(col("score") >= minScore)
      .distinct()

  /** `eagerJob` (r18, the r16-ADVICE deferred-map item): run this call as
    * ONE bounded job — materialize the (tiny) verified pair output
    * eagerly and destroy the call's verify-map broadcast + cut-key blocks
    * before returning, so a sharded runner holding many such calls keeps
    * exactly ONE job's map alive at a time instead of all of them (the
    * persisted runner's per-job discipline without the parquet
    * round-trip). Pair set identical (ShardedPairsSpec). */
  def portableEmbedPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         minScore: Long, tables: Int = 8, bits: Int = 6,
                         dim: Int = 64, seed: Long = 11L,
                         scale: Int = 10000,
                         maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                         probes: Int = 0, corpusRowsHint: Long = -1L,
                         eagerJob: Boolean = false): DataFrame = {
    require(probes <= bits,
      s"probes ($probes) beyond the $bits-bit signature flip bits no bucket key carries")
    val planes = portableHyperplanes(dim, tables, bits, seed)
    val q = portableQuantized(corpus, idCol, vecCol, scale)
    // Bucketing fans out KEYS ONLY — compact (t, bkt, id) triples, never
    // the vectors: carrying __qv here duplicates every vector tables×
    // through the corpus-wide bucket exchange and leaves collected buckets
    // holding m full vectors (the shape class portablePairStats was cured
    // of in round 6). Vectors are joined back for surviving candidate
    // pairs only (candidates ≪ corpus × tables); re-deriving __qv on the
    // join sides is one cheap floor-cast pass over a pruned scan.
    // Bucket-size cap: degenerate-bucket guard (cf.
    // TextDedup.DefaultMaxBucketSize), mirrored into the q84/q97 DuckDB text
    val keys = portableBucketKeys(q, idCol, planes)
    def verify(pairs: DataFrame, useBroadcast: Boolean): DataFrame = {
      def side(df: DataFrame) = if (useBroadcast) broadcast(df) else df
      pairs
        .join(side(q.select(col(idCol).as("id_a"), col("__qv").as("__va"))), Seq("id_a"))
        .join(side(q.select(col(idCol).as("id_b"), col("__qv").as("__vb"))), Seq("id_b"))
        .select(col("id_a"), col("id_b"), intDot(col("__va"), col("__vb")).as("score"))
        .filter(col("score") >= minScore)
    }
    // eagerJob: materialize the (survivor-sized) verified output now and
    // release the call's transient state before returning — the sharded
    // runner's one-map-alive-at-a-time discipline
    def finishJob(out: DataFrame, release: () => Unit): DataFrame =
      if (!eagerJob) out
      else {
        val cut = Checkpoints.cut(out, eager = true)
        release()
        cut
      }
    if (probes <= 0)
      finishJob(
        verify(homeOnlyPairs(keys, idCol, maxBucketSize), useBroadcast = false),
        () => ())
    else {
      if (corpusRowsHint >= 0 && corpusRowsHint <= broadcastVerifyMaxRows(dim)) {
        // broadcast regime (rebuilt round 15): verify the duplicates
        // map-side through the FUSED broadcast-lookup expression
        // (graft.functions.IntDotLookup) and dedup the (tiny) survivor
        // set. The former two-BroadcastHashJoin verify shipped the
        // quantized frame TWICE and materialized two 64-long arrays
        // into every candidate row; now ONE broadcast of the regime-
        // bounded frame (collected exactly the way a BroadcastHashJoin
        // build side is) feeds two hash lookups + a fused dot per
        // candidate inside whole-stage codegen. The signature subtree
        // is cut once (it feeds both the home buckets and the probe
        // stream — the q82 lineage rule, formerly shuffle-regime-only),
        // and the capped home lists are force-broadcast, so the whole
        // candidate path is: one keys-only exchange (the home groupBy),
        // one map-side probe join, verify in the same stage, and one
        // survivor-sized distinct. ProfileQ84 receipts in BASELINE.md.
        val cutKeys = Checkpoints.cut(keys, eager = true)
        // Driver-heap budget at the regime bound (round-16 receipt in
        // BASELINE.md): the map is built from toLocalIterator — the
        // driver holds the HashMap plus ONE partition of rows at a time,
        // never a full collect()'d Array[Row] copy of the frame — and
        // the broadcast's serialized copy is the one unavoidable
        // transient double (TorrentBroadcast writes blocks then drops
        // the reference). The broadcast is TRACKED: serial harnesses
        // destroy it between entries (Broadcasts.destroyAll), so
        // finished entries don't pin ~100 MB maps for the session.
        // the broadcast handle is baked into the expression instance
        // directly (IntDotLookup.column) — no session-global registry
        // mutation, no analysis-ordering invariant (round-15 advice).
        // eagerJob destroys it itself before returning (the output is
        // materialized first), so it is deliberately NOT tracked there.
        val bc = corpus.sparkSession.sparkContext.broadcast(packedVerifyMap(Seq(q)))
        if (!eagerJob) Broadcasts.track(bc)
        finishJob(
          fusedVerify(
            probedRawPairs(cutKeys, idCol, maxBucketSize, probes, broadcastHome = true),
            bc, minScore),
          () => { bc.destroy(); Checkpoints.free(cutKeys) })
      } else {
        // shuffle regime: the pre-verify distinct is load-bearing (it
        // minimizes the payload-carrying join intermediate) and its
        // partition count is chosen by code from a keys-only size
        // estimate — see estimatedRawCandidates/dedupPartitionsFor.
        // The keys subtree (the signature passes) is referenced three
        // times here (estimate, home buckets, probe stream) — cut its
        // lineage once (the q82 rule: dominant subtree, N references;
        // measured 18.1 → 14.5 s at 10× — BASELINE.md round 14). At
        // production scale signatures are a persisted table (PLANS.md),
        // which plays the same role.
        val cutKeys = Checkpoints.cut(keys, eager = true)
        val parts = dedupPartitionsFor(
          estimatedRawCandidates(cutKeys, probes, maxBucketSize),
          corpus.sparkSession.sessionState.conf.numShufflePartitions)
        finishJob(
          verify(probedRawPairs(cutKeys, idCol, maxBucketSize, probes)
            .repartition(parts, col("id_a"), col("id_b")).distinct(),
            useBroadcast = false),
          () => Checkpoints.free(cutKeys))
      }
    }
  }

  /** Incremental embedding near-dup: candidate pairs between an EXISTING
    * vector corpus and an INCOMING batch — the embedding analogue of
    * `TextDedup.portableCrossPairStats` (same daily-crawl shape, same
    * guarantees): both sides bucketed with the SAME hyperplanes, combined
    * per-key occupancy capped, keys-only joins with the small incoming
    * side AQE-broadcast so the corpus never shuffles, vectors joined back
    * for surviving pairs only. Pair set equals `portableEmbedPairs` on
    * the concatenated corpus restricted to cross pairs (the q125 oracle).
    * Output: (id_a ∈ existing, id_b ∈ incoming, score BIGINT). */
  /** `combinedRowsHint` ≥ 0 and ≤ `broadcastVerifyMaxRows(dim)` routes
    * the verify through the fused broadcast lookup over ONE map of both
    * sides (the q84 broadcast-regime shape, round 16): candidates stay
    * raw (dedup commutes to the survivor set) and no payload-carrying
    * join or global pre-verify distinct forms — the branch the sharded
    * operator's cross jobs need to stay inside the per-job memory
    * envelope. Pair set identical either way (CrossRegimeSpec pins it). */
  def portableCrossEmbedPairs(existing: DataFrame, incoming: DataFrame,
                              idCol: String, vecCol: String,
                              minScore: Long, tables: Int = 8, bits: Int = 6,
                              dim: Int = 64, seed: Long = 11L,
                              scale: Int = 10000,
                              maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                              probes: Int = 0,
                              combinedRowsHint: Long = -1L,
                              eagerJob: Boolean = false): DataFrame = {
    val planes = portableHyperplanes(dim, tables, bits, seed)
    val qOld = portableQuantized(existing, idCol, vecCol, scale)
    val qNew = portableQuantized(incoming, idCol, vecCol, scale)
    // Cut each side's bucket-key stream once (r17 optimization round —
    // the q82 N-references rule at the same level portableEmbedPairs
    // cuts its probed `keys`): crossCandidatesRaw references each side
    // 2× (home-only: occupancy + join) or 3× (probed: occupancy + home
    // + probe stream), and every reference otherwise re-runs the
    // tables×-dot signature pass. Quantize stays un-cut — re-deriving
    // __qv on the verify side is the documented cheap floor-cast pass.
    // (The persisted sharded runner bypasses this path on purpose: its
    // jobs read keys from shard-partitioned parquet, already
    // materialized once.)
    val bOld = Checkpoints.cut(portableBucketKeys(qOld, idCol, planes), eager = false)
    val bNew = Checkpoints.cut(portableBucketKeys(qNew, idCol, planes), eager = false)
    val candsRaw = crossCandidatesRaw(bOld, bNew, idCol, maxBucketSize, probes)
    // dedup commutes with exact verification (the q84 two-regime rule),
    // so both branches return the identical pair SET: the default
    // dedups candidates first (minimizes the payload-join intermediate);
    // the hinted branch verifies raw candidates map-side through ONE
    // combined broadcast map and dedups the (tiny) survivor set.
    // eagerJob (r18): one-map-alive-at-a-time — see portableEmbedPairs
    def finishJob(out: DataFrame, release: () => Unit): DataFrame =
      if (!eagerJob) out
      else {
        val cut = Checkpoints.cut(out, eager = true)
        release()
        cut
      }
    if (combinedRowsHint >= 0 && combinedRowsHint <= broadcastVerifyMaxRows(dim)) {
      val bc = existing.sparkSession.sparkContext.broadcast(
        packedVerifyMap(Seq(qOld.select(col(idCol), col("__qv")),
          qNew.select(col(idCol), col("__qv")))))
      if (!eagerJob) Broadcasts.track(bc)
      finishJob(fusedVerify(candsRaw, bc, minScore),
        () => { bc.destroy(); Checkpoints.free(bOld); Checkpoints.free(bNew) })
    } else
      finishJob(
        candsRaw.distinct()
          .join(qOld.select(col(idCol).as("id_a"), col("__qv").as("__va")), Seq("id_a"))
          .join(qNew.select(col(idCol).as("id_b"), col("__qv").as("__vb")), Seq("id_b"))
          .select(col("id_a"), col("id_b"), intDot(col("__va"), col("__vb")).as("score"))
          .filter(col("score") >= minScore),
        () => { Checkpoints.free(bOld); Checkpoints.free(bNew) })
  }

  /** RAW cross-side candidate pairs of two bucketed key streams — the
    * (existing → id_a, incoming → id_b) generator shared by
    * [[portableCrossEmbedPairs]] and the sharded runners' cross jobs.
    * Combined-occupancy cap + directional probing; keys-only. */
  private[graft] def crossCandidatesRaw(bOld: DataFrame, bNew: DataFrame,
      idCol: String, maxBucketSize: Int, probes: Int): DataFrame = {
      if (probes <= 0) {
        val eligible = bOld.groupBy("__t", "__bkt").agg(count(lit(1)).as("__no"))
          .join(bNew.groupBy("__t", "__bkt").agg(count(lit(1)).as("__nn")), Seq("__t", "__bkt"))
          .filter(col("__no") + col("__nn") <= maxBucketSize)
          .select("__t", "__bkt")
        bOld.join(eligible, Seq("__t", "__bkt"))
          .select(col("__t"), col("__bkt"), col(idCol).as("id_a"))
          .join(bNew.select(col("__t"), col("__bkt"), col(idCol).as("id_b")), Seq("__t", "__bkt"))
          .select("id_a", "id_b")
      } else {
        // Multi-probe cross form — pair-set-equal BY CONSTRUCTION to the
        // probed symmetric pipeline on the concatenated corpus restricted
        // to cross pairs (the q125 oracle identity): the cap is the
        // COMBINED home-bucket occupancy (= the symmetric pipeline's
        // home-bucket size), and with DIRECTIONAL probing a ham-1 cross
        // pair is found by exactly one orientation (its 0-bit member
        // probing the 1-side's home) — the two probe-into-home joins
        // are unioned so both orientations are available, whichever
        // side holds the 0 bit. Keys-only throughout.
        val occ = bOld.select("__t", "__bkt").unionAll(bNew.select("__t", "__bkt"))
          .groupBy("__t", "__bkt").agg(count(lit(1)).as("__n"))
        val okOld = bOld.join(occ.filter(col("__n") <= maxBucketSize), Seq("__t", "__bkt"))
          .select(col("__t"), col("__bkt"), col(idCol).as("id_a"))
        val okNew = bNew.join(occ.filter(col("__n") <= maxBucketSize), Seq("__t", "__bkt"))
          .select(col("__t"), col("__bkt"), col(idCol).as("id_b"))
        val prOld = probedBucketKeys(bOld, idCol, probes)
          .select(col("__t"), col("__bkt"), col(idCol).as("id_a"))
        val prNew = probedBucketKeys(bNew, idCol, probes)
          .select(col("__t"), col("__bkt"), col(idCol).as("id_b"))
        prNew.join(okOld, Seq("__t", "__bkt")).select("id_a", "id_b")
          .unionAll(prOld.join(okNew, Seq("__t", "__bkt")).select("id_a", "id_b"))
      }
  }

  /** SHARD-FIRST portable embedding near-dup (round 16, verdict #3 —
    * the documented 100-TB policy as code): past
    * `broadcastVerifyMaxRows` the monolithic shuffle regime's
    * distinct-first plan pays one global exchange of the ~n^1.79 raw
    * candidate stream (measured: 1.85B raw rows at 200k vectors). This
    * operator decomposes the SAME pair set into bounded-memory
    * broadcast-regime jobs: the corpus splits into S = ⌈n/shardRows⌉
    * hash-shards (deterministic xxhash64 of the id), every shard runs
    * the symmetric pipeline on itself and the cross pipeline against
    * each later shard, and the union is returned — a pair (a, b) lands
    * in EXACTLY the (shard(a), shard(b)) job, so coverage is exact and
    * no global candidate exchange or global distinct ever forms.
    *
    * Cost shape: S(S+1)/2 independent jobs (embarrassingly parallel on
    * a cluster), each bounded by two shards' broadcast envelope; each
    * shard's signatures are re-derived ~S times — at the S where that
    * dominates, a deployment persists the signature table once
    * (PLANS.md) and the jobs re-read keys only. Candidate volume is the
    * LSH law's, merely partitioned.
    *
    * Cap semantics (the one delta vs the monolithic operator,
    * documented honestly): the bucket-size cap fires on PER-JOB
    * occupancy, so a bucket globally over cap can stay under it inside
    * every job — the sharded form then emits EXTRA exact-verified true
    * pairs the monolithic cap dropped. Recall is one-sided UP; on
    * corpora whose occupancy sits under the cap (DriftGuard pins the
    * gate fixtures there) the pair set is IDENTICAL — ShardedPairsSpec
    * asserts exact set equality at a forced S=3.
    *
    * DRIVER ENVELOPE (r16 ADVICE item, closed in r18): jobs run
    * SEQUENTIALLY at call time in `eagerJob` mode — each builds its
    * verify map, materializes its survivor-sized output, and destroys
    * the map before the next job starts, so the driver holds ONE job's
    * map (≤ 2 shards) at a time — the persisted runner's discipline
    * without the parquet round-trip. The returned union is over
    * already-materialized pair slices (O(survivors) blocks, O(S²)
    * only in plan-node count). S stays CAPPED at [[InlineShardCap]]
    * (plan-tree sanity + the measured receipt range); past it use
    * [[shardedEmbedPairsPersisted]], whose plan tree is O(1) in S. */
  def shardedEmbedPairs(corpus: DataFrame, idCol: String, vecCol: String,
                        minScore: Long, tables: Int = 8, bits: Int = 6,
                        dim: Int = 64, seed: Long = 11L, scale: Int = 10000,
                        maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                        probes: Int = 0,
                        shardRows: Long = -1L): DataFrame = {
    // shard at HALF the broadcast bound: a cross job's combined map
    // (both shards) then fits the same per-job memory envelope as the
    // monolithic broadcast regime's single map
    val bound = if (shardRows > 0) shardRows else broadcastVerifyMaxRows(dim) / 2
    val n = corpus.count()
    if (n <= broadcastVerifyMaxRows(dim) && shardRows <= 0)
      return portableEmbedPairs(corpus, idCol, vecCol, minScore, tables, bits,
        dim, seed, scale, maxBucketSize, probes, corpusRowsHint = n)
    val s = math.max(1, math.ceil(n.toDouble / bound).toInt)
    if (s == 1)
      return portableEmbedPairs(corpus, idCol, vecCol, minScore, tables, bits,
        dim, seed, scale, maxBucketSize, probes, corpusRowsHint = n)
    require(s <= InlineShardCap,
      s"S=$s shards exceed the inline operator's O(S^2) driver envelope " +
        s"(cap $InlineShardCap) — use shardedEmbedPairsPersisted, which runs " +
        "jobs sequentially from a persisted signature table")
    val shards = (0 until s).map(i =>
      corpus.filter(pmod(xxhash64(col(idCol)), lit(s)) === i))
    // eagerJob (r18, the r16-ADVICE deferred-map item): each of the
    // S(S+1)/2 jobs materializes its survivor-sized output and destroys
    // its verify-map broadcast + cut-key blocks before the next job
    // builds — the driver now holds ONE job's map at a time (the
    // persisted runner's discipline without the parquet round-trip)
    // instead of all maps eagerly for the union plan's lifetime.
    val within = shards.map(sh =>
      portableEmbedPairs(sh, idCol, vecCol, minScore, tables, bits,
        dim, seed, scale, maxBucketSize, probes, corpusRowsHint = bound,
        eagerJob = true))
    val cross = for (i <- 0 until s; j <- (i + 1) until s) yield
      portableCrossEmbedPairs(shards(i), shards(j), idCol, vecCol, minScore,
          tables, bits, dim, seed, scale, maxBucketSize, probes,
          combinedRowsHint = 2 * bound, eagerJob = true)
        // the cross form's (existing, incoming) orientation is shard
        // order, not id order — normalize to the symmetric contract
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"), col("score"))
    (within ++ cross).reduce(_ unionAll _)
  }

  /** Shard-count cap of the INLINE [[shardedEmbedPairs]] (its eager maps
    * and union tree are O(S²) on the driver — the scaladoc's envelope);
    * 8 covers every measured receipt with headroom. */
  val InlineShardCap = 8

  /** PERSISTED-SIGNATURE-TABLE sharded near-dup (round 17, verdict #4 —
    * the PLANS.md promise as code): materializes the quantized vectors
    * and bucket keys ONCE as shard-partitioned parquet under `workDir`,
    * then runs the S(S+1)/2 jobs SEQUENTIALLY, each reading back exactly
    * its shards (partition-pruned scans), building its packed verify map
    * at JOB time and destroying the broadcast before the next job
    * starts. Same pair set as [[shardedEmbedPairs]] (ShardedPairsSpec
    * pins table-mode equality); what changes is the cost shape:
    *   - signatures are computed ONCE (the materialize pass) instead of
    *     ~S× per shard across jobs;
    *   - the driver holds ONE job's map (≤ 2 shards) at a time instead
    *     of all S(S+1)/2 eagerly (the r16 ADVICE's O(S²) envelope) —
    *     per-job broadcasts are destroyed as soon as the job's output
    *     lands;
    *   - the plan tree is O(1) in S: each job is an independent small
    *     plan writing `workDir/pairs/job=i_j`, and the returned frame is
    *     a plain parquet scan of that directory.
    * On a cluster the jobs are embarrassingly parallel from the same two
    * tables; sequential here bounds ONE JVM's memory (the receipt shape).
    * EAGER: jobs run at call time. Output: (id_a, id_b, score BIGINT),
    * id_a < id_b. */
  def shardedEmbedPairsPersisted(corpus: DataFrame, idCol: String, vecCol: String,
      minScore: Long, tables: Int = 8, bits: Int = 6, dim: Int = 64,
      seed: Long = 11L, scale: Int = 10000,
      maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
      probes: Int = 0, shardRows: Long = -1L, workDir: String): DataFrame = {
    val spark = corpus.sparkSession
    val bound = if (shardRows > 0) shardRows else broadcastVerifyMaxRows(dim) / 2
    val n = corpus.count()
    val s = math.max(1, math.ceil(n.toDouble / bound).toInt)
    val planes = portableHyperplanes(dim, tables, bits, seed)
    val quantPath = s"$workDir/quantized"
    val keysPath = s"$workDir/keys"
    val pairsPath = s"$workDir/pairs"
    // materialize pass: ONE quantize+signature scan of the corpus; both
    // tables partitioned by the deterministic id-hash shard so every
    // job's read prunes to its own files
    portableQuantized(corpus, idCol, vecCol, scale)
      .withColumn("__shard", pmod(xxhash64(col(idCol)), lit(s.toLong)))
      .write.mode("overwrite").partitionBy("__shard").parquet(quantPath)
    val qt = spark.read.parquet(quantPath)
    portableBucketKeys(qt, idCol, planes, carry = Seq("__shard"))
      .write.mode("overwrite").partitionBy("__shard").parquet(keysPath)
    val kt = spark.read.parquet(keysPath)
    def qShard(i: Int) = qt.filter(col("__shard") === i).select(col(idCol), col("__qv"))
    def kShard(i: Int) = kt.filter(col("__shard") === i)
      .select(col(idCol), col("__t"), col("__bkt"))
    for (i <- 0 until s; j <- i until s) {
      val (cands, mapSides) =
        if (i == j) {
          val ki = kShard(i)
          (if (probes <= 0) homeOnlyPairs(ki, idCol, maxBucketSize)
           else probedRawPairs(ki, idCol, maxBucketSize, probes, broadcastHome = true),
            Seq(qShard(i)))
        } else
          (crossCandidatesRaw(kShard(i), kShard(j), idCol, maxBucketSize, probes),
            Seq(qShard(i), qShard(j)))
      // UNTRACKED broadcast, destroyed per job — Broadcasts.track is for
      // handles that must outlive the call (a harness frees them between
      // entries); here the job's write is the last reference
      val bc = spark.sparkContext.broadcast(packedVerifyMap(mapSides))
      // cross jobs orient (id_a ∈ shard i, id_b ∈ shard j) — normalize
      // to the symmetric id-order contract after verification
      fusedVerify(cands, bc, minScore)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"), col("score"))
        .write.mode("overwrite").parquet(s"$pairsPath/job=${i}_$j")
      bc.destroy()
    }
    // partition discovery adds the job column — drop it from the contract
    spark.read.parquet(pairsPath).select("id_a", "id_b", "score")
  }

  /** PERSISTED-SIGNATURE-TABLE sharded INCREMENTAL near-dup (round 17 —
    * the daily-crawl twin of [[shardedEmbedPairsPersisted]], closing the
    * past-bound story for the incremental pipeline): an incoming batch
    * deduped against an existing corpus where EITHER side exceeds the
    * per-job broadcast envelope. Both sides' quantized vectors and bucket
    * keys are materialized ONCE as shard-partitioned parquet under
    * `workDir` (Sₑ = ⌈nₑ/bound⌉ existing shards, Sᵢ = ⌈nᵢ/bound⌉
    * incoming shards, deterministic id-hash sharding), then the Sₑ × Sᵢ
    * CROSS jobs run SEQUENTIALLY — each reads back exactly its two
    * shards (partition-pruned scans), builds its packed combined verify
    * map at JOB time, fused-verifies its raw candidates, writes its
    * pair slice, and destroys the broadcast before the next job starts.
    * A cross pair (a ∈ existing, b ∈ incoming) lands in EXACTLY the
    * (shard(a), shard(b)) job, so coverage is exact; no within-side
    * pairs are ever generated (the q125 contract), and no global
    * candidate exchange or global distinct forms.
    *
    * Cap semantics (same one-sided delta as the symmetric sharded
    * runners, documented honestly): the combined-occupancy cap fires on
    * PER-JOB occupancy (one existing shard + one incoming shard), so a
    * key over the monolithic combined cap can stay under it inside a
    * job — the sharded form then emits EXTRA exact-verified true pairs.
    * Recall is one-sided UP; on corpora whose occupancy sits under the
    * cap (DriftGuard pins the gate fixtures' full-corpus occupancy
    * there, which upper-bounds every job's) the pair set is IDENTICAL
    * to [[portableCrossEmbedPairs]] — ShardedPairsSpec pins exact set
    * equality at forced Sₑ = Sᵢ = 2.
    *
    * `shardRowsExisting` / `shardRowsIncoming` force per-side shard
    * bounds (a deployment legitimately runs a huge-corpus × small-batch
    * asymmetry — Sₑ large, Sᵢ = 1); both default to
    * `broadcastVerifyMaxRows(dim) / 2` so any job's combined map fits
    * the monolithic broadcast regime's envelope. EAGER: jobs run at
    * call time; the driver holds ONE job's map at a time and the plan
    * tree is O(1) in Sₑ·Sᵢ. Output: (id_a ∈ existing, id_b ∈ incoming,
    * score BIGINT) — directional, like [[portableCrossEmbedPairs]]. */
  def shardedCrossEmbedPairsPersisted(existing: DataFrame, incoming: DataFrame,
      idCol: String, vecCol: String, minScore: Long,
      tables: Int = 8, bits: Int = 6, dim: Int = 64,
      seed: Long = 11L, scale: Int = 10000,
      maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
      probes: Int = 0, shardRowsExisting: Long = -1L,
      shardRowsIncoming: Long = -1L, workDir: String): DataFrame = {
    val spark = existing.sparkSession
    val defaultBound = broadcastVerifyMaxRows(dim) / 2
    val boundE = if (shardRowsExisting > 0) shardRowsExisting else defaultBound
    val boundI = if (shardRowsIncoming > 0) shardRowsIncoming else defaultBound
    val sE = math.max(1, math.ceil(existing.count().toDouble / boundE).toInt)
    val sI = math.max(1, math.ceil(incoming.count().toDouble / boundI).toInt)
    val planes = portableHyperplanes(dim, tables, bits, seed)
    val pairsPath = s"$workDir/pairs"
    // materialize pass: ONE quantize+signature scan per side, both
    // tables partitioned by the side's deterministic id-hash shard
    def materialize(side: DataFrame, s: Int, tag: String): (DataFrame, DataFrame) = {
      val quantPath = s"$workDir/quantized_$tag"
      val keysPath = s"$workDir/keys_$tag"
      portableQuantized(side, idCol, vecCol, scale)
        .withColumn("__shard", pmod(xxhash64(col(idCol)), lit(s.toLong)))
        .write.mode("overwrite").partitionBy("__shard").parquet(quantPath)
      val qt = spark.read.parquet(quantPath)
      portableBucketKeys(qt, idCol, planes, carry = Seq("__shard"))
        .write.mode("overwrite").partitionBy("__shard").parquet(keysPath)
      (qt, spark.read.parquet(keysPath))
    }
    val (qtE, ktE) = materialize(existing, sE, "existing")
    val (qtI, ktI) = materialize(incoming, sI, "incoming")
    def qShard(qt: DataFrame, i: Int) =
      qt.filter(col("__shard") === i).select(col(idCol), col("__qv"))
    def kShard(kt: DataFrame, i: Int) = kt.filter(col("__shard") === i)
      .select(col(idCol), col("__t"), col("__bkt"))
    for (i <- 0 until sE; j <- 0 until sI) {
      val cands = crossCandidatesRaw(kShard(ktE, i), kShard(ktI, j), idCol,
        maxBucketSize, probes)
      // UNTRACKED broadcast, destroyed per job (the symmetric runner's
      // discipline) — the job's write is the last reference
      val bc = spark.sparkContext.broadcast(
        packedVerifyMap(Seq(qShard(qtE, i), qShard(qtI, j))))
      fusedVerify(cands, bc, minScore)
        .write.mode("overwrite").parquet(s"$pairsPath/job=${i}_$j")
      bc.destroy()
    }
    spark.read.parquet(pairsPath).select("id_a", "id_b", "score")
  }

  /** Embedding-cosine near-duplicate pairs: LSH candidates (full-signature
    * collision in any table) verified by exact cosine ≥ threshold.
    * Output: (id_a, id_b, sim), id_a < id_b.
    *
    * Scale contract: past `broadcastVerifyMaxRows` this float form keeps
    * the distinct-first shuffle shape — at corpus sizes where that plan's
    * candidate exchange exceeds the cluster's shuffle budget (measured as
    * a DISK cliff at 200k×dim-64, BASELINE.md round 16), deploy through
    * [[shardedEmbedPairs]] on the quantized representation instead: the
    * blocked decomposition is the shipped past-bound path, and quantized
    * verification at the 10⁴ scale is the production representation the
    * oracle family already proves (q84 ≡ q43's pair structure). */
  def embeddingNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, numTables: Int = 4,
                            bitsPerTable: Int = 8, dim: Int = 64,
                            seed: Long = 42L,
                            maxBucketSize: Int = TextDedup.DefaultMaxBucketSize,
                            probes: Int = 0, corpusRowsHint: Long = -1L): DataFrame = {
    require(probes <= bitsPerTable,
      s"probes ($probes) beyond the $bitsPerTable-bit signature flip bits no bucket key carries")
    val planes = hyperplanes(dim, numTables, bitsPerTable, seed)
    // Single-pass bucketing (cf. TextDedup.minhashCandidates) with a
    // KEYS-ONLY exchange: (table, bucket, id) triples — vectors never
    // ride the bucket shuffle; they are joined back for candidate pairs
    // only. Round 13: the production float path shares the portable
    // twin's candidate generators — home-only (probes = 0, the declared
    // q43 form through round 12) or directional multi-probe + two-regime
    // verification (the q84 machinery: fewer tables for the same
    // threshold recall, duplicates verified map-side when the vector
    // frame broadcasts).
    val keys = corpus.select(col(idCol),
      posexplode(allBuckets(col(vecCol), planes)).as(Seq("__t", "__bkt")))
    val v = corpus.select(col(idCol), col(vecCol))
    def verify(pairs: DataFrame, useBroadcast: Boolean): DataFrame = {
      def side(df: DataFrame) = if (useBroadcast) broadcast(df) else df
      pairs
        .join(side(v.select(col(idCol).as("id_a"), col(vecCol).as("__va"))), Seq("id_a"))
        .join(side(v.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          fastCosine(corpus, col("__va"), col("__vb")).as("sim"))
        .filter(col("sim") >= threshold)
    }
    if (probes <= 0)
      verify(homeOnlyPairs(keys, idCol, maxBucketSize), useBroadcast = false)
    else {
      if (corpusRowsHint >= 0 && corpusRowsHint <= broadcastVerifyMaxRows(dim))
        verify(probedRawPairs(keys, idCol, maxBucketSize, probes),
          useBroadcast = true).distinct()
      else {
        // shuffle regime: keys cut once (three references), dedup
        // partitioning sized by code from the keys-only candidate
        // estimate (see portableEmbedPairs)
        val cutKeys = Checkpoints.cut(keys, eager = true)
        val parts = dedupPartitionsFor(
          estimatedRawCandidates(cutKeys, probes, maxBucketSize),
          corpus.sparkSession.sessionState.conf.numShufflePartitions)
        verify(probedRawPairs(cutKeys, idCol, maxBucketSize, probes)
          .repartition(parts, col("id_a"), col("id_b")).distinct(),
          useBroadcast = false)
      }
    }
  }

  /** Deterministic semantic clustering for the SemDeDup family (q186/
    * q187): assign every vector to its nearest of `nlist` centroids,
    * where the centroids are the `nlist` LOWEST-ID vectors (the
    * `ivfTopKInt` convention) and "nearest" is the exact integer-dot
    * argmax over ×10⁴-quantized vectors — so any engine replays the
    * IDENTICAL partition of the corpus (a float k-means would be both
    * seed- and ulp-divergent cross-engine; Lloyd refinement stays the
    * production path via `kmeansCentroids`, this is the hash-checkable
    * twin). Ties break to the lowest centroid id.
    *
    * Scale shape: centroids are one broadcast (corpus-size-sublinear by
    * contract — SemDeDup runs with k ≪ n; at k beyond broadcast range
    * assignment goes through the IVF probe machinery instead), the
    * corpus scans ONCE, and the argmax is a map-side max_by — no shuffle
    * wider than (vec_id, cid, s). Output: (vec_id, cid, s BIGINT).
    */
  /** (vec_id, __v) quantized frame — the shared entry point of the
    * semantic-cluster family. Cheap cast pass; re-derive per reference
    * rather than cutting (CLAUDE.md). */
  private[graft] def semQuantized(corpus: DataFrame, idCol: String, vecCol: String,
                                  scale: Int = 10000): DataFrame = {
    registerIntDot(corpus)
    corpus.select(col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol), scale).as("__v"))
  }

  /** The `nlist` lowest-id vectors as a broadcast centroid frame
    * (__cid, __cvec) — the deterministic seed set any engine reproduces. */
  def semCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nlist: Int, scale: Int = 10000): DataFrame =
    broadcast(semQuantized(corpus, idCol, vecCol, scale).orderBy("vec_id").limit(nlist)
      .select(col("vec_id").as("__cid"), col("__v").as("__cvec")))

  /** Greedy k-center (Gonzalez 1985) farthest-point seeding over
    * quantized integer dots — the deterministic seeding ALTERNATIVE the
    * round-17 verdict asked to be measured against the lowest-id
    * convention. MEASURED RESULT (BASELINE.md round 17, DedupQuality
    * receipt): it does NOT lift SemDeDup same-cluster visibility on the
    * gate fixtures — visibility is set by the cell count k and the
    * truth pairs' geometry (mean pair cosine ≈ 0.29 at the q84
    * threshold, i.e. ~73° apart; the fixtures hold ZERO pairs at cosine
    * ≥ 0.7), not by centroid placement: lowest-id, farthest-point,
    * Lloyd-refined, the max of 1000 random draws, and a truth-
    * supervised hill-climb all land below 0.30. The declared
    * hash-checked path therefore KEEPS lowest-id seeds (q186-family
    * texts unchanged); this operator stays as the measured-no-better
    * alternative and the receipt generator's dependency — the
    * CC-contraction negative-receipt pattern (ProfileQ97).
    *
    * Scale shape: nlist−1 rounds, each ONE map-only corpus scan against
    * a broadcast ≤ nlist×dim literal matrix (the ArgmaxIntDot native —
    * its `s` field IS the max dot to the chosen set) plus a 1-row
    * driver action; SemDeDup runs with k ≪ n by contract, and the
    * sequential rounds are inherent to greedy k-center. Seed 1 =
    * MIN(id); each round adds the vector MINIMIZING its max dot to the
    * chosen set, ties to the lowest id. Returns the
    * `collectCentroids` shape `semAssignExpr` consumes. */
  def semCentroidsFarthest(corpus: DataFrame, idCol: String, vecCol: String,
                           nlist: Int, scale: Int = 10000): Seq[(Long, Seq[Long])] = {
    val q = semQuantized(corpus, idCol, vecCol, scale)
    val seeds = scala.collection.mutable.ArrayBuffer[(Long, Seq[Long])]()
    q.orderBy("vec_id").limit(1).collect()
      .foreach(r => seeds += ((r.getLong(0), r.getSeq[Long](1))))
    while (seeds.nonEmpty && seeds.size < nlist) {
      val next = q
        .filter(!col("vec_id").isin(seeds.map(_._1).toSeq: _*))
        .select(col("vec_id"), col("__v"),
          semAssignExpr(col("__v"), seeds.toSeq).getField("s").as("__md"))
        .orderBy(col("__md").asc, col("vec_id").asc)
        .limit(1).collect()
      if (next.isEmpty) return seeds.toSeq // n < nlist: all vectors are seeds
      next.foreach(r => seeds += ((r.getLong(0), r.getSeq[Long](1))))
    }
    seeds.toSeq
  }

  /** Integer-dot argmax assignment of a quantized frame to a centroid
    * frame. Score materialized ONCE as a column (CLAUDE.md: never inline
    * an expensive subexpression into N branches), then argmax by
    * (s desc, cid asc) via max_by on a (s, -cid) ordering struct. */
  private def semAssignTo(q: DataFrame, centroids: DataFrame): DataFrame =
    q.crossJoin(centroids)
      .select(col("vec_id"), col("__cid"),
        intDot(col("__v"), col("__cvec")).as("s"))
      .groupBy("vec_id")
      .agg(max_by(struct(col("__cid"), col("s")),
        struct(col("s"), (-col("__cid")).as("tb"))).as("__a"))
      .select(col("vec_id"), col("__a.__cid").as("cid"), col("__a.s").as("s"))

  def semAssign(corpus: DataFrame, idCol: String, vecCol: String,
                nlist: Int, scale: Int = 10000): DataFrame =
    semAssignTo(semQuantized(corpus, idCol, vecCol, scale),
      semCentroids(corpus, idCol, vecCol, nlist, scale))

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    * embedding space, then search for semantic duplicates ONLY within
    * clusters — the clustering replaces LSH banding as the candidate
    * generator, turning the all-pairs O(n²) into Σ per-cluster m² with
    * m bounded by `maxClusterSize` (the `DefaultMaxBucketSize`
    * discipline: a degenerate cluster is skipped, never exploded —
    * mirrored into the q186 DuckDB text). Within a cluster, pairs with
    * quantized dot ≥ `minScore` are duplicates and the HIGHER id of each
    * pair is dropped (greedy keep-lowest — deterministic, the
    * `dedupNear` convention).
    *
    * Same keys-only exchange as `portableEmbedPairs`: only (cid, vec_id)
    * rides the cluster shuffle, ids pair by double explode, vectors join
    * back for candidate pairs alone. Output: one row per cluster —
    * (cid, n_members, n_pairs, n_dropped), all BIGINT. */
  def semDedupStats(corpus: DataFrame, idCol: String, vecCol: String,
                    minScore: Long, nlist: Int, scale: Int = 10000,
                    maxClusterSize: Int = TextDedup.DefaultMaxBucketSize): DataFrame = {
    registerIntDot(corpus)
    val q = corpus.select(col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol), scale).as("__v"))
    // the assignment subtree (n × nlist dot products) feeds BOTH the
    // cluster sizes and the pair generator — cut its lineage once
    // (CLAUDE.md discipline: a frame referenced N times recomputes its
    // subtree N times per action)
    val asg = Checkpoints.cut(
      semAssign(corpus, idCol, vecCol, nlist, scale).select("vec_id", "cid"),
      eager = false)
    val csz = asg.groupBy("cid").agg(count(lit(1)).as("n_members"))
    val pairs = asg
      .groupBy("cid")
      .agg(collect_list(col("vec_id")).as("__ids"))
      .filter(size(col("__ids")).between(2, maxClusterSize))
      .select(col("cid"), explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("cid"), col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    val verified = pairs
      .join(q.select(col("vec_id").as("id_a"), col("__v").as("__va")), Seq("id_a"))
      .join(q.select(col("vec_id").as("id_b"), col("__v").as("__vb")), Seq("id_b"))
      .filter(intDot(col("__va"), col("__vb")) >= minScore)
      .select("cid", "id_a", "id_b")
    val st = verified.groupBy("cid")
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("id_b")).as("n_dropped"))
    csz.join(st, Seq("cid"), "left")
      .select(col("cid"), col("n_members"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** Prototype pruning (Sorscher et al. 2022 "Beyond neural scaling
    * laws"; the D4 recipe of Tirumala et al. 2023 runs it after
    * SemDeDup): within each semantic cluster, the examples CLOSEST to
    * the centroid are the most prototypical — and on large corpora the
    * most redundant — so the top `dropBp`/10⁴ fraction of each cluster
    * by centroid affinity is pruned. Rank = integer-dot to the assigned
    * centroid, descending, vec_id tie-break — exact cross-engine.
    *
    * The per-cluster window partitions by cid (parallel across
    * clusters, never a global sort); the rank-vs-quota join is
    * cluster-sizes (broadcast-sized) back onto the ranked frame.
    * Output: the DROPPED manifest (cid, vec_id, proto_rank,
    * proto_score) — what a curation run logs before deleting. */
  def semPrototypeDrops(corpus: DataFrame, idCol: String, vecCol: String,
                        nlist: Int, dropBp: Int, scale: Int = 10000): DataFrame = {
    val asg = Checkpoints.cut(
      semAssign(corpus, idCol, vecCol, nlist, scale), eager = false)
    val csz = asg.groupBy("cid").agg(count(lit(1)).as("n_members"))
    val w = Window.partitionBy("cid").orderBy(col("s").desc, col("vec_id"))
    asg.withColumn("proto_rank", row_number().over(w))
      .join(broadcast(csz), Seq("cid"))
      .filter(col("proto_rank") <= expr(s"(n_members * $dropBp) DIV 10000"))
      .select(col("cid"), col("vec_id"), col("proto_rank"),
        col("s").as("proto_score"))
  }

  /** Incremental SemDeDup (the q125 shape for the cluster family): an
    * INCOMING vector batch deduped against an EXISTING corpus — centroids
    * come from the existing corpus alone (the persisted-index contract:
    * the cluster structure never moves when a batch arrives), both sides
    * assign to them, and candidate pairs are existing × incoming within a
    * cluster. The cap keys on the EXISTING-side cluster size only: that
    * bounds the fan-out PER INCOMING ROW (work stays linear in the batch
    * at any corpus scale) and — unlike a combined-occupancy cap — is
    * micro-batch-invariant, so the streaming twin equals this batch form
    * on any input split (the q126 streaming=batch contract holds by
    * construction, not by luck). Keys-only exchanges throughout; vectors
    * join back for candidate pairs alone.
    * Output: (cid, id_a ∈ existing, id_b ∈ incoming, score BIGINT). */
  def semCrossPairs(existing: DataFrame, incoming: DataFrame,
                    idCol: String, vecCol: String,
                    minScore: Long, nlist: Int, scale: Int = 10000,
                    maxExistingCluster: Int = TextDedup.DefaultMaxBucketSize): DataFrame = {
    val qE = semQuantized(existing, idCol, vecCol, scale)
    val qI = semQuantized(incoming, idCol, vecCol, scale)
    val centroids = semCentroids(existing, idCol, vecCol, nlist, scale)
    val asgE = Checkpoints.cut(
      semAssignTo(qE, centroids).select("vec_id", "cid"), eager = false)
    val asgI = semAssignTo(qI, centroids).select("vec_id", "cid")
    val eligible = asgE.groupBy("cid").agg(count(lit(1)).as("__ne"))
      .filter(col("__ne") <= maxExistingCluster)
      .select("cid")
    val cands = asgE.join(eligible, Seq("cid"))
      .select(col("cid"), col("vec_id").as("id_a"))
      .join(asgI.select(col("cid"), col("vec_id").as("id_b")), Seq("cid"))
    cands
      .join(qE.select(col("vec_id").as("id_a"), col("__v").as("__va")), Seq("id_a"))
      .join(qI.select(col("vec_id").as("id_b"), col("__v").as("__vb")), Seq("id_b"))
      .select(col("cid"), col("id_a"), col("id_b"),
        intDot(col("__va"), col("__vb")).as("score"))
      .filter(col("score") >= minScore)
  }

  /** Static half of the STREAMING SemDeDup twin (q208): the existing
    * corpus's members keyed by their cluster, restricted to clusters
    * under the existing-side cap — exactly the (cluster → members)
    * index `semCrossPairs` pairs against, materialized once at arm
    * time so each micro-batch's per-row assignment joins it
    * stream-static (zero streaming state, the q126 discipline).
    * Output: (cid, id_a, __va) — one row per eligible existing member,
    * the quantized vector carried once (cluster-linear, never
    * pair-linear). */
  def semExistingIndex(existing: DataFrame, idCol: String, vecCol: String,
                       nlist: Int, scale: Int = 10000,
                       maxExistingCluster: Int = TextDedup.DefaultMaxBucketSize): DataFrame = {
    val qE = semQuantized(existing, idCol, vecCol, scale)
    val asgE = semAssignTo(qE, semCentroids(existing, idCol, vecCol, nlist, scale))
      .select("vec_id", "cid")
    val eligible = asgE.groupBy("cid").agg(count(lit(1)).as("__ne"))
      .filter(col("__ne") <= maxExistingCluster)
      .select("cid")
    asgE.join(eligible, Seq("cid"))
      .join(qE, Seq("vec_id"))
      .select(col("cid"), col("vec_id").as("id_a"), col("__v").as("__va"))
  }

  /** Streaming SemDeDup (q208, the q126 zero-state pattern): each
    * incoming vector is assigned per-row to its nearest EXISTING
    * centroid via the literal-centroid expression (`semAssignExpr` — no
    * stateful aggregation, pure codegen), stream-static joined to the
    * eligible-cluster member index, and exact-verified by integer dot.
    * Equals `semCrossPairs` on the closed input (streaming ≡ batch, the
    * house identity — SemDedupSpec pins it; the q207/q208 oracle is the
    * shared q186-replay restriction). Output: (cid, id_a ∈ existing,
    * id_b ∈ incoming, score BIGINT). */
  def semStreamCrossPairs(vecStream: DataFrame, idCol: String, vecCol: String,
                          cents: Seq[(Long, Seq[Long])], existingIndex: DataFrame,
                          minScore: Long, scale: Int = 10000): DataFrame = {
    registerIntDot(vecStream)
    vecStream.select(col(idCol).cast("long").as("id_b"),
        quantize(col(vecCol), scale).as("__vb"))
      .withColumn("__a", semAssignExpr(col("__vb"), cents))
      .select(col("id_b"), col("__vb"), col("__a").getField("cid").as("cid"))
      .join(existingIndex, Seq("cid"))
      .select(col("cid"), col("id_a"), col("id_b"),
        intDot(col("__va"), col("__vb")).as("score"))
      .filter(col("score") >= minScore)
  }

  /** Per-row argmax assignment against DRIVER-COLLECTED centroid literals
    * — the streaming form of `semAssignTo` (a streaming groupBy would be
    * a stateful aggregation; with the centroid set manifest-sized by the
    * nlist ≤ 4096 contract, inlining it makes assignment a pure
    * expression, the hyperplane-literal discipline). Returns a (cid, s)
    * struct column.
    *
    * Measured envelope (round 13): the literal tree is probed working
    * at nlist = 64 / 256 / 1024 (2.3 / 2.4 / 6.6 s for a 1k-row frame
    * INCLUDING plan construction — past a few hundred centroids Spark
    * falls back from codegen to interpreted evaluation, and the plan
    * cost grows with the constant count, but q208 builds the expression
    * ONCE per stream arm, so it amortizes over every micro-batch). For
    * nlist near the 4096 clamp prefer the batch `semAssignTo`
    * broadcast-join form; SemDedupSpec pins streaming ≡ batch at
    * nlist = 64 on top of the small-nlist cases. */
  def semAssignExpr(vec: Column, cents: Seq[(Long, Seq[Long])]): Column =
    // round 16: ONE native expression over the baked centroid matrix —
    // the composed array_max over nlist inlined intDot structs outgrows
    // the 64 KB codegen method limit once semNlistFor's n/125 rule
    // passes a few hundred centroids (the portableBucketCols failure
    // class); value-identical for non-null vectors incl. the
    // length-mismatch edge (NativeExprPropSpec pins it vs the composed
    // reference below)
    graft.functions.ArgmaxIntDot.column(vec, cents)

  /** The composed array_max spelling — kept as the cross-check
    * reference for [[semAssignExpr]]'s native expression. */
  private[graft] def semAssignExprComposed(vec: Column, cents: Seq[(Long, Seq[Long])]): Column = {
    require(cents.nonEmpty, "semAssignExpr needs at least one centroid")
    val entries = cents.map { case (cid, cv) =>
      struct(intDot(vec, typedlit(cv)).as("s"), lit(-cid).as("negcid"))
    }
    val best = array_max(array(entries: _*))
    struct((-best.getField("negcid")).as("cid"), best.getField("s").as("s"))
  }

  /** Collect a centroid frame to driver literals for `semAssignExpr` —
    * bounded by the nlist clamp (a manifest-sized collect, the allowed
    * class). */
  def collectCentroids(centroids: DataFrame): Seq[(Long, Seq[Long])] =
    centroids.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toList).toList.sortBy(_._1)
}
