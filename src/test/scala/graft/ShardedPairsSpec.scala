package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 shard-first operator (verdict #3): the blocked decomposition
  * of the portable embedding near-dup into bounded broadcast-regime jobs
  * must reproduce the monolithic operator's pair set EXACTLY on a
  * fixture whose bucket occupancy sits under the cap (DriftGuard pins
  * the gate fixtures there — the cap is the one documented delta). */
class ShardedPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def found(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("shardedEmbedPairs at forced S=3 equals the monolithic operator (multi-probe point)") {
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val mono = found(Similarity.portableEmbedPairs(emb, "vec_id", "embedding",
      minScore = SparkEntry.EmbedMinScore, tables = 2, bits = 6, probes = 6,
      corpusRowsHint = emb.count()))
    val sharded = found(Similarity.shardedEmbedPairs(emb, "vec_id", "embedding",
      minScore = SparkEntry.EmbedMinScore, tables = 2, bits = 6, probes = 6,
      shardRows = emb.count() / 3 + 1))
    assert(mono.nonEmpty, "fixture degenerated: no pairs")
    assert(sharded == mono,
      s"sharded != monolithic: only-sharded=${(sharded -- mono).take(3)}, " +
        s"only-mono=${(mono -- sharded).take(3)}")
  }

  test("cross pair set is verify-regime-invariant (combined-map broadcast vs payload joins)") {
    // the q125 shape at both verify regimes: dedup-before vs dedup-after
    // exact verification commutes, so the hinted (fused combined-map)
    // branch must return the identical (id_a, id_b, score) SET
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val split = 250L
    val old = emb.filter(org.apache.spark.sql.functions.col("vec_id") < split)
    val inc = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= split)
    def cross(hint: Long) = found(Similarity.portableCrossEmbedPairs(
      old, inc, "vec_id", "embedding", minScore = SparkEntry.EmbedMinScore,
      tables = 2, bits = 6, probes = 6, combinedRowsHint = hint))
    val joins = cross(-1L)
    val fused = cross(emb.count())
    assert(joins.nonEmpty, "cross fixture degenerated: no pairs")
    assert(fused == joins,
      s"regimes diverged: only-fused=${(fused -- joins).take(3)}, only-joins=${(joins -- fused).take(3)}")
  }

  test("shardedEmbedPairsPersisted (table mode, round 17) equals the monolithic operator at forced S=3") {
    // the verdict-#4 runner: signatures persisted once, jobs run
    // sequentially with per-job map build/destroy — the pair set must
    // still be EXACTLY the monolithic one, at both the multi-probe and
    // the home-only candidate points
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val rows = emb.count() / 3 + 1
    def tmp() = java.nio.file.Files.createTempDirectory("graft_sharded_tbl").toString
    val monoProbed = found(Similarity.portableEmbedPairs(emb, "vec_id", "embedding",
      minScore = SparkEntry.EmbedMinScore, tables = 2, bits = 6, probes = 6,
      corpusRowsHint = emb.count()))
    val tblProbed = found(Similarity.shardedEmbedPairsPersisted(emb, "vec_id", "embedding",
      minScore = SparkEntry.EmbedMinScore, tables = 2, bits = 6, probes = 6,
      shardRows = rows, workDir = tmp()))
    assert(monoProbed.nonEmpty, "fixture degenerated: no pairs")
    assert(tblProbed == monoProbed,
      s"table-mode != monolithic: only-table=${(tblProbed -- monoProbed).take(3)}, " +
        s"only-mono=${(monoProbed -- tblProbed).take(3)}")
    val monoHome = found(Similarity.portableEmbedPairs(emb, "vec_id", "embedding",
      minScore = SparkEntry.EmbedMinScore, tables = 4, bits = 6))
    val tblHome = found(Similarity.shardedEmbedPairsPersisted(emb, "vec_id", "embedding",
      minScore = SparkEntry.EmbedMinScore, tables = 4, bits = 6,
      shardRows = rows, workDir = tmp()))
    assert(tblHome == monoHome,
      s"home-only table-mode != monolithic: only-table=${(tblHome -- monoHome).take(3)}")
  }

  test("shardedCrossEmbedPairsPersisted (round 17) equals the monolithic cross operator at forced Se=Si=2") {
    // the incremental twin (q224): every (shardE, shardI) job combination
    // must reproduce portableCrossEmbedPairs' directional pair set
    // exactly on the under-cap fixture, at both candidate points
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val split = SparkEntry.IncrementalSplitId
    val old = emb.filter(org.apache.spark.sql.functions.col("vec_id") < split)
    val inc = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= split)
    val (nOld, nInc) = (old.count(), inc.count())
    def tmp() = java.nio.file.Files.createTempDirectory("graft_sharded_cross").toString
    val monoProbed = found(Similarity.portableCrossEmbedPairs(old, inc,
      "vec_id", "embedding", minScore = SparkEntry.EmbedMinScore,
      tables = 2, bits = 6, probes = 6))
    val tblProbed = found(Similarity.shardedCrossEmbedPairsPersisted(old, inc,
      "vec_id", "embedding", minScore = SparkEntry.EmbedMinScore,
      tables = 2, bits = 6, probes = 6,
      shardRowsExisting = nOld / 2 + 1, shardRowsIncoming = nInc / 2 + 1,
      workDir = tmp()))
    assert(monoProbed.nonEmpty, "cross fixture degenerated: no pairs")
    assert(tblProbed == monoProbed,
      s"cross table-mode != monolithic: only-table=${(tblProbed -- monoProbed).take(3)}, " +
        s"only-mono=${(monoProbed -- tblProbed).take(3)}")
    val monoHome = found(Similarity.portableCrossEmbedPairs(old, inc,
      "vec_id", "embedding", minScore = SparkEntry.EmbedMinScore,
      tables = 4, bits = 6))
    val tblHome = found(Similarity.shardedCrossEmbedPairsPersisted(old, inc,
      "vec_id", "embedding", minScore = SparkEntry.EmbedMinScore,
      tables = 4, bits = 6,
      shardRowsExisting = nOld / 2 + 1, shardRowsIncoming = nInc / 2 + 1,
      workDir = tmp()))
    assert(tblHome == monoHome,
      s"home-only cross table-mode != monolithic: only-table=${(tblHome -- monoHome).take(3)}")
  }

  test("shardedEmbedPairs past InlineShardCap fails fast toward the persisted runner") {
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val e = intercept[IllegalArgumentException] {
      Similarity.shardedEmbedPairs(emb, "vec_id", "embedding",
        minScore = SparkEntry.EmbedMinScore, tables = 2, bits = 6, probes = 6,
        shardRows = emb.count() / (Similarity.InlineShardCap + 2) + 1)
    }
    assert(e.getMessage.contains("shardedEmbedPairsPersisted"))
  }

  test("shardedEmbedPairs at S=1 short-circuits to the monolithic operator (home-only point)") {
    val emb = Tables.table(spark, TestSpark.sf01, "embeddings")
    val mono = found(Similarity.portableEmbedPairs(emb, "vec_id", "embedding",
      minScore = SparkEntry.EmbedMinScore, tables = 4, bits = 6))
    val one = found(Similarity.shardedEmbedPairs(emb, "vec_id", "embedding",
      minScore = SparkEntry.EmbedMinScore, tables = 4, bits = 6))
    assert(one == mono)
  }
}
