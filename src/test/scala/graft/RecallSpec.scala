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

  test("lshTopK at the declared q45 operating point (16 tables x 4 bits) holds recall@10") {
    val (emb, queries, truth) = fixtures(k = 10, nQ = 50)
    val got = pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10, numTables = 16, bitsPerTable = 4))
    val recall = got.intersect(truth).size.toDouble / truth.size
    // r11 measured 0.908 on the regenerated sf0.01 fixture
    assert(recall >= 0.70,
      f"lshTopK(16x4) recall@10 = $recall%.3f < 0.70 — regenerated embeddings distribution " +
        "no longer suits the declared q45 parameters (re-tune via graft.tools.Recall)")
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
