package graft.tools

import graft.{Tables}
import graft.operators.TextDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup pipeline (dev tool, not part of the
  * driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.table(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val n = time("docs.count")(docs.count())
    println(s"[profile] docs=$n")
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(to_json(struct(df.columns.map(col): _*))).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    val shonly = docs.select(TextDedup.shingles(TextDedup.tokens(col("text")), 2).as("sh"))
    time("shingles only (forced)")(force(shonly))
    val sig = TextDedup.signatureFrame(docs, "doc_id", "text", 2, 64)
    time("signatures(64) forced")(force(sig))
    val banded0 = sig.select(col("doc_id"),
      posexplode(TextDedup.bandKeys(col("__sig"), 16, 4)).as(Seq("b", "k")))
    time("banded (forced)")(force(banded0))
    val cands = TextDedup.minhashCandidates(docs, "doc_id", "text", shingleN = 2)
    val nc = time("candidates")(cands.count())
    println(s"[profile] candidates=$nc")
    val pairs = TextDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.3, shingleN = 2)
    val np = time("verified pairs")(pairs.count())
    println(s"[profile] pairs=$np")
    spark.stop()
  }
}
