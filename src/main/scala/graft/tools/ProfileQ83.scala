package graft.tools

import graft.Tables
import graft.operators.TextDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the portable simhash pipeline (dev tool): where do
  * q83's ~2.1 s actually go — token md5 pass, sign fold (fused r10),
  * combo-key fan-out, or the bucket/pair/hamming tail? */
object ProfileQ83 {
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
      println(f"[q83] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def forceLong(df: org.apache.spark.sql.DataFrame, c: String): Unit =
      df.agg(expr(s"bit_xor($c)")).head()

    for (rep <- 1 to 3) {
      val th = docs.select(col("doc_id"),
        array_distinct(TextDedup.portableShingleHashes(col("text"), 1)).as("__th"))
      time(s"r$rep token md5 hashes (forced)")(
        th.agg(expr("bit_xor(xxhash64(__th))")).head())
      val sigs = th.select(col("doc_id"), TextDedup.portableSimhash32(col("__th")).as("__sim"))
      time(s"r$rep + fused fold (forced)")(forceLong(sigs, "__sim"))
      val sigsC = th.select(col("doc_id"), TextDedup.portableSimhash32Composed(col("__th")).as("__sim"))
      time(s"r$rep + composed fold (forced)")(forceLong(sigsC, "__sim"))
      val chunkBits = 32 / TextDedup.SimhashChunks
      val mask = (1L << chunkBits) - 1
      val chunks = sigs.select(
        col("doc_id"), col("__sim"),
        posexplode(array(TextDedup.simhashCombos.map { cs =>
          concat_ws("-", cs.map(c =>
            shiftrightunsigned(col("__sim"), chunkBits * c).bitwiseAND(lit(mask)).cast("string")): _*)
        }: _*)).as(Seq("__combo", "__ckey")))
      time(s"r$rep + 56-combo string fanout (forced)")(
        chunks.agg(expr("bit_xor(xxhash64(__ckey))")).head())
      val full = TextDedup.portableSimhashPairs(docs, "doc_id", "text")
      time(s"r$rep full pipeline")(full.count())
    }
    spark.stop()
  }
}
