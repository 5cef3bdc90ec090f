package graft.tools

import graft.Tables
import graft.operators.TextDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the portable simhash pipeline (dev tool): where
  * does q83's wall go — token md5 pass, fused sign fold, the 56-combo
  * packed-key fan-out, the bucket grouping, or the pair-emission tail
  * (double explode + min-combo + hamming)? Stages mirror the SHIPPED
  * `portableSimhashPairs` exactly (packed integer combo keys since
  * round 10; the pre-r10 dash-joined-string stage this tool originally
  * measured is kept as a comparison row).
  *
  * Round 14: takes a data dir argument so the 10× fixture
  * (`ScaleTenX` output) can be profiled — the r13 verdict flagged
  * q83's 10× ratio (3.6×) as the heavy band's worst non-LSH ratio and
  * asked for a measured stage table before any optimization.
  *
  * Usage: runMain graft.tools.ProfileQ83 [dir] [reps]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS. */
object ProfileQ83 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.table(spark, dir, "documents")
    println(s"[q83] dir=$dir docs=${docs.count()}")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q83] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def forceLong(df: org.apache.spark.sql.DataFrame, c: String): Unit =
      df.agg(expr(s"bit_xor($c)")).head()

    val chunkBits = 32 / TextDedup.SimhashChunks
    for (rep <- 1 to reps) {
      // stage 1: per-token md5 hashes (fused PortableShingleHash, n=1)
      val th = docs.select(col("doc_id"),
        array_distinct(TextDedup.portableShingleHashes(col("text"), 1)).as("__th"))
      time(s"r$rep token md5 hashes (forced)")(
        th.agg(expr("bit_xor(xxhash64(__th))")).head())
      // stage 2: + fused 32-bit sign fold
      val sigs = th.select(col("doc_id"), TextDedup.portableSimhash32(col("__th")).as("__sim"))
      time(s"r$rep + fused fold (forced)")(forceLong(sigs, "__sim"))
      // stage 3: + the SHIPPED 56-combo packed-integer key fan-out
      val chunks = TextDedup.simhashComboKeys(sigs, chunkBits)
      time(s"r$rep + 56-combo packed-key fanout (forced)")(forceLong(chunks, "__ckey"))
      // stage 3b (comparison): the pre-r10 dash-joined STRING keys
      val mask = (1L << chunkBits) - 1
      val strChunks = sigs.select(
        col("doc_id"), col("__sim"),
        posexplode(array(TextDedup.simhashCombos.map { cs =>
          concat_ws("-", cs.map(c =>
            shiftrightunsigned(col("__sim"), chunkBits * c).bitwiseAND(lit(mask)).cast("string")): _*)
        }: _*)).as(Seq("__combo", "__ckey")))
      time(s"r$rep + 56-combo STRING fanout (comparison, forced)")(
        strChunks.agg(expr("bit_xor(xxhash64(__ckey))")).head())
      // stage 4: + bucket grouping (the one shuffle) — forced via the
      // capped bucket-size census over the same key stream
      time(s"r$rep + bucket grouping (census forced)")(
        chunks.groupBy("__combo", "__ckey").agg(count(lit(1)).as("n"))
          .agg(sum(col("n"))).head())
      // stage 4b: the tail's raw volume — in-bucket pair rows the double
      // explode emits BEFORE the min-combo/hamming filters (what the
      // per-pair work scales with)
      time(s"r$rep raw in-bucket pair rows")(
        println("  n=" + chunks
          .groupBy("__combo", "__ckey")
          .agg(count(lit(1)).as("n"))
          .filter(col("n").between(2, TextDedup.DefaultMaxBucketSize))
          .agg(sum(col("n") * (col("n") - 1) / 2)).head().get(0)))
      // stage 5: full pipeline (grouping + double explode + min-combo +
      // hamming verification)
      val full = TextDedup.portableSimhashPairs(docs, "doc_id", "text")
      time(s"r$rep full pipeline")(println("  pairs=" + full.count()))
    }
    spark.stop()
  }
}
