package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-order-of-magnitude local scale proof for the heavy band (dev tool,
  * not part of the driver contract): deterministically replicates sf0.1's
  * documents/embeddings `factor`× (default 10), then times the heavy-band
  * entries on BOTH the original and the scaled dir (medians of 3) so the
  * flat-marginal-slope argument gets a measured point at 10×.
  *
  * Replication preserves near-dup semantics instead of inflating it:
  *   - documents: replica r > 0 prefixes every token with "r{r}x", so
  *     token/shingle sets are DISJOINT across replicas — each replica
  *     reproduces the original's near-dup pair structure exactly and adds
  *     zero cross-replica pairs (id-offset by r·10⁷).
  *   - embeddings: replica r rotates the vector left by r components —
  *     intra-replica dot products (and their quantized integers) are
  *     rotation-invariant so each replica reproduces the original pair
  *     structure; cross-replica similarities scramble to noise.
  *
  * Usage: runMain graft.tools.ScaleTenX [factor] [outDir] [query...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32). */
object ScaleTenX {
  private val HeavyBand = Seq(
    "q40_minhash_neardup", "q74_neardup_clusters", "q82_minhash_portable",
    "q83_simhash_portable", "q84_embedlsh_portable", "q97_embed_clusters")

  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale10x"
    val queries = if (args.length > 2) args.drop(2).toSeq else HeavyBand
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val scaledDocs = (0 until factor).map { r =>
      if (r == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
        .withColumn("text",
          array_join(transform(split(col("text"), " "), t => concat(lit(s"r${r}x"), t)), " "))
    }.reduce(_ unionByName _)
    val dim = embs.select(max(size(col("embedding")))).head().getInt(0)
    val scaledEmbs = (0 until factor).map { r =>
      if (r == 0) embs
      else embs
        .withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
        .withColumn("embedding",
          concat(slice(col("embedding"), r + 1, dim - r), slice(col("embedding"), 1, r)))
    }.reduce(_ unionByName _)
    scaledDocs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaledEmbs.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val nd = spark.read.parquet(s"$outDir/documents.parquet").count()
    val ne = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    println(s"[scale10x] built $outDir: $nd docs, $ne vectors (${factor}x $srcDir)")

    def medianTime(name: String, dir: String, reps: Int = 3): Double = {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        s
      }
      times.sorted.apply(reps / 2)
    }

    Tables.register(spark, srcDir)
    spark.sql("SELECT COUNT(*) FROM documents").collect() // warmup
    println("| query | sf0.1 (s) | 10x (s) | ratio |")
    println("|---|---|---|---|")
    queries.foreach { q =>
      val base = medianTime(q, srcDir)
      val scaled = medianTime(q, outDir)
      println(f"| $q | $base%.2f | $scaled%.2f | ${scaled / base}%.1f |")
    }

    // Sizing-rule demonstration: the q84 entry pins bits=6 (the oracle
    // constant = recommendedBits at sf0.1's 2,000 vectors); at 10× the
    // rule says recommendedBits(20,000, 32) = 10 — rerun the same
    // pipeline with rule-derived bits to show occupancy, not the
    // operator, is what grows.
    if (queries.contains("q84_embedlsh_portable")) {
      val sizedBits = graft.operators.Similarity.recommendedBits(ne, 32)
      def sizedRun(): Double = {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.operators.Similarity.portableEmbedPairs(
            Tables.table(spark, outDir, "embeddings"), "vec_id", "embedding",
            minScore = 25000000L, bits = sizedBits).count()
          (System.nanoTime() - t0) / 1e9
        }
        times.sorted.apply(1)
      }
      println(f"[scale10x] q84 pipeline at 10x with rule-derived bits=$sizedBits: ${sizedRun()}%.2f s (vs pinned bits=6 above)")
    }
    spark.stop()
  }
}
