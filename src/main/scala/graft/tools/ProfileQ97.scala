package graft.tools

import graft.operators.{Checkpoints, Similarity, TextDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B profile of the q97 clustering stage (dev tool backing the CC
  * regime receipts): materializes the q84 verified pair set once to
  * parquet, then times BOTH branches of the shipped adaptive
  * `connectedComponents` — the flat hash-min loop and the round-1
  * contraction (each forced via the threshold parameter) — over `reps`
  * runs, reporting min and median (the host is noisy-neighbor
  * contended, so min-of-reps is the calibrated comparator — the
  * bench_expected rule).
  *
  * VERDICT HISTORY: round 15 measured the contraction as a loss at
  * small scale (+0.4 s at 18k pairs, neutral at 2.9M symmetric edges,
  * 11.88 vs 9.70 s at 32M) and reverted it; rounds 16/17 re-ran the
  * small-scale A/B per round (always within variance at ≤32M). Round 17
  * extended the A/B past the crossover with this harness's at-scale
  * mode and the verdict FLIPPED — contraction 65.6 vs 84.2 s at 150M
  * symmetric edges, 590.1 vs 978.1 s at 1.23B — so the operator now
  * switches adaptively at `TextDedup.CcContractionMinEdges` (100M).
  * The per-round duty of this harness is unchanged: re-check the
  * SMALL-scale wash still holds (the flat branch must stay the winner
  * under the threshold).
  *
  * Usage: runMain graft.tools.ProfileQ97 [dir] [reps] [pairsPath]
  * The optional pairsPath reuses an EXISTING pair table (e.g. the
  * RegimeProbe cross/cc stages' persisted output) instead of building
  * one — the at-scale mode; it additionally applies the cc stage's two
  * deployment knobs (dedupPartitionsFor sizing on the symmetric edge
  * estimate + a reliable checkpoint dir), without which a 600M-pair
  * A/B OOMs at session defaults. The historical per-round A/B
  * (no 3rd arg) keeps the original protocol/conditions. */
object ProfileQ97 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10x"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.IntDot.register(spark)

    val pairsPath =
      if (args.length > 2) args(2) else s"$dir/__profq97_pairs.parquet"
    if (!new java.io.File(pairsPath).exists()) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val bits = Similarity.recommendedBits(n, 32)
      Similarity.portableEmbedPairs(emb, "vec_id", "embedding",
          minScore = graft.SparkEntry.EmbedMinScore,
          tables = Similarity.recommendedTablesProbed(bits), bits = bits,
          probes = bits, corpusRowsHint = n)
        .select("id_a", "id_b").write.mode("overwrite").parquet(pairsPath)
    }
    val pairs = spark.read.parquet(pairsPath).select("id_a", "id_b")
    val nPairs = pairs.count()
    println(s"[profq97] pair set: $nPairs rows")
    if (args.length > 2) {
      spark.sparkContext.setCheckpointDir(s"$dir/__profq97_ckpt")
      val symParts = Similarity.dedupPartitionsFor(2L * nPairs, cpus.toInt)
      spark.conf.set("spark.sql.shuffle.partitions", symParts)
      println(s"[profq97] at-scale mode: symmetric-edge estimate ${2L * nPairs} -> $symParts partitions, reliable ckpt dir")
    }

    def bench(label: String)(f: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (s, n)
      }
      val ts = times.map(_._1).sorted
      println(f"[profq97] $label: min ${ts.head}%.2f s  median ${ts(reps / 2)}%.2f s  (labels=${times.head._2})")
    }

    // both branches of the SHIPPED adaptive operator, forced via the
    // threshold parameter (round 17 — the contraction moved from this
    // profiler's experiment block into TextDedup.contractedCc when the
    // at-scale A/B flipped the r15 verdict; per-vertex equality of the
    // two branches is CcContractionSpec's pin, this harness measures)
    // localMaxEdges = 0 in both arms: this is the flat-vs-contraction
    // A/B — the r17-optimization driver-local regime would otherwise
    // swallow sub-2M-edge fixtures and measure neither branch
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    bench("flat hash-min loop CC (forced)") {
      TextDedup.connectedComponents(edges, contractionMinEdges = Long.MaxValue,
        localMaxEdges = 0L)
    }
    bench("round-1 contraction CC (forced)") {
      TextDedup.connectedComponents(edges, contractionMinEdges = 0L,
        localMaxEdges = 0L)
    }
    spark.stop()
  }
}
