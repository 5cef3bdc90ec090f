package graft.tools

import graft.operators.{Checkpoints, Similarity, TextDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B profile of the q97 clustering stage (dev tool backing the
  * round-15 contraction receipt): materializes the q84 verified pair set
  * once to parquet, then times the SHIPPED flat hash-min loop against a
  * round-1 graph-CONTRACTION variant (quotient by the first labels,
  * iterate on the contracted edge set — exact by the min-label argument,
  * pinned against union-find while it was shipped) over `reps` runs,
  * reporting min and median (the host is noisy-neighbor contended, so
  * min-of-reps is the calibrated comparator — the bench_expected rule).
  *
  * VERDICT (round 15, why the contraction is NOT shipped): +0.4 s at 18k
  * pairs, neutral at 2.9M symmetric edges (min 4.60 vs 4.77 s), a LOSS
  * at 32M (11.88 vs 9.70 s) — hash-min + pointer jumping converges in a
  * handful of rounds on dense near-dup graphs, so rounds × |E| never
  * outgrows the contraction's own two full-edge passes + distinct.
  *
  * Usage: runMain graft.tools.ProfileQ97 [dir] [reps] */
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

    val pairsPath = s"$dir/__profq97_pairs.parquet"
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
    val pairs = spark.read.parquet(pairsPath)
    println(s"[profq97] pair set: ${pairs.count()} rows")

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

    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    bench("SHIPPED flat hash-min loop CC") {
      TextDedup.connectedComponents(edges)
    }
    // the round-15 contraction EXPERIMENT, kept here (not in the
    // operator) so the negative receipt stays reproducible: one round
    // over the full edge set, quotient, iterate on the contracted graph,
    // compose labels
    bench("EXPERIMENT round-1 contraction CC") {
      val sym = Checkpoints.cut(
        edges.select(col("src"), col("dst"))
          .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
          .distinct(),
        eager = false)
      val labels0 = Checkpoints.cut(
        sym.select(col("src").as("id")).distinct().withColumn("cluster", col("id")),
        eager = true)
      val (labels1, changed1) = TextDedup.ccRound(sym, labels0)
      if (changed1 == 0) {
        Checkpoints.free(sym)
        labels1.select("id", "cluster")
      } else {
        val contracted = Checkpoints.cut(
          sym.join(labels1.select(col("id").as("__sa"), col("cluster").as("__ca")),
              sym("src") === col("__sa"))
            .join(labels1.select(col("id").as("__sb"), col("cluster").as("__cb")),
              sym("dst") === col("__sb"))
            .filter(col("__ca") =!= col("__cb"))
            .select(col("__ca").as("src"), col("__cb").as("dst"))
            .distinct(),
          eager = false)
        val compLabels0 = Checkpoints.cut(
          contracted.select(col("src").as("id")).distinct()
            .withColumn("cluster", col("id")),
          eager = true)
        val comp = TextDedup.hashMinLoop(contracted, compLabels0, 24)
        Checkpoints.free(sym)
        Checkpoints.free(contracted)
        val composed = labels1.as("l")
          .join(comp.select(col("id").as("__ci"), col("cluster").as("__cc")),
            col("l.cluster") === col("__ci"), "left")
          .select(col("l.id").as("id"),
            coalesce(col("__cc"), col("l.cluster")).as("cluster"))
        val out = Checkpoints.cut(composed, eager = true)
        Checkpoints.free(composed)
        out
      }
    }
    spark.stop()
  }
}
