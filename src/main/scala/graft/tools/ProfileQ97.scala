package graft.tools

import graft.operators.{Checkpoints, Similarity, TextDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B profile of the q97 clustering stage at 10× (dev tool backing the
  * round-15 contraction receipt): materializes the q84 verified pair set
  * once to parquet, then times the contraction-prelude
  * `connectedComponents` against the pre-round-15 full-edge-set loop
  * (`hashMinLoop` — the factored former inline body) over `reps` runs,
  * reporting min and median (the host is noisy-neighbor contended, so
  * min-of-reps is the calibrated comparator — the bench_expected rule).
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
    bench("NEW contraction-prelude CC (forced)") {
      TextDedup.connectedComponents(edges, contractionMinEdges = 0L)
    }
    bench("SHIPPED regime-gated CC") {
      TextDedup.connectedComponents(edges)
    }
    bench("OLD full-edge-set loop CC") {
      val sym = Checkpoints.cut(
        edges.select(col("src"), col("dst"))
          .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
          .distinct(),
        eager = false)
      val labels0 = Checkpoints.cut(
        sym.select(col("src").as("id")).distinct().withColumn("cluster", col("id")),
        eager = true)
      val out = TextDedup.hashMinLoop(sym, labels0, 25)
      Checkpoints.free(sym)
      out
    }
    spark.stop()
  }
}
