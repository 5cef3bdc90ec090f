package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of the q84 multi-probe pipeline at 10×
  * (dev tool backing the round-13 BASELINE.md numbers): signatures,
  * candidate generation pre/post distinct, full verification — so the
  * next lever targets the measured bottleneck, not the assumed one.
  * Usage: runMain graft.tools.ProfileQ84 [dir] (default the ScaleTenX
  * 10× dir). */
object ProfileQ84 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.IntDot.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val bits = Similarity.recommendedBits(n, 32)
    val tables = Similarity.recommendedTablesProbed(bits)
    val probes = bits
    println(s"[profq84] n=$n bits=$bits tables=$tables probes=$probes")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profq84] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val planes = Similarity.portableHyperplanes(64, tables, bits)
    val q = emb.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("__qv"))
    def keys = q.select(col("vec_id"),
      posexplode(array(planes.map { tbl =>
        tbl.zipWithIndex.map { case (p, b) =>
          when(Similarity.intDot(col("__qv"), typedLit(p.toSeq)) >= 0, lit(1L << b))
            .otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*)).as(Seq("__t", "__bkt")))

    time("signatures (home keys count)") { keys.count() }
    val home = keys.groupBy("__t", "__bkt")
      .agg(collect_list(col("vec_id")).as("__ids"))
      .filter(size(col("__ids")) <= graft.operators.TextDedup.DefaultMaxBucketSize)
    time("home buckets (grouped)") { home.count() }
    // DIRECTIONAL probes (0→1 flips), matching the shipped
    // Similarity.probedBucketKeys — the earlier symmetric-XOR stage
    // numbers (44.9M raw candidates) are preserved in BASELINE.md as
    // the measurement that motivated the two verification regimes
    val probed = keys.select(col("vec_id"), col("__t"),
      explode(filter(array((col("__bkt") +: (0 until probes).map(j =>
        when(col("__bkt").bitwiseAND(lit(1L << j)) === 0L,
          col("__bkt").bitwiseOR(lit(1L << j))))): _*),
        x => x.isNotNull)).as("__bkt"))
    time("probe keys") { probed.count() }
    val raw = probed.join(home, Seq("__t", "__bkt"))
      .select(col("vec_id").as("__pid"), explode(col("__ids")).as("__hid"))
      .filter(col("__pid") =!= col("__hid"))
    time("candidates pre-distinct") { println("  n=" + raw.count()) }
    val cands = raw
      .select(least(col("__pid"), col("__hid")).as("id_a"),
        greatest(col("__pid"), col("__hid")).as("id_b"))
      .distinct()
    time("candidates post-distinct") { println("  n=" + cands.count()) }
    val verified = cands
      .join(q.select(col("vec_id").as("id_a"), col("__qv").as("__va")), Seq("id_a"))
      .join(q.select(col("vec_id").as("id_b"), col("__qv").as("__vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.intDot(col("__va"), col("__vb")).as("score"))
      .filter(col("score") >= graft.SparkEntry.EmbedMinScore)
    time("full pipeline (verified count)") { println("  n=" + verified.count()) }
    time("shuffle-regime end-to-end (no row hint)") {
      Similarity.portableEmbedPairs(emb, "vec_id", "embedding",
        minScore = graft.SparkEntry.EmbedMinScore,
        tables = tables, bits = bits, probes = probes).count()
    }
    time("declared entry end-to-end (row hint -> broadcast regime)") {
      Similarity.portableEmbedPairs(emb, "vec_id", "embedding",
        minScore = graft.SparkEntry.EmbedMinScore,
        tables = tables, bits = bits, probes = probes, corpusRowsHint = n).count()
    }
    // variant B: broadcast the vector side of both verify joins
    val verifiedB = cands
      .join(broadcast(q.select(col("vec_id").as("id_a"), col("__qv").as("__va"))), Seq("id_a"))
      .join(broadcast(q.select(col("vec_id").as("id_b"), col("__qv").as("__vb"))), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.intDot(col("__va"), col("__vb")).as("score"))
      .filter(col("score") >= graft.SparkEntry.EmbedMinScore)
    time("variant B: broadcast verify joins") { println("  n=" + verifiedB.count()) }
    // variant C: B + no pre-verify distinct (dedup survivors instead)
    val verifiedC = raw
      .select(least(col("__pid"), col("__hid")).as("id_a"),
        greatest(col("__pid"), col("__hid")).as("id_b"))
      .join(broadcast(q.select(col("vec_id").as("id_a"), col("__qv").as("__va"))), Seq("id_a"))
      .join(broadcast(q.select(col("vec_id").as("id_b"), col("__qv").as("__vb"))), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.intDot(col("__va"), col("__vb")).as("score"))
      .filter(col("score") >= graft.SparkEntry.EmbedMinScore)
      .distinct()
    time("variant C: broadcast + post-verify dedup") { println("  n=" + verifiedC.count()) }
    // Shuffle-regime dedup experiments (the >BroadcastVerifyMaxRows
    // path): the distinct()'s partial HashAggregate over a nearly-unique
    // 2-long key stream is suspected thrash — compare one-exchange
    // alternatives that skip partial aggregation.
    val rawPairs = raw
      .select(least(col("__pid"), col("__hid")).as("id_a"),
        greatest(col("__pid"), col("__hid")).as("id_b"))
    time("variant D: repartition + mapPartitions local dedup") {
      import spark.implicits._
      val n = rawPairs.repartition(col("id_a"), col("id_b"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          // exact for ids < 2^32 (this corpus: ≤ 9e7) — a shipped form
          // would dedup the exact pair, not a hash
          val seen = new java.util.HashSet[java.lang.Long](1 << 20)
          it.filter { case (a, b) => seen.add((a << 32) | (b & 0xffffffffL)) }
        }.count()
      println("  n=" + n)
    }
    time("variant E: distinct at 128 shuffle partitions") {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "128")
      try println("  n=" + rawPairs.distinct().count())
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.stop()
  }
}
