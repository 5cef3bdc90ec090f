package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Runs corpus queries under `local-cluster` — separate executor JVMs,
  * real serialized task dispatch, network shuffle and broadcast — the
  * closest single-machine approximation of a multi-executor deployment.
  * Catches executor-serialization bugs `local[n]` can never see (closures
  * capturing driver-only state, non-serializable expression trees).
  *
  * Usage: runMain graft.tools.ClusterCheck [ids...] (default: a
  * shuffle/broadcast/window/stream-heavy subset). */
object ClusterCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // worker-launched executor JVMs need: our compiled classes on their
    // classpath, the same JDK17 --add-opens set the driver gets from
    // build.sbt, and SPARK_SCALA_VERSION in the env (normally exported by
    // bin/load-spark-env.sh; the in-JVM launcher does not infer it in a
    // packaged distro — run with SPARK_SCALA_VERSION=2.13)
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,8,2048]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory", "2g")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deployment-mode proof: with SPARK_GRAFT_CHECKPOINT_DIR set, every
    // Checkpoints.cut in the iterative operators (q74/q82/q97) goes
    // through RELIABLE checkpointing against this shared dir instead of
    // executor-local blocks — run `ClusterCheck q74_neardup_clusters
    // q82_minhash_portable q97_embed_clusters` with it set to prove the
    // reliable path end-to-end on real executor JVMs
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").foreach(spark.sparkContext.setCheckpointDir)
    val ids = if (args.toSeq == Seq("all")) SparkEntry.queries.keys.toSeq.sorted
    else if (args.nonEmpty) args.toSeq else Seq(
      "q04_agg_rank", "q11_join4_chain", "q16_topn_window", "q29_not_in_anti",
      "q40_minhash_neardup", "q44_cosine_topk", "q55_rollup", "q59_corr_scalar",
      "q65_stream_join", "q68_contamination")
    var failed = 0
    ids.foreach { id =>
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(id)(spark, dir).count()
        println(f"[cluster] $id rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        failed += 1
        println(s"[cluster] $id FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"[cluster] executors=${spark.sparkContext.statusTracker.getExecutorInfos.length - 1} failed=$failed")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
