package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** A/B harness for the run-to-completion streaming entries' state
  * partition sizing (SPARK_GRAFT_STREAM_STATE_PARTS): times a band of
  * streaming entries at the current knob value (dev tool; run twice with
  * different env to compare). */
object StreamParts {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val entries = if (args.nonEmpty) args.toSeq else Seq(
      "q149_stream_hll", "q153_stream_cms", "q155_stream_kmv",
      "q156_stream_sample", "q126_stream_dedup", "q166_stream_anomaly",
      "q165_stream_weighted", "q89_stream_sessions", "q51_stream_hourly",
      "q65_stream_join", "q107_stream_static", "q147_stream_bloom",
      "q142_stream_edit")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, dir)
    spark.sql("SELECT COUNT(*) FROM region").collect()
    var total = 0.0
    entries.foreach { id =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(id)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // release checkpoint blocks OUTSIDE the timer (Bench's timing
        // discipline — these numbers are compared against its medians)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        sec
      }
      val med = times.sorted.apply(1)
      total += med
      println(f"[streamparts] $id $med%.2f s")
    }
    println(f"[streamparts] TOTAL $total%.2f s (parts=${sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTS", "4")})")
    spark.stop()
  }
}
