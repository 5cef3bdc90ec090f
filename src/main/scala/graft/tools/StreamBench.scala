package graft.tools

import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession

/** A/B harness for streaming micro-batch overheads: state partition
  * count and no-data micro-batches are the two knobs that dominate
  * small-input streaming latency (dev tool, not part of the contract). */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(tag: String, parts: Int, noData: Boolean): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData)
      val t0 = System.nanoTime()
      val df = StreamOps.attributionPairs(StreamOps.eventsStream(spark, dir),
        "click", "purchase", 1800L)
      val q = df.writeStream.format("memory").queryName(s"sb_$tag").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val n = spark.table(s"sb_$tag").count()
      val prog = q.recentProgress.map { p =>
        val d = p.durationMs
        s"batch=${p.batchId} rows=${p.numInputRows} trigger=${d.get("triggerExecution")}ms " +
          s"addBatch=${d.get("addBatch")}ms getBatch=${d.get("getBatch")}ms " +
          s"planning=${d.get("queryPlanning")}ms wal=${d.get("walCommit")}ms " +
          s"state=${d.get("commitOffsets")}ms latestOffset=${d.get("latestOffset")}ms"
      }.mkString(" | ")
      println(f"[streambench] $tag parts=$parts noData=$noData rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s :: $prog")
    }
    run("warm", 32, true) // warmup (session + codegen)
    run("p32_nd", 32, true)
    run("p32", 32, false)
    run("p8", 8, false)
    run("p4", 4, false)
    run("p8_nd", 8, true)
    spark.stop()
  }
}
