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

    def run(tag: String, parts: Int, noData: Boolean,
            provider: Option[String] = None, availableNow: Boolean = false,
            maxFilesPerTrigger: Option[Int] = None): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData)
      provider match {
        case Some(c) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", c)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      val t0 = System.nanoTime()
      // maxFilesPerTrigger is a READ option, not a conf — rebuild the
      // reader with it applied (same footer-sniff normalization as
      // StreamOps.eventsStream)
      val base = maxFilesPerTrigger match {
        case Some(m) =>
          val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
          val schema = org.apache.spark.sql.types.StructType(
            StreamOps.rawEventsSchema.map(f =>
              if (f.name == "ts") f.copy(dataType = tsType) else f))
          val raw = spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .option("maxFilesPerTrigger", m)
            .parquet(dir)
          if (tsType == org.apache.spark.sql.types.LongType)
            raw.withColumn("ts",
              org.apache.spark.sql.functions.timestamp_micros(
                org.apache.spark.sql.functions.expr("ts div 1000")))
          else raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case None => StreamOps.eventsStream(spark, dir)
      }
      val df = StreamOps.attributionPairs(base, "click", "purchase", 1800L)
      val writer = df.writeStream.format("memory").queryName(s"sb_$tag").outputMode("append")
      val q =
        if (availableNow)
          writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        else writer.start()
      try { if (availableNow) q.awaitTermination() else q.processAllAvailable() }
      finally q.stop()
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
    // Round-17 verdict #7 — the per-major-bump re-receipt on Spark 4.1:
    // trigger availability, state-store provider, maxFilesPerTrigger
    run("p32_availnow", 32, true, availableNow = true)
    run("p32_rocksdb", 32, true,
      provider = Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    run("p32_mfpt1", 32, true, maxFilesPerTrigger = Some(1))
    run("p32_again", 32, true) // defaults re-run, same-session noise floor
    spark.stop()
  }
}
