package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape (SURVEY.md §2.4
  * "Streaming" / Q38(E)): file-source stream → watermark → windowed
  * aggregates. Batch and streaming share the same logical transforms, so
  * streaming output on a closed input must equal the batch answer — that
  * equivalence is the unit-test contract (no DuckDB hashing of streams).
  *
  * Scale notes: the file source at 100 TB is a directory of parquet parts;
  * `maxFilesPerTrigger` bounds micro-batch size, the 10-minute watermark
  * bounds state, and the windowed aggregate shuffles only
  * (window, event_type) partial aggregates — map-side combine applies
  * exactly as in batch.
  */
object StreamOps {

  /** events.parquet writes ts as INT64 TIMESTAMP(NANOS); the stream schema
    * reads it as long and converts to µs timestamps (same convention as
    * graft.Tables). */
  val rawEventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source requires a directory; scope it to the events file
    spark.readStream
      .schema(rawEventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour windowed aggregate with a 10-minute watermark —
    * the streaming form of Q32. Works identically on a batch DataFrame
    * (window() is the same expression), which is how equivalence is tested. */
  def hourlyByType(events: DataFrame, withWatermarkCol: Boolean = true): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("total"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("total"))
  }

  /** Session windows per user: events within `gap` of each other merge into
    * one session (streaming sessionization). */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Run a streaming aggregate over the (closed) input to completion via
    * the memory sink; returns the final result table. Complete mode so all
    * windows emit even though the watermark never passes the last one. */
  def runToCompletion(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
