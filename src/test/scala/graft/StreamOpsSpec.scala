package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q38(E): streaming output on a closed input equals the batch answer
  * (SURVEY.md §5 item 5). */
class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming hourly window equals batch on closed input") {
    val streamed = StreamOps.runToCompletion(spark,
      StreamOps.hourlyByType(StreamOps.eventsStream(spark, TestSpark.sf0001)),
      "stream_hourly")
      .orderBy("h", "event_type").collect()

    val batch = StreamOps.hourlyByType(
      Tables.table(spark, TestSpark.sf0001, "events"), withWatermarkCol = false)
      .orderBy("h", "event_type").collect()

    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
    assert(batch.nonEmpty)
  }

  test("streaming hourly matches the Q32 SQL corpus answer on counts") {
    Tables.register(spark, TestSpark.sf0001)
    val q32 = spark.sql(Corpus.byId("q32_time_bucket").sparkSql)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamed = StreamOps.runToCompletion(spark,
      StreamOps.hourlyByType(StreamOps.eventsStream(spark, TestSpark.sf0001)),
      "stream_hourly_q32")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    // q32 is LIMIT 100; every limited row must agree with the stream result
    q32.foreach { case (k, n) => assert(streamed(k) == n, s"bucket $k") }
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "click", 1.0, "{}"),
      (2L, "2024-01-01 00:10:00", 10L, "click", 2.0, "{}"),  // same session (gap 30m)
      (3L, "2024-01-01 02:00:00", 10L, "click", 3.0, "{}"),  // new session
      (4L, "2024-01-01 00:05:00", 20L, "view", 4.0, "{}")
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    // batch evaluation of session_window (same expression semantics)
    val sessions = events.groupBy(session_window(col("ts"), "30 minutes").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sessions.count(_._1 == 10L) == 2, "user 10 has two sessions")
    assert(sessions.filter(_._1 == 10L).map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(sessions.count(_._1 == 20L) == 1)
  }
}
