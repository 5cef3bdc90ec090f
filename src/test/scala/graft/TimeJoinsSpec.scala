package graft

import graft.operators.TimeJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed range/as-of joins must equal the naive non-equi formulation
  * (which Spark executes as BNL/cartesian — correct but unscalable). */
class TimeJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("rangeJoin equals the naive non-equi join on real events") {
    val ev = Tables.table(spark, TestSpark.sf0001, "events").limit(300)
      .select("event_id", "ts")
    val naive = ev.as("a").join(ev.as("b"),
        col("b.ts") >= col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 300 SECOND"))
      .select(col("a.event_id").as("l"), col("b.event_id").as("r"))
      .as[(Long, Long)].collect().toSet
    val bucketed = TimeJoins.rangeJoin(ev, ev, "ts", "ts", 300L)
      .select(col("l_event_id").as("l"), col("r_event_id").as("r"))
      .as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("asofJoin picks the latest quote at or before each trade") {
    val trades = Seq(
      (1L, "A", "2024-01-01 10:00:30"),
      (2L, "A", "2024-01-01 10:02:00"),
      (3L, "B", "2024-01-01 10:00:10"),
      (4L, "A", "2024-01-01 09:00:00")  // no quote within tolerance
    ).map { case (id, k, t) => (id, k, ts(t)) }.toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, "A", "2024-01-01 10:00:00", 100.0),
      (11L, "A", "2024-01-01 10:00:25", 101.0),
      (12L, "A", "2024-01-01 10:01:55", 102.0),
      (13L, "B", "2024-01-01 10:00:05", 50.0)
    ).map { case (id, k, t, p) => (id, k, ts(t), p) }.toDF("quote_id", "sym", "t", "px")
    val got = TimeJoins.asofJoin(trades, quotes, "sym", "t", "t", 60L)
      .select(col("l_trade_id"), col("r_quote_id"), col("r_px"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == (11L, 101.0), "latest quote ≤ trade time")
    assert(got(2L) == (12L, 102.0))
    assert(got(3L) == (13L, 50.0))
    assert(!got.contains(4L), "no quote within tolerance → dropped")
  }

  test("asofJoin equals naive formulation on real events (user_id as key)") {
    val ev = Tables.table(spark, TestSpark.sf0001, "events").limit(400)
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view").select("event_id", "user_id", "ts")
    val naive = clicks.as("c").join(views.as("v"),
        col("c.user_id") === col("v.user_id") &&
          col("v.ts") <= col("c.ts") &&
          col("v.ts") >= col("c.ts") - expr("INTERVAL 3600 SECOND"))
      .groupBy(col("c.event_id").as("click_id"))
      .agg(max(struct(col("v.ts"), col("v.event_id"))).as("best"))
      .select(col("click_id"), col("best.event_id").as("view_id"))
      .as[(Long, Long)].collect().toMap
    val bucketed = TimeJoins.asofJoin(clicks, views, "user_id", "ts", "ts", 3600L)
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toMap
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("asofJoin with leftUniqueKey matches the synthesized-id path and drops monotonically_increasing_id from the plan") {
    val ev = Tables.table(spark, TestSpark.sf0001, "events").limit(400)
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view").select("event_id", "user_id", "ts")
    val keyed = TimeJoins.asofJoin(clicks, views, "user_id", "ts", "ts", 3600L,
      leftUniqueKey = Some("event_id"))
    val synth = TimeJoins.asofJoin(clicks, views, "user_id", "ts", "ts", 3600L)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_event_id"), col("r_event_id")).as[(Long, Long)].collect().toMap
    assert(pairs(keyed) == pairs(synth))
    assert(pairs(keyed).nonEmpty)
    val plan = keyed.queryExecution.analyzed.toString
    assert(!plan.contains("monotonically_increasing_id"),
      "unique-key path must not synthesize a nondeterministic row id")
    assert(synth.queryExecution.analyzed.toString.contains("monotonically_increasing_id"))
  }
}
