package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew/partitioning utilities: salted join and salted aggregation must be
  * result-identical to their plain forms. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // one hot key (90% of rows) + uniform tail
    val big = ((1 to 900).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"w$i")))
      .toDF("k", "payload")
    val dim = (1 to 101).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(big, dim, "k", saltBuckets = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 1000)
  }

  test("saltedJoin preserves left-join misses") {
    val big = Seq((1L, "a"), (2L, "b"), (99L, "miss")).toDF("k", "p")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "n")
    val got = Scale.saltedJoin(big, dim, "k", 4, "left")
      .select("k", "p", "n").collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, "a", "x"), Seq(2L, "b", "y"), Seq(99L, "miss", null)))
  }

  test("saltedCountSum equals plain groupBy aggregate") {
    Tables.register(spark, TestSpark.sf0001)
    val orders = spark.table("orders")
    val plain = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    val salted = Scale.saltedCountSum(orders, "o_custkey", "o_totalprice", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(salted == plain)
  }

  test("coPartition makes both sides hash-partitioned on the key") {
    val (a, b) = Scale.coPartition(
      Seq((1L, "a")).toDF("k", "v"), Seq((1L, "b")).toDF("k", "w"), "k", 4)
    assert(a.rdd.getNumPartitions == 4 && b.rdd.getNumPartitions == 4)
  }

  test("ntileByQuantiles approximates exact NTILE within boundary tolerance") {
    Tables.register(spark, TestSpark.sf0001)
    val monetary = spark.sql(
      "SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary " +
        "FROM orders GROUP BY o_custkey")
    val exact = spark.sql(
      "SELECT o_custkey, NTILE(4) OVER (ORDER BY monetary, o_custkey) AS nt FROM " +
        "(SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary " +
        "FROM orders GROUP BY o_custkey) t")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val approx = Scale.ntileByQuantiles(monetary, "monetary", 4, "nt")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(approx.values.toSet == Set(1, 2, 3, 4), "all buckets populated")
    // bucket assignment may differ by at most one at quantile boundaries
    // (.toSeq matters: Map.keys is a Set and Set.map would dedup the drifts)
    val drift = exact.keys.toSeq.map(k => math.abs(exact(k) - approx(k)))
    assert(drift.max <= 1, s"max drift ${drift.max}")
    assert(drift.count(_ == 0).toDouble / exact.size > 0.9, "≥90% exact agreement")
  }

  test("streaming dedup emits each key once (stateful flatMapGroupsWithState)") {
    import graft.streaming.StreamOps
    // duplicate-heavy stream: same user ids appear many times
    val events = StreamOps.eventsStream(spark, TestSpark.sf0001)
    val deduped = StreamOps.runAppend(spark,
      StreamOps.streamingDedup(events, "user_id"), "dedup_stream")
    val keys = deduped.select("k").collect().map(_.getString(0))
    assert(keys.length == keys.distinct.length, "no key emitted twice")
    val batchDistinct = Tables.table(spark, TestSpark.sf0001, "events")
      .select("user_id").distinct().count()
    assert(keys.length == batchDistinct)
  }

  test("hashSplit is deterministic, disjoint, and near the requested ratio") {
    val docs = Tables.table(spark, TestSpark.sf01, "documents")
    val s1 = Scale.hashSplit(docs, "doc_id", 80)
    val s2 = Scale.hashSplit(docs, "doc_id", 80)
    val c1 = s1.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c2 = s2.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c1 == c2, "same split on every run")
    val total = c1.values.sum.toDouble
    assert(math.abs(c1("train") / total - 0.8) < 0.05, s"ratio ${c1("train") / total}")
    // a key never appears in both splits
    val overlap = s1.filter(col("split") === "train").select("doc_id")
      .intersect(s1.filter(col("split") === "test").select("doc_id")).count()
    assert(overlap == 0)
  }

  test("weightedMix respects weights and is reproducible") {
    val docs = Tables.table(spark, TestSpark.sf01, "documents")
    val n = docs.count().toDouble
    val mixA = Scale.weightedMix(Seq((docs, 0.5), (docs, 0.1)), seed = 7L)
    val mixB = Scale.weightedMix(Seq((docs, 0.5), (docs, 0.1)), seed = 7L)
    assert(mixA.count() == mixB.count(), "seeded sampling reproduces")
    assert(math.abs(mixA.count() / n - 0.6) < 0.1, s"weight sum off: ${mixA.count() / n}")
  }

  test("stratifiedSample applies per-stratum fractions") {
    val docs = Tables.table(spark, TestSpark.sf01, "documents")
    val fracs = Map("en" -> 0.5, "de" -> 0.1)
    val sampled = Scale.stratifiedSample(docs, "lang", fracs, seed = 7L)
    val base = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sampled.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet.subsetOf(fracs.keySet), "unlisted strata drop to zero")
    fracs.foreach { case (k, f) =>
      val ratio = got.getOrElse(k, 0L).toDouble / base(k)
      assert(math.abs(ratio - f) < 0.15, s"$k ratio $ratio vs $f")
    }
  }
}
