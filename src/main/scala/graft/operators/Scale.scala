package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the partitioning/skew toolkit the 100 TB posture
  * calls for (build brief: "broadcast small dims, repartition/bucketing for
  * co-located joins, salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join splitting handles most skew at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even a
  * split partition exceeds memory, or when the skewed side feeds an
  * aggregation (AQE does not salt aggregates).
  */
object Scale {

  /** Deterministic per-row salt in [0, buckets): hash of the whole row —
    * no rand(), so retries/speculative tasks agree. */
  def rowSalt(allCols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(allCols: _*), lit(buckets.toLong)).cast("int")

  /** Skew-safe equi-join: the large (skewed) side gets a deterministic
    * row salt; every row of the smaller side is replicated to all salt
    * values. The join key becomes (key, salt), splitting each hot key's
    * rows across `saltBuckets` reducers. Use when AQE's skew splitting is
    * not enough (e.g. the hot key's single value exceeds executor memory).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = skewed.withColumn("__salt",
      rowSalt(skewed.columns.map(skewed(_)).toSeq, saltBuckets))
    val replicated = other.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * count/sum-style aggregates first per (key, salt), then per key.
    * Catalyst's own partial aggregation usually suffices; this shape is
    * for UDAF-like aggregations with expensive per-group state. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltBuckets: Int): DataFrame =
    df.withColumn("__salt", rowSalt(df.columns.map(df(_)).toSeq, saltBuckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("total"))

  /** Write a table bucketed + sorted on the join key: downstream equi-joins
    * and aggregations on `keys` skip the shuffle entirely (bucket pruning +
    * sort-merge without exchange). The standard prep for fact tables that
    * join on the same key every day. */
  def writeBucketed(df: DataFrame, tableName: String, keys: Seq[String],
                    numBuckets: Int): Unit = {
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
    ()
  }

  /** Co-partition two frames on the join key ahead of repeated joins —
    * the in-session analogue of bucketing. */
  def coPartition(a: DataFrame, b: DataFrame, key: String, partitions: Int): (DataFrame, DataFrame) =
    (a.repartition(partitions, col(key)), b.repartition(partitions, col(key)))

  /** Scale-safe NTILE: `NTILE(n) OVER (ORDER BY x)` forces every row into
    * ONE partition (Spark warns exactly this). For billions of rows the
    * distributed equivalent is: compute the n-1 quantile boundaries once
    * (approx_percentile — a tiny aggregate), broadcast them, and bucket
    * each row with a scan-local comparison. Bucket numbering matches
    * NTILE's ascending convention up to boundary ties/approximation —
    * exact NTILE also splits equal values across buckets by position,
    * which no value-based method can reproduce. */
  def ntileByQuantiles(df: DataFrame, valueCol: String, n: Int,
                       outCol: String = "ntile", accuracy: Int = 10000): DataFrame = {
    val probs = (1 until n).map(_.toDouble / n)
    val boundaries = df.select(
      percentile_approx(col(valueCol), typedLit(probs), lit(accuracy)).as("b"))
      .head().getSeq[Any](0).map {
        case d: java.lang.Double => d.doubleValue()
        case d: java.math.BigDecimal => d.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
      }
    val bucket = boundaries.zipWithIndex.foldRight(lit(n): Column) {
      case ((b, i), acc) => when(col(valueCol).cast("double") <= b, lit(i + 1)).otherwise(acc)
    }
    df.withColumn(outCol, bucket)
  }

  /** Deterministic train/test split by key hash: the same key lands in the
    * same split on every run, every machine, every scale factor — the only
    * split discipline that survives re-runs over a growing 100 TB corpus
    * (random sampling re-deals on each execution). pmod keeps negative
    * hashes in range. */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int,
                outCol: String = "split"): DataFrame =
    df.withColumn(outCol,
      when(pmod(xxhash64(col(keyCol)), lit(100)) < trainPct, lit("train"))
        .otherwise(lit("test")))

  /** Weighted corpus mixture for training-data composition: each source is
    * Bernoulli-sampled at its weight and unioned. Seeded → reproducible;
    * sampling happens at the scan (no shuffle); weights > 1.0 are not
    * supported (use explode-based duplication for upsampling). */
  def weightedMix(sources: Seq[(DataFrame, Double)], seed: Long): DataFrame = {
    require(sources.nonEmpty && sources.forall(_._2 <= 1.0))
    sources.map { case (df, w) => df.sample(withReplacement = false, w, seed) }
      .reduce(_ unionByName _)
  }

  /** Stratified sample with per-stratum fractions (e.g. per-language
    * quotas in a multilingual corpus). Seeded `sampleBy` — one scan. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
