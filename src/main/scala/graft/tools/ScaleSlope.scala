package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-cost vs marginal-cost measurement: run the canonical aggregate
  * (q04 shape) on 1× and 8× lineitem and report the slope. Dev tool backing
  * the BASELINE.md scale analysis. */
object ScaleSlope {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, dir)
    val li = spark.table("lineitem")
    val li8 = (1 to 8).map(_ => li).reduce(_ unionAll _)
    li8.createOrReplaceTempView("lineitem8")
    def q(t: String) =
      s"SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS total_sales " +
        s"FROM $t GROUP BY l_suppkey ORDER BY total_sales DESC, l_suppkey LIMIT 100"
    def time(name: String, sql: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[slope] $name: $dt%.3f s")
      dt
    }
    time("warmup 1x", q("lineitem"))
    val t1 = (1 to 3).map(i => time(s"1x run$i", q("lineitem"))).min
    val t8 = (1 to 3).map(i => time(s"8x run$i", q("lineitem8"))).min
    println(f"[slope] sql agg: best 1x=$t1%.3f s, best 8x=$t8%.3f s, marginal per extra 7x data = ${(t8 - t1) / 7}%.4f s/sf0.1")

    // tier-E slope: MinHash signature+banding (the scan-linear stage) on 1x/8x documents
    import org.apache.spark.sql.DataFrame
    import graft.operators.TextDedup
    val docs = spark.table("documents")
    val docs8 = (0 until 8).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionAll _)
    def sigTime(name: String, df: DataFrame): Double = {
      val t0 = System.nanoTime()
      TextDedup.signatureFrame(df, "doc_id", "text", 2, 64)
        .select(expr("bit_xor(xxhash64(__sig))")).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[slope] $name: $dt%.3f s"); dt
    }
    sigTime("minhash warmup", docs)
    val s1 = (1 to 2).map(i => sigTime(s"minhash 1x run$i", docs)).min
    val s8 = (1 to 2).map(i => sigTime(s"minhash 8x run$i", docs8)).min
    println(f"[slope] minhash signatures: 1x(5k docs)=$s1%.3f s, 8x(40k)=$s8%.3f s, marginal = ${(s8 - s1) / 7}%.4f s per 5k docs")
    spark.stop()
  }
}
