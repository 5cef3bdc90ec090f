package graft.tools

import graft.Tables
import graft.sources.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the data-skipping sink end to end (dev tool backing
  * BASELINE.md): write `documents` range-sorted on doc_id, then answer a
  * selective range query twice — via the manifest-pruned read (files
  * skipped before open) and via a plain directory scan (row-group stats
  * only) — and report files read + wall time + row parity. */
object SkipBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val targetFiles = if (args.nonEmpty) args(0).toInt else 16
    val tableName = if (args.length > 1) args(1) else "documents"
    val keyCol = if (args.length > 2) args(2) else "doc_id"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.table(spark, dir, tableName)
    val n = docs.count()
    val out = s"/tmp/graft_skipbench/$tableName"
    Sinks.writeSortedParquet(docs, out, Seq(keyCol), targetFiles = targetFiles)
    // ~1% selective range in the middle of the key domain
    val Array(mn, mx) = docs.agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val lo = mn + (mx - mn) / 2
    val hi = lo + math.max(1L, (mx - mn) / 100)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once (JIT/codegen), then measure
    spark.read.parquet(out).filter(col(keyCol).between(lo, hi)).count()
    Sinks.readRangeSkipping(spark, out, keyCol, BigDecimal(lo), BigDecimal(hi))._1.count()
    val ((prunedRows, stats), prunedSec) = time {
      val (df, s) = Sinks.readRangeSkipping(spark, out, keyCol, BigDecimal(lo), BigDecimal(hi))
      (df.count(), s)
    }
    val (fullRows, fullSec) = time {
      spark.read.parquet(out).filter(col(keyCol).between(lo, hi)).count()
    }
    println(f"[skip] table=$tableName corpus=$n range=[$lo,$hi] filesTotal=${stats.filesTotal} " +
      f"filesRead=${stats.filesRead} prunedSec=$prunedSec%.3f fullScanSec=$fullSec%.3f " +
      s"rowsMatch=${prunedRows == fullRows} rows=$prunedRows")
    spark.stop()
  }
}
