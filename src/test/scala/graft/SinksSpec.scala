package graft

import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned/sized writes round-trip and prune correctly. */
class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned parquet round-trips and prunes on the partition column") {
    val docs = Tables.table(spark, TestSpark.sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sinks.writePartitionedParquet(docs, dir, Seq("lang"))
    // directory layout: one subdir per language
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.exists(_.startsWith("lang=")))
    val back = Sources.parquet(spark, dir)
    assert(back.count() == docs.count())
    // partition pruning: the filtered plan must only touch the en partition
    val filtered = back.filter(col("lang") === "en")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(filtered.count() == docs.filter(col("lang") === "en").count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("sized parquet writes the requested file count") {
    val docs = Tables.table(spark, TestSpark.sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_sized").toString
    Sinks.writeSizedParquet(docs, dir, targetFiles = 3)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 3)
    assert(Sources.parquet(spark, dir).count() == docs.count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("distributed csv export round-trips row count") {
    val dim = Tables.table(spark, TestSpark.sf0001, "nation")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Sinks.writeCsvDistributed(dim, dir)
    assert(Sources.csv(spark, dir).count() == 25)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("sorted parquet layout: files cover disjoint ascending ranges") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val docs = Tables.table(spark, TestSpark.sf0001, "documents")
    Sinks.writeSortedParquet(docs, s"$tmp/docs", Seq("doc_id"), targetFiles = 4)
    val files = new java.io.File(s"$tmp/docs").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length >= 2, "range partitioning produced multiple files")
    // per-file [min,max] ranges must not overlap — that is what lets a
    // selective reader skip whole files/row groups via footer stats
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi >= $lo2")
      case _ =>
    }
    // round-trip completeness
    assert(spark.read.parquet(s"$tmp/docs").count() == docs.count())
  }

  test("manifest-pruned read: selective range touches fewer files, same answer") {
    import graft.sources.SkipStats
    val tmp = java.nio.file.Files.createTempDirectory("graft_skip").toString
    val docs = Tables.table(spark, TestSpark.sf01, "documents")
    Sinks.writeSortedParquet(docs, s"$tmp/docs", Seq("doc_id"), targetFiles = 8)
    // narrow range: ~one file's worth of ids out of 8 range-partitioned
    // files (2 if the range straddles a sampled boundary)
    val (pruned, stats) = Sinks.readRangeSkipping(spark, s"$tmp/docs", "doc_id",
      lo = BigDecimal(100), hi = BigDecimal(140))
    assert(stats.filesTotal == 8 && stats.filesRead <= 2 && stats.filesRead >= 1,
      s"expected <=2 of 8 files, got $stats")
    val expect = docs.filter(col("doc_id").between(100, 140))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pruned.select("doc_id").collect().map(_.getLong(0)).toSet == expect)
    // a range outside the data reads zero files and returns zero rows
    val (empty, noneStats) = Sinks.readRangeSkipping(spark, s"$tmp/docs", "doc_id",
      lo = BigDecimal(10000000), hi = BigDecimal(20000000))
    assert(noneStats.filesRead == 0 && empty.count() == 0)
    // full range reads everything — pruning never loses data
    val (all, allStats) = Sinks.readRangeSkipping(spark, s"$tmp/docs", "doc_id",
      lo = BigDecimal(0), hi = BigDecimal(10000000))
    assert(allStats.filesRead == 8 && all.count() == docs.count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
