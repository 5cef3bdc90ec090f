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
}
