package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Files-read accounting for the manifest-pruned read path. */
final case class SkipStats(filesTotal: Int, filesRead: Int)

/** Write-side counterpart to Sources: the reference's only sink is a
  * driver-side CSV of an already-capped result (graft.Results.writeCsv);
  * a training-data pipeline additionally needs distributed, partitioned,
  * re-readable output. */
object Sinks {

  /** Partitioned parquet: one directory per distinct partition-column
    * tuple. Partition columns should be low-cardinality (date, lang,
    * source) — this is what makes downstream partition PRUNING work: a
    * reader filtering on them never opens the other directories. */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    ()
  }

  /** Size-managed parquet: repartition to a target file count first so the
    * output is neither thousands of tiny files (NN pressure, slow listing)
    * nor a handful of giant ones (no read parallelism). At scale pick
    * targetFiles ≈ bytes / 512 MB. */
  def writeSizedParquet(df: DataFrame, path: String, targetFiles: Int): Unit = {
    df.repartition(targetFiles).write.mode("overwrite").parquet(path)
    ()
  }

  /** Distributed CSV export for results too large to collect (the scale
    * escape hatch from the reference's driver-side CSV). */
  def writeCsvDistributed(df: DataFrame, path: String): Unit = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    ()
  }

  /** Layout-sorted parquet for data skipping: range-partition then sort
    * within partitions on the filter columns, so each row group's min/max
    * statistics cover a narrow value range and a selective reader skips
    * most of the file without touching it. The standard layout move for
    * append-once/read-many 100 TB corpora; `repartitionByRange` keeps the
    * sort global across files (file N's range precedes file N+1's). */
  def writeSortedParquet(df: DataFrame, path: String, sortCols: Seq[String],
                         targetFiles: Int): Unit = {
    df.repartitionByRange(targetFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    writeSkippingManifest(df.sparkSession, path, sortCols.head)
  }

  private val ManifestName = "_graft_manifest.json"
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Per-file min/max manifest over `column` — the file-level analogue of
    * parquet's row-group statistics, and the same planning discipline a
    * table format (Iceberg/Delta) applies: collect file stats ONCE at
    * write time so selective readers prune whole files from the listing
    * without opening them. One distributed pass groups by input file; the
    * collect is one row per FILE (metadata-sized, not data). The
    * underscore-prefixed name keeps Spark's parquet reader from treating
    * the manifest as data. */
  def writeSkippingManifest(spark: SparkSession, path: String, column: String): Unit = {
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column)).cast("string").as("lo"), max(col(column)).cast("string").as("hi"))
      .collect()
    val root = mapper.createObjectNode()
    root.put("column", column)
    val files = root.putArray("files")
    perFile.foreach { r =>
      val f = files.addObject()
      f.put("file", r.getString(0)); f.put("min", r.getString(1)); f.put("max", r.getString(2))
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, ManifestName), true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8")) finally out.close()
  }

  /** Manifest-pruned range read over a NUMERIC sort column: files whose
    * [min,max] cannot intersect [lo,hi] are dropped from the listing
    * before Spark ever opens them (driver-side, manifest only); the exact
    * predicate still applies to the survivors. Returns the frame plus the
    * files-read accounting — `filesRead < filesTotal` is the measurable
    * data-skipping claim (BASELINE.md). */
  def readRangeSkipping(spark: SparkSession, path: String, column: String,
                        lo: BigDecimal, hi: BigDecimal): (DataFrame, SkipStats) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, ManifestName))
    val manifest = try mapper.readTree(in) finally in.close()
    require(manifest.get("column").asText() == column,
      s"manifest covers '${manifest.get("column").asText()}', not '$column'")
    val files = (0 until manifest.get("files").size()).map(manifest.get("files").get)
    val selected = files.filter { f =>
      BigDecimal(f.get("max").asText()) >= lo && BigDecimal(f.get("min").asText()) <= hi
    }.map(_.get("file").asText())
    val stats = SkipStats(files.size, selected.size)
    val df =
      if (selected.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else
        spark.read.parquet(selected: _*)
          .filter(col(column) >= lit(lo.underlying()) && col(column) <= lit(hi.underlying()))
    (df, stats)
  }
}
