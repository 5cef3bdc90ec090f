package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    ()
  }
}
