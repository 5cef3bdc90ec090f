package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source registration (SURVEY.md P1-P4): the reference reads exactly one
  * kind of source — a remote PostgreSQL/MySQL database, one fresh
  * connection per query (db_utils.py:158-166). Here that maps to Spark's
  * JDBC source; parquet/csv/json come free and carry the testdata.
  *
  * Scale notes for the JDBC path: a naive JDBC read is a SINGLE partition —
  * one connection, zero parallelism. `JdbcTable.partitioned` spreads the
  * scan over `numPartitions` connections split on an indexed numeric
  * column, which is the difference between 1 and N readers at the source.
  * Filter pushdown into the remote engine (`pushDownPredicate`, on by
  * default) keeps WHERE clauses server-side, mirroring how the reference
  * delegated all execution to the RDBMS.
  */
object Sources {

  /** Connection config, shape-compatible with the reference's sidebar form
    * (app.py:175-197): type, host, port, user, password, database. */
  final case class DbConfig(dbType: String, host: String, port: Int,
                            user: String, password: String, database: String) {
    def jdbcUrl: String = dbType.toLowerCase match {
      case "postgresql" => s"jdbc:postgresql://$host:$port/$database"
      case "mysql" => s"jdbc:mysql://$host:$port/$database"
      case other => throw new IllegalArgumentException(s"unsupported db type: $other")
    }
  }

  /** URL-generic single-partition JDBC read (also the test seam: an
    * embedded Derby URL exercises the identical code path as a remote
    * PostgreSQL/MySQL one). */
  def jdbcByUrl(spark: SparkSession, url: String, table: String,
                options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    options.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Single-partition JDBC table read (the reference's exact shape —
    * correct for dimension-sized tables only). */
  def jdbcTable(spark: SparkSession, cfg: DbConfig, table: String): DataFrame =
    jdbcByUrl(spark, cfg.jdbcUrl, table,
      Map("user" -> cfg.user, "password" -> cfg.password))

  /** Parallel JDBC read split on a numeric column — the scale path. */
  def jdbcPartitioned(spark: SparkSession, cfg: DbConfig, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.jdbcUrl)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  /** File-format readers (testdata + export round-trips). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** JSONL with an explicit schema — the production corpus-ingest path:
    * schema inference is an extra full pass over 100 TB and silently
    * widens types on dirty data; an explicit schema is one pass and makes
    * malformed lines an explicit policy (PERMISSIVE null-fill here;
    * corrupt records land in `_corrupt_record` if the caller adds it). */
  def jsonl(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text ingest: one row per line (`value` column), the lowest
    * common denominator for scraped corpora; `wholetext=true` gives one
    * row per FILE instead (document-per-file layouts). */
  def textLines(spark: SparkSession, path: String, wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)

  /** Register every table of a remote database under its own name, the
    * Spark analogue of the reference's introspection loop
    * (db_utils.py:122-136): the remote information_schema drives
    * registration; queries then run against the views. */
  def registerJdbcTables(spark: SparkSession, cfg: DbConfig, tables: Seq[String]): Unit =
    tables.foreach(t => jdbcTable(spark, cfg, t).createOrReplaceTempView(t))
}
