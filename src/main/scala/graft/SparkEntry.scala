package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2
  * (declared oracle corpus Q01-Q32 + P-layer behaviors + Tier-E extension
  * operators). `oracleSql`: DuckDB-runnable equivalent for every
  * hash-checked entry; entries without an oracle get the driver's weaker
  * rows-only check (non-SQL-expressible ops only).
  */
object SparkEntry {

  /** Flagship query on sf0.001 — the reference's canonical ranking
    * aggregate (prompts.py:28), scan→agg→sort→limit end to end. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.register(spark, dir)
    spark.sql(Corpus.byId("q04_agg_rank").sparkSql)
  }

  private def corpusEntries: Map[String, (SparkSession, String) => DataFrame] =
    Corpus.queries.map { q =>
      q.id -> { (spark: SparkSession, dir: String) =>
        Tables.register(spark, dir)
        spark.sql(q.sparkSql)
      }
    }.toMap

  /** P-layer behaviors exercised through the engine path (Runner). */
  private def behaviorEntries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q24 — duplicate-output-column rename (db_utils.py:169-177): the
    // engine must emit k_1, k_2. No oracle (DuckDB forbids dup aliases in
    // this shape) → rows-only check + unit test.
    "q24_dup_rename" -> { (spark, dir) =>
      Tables.register(spark, dir)
      Runner.runOrEmpty(spark,
        "SELECT c.c_nationkey AS k, n.n_nationkey AS k FROM customer c " +
          "JOIN nation n ON c.c_nationkey = n.n_nationkey ORDER BY c.c_custkey LIMIT 100")
    },
    // Q25 — LIMIT injection (app.py:265): engine receives no-LIMIT text and
    // must execute it as `… LIMIT 100`; the oracle text carries the limit.
    "q25_limit_inject" -> { (spark, dir) =>
      Tables.register(spark, dir)
      Runner.runOrEmpty(spark, "SELECT c_custkey FROM customer ORDER BY c_custkey")
    }
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    corpusEntries ++ behaviorEntries

  def oracleSql: Map[String, String] =
    Corpus.queries.map(q => q.id -> q.duckSql).toMap ++ Map(
      "q25_limit_inject" -> "SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 100"
    )
}
