package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the data-engineering "what is in this
  * table" pass that runs before any pipeline touches a new source
  * (nulls, cardinalities, value ranges per column). The reference stops
  * at SCHEMA introspection (db_utils.py:116-156: names/types only);
  * this is the data-level extension a 100 TB corpus needs because a bad
  * column (all-null, constant, exploding cardinality) must be caught
  * before a month-long training run reads it.
  *
  * Shape: ONE aggregate computes every metric for every profiled column
  * (a single scan; distinct counts share the same pass via Spark's
  * expand), then the wide row unpivots to one row per column with
  * `stack` — metadata-sized output, no second scan. min/max are exposed
  * as strings so heterogeneous column types fit one result schema (the
  * comparator-safe choice: longs and dates render identically in any
  * engine; see CLAUDE.md on hashed outputs). */
object TableProfile {

  /** Profile `cols` of `df`. Each output row:
    * (col_name, n_rows, n_null, n_distinct, min_v, max_v).
    * Pass a date/timestamp column through `dateCols` to normalize its
    * range to DATE strings (yyyy-MM-dd — engine-neutral rendering). */
  def profile(df: DataFrame, cols: Seq[String], dateCols: Set[String] = Set.empty): DataFrame = {
    def ranged(c: String): Column =
      if (dateCols(c)) col(c).cast("date") else col(c)
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"null_$c"),
        count_distinct(col(c)).as(s"dist_$c"),
        min(ranged(c)).cast("string").as(s"min_$c"),
        max(ranged(c)).cast("string").as(s"max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', null_$c, dist_$c, min_$c, max_$c").mkString(", ")
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_v, max_v)")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
  }
}
