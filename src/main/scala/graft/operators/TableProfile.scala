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
  * Shape: a UNION of per-column aggregates. Each branch's parquet scan
  * is pruned to exactly ONE column and its aggregate carries a single
  * distinct — on a columnar store the union reads the same bytes as a
  * combined scan would, while the N-distinct-in-one-aggregate
  * formulation forces Spark's expand (rows × N+1 through the wide
  * aggregate: measured 2× slower on sf0.1 orders) and drags every
  * column through one scan. Branches run in parallel within one job;
  * output is metadata-sized. min/max are exposed as strings so
  * heterogeneous column types fit one result schema (the
  * comparator-safe choice: longs and dates render identically in any
  * engine; see CLAUDE.md on hashed outputs). */
object TableProfile {

  /** Profile `cols` of `df`. Each output row:
    * (col_name, n_rows, n_null, n_distinct, min_v, max_v).
    * Pass a date/timestamp column through `dateCols` to normalize its
    * range to DATE strings (yyyy-MM-dd — engine-neutral rendering).
    * Pass a money (double) column through `centsCols` to expose its
    * range as exact BIGINT cents — CAST(x AS DECIMAL(18,2)) * 100, the
    * corpus-standard trick that keeps floats out of hashed output; the
    * row is labeled `<col>_cents`. n_distinct stays on the raw value
    * (a pure count is engine-neutral; only RENDERED cells need the
    * integer spelling). */
  def profile(df: DataFrame, cols: Seq[String], dateCols: Set[String] = Set.empty,
              centsCols: Set[String] = Set.empty): DataFrame = {
    val parts = cols.map { c =>
      val ranged: Column =
        if (centsCols(c)) (col(c).cast("decimal(18,2)") * 100).cast("long")
        else if (dateCols(c)) col(c).cast("date")
        else col(c)
      val label = if (centsCols(c)) c + "_cents" else c
      df.select(col(c)).agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          count_distinct(col(c)).as("n_distinct"),
          min(ranged).cast("string").as("min_v"),
          max(ranged).cast("string").as("max_v"))
        .select(lit(label).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Multi-table profile: one `profile` per table, column names qualified
    * `table.column` so the union stays unambiguous. Same scale shape —
    * every branch is a one-column pruned scan, output metadata-sized
    * (rows = total profiled columns, not data). */
  def profileTables(tables: Seq[(String, DataFrame, Seq[String])],
                    dateCols: Set[String] = Set.empty,
                    centsCols: Set[String] = Set.empty): DataFrame =
    tables.map { case (name, df, cols) =>
      profile(df, cols, dateCols, centsCols)
        .withColumn("col_name", concat(lit(name + "."), col("col_name")))
    }.reduce(_ unionByName _)
}
