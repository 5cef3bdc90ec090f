package graft

import org.apache.spark.sql.SparkSession

/** Catalog facade reproducing the reference's schema introspection
  * (db_utils.py:116-156, P3-P5):
  *
  *   - `listTables` — PG `information_schema.tables` ordered by name
  *     (db_utils.py:122-126) / MySQL `SHOW TABLES` (144);
  *   - `schema` — {table → [column names in ordinal order]}
  *     (db_utils.py:129-139,147-151) — names only, like the reference;
  *   - 300 s TTL memoization mirroring `@st.cache_resource(ttl=300)`
  *     (db_utils.py:116). For local parquet the cache is about shape parity
  *     (and matters for the JDBC mode where introspection is N+1 remote
  *     round trips — SURVEY.md §3.1).
  */
final class Catalog(spark: SparkSession, ttlMillis: Long = 300000L,
                    clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var cached: Option[(Long, Map[String, Seq[String]])] = None

  /** Table names, sorted — matching information_schema's ORDER BY. */
  def listTables(): Seq[String] = schema().keys.toSeq.sorted

  /** Columns of one table in ordinal (schema) order. */
  def listColumns(table: String): Seq[String] =
    schema().getOrElse(table, Seq.empty)

  /** Full name-only schema dict, TTL-cached. */
  def schema(): Map[String, Seq[String]] = {
    val now = clock()
    cached match {
      case Some((at, s)) if now - at < ttlMillis => s
      case _ =>
        val s = introspect()
        cached = Some((now, s))
        s
    }
  }

  /** Force a cold read (test hook / TTL expiry path). */
  def invalidate(): Unit = cached = None

  private def introspect(): Map[String, Seq[String]] =
    spark.catalog.listTables().collect().map { t =>
      t.name -> spark.table(t.name).schema.fieldNames.toSeq
    }.toMap

  /** Serialize for the NL front-end prompt, byte-identical to app.py:246:
    * one line per table: `TABLE "t" (columns: a, b)`. */
  def promptSerialization(): String =
    listTables().map { t =>
      s"""TABLE "$t" (columns: ${listColumns(t).mkString(", ")})"""
    }.mkString("\n")
}
