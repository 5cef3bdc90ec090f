package graft

import org.apache.spark.sql.SparkSession

/** One foreign-key edge: `fromTable.fromCol` references `toTable.toCol`.
  * The reference carries its FK knowledge as hand-written prompt prose
  * (prompts.py:44-55 "CRITICAL SCHEMA CORRECTIONS"); here the graph is
  * first-class metadata the front-end derives those rules FROM (S11). */
final case class FkEdge(fromTable: String, fromCol: String,
                        toTable: String, toCol: String)

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
  *     round trips — SURVEY.md §3.1);
  *   - `fkEdges`/`joinPath` — the FK join-path graph (S11), declared per
  *     deployment (defaults cover the registered TPC-H-ish tables) and
  *     filtered to tables actually present.
  */
final class Catalog(spark: SparkSession, ttlMillis: Long = 300000L,
                    clock: () => Long = () => System.currentTimeMillis(),
                    fks: Seq[FkEdge] = Catalog.defaultFks) {

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

  /** Declared FK edges restricted to tables present in the live schema —
    * a narrower session (e.g. only dimension tables registered) never
    * advertises join paths through absent tables. */
  def fkEdges: Seq[FkEdge] = {
    val s = schema()
    fks.filter(e => s.contains(e.fromTable) && s.contains(e.toTable))
  }

  /** Shortest join path between two tables over the undirected FK graph
    * (BFS, deterministic: neighbors visited in declaration order). Empty
    * when `from == to` or no path exists. Paths stay short (table-count
    * bounded), so BFS on the driver is free. */
  def joinPath(from: String, to: String): Seq[FkEdge] = {
    if (from == to) return Seq.empty
    val edges = fkEdges
    val adj = edges.flatMap(e => Seq(e.fromTable -> e, e.toTable -> e))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val prev = scala.collection.mutable.Map.empty[String, FkEdge]
    val seen = scala.collection.mutable.Set(from)
    val queue = scala.collection.mutable.Queue(from)
    while (queue.nonEmpty && !seen.contains(to)) {
      val t = queue.dequeue()
      adj.getOrElse(t, Seq.empty).foreach { e =>
        val other = if (e.fromTable == t) e.toTable else e.fromTable
        if (!seen.contains(other)) {
          seen += other; prev(other) = e; queue.enqueue(other)
        }
      }
    }
    if (!prev.contains(to)) Seq.empty
    else {
      var cur = to
      val path = List.newBuilder[FkEdge]
      while (cur != from) {
        val e = prev(cur)
        path += e
        cur = if (e.fromTable == cur) e.toTable else e.fromTable
      }
      path.result().reverse
    }
  }
}

object Catalog {
  /** FK graph of the registered TPC-H-ish tables (TESTDATA.md). Events/
    * documents/embeddings are fact-only — no declared FKs. */
  val defaultFks: Seq[FkEdge] = Seq(
    FkEdge("customer", "c_nationkey", "nation", "n_nationkey"),
    FkEdge("supplier", "s_nationkey", "nation", "n_nationkey"),
    FkEdge("nation", "n_regionkey", "region", "r_regionkey"),
    FkEdge("orders", "o_custkey", "customer", "c_custkey"),
    FkEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
    FkEdge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    FkEdge("lineitem", "l_partkey", "part", "p_partkey"))
}
