package graft

import org.scalatest.funsuite.AnyFunSuite

/** Q33: catalog listing + TTL cache + prompt serialization
  * (db_utils.py:116-156, app.py:246). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Q33: listTables returns all 10 testdata tables, sorted") {
    Tables.register(spark, TestSpark.sf0001)
    // order-independence: any spec that EXECUTES the streaming entries
    // (PlanGuardSpec, CorpusSpec) leaves their per-entry helper views
    // (memory sinks `qN_mem_*`, q166's `qN_hourly_*`) in the shared
    // session — drop them before the exact-set assertion
    spark.catalog.listTables().collect()
      .filter(_.name.matches("q\\d+_(mem|hourly)_\\d+"))
      .foreach(t => spark.catalog.dropTempView(t.name))
    val cat = new Catalog(spark)
    assert(cat.listTables().toSet == Tables.names.toSet)
    assert(cat.listTables() == cat.listTables().sorted)
  }

  test("Q33: listColumns preserves ordinal order (FIXTURES.md)") {
    Tables.register(spark, TestSpark.sf0001)
    val cat = new Catalog(spark)
    assert(cat.listColumns("customer") ==
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    assert(cat.listColumns("region") == Seq("r_regionkey", "r_name"))
    assert(cat.listColumns("no_such_table").isEmpty)
  }

  test("TTL cache: introspection memoized until expiry (db_utils.py:116)") {
    Tables.register(spark, TestSpark.sf0001)
    var now = 0L
    val cat = new Catalog(spark, ttlMillis = 300000L, clock = () => now)
    val first = cat.schema()
    // a view created after the snapshot is invisible until TTL expiry
    spark.sql("SELECT 1 AS one").createOrReplaceTempView("ttl_probe")
    now = 299999L
    assert(cat.schema() eq first)
    now = 300001L
    assert(cat.schema()("ttl_probe") == Seq("one"))
    spark.catalog.dropTempView("ttl_probe")
    cat.invalidate()
  }

  test("prompt serialization matches app.py:246 line shape") {
    Tables.register(spark, TestSpark.sf0001)
    val cat = new Catalog(spark)
    val lines = cat.promptSerialization().split("\n")
    assert(lines.exists(_ ==
      """TABLE "region" (columns: r_regionkey, r_name)"""))
    assert(lines.length == cat.listTables().length)
  }

  test("Tables.register rebinds views when the directory changes") {
    // regression: the memo used to be per (session, dir), so registering
    // dir B then calling register(A) again no-op'd and left every view at
    // B — a batch/stream equivalence test then read events from the wrong
    // scale factor. The memo now tracks the BOUND dir per session.
    val a = Tables.table(spark, TestSpark.sf0001, "orders").count()
    val b = Tables.table(spark, TestSpark.sf01, "orders").count()
    assert(a != b, "scale factors must differ for this test to mean anything")
    assert(Tables.table(spark, TestSpark.sf0001, "orders").count() == a)
    assert(Tables.table(spark, TestSpark.sf01, "orders").count() == b)
    // leave the shared session back on the small SF for suites that follow
    Tables.register(spark, TestSpark.sf0001)
  }

  test("S11: joinPath finds shortest FK chains and respects table presence") {
    Tables.register(spark, TestSpark.sf0001)
    val cat = new Catalog(spark)
    // direct edge
    assert(cat.joinPath("orders", "customer") ==
      Seq(FkEdge("orders", "o_custkey", "customer", "c_custkey")))
    // two hops, both directions give the same chain
    assert(cat.joinPath("lineitem", "customer") == Seq(
      FkEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
      FkEdge("orders", "o_custkey", "customer", "c_custkey")))
    assert(cat.joinPath("customer", "lineitem") == cat.joinPath("lineitem", "customer").reverse)
    // lineitem→nation: shortest is via supplier (2 hops), not orders→customer (3)
    assert(cat.joinPath("lineitem", "nation") == Seq(
      FkEdge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      FkEdge("supplier", "s_nationkey", "nation", "n_nationkey")))
    // no path to FK-less fact tables; self-path empty
    assert(cat.joinPath("documents", "customer").isEmpty)
    assert(cat.joinPath("orders", "orders").isEmpty)
    // an edge naming an absent table is filtered out of fkEdges
    val withGhost = new Catalog(spark,
      fks = Catalog.defaultFks :+ FkEdge("ghost", "g_id", "customer", "c_custkey"))
    assert(!withGhost.fkEdges.exists(_.fromTable == "ghost"))
  }
}
