package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-path behaviors: Q24 dup-rename, Q25 LIMIT injection,
  * error-as-value (db_utils.py:168-182, app.py:265). */
class RunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Q24: duplicate output columns renamed k_1, k_2 (db_utils.py:169-177)") {
    Tables.register(spark, TestSpark.sf0001)
    val df = Runner.runOrEmpty(spark,
      "SELECT c.c_nationkey AS k, n.n_nationkey AS k FROM customer c " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey ORDER BY c.c_custkey LIMIT 100")
    assert(df.columns.toSeq == Seq("k_1", "k_2"))
    assert(df.count() == 100)
    // both sides carry the same value (self-equality of the join key)
    assert(df.collect().forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("three-way duplicate gets _1.._3") {
    val df = Runner.dedupColumns(spark.sql("SELECT 1 AS x, 2 AS x, 3 AS x, 4 AS y"))
    assert(df.columns.toSeq == Seq("x_1", "x_2", "x_3", "y"))
  }

  test("Q25: LIMIT 100 injected into no-limit text (app.py:265)") {
    Tables.register(spark, TestSpark.sf0001)
    val df = Runner.runOrEmpty(spark, "SELECT c_custkey FROM customer ORDER BY c_custkey")
    assert(df.count() == 100)
  }

  test("execution failure is a value, never a throw (db_utils.py:180-182)") {
    val res = Runner.run(spark, "SELECT nope FROM nowhere")
    assert(res.isLeft)
    assert(Runner.runOrEmpty(spark, "SELECT nope FROM nowhere").isEmpty)
  }

  test("non-SELECT rejected before execution") {
    assert(Runner.run(spark, "DROP TABLE customer").isLeft)
    assert(Runner.run(spark, "CREATE TABLE t (a INT)").isLeft)
  }

  test("literal error-row query (app.py:244,268)") {
    val df = Runner.errorQuery(spark, "Schema unavailable")
    val rows = df.collect()
    assert(df.columns.toSeq == Seq("error_message"))
    assert(rows.length == 1 && rows(0).getString(0) == "Schema unavailable")
    // quotes in the message must not break the literal
    assert(Runner.errorQuery(spark, "it's broken").collect()(0).getString(0) == "it's broken")
  }

  test("sanitize path mangles CTEs exactly like the reference (bug-compat, app.py:261-263)") {
    Tables.register(spark, TestSpark.sf0001)
    val cte = "WITH x AS (SELECT c_custkey FROM customer) SELECT * FROM x ORDER BY c_custkey LIMIT 5"
    // the leading-SELECT slice cuts into the CTE body → broken SQL → error-as-value
    assert(Sanitizer.extract(cte).startsWith("SELECT c_custkey FROM customer)"))
    assert(Runner.run(spark, cte).isLeft, "LLM path reproduces the reference's CTE mangle")
    // the trusted path executes it correctly
    val ok = Runner.runSql(spark, cte)
    assert(ok.isRight && ok.toOption.get.count() == 5)
  }

  test("runSql still gates non-SELECT statements") {
    assert(Runner.runSql(spark, "DROP TABLE customer").isLeft)
  }

  // --- parse-based read-only gate (round-2 VERDICT confirmed defect) ---
  // Spark's grammar accepts CTEs before DML, so `WITH … INSERT …` passes the
  // textual SELECT/WITH prefix check; the structural gate must catch it.

  private def assertRejectedNoWrite(res: Either[EngineError, _], dir: java.io.File): Unit = {
    assert(res.isLeft, "write statement must be rejected")
    assert(res.left.exists(_.message.startsWith("rejected")),
      s"must be rejected by the gate, not fail in execution: $res")
    assert(!dir.exists(), s"gate must reject BEFORE execution — $dir was written")
  }

  test("WITH … INSERT OVERWRITE DIRECTORY is rejected by runSql and writes nothing") {
    val dir = new java.io.File("/tmp/graft_gate_spec_dir")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    val sql = "WITH x AS (SELECT 1 AS a) INSERT OVERWRITE DIRECTORY " +
      s"'${dir.getAbsolutePath}' USING parquet SELECT * FROM x"
    assert(Sanitizer.isReadOnly(sql), "prefix check alone is fooled — that's the defect")
    assertRejectedNoWrite(Runner.runSql(spark, sql), dir)
  }

  test("WITH … INSERT INTO is rejected by runSql") {
    Tables.register(spark, TestSpark.sf0001)
    val sql = "WITH x AS (SELECT 1 AS a) INSERT INTO nation SELECT * FROM x"
    val res = Runner.runSql(spark, sql)
    assert(res.isLeft && res.left.exists(_.message.startsWith("rejected")))
  }

  test("WITH … INSERT OVERWRITE DIRECTORY is rejected by the LLM-text run path too") {
    val dir = new java.io.File("/tmp/graft_gate_spec_dir2")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    // No `select`/`limit` token anywhere, so the sanitizer passes the text
    // through intact (slice and injection both key on those tokens) apart
    // from appending LIMIT 100 — the write statement reaches the gate whole.
    val raw = "WITH x AS (TABLE nation) INSERT OVERWRITE DIRECTORY " +
      s"'${dir.getAbsolutePath}' USING parquet TABLE x"
    Tables.register(spark, TestSpark.sf0001)
    val res = Runner.run(spark, raw)
    assert(res.isLeft, "write statement must not succeed through run")
    assert(!dir.exists(), s"no file may be written: $dir")
  }

  test("writeNode: pure relations pass, writes and commands are named") {
    assert(Sanitizer.writeNode(spark, "SELECT 1").isEmpty)
    assert(Sanitizer.writeNode(spark, "WITH x AS (SELECT 1 AS a) SELECT * FROM x").isEmpty)
    assert(Sanitizer.writeNode(spark, "SELECT * FROM nation ORDER BY n_nationkey LIMIT 5").isEmpty)
    assert(Sanitizer.writeNode(spark, "INSERT INTO t SELECT 1").isDefined)
    assert(Sanitizer.writeNode(spark,
      "WITH x AS (SELECT 1) INSERT OVERWRITE DIRECTORY '/tmp/z' USING parquet SELECT * FROM x").isDefined)
    assert(Sanitizer.writeNode(spark, "CREATE TABLE t (a INT)").isDefined)
    assert(Sanitizer.writeNode(spark, "DROP TABLE t").isDefined)
    assert(Sanitizer.writeNode(spark, "SET spark.sql.shuffle.partitions=1").isDefined)
    assert(Sanitizer.writeNode(spark, "CACHE TABLE nation").isDefined)
    // unparseable text is not a write; execution surfaces the parse error
    assert(Sanitizer.writeNode(spark, "SELECT FROM WHERE garbage (((").isEmpty)
  }

  test("gate table: every Spark 4 write-capable statement shape is rejected, nothing executes") {
    // The growth-proof enumeration (round-3 verdict item 10): one entry per
    // write/command statement family Spark 4's grammar accepts. Each must
    // be stopped by the two-stage gate — prefix check OR parsed writeNode —
    // on the trusted runSql path (statements reach it unmangled), leaving
    // no table, view, or directory behind. A future parser upgrade that
    // reopens any family turns this red.
    Tables.register(spark, TestSpark.sf0001)
    val dirA = new java.io.File("/tmp/graft_gate_table_a")
    val dirB = new java.io.File("/tmp/graft_gate_table_b")
    Seq(dirA, dirB).foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    val writeStatements = Seq(
      "INSERT INTO customer VALUES (1)",
      "INSERT OVERWRITE TABLE customer SELECT * FROM customer",
      s"INSERT OVERWRITE DIRECTORY '${dirA.getAbsolutePath}' USING parquet SELECT 1 AS x",
      "WITH t AS (SELECT 1 AS x) INSERT INTO customer SELECT * FROM t",
      s"WITH t AS (SELECT 1 AS x) INSERT OVERWRITE DIRECTORY '${dirB.getAbsolutePath}' USING parquet SELECT * FROM t",
      "CREATE TABLE gate_ctas AS SELECT 1 AS x",
      "CREATE OR REPLACE TABLE gate_rtas AS SELECT 1 AS x",
      "REPLACE TABLE gate_rtas2 AS SELECT 1 AS x",
      "CREATE TABLE gate_ddl (a INT)",
      "CREATE VIEW gate_v AS SELECT 1 AS x",
      "CREATE OR REPLACE TEMPORARY VIEW gate_tv AS SELECT 1 AS x",
      "ALTER TABLE customer RENAME TO customer2",
      "DROP TABLE customer",
      "DROP VIEW customer",
      "TRUNCATE TABLE customer",
      "CACHE TABLE gate_cached AS SELECT 1 AS x",
      "UNCACHE TABLE customer",
      "SET spark.sql.shuffle.partitions=1",
      "RESET",
      "ANALYZE TABLE customer COMPUTE STATISTICS",
      "REFRESH TABLE customer",
      "MERGE INTO customer USING orders ON 1=1 WHEN MATCHED THEN DELETE",
      "UPDATE customer SET c_name = 'x' WHERE c_custkey = 1",
      "DELETE FROM customer WHERE c_custkey = 1",
      "LOAD DATA INPATH '/tmp/nope' INTO TABLE customer",
      "EXPLAIN SELECT 1",
      "DESCRIBE TABLE customer",
      "SHOW TABLES")
    writeStatements.foreach { s =>
      // structural property: prefix check or writeNode must flag it
      assert(!Sanitizer.isReadOnly(s) || Sanitizer.writeNode(spark, s).isDefined,
        s"gate misses: $s")
      // behavioral property: the trusted path returns Left, pre-execution
      assert(Runner.runSql(spark, s).isLeft, s"runSql executed: $s")
    }
    assert(!dirA.exists() && !dirB.exists(), "no directory may be written")
    val names = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Seq("gate_ctas", "gate_rtas", "gate_rtas2", "gate_ddl", "gate_v", "gate_tv")
      .forall(!names.contains(_)), "no table or view may be created")
    // and the registered views survive (nothing dropped/renamed/truncated)
    assert(spark.table("customer").count() > 0)
  }
}
