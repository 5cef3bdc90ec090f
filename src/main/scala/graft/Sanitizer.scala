package graft

/** LLM-output → executable-SQL sanitizer, reproducing the reference's
  * pipeline byte-for-byte (app.py:253-265, SURVEY.md P10-P13):
  *
  *   1. fence extraction — prefer a ```sql fenced block, else any ```
  *      fenced block, else the raw text (app.py:253-258);
  *   2. strip ALL semicolons (app.py:260; prompts.py:82,131 "No semicolons");
  *   3. if the text does not start with SELECT but contains one, slice from
  *      the first SELECT — DOTALL, case-insensitive (app.py:261-263; the
  *      captured failure error_query.sql:26-46 is the canonical input);
  *   4. LIMIT injection — if no `\blimit\b` token appears ANYWHERE, append
  *      " LIMIT 100" (app.py:265). Bug-compat note (SURVEY.md §7.4): the
  *      reference's check is a bare token scan, so a `limit` inside a string
  *      literal or alias suppresses injection; we reproduce that exactly
  *      because the t2 corpus tests it as a behavior.
  */
object Sanitizer {

  private val FencedSql = """(?s)```sql\s*(.*?)```""".r
  private val FencedAny = """(?s)```\s*(.*?)```""".r
  private val FirstSelect = """(?is).*?(select\b.*)""".r
  private val LimitToken = """(?i)\blimit\b""".r

  /** Steps 1-3: extract + normalize; no LIMIT injection. */
  def extract(raw: String): String = {
    val fenced = FencedSql.findFirstMatchIn(raw).map(_.group(1))
      .orElse(FencedAny.findFirstMatchIn(raw).map(_.group(1)))
      .getOrElse(raw)
    val noSemi = fenced.replace(";", "").trim
    if (noSemi.toLowerCase.startsWith("select")) noSemi
    else noSemi match {
      case FirstSelect(sliced) => sliced.trim
      case _ => noSemi
    }
  }

  /** Step 4: inject the reference's default cap when no limit token exists
    * anywhere in the text (app.py:265; PG default 100, prompts.py:131). */
  def injectLimit(sql: String, defaultLimit: Int = 100): String =
    if (LimitToken.findFirstIn(sql).isDefined) sql
    else s"$sql LIMIT $defaultLimit"

  /** Full pipeline, the form `Runner.run` consumes. */
  def sanitize(raw: String): String = injectLimit(extract(raw))

  /** Read-only gate, textual half: the deployment grants SELECT only
    * (.config/README.md:56,65-66; prompts.py:8). CTEs (`WITH`) are part of
    * the PostgreSQL-branch surface (SURVEY.md S44) and remain read-only.
    *
    * This prefix check alone is NOT sufficient — Spark's grammar accepts
    * `WITH … INSERT OVERWRITE DIRECTORY …`, which starts with `with` but
    * writes to disk. Callers with a SparkSession must ALSO pass the
    * parse-based [[writeNode]] gate; `Runner` does both. */
  def isReadOnly(sql: String): Boolean = {
    val t = sql.trim.toLowerCase
    t.startsWith("select") || t.startsWith("with")
  }

  /** Read-only gate, structural half: parse the statement (no analysis, no
    * execution) and report the first node that could write state or run a
    * command — `InsertIntoStatement` (INSERT INTO/OVERWRITE, including
    * CTE-prefixed forms), `InsertIntoDir` (INSERT OVERWRITE DIRECTORY),
    * any `Command` (DDL, SET, CACHE, EXPLAIN, …), or any `ParsedStatement`
    * (unresolved DDL). Returns None when the plan is a pure relation.
    *
    * Unparseable text also returns None: it cannot write, and letting
    * execution surface the parse error preserves the reference's
    * error-as-value behavior (db_utils.py:180-182) for malformed SELECTs. */
  def writeNode(spark: org.apache.spark.sql.SparkSession, sql: String): Option[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoDir, InsertIntoStatement, ParsedStatement}
    val plan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case _: Exception => return None }
    plan.collectFirst {
      case n: InsertIntoStatement => n.nodeName
      case n: InsertIntoDir       => n.nodeName
      case n: Command             => n.nodeName
      case n: ParsedStatement     => n.nodeName
    }
  }
}
