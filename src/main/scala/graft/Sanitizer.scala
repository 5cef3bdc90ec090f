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

  /** Read-only gate: the deployment grants SELECT only
    * (.config/README.md:56,65-66; prompts.py:8). CTEs (`WITH`) are part of
    * the PostgreSQL-branch surface (SURVEY.md S44) and remain read-only. */
  def isReadOnly(sql: String): Boolean = {
    val t = sql.trim.toLowerCase
    t.startsWith("select") || t.startsWith("with")
  }
}
