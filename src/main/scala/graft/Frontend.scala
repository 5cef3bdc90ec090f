package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** NL→SQL front-end (SURVEY.md §3.2). The reference's pipeline is: schema
  * serialization → dialect-routed system prompt → one LLM completion at
  * temperature 0 → sanitize → execute (app.py:242-268). Correctness is
  * defined entirely downstream of the completion, so the completion
  * function is pluggable and the engine never depends on a network.
  */
trait SqlFrontend {
  /** Turn a user question into raw (unsanitized) SQL text. */
  def toSql(question: String): String
}

/** Tests/bench feed SQL directly. */
object IdentityFrontend extends SqlFrontend {
  override def toSql(question: String): String = question
}

/** Prompt-assembling front-end with an injectable completion function
  * (`complete` stands in for the chat-completion call at app.py:250).
  *
  * Dialect routing mirrors the reference: the MySQL-5.7 branch forbids
  * CTEs, window functions and percentile functions and mandates derived-
  * table emulations; the PostgreSQL branch carries no such restrictions
  * (prompts.py:77-132). Rule text is paraphrased — behavior, not bytes.
  */
final class LlmFrontend(catalog: Catalog, dbType: String,
                        complete: String => String) extends SqlFrontend {

  /** Schema serialization, byte-identical line shape to app.py:246:
    * `TABLE "t" (columns: a, b)`. */
  def schemaDescription(): String = catalog.promptSerialization()

  /** FK join-path rules GENERATED from catalog metadata — the behavior of
    * the reference's hand-written "CRITICAL SCHEMA CORRECTIONS" block
    * (prompts.py:44-55: loyalty_tier-via-customer, promotion-via-
    * purchase_order path corrections), derived instead of maintained:
    * one line per declared FK edge, plus an explicit go-through line for
    * every table pair whose shortest path needs an intermediate table —
    * the exact mistake class (joining a far dimension directly to a fact)
    * those reference rules exist to prevent. */
  def joinRules(): Seq[String] = {
    val edges = catalog.fkEdges
    if (edges.isEmpty) Seq.empty
    else {
      def on(e: FkEdge) = s"${e.fromTable}.${e.fromCol} = ${e.toTable}.${e.toCol}"
      val direct = edges.map(e => s"- ${e.fromTable} joins ${e.toTable} on ${on(e)}.")
      val tables = edges.flatMap(e => Seq(e.fromTable, e.toTable)).distinct.sorted
      val multi = for {
        a <- tables; b <- tables if a < b
        path = catalog.joinPath(a, b) if path.length >= 2
      } yield {
        val via = path.map(on).mkString(" AND ")
        s"- NEVER join $a directly to $b: go through $via."
      }
      "CRITICAL JOIN PATHS (memorize; use ONLY these):" +: (direct ++ multi)
    }
  }

  /** Worked examples, dialect-routed — the behavior of the reference's
    * few-shot block (prompts.py:93-121: UNION ordering shape, top-N
    * handling, RFM), re-expressed over this catalog's schema. */
  def fewShotExamples(): Seq[String] = {
    val mysql = dbType.equalsIgnoreCase("mysql")
    val union = Seq(
      "Example - combining two result sets (ORDER BY only at the very end):",
      "  SELECT c_custkey AS id, 'customer' AS src FROM customer",
      "  UNION ALL SELECT s_suppkey AS id, 'supplier' AS src FROM supplier",
      "  ORDER BY src, id LIMIT 100")
    val topN =
      if (mysql) Seq(
        "Example - 'top customers per store' (no window functions: return ALL ranked rows, grouped column first):",
        "  SELECT l_suppkey, o_custkey, SUM(l_extendedprice) AS total FROM lineitem",
        "  JOIN orders ON lineitem.l_orderkey = orders.o_orderkey",
        "  GROUP BY l_suppkey, o_custkey ORDER BY l_suppkey, total DESC LIMIT 1000")
      else Seq(
        "Example - top 3 customers per supplier (ROW_NUMBER in a derived table):",
        "  SELECT l_suppkey, o_custkey, total FROM (",
        "    SELECT l_suppkey, o_custkey, SUM(l_extendedprice) AS total,",
        "    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY SUM(l_extendedprice) DESC) AS rn",
        "    FROM lineitem JOIN orders ON lineitem.l_orderkey = orders.o_orderkey",
        "    GROUP BY l_suppkey, o_custkey) t WHERE rn <= 3 ORDER BY l_suppkey, total DESC LIMIT 100")
    val rfm =
      if (mysql) Seq(
        "Example - RFM analysis (no NTILE: raw values only, never 1-5 scores):",
        "  SELECT o_custkey, DATEDIFF(CURDATE(), MAX(o_orderdate)) AS recency,",
        "  COUNT(DISTINCT o_orderkey) AS frequency, SUM(o_totalprice) AS monetary",
        "  FROM orders GROUP BY o_custkey ORDER BY monetary DESC LIMIT 1000")
      else Seq(
        "Example - RFM with 1-4 scores (NTILE over the aggregated values):",
        "  SELECT o_custkey, NTILE(4) OVER (ORDER BY SUM(o_totalprice) DESC) AS m_score",
        "  FROM orders GROUP BY o_custkey ORDER BY m_score, o_custkey LIMIT 100")
    union ++ topN ++ rfm
  }

  /** Dialect-routed system prompt (structure of prompts.py:1-132). */
  def systemPrompt(): String = {
    val common = Seq(
      s"You write exactly one valid $dbType SELECT statement for the user's question.",
      "Only SELECT is allowed - never DDL or DML, never system tables, no schema-qualified names.",
      "Use short unique table aliases and define every alias before use.",
      "When joining, take shared columns from one side or alias them.",
      "Prefer one multi-condition query over UNION when filtering the same table.",
      "No semicolons.",
      "Place ORDER BY and LIMIT only at the end of the full statement, never inside a UNION branch.")
    val dialect =
      if (dbType.equalsIgnoreCase("mysql")) Seq(
        "Target MySQL 5.7: no CTEs (WITH), no window functions such as OVER, ROW_NUMBER, RANK or NTILE, no percentile functions.",
        "Emulate rankings with derived tables plus ORDER BY and LIMIT; compute raw values instead of 1-5 scores.",
        "Every query must end with LIMIT 1000 or less.")
      else Seq(
        "Target PostgreSQL: CTEs and window functions are available.",
        "Every query must end with LIMIT 100 or less.")
    (common ++ dialect ++ joinRules() ++ fewShotExamples() ++
      Seq("The database schema is:", schemaDescription())).mkString("\n")
  }

  override def toSql(question: String): String =
    try complete(s"${systemPrompt()}\n\nQuestion: $question")
    catch {
      // failure path returns a runnable literal error query (app.py:267-268)
      case e: Exception => s"SELECT 'SQL generation failed: ${e.getMessage}' AS error_message LIMIT 100"
    }
}

object LlmFrontend {
  private val QuestionMarker = "\n\nQuestion: "

  /** Wire an OpenAI-compatible client as the completion function: the
    * frontend's single prompt splits back into (system, user) at the
    * question marker, reproducing the reference's two-message call shape
    * (app.py:250: messages=[{role:system},{role:user}]). */
  def withClient(catalog: Catalog, dbType: String, client: LlmClient): LlmFrontend =
    new LlmFrontend(catalog, dbType, prompt => {
      val i = prompt.lastIndexOf(QuestionMarker)
      if (i >= 0) client.complete(prompt.substring(0, i), prompt.substring(i + QuestionMarker.length))
      else client.complete("", prompt)
    })
}

/** End-to-end ask: frontend → sanitizer → engine (the app.py:283-302 loop). */
object Ask {
  def apply(spark: SparkSession, frontend: SqlFrontend, question: String): Either[EngineError, DataFrame] =
    Runner.run(spark, frontend.toSql(question))
}
