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
    (common ++ dialect ++ Seq("The database schema is:", schemaDescription())).mkString("\n")
  }

  override def toSql(question: String): String =
    try complete(s"${systemPrompt()}\n\nQuestion: $question")
    catch {
      // failure path returns a runnable literal error query (app.py:267-268)
      case e: Exception => s"SELECT 'SQL generation failed: ${e.getMessage}' AS error_message LIMIT 100"
    }
}

/** End-to-end ask: frontend → sanitizer → engine (the app.py:283-302 loop). */
object Ask {
  def apply(spark: SparkSession, frontend: SqlFrontend, question: String): Either[EngineError, DataFrame] =
    Runner.run(spark, frontend.toSql(question))
}
