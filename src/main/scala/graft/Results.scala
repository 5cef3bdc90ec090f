package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import java.security.MessageDigest

/** Canonical result serialization + hashing (SURVEY.md §2.3 rule 4) and the
  * CSV sink (app.py:301-302, P6).
  *
  * Canonical form: header row of column names, then rows in result order;
  * decimals rendered at their declared scale, timestamps as
  * `yyyy-MM-dd HH:mm:ss` (session TZ is UTC per build.sbt), nulls as empty
  * string. SHA-256 over the UTF-8 bytes.
  */
object Results {

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  def renderCell(v: Any): String = v match {
    case null => ""
    case d: java.math.BigDecimal => d.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
    case t: java.sql.Timestamp => tsFmt.format(t.toInstant)
    case t: java.time.Instant => tsFmt.format(t)
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case a: Seq[_] => a.map(renderCell).mkString("[", ",", "]")
    case other => other.toString
  }

  private def csvEscape(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n')) "\"" + s.replace("\"", "\"\"") + "\"" else s

  /** Canonical CSV text of a (small, already LIMIT-capped) result. */
  def canonicalCsv(df: DataFrame): String = {
    val header = df.columns.mkString(",")
    val rows = df.collect().map { r =>
      (0 until r.length).map(i => csvEscape(renderCell(r.get(i)))).mkString(",")
    }
    (header +: rows).mkString("\n") + "\n"
  }

  def sha256(text: String): String =
    MessageDigest.getInstance("SHA-256").digest(text.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def resultHash(df: DataFrame): String = sha256(canonicalCsv(df))

  /** CSV export, UTF-8, header, no index — the reference's only sink
    * (app.py:301-302). Results are already LIMIT-capped so a driver-side
    * write is correct; pass through the canonical serializer so export ==
    * hashed form. */
  def writeCsv(df: DataFrame, path: String): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path),
      canonicalCsv(df).getBytes("UTF-8"))
    ()
  }
}
