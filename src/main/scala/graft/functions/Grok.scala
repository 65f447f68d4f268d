package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grok: regex-dictionary extraction (reference Ring C command `grok`,
  * kite-core; SURVEY.md §2.B).
  *
  * Spark-first: grok pattern expansion is a *compile-time* preprocessor —
  * `%{SYNTAX:name}` references expand recursively into one plain Java regex;
  * extraction is then built-in `regexp_extract` per named field (codegen'd).
  * No per-row dictionary lookups.
  */
object Grok {
  /** Minimal built-in dictionary (subset of the public grok base patterns). */
  val basePatterns: Map[String, String] = Map(
    "WORD" -> raw"\b\w+\b",
    "NOTSPACE" -> raw"\S+",
    "DATA" -> raw".*?",
    "GREEDYDATA" -> raw".*",
    "INT" -> raw"[+-]?\d+",
    "NUMBER" -> raw"[+-]?\d+(?:\.\d+)?",
    "IP" -> raw"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "LOGLEVEL" -> "(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "TIMESTAMP_ISO8601" ->
      raw"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "USERNAME" -> raw"[a-zA-Z0-9._-]+",
    "UUID" -> raw"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "HOSTNAME" -> raw"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "IPV6" -> raw"(?:[0-9A-Fa-f]{1,4}:){2,7}[0-9A-Fa-f:]+",
    "MAC" -> raw"(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}",
    "URIPATH" -> raw"(?:/[A-Za-z0-9$$.+!*'(){},~:;=@#%_\-]*)+",
    "QS" -> raw"(?:\"(?:\\.|[^\\\"]+)*\")",
    "POSINT" -> raw"\b[1-9]\d*\b",
    "BASE10NUM" -> raw"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "MONTH" -> "(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)",
    "HTTPDATE" -> raw"\d{2}/(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "EMAILADDRESS" -> raw"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "HTTPMETHOD" -> "(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)")

  private val Ref = raw"%\{(\w+)(?::(\w+))?\}".r

  /** Expand a grok expression into (regex with capture groups, field names in
    * group order). Unnamed references become non-capturing.
    */
  def expand(grokExpr: String,
             dict: Map[String, String] = basePatterns): (String, Seq[String]) = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    def go(expr: String, depth: Int): String = {
      require(depth < 20, s"grok pattern recursion too deep: $grokExpr")
      val out = Ref.replaceAllIn(expr, m => {
        val pat = dict.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
        val body = go(pat, depth + 1)
        val g = Option(m.group(2)) match {
          case Some(name) => fields += name; s"($body)"
          case None => s"(?:$body)"
        }
        java.util.regex.Matcher.quoteReplacement(g)
      })
      // the depth guard alone doesn't stop a BRANCHING dictionary
      // (A -> %{B}%{B}%{B}%{B} quadruples per level: 4^depth chars
      // before depth 20 trips) — bound the RESULT size at every level,
      // where the accumulation actually happens
      require(out.length < 1000000,
        s"grok expansion exceeds 1MB — runaway dictionary: $grokExpr")
      out
    }
    (go(grokExpr, 0), fields.toSeq)
  }

  /** Extract every named grok field from `src` as new string columns
    * (null where the pattern does not match).
    */
  def extract(df: DataFrame, src: Column, grokExpr: String,
              dict: Map[String, String] = basePatterns): DataFrame = {
    val (regex, fields) = expand(grokExpr, dict)
    // Evaluate the match guard once per row (not once per field).
    val guard = "__grok_matched"
    val withGuard = df.withColumn(guard, src.rlike(regex))
    fields.zipWithIndex.foldLeft(withGuard) { case (d, (f, i)) =>
      d.withColumn(f,
        when(col(guard), regexp_extract(src, regex, i + 1)))
    }.drop(guard)
  }
}
