package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `convertTimestamp` semantics (reference: config/cloudsolr.conf:43-51,
  * httpsolr.conf:47-55): try a list of input formats in order (including the
  * pseudo-formats `unixTimeInMillis`/`unixTimeInSeconds`), interpret in an
  * input timezone, render with an output format in an output timezone.
  *
  * Spark-first: the ordered format list compiles to a `coalesce` over
  * `to_timestamp` attempts — codegen'd, no per-row format dispatch. The
  * reference loops formats per record.
  */
object TimeFunctions {

  private def parseOne(c: Column, fmt: String, tz: String): Column = fmt match {
    // try_cast, not cast: a format that doesn't match must fall through
    // the coalesce (the reference tries each format per record), but
    // ANSI cast of a non-numeric string to BIGINT aborts the whole job
    // (CAST_INVALID_INPUT) — "notadate" with formats
    // ["yyyy-MM-dd", "unixTimeInMillis"] killed the batch.
    case "unixTimeInMillis" => timestamp_millis(c.try_cast("long"))
    case "unixTimeInSeconds" => timestamp_seconds(c.try_cast("long"))
    case f =>
      // try_to_timestamp: a non-matching format yields null (so the
      // coalesce falls through) instead of an ANSI parse error.
      if (tz == "UTC") try_to_timestamp(c, lit(f))
      else to_utc_timestamp(try_to_timestamp(c, lit(f)), tz)
  }

  /** Parse with the first matching format (null where none match). */
  def parseTimestamp(c: Column, inputFormats: Seq[String],
                     inputTimezone: String = "UTC"): Column =
    coalesce(inputFormats.map(parseOne(c, _, inputTimezone)): _*)

  /** Full convertTimestamp: parse then render. `outputFormat` uses Java
    * DateTimeFormatter patterns (as the reference's SimpleDateFormat ones).
    */
  def convertTimestamp(c: Column, inputFormats: Seq[String],
                       outputFormat: String,
                       inputTimezone: String = "UTC",
                       outputTimezone: String = "UTC"): Column = {
    val ts = parseTimestamp(c, inputFormats, inputTimezone)
    val shifted =
      if (outputTimezone == "UTC") ts else from_utc_timestamp(ts, outputTimezone)
    date_format(shifted, outputFormat)
  }
}
