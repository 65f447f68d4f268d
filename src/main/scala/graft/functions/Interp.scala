package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `@{field}` interpolation compiler.
  *
  * The reference's `setValues`/`logInfo`/`kafkaProducer` configs interpolate
  * field references into template strings, e.g. `"@{_topic}-avro"`
  * (reference: config/morphlines.conf:25-30, producer.conf:27-32). The
  * reference resolves these per record, interpretively.
  *
  * Spark-first: compile the template ONCE into a `concat` expression tree of
  * literals and column refs — whole-stage codegen then evaluates it with no
  * per-row parsing or allocation beyond the output string.
  */
object Interp {
  private val Ref = raw"@\{([^}]*)\}".r

  /** Compile `"prefix @{col} suffix"` into a Column. Null columns render as
    * empty string (morphline renders missing fields as empty). When the
    * available column set is known, references to absent columns also render
    * empty instead of failing analysis — the reference's semantics for a
    * `@{field}` that no record carries.
    */
  def interpolate(template: String,
                  available: Option[Set[String]] = None): Column = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- Ref.findAllMatchIn(template)) {
      if (m.start > last) parts += lit(template.substring(last, m.start))
      val name = m.group(1)
      parts += (available match {
        // `@{}` renders the whole record (the reference's logInfo
        // `args: ["@{}"]` shape) — JSON of all known columns.
        case Some(cols) if name.isEmpty =>
          to_json(struct(cols.toSeq.sorted.map(col): _*))
        case None if name.isEmpty => lit("@{}")
        case Some(cols) if !cols.contains(name) => lit("")
        // the name is KNOWN to be a top-level column here — backtick it
        // so a column literally called "a.b" resolves as itself, not as
        // a nested field path (morphline field names may contain dots)
        case Some(_) =>
          coalesce(col(s"`${name.replace("`", "``")}`").cast("string"),
            lit(""))
        // available=None: caller-trusted names, dotted refs keep their
        // nested-access meaning
        case None => coalesce(col(name).cast("string"), lit(""))
      })
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    if (parts.isEmpty) lit("") else if (parts.size == 1) parts.head
    else concat(parts.toSeq: _*)
  }
}
