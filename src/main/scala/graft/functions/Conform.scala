package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Schema conformance — the reference's `enrichJson` command
  * (EnrichJsonBuilder.java:209-348): rewrite a record to match a target Avro
  * schema — fill missing nullable fields with null, recurse into records and
  * arrays, coerce ISO-8601 strings to epoch-ms for `timestamp-millis` fields,
  * and represent non-null unions as a struct of nullable branches (the
  * `{"type": value}` wire shape, EnrichJsonBuilder.java:265-268).
  *
  * Spark-first: the target Avro schema is parsed ONCE (driver side) into a
  * `StructType` + coercion plan; conformance is then a plain `select` of
  * cast/coalesce expressions — codegen'd, no per-row schema walk (the
  * reference walks the Jackson tree per record).
  */
object Conform {

  /** A parsed Avro schema: Spark type + whether it is a timestamp-millis
    * logical type (which needs string→timestamp coercion).
    */
  final case class AvroType(dataType: DataType, nullable: Boolean,
                            isTimestampMillis: Boolean = false,
                            fields: Map[String, AvroType] = Map.empty,
                            element: Option[AvroType] = None)

  private val mapper = new ObjectMapper()

  /** Parse an Avro schema JSON string (record/union/array/map/primitives +
    * timestamp-millis) into an [[AvroType]]. Public Avro spec semantics only.
    */
  def parseAvro(schemaJson: String): AvroType =
    parseNode(mapper.readTree(schemaJson))

  private def primitive(name: String, node: JsonNode): AvroType = name match {
    case "null" => AvroType(NullType, nullable = true)
    case "boolean" => AvroType(BooleanType, nullable = false)
    case "int" => AvroType(IntegerType, nullable = false)
    case "long" =>
      val lt = Option(node.get("logicalType")).map(_.asText).getOrElse("")
      if (lt == "timestamp-millis")
        AvroType(TimestampType, nullable = false, isTimestampMillis = true)
      else AvroType(LongType, nullable = false)
    case "float" => AvroType(FloatType, nullable = false)
    case "double" => AvroType(DoubleType, nullable = false)
    case "bytes" => AvroType(BinaryType, nullable = false)
    case "string" => AvroType(StringType, nullable = false)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private def parseNode(node: JsonNode): AvroType = {
    if (node.isTextual) return primitive(node.asText, node)
    if (node.isArray) { // union
      val branches = node.elements.asScala.toSeq.map(parseNode)
      val nonNull = branches.filter(_.dataType != NullType)
      val hasNull = branches.exists(_.dataType == NullType)
      if (nonNull.size == 1) nonNull.head.copy(nullable = hasNull)
      else {
        // non-null union → struct of nullable branches keyed by type name
        // (matches enrichJson's {"type": value} wire shape)
        val fields = nonNull.map { b =>
          typeName(b.dataType) -> b.copy(nullable = true)
        }.toMap
        AvroType(
          StructType(fields.toSeq.sortBy(_._1).map { case (n, t) =>
            StructField(n, t.dataType, nullable = true) }),
          nullable = hasNull, fields = fields)
      }
    } else node.get("type").asText match {
      case "record" =>
        val fs = node.get("fields").elements.asScala.toSeq.map { f =>
          f.get("name").asText -> parseNode(f.get("type"))
        }
        AvroType(
          StructType(fs.map { case (n, t) =>
            StructField(n, t.dataType, t.nullable) }),
          nullable = false, fields = fs.toMap)
      case "array" =>
        val el = parseNode(node.get("items"))
        AvroType(ArrayType(el.dataType, el.nullable), nullable = false,
          element = Some(el))
      case "map" =>
        val v = parseNode(node.get("values"))
        AvroType(MapType(StringType, v.dataType, v.nullable), nullable = false)
      case prim => primitive(prim, node)
    }
  }

  private def typeName(dt: DataType): String = dt match {
    case StringType => "string"
    case IntegerType => "int"
    case LongType => "long"
    case BooleanType => "boolean"
    case FloatType => "float"
    case DoubleType => "double"
    case BinaryType => "bytes"
    case _: StructType => "record"
    case _: ArrayType => "array"
    case other => other.simpleString
  }

  /** ISO-8601 (or epoch-ms long) → timestamp, the coercion enrichJson applies
    * to timestamp-millis fields (EnrichJsonBuilder.java:296-306).
    */
  private def coerceTimestampMillis(c: Column): Column = {
    // try_to_timestamp / filtered cast, NOT to_timestamp/cast: Spark 4 runs
    // ANSI mode, where a parse failure in any coalesce branch aborts the
    // query instead of falling through to the next format.
    val s = c.cast(StringType)
    coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss")),
      // 1-18 digits: beyond that the ANSI Long cast itself would overflow-throw
      timestamp_millis(when(s.rlike("^-?\\d{1,18}$"), s).otherwise(lit(null)).cast(LongType)))
  }

  private def conformColumn(c: Column, target: AvroType,
                            source: Option[DataType]): Column = {
    if (target.isTimestampMillis) return coerceTimestampMillis(c)
    target.dataType match {
      case st: StructType =>
        val srcFields = source match {
          case Some(s: StructType) => s.fields.map(f => f.name -> f.dataType).toMap
          case _ => Map.empty[String, DataType]
        }
        val cols = st.fields.map { f =>
          val sub = target.fields.get(f.name) match {
            case Some(t) if srcFields.contains(f.name) =>
              conformColumn(c.getField(f.name), t, srcFields.get(f.name))
            case Some(t) => lit(null).cast(t.dataType)
            case None => lit(null).cast(f.dataType)
          }
          sub.as(f.name)
        }
        when(c.isNotNull, struct(cols.toSeq: _*))
      case at: ArrayType =>
        val el = target.element.getOrElse(AvroType(at.elementType, at.containsNull))
        val srcEl = source.collect { case ArrayType(e, _) => e }
        transform(c, x => conformColumn(x, el, srcEl))
      // try_cast, not cast: conformance is fail-soft by contract — under
      // Spark 4's ANSI mode a garbage string in a numeric field would
      // abort the whole query mid-scan, where the reference warns and
      // skips (EnrichJsonBuilder.java:172-175) and our own
      // timestamp-millis path already nulls unparseable input. Found by
      // ConformFuzzSpec's dispatch fuzz (random strings into int
      // targets).
      case dt => c.try_cast(dt)
    }
  }

  /** Conform top-level DataFrame columns to a target Avro *record* schema:
    * the output has exactly the target's fields, in target order — existing
    * columns coerced, missing nullable fields null-filled.
    */
  def conformTo(df: DataFrame, schemaJson: String): DataFrame = {
    val target = parseAvro(schemaJson)
    require(target.dataType.isInstanceOf[StructType],
      "conformTo requires a record schema")
    val src = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = target.dataType.asInstanceOf[StructType].fields.map { f =>
      val t = target.fields(f.name)
      val c = src.get(f.name) match {
        case Some(sdt) => conformColumn(col(f.name), t, Some(sdt))
        case None =>
          require(t.nullable, s"missing non-nullable field ${f.name}")
          lit(null).cast(t.dataType)
      }
      c.as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Conform a single struct COLUMN in place (the reference's `valueField`
    * shape, EnrichJsonBuilder.java:150: only the record's value payload is
    * enriched, sibling fields pass through untouched).
    */
  def conformStruct(df: DataFrame, field: String, schemaJson: String): DataFrame = {
    val target = parseAvro(schemaJson)
    require(target.dataType.isInstanceOf[StructType],
      "conformStruct requires a record schema")
    df.withColumn(field,
      conformColumn(col(field), target, Some(df.schema(field).dataType)))
  }

  /** [[conformTo]] with the schema resolved through a pluggable source
    * (literal / file / registry — the reference's schemaString/schemaFile/
    * registry-subject config keys). Resolution happens here, at plan time.
    */
  def conformTo(df: DataFrame, provider: graft.schema.SchemaProvider): DataFrame =
    conformTo(df, provider.schemaJson)

  /** Per-record schema dispatch — the reference's `schemaField`, where each
    * record carries its target schema as a field value
    * (EnrichJsonBuilder.java:153-160, ToConnectDataBuilder.java:101-105).
    *
    * Spark shape: the DISTINCT schema strings are a bounded model — fetched
    * once to the driver (hard-capped at `maxSchemas`; per-record arbitrary
    * schemas would defeat columnar execution), then one conformance branch
    * per schema, unioned back. Branch output types differ per schema, so
    * the conformed record is emitted as JSON in `enriched` (the reference
    * carries a Jackson node payload — JSON is its wire shape). Rows with a
    * null schema field pass through with `enriched` null (the reference
    * warns and skips enrichment, EnrichJsonBuilder.java:172-175).
    */
  def conformByField(df: DataFrame, schemaField: String, keep: Seq[String],
                     maxSchemas: Int = 16): DataFrame = {
    val schemas = df.select(col(schemaField)).filter(col(schemaField).isNotNull)
      .distinct().limit(maxSchemas + 1).collect().map(_.getString(0)).toSeq
    require(schemas.size <= maxSchemas,
      s"schemaField '$schemaField' carries more than $maxSchemas distinct " +
        "schemas; per-record dispatch requires a bounded schema set")
    val keepCols = keep.map(col)
    val payloadFields = df.schema.fields.filterNot(_.name == schemaField)
    val payloadType = StructType(payloadFields)
    val payload = struct(payloadFields.map(f => col(f.name)).toSeq: _*)
    // Single-pass dispatch: conformance is already an expression, so the
    // per-schema branches compile into ONE chained-when projection — one
    // scan of the input instead of a filtered scan per schema + union.
    // A null schema field falls through every branch to the null literal
    // (the reference's warn-and-skip, EnrichJsonBuilder.java:172-175).
    val enriched = schemas.foldRight(lit(null).cast(StringType): Column) {
      (sj, acc) =>
        val target = parseAvro(sj)
        require(target.dataType.isInstanceOf[StructType],
          "schemaField must carry record schemas")
        when(col(schemaField) === sj,
          to_json(conformColumn(payload, target, Some(payloadType))))
          .otherwise(acc)
    }
    df.select((keepCols :+ enriched.as("enriched")): _*)
  }

  /** Registry-by-subject enrichment with a per-record subject — the
    * reference's `schema-registry-url` + `subjectField` source
    * (EnrichJsonBuilder.java:110-176, config/morphlines.conf:31-37):
    * each record's subject resolves to its latest registry schema; the
    * `valueField` struct is conformed to it and re-emitted as its JSON wire
    * shape, and the schema is attached as `valueSchema` (the reference's
    * `outputRecord.put("valueSchema", ...)` — what a downstream
    * `kafkaProducer { valueSchemaField : valueSchema }` consumes).
    *
    * Spark shape: distinct subjects are a bounded model (driver-fetched,
    * hard-capped) → one conformance branch per subject, unioned. A subject
    * the registry doesn't know passes through un-enriched with a null
    * `valueSchema`, like the reference's warn-and-skip.
    */
  def conformBySubject(df: DataFrame, subjectField: String, valueField: String,
                       client: graft.schema.RegistryClient,
                       maxSubjects: Int = 16): DataFrame = {
    val srcType = df.schema(valueField).dataType
    require(srcType.isInstanceOf[StructType],
      s"conformBySubject: valueField '$valueField' must be a struct (got $srcType)")
    val subjects = df.select(col(subjectField))
      .filter(col(subjectField).isNotNull)
      .distinct().limit(maxSubjects + 1).collect().map(_.getString(0)).toSeq
    require(subjects.size <= maxSubjects,
      s"subjectField '$subjectField' carries more than $maxSubjects distinct " +
        "subjects; per-record dispatch requires a bounded subject set")
    // Registry lookups happen once per distinct subject, at plan time.
    val resolved = subjects.map(s => s -> client.latest(s))
    // Single-pass dispatch (see conformByField): two chained-when columns —
    // the conformed JSON payload and the attached schema — replace the
    // branch-per-subject union, so the input is scanned once. Null or
    // registry-unknown subjects fall through to plain to_json + null schema
    // (the reference's warn-and-skip).
    val conformed = resolved.foldRight(to_json(col(valueField)): Column) {
      case ((s, Some(sj)), acc) =>
        val target = parseAvro(sj)
        require(target.dataType.isInstanceOf[StructType],
          s"subject schema must be a record schema: $sj")
        when(col(subjectField) === s,
          to_json(conformColumn(col(valueField), target, Some(srcType))))
          .otherwise(acc)
      case (_, acc) => acc
    }
    val schemaCol = resolved.foldRight(lit(null).cast(StringType): Column) {
      case ((s, Some(sj)), acc) =>
        when(col(subjectField) === s, lit(sj)).otherwise(acc)
      case (_, acc) => acc
    }
    df.withColumn(valueField, conformed).withColumn("valueSchema", schemaCol)
  }
}
