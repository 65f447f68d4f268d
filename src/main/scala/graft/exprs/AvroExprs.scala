package graft.exprs

import graft.functions.Conform
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Avro binary codec expressions — the reference's `readAvro` /
  * `toAvro` / `writeAvroToByteArray` commands (SURVEY.md §2.A/§2.B, kite-avro)
  * re-expressed as Catalyst expressions over the plain Apache Avro library
  * (the spark-avro module is not on this classpath).
  *
  * Schema is parsed ONCE on the driver (the expression is instantiated with
  * the JSON string); per-row work is a single decode/encode pass with reused
  * datum reader/writer. Supported: records of primitives, nullable unions
  * `[null, T]`, arrays, nested records, `timestamp-millis`.
  */
object AvroExprs {

  /** Length-prefix-bomb defense (the CVE-2023-39410 class): an 8-byte
    * datum can claim a 1 GB string, and GenericDatumReader allocates the
    * array BEFORE reading data — an OutOfMemoryError no catch recovers
    * from, killing the executor on one crafted record. Avro 1.12's
    * OPT-IN limits make the decoder throw SystemLimitException (an
    * AvroRuntimeException → [[AvroDecode]]'s null contract) before
    * allocating; they are read from system properties at
    * SystemLimitException class-load, so set generous defaults (256 MiB,
    * the gunzip cap) iff the user hasn't chosen values. Called from the
    * decoder's lazy init, which runs once per JVM — on executors, before
    * the first decode. Best-effort by design: if other code loaded
    * Avro's limits first, the user's/JVM's existing configuration wins.
    */
  private val avroLimitsChecked = new java.util.concurrent.atomic.AtomicBoolean
  private[graft] def ensureAvroLimits(): Unit = {
    val cap = 256L * 1024 * 1024
    val weSet = Seq("org.apache.avro.limits.string.maxLength",
        "org.apache.avro.limits.bytes.maxLength")
      .map { k =>
        val unset = System.getProperty(k) == null
        if (unset) System.setProperty(k, String.valueOf(cap))
        unset
      }.exists(identity)
    // Engagement probe (r15 ADVICE): the properties are read ONCE at
    // SystemLimitException class-load, so if any co-resident library
    // touched Avro decoding before this ran, the defaults above silently
    // never engage. checkMaxStringLength(2·cap) throws iff a limit ≤ 2·cap
    // is live — probe once and make the degraded-defense state visible
    // instead of invisible. Skipped when the user configured their own
    // limits (their values win by contract, whatever they are).
    if (weSet && avroLimitsChecked.compareAndSet(false, true)) {
      val engaged =
        try { org.apache.avro.SystemLimitException.checkMaxStringLength(cap * 2); false }
        catch { case _: org.apache.avro.SystemLimitException => true }
      if (!engaged)
        System.err.println("[graft.avro] WARNING: Avro decode limits are " +
          "NOT in effect (SystemLimitException was class-loaded before " +
          "graft set org.apache.avro.limits.*); the length-prefix-bomb " +
          "defense is degraded to the pre-existing JVM configuration")
    }
  }

  /** Per-JVM count of encode-side fail-soft nulls, by site. The first
    * few (and every 10,000th) are logged with the exception class, so a
    * conversion-layer regression that nulls every record is visible in
    * executor stderr rather than reading as hostile input. */
  private[graft] val encodeFailSoftCount =
    new java.util.concurrent.atomic.AtomicLong
  private def failSoft(site: String, e: Throwable): Unit = {
    val n = encodeFailSoftCount.incrementAndGet()
    if (n <= 5 || n % 10000 == 0)
      System.err.println(s"[graft.avro] encode fail-soft null #$n at " +
        s"$site: ${e.getClass.getName}: ${e.getMessage}")
  }

  private def sparkType(schemaJson: String): DataType =
    Conform.parseAvro(schemaJson).dataType

  /** The codec handles only `[null, T]` unions (scaladoc contract). A wider
    * union would silently encode the first non-null branch / decode to a
    * mismatched Catalyst type — fail fast at construction instead.
    */
  private def validateUnions(sch: Schema): Unit = sch.getType match {
    case Schema.Type.UNION =>
      val nonNull = sch.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"unsupported Avro union ${sch}: only [null, T] unions are supported")
      validateUnions(nonNull.head)
    case Schema.Type.RECORD => sch.getFields.asScala.foreach(f => validateUnions(f.schema()))
    case Schema.Type.ARRAY => validateUnions(sch.getElementType)
    case Schema.Type.MAP => validateUnions(sch.getValueType)
    case _ => ()
  }

  private def parseValidated(schemaJson: String): Schema = {
    val s = new Schema.Parser().parse(schemaJson)
    validateUnions(s)
    s
  }

  /** avro GenericRecord value → Catalyst value for `dt`. */
  private def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x: org.apache.avro.util.Utf8, StringType) => UTF8String.fromString(x.toString)
    case (x: String, StringType) => UTF8String.fromString(x)
    case (x: java.nio.ByteBuffer, BinaryType) =>
      val b = new Array[Byte](x.remaining()); x.duplicate().get(b); b
    case (x: java.lang.Long, TimestampType) => x * 1000L // millis → micros
    case (x: GenericRecord, st: StructType) =>
      InternalRow.fromSeq(st.fields.map(f => toCatalyst(x.get(f.name), f.dataType)).toSeq)
    case (x: java.util.Collection[_], ArrayType(et, _)) =>
      new GenericArrayData(x.asScala.map(toCatalyst(_, et)).toArray)
    case (x, _) => x // int/long/float/double/boolean pass through
  }

  /** Catalyst value → avro value per writer schema node. */
  private def toAvro(v: Any, dt: DataType, sch: Schema): Any = {
    val s = if (sch.getType == Schema.Type.UNION)
      sch.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else sch
    (v, dt) match {
      case (null, _) => null
      case (x: UTF8String, StringType) => x.toString
      case (x: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(x)
      case (x: java.lang.Long, TimestampType) => x / 1000L // micros → millis
      case (x: InternalRow, st: StructType) =>
        val rec = new GenericData.Record(s)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(x.get(i, f.dataType), f.dataType, s.getField(f.name).schema()))
        }
        rec
      case (x: ArrayData, ArrayType(et, _)) =>
        val out = new java.util.ArrayList[Any](x.numElements())
        x.foreach(et, (_, e) => out.add(toAvro(e, et, s.getElementType)))
        out
      case (x, _) => x
    }
  }

  /** `readAvro`: binary column + writer-schema JSON → struct column. */
  case class AvroDecode(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    parseValidated(schemaJson) // fail fast on unsupported unions, at plan time
    @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
    @transient private lazy val reader = {
      ensureAvroLimits() // once per JVM, before the first decode
      new GenericDatumReader[GenericRecord](schema)
    }
    @transient private var decoder: BinaryDecoder = _
    override val dataType: DataType = sparkType(schemaJson)
    // The fail-soft contracts below can produce NULL even from a
    // non-null child — without this override Catalyst inherits the
    // child's nullability, and a downstream codegen projection that
    // trusts "non-nullable" NPEs (or silently mis-reads) on the nulls.
    override def nullable: Boolean = true
    // Parser null-contract (same as confluent_unframe below): corrupt or
    // truncated bytes yield a NULL struct so bad records are filterable
    // — an EOFException/AvroRuntimeException escaping the scan aborts
    // the batch, where the reference's readAvro fails only the record.
    // Trailing bytes after one complete datum are ignored (one-datum
    // read, as the reference).
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
      try toCatalyst(reader.read(null, decoder), dataType)
      catch {
        case _: java.io.IOException => null
        case _: org.apache.avro.AvroRuntimeException => null
        case _: ArrayIndexOutOfBoundsException => null
      }
    }
    override protected def withNewChildInternal(c: Expression): AvroDecode = copy(child = c)
  }

  /** `toAvro`/`writeAvroToByteArray`: struct column → avro binary. */
  case class AvroEncode(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    parseValidated(schemaJson) // fail fast on unsupported unions, at plan time
    @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
    // Any, not GenericRecord: top-level primitive schemas are legal Avro
    // (the reference's kafkaProducer ships `{"type":"string"}` value schemas,
    // TESTR/producer.conf:35-37) and GenericDatumWriter handles both.
    @transient private lazy val writer = new GenericDatumWriter[Any](schema)
    @transient private lazy val baos = new java.io.ByteArrayOutputStream()
    @transient private var encoder: BinaryEncoder = _
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true // fail-soft: see AvroDecode
    // Encode-side fail-soft (poisoned-corpus sweep, r15): a record that
    // VIOLATES the declared writer schema — e.g. a null field under a
    // non-nullable string — made Avro throw NullPointerException out of
    // the scan and abort the batch; the reference's toAvro fails only
    // the record. Null output = unencodable record, filterable (callers
    // that must not lose data count the nulls before shipping).
    // The conversion (graft's own toAvro layer) and the Avro write are
    // caught SEPARATELY (r15 ADVICE): a bare NPE/CCE from toAvro is as
    // likely a graft conversion-layer bug as a hostile record, so those
    // nulls are counted and the first few logged with their site —
    // a conversion-layer regression shows up as a labelled count instead
    // of silent per-record data loss indistinguishable from poison.
    override def nullSafeEval(input: Any): Any = {
      val datum =
        try toAvro(input, child.dataType, schema)
        catch {
          case e @ (_: NullPointerException | _: ClassCastException |
                    _: org.apache.avro.AvroRuntimeException) =>
            failSoft("toAvro-convert", e); return null
        }
      try {
        baos.reset()
        encoder = EncoderFactory.get().binaryEncoder(baos, encoder)
        writer.write(datum, encoder)
        encoder.flush()
        baos.toByteArray
      } catch {
        // discard the reused encoder on ANY failed write: an exception
        // mid-record leaves buffered partial bytes that would silently
        // CORRUPT the next row's payload (observed: a null-text record
        // poisoned the following record's frame end-to-end). NPE/CCE here
        // come out of Avro's writer frames on schema-violating records
        // (e.g. null under a non-nullable field) — the fail-soft contract.
        case e @ (_: NullPointerException | _: ClassCastException |
                  _: org.apache.avro.AvroRuntimeException) =>
          encoder = null; failSoft("avro-write", e); null
      }
    }
    override protected def withNewChildInternal(c: Expression): AvroEncode = copy(child = c)
  }

  import org.apache.spark.sql.classic.GraftBridge

  def from_avro_binary(data: Column, schemaJson: String): Column =
    GraftBridge.column(AvroDecode(GraftBridge.expression(data), schemaJson))

  def to_avro_binary(data: Column, schemaJson: String): Column =
    GraftBridge.column(AvroEncode(GraftBridge.expression(data), schemaJson))

  /** Confluent schema-registry wire framing: 1 magic byte 0x00 + 4-byte
    * big-endian schema id + the Avro binary payload — what the
    * reference's KafkaAvroSerializer default produces on every publish
    * (KafkaDataProducerCommandBuilder.java:253-254). Pure built-ins
    * (hex/lpad/unhex/concat), so framing stays in whole-stage codegen.
    * Null payloads stay null (a tombstone is not framed).
    */
  def confluent_frame(payload: Column, schemaId: Column): Column = {
    import org.apache.spark.sql.functions._
    // hex() of a negative int renders the 64-bit two's complement (16
    // chars); the frame wants the LOW 4 bytes, so take the last 8 hex
    // chars before padding — lpad alone keeps the PREFIX, which writes
    // FFFFFFFF for every negative id
    val h8 = lpad(substring(hex(schemaId.cast("int")), -8, 8), 8, "0")
    when(payload.isNull, lit(null).cast("binary")).otherwise(
      concat(lit(Array[Byte](0)), unhex(h8), payload))
  }

  /** Inverse of [[confluent_frame]]: (schema_id, payload) from a framed
    * value. Rejects nothing at plan time — a malformed frame (wrong magic
    * or too short) yields a null struct so bad records are filterable,
    * matching the engine's parser null-contract.
    */
  def confluent_unframe(framed: Column): Column = {
    import org.apache.spark.sql.functions._
    // the 4 id bytes are a SIGNED big-endian int32: reinterpret through
    // long (conv yields the unsigned value as a string; 0..2^32-1 always
    // fits a long) instead of casting the string to int — under ANSI
    // mode that cast THROWS for values above Int.MaxValue, so one
    // corrupt high-byte frame would abort the whole query in violation
    // of the null-contract documented above (and a framed negative id
    // would not round-trip)
    val unsigned = conv(hex(substring(framed, 2, 4)), 16, 10).cast("long")
    val signed = when(unsigned > Int.MaxValue.toLong,
      unsigned - 4294967296L).otherwise(unsigned).cast("int")
    when(framed.isNull || length(framed) < 5 ||
        substring(framed, 1, 1) =!= lit(Array[Byte](0)),
      lit(null).cast("struct<schema_id:int,payload:binary>")).otherwise(
      struct(
        signed.as("schema_id"),
        substring(framed, 6, Int.MaxValue).as("payload")))
  }
}
