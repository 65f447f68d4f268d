package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The record envelope.
  *
  * The reference wraps every in-flight Kafka Connect record with envelope
  * fields `_topic, _kafkaPartition, _key, _value, _kafkaOffset, _timestamp,
  * _timestampType` (reference: MorphlineTransform.java:130-150) plus the
  * attachment triple `_attachment_body/_attachment_mimetype/_attachment_charset`
  * (FromConnectDataBuilder.java:104-117).
  *
  * Spark-first mapping: these are exactly the columns of Spark's built-in
  * Kafka source (`key, value, topic, partition, offset, timestamp,
  * timestampType`), so the envelope is just a schema contract — no wrapper
  * object, no per-record allocation. Attachments become a `BinaryType` value
  * column plus string metadata columns (the same pattern our multimodal
  * columns generalize).
  */
object Envelope {
  val Key = "key"
  val Value = "value"
  val Topic = "topic"
  val Partition = "partition"
  val Offset = "offset"
  val Timestamp = "timestamp"
  val TimestampTypeCol = "timestampType"

  // Attachment triple (reference: Fields.ATTACHMENT_BODY et al.)
  val Body = "body" // BinaryType payload
  val MimeType = "mimeType"
  val Charset = "charset"

  /** Schema of the Kafka-source envelope (matches
    * `spark.readStream.format("kafka")` output exactly).
    */
  val kafkaSchema: StructType = StructType(Seq(
    StructField(Key, BinaryType, nullable = true),
    StructField(Value, BinaryType, nullable = true),
    StructField(Topic, StringType, nullable = true),
    StructField(Partition, IntegerType, nullable = true),
    StructField(Offset, LongType, nullable = true),
    StructField(Timestamp, TimestampType, nullable = true),
    StructField(TimestampTypeCol, IntegerType, nullable = true)))

  /** Wrap a payload-bearing DataFrame into the envelope, synthesizing the
    * attachment triple (reference `fromConnectData`,
    * FromConnectDataBuilder.java:94-121). `valueCol` must be castable to
    * binary.
    */
  def attach(df: DataFrame, valueCol: String, mimeType: String,
             charset: String = "UTF-8"): DataFrame =
    df.withColumn(Body, col(valueCol).cast(BinaryType))
      .withColumn(MimeType, lit(mimeType))
      .withColumn(Charset, lit(charset))
}
