package graft.io

import graft.exprs.AvroExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File sources beyond the spark.read built-ins. */
object Sources {

  /** `readAvroContainer` (SURVEY.md §2.A, kite-avro): read Avro object
    * container files into a DataFrame without the spark-avro module
    * (absent from this classpath): the files are listed as binary blobs,
    * then each container is decoded per-partition with the plain Avro
    * reader and records are re-encoded through [[AvroExprs]]'s binary
    * decoder, so the schema mapping is shared with `readAvro`.
    *
    * Scale shape: `binaryFile` reads split per file; containers decode
    * streamingly per partition (no whole-file materialization beyond the
    * source's blob, bounded by `maxPartitionBytes`-sized files).
    */
  def readAvroContainer(spark: SparkSession, path: String,
                        readerSchemaJson: String): DataFrame = {
    import spark.implicits._
    val blobs = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    // Per-partition: open each container, re-serialize each record to
    // Avro binary with the reader schema; decode to columns via the shared
    // AvroDecode expression (one schema-mapping implementation, two entry
    // points).
    val schemaJson = readerSchemaJson
    val binary = blobs.as[(String, Array[Byte])].mapPartitions { files =>
      // length-prefix-bomb defense on this executor JVM too — this path
      // must be safe even when AvroDecode's init never ran here (see
      // AvroExprs.ensureAvroLimits)
      graft.exprs.AvroExprs.ensureAvroLimits()
      files.flatMap { case (_, bytes) =>
        val reader = new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](
          new org.apache.avro.Schema.Parser().parse(schemaJson))
        val in = new org.apache.avro.file.DataFileStream(
          new java.io.ByteArrayInputStream(bytes), reader)
        // Records coming out of the stream are resolved to the READER
        // schema — re-encode with that same schema (encoding with the
        // file's writer schema would corrupt evolved records).
        val writer = new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](
          new org.apache.avro.Schema.Parser().parse(schemaJson))
        val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        try {
          while (in.hasNext) {
            val rec = in.next()
            val baos = new java.io.ByteArrayOutputStream()
            val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, null)
            writer.write(rec, enc)
            enc.flush()
            out += baos.toByteArray
          }
        } finally in.close()
        out
      }
    }.toDF("avro_bytes")
    binary.select(AvroExprs.from_avro_binary(col("avro_bytes"), schemaJson).as("r"))
      .select("r.*")
  }

  /** `readSequenceFile` (SURVEY.md §2.A; the reference maps kite-hadoop's
    * sequence-file reader): Hadoop `SequenceFile` of (Text key, BytesWritable
    * value) → DataFrame (key string, body binary) — the attachment shape the
    * downstream read* parsers consume. Built on the built-in Hadoop input
    * (splittable: block-compressed sequence files split by sync markers, so
    * a 100 TB directory fans out across executors like any Hadoop source).
    *
    * Hadoop reuses Writable instances per record; the map materializes
    * immutable copies before anything caches or shuffles them.
    */
  def readSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[org.apache.hadoop.io.Text],
        classOf[org.apache.hadoop.io.BytesWritable])
      .map { case (k, v) =>
        (k.toString, java.util.Arrays.copyOfRange(v.getBytes, 0, v.getLength))
      }
      .toDF("key", "body")
  }
}
