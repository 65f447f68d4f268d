package graft.io

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._

/** Sink plumbing (SURVEY.md §2.D). */
object Sinks {

  /** Batch Kafka write with dynamic per-row topic — requires columns
    * `key` (binary/string), `value` (binary/string), `topic` (string).
    * Semantics of the reference's `kafkaProducer` command. The reference's
    * REST-proxy transport is implemented in
    * [[HttpSenders.restProxyKafkaSender]] (pluggable via [[KafkaEnv]]);
    * this native path needs the spark-sql-kafka jar + a broker.
    */
  def kafkaBatch(df: DataFrame, bootstrap: String): Unit =
    df.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .save()

  /** A document-sink `ForeachWriter` in the `loadSolr` shape: partition-level
    * connection lifecycle (open once per partition/epoch, buffer, flush on
    * close). `send` is the transport; the default is a no-op collector so
    * tests can run without a Solr instance.
    *
    * Idempotence contract: rows must carry a stable unique key column (see
    * RecordOps.deterministicKey) so epoch replays overwrite instead of
    * duplicate — the Spark-side version of generateSolrSequenceKey
    * (config/cloudsolr.conf:62-67).
    */
  final class DocumentSinkWriter(keyCol: String, batchSize: Int = 1000,
                                 send: Seq[Map[String, Any]] => Unit = _ => ())
      extends ForeachWriter[Row] {
    @transient private var buffer: scala.collection.mutable.ArrayBuffer[Map[String, Any]] = _
    override def open(partitionId: Long, epochId: Long): Boolean = {
      buffer = scala.collection.mutable.ArrayBuffer.empty; true
    }
    override def process(row: Row): Unit = {
      buffer += row.schema.fieldNames.map(f => f -> row.getAs[Any](f)).toMap
      if (buffer.size >= batchSize) { send(buffer.toSeq); buffer.clear() }
    }
    override def close(errorOrNull: Throwable): Unit =
      if (errorOrNull == null && buffer != null && buffer.nonEmpty) {
        send(buffer.toSeq); buffer.clear()
      }
  }

  /** `sanitizeUnknownSolrFields` (config/cloudsolr.conf:68-72): project onto
    * the target collection's schema — schema-driven projection at plan time.
    */
  def sanitizeToSchema(df: DataFrame, allowedFields: Seq[String]): DataFrame =
    df.select(df.columns.filter(allowedFields.contains(_)).map(col).toSeq: _*)

  /** The `SOLR_LOCATOR` shape of the reference configs
    * (config/cloudsolr.conf:1-7): ZooKeeper ensemble + collection name,
    * plus the two batching knobs the loadSolr chain owns. `zkHost` is
    * carried for the cluster-state reader a production deployment wires
    * into [[graft.io.HttpSenders.cloudSolrSender]]; in-container tests
    * stub the state function instead.
    */
  final case class SolrLocator(collection: String,
                               zkHost: Option[String] = None,
                               batchSize: Int = 1000,
                               commitWithinMs: Int = 1000)

  /** Per-JVM pluggable Solr environment for the `loadSolr` /
    * `sanitizeUnknownSolrFields` commands: the transport that receives
    * document batches and the known collection schemas. The default sender
    * is a no-op, so verbatim reference configs compile and run without a
    * Solr instance; a production deployment installs a real SolrClient-backed
    * sender at executor startup (the object is JVM-global, so each executor
    * initializes its own client — the per-partition connection pattern the
    * reference's loadSolr task uses).
    */
  object SolrEnv {
    @volatile var sender: (String, Seq[Map[String, Any]]) => Unit = (_, _) => ()
    private val schemas =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    def registerSchema(collection: String, fields: Seq[String]): Unit =
      schemas.put(collection, fields)
    def schemaOf(collection: String): Option[Seq[String]] =
      Option(schemas.get(collection))
    def reset(): Unit = { sender = (_, _) => (); schemas.clear() }
  }

  /** Per-JVM pluggable Kafka producer transport for the `kafkaProducer`
    * command: receives (topic, key, value) triples per batch. Default no-op
    * (no broker/kafka jar in this container); swap in a KafkaProducer-backed
    * sender in production.
    */
  object KafkaEnv {
    @volatile var sender: Seq[(String, Array[Byte], Array[Byte])] => Unit = _ => ()
    def reset(): Unit = sender = _ => ()
  }

  /** Lazy pass-through sink stage: per partition, buffer `batchSize` rows,
    * hand each batch to `send`, and yield the rows unchanged downstream —
    * the execution shape of the reference's terminal-but-not-final commands
    * (loadSolr / kafkaProducer load the record, then pass it to their child
    * command). Runs on executors at action time; a replayed epoch re-sends
    * its batch (at-least-once — the reference's Connect semantics).
    */
  def passThrough(df: DataFrame, batchSize: Int)(
      send: Seq[Row] => Unit): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions(_.grouped(math.max(1, batchSize))
      .flatMap { b => send(b); b })
  }

  /** `loadSolr` (config/cloudsolr.conf:74-78): batch documents into the
    * collection's transport, pass records downstream. Documents are the
    * row's columns as a field map — the post-sanitize projection IS the
    * collection schema.
    */
  def loadSolr(df: DataFrame, collection: String,
               batchSize: Int = 1000): DataFrame = {
    val fields = df.schema.fieldNames.toSeq
    passThrough(df, batchSize)(rows => SolrEnv.sender(collection,
      rows.map(r => fields.map(f => f -> r.getAs[Any](f)).toMap)))
  }

  /** [[loadSolr]] driven by a [[SolrLocator]] — the verbatim
    * `loadSolr { solrLocator : ${SOLR_LOCATOR} }` config shape
    * (config/cloudsolr.conf:74-78). Batch size comes from the locator;
    * the transport (single-node or SolrCloud-routed) is whatever
    * [[SolrEnv.sender]] was installed at executor startup.
    */
  def loadSolr(df: DataFrame, locator: SolrLocator): DataFrame =
    loadSolr(df, locator.collection, locator.batchSize)

  /** `kafkaProducer` (KafkaDataProducerCommandBuilder.java:84-522): derive
    * (topic, key, value) columns, batch the triples into the producer
    * transport, pass the original record downstream. The derived columns
    * ride the same plan (one codegen'd projection) and are dropped after
    * the send stage.
    */
  def kafkaProduce(df: DataFrame, topic: org.apache.spark.sql.Column,
                   key: org.apache.spark.sql.Column,
                   value: org.apache.spark.sql.Column,
                   batchSize: Int = 1000): DataFrame = {
    val staged = df.withColumn("_kp_topic", topic)
      .withColumn("_kp_key", key).withColumn("_kp_value", value)
    passThrough(staged, batchSize)(rows => KafkaEnv.sender(rows.map(r =>
      (r.getAs[String]("_kp_topic"), r.getAs[Array[Byte]]("_kp_key"),
        r.getAs[Array[Byte]]("_kp_value")))))
      .drop("_kp_topic", "_kp_key", "_kp_value")
  }

  /** [[kafkaProduce]] with a per-record Avro schema carried in a column —
    * the reference's `valueSchemaField` config (KafkaDataProducerCommand-
    * Builder.java:178, fed by enrichJson's `valueSchema` output). Arbitrary
    * per-record schemas can't compile to one batch plan, but the distinct
    * schema strings are a bounded model (driver-fetched, hard-capped — the
    * conformByField pattern): one encode branch per schema, unioned. A JSON
    * string value column is parsed with the schema's Catalyst type first
    * (enrichJson's wire shape); rows with a null schema pass through
    * without being produced (the reference skips them).
    */
  def kafkaProduceBySchemaField(df: DataFrame,
                                topic: org.apache.spark.sql.Column,
                                key: org.apache.spark.sql.Column,
                                valueField: String, schemaField: String,
                                batchSize: Int = 1000,
                                maxSchemas: Int = 16,
                                registryIds: Map[String, Int] = Map.empty): DataFrame = {
    val schemas = df.select(col(schemaField)).filter(col(schemaField).isNotNull)
      .distinct().limit(maxSchemas + 1).collect().map(_.getString(0)).toSeq
    require(schemas.size <= maxSchemas,
      s"valueSchemaField '$schemaField' carries more than $maxSchemas " +
        "distinct schemas; per-record dispatch requires a bounded schema set")
    // Registry wire format (the reference's KafkaAvroSerializer default,
    // KafkaDataProducerCommandBuilder.java:253-254): when the caller
    // supplies schema->registry-id assignments, every encoded value is
    // framed magic 0x00 + 4-byte BE id + payload. The id map is the
    // client-side registry cache; requiring full coverage up front beats
    // discovering a missing id per-record on an executor.
    require(registryIds.isEmpty || schemas.forall(registryIds.contains),
      s"registryIds must cover every schema in '$schemaField': missing " +
        schemas.filterNot(registryIds.contains).mkString(", "))
    val isJsonString =
      df.schema(valueField).dataType == org.apache.spark.sql.types.StringType
    // Single-pass dispatch (the conformByField pattern): the per-schema
    // encodes compile into ONE chained-when binary column, so the input is
    // scanned once instead of once per schema + union. Rows with a null
    // schema still flow downstream but are filtered out of the send batch
    // (the reference skips producing them).
    val valueCol = schemas.foldRight(
        lit(null).cast(org.apache.spark.sql.types.BinaryType):
          org.apache.spark.sql.Column) { (sj, acc) =>
      val typed =
        if (isJsonString)
          from_json(col(valueField),
            graft.functions.Conform.parseAvro(sj).dataType)
        else col(valueField)
      val enc = graft.exprs.AvroExprs.to_avro_binary(typed, sj)
      val wire = registryIds.get(sj)
        .map(id => graft.exprs.AvroExprs.confluent_frame(enc, lit(id)))
        .getOrElse(enc)
      when(col(schemaField) === sj, wire).otherwise(acc)
    }
    val staged = df.withColumn("_kp_topic", topic)
      .withColumn("_kp_key", key).withColumn("_kp_value", valueCol)
    val schemaIdx = staged.schema.fieldIndex(schemaField)
    passThrough(staged, batchSize) { rows =>
      val out = rows.filter(r => !r.isNullAt(schemaIdx)).map(r =>
        (r.getAs[String]("_kp_topic"), r.getAs[Array[Byte]]("_kp_key"),
          r.getAs[Array[Byte]]("_kp_value")))
      if (out.nonEmpty) KafkaEnv.sender(out)
    }.drop("_kp_topic", "_kp_key", "_kp_value")
  }

  /** Bucketed table write: co-locates join/aggregation keys at write time
    * so later equi-joins and group-bys on `bucketCols` read both sides
    * pre-partitioned — no shuffle at query time (the write-once
    * shuffle-never pattern for repeatedly joined 100 TB tables).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** Partitioned parquet write — the bulk materialization path. Partition
    * count sized by target file size, not fixed: at 100 TB the caller sets
    * `targetFileMB` and we repartition by range on the sort key for
    * clustering + min/max pruning on read.
    */
  def parquetSink(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
                  sortWithin: Seq[String] = Nil): Unit = {
    val sorted = if (sortWithin.nonEmpty)
      df.sortWithinPartitions(sortWithin.map(col): _*) else df
    val w = sorted.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
