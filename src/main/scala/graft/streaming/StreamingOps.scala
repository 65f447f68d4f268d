package graft.streaming

import graft.pipeline.Pipeline
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Structured-Streaming runner: the Spark-native replacement for the
  * reference's Kafka Connect runtime (SURVEY.md §3 EP1/EP3).
  *
  * The reference's execution loop — per-poll batch, `notifyBeginTransaction`
  * … `notifyCommitTransaction`, offset commit, at-least-once
  * (MorphlineSinkTask.java:129-149) — maps 1:1 onto micro-batch epochs with
  * checkpointing: trigger = the poll, epoch commit = the transaction
  * notification pair, checkpoint = the offset commit.
  */
object StreamingOps {

  /** Kafka streaming source with the reference's envelope columns (they are
    * Spark's native Kafka-source columns — no adaptation layer needed).
    */
  def kafkaSource(spark: SparkSession, bootstrap: String, topics: String,
                  startingOffsets: String = "earliest",
                  minPartitions: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
    minPartitions.fold(r)(n => r.option("minPartitions", n.toString)).load()
  }

  /** File-based streaming source (the FileStreamSourceConnector analogue,
    * reference README.md:108). `options` passes reader knobs through —
    * e.g. `maxFilesPerTrigger=1` makes each staged file its own
    * micro-batch, the test stand-in for the connector's per-poll batches.
    */
  def fileSource(spark: SparkSession, schema: StructType, path: String,
                 format: String = "parquet",
                 options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(spark.readStream.schema(schema))((r, kv) =>
      r.option(kv._1, kv._2)).format(format).load(path)

  /** Apply a pipeline to a stream — pipelines are plain
    * `DataFrame => DataFrame`, so batch-built pipelines run on streams
    * unchanged provided they use only stream-legal ops (no global limit).
    */
  def transform(stream: DataFrame, pipeline: Pipeline): DataFrame =
    pipeline(stream)

  /** Kafka sink with dynamic per-row topic (native: the `topic` column —
    * what the reference's `kafkaProducer` does per record,
    * KafkaDataProducerCommandBuilder.java:84-522).
    */
  def kafkaSink(df: DataFrame, bootstrap: String, checkpoint: String,
                trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)

  /** foreachBatch sink for external systems without a native connector (the
    * `loadSolr` shape): per-epoch batch handed to a user writer; idempotence
    * comes from stable document keys (deterministicKey op) + epoch replay.
    */
  def foreachBatchSink(df: DataFrame, checkpoint: String)(
      writer: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(writer)

  /** Event-time sanity predicate: `tsCol` is non-null and inside
    * [lo, hi]. The watermark is `max(event time) − delay` with NO
    * upper-bound defense in Spark itself, so ONE corrupt future
    * timestamp (a 2200-01-01 from a broken producer) instantly
    * advances the watermark past all real traffic and every
    * subsequent legitimate event is silently dropped as late — at
    * 100 TB/day a certainty, and the failure mode is invisible
    * (output just stops growing). Null event times never enter a
    * window/session operator either (dropped at the watermark), so
    * they fail the predicate too and can be routed to a dead letter
    * instead of vanishing. Negate for the dead-letter branch.
    */
  def eventTimeSane(tsCol: String, lo: java.time.Instant,
                    hi: java.time.Instant): Column =
    col(tsCol).isNotNull &&
      col(tsCol) >= lit(java.sql.Timestamp.from(lo)) &&
      col(tsCol) <= lit(java.sql.Timestamp.from(hi))

  /** Keep only sane-event-time rows (see [[eventTimeSane]]) — apply
    * BEFORE `withWatermark` so a poison timestamp can never touch the
    * watermark clock.
    */
  def eventTimeSanityFilter(stream: DataFrame, tsCol: String,
                            lo: java.time.Instant,
                            hi: java.time.Instant): DataFrame =
    stream.filter(eventTimeSane(tsCol, lo, hi))

  /** Event-time windowed aggregation with watermark — the streaming-native
    * capability layer beyond the reference (SURVEY.md §2.E): tumbling or
    * sliding windows over an event-time column with late-data bound.
    */
  def windowedCounts(stream: DataFrame, tsCol: String, watermark: String,
                     windowLen: String, slide: Option[String] = None,
                     groupCols: Seq[String] = Nil,
                     aggs: Seq[Column] = Nil): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None => window(col(tsCol), windowLen)
    }
    val aggExprs =
      if (aggs.nonEmpty) aggs else Seq(count(lit(1)).as("n"))
    stream.withWatermark(tsCol, watermark)
      .groupBy((win +: groupCols.map(col)): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Streaming exact dedup: state-backed `dropDuplicates` on a content
    * digest, bounded by the watermark (state for keys older than the
    * watermark is evicted — the streaming form of Dedup.exact; unbounded
    * key-space dedup at 100 TB needs exactly this eviction bound).
    */
  def streamingDedup(stream: DataFrame, tsCol: String, watermark: String,
                     keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Streaming dedup for duplicates that arrive with *different* event
    * times within the watermark delay (retries/replays that restamp):
    * `dropDuplicatesWithinWatermark` keys on content only, state still
    * evicted by the watermark.
    */
  def streamingDedupWithin(stream: DataFrame, tsCol: String, watermark: String,
                           keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-dup dedup: dedup on the normalized-word-set fingerprint
    * (whitespace/punct/word-order variants collapse — the streaming form of
    * Dedup.byFingerprint) or any signature column. State is one small
    * digest per distinct doc, watermark-evicted; the full LSH pair search
    * stays a batch job (pair generation needs a corpus-wide self-join), but
    * the fingerprint tier runs in-stream and drops the bulk of near-dups
    * before they ever land.
    */
  def streamingNearDedup(stream: DataFrame, textCol: String, tsCol: String,
                         watermark: String): DataFrame =
    stream
      .withColumn("__fp", graft.text.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")

  /** Streaming tier of SemDeDup (Abbas et al. 2023): assign each vector to
    * its nearest-centroid cell (stateless scan-stage
    * [[graft.exprs.HashExprs.NearestCentroid]] against the driver-small
    * centroid model) and drop vectors whose int8-quantized signature was
    * already seen within the watermark. Quantization collapses "identical
    * up to 1/127 per dim" to one representative with bounded per-key state
    * (one md5 per distinct signature, watermark-evicted); the exact
    * within-cell cosine pass ([[graft.sim.Similarity.semanticDedup]])
    * stays a batch job — the same tier split as [[streamingNearDedup]] vs
    * the batch LSH pair search.
    */
  def streamingSemanticDedup(stream: DataFrame, vecCol: String, tsCol: String,
                             watermark: String,
                             centroids: Seq[Seq[Double]]): DataFrame = {
    val v = org.apache.spark.sql.functions.transform(col(vecCol), _.cast("double"))
    val sc = graft.sim.Similarity.int8Scale(v)
    val sig = md5(concat_ws(",",
      graft.exprs.HashExprs.nearest_centroid(v, centroids).cast("string"),
      concat_ws(",", org.apache.spark.sql.functions.transform(
        graft.sim.Similarity.quantizeInt8(v, sc), _.cast("string")))))
    stream
      .withColumn("__sig", sig)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__sig"))
      .drop("__sig")
  }

  /** Session windows over event time (gap-based) — built-in
    * `session_window`; state is managed by Spark's streaming aggregation.
    */
  def sessionCounts(stream: DataFrame, tsCol: String, gap: String,
                    keyCols: Seq[String]): DataFrame =
    stream.groupBy((session_window(col(tsCol), gap) +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))

  /** Streaming `head` per key (SURVEY.md §7.4 hard part: a global limit is
    * not streamable, but a per-key first-N is — a counter per key in
    * `flatMapGroupsWithState`). Emits at most `n` rows per key across the
    * stream's lifetime.
    */
  def streamingHeadPerKey(spark: SparkSession, stream: DataFrame,
                          keyCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import org.apache.spark.sql.{Encoders, Row}
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(stream.schema)
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val intEnc: org.apache.spark.sql.Encoder[Int] = Encoders.scalaInt
    val keyIdx = stream.schema.fieldIndex(keyCol)
    stream.groupByKey((r: Row) => r.getLong(keyIdx))
      .flatMapGroupsWithState[Int, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Row], state: GroupState[Int]) =>
          val seen = state.getOption.getOrElse(0)
          val take = rows.take(math.max(0, n - seen)).toSeq
          state.update(seen + take.size)
          take.iterator
      }
  }

  /** Streaming sequence packing: the tape semantics of
    * [[graft.pack.Packing.packSequences]] over an unbounded stream — each
    * key keeps its running token offset in group state, so context-window
    * bins continue seamlessly across micro-batches (a restart resumes from
    * the checkpointed offset; no bin is ever reused). Arrival order within
    * the key defines tape order, because an unbounded stream has no global
    * id order to sort by — the batch op and this one agree exactly when
    * arrival order matches id order (asserted in StreamingSpec).
    *
    * Input rows carry a precomputed token count (`tokenCol`, long) — the
    * tokenizing itself stays a stateless scan-stage expression upstream.
    * State per key is ONE long; at 100 TB of stream the state store holds
    * |keys| longs, not documents.
    */
  def streamingPack(stream: DataFrame, keyCol: String, idCol: String,
                    tokenCol: String, capacity: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val in = stream.select(col(keyCol).cast("string").as("key"),
      col(idCol).cast("long").as("id"),
      col(tokenCol).cast("long").as("n_toks"))
    val outSchema = new StructType().add("key", StringType)
      .add("id", LongType).add("n_toks", LongType).add("bin", LongType)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val strEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    in.groupByKey((r: Row) => r.getString(0))
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Row], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.map { r =>
            val nt = r.getLong(2)
            val bin = off / capacity
            off += nt
            Row(key, r.getLong(1), nt, bin)
          }.toSeq // drain BEFORE state.update sees the final offset
          state.update(off)
          out.iterator
      }
  }

  /** Run a streaming pipeline to the in-memory sink synchronously — the
    * local smoke harness (processAllAvailable drains the source).
    */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q
  }
}
