package graft

import graft.io.Sinks
import graft.ops.{ParserOps, RecordOps}
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end parity with the reference's flagship config
  * (config/cloudsolr.conf:20-81, FIXTURES.md F5): Kafka envelope →
  * readJson → extractJsonPaths(name_s:/name) → convertTimestamp
  * (kafkaTimestamp unixTimeInMillis → ISO millis) → setValues(create_dt) →
  * generateUUID(uuid_s) → generateSolrSequenceKey → sanitizeUnknownSolrFields
  * → loadSolr (DocumentSinkWriter stand-in).
  */
class CloudSolrPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("cloudsolr.conf pipeline shape end-to-end, documents land in the sink") {
    // twitter-style JSON value + Kafka envelope (topic/partition/timestamp)
    val input = Seq(
      ("""{"name": "quickstart-text-file-source", "config": {"topic":"twitter"}}""",
        "twitter", 0, 0L, 1484897702123L),
      ("""{"name": "second-source", "config": {"topic":"twitter"}}""",
        "twitter", 0, 1L, 1484897702124L))
      .toDF("value", "topic", "partition", "offset", "kafkaTimestamp")

    val solrSchema = Seq("id", "name_s", "kafkaTimestamp", "create_dt", "uuid_s")
    val pipe = Pipeline("cloudsolr", Seq(
      ParserOps.readJson("value",
        new StructType().add("name", StringType)
          .add("config", new StructType().add("topic", StringType))),
      RecordOps.extractPaths("json", "name" -> "name_s"),
      RecordOps.convertTimestamp("kafkaTimestamp",
        Seq("unixTimeInMillis"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'", "kafkaTimestamp"),
      RecordOps.setValues("create_dt" -> "@{kafkaTimestamp}"),
      RecordOps.generateUUID("uuid_s"),
      RecordOps.deterministicKey("id", col("name_s"), col("offset"))))

    val out = Sinks.sanitizeToSchema(pipe(input), solrSchema)
    assert(out.columns.toSeq.sorted == solrSchema.sorted)

    val rows = out.orderBy("name_s").collect()
    assert(rows.length == 2)
    val r = rows.find(_.getAs[String]("name_s") == "quickstart-text-file-source").get
    assert(r.getAs[String]("kafkaTimestamp") == "2017-01-20T07:35:02.123Z")
    assert(r.getAs[String]("create_dt") == "2017-01-20T07:35:02.123Z")
    assert(r.getAs[String]("uuid_s").matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(r.getAs[String]("id").nonEmpty)

    // loadSolr stand-in: the ForeachWriter collects the sanitized docs
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Any]]()
    out.collect().foreach { row =>
      val w = new Sinks.DocumentSinkWriter("id", batchSize = 10,
        send = b => b.foreach(collected.add))
      w.open(0L, 0L); w.process(row); w.close(null)
    }
    assert(collected.size == 2)
    assert(collected.iterator().next().keySet == solrSchema.toSet)
  }
}
