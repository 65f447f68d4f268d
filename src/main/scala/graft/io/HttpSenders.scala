package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Real HTTP transports for the pluggable sink environments ([[Sinks.SolrEnv]]
  * / [[Sinks.KafkaEnv]]) — the two transports the reference ships that are
  * exercisable without a broker:
  *
  *  - Confluent REST-proxy producer, matching the reference's publish loop
  *    (KafkaDataProducerCommandBuilder.java:311-374): POST per topic,
  *    `error_code` 50003 retried exactly once, transport-level IO surfaced
  *    as a retriable failure.
  *  - Solr JSON update endpoint (the HTTP face of the `loadSolr` chain,
  *    config/cloudsolr.conf:74-78).
  *
  * Both are executor-side senders: install with
  * `Sinks.KafkaEnv.sender = HttpSenders.restProxyKafkaSender(url)` at
  * executor startup. Each sender owns one [[HttpClient]] per JVM (connection
  * reuse — the reference builds a fresh HttpClient per publish, which is a
  * known hot-path inefficiency we do not copy).
  */
object HttpSenders {

  /** Batch should be retried by the caller/framework — the reference's
    * `RetriableException` on REST connection errors
    * (KafkaDataProducerCommandBuilder.java:368-370). Under Structured
    * Streaming the task fails and the epoch replays (at-least-once).
    */
  final class RetriableSinkException(msg: String, cause: Throwable)
      extends RuntimeException(msg, cause)

  /** Non-retriable producer failure carrying the proxy's `error_code` —
    * the reference's `ProducerException` shape.
    */
  final class ProducerHttpException(val errorCode: Long, msg: String)
      extends RuntimeException(s"error_code=$errorCode: $msg")

  private val mapper = new ObjectMapper()
  private lazy val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  private def post(url: String, contentType: String, accept: String,
                   body: Array[Byte], timeout: Duration): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder().uri(URI.create(url)).timeout(timeout)
        .header("Content-Type", contentType).header("Accept", accept)
        .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  /** Confluent REST-proxy producer sender for [[Sinks.KafkaEnv]].
    *
    * Wire shape: records grouped by topic, each group POSTed to
    * `{base}/topics/{topic}` as the v2 BINARY embedded format
    * (`{"records":[{"key":"<b64>","value":"<b64>"}]}`) — the transport
    * seam carries already-encoded bytes, so the binary content type is the
    * faithful mapping of the reference's ProducerData POST
    * (KafkaDataProducerCommandBuilder.java:334-348).
    *
    * Error semantics (reference :317-327, :368-373):
    *  - 2xx → success; response body ignored beyond consumption.
    *  - non-2xx with `error_code` 50003 (broker transient) → ONE retry of
    *    the same batch; a second failure throws [[ProducerHttpException]].
    *  - any other `error_code` → [[ProducerHttpException]] immediately.
    *  - connection-level IO error → [[RetriableSinkException]] (the
    *    reference's RetriableException: Connect redelivers).
    */
  def restProxyKafkaSender(baseUrl: String,
      timeout: Duration = Duration.ofSeconds(10))
      : Seq[(String, Array[Byte], Array[Byte])] => Unit = {
    val root = baseUrl.stripSuffix("/")
    batch => {
      val b64 = java.util.Base64.getEncoder
      // group by topic, preserving intra-topic record order
      batch.groupBy(_._1).foreach { case (topic, recs) =>
        val payload = mapper.createObjectNode()
        val arr = payload.putArray("records")
        recs.foreach { case (_, key, value) =>
          val rec = arr.addObject()
          if (key != null) rec.put("key", b64.encodeToString(key))
          if (value != null) rec.put("value", b64.encodeToString(value))
        }
        val body = mapper.writeValueAsBytes(payload)
        val url = s"$root/topics/" +
          java.net.URLEncoder.encode(topic, StandardCharsets.UTF_8)
        def attempt(): Option[(Long, String)] =
          try {
            val resp = post(url, "application/vnd.kafka.binary.v2+json",
              "application/vnd.kafka.v2+json", body, timeout)
            if (resp.statusCode() / 100 == 2) None
            else {
              val node = mapper.readTree(resp.body())
              Some((
                Option(node.get("error_code")).map(_.asLong())
                  .getOrElse(resp.statusCode().toLong),
                Option(node.get("message")).map(_.asText())
                  .getOrElse(resp.body())))
            }
          } catch {
            case e: java.io.IOException =>
              throw new RetriableSinkException(
                s"REST proxy unreachable at $url", e)
            case e: InterruptedException =>
              Thread.currentThread().interrupt()
              throw new RetriableSinkException(s"interrupted posting to $url", e)
          }
        attempt().foreach {
          case (50003, _) => // broker transient: retry the batch once
            attempt().foreach { case (code, msg) =>
              throw new ProducerHttpException(code, msg)
            }
          case (code, msg) => throw new ProducerHttpException(code, msg)
        }
      }
    }
  }

  /** Solr JSON update sender for [[Sinks.SolrEnv]]: each batch POSTed to
    * `{base}/{collection}/update?commitWithin={ms}` as a JSON array of
    * documents (Solr's standard JSON update surface — the HTTP equivalent
    * of the CloudSolrClient add the reference's loadSolr performs). The
    * unique-key upsert contract is Solr's: replayed epochs overwrite by id
    * (the generateSolrSequenceKey idempotence chain,
    * config/cloudsolr.conf:62-67). Non-2xx or IO failures throw
    * [[RetriableSinkException]] so the epoch replays rather than drops.
    */
  def solrHttpSender(baseUrl: String, commitWithinMs: Int = 1000,
      timeout: Duration = Duration.ofSeconds(10))
      : (String, Seq[Map[String, Any]]) => Unit = {
    val root = baseUrl.stripSuffix("/")
    (collection, docs) => postSolrUpdate(root, collection, docs,
      commitWithinMs, timeout)
  }

  /** One Solr JSON-update POST: `{root}/{collection}/update?commitWithin=`
    * with the docs as a JSON array — shared by the single-node and the
    * SolrCloud-shaped senders so the wire format cannot drift.
    */
  private def postSolrUpdate(root: String, collection: String,
      docs: Seq[Map[String, Any]], commitWithinMs: Int,
      timeout: Duration): Unit = {
    val arr = mapper.createArrayNode()
    docs.foreach { doc =>
      val node = arr.addObject()
      doc.foreach {
        case (_, null) => () // Solr omits null fields
        case (k, v: String) => node.put(k, v)
        case (k, v: Long) => node.put(k, v)
        case (k, v: Int) => node.put(k, v)
        case (k, v: Double) => node.put(k, v)
        case (k, v: Float) => node.put(k, v)
        case (k, v: Boolean) => node.put(k, v)
        case (k, v: Array[Byte]) =>
          node.put(k, java.util.Base64.getEncoder.encodeToString(v))
        case (k, v) => node.put(k, String.valueOf(v))
      }
    }
    val url = s"$root/" +
      java.net.URLEncoder.encode(collection, StandardCharsets.UTF_8) +
      s"/update?commitWithin=$commitWithinMs"
    try {
      val resp = post(url, "application/json", "application/json",
        mapper.writeValueAsBytes(arr), timeout)
      if (resp.statusCode() / 100 != 2)
        throw new RetriableSinkException(
          s"Solr update returned ${resp.statusCode()}: ${resp.body()}", null)
    } catch {
      case e: java.io.IOException =>
        throw new RetriableSinkException(s"Solr unreachable at $url", e)
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new RetriableSinkException(s"interrupted posting to $url", e)
    }
  }

  /** SolrCloud-shaped batched update sender — the deployment seam behind
    * `loadSolr { solrLocator : { zkHost, collection } }`
    * (config/cloudsolr.conf:1-7,74-78).
    *
    * What SolrJ's CloudSolrClient does with that locator: (a) read the
    * cluster state from zkHost to learn each collection's shard leaders,
    * (b) hash-route every document by its unique key onto a shard's hash
    * range (the CompositeId router), (c) send ONE batched update per
    * leader, carrying commitWithin. Here (a) is a pluggable
    * `clusterState: collection => ordered leader base URLs` (a zk-backed
    * implementation in production; a stub in tests — no zk/SolrJ exists in
    * this container), while (b) and (c) are real: documents are grouped by
    * a stable murmur3 hash of the `idField` over equal hash slices and
    * each group is POSTed to its leader with the shared wire format.
    * Leader-routed batching is what makes bulk indexing scale — a random
    * node would re-forward every doc a second hop.
    */
  def cloudSolrSender(clusterState: String => Seq[String],
      idField: String = "id", commitWithinMs: Int = 1000,
      timeout: Duration = Duration.ofSeconds(10))
      : (String, Seq[Map[String, Any]]) => Unit =
    (collection, docs) => {
      val leaders = clusterState(collection).map(_.stripSuffix("/"))
      if (leaders.isEmpty)
        throw new RetriableSinkException(
          s"no shard leaders known for collection '$collection'", null)
      docs.groupBy { d =>
        val key = String.valueOf(d.getOrElse(idField, ""))
        math.floorMod(
          scala.util.hashing.MurmurHash3.stringHash(key, 0), leaders.size)
      }.foreach { case (shard, shardDocs) =>
        postSolrUpdate(leaders(shard), collection, shardDocs,
          commitWithinMs, timeout)
      }
    }
}
