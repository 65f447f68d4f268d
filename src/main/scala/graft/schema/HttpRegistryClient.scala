package graft.schema

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** HTTP-backed [[RegistryClient]] over the Confluent Schema Registry REST
  * surface — the transport behind the reference's
  * CachedSchemaRegistryClient (EnrichJsonBuilder.java:191-200): latest
  * schema by subject via `GET {url}/subjects/{subject}/versions/latest`.
  *
  * Error semantics mirror the reference's fetchAvroSchemaFromSchemaRegistry:
  * any failure (missing subject, transport error, bad payload) logs and
  * yields None, so enrichment warn-and-skips instead of failing the
  * pipeline (EnrichJsonBuilder.java:195-199 catches and returns null).
  *
  * Scale contract: driver-side only, called at plan time through
  * [[SchemaProvider.FromRegistry]] / `Conform.conformBySubject` — executors
  * never see this class (the resolved schema JSON ships inside the plan).
  * Production use wraps it in [[CachedRegistryClient]] (LRU 100, the
  * reference's cache size) via [[HttpRegistryClient.cached]].
  */
final class HttpRegistryClient(baseUrl: String,
                               timeout: Duration = Duration.ofSeconds(10))
    extends RegistryClient {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val root = baseUrl.stripSuffix("/")
  private val http = HttpClient.newBuilder().connectTimeout(timeout).build()

  def latest(subject: String): Option[String] =
    try {
      val enc = java.net.URLEncoder.encode(subject, StandardCharsets.UTF_8)
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"$root/subjects/$enc/versions/latest"))
        .timeout(timeout)
        .header("Accept", "application/vnd.schemaregistry.v1+json")
        .GET().build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      resp.statusCode() match {
        case 200 =>
          // registry envelope: {"subject":..,"version":..,"id":..,"schema":"…"}
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(resp.body())
          Option(node.get("schema")).map(_.asText()).orElse {
            log.error("registry response for subject '{}' has no schema field: {}",
              subject, resp.body(): Any)
            None
          }
        case 404 => None // unknown subject: warn-and-skip, not an error
        case s =>
          log.error("registry returned {} for subject '{}'", s, subject: Any)
          None
      }
    } catch {
      case e: InterruptedException =>
        // restore the flag so driver-thread cancellation still lands after
        // this plan-time lookup degrades to warn-and-skip
        Thread.currentThread().interrupt()
        log.error(s"interrupted fetching schema for subject '$subject'", e)
        None
      case e: java.io.IOException =>
        log.error(s"error fetching schema for subject '$subject' from registry", e)
        None
    }
}

object HttpRegistryClient {
  /** The reference's client shape: HTTP transport + 100-entry LRU cache
    * (`new CachedSchemaRegistryClient(url, 100)`).
    */
  def cached(baseUrl: String, timeout: Duration = Duration.ofSeconds(10)): RegistryClient =
    new CachedRegistryClient(new HttpRegistryClient(baseUrl, timeout), 100)
}
