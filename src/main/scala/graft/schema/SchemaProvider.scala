package graft.schema

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Where `enrichJson` / `toAvro` get their target Avro schema — the
  * reference's three mutually-exclusive config keys (`schemaString` /
  * `schemaFile` / registry subject; EnrichJsonBuilder.java:150-200,
  * KafkaDataProducerCommandBuilder.java:140-219).
  *
  * Scale contract: `schemaJson` is resolved ONCE at plan time on the
  * driver; the resolved JSON string is embedded in the plan and shipped to
  * executors with the serialized expressions (the broadcast-at-plan-time
  * shape). No executor ever performs I/O or a registry fetch — at 1000
  * executors a per-task fetch would be a thundering herd against the
  * registry.
  */
sealed trait SchemaProvider {
  /** The Avro schema JSON. Called at plan time, driver side only. */
  def schemaJson: String
}

object SchemaProvider {

  /** Inline literal (reference `schemaString`). */
  final case class Literal(json: String) extends SchemaProvider {
    def schemaJson: String = json
  }

  /** Schema file: a filesystem path or a `resource:NAME` classpath URI
    * (reference `schemaFile`, KafkaDataProducerCommandBuilder.java:158-175).
    */
  final case class FromFile(path: String) extends SchemaProvider {
    def schemaJson: String =
      if (path.startsWith("resource:")) {
        val name = path.substring("resource:".length)
        val in = Option(getClass.getClassLoader.getResourceAsStream(name))
          .getOrElse(throw new IllegalArgumentException(
            s"classpath resource not found: $name"))
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      } else
        new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
  }

  /** Latest schema for a subject from a registry (the reference fetches by
    * subject through a CachedSchemaRegistryClient with a 100-entry cache,
    * EnrichJsonBuilder.java:191-200). The transport is pluggable: this
    * container has no egress, so tests drive [[InMemoryRegistry]]; a
    * production deployment implements [[RegistryClient]] over HTTP and
    * wraps it in [[CachedRegistryClient]].
    */
  final case class FromRegistry(client: RegistryClient, subject: String)
      extends SchemaProvider {
    def schemaJson: String = client.latest(subject).getOrElse(
      throw new NoSuchElementException(s"no schema registered for subject '$subject'"))
  }
}

/** Minimal registry surface: latest schema JSON for a subject. */
trait RegistryClient {
  def latest(subject: String): Option[String]
}

/** Driver-side LRU cache over any [[RegistryClient]] — the reference's
  * CachedSchemaRegistryClient shape, bounded to `maxEntries` subjects
  * (default 100, matching EnrichJsonBuilder.java:192). Negative results are
  * cached too: a missing subject shouldn't be re-fetched per pipeline
  * compile.
  */
final class CachedRegistryClient(underlying: RegistryClient, maxEntries: Int = 100)
    extends RegistryClient {
  private val cache =
    new java.util.LinkedHashMap[String, Option[String]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[String]]): Boolean =
        size() > maxEntries
    }
  /** Fetches that reached the underlying client (test observability). */
  @volatile private[graft] var misses: Int = 0

  def latest(subject: String): Option[String] = synchronized {
    val hit = cache.get(subject)
    if (hit != null) hit
    else {
      misses += 1
      val v = underlying.latest(subject)
      cache.put(subject, v)
      v
    }
  }
}

/** In-memory registry stub: subject → ordered versions (latest = last). */
final class InMemoryRegistry(subjects: Map[String, Seq[String]])
    extends RegistryClient {
  def latest(subject: String): Option[String] =
    subjects.get(subject).flatMap(_.lastOption)
}

/** Per-JVM pluggable registry client for HOCON-compiled `enrichJson`
  * commands: a `.conf` file can only name the registry URL (a transport
  * endpoint — deployment config), so the actual client is installed here at
  * startup, mirroring Sinks.SolrEnv/KafkaEnv. Default resolves nothing —
  * every subject "skips enrichment" like the reference does on a registry
  * miss (EnrichJsonBuilder.java:172-175).
  */
object SchemaRegistryEnv {
  private val empty: RegistryClient = new RegistryClient {
    def latest(subject: String): Option[String] = None
  }
  @volatile var client: RegistryClient = empty
  private val httpClients =
    new java.util.concurrent.ConcurrentHashMap[String, RegistryClient]()

  /** Resolve the client for a config-file registry URL: a real
    * `http(s)://` endpoint gets an [[HttpRegistryClient]] (LRU-cached,
    * one per URL — the reference builds `CachedSchemaRegistryClient(url,
    * 100)` from the same config key); anything else (`mock://`, tests,
    * offline) falls back to the installed pluggable [[client]].
    */
  def forUrl(url: String): RegistryClient =
    if (url.startsWith("http://") || url.startsWith("https://"))
      httpClients.computeIfAbsent(url, HttpRegistryClient.cached(_))
    else client

  def reset(): Unit = { client = empty; httpClients.clear() }
}
