package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.schema.{HttpRegistryClient, SchemaRegistryEnv}
import org.scalatest.funsuite.AnyFunSuite

/** [[HttpRegistryClient]] against an in-process Confluent-REST-shaped stub
  * (no egress needed): latest-by-subject GET, 404/5xx warn-and-skip parity
  * with EnrichJsonBuilder.java:191-200, LRU caching, URL resolution.
  */
class HttpRegistrySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** subject → schema JSON; counts every hit per subject. */
  private def withStub(subjects: Map[String, String], status: Int = 200)(
      body: (String, java.util.concurrent.ConcurrentHashMap[String, Integer]) => Unit): Unit = {
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val path = x.getRequestURI.getRawPath
      val m = "^/subjects/([^/]+)/versions/latest$".r.findFirstMatchIn(path)
      val subject = m.map(g => java.net.URLDecoder.decode(g.group(1), "UTF-8"))
      subject.foreach(s => hits.merge(s, 1, (a, b) => a + b))
      val resp: (Int, String) = subject.flatMap(s => subjects.get(s)) match {
        case _ if status != 200 => (status, """{"error_code":50001,"message":"boom"}""")
        case Some(schema) =>
          val env = mapper.createObjectNode()
          env.put("subject", subject.get); env.put("version", 3)
          env.put("id", 17); env.put("schema", schema)
          (200, mapper.writeValueAsString(env))
        case None => (404, """{"error_code":40401,"message":"Subject not found"}""")
      }
      val bytes = resp._2.getBytes("UTF-8")
      x.getResponseHeaders.add("Content-Type",
        "application/vnd.schemaregistry.v1+json")
      x.sendResponseHeaders(resp._1, bytes.length)
      x.getResponseBody.write(bytes); x.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  private val person =
    """{"type":"record","name":"P","fields":[{"name":"x","type":"long"}]}"""

  test("latest-by-subject GET returns the envelope's schema field") {
    withStub(Map("t-value" -> person)) { (url, _) =>
      val c = new HttpRegistryClient(url)
      assert(c.latest("t-value").contains(person))
    }
  }

  test("subjects are URL-encoded on the wire") {
    withStub(Map("a b/c" -> person)) { (url, hits) =>
      assert(new HttpRegistryClient(url).latest("a b/c").contains(person))
      assert(hits.containsKey("a b/c"), s"stub saw: ${hits.keySet()}")
    }
  }

  test("404 means unknown subject: None, no exception") {
    withStub(Map.empty) { (url, _) =>
      assert(new HttpRegistryClient(url).latest("nope").isEmpty)
    }
  }

  test("5xx and transport errors warn-and-skip like the reference") {
    withStub(Map("s" -> person), status = 500) { (url, _) =>
      assert(new HttpRegistryClient(url).latest("s").isEmpty)
    }
    // nothing listening on a fresh ephemeral port → IOException path
    val dead = new java.net.ServerSocket(0)
    val port = dead.getLocalPort; dead.close()
    assert(new HttpRegistryClient(s"http://127.0.0.1:$port",
      java.time.Duration.ofMillis(500)).latest("s").isEmpty)
  }

  test("response timeout degrades to warn-and-skip, not an exception") {
    // flaky registry (r17 VERDICT item 7): the server ACCEPTS the request
    // but never answers within the client timeout — the case connection-
    // refused cannot cover. Plan-time enrichment must warn-and-skip
    // (None) exactly like the reference's fetchAvroSchemaFromSchemaRegistry
    // catch-all (EnrichJsonBuilder.java:195-199), never hang or throw.
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    val hits = new java.util.concurrent.atomic.AtomicInteger
    server.createContext("/", (x: HttpExchange) => {
      hits.incrementAndGet()
      Thread.sleep(1500) // past the client's 300 ms request timeout
      try {
        x.sendResponseHeaders(200, 2)
        x.getResponseBody.write("{}".getBytes("UTF-8"))
      } catch { case _: java.io.IOException => () }
      finally x.close()
    })
    server.start()
    try {
      val c = new HttpRegistryClient(
        s"http://127.0.0.1:${server.getAddress.getPort}",
        java.time.Duration.ofMillis(300))
      val t0 = System.nanoTime()
      assert(c.latest("s").isEmpty)
      assert((System.nanoTime() - t0) / 1e9 < 5.0,
        "timeout must be bounded by the configured duration")
      assert(hits.get() == 1, "no blind plan-time retry of a hung registry")
    } finally server.stop(0)
  }

  test("cached() fetches each subject once — the reference's LRU-100 shape") {
    withStub(Map("s" -> person)) { (url, hits) =>
      val c = HttpRegistryClient.cached(url)
      (1 to 5).foreach(_ => assert(c.latest("s").contains(person)))
      (1 to 5).foreach(_ => assert(c.latest("missing").isEmpty)) // negative cached too
      assert(hits.get("s") == 1, s"expected 1 fetch, got ${hits.get("s")}")
      assert(hits.get("missing") == 1,
        s"expected 1 negative fetch, got ${hits.get("missing")}")
    }
  }

  test("SchemaRegistryEnv.forUrl: http urls get a real client, others the pluggable one") {
    SchemaRegistryEnv.reset()
    withStub(Map("s" -> person)) { (url, _) =>
      assert(SchemaRegistryEnv.forUrl(url).latest("s").contains(person))
      // same URL → same cached client instance (one LRU per endpoint)
      assert(SchemaRegistryEnv.forUrl(url) eq SchemaRegistryEnv.forUrl(url))
      // non-http scheme falls back to the installed pluggable client
      SchemaRegistryEnv.client = new graft.schema.InMemoryRegistry(
        Map("m" -> Seq(person)))
      assert(SchemaRegistryEnv.forUrl("mock://registry").latest("m").contains(person))
    }
    SchemaRegistryEnv.reset()
  }
}
