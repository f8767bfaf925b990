package graft.serde

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.GraftHttp
import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** In-process stub speaking the Confluent Schema Registry REST protocol —
  * the test double for [[RestSchemaRegistry]] (protocol per tamer
  * `core/src/main/scala/tamer/Registry.scala:76-110`):
  *
  *  - `POST /subjects/{subject}` → `{subject,id,version,schema}` for a
  *    known (subject, schema), else `404 {"error_code":40403,...}`;
  *  - `POST /subjects/{subject}/versions` → registers, `{"id":N}`;
  *  - `GET /schemas/ids/{id}` → `{"schema":"..."}` else 404.
  *
  * Ids are global and monotonic from 1, one per distinct schema string per
  * subject (Confluent semantics). Optional `requiredAuth` rejects requests
  * without the exact Authorization header with 401. Per-route hit counters
  * let specs prove memoization (a cached client stops producing traffic).
  */
final class SrFixtureServer(requiredAuth: Option[String] = None) {
  private val mapper = new ObjectMapper
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  private val nextId = new AtomicInteger(1)
  private val bySubjectSchema = new ConcurrentHashMap[(String, String), Int]()
  private val versionsBySubject = new ConcurrentHashMap[String, Integer]()
  private val byId = new ConcurrentHashMap[Int, String]()

  val lookupCalls = new AtomicInteger(0)
  val registerCalls = new AtomicInteger(0)
  val fetchCalls = new AtomicInteger(0)

  /** When set, `GET /schemas/ids/{id}` answers 500 — simulates a registry
    * outage so specs can pin that transient failure stays FATAL (GraftError)
    * rather than dead-lettering like an authoritative 404. */
  val failFetches = new java.util.concurrent.atomic.AtomicBoolean(false)

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port"

  def basicAuthHeaderOf(user: String, pass: String): String = GraftHttp.basicHeader(user, pass)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def authorized(ex: HttpExchange): Boolean = requiredAuth.forall { expected =>
    Option(ex.getRequestHeaders.getFirst("Authorization")).contains(expected)
  }

  private def schemaOf(ex: HttpExchange): String = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    mapper.readTree(body).get("schema").asText()
  }

  private def notFound(ex: HttpExchange, msg: String): Unit =
    respond(ex, 404, s"""{"error_code":40403,"message":"$msg"}""")

  server.createContext("/subjects", (ex: HttpExchange) => {
    if (!authorized(ex)) respond(ex, 401, """{"error_code":401,"message":"unauthorized"}""")
    else {
      // /subjects/{subject} (lookup) or /subjects/{subject}/versions (register)
      val parts = ex.getRequestURI.getPath.stripPrefix("/subjects/").split("/")
      val subject = URLDecoder.decode(parts(0), UTF_8)
      val isRegister = parts.length > 1 && parts(1) == "versions"
      val schema = schemaOf(ex)
      if (isRegister) {
        registerCalls.incrementAndGet()
        val id = bySubjectSchema.computeIfAbsent((subject, schema), { _ =>
          val id = nextId.getAndIncrement()
          byId.put(id, schema)
          versionsBySubject.merge(subject, 1, (a, b) => a + b)
          id
        })
        respond(ex, 200, s"""{"id":$id}""")
      } else {
        lookupCalls.incrementAndGet()
        Option(bySubjectSchema.get((subject, schema))) match {
          case Some(id) =>
            val v = versionsBySubject.getOrDefault(subject, 1)
            respond(ex, 200, mapper.writeValueAsString(
              mapper.createObjectNode().put("subject", subject).put("id", id.toInt)
                .put("version", v.toInt).put("schema", schema)))
          case None => notFound(ex, "Schema not found")
        }
      }
    }
  })

  server.createContext("/schemas/ids/", (ex: HttpExchange) => {
    if (!authorized(ex)) respond(ex, 401, """{"error_code":401,"message":"unauthorized"}""")
    else {
      fetchCalls.incrementAndGet()
      if (failFetches.get())
        respond(ex, 500, """{"error_code":50001,"message":"store down"}""")
      else {
        val id = ex.getRequestURI.getPath.stripPrefix("/schemas/ids/").toInt
        Option(byId.get(id)) match {
          case Some(schema) =>
            respond(ex, 200, mapper.writeValueAsString(mapper.createObjectNode().put("schema", schema)))
          case None => notFound(ex, s"Schema $id not found")
        }
      }
    }
  })

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
