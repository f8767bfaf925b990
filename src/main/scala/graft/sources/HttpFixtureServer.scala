package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

/** In-process HTTP fixture: a paginated endpoint behind a rotating bearer
  * token, the JDK-HttpServer port of the reference's test REST server
  * semantics (tamer `example/src/main/scala/tamer/rest/support/
  * RESTServer.scala:45-88`):
  *
  *  - `GET /auth` (basic `user:pass`) → the CURRENT token, `tok<epoch>`;
  *  - `GET /docs?page=N` (bearer) → page N of `data` joined by `\n`
  *    (out-of-range pages are `200 ""`, like the reference's `getOrElse("")`);
  *    a stale token → `403`.
  *
  * The reference rotates its secret on a 2-second wall clock; a correctness
  * fixture can't depend on timing, so here the token rotates every
  * `rotateEvery` SUCCESSFUL data fetches (epoch = served / rotateEvery,
  * capped at `maxEpoch`) — fully deterministic, and it still forces the
  * client through the 403 → refresh → replay path mid-drain. The token check
  * is STRICT (current epoch only), so rotation must only be exercised by
  * sequential clients; a parallel-reader phase should pin rotation behind it
  * via `maxEpoch` (rotate once mid-walk, then hold) — that is exactly the
  * q47 pattern. `rotateEvery <= 0` pins a single static token.
  */
final class HttpFixtureServer(
    data: IndexedSeq[String],
    pageSize: Int,
    rotateEvery: Int = 0,
    maxEpoch: Int = Int.MaxValue,
    user: String = "user",
    pass: String = "pass",
    // transient-failure injection: the first N /docs requests 503 with
    // Retry-After: 0 (exercises the client's retry schedule deterministically)
    failFirst: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // sized for a full local[32] parallel-reader phase
  private val pool = Executors.newFixedThreadPool(32)
  private val served = new AtomicInteger(0)
  private val authAcquisitions = new AtomicInteger(0)
  private val authRejections = new AtomicInteger(0)
  private val failures = new AtomicInteger(0)

  /** Total 503s injected so far (to assert the retry path actually ran). */
  def injectedFailureCount: Int = math.min(failures.get(), failFirst)

  def port: Int = server.getAddress.getPort
  def docsUrl: String = s"http://127.0.0.1:$port/docs"
  def authUrl: String = s"http://127.0.0.1:$port/auth"

  /** How many times a client (re)acquired a token — >= 2 proves a refresh. */
  def authCallCount: Int = authAcquisitions.get()

  /** How many data requests were 403'd (each should trigger one replay). */
  def rejectionCount: Int = authRejections.get()

  private def epoch: Int =
    if (rotateEvery <= 0) 0 else math.min(served.get() / rotateEvery, maxEpoch)
  private def tokenFor(e: Int): String = s"tok$e"

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/auth", (ex: HttpExchange) => {
    val header = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    if (header == GraftHttp.basicHeader(user, pass)) {
      authAcquisitions.incrementAndGet()
      respond(ex, 200, tokenFor(epoch))
    } else respond(ex, 401, "")
  })

  server.createContext("/docs", (ex: HttpExchange) => {
    val header = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    // rotateEvery <= 0 → open endpoint (plain pagination fixtures);
    // otherwise STRICT: only the current epoch's token is accepted.
    val accepted = rotateEvery <= 0 || header == s"Bearer ${tokenFor(epoch)}"
    if (failures.getAndIncrement() < failFirst) {
      ex.getResponseHeaders.set("Retry-After", "0")
      respond(ex, 503, "")
    } else if (!accepted) {
      authRejections.incrementAndGet()
      respond(ex, 403, "")
    } else {
      val page = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("&").collectFirst { case kv if kv.startsWith("page=") => kv.drop(5).toInt }
        .getOrElse(0)
      val body = data.slice(page * pageSize, (page + 1) * pageSize).mkString("\n")
      served.incrementAndGet()
      respond(ex, 200, body)
    }
  })

  def start(): this.type = {
    server.setExecutor(pool)
    server.start()
    this
  }

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
    ()
  }
}
