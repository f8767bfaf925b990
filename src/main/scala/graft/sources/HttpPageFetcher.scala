package graft.sources

import graft.core.GraftError
import graft.pipeline.{AuthStrategy, AuthenticatedFetch, FetchResponse, SecretCache}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import java.util.Base64

/** Shared JVM-wide HTTP plumbing. One `HttpClient` per JVM (it is
  * thread-safe and pools connections), and one [[SecretCache]] per
  * (tokenUrl, dataUrl) pair so every partition reader on an executor shares
  * the same bearer token instead of re-acquiring per task — the Spark analog
  * of the reference's single `EphemeralSecretCache` per pipeline
  * (tamer `rest/src/main/scala/tamer/rest/package.scala:32`).
  */
object GraftHttp {
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  def basicHeader(user: String, pass: String): String =
    "Basic " + Base64.getEncoder.encodeToString(s"$user:$pass".getBytes(UTF_8))

  private val caches = new java.util.concurrent.ConcurrentHashMap[String, SecretCache]()
  def secretCache(key: String): SecretCache =
    caches.computeIfAbsent(key, _ => new SecretCache)

  /** Statuses retried by [[sendWithRetry]]: rate limits and server-side
    * transients. 401/403/404 pass straight through (they belong to the
    * refresh-replay machine); other 4xx are caller bugs and fail fast. */
  val RetryableCodes: Set[Int] = Set(429, 500, 502, 503, 504)

  /** One GET with the transient-failure schedule shared by DATA and TOKEN
    * requests (the reference's pluggable `retrySchedule`, tamer
    * `rest/.../RESTSetup.scala:43-45,68-71`): connect errors and
    * [[RetryableCodes]] retry up to `maxRetries` with exponential backoff
    * from `baseMillis`; a `Retry-After` seconds header (the 429/503
    * convention) overrides the computed delay. Exhaustion returns the last
    * response (callers map non-2xx to their own failure); a final connect
    * error throws. */
  @annotation.tailrec
  def sendWithRetry(
      b: HttpRequest.Builder, maxRetries: Int, baseMillis: Long, attempt: Int = 0): HttpResponse[String] = {
    val outcome: Either[java.io.IOException, HttpResponse[String]] =
      try Right(client.send(b.build(), HttpResponse.BodyHandlers.ofString()))
      catch { case e: java.io.IOException => Left(e) }
    val retryable = outcome.fold(_ => true, r => RetryableCodes(r.statusCode()))
    if (!retryable) outcome.toOption.get
    else if (attempt >= maxRetries)
      outcome match {
        case Left(e)     => throw GraftError(s"HTTP request failed after $maxRetries retries", e)
        case Right(resp) => resp
      }
    else {
      val delayMs = outcome.toOption
        .flatMap(r => Option(r.headers().firstValue("Retry-After").orElse(null)))
        .flatMap(s => scala.util.Try(s.trim.toLong * 1000L).toOption)
        .getOrElse(baseMillis << attempt)
      if (delayMs > 0) Thread.sleep(delayMs)
      sendWithRetry(b, maxRetries, baseMillis, attempt + 1)
    }
  }
}

/** Everything needed to construct an [[HttpPageFetcher]] from DSv2 string
  * options, on the driver or any executor — no registry, no closure capture.
  *
  *  - `url`: page endpoint; a literal `{page}` placeholder is substituted,
  *    otherwise `?<pageParam>=N` is appended.
  *  - `delimiter`: element separator in the response body (default `\n`);
  *    an empty body is an empty page.
  *  - `auth`: `none` | `basic` | `bearer`. `basic` decorates every request
  *    with `authUser:authPass`; `bearer` acquires a token from `tokenUrl`
  *    (itself basic-authed) and refresh-replays once on 401/403/404 — the
  *    reference's token dance (tamer `rest/.../RESTSetup.scala:64-108`).
  *  - `maxRetries`/`retryBaseMillis`: transient-failure policy — connect
  *    errors, 429 and 5xx retry with exponential backoff (a `Retry-After`
  *    seconds header, the 429 convention, overrides the computed delay).
  *    The analog of the reference's pluggable `retrySchedule`
  *    (tamer `rest/.../RESTSetup.scala:43-45,68-71`). Auth-failure codes
  *    (401/403/404) are NOT retried here — they belong to the
  *    refresh-replay state machine above.
  */
final case class HttpFetcherConfig(
    url: String,
    pageParam: String = "page",
    delimiter: String = "\n",
    auth: String = "none",
    authUser: String = "",
    authPass: String = "",
    tokenUrl: String = "",
    maxRetries: Int = 5,
    retryBaseMillis: Long = 100) {
  require(url.nonEmpty, "url is required")
  require(Set("none", "basic", "bearer").contains(auth), s"unknown auth mode '$auth'")
  if (auth == "bearer") require(tokenUrl.nonEmpty, "auth=bearer requires tokenUrl")
  require(maxRetries >= 0, "maxRetries must be >= 0")
}

object HttpFetcherConfig {
  /** Build from a DSv2 option getter (case-insensitive map lookups). */
  def fromOptions(get: String => Option[String]): HttpFetcherConfig =
    HttpFetcherConfig(
      url = get("url").getOrElse(throw GraftError("url option is required for the HTTP fetcher")),
      pageParam = get("pageParam").getOrElse("page"),
      delimiter = get("delimiter").getOrElse("\n"),
      auth = get("auth").getOrElse("none"),
      authUser = get("authUser").getOrElse(""),
      authPass = get("authPass").getOrElse(""),
      tokenUrl = get("tokenUrl").getOrElse(""),
      maxRetries = get("maxRetries").map(_.toInt).getOrElse(5),
      retryBaseMillis = get("retryBaseMillis").map(_.toLong).getOrElse(100L))
}

/** Basic-auth strategy over JDK HttpRequest builders: same static header on
  * every request, no ephemeral secret. */
private final class HttpBasicAuth(user: String, pass: String) extends AuthStrategy[HttpRequest.Builder] {
  def decorate(b: HttpRequest.Builder, secret: Option[String]): HttpRequest.Builder =
    b.setHeader("Authorization", GraftHttp.basicHeader(user, pass))
  def acquireSecret(): Option[String] = None
}

/** Bearer-token strategy: acquire/refresh by GETting `tokenUrl` with basic
  * auth; the response body (trimmed) IS the token. Mirrors the reference's
  * example auth flow (its fixture server's `/auth` route returns the current
  * `validToken<N>` under basic auth). */
private final class HttpBearerAuth(
    tokenUrl: String, user: String, pass: String, maxRetries: Int, retryBaseMillis: Long)
  extends AuthStrategy[HttpRequest.Builder] {
  def decorate(b: HttpRequest.Builder, secret: Option[String]): HttpRequest.Builder = {
    secret.foreach(s => b.setHeader("Authorization", s"Bearer $s"))
    b
  }
  // token GETs ride the same transient-retry schedule as data requests — a
  // flaky token endpoint must not kill the pull
  def acquireSecret(): Option[String] = {
    val req = HttpRequest.newBuilder(URI.create(tokenUrl))
      .setHeader("Authorization", GraftHttp.basicHeader(user, pass))
      .GET()
    val resp = GraftHttp.sendWithRetry(req, maxRetries, retryBaseMillis)
    if (resp.statusCode() / 100 == 2) Some(resp.body().trim)
    else throw GraftError(s"token acquisition failed: HTTP ${resp.statusCode()} from $tokenUrl")
  }
}

/** A real HTTP [[PageFetcher]]: one GET per page over `java.net.http`, with
  * the [[AuthenticatedFetch]] 401/403/404 → refresh-token → replay-once
  * state machine in front (ref: tamer `rest/src/main/scala/tamer/rest/
  * RESTSetup.scala:64-108`). Serializable by construction — only the config
  * case class crosses the wire; client, auth strategy, and token cache are
  * rebuilt (or JVM-shared) on whichever node runs the fetch.
  */
final class HttpPageFetcher(config: HttpFetcherConfig) extends PageFetcher {

  @transient private lazy val strategy: Option[AuthStrategy[HttpRequest.Builder]] = config.auth match {
    case "none"   => None
    case "basic"  => Some(new HttpBasicAuth(config.authUser, config.authPass))
    case "bearer" => Some(new HttpBearerAuth(
      config.tokenUrl, config.authUser, config.authPass, config.maxRetries, config.retryBaseMillis))
  }

  // cache key includes a digest of the CREDENTIALS: two pipelines hitting
  // the same endpoints as different identities must not share (or clobber)
  // each other's bearer token
  @transient private lazy val cache: SecretCache = {
    val who = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${config.authUser}:${config.authPass}".getBytes(UTF_8))
      .map("%02x".format(_)).mkString
    GraftHttp.secretCache(s"${config.tokenUrl}@${config.url}@$who")
  }

  private def pageUri(page: Int): URI =
    if (config.url.contains("{page}")) URI.create(config.url.replace("{page}", page.toString))
    else {
      val sep = if (config.url.contains("?")) "&" else "?"
      URI.create(s"${config.url}$sep${config.pageParam}=$page")
    }

  private def send(b: HttpRequest.Builder): FetchResponse = {
    val resp = GraftHttp.sendWithRetry(b, config.maxRetries, config.retryBaseMillis)
    val code = resp.statusCode()
    FetchResponse(code,
      if (code / 100 == 2) Right(resp.body())
      else Left(s"HTTP $code from ${resp.request().uri()}" +
        (if (GraftHttp.RetryableCodes(code)) s" after ${config.maxRetries} retries" else "")))
  }

  def fetch(page: Int): Seq[String] = {
    val builder = HttpRequest.newBuilder(pageUri(page)).GET()
    val raw = AuthenticatedFetch.fetch[HttpRequest.Builder](builder, send, strategy, cache)
    // ONE trailing delimiter is a TERMINATOR, not a separator (line-oriented
    // APIs end bodies with "\n"): without stripping it, a newline-terminated
    // partial page of pageSize-1 items splits into pageSize elements — the
    // phantom "" is emitted as a data row and the walk advances past the
    // page instead of parking on its tail. "a\n\n" still decodes ["a", ""].
    val body = if (raw.endsWith(config.delimiter)) raw.dropRight(config.delimiter.length) else raw
    if (body.isEmpty) Nil
    else body.split(java.util.regex.Pattern.quote(config.delimiter), -1).toSeq
  }
}
