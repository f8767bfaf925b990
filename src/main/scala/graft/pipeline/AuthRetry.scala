package graft.pipeline

import graft.core.GraftError

/** One fetched response: status code + either an error or the body. */
final case class FetchResponse(code: Int, body: Either[String, String])

/** Mutable secret holder shared across pulls — the reference's
  * `EphemeralSecretCache: Ref[Option[String]]`
  * (tamer `rest/src/main/scala/tamer/rest/package.scala:32`).
  */
final class SecretCache {
  @volatile private var value: Option[String] = None
  def get: Option[String] = value
  def set(v: Option[String]): Unit = value = v
}

/** Authentication strategy (ref: `rest/src/main/scala/tamer/rest/
  * model.scala:31-42`): decorate a request with the current secret, know how
  * to (re)acquire one.
  */
trait AuthStrategy[Req] {
  def decorate(request: Req, secret: Option[String]): Req

  /** Acquire the first secret (the reference's `setSecret`). */
  def acquireSecret(): Option[String]

  /** Refresh an expired secret (default: acquire anew). */
  def refreshSecret(old: Option[String]): Option[String] = acquireSecret()
}

/** Basic auth carries no ephemeral secret; it decorates every request the
  * same way. */
final class BasicAuth[Req](addHeader: Req => Req) extends AuthStrategy[Req] {
  def decorate(request: Req, secret: Option[String]): Req = addHeader(request)
  def acquireSecret(): Option[String] = None
}

/** The authenticated-fetch state machine
  * (ref: `rest/src/main/scala/tamer/rest/RESTSetup.scala:64-108`):
  *  - ensure a secret is cached (acquire on first use);
  *  - send the decorated request;
  *  - 401/403/404 → assume the secret expired: refresh it and replay ONCE;
  *  - a body-level error clears the cached secret and fails the pull (the
  *    next pull re-acquires).
  */
object AuthenticatedFetch {

  val AuthFailureCodes: Set[Int] = Set(401, 403, 404)

  def fetch[Req](
      request: Req,
      send: Req => FetchResponse,
      auth: Option[AuthStrategy[Req]],
      cache: SecretCache
  ): String = {
    val response = auth match {
      case None => send(request)
      case Some(a) =>
        if (cache.get.isEmpty) cache.set(a.acquireSecret())
        val first = send(a.decorate(request, cache.get))
        if (AuthFailureCodes.contains(first.code)) {
          cache.set(a.refreshSecret(cache.get))
          send(a.decorate(request, cache.get))
        } else first
    }
    response.body match {
      case Right(body) => body
      case Left(error) =>
        cache.set(None) // assume the auth/cookie expired; next pull re-acquires
        throw GraftError(s"request failed, giving up: $error")
    }
  }
}
