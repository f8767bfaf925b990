package graft.serde

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.GraftError
import graft.sources.GraftHttp
import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.avro.Schema

/** Auth for the schema-registry REST client — the reference supports exactly
  * basic and bearer (tamer `core/src/main/scala/tamer/Registry.scala:62-67`,
  * `RegistryAuthConfig`). */
sealed trait RegistryAuth extends Serializable
object RegistryAuth {
  case object Anonymous extends RegistryAuth
  final case class Basic(user: String, pass: String) extends RegistryAuth
  final case class Bearer(token: String) extends RegistryAuth
}

/** [[SchemaRegistry]] over the Confluent Schema Registry REST protocol
  * (ref: tamer `core/src/main/scala/tamer/Registry.scala:33-181`), on
  * `java.net.http` — the production implementation behind the trait the
  * in-memory registry fakes:
  *
  *  - resolve: `POST /subjects/{subject}?normalize=false&deleted=false`
  *    with `{"schema": <json-escaped schema>}` → `{subject,id,version,schema}`;
  *  - register (when resolve says the schema is unknown):
  *    `POST /subjects/{subject}/versions?normalize=false` → `{"id": N}`;
  *  - fetch: `GET /schemas/ids/{id}?subject=` → `{"schema": "..."}`.
  *
  * `getOrRegisterId` is resolve-orElse-register, the reference's `getId <>
  * register`. Media types match the reference's header set (v1 content type;
  * v1/v2/plain-json accept). The client itself performs one HTTP call per
  * operation — wrap it in [[CachingSchemaRegistry]] for the reference's
  * memoization (`Registry.scala:160-181`), which this class deliberately
  * does not duplicate.
  *
  * Only `baseUrl` and `auth` are state (both immutable), so instances are
  * serializable and cheap: an executor-side
  * [[ConfluentAvroFrames.RegistryFactory]] can close over
  * `() => new CachingSchemaRegistry(new RestSchemaRegistry(url, auth))`.
  */
final class RestSchemaRegistry(
    baseUrl: String,
    auth: RegistryAuth = RegistryAuth.Anonymous
) extends SchemaRegistry with Serializable {
  require(baseUrl.nonEmpty, "schema registry url is required")
  private val base = baseUrl.stripSuffix("/")

  private def mapper = RestSchemaRegistry.mapper

  private def request(path: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .setHeader("Content-Type", "application/vnd.schemaregistry.v1+json")
      .setHeader("Accept",
        "application/vnd.schemaregistry.v1+json, application/vnd.schemaregistry+json, application/json")
    auth match {
      case RegistryAuth.Anonymous     => b
      case RegistryAuth.Basic(u, p)   => b.setHeader("Authorization", GraftHttp.basicHeader(u, p))
      case RegistryAuth.Bearer(token) => b.setHeader("Authorization", s"Bearer $token")
    }
  }

  private def send(b: HttpRequest.Builder): (Int, String) = {
    val resp = GraftHttp.client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** `{"schema": "<escaped avro json>"}` — the registry wraps schemas in a
    * JSON string field, so the schema JSON must be escaped, not inlined. */
  private def schemaBody(schema: Schema): String =
    mapper.writeValueAsString(mapper.createObjectNode().put("schema", schema.toString))

  private def intField(body: String, field: String, context: String): Int = {
    val node = mapper.readTree(body).get(field)
    if (node == null || !node.canConvertToInt)
      throw GraftError(s"schema registry: no int '$field' in $context response: $body")
    node.asInt()
  }

  private def urlEnc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** Resolve the id of an ALREADY-REGISTERED (subject, schema); None when
    * the registry doesn't know it (404 — new subject or new version). */
  private def lookupId(subject: String, schema: Schema): Option[Int] = {
    val (code, body) = send(
      request(s"/subjects/${urlEnc(subject)}?normalize=false&deleted=false")
        .POST(HttpRequest.BodyPublishers.ofString(schemaBody(schema))))
    code match {
      case ok if ok / 100 == 2 => Some(intField(body, "id", "subject lookup"))
      case 404                 => None
      case other               => throw GraftError(s"schema registry: subject lookup failed: HTTP $other: $body")
    }
  }

  private def register(subject: String, schema: Schema): Int = {
    val (code, body) = send(
      request(s"/subjects/${urlEnc(subject)}/versions?normalize=false")
        .POST(HttpRequest.BodyPublishers.ofString(schemaBody(schema))))
    if (code / 100 == 2) intField(body, "id", "register")
    else throw GraftError(s"schema registry: register failed: HTTP $code: $body")
  }

  def getOrRegisterId(subject: String, schema: Schema): Int =
    lookupId(subject, schema).getOrElse(register(subject, schema))

  def getSchemaById(id: Int): Schema = {
    val (code, body) = send(request(s"/schemas/ids/$id?subject=").GET())
    if (code / 100 == 2) {
      val node = mapper.readTree(body).get("schema")
      if (node == null || !node.isTextual)
        throw GraftError(s"schema registry: no 'schema' in fetch response: $body")
      new Schema.Parser().parse(node.asText())
    } else if (code == 404) throw SchemaNotFound(id) // authoritative: routable
    else throw GraftError(s"schema registry: schema fetch failed (id $id): HTTP $code: $body")
  }
}

object RestSchemaRegistry {
  // ObjectMapper is thread-safe after configuration and heavy to build; one
  // per JVM (same pattern as GraftHttp.client).
  private lazy val mapper = new ObjectMapper
}
