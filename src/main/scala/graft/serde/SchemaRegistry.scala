package graft.serde

import graft.core.GraftError
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import org.apache.avro.{Schema, SchemaCompatibility}
import scala.jdk.CollectionConverters._

/** Schema-registry client surface — the operations the reference's registry
  * client exposes (tamer `core/src/main/scala/tamer/Registry.scala:33-181`):
  * resolve-or-register a schema id per subject, fetch a writer schema by id,
  * and verify reader compatibility. Implementations are expected to be
  * driver-side; schema ids (ints) travel to executors, never clients.
  */
trait SchemaRegistry {
  def getOrRegisterId(subject: String, schema: Schema): Int

  /** Fetch the writer schema for `id`. Throws [[SchemaNotFound]] when the
    * registry AUTHORITATIVELY does not know the id (a 404 / missing entry
    * — row-level corruption, routable to a DLQ) and [[graft.core.GraftError]]
    * for everything else (transport failures, 5xx, malformed responses —
    * infrastructure faults that must FAIL the task for retry, never
    * quarantine healthy rows). */
  def getSchemaById(id: Int): Schema

  /** Fail unless `reader` can read data written with schema `id`
    * (ref: `Registry.scala:111-117` — incompatibility aborts the pipeline).
    */
  def verifySchema(id: Int, reader: Schema): Unit = {
    val writer = getSchemaById(id)
    val result = SchemaCompatibility.checkReaderWriterCompatibility(reader, writer).getResult
    if (result.getCompatibility != SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE) {
      val errors = result.getIncompatibilities.asScala
        .map(i => s"${i.getType} at ${i.getLocation}: ${i.getMessage}")
        .mkString(", ")
      throw GraftError(s"Backwards incompatible schema, reader: '$reader' vs writer schema id $id: $errors")
    }
  }
}

/** The registry's authoritative "no such schema id" answer — distinct from
  * [[graft.core.GraftError]] so deserializers can dead-letter the ROW
  * without swallowing transient registry outages (which stay fatal). */
final case class SchemaNotFound(id: Int)
    extends RuntimeException(s"schema registry: no schema for id $id")

/** In-memory registry with the same id semantics as a Confluent deployment
  * (monotonic ids, one id per distinct schema per subject). Doubles as the
  * test double the reference builds with embedded kafka+SR; production use
  * would implement [[SchemaRegistry]] over the SR REST API with the same
  * memoization (ref: `Registry.scala:160-181` caches lookups — size 4,
  * TTL 1h by default).
  */
final class InMemorySchemaRegistry extends SchemaRegistry {
  private val nextId = new AtomicInteger(1)
  private val bySubjectSchema = new ConcurrentHashMap[(String, Schema), Int]()
  private val byId = new ConcurrentHashMap[Int, Schema]()

  def getOrRegisterId(subject: String, schema: Schema): Int =
    bySubjectSchema.computeIfAbsent((subject, schema), { _ =>
      val id = nextId.getAndIncrement()
      byId.put(id, schema)
      id
    })

  def getSchemaById(id: Int): Schema =
    Option(byId.get(id)).getOrElse(throw SchemaNotFound(id))
}

/** Memoizing decorator — the reference memoizes both directions of the
  * registry round-trip (`Registry.scala:160-181`); here a plain concurrent
  * map (the id and schema spaces are small and immutable once assigned).
  */
final class CachingSchemaRegistry(underlying: SchemaRegistry) extends SchemaRegistry {
  private val ids = new ConcurrentHashMap[(String, Schema), Int]()
  private val schemas = new ConcurrentHashMap[Int, Schema]()
  private val notFound = ConcurrentHashMap.newKeySet[Int]()
  private val verified = ConcurrentHashMap.newKeySet[(Int, Schema)]()

  def getOrRegisterId(subject: String, schema: Schema): Int =
    ids.computeIfAbsent((subject, schema), _ => underlying.getOrRegisterId(subject, schema))

  /** Memoizes the authoritative [[SchemaNotFound]] too — a corrupt id that
    * repeats across a partition's rows must not re-hit the registry per
    * row. Transient failures (GraftError) are NOT cached: they propagate
    * and the retried task starts clean. */
  def getSchemaById(id: Int): Schema = {
    if (notFound.contains(id)) throw SchemaNotFound(id)
    try schemas.computeIfAbsent(id, underlying.getSchemaById)
    catch { case e: SchemaNotFound => notFound.add(id); throw e }
  }

  override def verifySchema(id: Int, reader: Schema): Unit =
    if (!verified.contains((id, reader))) {
      super.verifySchema(id, reader)
      verified.add((id, reader))
    }
}
