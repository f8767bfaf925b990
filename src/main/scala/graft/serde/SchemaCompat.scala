package graft.serde

import graft.core.GraftError
import org.apache.avro.{Schema, SchemaCompatibility}
import scala.jdk.CollectionConverters._

/** Confluent-style schema-compatibility LEVELS over Avro resolution — the
  * registry behavior between a producer's `register` and the reference's
  * read-path [[SchemaRegistry.verifySchema]] (which checks one
  * reader/writer pair): a subject carries a configured level, and a new
  * schema version is accepted only if it stands in the right
  * reader/writer relation to the subject's HISTORY (latest version, or
  * every version for the `*_TRANSITIVE` levels) — the public semantics of
  * Confluent SR's `PUT /config` + register-time check.
  *
  * Direction glossary (the part everyone flips):
  *  - BACKWARD: consumers using the NEW schema can read data produced
  *    with the PREVIOUS one(s) — new schema is the READER.
  *  - FORWARD: consumers using the PREVIOUS schema(s) can read data
  *    produced with the NEW one — new schema is the WRITER.
  *  - FULL: both.
  *
  * The pairwise relation itself is Avro schema resolution, delegated to
  * `org.apache.avro.SchemaCompatibility` (the library already on the
  * Spark classpath and the reference's own transitive dependency) —
  * reimplementing the resolution matrix would only create skew. What
  * this object adds is the LEVEL model and the history walk, spec-pinned
  * against hand-derived vectors (field defaults, type promotion, the
  * transitive counterexample BACKWARD accepts but BACKWARD_TRANSITIVE
  * rejects). Spec-gated (`SchemaCompatSpec`) — compatibility is not a
  * data-shaped computation, so there is no SQL-oracle row (the O21
  * hashing precedent).
  */
object SchemaCompat {

  sealed abstract class Level(val name: String, val transitive: Boolean)
  case object Backward extends Level("BACKWARD", false)
  case object BackwardTransitive extends Level("BACKWARD_TRANSITIVE", true)
  case object Forward extends Level("FORWARD", false)
  case object ForwardTransitive extends Level("FORWARD_TRANSITIVE", true)
  case object Full extends Level("FULL", false)
  case object FullTransitive extends Level("FULL_TRANSITIVE", true)
  case object NoneLevel extends Level("NONE", false)

  /** Avro-resolution incompatibilities of `reader` reading data written
    * with `writer` — empty iff compatible. */
  def incompatibilities(reader: Schema, writer: Schema): Seq[String] = {
    val r = SchemaCompatibility.checkReaderWriterCompatibility(reader, writer).getResult
    if (r.getCompatibility == SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE) Seq.empty
    else r.getIncompatibilities.asScala
      .map(i => s"${i.getType} at ${i.getLocation}: ${i.getMessage}").toSeq
  }

  def canRead(reader: Schema, writer: Schema): Boolean =
    incompatibilities(reader, writer).isEmpty

  /** Check `candidate` against `history` (oldest first) under `level`:
    * the versions consulted are the latest only, or all for transitive
    * levels. Returns the violations (empty = accept). An empty history
    * accepts anything (first version of a subject). */
  def check(level: Level, candidate: Schema, history: Seq[Schema]): Seq[String] = {
    if (level == NoneLevel || history.isEmpty) return Seq.empty
    val against = if (level.transitive) history else Seq(history.last)
    against.flatMap { prior =>
      val back =
        if (level == Backward || level == BackwardTransitive ||
          level == Full || level == FullTransitive)
          incompatibilities(candidate, prior).map(m => s"backward vs prior: $m")
        else Seq.empty
      val fwd =
        if (level == Forward || level == ForwardTransitive ||
          level == Full || level == FullTransitive)
          incompatibilities(prior, candidate).map(m => s"forward vs prior: $m")
        else Seq.empty
      back ++ fwd
    }
  }
}

/** Registry decorator enforcing a compatibility level at registration —
  * the write-path guard completing [[SchemaRegistry.verifySchema]]'s
  * read-path one: per subject the version history is tracked, and an
  * incompatible registration fails with [[graft.core.GraftError]]
  * BEFORE an id is minted (Confluent SR's 409 behavior), so a producer
  * can never strand consumers behind an unreadable version. */
final class CompatCheckedRegistry(
    underlying: SchemaRegistry,
    level: SchemaCompat.Level) extends SchemaRegistry {

  private val history =
    new java.util.concurrent.ConcurrentHashMap[String, List[Schema]]()

  def getOrRegisterId(subject: String, schema: Schema): Int =
    history.synchronized {
      val prior = Option(history.get(subject)).getOrElse(Nil)
      if (!prior.contains(schema)) {
        val violations = SchemaCompat.check(level, schema, prior)
        if (violations.nonEmpty)
          throw GraftError(
            s"schema registry: '$subject' rejects the candidate under " +
              s"${level.name}: ${violations.mkString("; ")}")
        history.put(subject, prior :+ schema)
      }
      underlying.getOrRegisterId(subject, schema)
    }

  def getSchemaById(id: Int): Schema = underlying.getSchemaById(id)
}
