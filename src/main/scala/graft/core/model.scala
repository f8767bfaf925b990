package graft.core

import java.time.Instant

/** Core data model of the engine.
  *
  * Mirrors the reference's fundamental abstractions (tamer
  * `core/src/main/scala/tamer/Record.scala:32-35`,
  * `core/src/main/scala/tamer/Setup.scala:26-34`,
  * `db/src/main/scala/tamer/db/model.scala:34-48`,
  * `rest/src/main/scala/tamer/rest/model.scala:54-67`) re-expressed as plain
  * Scala case classes that double as Spark `Dataset` element types (all fields
  * encodable by `ExpressionEncoder`).
  */

/** A single emitted record: key, value, optional event timestamp (epoch
  * millis) and headers. The only data unit the ingestion side produces;
  * mapped to the Kafka-sink schema
  * `key BINARY, value BINARY, headers ARRAY<STRUCT<key,value>>, timestamp TIMESTAMP`.
  */
final case class Record[K, V](
    key: K,
    value: V,
    timestamp: Option[Long] = None,
    headers: Seq[Header] = Nil
)

final case class Header(key: String, value: Array[Byte])

/** Key under which pipeline state is persisted. `stateKey` is a stable,
  * run-invariant hex hash of (query repr, initial state) — see [[Hashable]] —
  * so two pipelines with the same definition resume each other's state.
  * (ref: tamer `Tamer.scala:56,103`)
  */
final case class StateKey(stateKey: String, groupId: String)

/** Half-open time window `(from, to]` — the incremental cursor for
  * time-windowed sources. (ref: tamer `db/src/main/scala/tamer/db/model.scala:45-48`)
  */
final case class Window(from: Instant, to: Instant) {
  require(!to.isBefore(from), s"Window to=$to must not be before from=$from")
  def widenTo(newTo: Instant): Window = Window(from, newTo)
  def advance(step: java.time.Duration): Window = Window(to, to.plus(step))
}

/** Fixed-pagination cursor: `offset` = page number, `nextIndex` = how many
  * elements of the current (partially full) page have already been emitted.
  * (ref: tamer `rest/src/main/scala/tamer/rest/model.scala:54-59`)
  */
final case class PageOffset(offset: Int, nextIndex: Int) {
  def incrementedBy(increment: Int): PageOffset = PageOffset(offset + increment, 0)
  def nextIndex(index: Int): PageOffset = PageOffset(offset, index)
}

/** Periodic re-pagination cursor: pages forward within a period, then resets
  * to `offset = 0` at the next period start.
  * (ref: tamer `rest/src/main/scala/tamer/rest/model.scala:60-67`)
  */
final case class PeriodicOffset(offset: Int, periodStart: Instant) {
  def incrementedBy(increment: Int): PeriodicOffset = PeriodicOffset(offset + increment, periodStart)
}

/** Sole failure channel of the engine. (ref: tamer `core/.../errors.scala:24-27`) */
final case class GraftError(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)
