package graft.core

import java.time.Instant
import scala.util.hashing.MurmurHash3

/** Run-invariant (stable across JVMs) hashing for state identity.
  *
  * Same *role* as the reference's `Hashable` (tamer
  * `core/src/main/scala/tamer/Hashable.scala:28-47`): derive a deterministic
  * state key from the query representation and the initial state so restarted
  * pipelines resume their own checkpoints. The *scheme* is intentionally
  * different — not checkpoint-compatible with the reference's format:
  *  - `Instant` hashes by epoch millis (the reference uses epoch seconds,
  *    which collides all sub-second-distinct instants);
  *  - the state key is two concatenated zero-padded `%08x` words (the
  *    reference sums the two hashes and prints an unpadded hex string, so
  *    distinct (query, state) pairs can collide by addition);
  *  - cursor hashes mix all fields multiplicatively/rotated (the reference's
  *    `Offset` hash `offset * nextIndex` collapses to 0 whenever
  *    `nextIndex == 0`, i.e. for every fresh page).
  * The primitives themselves are the same public algorithms: scala-library
  * MurmurHash3 for strings, Knuth multiplicative byteswap for 64-bit values.
  */
trait Hashable[A] extends Serializable { self =>
  def hash(a: A): Int
  def contramap[B](f: B => A): Hashable[B] = (b: B) => self.hash(f(b))
}

object Hashable {
  def apply[A](implicit h: Hashable[A]): Hashable[A] = h

  implicit val stringHashable: Hashable[String] = (s: String) => MurmurHash3.stringHash(s)
  implicit val intHashable: Hashable[Int] = (i: Int) => i
  implicit val longHashable: Hashable[Long] = (l: Long) => byteswap64(l).toInt
  implicit val instantHashable: Hashable[Instant] =
    longHashable.contramap[Instant](_.toEpochMilli)
  implicit val windowHashable: Hashable[Window] =
    (w: Window) => byteswap64(w.from.toEpochMilli ^ java.lang.Long.rotateLeft(w.to.toEpochMilli, 32)).toInt
  implicit val pageOffsetHashable: Hashable[PageOffset] =
    (o: PageOffset) => MurmurHash3.productHash(o)
  implicit val periodicOffsetHashable: Hashable[PeriodicOffset] =
    (o: PeriodicOffset) => MurmurHash3.orderedHash(Seq(o.offset, byteswap64(o.periodStart.toEpochMilli).toInt))

  /** Knuth multiplicative byte-swap hash (same construction scala.util.hashing exposes). */
  def byteswap64(v: Long): Long = {
    var hc = v * 0x9e3775cd9e3775cdL
    hc = java.lang.Long.reverseBytes(hc)
    hc * 0x9e3775cd9e3775cdL
  }

  /** Stable hex state key from a query representation and an initial state:
    * `hex(hash(queryRepr)) + hex(hash(initialState))`.
    */
  def stateKey[SV: Hashable](queryRepr: String, initialState: SV): String =
    f"${stringHashable.hash(queryRepr)}%08x${Hashable[SV].hash(initialState)}%08x"
}
