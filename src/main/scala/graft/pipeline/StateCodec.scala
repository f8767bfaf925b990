package graft.pipeline

import java.time.Instant
import graft.core.{PageOffset, PeriodicOffset, Window}

/** Stable textual encoding for pipeline state, used by the checkpoint log.
  *
  * Same practical constraint the reference imposes via `Codec[SV]` (tamer
  * `core/src/main/scala/tamer/Setup.scala:26-34`): any user state type is
  * legal as long as it can round-trip a byte representation. Here the
  * representation is a single line of text (no embedded newlines) written to
  * the commit marker; instances are hand-rolled because the build is
  * dependency-free beyond Spark.
  */
trait StateCodec[SV] extends Serializable { self =>
  def encode(sv: SV): String
  def decode(s: String): SV

  def imap[B](to: SV => B)(from: B => SV): StateCodec[B] = new StateCodec[B] {
    def encode(b: B): String = self.encode(from(b))
    def decode(s: String): B = to(self.decode(s))
  }
}

object StateCodec {
  def apply[SV](implicit c: StateCodec[SV]): StateCodec[SV] = c

  implicit val intCodec: StateCodec[Int] = new StateCodec[Int] {
    def encode(sv: Int): String = sv.toString
    def decode(s: String): Int = s.trim.toInt
  }
  implicit val longCodec: StateCodec[Long] = new StateCodec[Long] {
    def encode(sv: Long): String = sv.toString
    def decode(s: String): Long = s.trim.toLong
  }
  implicit val stringCodec: StateCodec[String] = new StateCodec[String] {
    def encode(sv: String): String = {
      require(!sv.contains('\n'), "state strings must be single-line")
      sv
    }
    def decode(s: String): String = s
  }
  /** Instants encode as epoch micros — matches Spark's TimestampType
    * precision, so a state round-trip never shifts a window boundary. */
  implicit val instantCodec: StateCodec[Instant] =
    longCodec.imap(micros =>
      Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    )(i => Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))

  implicit val windowCodec: StateCodec[Window] = new StateCodec[Window] {
    def encode(sv: Window): String =
      s"${instantCodec.encode(sv.from)}|${instantCodec.encode(sv.to)}"
    def decode(s: String): Window = s.split('|') match {
      case Array(f, t) => Window(instantCodec.decode(f), instantCodec.decode(t))
      case _           => throw graft.core.GraftError(s"corrupt Window state: '$s'")
    }
  }
  implicit val pageOffsetCodec: StateCodec[PageOffset] = new StateCodec[PageOffset] {
    def encode(sv: PageOffset): String = s"${sv.offset}|${sv.nextIndex}"
    def decode(s: String): PageOffset = s.split('|') match {
      case Array(o, i) => PageOffset(o.trim.toInt, i.trim.toInt)
      case _           => throw graft.core.GraftError(s"corrupt PageOffset state: '$s'")
    }
  }
  implicit val periodicOffsetCodec: StateCodec[PeriodicOffset] = new StateCodec[PeriodicOffset] {
    def encode(sv: PeriodicOffset): String =
      s"${sv.offset}|${instantCodec.encode(sv.periodStart)}"
    def decode(s: String): PeriodicOffset = s.split('|') match {
      case Array(o, p) => PeriodicOffset(o.trim.toInt, instantCodec.decode(p))
      case _           => throw graft.core.GraftError(s"corrupt PeriodicOffset state: '$s'")
    }
  }
}
