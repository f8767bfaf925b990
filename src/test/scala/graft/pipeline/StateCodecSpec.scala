package graft.pipeline

import graft.core.{PageOffset, PeriodicOffset, Window}
import java.time.Instant
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class StateCodecSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private def roundTrip[SV](sv: SV)(implicit c: StateCodec[SV]): Boolean =
    c.decode(c.encode(sv)) == sv

  // micros precision: what Spark TimestampType carries
  private val genInstant: Gen[Instant] = for {
    s <- Gen.choose(0L, 4102444800L) // through 2100
    micros <- Gen.choose(0L, 999999L)
  } yield Instant.ofEpochSecond(s, micros * 1000)

  test("Int/Long round-trip") {
    check(Prop.forAll((i: Int) => roundTrip(i)))
    check(Prop.forAll((l: Long) => roundTrip(l)))
  }

  test("Instant round-trips at microsecond precision") {
    check(Prop.forAll(genInstant)(i => roundTrip(i)))
  }

  test("Window round-trips") {
    check(Prop.forAll(genInstant, Gen.choose(0L, 1000000L)) { (f, len) =>
      roundTrip(Window(f, f.plusMillis(len)))
    })
  }

  test("PageOffset and PeriodicOffset round-trip") {
    check(Prop.forAll(Gen.choose(0, Int.MaxValue), Gen.choose(0, Int.MaxValue)) {
      (o, i) => roundTrip(PageOffset(o, i))
    })
    check(Prop.forAll(Gen.choose(0, Int.MaxValue), genInstant) {
      (o, p) => roundTrip(PeriodicOffset(o, p))
    })
  }

  test("corrupt input raises GraftError, not a silent default") {
    intercept[Exception](StateCodec[Window].decode("not a window"))
    intercept[Exception](StateCodec[PageOffset].decode("1|2|3"))
  }
}
