package graft.pipeline

import graft.core.Window
import java.time.{Duration, Instant}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the tumbling-window fold, matching the reference
  * semantics (tamer `db/src/main/scala/tamer/db/DbSetup.scala:109-115`,
  * clamp `db/src/main/scala/tamer/db/package.scala:38`).
  */
class TumblingWindowSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private val t0 = Instant.parse("2026-01-01T00:00:00Z")
  private val genMillis = Gen.choose(0L, 365L * 24 * 3600 * 1000)
  private val genStep = Gen.choose(1L, 3600L * 1000).map(Duration.ofMillis)
  private val genLag = Gen.choose(0L, 600L * 1000).map(Duration.ofMillis)

  private val genWindow: Gen[Window] = for {
    f <- genMillis
    len <- Gen.choose(0L, 24L * 3600 * 1000)
  } yield Window(t0.plusMillis(f), t0.plusMillis(f + len))

  test("empty batch: from unchanged, to widens by exactly step (no clamp when in the past)") {
    check(Prop.forAll(genWindow, genStep) { (w, step) =>
      val farFuture = w.to.plus(step).plusSeconds(1)
      val next = TumblingWindow.fold(w, None, step, Duration.ZERO, now = farFuture)
      next.from == w.from && next.to == w.to.plus(step)
    })
  }

  test("non-empty batch: from = max timestamp, to = max + step (no clamp when in the past)") {
    check(Prop.forAll(genWindow, genStep, genMillis) { (w, step, m) =>
      val maxTs = w.from.plusMillis(m % math.max(1, Duration.between(w.from, w.to).toMillis + 1))
      val farFuture = maxTs.plus(step).plusSeconds(1)
      val next = TumblingWindow.fold(w, Some(maxTs), step, Duration.ZERO, now = farFuture)
      next.from == maxTs && next.to == maxTs.plus(step)
    })
  }

  test("future to is clamped to now - lag (late-data horizon)") {
    check(Prop.forAll(genWindow, genStep, genLag) { (w, step, lag) =>
      // now earlier than the unclamped to
      val now = w.to.plus(step).minusMillis(1)
      val next = TumblingWindow.fold(w, None, step, lag, now)
      val expected = now.minus(lag)
      // clamped, but never before from (window invariant)
      next.to == (if (expected.isBefore(w.from)) w.from else expected)
    })
  }

  test("fold never violates the window invariant to >= from") {
    check(Prop.forAll(genWindow, genStep, genLag, genMillis, Gen.option(genMillis)) {
      (w, step, lag, nowOff, maxOff) =>
        val now = t0.plusMillis(nowOff)
        val maxTs = maxOff.map(m => w.from.plusMillis(1 + m % math.max(1, Duration.between(w.from, w.to).toMillis)))
        val next = TumblingWindow.fold(w, maxTs, step, lag, now)
        !next.to.isBefore(next.from)
    })
  }

  test("successive windows tile: next pull's range starts at this batch's max ts") {
    // (from, to] with from = maxTs means a row is never read twice and never
    // skipped: everything <= maxTs was in this batch, everything > maxTs is
    // in range of the next window.
    check(Prop.forAll(genWindow, genStep) { (w, step) =>
      val maxTs = w.to // max possible event in this window
      val next = TumblingWindow.fold(w, Some(maxTs), step, Duration.ZERO, now = w.to.plus(step).plusSeconds(1))
      next.from == maxTs
    })
  }
}
