package graft.pipeline

import graft.core.{PageOffset, PeriodicOffset}
import java.time.{Duration, Instant}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-function tests for the pagination state machines, matching the
  * reference semantics (tamer `rest/.../RESTSetup.scala:171-184,250-267`).
  */
class PageCursorSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  // --- fixed pagination -----------------------------------------------------

  test("full page advances to the next page with index reset") {
    val page = DecodedPage[Int, PageOffset](List(1, 2, 3), None)
    assert(PageCursor.nextPageOrNextIndexIfPageNotComplete(page, PageOffset(4, 1), 1, Some(3)) == PageOffset(5, 0))
  }

  test("partial page stays on the page, remembering emitted count") {
    val page = DecodedPage[Int, PageOffset](List(1, 2), None)
    assert(PageCursor.nextPageOrNextIndexIfPageNotComplete(page, PageOffset(4, 0), 1, Some(3)) == PageOffset(4, 2))
  }

  test("without a fixed page size every page advances") {
    check(Prop.forAll(Gen.choose(0, 50), Gen.choose(0, 1000), Gen.choose(1, 5)) { (n, p, inc) =>
      val page = DecodedPage[Int, PageOffset]((1 to n).toList, None)
      PageCursor.nextPageOrNextIndexIfPageNotComplete(page, PageOffset(p, 0), inc, None) == PageOffset(p + inc, 0)
    })
  }

  test("explicit nextState (HATEOAS) always wins") {
    check(Prop.forAll(Gen.choose(0, 100), Gen.choose(0, 100)) { (o, i) =>
      val page = DecodedPage[Int, PageOffset](List(1), Some(PageOffset(o, i)))
      PageCursor.nextPageOrNextIndexIfPageNotComplete(page, PageOffset(0, 0), 1, Some(10)) == PageOffset(o, i)
    })
  }

  test("filterPage drops exactly the already-emitted elements") {
    check(Prop.forAll(Gen.choose(0, 20), Gen.choose(0, 25)) { (n, idx) =>
      val page = DecodedPage[Int, PageOffset]((1 to n).toList, None)
      PageCursor.filterPage(page, PageOffset(0, idx)) == (1 to n).drop(idx).toList
    })
  }

  test("re-poll of a partial page emits only the new tail (no duplicates)") {
    // poll 1: page has 2 of 3 expected elements
    val s0 = PageOffset(0, 0)
    val p1 = DecodedPage[Int, PageOffset](List(10, 20), None)
    assert(PageCursor.filterPage(p1, s0) == List(10, 20))
    val s1 = PageCursor.nextPageOrNextIndexIfPageNotComplete(p1, s0, 1, Some(3))
    assert(s1 == PageOffset(0, 2))
    // poll 2: page filled up
    val p2 = DecodedPage[Int, PageOffset](List(10, 20, 30), None)
    assert(PageCursor.filterPage(p2, s1) == List(30))
    assert(PageCursor.nextPageOrNextIndexIfPageNotComplete(p2, s1, 1, Some(3)) == PageOffset(1, 0))
  }

  // --- periodic pagination --------------------------------------------------

  private val t0 = Instant.parse("2026-01-01T00:00:00Z")
  private val min = Duration.ofMinutes(5)
  private val max = Duration.ofHours(1)

  test("data keeps paging forward within the period") {
    val page = DecodedPage[Int, PeriodicOffset](List(1), None)
    val next = PageCursor.nextPeriodicState(page, PeriodicOffset(3, t0), t0.plus(Duration.ofMinutes(1)), min, max)
    assert(next == PeriodicOffset(4, t0))
  }

  test("empty page past minPeriod resets to page 0 at now") {
    val page = DecodedPage[Int, PeriodicOffset](Nil, None)
    val now = t0.plus(min).plusSeconds(1)
    assert(PageCursor.nextPeriodicState(page, PeriodicOffset(7, t0), now, min, max) == PeriodicOffset(0, now))
  }

  test("empty page before minPeriod schedules the next period start") {
    val page = DecodedPage[Int, PeriodicOffset](Nil, None)
    val now = t0.plusSeconds(30)
    assert(PageCursor.nextPeriodicState(page, PeriodicOffset(7, t0), now, min, max) == PeriodicOffset(0, t0.plus(min)))
  }

  test("maxPeriod overrun resets even mid-data") {
    val page = DecodedPage[Int, PeriodicOffset](List(1, 2), None)
    val now = t0.plus(max).plusSeconds(1)
    assert(PageCursor.nextPeriodicState(page, PeriodicOffset(7, t0), now, min, max) == PeriodicOffset(0, now))
  }

  // --- end-to-end through the checkpointed runner ---------------------------

  test("paginated source drains a finite 3-page server exactly once, resumably") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val server: Map[Int, List[Int]] = Map(0 -> List(1, 2, 3), 1 -> List(4, 5, 6), 2 -> List(7))
    val p = PaginatedSource.paginated[Int](
      name = "pages",
      fetchPage = off => DecodedPage(server.getOrElse(off.offset, Nil), None),
      toRows = (s, vs) => { vs.toDF("n") },
      fixedPageElementCount = Some(3),
      doneWhenEmpty = true)
    val seen = scala.collection.mutable.SortedMap.empty[Long, Seq[Int]]
    val sink = new BatchSink {
      def write(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
        seen(epoch) = df.collect().map(_.getInt(0)).toSeq
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pages").toString
    val first = new PipelineRunner(spark, ckpt).run(p, sink, maxIterations = 2)
    assert(first.visited == Seq(PageOffset(0, 0), PageOffset(1, 0)))
    // resume: picks up at page 2, drains, then the incomplete-page poll
    // (empty page 3 under fixed size 3 -> nextIndex 0, done)
    val second = new PipelineRunner(spark, ckpt).run(p, sink, maxIterations = 10)
    assert(second.decision == StartupDecision.Resume(PageOffset(2, 0), 2))
    assert(seen.values.flatten.toSeq == (1 to 7))
  }

  test("periodic source re-reads the mutated server in the next period (runner e2e)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // period 1: pages [10,20],[30]; period 2: values mutated in place
    @volatile var server: Map[Int, List[Int]] = Map(0 -> List(10, 20), 1 -> List(30))
    @volatile var clock: Instant = t0
    val p = PaginatedSource.periodicallyPaginated[Int](
      name = "periodic-pages",
      fetchPage = off => DecodedPage(server.getOrElse(off.offset, Nil), None),
      toRows = (s, vs) => { vs.toDF("n") },
      periodStart = t0,
      minPeriod = min,
      maxPeriod = max,
      now = () => clock)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    val sink = new BatchSink {
      def write(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
        emitted += df.collect().map(_.getInt(0)).toSeq
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-periodic").toString
    // period 1: drain pages 0,1; the empty page 2 schedules the next period
    // and further pulls PARK (not due -> no batch, no state change)
    val r1 = new PipelineRunner(spark, ckpt).run(p, sink, maxIterations = 5)
    assert(emitted.toSeq == Seq(Seq(10, 20), Seq(30)))
    assert(r1.finalState == PeriodicOffset(0, t0.plus(min)), "parked at the next period start")
    // the server mutates; once the clock passes the period start, a RESUMED
    // runner re-paginates from page 0 and observes the mutation
    server = Map(0 -> List(11, 21), 1 -> List(31))
    clock = t0.plus(min).plusSeconds(1)
    new PipelineRunner(spark, ckpt).run(p, sink, maxIterations = 3)
    assert(emitted.toSeq == Seq(Seq(10, 20), Seq(30), Seq(11, 21), Seq(31)))
  }
}
