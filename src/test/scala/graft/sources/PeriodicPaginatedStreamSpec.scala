package graft.sources

import graft.TestSpark
import java.nio.file.Files
import java.time.Instant
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

/** Periodic re-pagination as a live streaming source: the period lives in
  * the checkpoint offset log, a roll re-reads from page 0 (that is how the
  * reference's `periodicallyPaginated` observes source mutations), and the
  * min/max-period arithmetic is driven by an injected test clock.
  */
class PeriodicPaginatedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = Instant.parse("2026-01-01T00:00:00Z")

  private def stream(fetcher: PageFetcher, clock: () => Instant,
                     minMs: Long = 60000L, maxMs: Long = 3600000L) =
    new PeriodicPaginatedMicroBatchStream(
      spec = FetcherSpec.Embedded(fetcher, "unit"),
      minPeriodMs = minMs,
      maxPeriodMs = maxMs,
      explicitPeriodStartMs = Some(t0.toEpochMilli),
      maxPagesPerTrigger = 100,
      clock = clock)

  private def fixed(pages: Map[Int, Seq[String]]): PageFetcher = new PageFetcher {
    def fetch(page: Int): Seq[String] = pages.getOrElse(page, Nil)
  }

  test("admission decisions: park, data walk, scheduled roll, immediate roll, max-period overrun") {
    @volatile var now = t0
    val s = stream(fixed(Map(0 -> Seq("a"), 1 -> Seq("b"))), () => now)
    def advance(off: PeriodicPageStreamOffset) =
      s.latestOffset(off, ReadLimit.allAvailable()).asInstanceOf[PeriodicPageStreamOffset]

    // future period start → park (identical offset, no batch)
    val parked = PeriodicPageStreamOffset(3, 0, t0.plusSeconds(10).toEpochMilli)
    assert(advance(parked) == parked)

    // data available → walk through non-empty pages, period unchanged
    val start = PeriodicPageStreamOffset(0, 0, t0.toEpochMilli)
    assert(advance(start) == PeriodicPageStreamOffset(0, 2, t0.toEpochMilli))

    // empty page before minPeriod elapsed → roll SCHEDULED at start+min
    val drained = PeriodicPageStreamOffset(0, 2, t0.toEpochMilli)
    assert(advance(drained) == PeriodicPageStreamOffset(1, 0, t0.plusSeconds(60).toEpochMilli))

    // empty page after minPeriod elapsed → roll NOW
    now = t0.plusSeconds(90)
    val drained2 = PeriodicPageStreamOffset(1, 2, t0.toEpochMilli)
    assert(advance(drained2) == PeriodicPageStreamOffset(2, 0, now.toEpochMilli))

    // maxPeriod overrun rolls even mid-pagination (data still available)
    now = t0.plusSeconds(3700)
    val midPage = PeriodicPageStreamOffset(0, 1, t0.toEpochMilli)
    assert(advance(midPage) == PeriodicPageStreamOffset(1, 0, now.toEpochMilli))
  }

  test("live query: period rolls across a stop/restart and re-reads the mutated source from page 0") {
    @volatile var pages: Map[Int, Seq[String]] = Map(0 -> Seq("a", "b"), 1 -> Seq("c"))
    @volatile var now = t0
    PageFetchers.register("periodic-spec", new PageFetcher {
      def fetch(page: Int): Seq[String] = pages.getOrElse(page, Nil)
    })
    PageClocks.register("periodic-clock", () => now)

    val ckpt = Files.createTempDirectory("graft-pp-ckpt").toString
    val out = Files.createTempDirectory("graft-pp-out").toString
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.sources.PeriodicPaginatedTableProvider")
        .option("fetcher", "periodic-spec")
        .option("minPeriodMs", "60000")
        .option("maxPeriodMs", "3600000")
        .option("periodStart", t0.toString)
        .option("clock", "periodic-clock")
        .load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // period 0: drains both pages, then parks on the scheduled period-1 roll
    drain()
    import spark.implicits._
    def seen() = spark.read.parquet(out).select("value", "period", "page", "idx")
      .as[(String, Long, Int, Int)].collect().sortBy(r => (r._2, r._3, r._4)).toSeq
    assert(seen() == Seq(("a", 0, 0, 0), ("b", 0, 0, 1), ("c", 0, 1, 0)))

    // source mutates while stopped; clock passes the scheduled period-1 start
    // (t0+60s) but stays short of where a period-2 roll would be due, so the
    // query drains period 1 then parks
    pages = Map(0 -> Seq("a", "B2"), 1 -> Seq("c", "d"))
    now = t0.plusSeconds(90)
    drain()
    // the restarted query resumes the PARKED period-1 offset from the
    // checkpoint and re-reads everything from page 0 stamped period=1 —
    // re-emission is the contract (mutation visibility bounded by the period)
    assert(seen() == Seq(
      ("a", 0, 0, 0), ("b", 0, 0, 1), ("c", 0, 1, 0),
      ("a", 1, 0, 0), ("B2", 1, 0, 1), ("c", 1, 1, 0), ("d", 1, 1, 1)))
  }

  test("admission is monotone: the returned offset never precedes the committed start") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genPages = Gen.choose(0, 5)
    val genOffset = for {
      period <- Gen.choose(0L, 3L)
      page <- Gen.choose(0, 6)
      startDelta <- Gen.choose(-7200L, 7200L) // periodStart may sit in the future
    } yield PeriodicPageStreamOffset(period, page, t0.plusSeconds(startDelta).toEpochMilli)
    val genClock = Gen.choose(-3600L, 7200L).map(t0.plusSeconds)
    val prop = Prop.forAll(genOffset, genClock, genPages) { (off, clock, nPages) =>
      val s = stream(fixed((0 until nPages).map(p => p -> Seq(s"v$p")).toMap), () => clock)
      val out = s.latestOffset(off, ReadLimit.allAvailable())
        .asInstanceOf[PeriodicPageStreamOffset]
      out.period > off.period || (out.period == off.period && out.page >= off.page)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("offset json round-trips and rejects corruption") {
    val off = PeriodicPageStreamOffset(7, 2, -1234L)
    assert(PeriodicPageStreamOffset.fromJson(off.json()) == off)
    intercept[graft.core.GraftError](PeriodicPageStreamOffset.fromJson("""{"page":1}"""))
  }
}
