package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Ordered-funnel and cohort-retention semantics on hand-built events. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("funnelTimes honors step order: events before the previous reach never count") {
    val events = Seq(
      // user 1 converts fully in order
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // user 2: purchase BEFORE the click — must not reach step 3
      (2L, "view", ts(0)), (2L, "purchase", ts(5)), (2L, "click", ts(10)),
      // user 3: clicks but never viewed — not even in the funnel
      (3L, "click", ts(0)), (3L, "purchase", ts(5)),
      // user 4: view only
      (4L, "view", ts(7)),
      // user 5: two views, click between them — earliest view counts
      (5L, "view", ts(0)), (5L, "click", ts(1)), (5L, "view", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelTimes(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getTimestamp(1), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 4L, 5L), "only viewers enter the funnel")
    assert(got(1L) == (ts(0), Some(ts(10)), Some(ts(20))))
    assert(got(2L) == (ts(0), Some(ts(10)), None), "pre-click purchase must not convert")
    assert(got(4L) == (ts(7), None, None))
    assert(got(5L) == (ts(0), Some(ts(1)), None))
  }

  test("funnelCounts is the non-null tally per step, monotone non-increasing") {
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "view", ts(0)), (2L, "click", ts(1)),
      (3L, "view", ts(0))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelCounts(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelTimes plans without windows and with SMJ joins") {
    val events = Seq((1L, "view", ts(0))).toDF("user_id", "event_type", "ts")
    val plan = Funnel.funnelTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "funnel must not use per-user windows")
  }

  test("journeyPaths: ordered first-k types per user, counted across users") {
    val events = Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"), (1L, 3L, 3L, "purchase"),
      (2L, 1L, 4L, "view"), (2L, 2L, 5L, "click"), (2L, 3L, 6L, "purchase"),
      (3L, 1L, 7L, "view"), (3L, 2L, 8L, "error"),
      // user 4 has 4 events but maxSteps=3 truncates
      (4L, 1L, 9L, "view"), (4L, 2L, 10L, "click"), (4L, 3L, 11L, "purchase"), (4L, 4L, 12L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.journeyPaths(events, "user_id", Seq("ts", "event_id"), "event_type", 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("view>click>purchase" -> 3L, "view>error" -> 1L))
  }

  test("cohortRetention: hand-computed weekly buckets") {
    val day = 86400000L
    def dts(d: Int): Timestamp = new Timestamp(d * day)
    val events = Seq(
      (1L, dts(0)), (1L, dts(3)),  // cohort week 0, active offsets {0}
      (1L, dts(8)),                // offset 1
      (2L, dts(7)), (2L, dts(21)), // cohort week 1, offsets {0, 2}
      (3L, dts(1))                 // cohort week 0, offset 0
    ).toDF("user_id", "ts")
    val got = Funnel.cohortRetention(events, "user_id", "ts", bucketDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("eventNgrams: contiguous mid-stream motifs counted, short users skipped, min-count gates the tail") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"), // a>b>c, b>c>d
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"),                // a>b>c
      (3L, 1L, "x"), (3L, 2L, "y")                                // too short for n=3
    ).toDF("user_id", "seq", "t")
    val got = Funnel.eventNgrams(events, "user_id", Seq("seq"), "t",
      n = 3, minCount = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 2L))) // b>c>d has count 1, gated out
    val all = Funnel.eventNgrams(events, "user_id", Seq("seq"), "t",
      n = 3, minCount = 1)
      .as[(String, Long)].collect().toMap
    assert(all == Map("a>b>c" -> 2L, "b>c>d" -> 1L))
  }
}
