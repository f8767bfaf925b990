package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 assembly semantics: run collapsing, null-safe runs, open current
  * rows, contiguous validity. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("consecutive equal values collapse; intervals are contiguous; current row is open") {
    val events = Seq(
      (1L, 10L, 1L, "bronze"), (1L, 20L, 2L, "bronze"), (1L, 30L, 3L, "silver"),
      (1L, 40L, 4L, "silver"), (1L, 50L, 5L, "gold"),
      (2L, 10L, 6L, "gold")
    ).toDF("user_id", "ts", "event_id", "tier")
    val got = Scd.scd2(events, "user_id", Seq("ts", "event_id"), "tier")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    assert(got == Set(
      (1L, "bronze", 10L, Some(30L), 1),
      (1L, "silver", 30L, Some(50L), 2),
      (1L, "gold", 50L, None, 3),
      (2L, "gold", 10L, None, 1)))
  }

  test("null values form their own runs (null-safe compare), first row always opens one") {
    val events = Seq(
      (1L, 10L, 1L, Option.empty[String]), (1L, 20L, 2L, Option.empty[String]),
      (1L, 30L, 3L, Some("a")), (1L, 40L, 4L, Option.empty[String])
    ).toDF("user_id", "ts", "event_id", "v")
    val got = Scd.scd2(events, "user_id", Seq("ts", "event_id"), "v")
      .as[(Long, Option[String], Long, Option[Long], Int)].collect().toSet
    assert(got == Set(
      (1L, None, 10L, Some(30L), 1),
      (1L, Some("a"), 30L, Some(40L), 2),
      (1L, None, 40L, None, 3)))
  }

  test("SCD2 composes with the interval join for point-in-time enrichment") {
    // closed validity rows enrich point lookups via RangeJoin ([from, to))
    val events = Seq(
      (1L, 100L, 1L, "bronze"), (1L, 200L, 2L, "silver"), (1L, 300L, 3L, "gold"))
      .toDF("user_id", "ts", "event_id", "tier")
    val closed = Scd.scd2(events, "user_id", Seq("ts", "event_id"), "tier")
      .filter(org.apache.spark.sql.functions.col("effective_to").isNotNull)
      .select(org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.col("effective_from").as("s"),
        org.apache.spark.sql.functions.col("effective_to").as("e"))
    val lookups = Seq((10L, 150L), (11L, 200L), (12L, 299L)).toDF("q_id", "t")
    val got = RangeJoin.pointsInIntervals(lookups, "t", closed, "s", "e", bucketWidth = 50L)
      .select("q_id", "value").as[(Long, String)].collect().toMap
    // [from, to): 150 -> bronze; 200 lands exactly on silver's open edge;
    // 299 still silver (gold's row is open-ended and was filtered)
    assert(got == Map(10L -> "bronze", 11L -> "silver", 12L -> "silver"))
  }

  test("a value that returns after a gap gets a NEW version (type 2, not type 1)") {
    val events = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"))
      .toDF("user_id", "ts", "event_id", "v")
    val got = Scd.scd2(events, "user_id", Seq("ts", "event_id"), "v")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    assert(got == Set(
      (1L, "a", 10L, Some(20L), 1),
      (1L, "b", 20L, Some(30L), 2),
      (1L, "a", 30L, None, 3)))
  }

  test("scd2Merge: incremental == from-scratch across every boundary case") {
    // key 1: open run CONTINUES across the cutoff (then changes later)
    // key 2: first new value CHANGES at the cutoff
    // key 3: only old events (untouched pass-through)
    // key 4: brand-new key (only new events)
    // key 5: continues and is the key's ONLY new run (open row stays open)
    val events = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 110L, 3L, "a"), (1L, 120L, 4L, "b"),
      (2L, 10L, 5L, "x"), (2L, 110L, 6L, "y"), (2L, 120L, 7L, "y"), (2L, 130L, 8L, "x"),
      (3L, 10L, 9L, "k"), (3L, 20L, 10L, "m"),
      (4L, 110L, 11L, "n"), (4L, 120L, 12L, "n"), (4L, 130L, 13L, "p"),
      (5L, 10L, 14L, "q"), (5L, 110L, 15L, "q")
    ).toDF("user_id", "ts", "event_id", "v")
    val old = events.filter($"ts" < 100L)
    val nw = events.filter($"ts" >= 100L)
    val existing = Scd.scd2(old, "user_id", Seq("ts", "event_id"), "v")
    val merged = Scd.scd2Merge(existing, nw, "user_id", Seq("ts", "event_id"), "v")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    val scratch = Scd.scd2(events, "user_id", Seq("ts", "event_id"), "v")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    assert(merged == scratch,
      s"incremental != from-scratch: missing ${scratch -- merged}, extra ${merged -- scratch}")
  }

  test("scd2Merge rejects an event at or before the open run's effective_from") {
    val old = Seq((1L, 10L, 1L, "a"), (1L, 30L, 2L, "b")).toDF("user_id", "ts", "event_id", "v")
    val existing = Scd.scd2(old, "user_id", Seq("ts", "event_id"), "v")
    val late = Seq((1L, 30L, 3L, "c")).toDF("user_id", "ts", "event_id", "v")
    val err = intercept[Exception] {
      Scd.scd2Merge(existing, late, "user_id", Seq("ts", "event_id"), "v").collect()
    }
    assert(err.getMessage != null)
  }

  test("scd2Merge chains: 3 sequential daily batches == from-scratch over the union") {
    // production runs the merge DAILY: day0 assembles, days 1-3 each merge
    // into the PREVIOUS merge's output — continuations, changes, revisits,
    // a key born mid-chain, and a key silent after day 1 all interleave
    val events = Seq(
      (1L, 10L, 1L, "a"), (1L, 110L, 2L, "a"), (1L, 210L, 3L, "b"), (1L, 310L, 4L, "a"),
      (2L, 10L, 5L, "x"), (2L, 120L, 6L, "y"), (2L, 220L, 7L, "y"), (2L, 320L, 8L, "z"),
      (3L, 10L, 9L, "k"), (3L, 130L, 10L, "k"),
      (4L, 230L, 11L, "n"), (4L, 330L, 12L, "n"),
      (5L, 20L, 13L, "q"), (5L, 140L, 14L, "r"), (5L, 240L, 15L, "q"), (5L, 340L, 16L, "q")
    ).toDF("user_id", "ts", "event_id", "v")
    val batches = Seq(
      events.filter($"ts" < 100L), events.filter($"ts" >= 100L && $"ts" < 200L),
      events.filter($"ts" >= 200L && $"ts" < 300L), events.filter($"ts" >= 300L))
    val chained = batches.tail.foldLeft(
      Scd.scd2(batches.head, "user_id", Seq("ts", "event_id"), "v")) { (acc, b) =>
      Scd.scd2Merge(acc, b, "user_id", Seq("ts", "event_id"), "v")
    }.as[(Long, String, Long, Option[Long], Int)].collect().toSet
    val scratch = Scd.scd2(events, "user_id", Seq("ts", "event_id"), "v")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    assert(chained == scratch,
      s"chained != from-scratch: missing ${scratch -- chained}, extra ${chained -- scratch}")
  }

  test("scd2Merge watermark guard catches the interior event the __f0 guard cannot") {
    // key 1's open run: value "a" from ts=10, last ingested event ts=50.
    // A new event at ts=30 with value "c" is AFTER effective_from (passes
    // the necessary-but-not-sufficient built-in guard — documented) but
    // inside the run; with the per-key watermark supplied, it raises.
    val old = Seq((1L, 10L, 1L, "a"), (1L, 50L, 2L, "a")).toDF("user_id", "ts", "event_id", "v")
    val existing = Scd.scd2(old, "user_id", Seq("ts", "event_id"), "v")
    val interior = Seq((1L, 30L, 3L, "c")).toDF("user_id", "ts", "event_id", "v")
    // without the watermark: passes the guard, silently diverges from replay
    val silent = Scd.scd2Merge(existing, interior, "user_id", Seq("ts", "event_id"), "v")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    val replay = Scd.scd2(old.unionByName(interior), "user_id", Seq("ts", "event_id"), "v")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    assert(silent != replay) // the documented hazard, pinned
    val wm = old.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"ts").as("watermark"))
    val err = intercept[Exception] {
      Scd.scd2Merge(existing, interior, "user_id", Seq("ts", "event_id"), "v",
        watermarks = Some(wm)).collect()
    }
    assert(err.getMessage != null)
  }

  test("scd2Merge with watermarks: the clean chain still equals from-scratch") {
    val events = Seq(
      (1L, 10L, 1L, "a"), (1L, 110L, 2L, "b"),
      (2L, 20L, 3L, "x"), (2L, 120L, 4L, "x"),
      (3L, 110L, 5L, "n")
    ).toDF("user_id", "ts", "event_id", "v")
    val old = events.filter($"ts" < 100L)
    val nw = events.filter($"ts" >= 100L)
    val wm = old.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"ts").as("watermark"))
    val merged = Scd.scd2Merge(Scd.scd2(old, "user_id", Seq("ts", "event_id"), "v"),
        nw, "user_id", Seq("ts", "event_id"), "v", watermarks = Some(wm))
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    val scratch = Scd.scd2(events, "user_id", Seq("ts", "event_id"), "v")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    assert(merged == scratch)
  }
}
