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
}
