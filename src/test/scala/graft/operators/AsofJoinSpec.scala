package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "k1", ts("2026-01-01 10:00:00")),
    (2L, "k1", ts("2026-01-05 10:00:00")), // several empty buckets after the match
    (3L, "k1", ts("2026-01-01 09:00:00")), // before any right row -> null
    (4L, "k2", ts("2026-01-02 00:00:00")),
    (5L, "k3", ts("2026-01-02 00:00:00"))  // key with no right rows at all
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    ("k1", ts("2026-01-01 09:30:00"), 100L),
    ("k1", ts("2026-01-01 10:00:00"), 101L), // exactly at left t -> <= matches
    ("k1", ts("2026-01-06 00:00:00"), 102L), // after left rows
    ("k2", ts("2026-01-01 23:59:59"), 200L)
  ).toDF("k", "rt", "val")

  private def expected = Map(1L -> Some(101L), 2L -> Some(101L), 3L -> None, 4L -> Some(200L), 5L -> None)

  test("leftAsof: latest right at-or-before, per key") {
    val out = AsofJoin.leftAsof(left, right, Seq("k"), Seq("k"), "t", "rt", Seq("val"))
      .select($"id", $"val").as[(Long, Option[Long])].collect().toMap
    assert(out == expected)
  }

  test("leftAsofBucketed matches leftAsof on constructed edge cases across bucket sizes") {
    for (bucketMicros <- Seq(3600L * 1000000, 86400L * 1000000, 30L * 86400 * 1000000)) {
      val out = AsofJoin.leftAsofBucketed(left, right, Seq("k"), Seq("k"), "t", "rt", Seq("val"), bucketMicros)
        .select($"id", $"val").as[(Long, Option[Long])].collect().toMap
      assert(out == expected, s"bucket=$bucketMicros")
    }
  }

  test("leftAsofBucketed equals leftAsof on real data (events x orders, sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d).select($"event_id", $"user_id", $"ts")
    val ord = graft.Tables.orders(spark, d)
      .groupBy($"o_custkey", $"o_orderdate").agg(max($"o_orderkey").as("o_orderkey"))
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select($"event_id", $"o_orderkey").as[(Long, Option[Long])].collect().toMap
    val plain = run(AsofJoin.leftAsof(ev, ord, Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate", Seq("o_orderkey")))
    val bucketed = run(AsofJoin.leftAsofBucketed(ev, ord, Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate", Seq("o_orderkey"), 7L * 86400 * 1000000))
    assert(bucketed == plain)
  }

  test("bucketed plan has no window partitioned by the bare key over row-proportional data") {
    val plan = AsofJoin.leftAsofBucketed(left, right, Seq("k"), Seq("k"), "t", "rt", Seq("val"), 3600L * 1000000)
      .queryExecution.optimizedPlan.toString
    // the row-proportional window must include the bucket in its partition spec
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.nonEmpty)
    assert(windowSpecs.exists(_.contains("__asof_bk")), s"no bucketed window in:\n$plan")
  }

  test("rightCols colliding with left columns are rejected") {
    val l = Seq((1L, "k", ts("2026-01-01 00:00:00"), 5L)).toDF("id", "k", "t", "val")
    intercept[IllegalArgumentException] {
      AsofJoin.leftAsofBucketed(l, right, Seq("k"), Seq("k"), "t", "rt", Seq("val"), 1000000L)
    }
    intercept[IllegalArgumentException] {
      AsofJoin.leftAsof(l, right, Seq("k"), Seq("k"), "t", "rt", Seq("val"))
    }
  }
}
