package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def join(points: Seq[(Long, Long)], ivals: Seq[(Long, Long, Long)],
                   w: Long = 10L, maxFanOut: Int = 64) =
    RangeJoin.pointsInIntervals(
      points.toDF("point_id", "t"), "t",
      ivals.toDF("interval_id", "s", "e"), "s", "e",
      bucketWidth = w, maxFanOut = maxFanOut)
      .select("interval_id", "point_id").as[(Long, Long)].collect().toSet

  test("inclusive boundaries, bucket-crossing intervals, negatives, non-matches") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 20L), (4L, 21L), (5L, -3L), (6L, 100L))
    val ivals = Seq(
      (10L, 5L, 20L),   // crosses buckets 0..2; matches t=5,10,20 inclusive
      (11L, -7L, -1L),  // negative range; matches t=-3
      (12L, 50L, 60L))  // matches nothing
    assert(join(points, ivals) == Set((10L, 1L), (10L, 2L), (10L, 3L), (11L, 5L)))
  }

  test("a pair meets in exactly one bucket: no duplicate output rows") {
    // interval spans 5 buckets; every inner point must appear exactly once
    val points = (0L to 49L).map(i => (i, i))
    val out = RangeJoin.pointsInIntervals(
      points.toDF("point_id", "t"), "t",
      Seq((1L, 0L, 49L)).toDF("interval_id", "s", "e"), "s", "e", bucketWidth = 10L)
    assert(out.count() == 50L)
    assert(out.select("point_id").distinct().count() == 50L)
  }

  test("plan is an equi-join: no BNLJ or cartesian from the range predicate") {
    val df = RangeJoin.pointsInIntervals(
      Seq((1L, 5L)).toDF("point_id", "t"), "t",
      Seq((1L, 0L, 9L)).toDF("interval_id", "s", "e"), "s", "e", bucketWidth = 10L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range predicate leaked into the join strategy:\n$plan")
  }

  test("over-wide intervals fail loudly instead of exploding the shuffle") {
    val e = intercept[Exception] {
      join(Seq((1L, 5L)), Seq((1L, 0L, 1000L)), w = 10L, maxFanOut = 8)
    }
    assert(e.getMessage.contains("rangeJoin") || e.getCause != null)
  }

  test("inverted intervals (start > end) are dropped, not joined") {
    assert(join(Seq((1L, 5L)), Seq((1L, 9L, 0L))).isEmpty)
  }

  test("property: bucketed join ≡ BETWEEN reference across negative/positive/near-2^53 epochs") {
    // The pmod-floor-division claim (RangeJoin bucketOf): for ANY epoch sign
    // and magnitude — including the |v| > 2^53 regime where double-division
    // floor goes off by one bucket — the bucketed equi-join must emit exactly
    // the BETWEEN pairs. Each sample is one Spark job, so keep the count low
    // and the collections small; coverage comes from the adversarial bases.
    val genBase = Gen.oneOf(
      -(1L << 53) - 12345L, // negative past double-exactness
      (1L << 53) + 777L,    // positive past double-exactness
      -1000003L, -17L, 0L, 999999937L)
    val genCase = for {
      b <- genBase
      pts <- Gen.listOfN(25, Gen.choose(-50L, 50L))
      ivs <- Gen.listOfN(8, Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 35L)))
    } yield (b, pts, ivs)
    val prop = Prop.forAll(genCase) { case (b, pts, ivs) =>
      val points = pts.zipWithIndex.map { case (o, i) => (i.toLong, b + o) }
      val intervals = ivs.zipWithIndex.map { case ((o, len), i) => (i.toLong, b + o, b + o + len) }
      val expected = (for {
        (iid, s, e) <- intervals
        (pid, t) <- points
        if s <= t && t <= e
      } yield (iid, pid)).toSet
      join(points, intervals) == expected
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("intervalOverlaps: one row per overlapping pair even across many shared buckets") {
    val a = Seq((1L, 0L, 100L), (2L, 200L, 210L)).toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, 50L, 150L),  // overlaps a1 across shared buckets 5..10
      (11L, 100L, 120L), // touches a1 exactly at the inclusive boundary
      (12L, 101L, 110L), // just past a1's end — no overlap
      (13L, 205L, 206L)) // inside a2
      .toDF("b_id", "b_s", "b_e")
    val out = RangeJoin.intervalOverlaps(a, "a_s", "a_e", b, "b_s", "b_e", bucketWidth = 10L)
    val pairs = out.select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    // no duplicates despite multi-bucket overlap; exact pair set
    assert(pairs.size == pairs.toSet.size, s"duplicate pairs in $pairs")
    assert(pairs.toSet == Set((1L, 10L), (1L, 11L), (2L, 13L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
