package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join — points into intervals WITHOUT the non-equi plan
  * hazard: Spark plans a bare `start <= t AND t <= end` join predicate as
  * BroadcastNestedLoopJoin (or a cartesian), the O(n·m) shape that dies at
  * 100 TB. Bucketizing turns it into a plain equi-join: a point owns ONE
  * bucket (`floor(t / w)`), an interval explodes to the buckets it spans,
  * the join keys on the bucket (hash shuffle both sides, map-side
  * partitioned) and a residual range filter keeps exact semantics. Each
  * qualifying (point, interval) pair meets in exactly one bucket — the
  * point's — so the output needs no dedup pass.
  *
  * (SURVEY §2.2 "range join": the reference has no joins at all; this is
  * the scale-correct Spark expression of the category, same family as the
  * bucketed as-of join in [[AsofJoin]].)
  */
object RangeJoin {

  /** Floor division that stays in integer arithmetic end to end: Spark's
    * Column `/` is double division even on long operands, so
    * `(c - pmod(c, w)) / w` would round-trip through a double and can be
    * off by one bucket for |values| > 2^53. Routing through decimal keeps
    * every digit: after subtracting `pmod` the numerator is an exact
    * multiple of `w`, the decimal quotient is that exact integer (a long
    * quotient needs ~19 digits + 6 scale, well under decimal(38)), and the
    * final cast truncates nothing. Correct for negatives too, since `pmod`
    * is non-negative. */
  private def bucketOf(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** Overlap join between TWO interval sets (`a.start <= b.end AND
    * b.start <= a.end`, all bounds inclusive) — same bucketization as
    * [[pointsInIntervals]], but a pair of overlapping intervals shares
    * potentially MANY buckets, so the residual filter additionally keeps
    * only the FIRST shared bucket (`max(bucket(a.start), bucket(b.start))`,
    * which every overlapping pair shares by construction): exactly one
    * output row per pair with no distinct pass. Both exploded sides fail
    * loudly past `maxFanOut` and the join stays a pure equi-join.
    * Column names across `a` and `b` must be disjoint.
    */
  def intervalOverlaps(
      a: DataFrame,
      aStart: String,
      aEnd: String,
      b: DataFrame,
      bStart: String,
      bEnd: String,
      bucketWidth: Long,
      maxFanOut: Int = 64
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxFanOut > 0, "maxFanOut must be positive")
    def explodeSide(df: DataFrame, s: String, e: String): DataFrame = {
      val span = bucketOf(col(e), bucketWidth) - bucketOf(col(s), bucketWidth)
      df.filter(col(s) <= col(e))
        .filter(when(span >= maxFanOut,
          raise_error(concat(
            lit(s"rangeJoin: interval spans >= $maxFanOut buckets of $bucketWidth ("),
            col(s), lit(".."), col(e),
            lit("); widen bucketWidth or split the interval"))).cast("boolean"))
          .otherwise(lit(true)))
        .withColumn("__b",
          explode(sequence(bucketOf(col(s), bucketWidth), bucketOf(col(e), bucketWidth))))
    }
    explodeSide(a, aStart, aEnd)
      .join(explodeSide(b, bStart, bEnd).hint("shuffle_merge"), Seq("__b"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__b") ===
        greatest(bucketOf(col(aStart), bucketWidth), bucketOf(col(bStart), bucketWidth)))
      .drop("__b")
  }

  /** Join `points` (numeric `tsCol`, e.g. `unix_micros(ts)`) into
    * `intervals` (`[startCol, endCol]`, both inclusive). Column names must
    * be disjoint (alias before calling).
    *
    * `bucketWidth` trades interval fan-out (`ceil(len/w)+1` exploded rows)
    * against bucket occupancy — size it near the typical interval length.
    * An interval spanning more than `maxFanOut` buckets fails the job
    * LOUDLY (`raise_error`) instead of silently exploding the shuffle; a
    * corpus with wildly mixed interval lengths should split its intervals
    * upstream. `broadcastIntervals = true` broadcasts the exploded interval
    * side for genuinely dimension-sized interval tables; the default pins
    * sort-merge because the exploded side is a Generate-derivative whose
    * static size estimate Catalyst gets wrong (the usual derived-broadcast
    * OOM class).
    */
  def pointsInIntervals(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxFanOut: Int = 64,
      broadcastIntervals: Boolean = false
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxFanOut > 0, "maxFanOut must be positive")
    val span = bucketOf(col(endCol), bucketWidth) - bucketOf(col(startCol), bucketWidth)
    // the guard lives in a filter so Catalyst cannot prune it; raise_error
    // only evaluates on violating rows
    val guarded = intervals
      .filter(col(startCol) <= col(endCol))
      .filter(when(span >= maxFanOut,
        raise_error(concat(
          lit(s"rangeJoin: interval spans >= $maxFanOut buckets of $bucketWidth ("),
          col(startCol), lit(".."), col(endCol),
          lit("); widen bucketWidth or split the interval"))).cast("boolean"))
        .otherwise(lit(true)))
    val exploded = guarded.withColumn("__b",
      explode(sequence(bucketOf(col(startCol), bucketWidth), bucketOf(col(endCol), bucketWidth))))
    val right = if (broadcastIntervals) broadcast(exploded) else exploded.hint("shuffle_merge")
    points.withColumn("__b", bucketOf(col(tsCol), bucketWidth))
      .join(right, Seq("__b"))
      .filter(col(startCol) <= col(tsCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }
}
