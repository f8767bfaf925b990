package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, pick the single most
  * recent right row whose time column is `<=` the left row's time, within the
  * same equality key.
  *
  * Spark has no native as-of join, and a naive theta-join
  * (`l.key = r.key AND r.t <= l.t` + max) explodes to O(n·m) pairs per key.
  * This implementation uses the union-and-carry-forward trick instead:
  * tag both sides, union them, and run a single `last(_, ignoreNulls)` window
  * over (key, time). Cost = ONE shuffle on the key (hash partition) plus a
  * per-partition sort — the same cost profile as a sort-merge join, no
  * pair explosion, no broadcast requirement, and AQE skew-split applies to
  * the shuffle. This is the shape that survives 100 TB: both inputs stream
  * through a single exchange keyed identically.
  *
  * Right-side rows are expected to be unique per (key, time); pre-deduplicate
  * (e.g. keep the max tiebreak) if they are not, or the carried value is the
  * last one in sort order.
  *
  * (capability parity: the reference ships rows to the upstream DB and has no
  * join operators at all — SURVEY.md §2.2; this is part of the relational
  * surface our engine adds natively.)
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param leftKeys   equality key columns on the left, by name
    * @param rightKeys  equality key columns on the right, by name (same arity)
    * @param leftTime   left time column name
    * @param rightTime  right time column name
    * @param rightCols  right columns to carry onto matching left rows
    *                   (emitted nullable; null = no right row at or before)
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]
  ): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    require(
      rightCols.toSet.intersect(left.columns.toSet).isEmpty,
      s"rightCols ${rightCols.toSet.intersect(left.columns.toSet).mkString(", ")} collide with left columns; rename before joining")
    val keyNames = leftKeys.indices.map(i => s"__asof_k$i")

    val lTagged = left
      .withColumns(keyNames.zip(leftKeys.map(col)).toMap)
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_payload", lit(null).cast(structType(right, rightCols)))

    val rTagged = right
      .withColumns(keyNames.zip(rightKeys.map(col)).toMap)
      .withColumn("__asof_t", col(rightTime))
      .withColumn("__asof_side", lit(0))
      .withColumn("__asof_payload", struct(rightCols.map(col): _*))
      .select((keyNames.map(col) :+ col("__asof_t") :+ col("__asof_side") :+ col("__asof_payload")): _*)

    // Align schemas for the union: left keeps all its columns, right carries
    // nulls for them.
    val leftCols = left.columns.toSeq
    val rAligned = leftCols.foldLeft(rTagged) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lTagged.columns.map(col): _*)

    val unioned = lTagged.unionByName(rAligned)

    // Right rows sort before left rows at the same timestamp so `<=`
    // semantics hold (a right row AT the left time matches).
    val w = W
      .partitionBy(keyNames.map(col): _*)
      .orderBy(col("__asof_t").asc, col("__asof_side").asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)

    val carried = unioned
      .withColumn("__asof_match", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)

    val out = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col(s"__asof_match.$c"))
    }
    out.select((leftCols ++ rightCols).map(col): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) = {
    import org.apache.spark.sql.types._
    StructType(cols.map(c => df.schema(c) match {
      case f => StructField(f.name, f.dataType, nullable = true)
    }))
  }

  /** Hot-key-safe as-of join: identical semantics to [[leftAsof]], but no
    * window partition ever holds a whole key's rows.
    *
    * [[leftAsof]]'s single window partitions by the join key — at 100 TB one
    * hot key (a user with 10^9 events) serializes into one task, and AQE
    * skew-split does not apply to window exchanges. This variant salts the
    * time axis into `bucketMicros`-wide ranges:
    *
    *  1. per (key, bucket): latest right payload in the bucket — plain
    *     aggregate, map-side partial, AQE-splittable;
    *  2. per key over *buckets*: carry the latest payload forward — a window
    *     whose partition size is the number of active buckets (time-range /
    *     bucket), independent of row count;
    *  3. per (key, bucket): the within-bucket union-and-carry window — the
    *     big data pass, now partitioned by (key, bucket) so a hot key
    *     spreads across time buckets;
    *  4. each left row takes its within-bucket match if present, else the
    *     carried value from strictly-earlier buckets.
    *
    * Right rows must be unique per (key, time) (same contract as
    * [[leftAsof]]). Time columns must be castable to timestamp and
    * post-epoch (integer DIV bucketing).
    */
  def leftAsofBucketed(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      bucketMicros: Long
  ): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    require(bucketMicros > 0, "bucketMicros must be positive")
    require(
      rightCols.toSet.intersect(left.columns.toSet).isEmpty,
      s"rightCols ${rightCols.toSet.intersect(left.columns.toSet).mkString(", ")} collide with left columns; rename before joining")
    val keyNames = leftKeys.indices.map(i => s"__asof_k$i")
    val payloadType = structType(right, rightCols)

    def withBucket(df: DataFrame, time: String): DataFrame = df
      .withColumn("__asof_us", unix_micros(col(time).cast("timestamp")))
      .withColumn("__asof_bk", expr(s"__asof_us DIV $bucketMicros"))

    val l = withBucket(left.withColumns(keyNames.zip(leftKeys.map(col)).toMap), leftTime)
    val r = withBucket(right.withColumns(keyNames.zip(rightKeys.map(col)).toMap), rightTime)
      .withColumn("__asof_payload", struct(rightCols.map(col): _*))

    // (1) latest right payload per (key, bucket) — keyed aggregate, no window
    val perBucket = r
      .groupBy((keyNames.map(col) :+ col("__asof_bk")): _*)
      .agg(max_by(col("__asof_payload"), col("__asof_us")).as("__asof_pay"))

    // (2) bucket-level carry: for each LEFT bucket, the latest right payload
    // from strictly-earlier buckets. Union right-bucket rows (side 1) with
    // left-bucket markers (side 0, sorting first at equal bucket so the same
    // bucket is excluded); window partition = key, rows = active buckets.
    val leftBuckets = l.select((keyNames.map(col) :+ col("__asof_bk")): _*).distinct()
      .withColumn("__asof_side", lit(0))
      .withColumn("__asof_pay", lit(null).cast(payloadType))
    val rightBuckets = perBucket
      .withColumn("__asof_side", lit(1))
      .select(leftBuckets.columns.map(col): _*)
    val wBuckets = W
      .partitionBy(keyNames.map(col): _*)
      .orderBy(col("__asof_bk"), col("__asof_side"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val carried = leftBuckets.unionByName(rightBuckets)
      .withColumn("__asof_prev", last(col("__asof_pay"), ignoreNulls = true).over(wBuckets))
      .filter(col("__asof_side") === 0)
      .select((keyNames.map(col) :+ col("__asof_bk") :+ col("__asof_prev")): _*)

    // (3) within-bucket carry — the only row-proportional window, partitioned
    // by (key, bucket)
    val lTagged = l
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_payload", lit(null).cast(payloadType))
    val leftCols = left.columns.toSeq
    val rAligned = leftCols.foldLeft(
      r.select((keyNames.map(col) :+ col("__asof_bk") :+ col("__asof_us") :+ lit(0).as("__asof_side") :+ col("__asof_payload")): _*)
    ) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }
      .select(lTagged.columns.map(col): _*)
    val wWithin = W
      .partitionBy((keyNames.map(col) :+ col("__asof_bk")): _*)
      .orderBy(col("__asof_us"), col("__asof_side"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val within = lTagged.unionByName(rAligned)
      .withColumn("__asof_within", last(col("__asof_payload"), ignoreNulls = true).over(wWithin))
      .filter(col("__asof_side") === 1)

    // (4) combine: within-bucket match wins, else the strictly-earlier carry
    val combined = within
      .join(carried, keyNames :+ "__asof_bk", "left")
      .withColumn("__asof_match", coalesce(col("__asof_within"), col("__asof_prev")))
    val out = rightCols.foldLeft(combined) { (df, c) =>
      df.withColumn(c, col(s"__asof_match.$c"))
    }
    out.select((leftCols ++ rightCols).map(col): _*)
  }
}
