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
}
