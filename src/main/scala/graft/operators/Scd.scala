package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension assembly — the warehouse primitive that turns
  * an append-only attribute event stream into SCD TYPE-2 history rows:
  * one row per (key, value run) with `[effective_from, effective_to)`
  * validity and a per-key version counter, `effective_to` null on the
  * current row. Downstream, point-in-time enrichment is an as-of join
  * ([[AsofJoin]]) or an interval join ([[RangeJoin]]) against these rows.
  */
object Scd {

  /** Collapse consecutive equal values per key into SCD2 validity rows.
    *
    * `orderCols` MUST include a tie-breaking unique suffix (same contract
    * as [[TimeSeries.rollingZScore]] — bare event time is nondeterministic
    * under collisions); the first order column is the effective-from
    * timestamp. Value comparison is null-safe (`<=>`), so a legitimate
    * null value forms its own run and the first row per key always opens
    * one.
    *
    * Shape at 100 TB: two per-key ordered windows (lag to find change
    * points over the raw stream, lead/row_number over the CHANGE rows —
    * a far smaller frame) — keys are numerous, windows run wide, nothing
    * global. Output: (key, value, effective_from, effective_to, version).
    */
  def scd2(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    require(orderCols.nonEmpty,
      "orderCols must include a tie-breaking unique suffix after the event time")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val changes = df
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col(valueCol) <=> col("__prev")))
    val wc = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    changes
      .withColumn("effective_from", col(orderCols.head))
      .withColumn("effective_to", lead(col(orderCols.head), 1).over(wc))
      .withColumn("version", row_number().over(wc))
      .select(col(keyCol), col(valueCol).as("value"),
        col("effective_from"), col("effective_to"), col("version"))
  }
}
