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

  /** INCREMENTAL SCD2 maintenance — merge an append-only batch of new
    * attribute events into an existing [[scd2]] table WITHOUT replaying
    * history: closed rows pass through untouched, each touched key's open
    * row either extends (first new value equals the current one — the
    * run continues) or closes at the first new change point, and the new
    * batch's own runs append with continuing version numbers. The result
    * equals `scd2(all events ever)` row for row (the q197 gate), at the
    * cost of ONE scd2 pass over the NEW batch plus key-wise joins against
    * the existing table — a day's events, not history.
    *
    * APPEND-ONLY contract, enforced in-plan with raise_error. The
    * collapsed table alone can only witness each key's open-run
    * `effective_from`, so the built-in guard (every new event strictly
    * later than it) is NECESSARY BUT NOT SUFFICIENT: an event landing
    * after `effective_from` but at/before the key's last already-ingested
    * event — the run's interior, whose events the collapse discarded by
    * design — passes it, and the merged history then diverges from
    * from-scratch replay (a change-back at a later old event is lost).
    * Pass `watermarks` (one row per key: the max event time ever
    * ingested, the frame a deployment persists alongside the dimension
    * and folds `max(orderCols.head)` of each batch into) to make the
    * guard SUFFICIENT: each key's earliest new event — the first new
    * run's `effective_from` — must then be strictly later than the
    * watermark, which bounds every new event past everything ingested,
    * and the row-for-row equality with `scd2(all events)` (the q197
    * gate) holds unconditionally. Without it, equality holds only when
    * callers honor the contract; replay from the raw event log if late
    * data lands inside a run.
    *
    * Shape: scd2 over the batch (per-key windows), then key-wise
    * SMJ-pinned joins and one anti-join — nothing rescans the dimension
    * beyond one pass over its rows; `watermarks` is dimension-shaped and
    * joins SMJ like the rest.
    */
  def scd2Merge(
      existing: DataFrame,
      newEvents: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      watermarks: Option[DataFrame] = None
  ): DataFrame = {
    val newRuns = scd2(newEvents, keyCol, orderCols, valueCol)
    val open = existing.filter(col("effective_to").isNull)
      .select(col(keyCol), col("value").as("__v0"), col("effective_from").as("__f0"),
        col("version").as("__vn"), lit(true).as("__hasOld"))
    val withWm = watermarks match {
      case None => newRuns.hint("shuffle_merge")
      case Some(wm) =>
        // the frame contract is load-bearing: a stray extra column would
        // silently become the watermark and the guard would wave through
        // exactly the interior events it exists to catch
        require(wm.columns.length == 2 && wm.columns.contains(keyCol),
          s"watermarks must be exactly ($keyCol, <watermark>); got ${wm.columns.mkString(", ")}")
        newRuns.hint("shuffle_merge")
          .join(wm.select(col(keyCol), col(wm.columns.filterNot(_ == keyCol).head).as("__wm"))
            .hint("shuffle_merge"), Seq(keyCol), "left")
    }
    val guarded0 = withWm
      .join(open.hint("shuffle_merge"), Seq(keyCol), "left")
      // the guard lives in a filter so Catalyst cannot prune it;
      // raise_error only evaluates on violating rows (the RangeJoin form)
      .filter(col("__hasOld").isNull || col("effective_from") > col("__f0") ||
        raise_error(concat(lit("scd2Merge: new event at or before the open run's "),
          lit("effective_from for key "), col(keyCol).cast("string"))))
    val guarded = (if (watermarks.isEmpty) guarded0 else guarded0
      // only the key's FIRST new run needs checking: run 1's
      // effective_from IS the key's minimum new event time
      .filter(col("version") =!= 1 || col("__wm").isNull ||
        col("effective_from") > col("__wm") ||
        raise_error(concat(lit("scd2Merge: new event at or before the ingestion "),
          lit("watermark for key "), col(keyCol).cast("string"))))
      .drop("__wm"))
    // does the key's FIRST new run continue the open run's value?
    val wk = Window.partitionBy(col(keyCol))
    val firstMerges = max(
      when(col("version") === 1 && coalesce(col("__hasOld"), lit(false)) &&
        (col("value") <=> col("__v0")), 1).otherwise(0)).over(wk)
    val adjusted = guarded
      .withColumn("__fm", firstMerges === 1)
      // a merged first run is DROPPED (the old open row absorbs it);
      // remaining runs renumber after the old version count
      .filter(!(col("__fm") && col("version") === 1))
      .select(col(keyCol), col("value"), col("effective_from"), col("effective_to"),
        (col("version") +
          when(col("__fm"), col("__vn") - 1)
            .otherwise(coalesce(col("__vn"), lit(0L)))).cast("int").as("version"))
    // per-key boundary info for the old open row
    val firstRun = newRuns.filter(col("version") === 1)
      .select(col(keyCol), col("value").as("__nv1"),
        col("effective_from").as("__nf1"), col("effective_to").as("__nt1"))
    val openAdjusted = open
      .join(firstRun.hint("shuffle_merge"), Seq(keyCol))
      .select(col(keyCol), col("__v0").as("value"), col("__f0").as("effective_from"),
        when(col("__v0") <=> col("__nv1"), col("__nt1")).otherwise(col("__nf1"))
          .as("effective_to"),
        col("__vn").as("version"))
    val touched = newEvents.select(col(keyCol)).distinct()
    val untouched = existing.join(touched.hint("shuffle_merge"), Seq(keyCol), "left_anti")
    val closedTouched = existing.filter(col("effective_to").isNotNull)
      .join(touched.hint("shuffle_merge"), Seq(keyCol), "left_semi")
    untouched
      .unionByName(closedTouched)
      .unionByName(openAdjusted)
      .unionByName(adjusted)
  }
}
