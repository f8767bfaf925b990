package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** The Structured Streaming surface: watermarked event-time windows, late
  * data handling, streaming dedup, and arbitrary keyed state.
  *
  * The reference's streaming constructs map onto these directly
  * (SURVEY.md §2.2): its `lag` clamp = `withWatermark` delay, its tumbling
  * source windows = `window()`, its user `stateFold` = the keyed-state
  * update function in [[runningAggregate]]. All aggregations here are
  * partial-then-final over the watermark-bounded state store — the shape
  * that scales: state per (key, window), pruned as the watermark passes.
  */
object Streams {

  /** Tumbling event-time counts with late-data tolerance `watermarkDelay`:
    * rows later than the watermark are dropped, windows finalize (and in
    * Append mode emit) once the watermark passes their end.
    */
  def tumblingCounts(
      df: DataFrame,
      tsCol: String,
      windowLength: String,
      watermarkDelay: String,
      keyCols: Column*
  ): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength) +: keyCols: _*)
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("bucket") +: keyCols :+ col("cnt"): _*)

  /** Sliding-window variant (windowLength, slide). */
  def slidingCounts(
      df: DataFrame,
      tsCol: String,
      windowLength: String,
      slide: String,
      watermarkDelay: String,
      keyCols: Column*
  ): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength, slide) +: keyCols: _*)
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("bucket") +: keyCols :+ col("cnt"): _*)

  /** Session windows with a dynamic gap: a session closes after `gap` of
    * key-silence; watermark bounds the state. */
  def sessionCounts(
      df: DataFrame,
      tsCol: String,
      gap: String,
      watermarkDelay: String,
      keyCols: Column*
  ): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap) +: keyCols: _*)
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("session_start") +: keyCols :+ col("cnt"): _*)

  /** Full session aggregate — same `session_window` operator as
    * [[sessionCounts]] (so it runs batch OR streaming), keeping both session
    * bounds: start = first event, end = last event + gap. Note Spark merges
    * ADJACENT windows: an event at exactly `last + gap` still joins the
    * session (a new session needs a gap strictly greater). Also emits
    * the event count and a decimal sum of `valueCol` (double summation
    * order differs across engines/partitionings; decimal partials make the
    * result engine- and partitioning-independent). Rounding contract: each
    * input is rounded HALF_UP to scale 4 before summing (decimal(28,4) —
    * 24 integer digits of headroom), so the sum is exact whenever values
    * carry at most 4 fractional digits.
    */
  def sessionAggregate(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      gap: String
  ): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).cast("int").as("n_events"),
        sum(col(valueCol).cast("decimal(28,4)")).as("__sv"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("__sv").cast("double").as("sum_value"))

  /** Streaming dedup bounded by the watermark: duplicates arriving within
    * the watermark horizon are dropped; state for keys older than the
    * watermark is pruned (the only dedup that survives an unbounded
    * stream). */
  def dedupWithinWatermark(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      keyCols: String*
  ): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.toSeq)

  /** Stream-stream inner join on a key within an event-time interval:
    * right rows match left rows with `rightTs` in
    * `[leftTs - lookback, leftTs]`. Both sides are watermarked so the join
    * state store is pruned as event time advances — the only stream-stream
    * join shape that runs unbounded.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      lookback: String,
      watermarkDelay: String
  ): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(
      r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback") &&
        r(rightTs) <= l(leftTs),
      "inner")
      .drop(r(keyCol))
  }

  /** Arbitrary keyed running state — the streaming form of the reference's
    * user `stateFold` (tamer `db/.../DbSetup.scala:39`): per key, fold each
    * micro-batch's values into carried state with `mapGroupsWithState`.
    * Emits (key, runningCount, runningSum) per update.
    */
  def runningAggregate(ds: Dataset[(String, Long)]): Dataset[(String, Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (String, Long, Long)](GroupStateTimeout.NoTimeout) {
        case (key, values, state: GroupState[(Long, Long)]) =>
          val (prevCnt, prevSum) = state.getOption.getOrElse((0L, 0L))
          val batch = values.map(_._2).toSeq
          val next = (prevCnt + batch.size, prevSum + batch.sum)
          state.update(next)
          (key, next._1, next._2)
      }
  }

  /** The same keyed `stateFold` on the arbitrary-state API v2
    * (`transformWithState`, Spark 4.x) — typed `ValueState` handles, timers,
    * and per-state TTL, backed by the RocksDB state store provider (set
    * `spark.sql.streaming.stateStore.providerClass`; RocksDB is what keeps
    * 100 TB-scale keyed state off the executor heap). Functionally parallel
    * to [[runningAggregate]] so the two state APIs can be diff-tested.
    */
  def runningFoldV2(ds: Dataset[(String, Long)]): Dataset[(String, Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new RunningFoldProcessor, TimeMode.None(), OutputMode.Update())
  }

  private final class RunningFoldProcessor
      extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)](
        "fold", Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long)],
        timers: TimerValues): Iterator[(String, Long, Long)] = {
      var (cnt, sum) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { r => cnt += 1; sum += r._2 }
      state.update((cnt, sum))
      Iterator.single((key, cnt, sum))
    }
  }

  /** Output mode guidance: Append for finalized-window sinks (files),
    * Update for upsert-capable sinks. */
  val appendMode: OutputMode = OutputMode.Append()
  val updateMode: OutputMode = OutputMode.Update()
}
