package graft.pipeline

import graft.core.Window
import java.time.{Duration, Instant}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tumbling time-window state machine — the engine's re-expression of the
  * reference's JDBC windowed source fold
  * (tamer `db/src/main/scala/tamer/db/DbSetup.scala:99-118`, clamp helper
  * `db/src/main/scala/tamer/db/package.scala:38`):
  *
  *  - empty batch      → keep `from`, widen `to` by one step (the window
  *    grows until it finally catches rows — no data is skipped during a
  *    quiet period);
  *  - non-empty batch  → `from = max(ts)` of the batch, `to = from + step`
  *    (rows sharing the max timestamp were all in the batch, so the next
  *    half-open window `(max, max+step]` neither re-reads nor skips);
  *  - both `to` candidates are clamped: a `to` in the future becomes
  *    `now - lag`, holding the window back so late-arriving rows within the
  *    lag horizon are still caught by a later pull.
  */
object TumblingWindow {

  /** `t` if it is not in the future, else `now - lag` (never before `from`,
    * so the window type's `to >= from` invariant holds even when
    * `now - lag` has not yet caught up with the window start).
    */
  def clamp(t: Instant, from: Instant, now: Instant, lag: Duration): Instant = {
    val c = if (t.isAfter(now)) now.minus(lag) else t
    if (c.isBefore(from)) from else c
  }

  /** One fold step. `maxTs` is `None` for an empty batch. */
  def fold(current: Window, maxTs: Option[Instant], step: Duration, lag: Duration, now: Instant): Window =
    maxTs match {
      case None =>
        Window(current.from, clamp(current.to.plus(step), current.from, now, lag))
      case Some(ts) =>
        Window(ts, clamp(ts.plus(step), ts, now, lag))
    }
}

/** Incremental windowed pull over any time-stamped relation — the flagship
  * source shape (reference: `DbSetup.tumbling`, its JDBC windowed scan
  * `db/.../DbSetup.scala:35-98`).
  *
  * Spark-first design: `relation` stays a declarative DataFrame — a parquet
  * scan here, `spark.read.jdbc(url, table, props)` against a production
  * database — and each pull appends the window predicate
  * `ts > from AND ts <= to`. Catalyst pushes that predicate into the scan:
  * for JDBC it is shipped in the generated WHERE clause (the exact behavior
  * the reference gets by interpolating the window into user SQL), for
  * parquet it prunes row groups. The iteration's only eager work is a
  * max-aggregate over the single pruned column — data never flows through
  * the driver.
  */
object WindowedSource {

  /** The reference's flagship source: an incremental tumbling-window pull
    * over a JDBC table (tamer `db/src/main/scala/tamer/db/DbSetup.scala:
    * 35-118`, example `example/.../DatabaseSimple.scala:35-39`). The window
    * predicate is appended to the lazy JDBC relation, so Catalyst ships
    * `tsCol > ? AND tsCol <= ?` inside the generated WHERE clause — exactly
    * the windowed SQL the reference interpolates by hand — and `fetchsize`
    * maps the reference's `fetchChunkSize` (`db/.../config.scala:27`).
    */
  def jdbc(
      name: String,
      url: String,
      table: String,
      tsCol: String,
      from: Instant,
      step: Duration,
      lag: Duration = Duration.ZERO,
      connectionProperties: java.util.Properties = new java.util.Properties(),
      fetchSize: Int = 5000,
      now: () => Instant = () => Instant.now()
  ): GraftPipeline[Window] = {
    tumbling(
      name,
      relation = { spark =>
        connectionProperties.setProperty("fetchsize", fetchSize.toString)
        spark.read.jdbc(url, table, connectionProperties)
      },
      tsCol = tsCol,
      from = from,
      step = step,
      lag = lag,
      now = now,
      relationRepr = s"jdbc:$url:$table")
  }

  def tumbling(
      name: String,
      relation: SparkSession => DataFrame,
      tsCol: String,
      from: Instant,
      step: Duration,
      lag: Duration = Duration.ZERO,
      now: () => Instant = () => Instant.now(),
      relationRepr: String = ""
  ): GraftPipeline[Window] = {
    val repr = s"windowed:$relationRepr:$tsCol:step=${step.toMillis}ms:lag=${lag.toMillis}ms"
    GraftPipeline[Window](
      name,
      initialState = Window(from, from.plus(step)),
      repr = repr,
      iteration = (spark, w) => {
        val batch = relation(spark).filter(
          col(tsCol) > lit(java.sql.Timestamp.from(w.from)) &&
            col(tsCol) <= lit(java.sql.Timestamp.from(w.to)))
        // One narrow aggregate decides the fold (reference: results.max over
        // the in-memory chunk, DbSetup.scala:113). Column pruning means this
        // scan reads only `tsCol`.
        val maxTsRow = batch.agg(max(col(tsCol))).head()
        val maxTs =
          if (maxTsRow.isNullAt(0)) None
          else Some(maxTsRow.getTimestamp(0).toInstant)
        Iteration(
          batch = if (maxTs.isDefined) Some(batch) else None,
          nextState = TumblingWindow.fold(w, maxTs, step, lag, now())
        )
      }
    )
  }
}
