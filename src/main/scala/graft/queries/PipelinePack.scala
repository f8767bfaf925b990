package graft.queries

import graft.Tables
import graft.pipeline.{BatchSink, PipelineRunner, WindowedSource}
import java.time.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Correctness entries for the incremental ingestion core: drive the real
  * checkpointed run loop over the `events` table in bounded mode and prove
  * the union of all windowed pulls equals a plain full scan (the oracle).
  * This is the liveness+exactness shape of the reference's TamerSpec
  * (tamer `core/src/test/scala/tamer/TamerSpec.scala:30-68`) promoted to the
  * driver's DuckDB gate.
  */
object PipelinePack extends QueryPack {

  /** Test-oriented sink: keeps each epoch's (lazy) batch; the union stays a
    * single Catalyst plan — N pruned scans, no driver materialization. */
  private final class BufferedUnionSink extends BatchSink {
    val batches = ArrayBuffer.empty[DataFrame]
    def write(df: DataFrame, epoch: Long): Unit = batches += df
    def result: Option[DataFrame] = batches.reduceOption(_ unionByName _)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Incremental tumbling-window ingestion of `events`, ~8 pulls tiling the
    // full ts range, then an aggregate over the union. Oracle = the same
    // aggregate over one full scan: any skipped, duplicated, or re-read row
    // changes cnt/sum and fails the hash compare.
    "q23_incremental_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val bounds = ev.agg(min(col("ts")), max(col("ts"))).head()
      val startTs = bounds.getTimestamp(0).toInstant.minusMillis(1)
      val endTs = bounds.getTimestamp(1).toInstant
      val range = Duration.between(startTs, endTs)
      val step = if (range.isZero) Duration.ofMillis(1) else range.dividedBy(7)
      val pipeline = WindowedSource.tumbling(
        name = "q23-events",
        relation = Tables.events(_, d),
        tsCol = "ts",
        from = startTs,
        step = step,
        lag = Duration.ZERO,
        now = () => endTs.plus(Duration.ofDays(1)),
        relationRepr = s"$d/events")
      val sink = new BufferedUnionSink
      val ckpt = java.nio.file.Files.createTempDirectory("graft-q23-ckpt").toString
      new PipelineRunner(s, ckpt).run(
        pipeline, sink,
        maxIterations = 64,
        stopWhen = (w: graft.core.Window) => !w.from.isBefore(endTs))
      sink.result.getOrElse(ev.limit(0))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q23_incremental_window" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
