package graft.streaming

import graft.functions.WarcKernel
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CONTAINER-HEALTH monitor — the at-ingest sibling of
  * [[StreamingAudioMonitor]] for the q338 WARC walk: a live crawl intake
  * watches shard integrity CONTINUOUSLY (a fetcher that starts emitting
  * truncated members, a proxy that re-compresses and breaks trailers, a
  * source that flips to error pages shows up here within a micro-batch,
  * not at the nightly audit), and the card's whole input is a handful of
  * exact long sums — O(1) per-shard-group state forever, the
  * [[StreamingSrmMonitor]] bounded-fold shape.
  *
  * Per group the state is (epoch, n_rows, bad_rows, n_members,
  * n_records, n_response, n_http_ok, content_total, n_crc_bad): per-row
  * facts come from the SAME fused [[WarcKernel.info]] walk the batch
  * audit runs (one real inflate + trailer verification per member), and
  * long sums are count-commutative, so micro-batch boundaries and
  * within-batch order cannot change the cumulative state. [[readout]]
  * takes the max-epoch row per group and merges across groups — drain ≡
  * batch (`StreamingContainerMonitorSpec`; q343 gates the drained
  * readout against q338's closed-form plants aggregated globally).
  *
  * An unwalkable shard (`is_warc = 0`) counts ONLY in n_rows/bad_rows —
  * its per-member counters are the fail sentinel, not data; folding them
  * would poison every total, the corrupt-blob degrade rule. */
object StreamingContainerMonitor {

  /** (group, seq, shard bytes) → cumulative per-group totals (group,
    * epoch, n_rows, bad_rows, n_members, n_records, n_response,
    * n_http_ok, content_total, n_crc_bad), one row per group per
    * micro-batch. */
  def stats(
      ds: Dataset[(Int, Long, Array[Byte])]
  ): Dataset[(Int, Long, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long, Long, Long, Long, Long),
        (Int, Long, Long, Long, Long, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (group, rows, state: GroupState[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]) =>
          var (epoch, nRows, bad, members, records, resp, httpOk, content, crcBad) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          rows.foreach { case (_, _, bytes) =>
            val r = WarcKernel.info(bytes)
            nRows += 1L
            if (r(0) != 1L) bad += 1L
            else {
              members += r(1); records += r(2); resp += r(3)
              httpOk += r(6); content += r(7); crcBad += r(8)
            }
          }
          epoch += 1L
          state.update((epoch, nRows, bad, members, records, resp, httpOk, content, crcBad))
          Iterator((group, epoch, nRows, bad, members, records, resp, httpOk, content, crcBad))
      }
  }

  /** The current container-health card from drained snapshots (columns
    * group, epoch, n_rows, bad_rows, n_members, n_records, n_response,
    * n_http_ok, content_total, n_crc_bad): max-epoch row per group,
    * summed across groups. */
  def readout(snapshots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("group")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("bad_rows")).as("bad_rows"),
        sum(col("n_members")).as("n_members"),
        sum(col("n_records")).as("n_records"),
        sum(col("n_response")).as("n_response"),
        sum(col("n_http_ok")).as("n_http_ok"),
        sum(col("content_total")).as("content_total"),
        sum(col("n_crc_bad")).as("n_crc_bad"))
  }
}
