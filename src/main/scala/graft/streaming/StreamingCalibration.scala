package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming score-calibration monitor — the at-ingest sibling of
  * [[graft.operators.Profiler.reliabilityCard]]: a quality gate whose
  * threshold was set on a calibrated scorer must notice drift
  * CONTINUOUSLY (a scorer that decalibrates admits a different volume
  * than planned long before the nightly card runs), and the card's whole
  * input is ≤ `bins` rows of three longs per shard — exactly the bounded
  * keyed state the [[StreamingHeavyHitters]] / [[StreamingSrmMonitor]]
  * pattern (per-shard fold + epoch snapshot) carries.
  *
  * Per shard the state is bin → (n, Σc7, pos): O(bins) FOREVER, no
  * watermark needed. The fold is count-commutative (the same clamped
  * `floor(s·bins)` binning and 1e-7 integer score grid as the batch
  * card), so micro-batch boundaries and within-batch order cannot change
  * the cumulative state; each micro-batch re-emits the shard's full
  * per-bin snapshot under an incrementing epoch. A reader takes the
  * max-epoch rows per shard and long-sums per bin across shards — then
  * the SHARED [[graft.operators.Profiler.cardFromBinCounts]] finishing
  * expressions make the drained card BIT-IDENTICAL to the batch operator
  * over the same rows (`StreamingCalibrationSpec` pins the 3-micro-batch
  * drain against the batch card and the batch-placement invariance; q262
  * gates the drained card against q203's SQL oracle).
  */
object StreamingCalibration {

  /** (shard, seq, score, label) → cumulative per-shard per-bin snapshot
    * (shard, epoch, bin, n, s7, pos), the shard's FULL card per
    * micro-batch, epoch starting at 1. Counts are CUMULATIVE (monotone),
    * so a populated shard's every epoch emits at least one row and no
    * empty-wipe marker is needed. The seq column is part of the uniform
    * streaming-leg input shape but unused: the fold is count-commutative,
    * so no sort (and no per-task materialization of the group) is
    * needed. Scores outside [0, 1] clamp into the edge buckets, exactly
    * as in the batch card. */
  def binCounts(
      ds: Dataset[(Int, Long, Double, Boolean)],
      bins: Int
  ): Dataset[(Int, Long, Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    require(bins >= 2 && bins <= 4096, s"bins=$bins out of [2, 4096]")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, (Long, Long, Long)]),
        (Int, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, events,
            state: GroupState[(Long, Map[Long, (Long, Long, Long)])]) =>
          var (epoch, acc) =
            state.getOption.getOrElse((0L, Map.empty[Long, (Long, Long, Long)]))
          events.foreach { case (_, _, score, label) =>
            // the batch card's exact grid: clamped floor(s·bins) bin,
            // floor(s·1e7 + 0.5) integer score — double math identical to
            // the Column form's, so merged sums match bit for bit
            val bin = math.min(math.max(math.floor(score * bins).toLong, 0L),
              bins - 1L)
            val c7 = math.floor(score * 1e7 + 0.5).toLong
            val (n, s7, pos) = acc.getOrElse(bin, (0L, 0L, 0L))
            acc = acc.updated(bin, (n + 1L, s7 + c7, pos + (if (label) 1L else 0L)))
          }
          epoch += 1L
          state.update((epoch, acc))
          val e = epoch
          acc.toSeq.sortBy(_._1).iterator.map { case (bin, (n, s7, pos)) =>
            (shard, e, bin, n, s7, pos)
          }
      }
  }

  /** The current calibration card from drained snapshots (columns shard,
    * epoch, bin, n, s7, pos): max-epoch rows per shard, per-bin
    * long-summed across shards, then the SHARED
    * [[graft.operators.Profiler.cardFromBinCounts]] finishing
    * expressions — structurally the same plan tail as the batch card, so
    * drain ≡ batch bit for bit. */
  def card(snapshots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // row_number, not a max-epoch filter: an at-least-once sink can
    // deliver the max-epoch snapshot twice, and a filter would keep (and
    // double-count) both copies — exactly one row per (shard, bin)
    // survives here, the StreamingSrmMonitor.readout discipline
    val latest = snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("shard"), col("bin")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"),
        sum(col("s7")).as("__s7"),
        sum(col("pos")).as("__pos"))
    graft.operators.Profiler.cardFromBinCounts(latest)
  }
}
