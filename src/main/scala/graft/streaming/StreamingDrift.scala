package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor — the at-ingest sibling of
  * [[graft.operators.Profiler.psi]]: a scorecard gated on a reference
  * vintage must notice population drift CONTINUOUSLY (an upstream
  * schema/unit change skews every downstream threshold long before the
  * nightly PSI runs), and the test's whole live-side input is ≤ `bins`
  * histogram counts per shard — the same bounded keyed state as
  * [[StreamingCalibration]].
  *
  * Per shard the state is bin → count on the batch operator's EXACT
  * integer grid ([[graft.sinks.ClusteredWrite.zBucket]]'s clamp +
  * remainder-subtracted division, mirrored in long arithmetic): O(bins)
  * FOREVER, no watermark needed. The fold is count-commutative, so
  * micro-batch boundaries and within-batch order cannot change the
  * cumulative state; each micro-batch re-emits the shard's full
  * histogram under an incrementing epoch. [[psiVsReference]] takes the
  * max-epoch rows per shard, long-sums per bin across shards,
  * full-outer-merges with the REFERENCE vintage's histogram
  * ([[graft.operators.Profiler.histogram]] output — bins-bounded, built
  * once), and finishes through the SHARED
  * [[graft.operators.Profiler.psiFromBinCounts]] expressions — so the
  * drained psi is BIT-IDENTICAL to the batch test over the same rows
  * (`StreamingDriftSpec` pins drain ≡ batch and the placement
  * invariance; q263 gates the drained psi against q214's SQL oracle).
  */
object StreamingDrift {

  /** (shard, seq, value) → cumulative per-shard histogram snapshot
    * (shard, epoch, bin, cnt), the shard's FULL histogram per
    * micro-batch, epoch starting at 1. Counts are CUMULATIVE (monotone),
    * so a populated shard's every epoch emits at least one row and no
    * empty-wipe marker is needed. The seq column is part of the uniform
    * streaming-leg input shape but unused: the fold is count-commutative,
    * so no sort (and no per-task materialization of the group) is
    * needed. Values outside [minV, maxV] clamp into the edge bins,
    * exactly as in the batch histogram. */
  def binCounts(
      ds: Dataset[(Int, Long, Long)],
      minV: Long,
      maxV: Long,
      bins: Int
  ): Dataset[(Int, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    require(bins > 0 && (bins & (bins - 1)) == 0 && bins <= (1 << 20),
      s"bins must be a power of two in (0, 2^20], got $bins")
    require(maxV >= minV, s"empty domain [$minV, $maxV]")
    val bits = java.lang.Integer.numberOfTrailingZeros(bins)
    // width computed once and checked positive FIRST: maxV - minV + 1
    // overflows Long for near-full-range domains, and an overflowed
    // (negative) width would pass a bare <= check vacuously and then
    // corrupt every bin via division by a negative denominator
    val width = maxV - minV + 1L
    require(width > 0L && width <= (1L << (53 - bits)),
      s"domain [$minV, $maxV] too wide for exact bucketization at bits=$bits")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, Long]), (Int, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, events, state: GroupState[(Long, Map[Long, Long])]) =>
          var (epoch, acc) = state.getOption.getOrElse((0L, Map.empty[Long, Long]))
          events.foreach { case (_, _, value) =>
            // zBucket's exact arithmetic in longs: clamp, scale by 2^bits,
            // remainder-subtracted integer division — the double division
            // in the Column form is exact by the 2^53 require above, so
            // plain long division lands on the identical bin
            val clamped = math.max(minV, math.min(maxV, value))
            val num = (clamped - minV) * (1L << bits)
            val den = maxV - minV + 1L
            val bin = num / den
            acc = acc.updated(bin, acc.getOrElse(bin, 0L) + 1L)
          }
          epoch += 1L
          state.update((epoch, acc))
          val e = epoch
          acc.toSeq.sortBy(_._1).iterator.map { case (bin, cnt) =>
            (shard, e, bin, cnt)
          }
      }
  }

  /** PSI of the drained live stream against a reference vintage:
    * `snapshots` has columns (shard, epoch, bin, cnt) from [[binCounts]];
    * `reference` is the batch [[graft.operators.Profiler.histogram]] of
    * the reference vintage with empty groupCols — (bin, cnt),
    * bins-bounded. Max-epoch rows per shard, per-bin long sums across
    * shards, full-outer bin merge with the reference, then the SHARED
    * [[graft.operators.Profiler.psiFromBinCounts]] closed form — drain ≡
    * batch bit for bit. */
  def psiVsReference(
      snapshots: DataFrame,
      reference: DataFrame,
      bins: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // row_number, not a max-epoch filter: an at-least-once sink can
    // deliver the max-epoch snapshot twice, and a filter would keep (and
    // double-count) both copies — exactly one row per (shard, bin)
    // survives, the StreamingSrmMonitor.readout discipline
    val live = snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("shard"), col("bin")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("__cb"))
    graft.operators.Profiler.psiFromBinCounts(
      reference.select(col("bin"), col("cnt").as("__ca"))
        .join(live, Seq("bin"), "full_outer"), bins)
  }
}
