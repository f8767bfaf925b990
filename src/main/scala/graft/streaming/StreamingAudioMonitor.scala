package graft.streaming

import graft.functions.PcmKernel
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AUDIO-QUALITY monitor — the at-ingest modality sibling of
  * [[StreamingUnigramMonitor]] (text fragmentation) and
  * [[StreamingWordPieceMonitor]] (vocab coverage): a live speech-ingest
  * pipeline watches level/activity/clipping signals CONTINUOUSLY (a
  * silent upstream leg, a gain change, or a gone-constant tone shows up
  * here long before a nightly batch card), and the card's whole input is
  * a handful of exact long sums and maxes — O(1) per-shard state
  * forever, the [[StreamingSrmMonitor]] bounded-fold shape.
  *
  * Per shard the state is (epoch, n_rows, n_samples, sum_sq, peak,
  * zero_crossings, n_frames, active_frames): per-row stats come from the
  * SAME fused [[PcmKernel.stats]] pass the batch
  * [[graft.operators.Multimodal.audioFeatures]] runs, and long
  * sums/maxes are count-commutative, so micro-batch boundaries and
  * within-batch order cannot change the cumulative state. [[readout]]
  * takes the max-epoch row per shard, merges across shards (sums; max
  * for peak), and finishes with the batch card's quantized rms/activity
  * divisions — drain ≡ batch (`StreamingAudioMonitorSpec`; q328 gates
  * the drained readout against q282's closed-form oracle aggregated
  * globally).
  *
  * Σs² bound: one sample contributes < 2³⁰, so a shard overflows a long
  * only past ~8.6·10⁹ samples — shard wider before that (the
  * [[StreamingMeanMonitor]] documented-bound discipline).
  *
  * Null audio counts as an empty row (row counted, zero samples) — the
  * batch card's degrade-don't-crash rule for corrupt upstream blobs.
  */
object StreamingAudioMonitor {

  /** (shard, seq, audio) → cumulative per-shard totals (shard, epoch,
    * n_rows, n_samples, sum_sq, peak, zero_crossings, n_frames,
    * active_frames), one row per shard per micro-batch. */
  def stats(
      ds: Dataset[(Int, Long, Array[Byte])],
      frameSamples: Int,
      energyThreshold: Long
  ): Dataset[(Int, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long, Long, Long, Long),
        (Int, Long, Long, Long, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, rows, state: GroupState[(Long, Long, Long, Long, Long, Long, Long, Long)]) =>
          var (epoch, nRows, nSamples, sumSq, peak, zc, nFrames, active) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          rows.foreach { case (_, _, audio) =>
            val st = PcmKernel.stats(
              if (audio == null) Array.empty[Byte] else audio,
              frameSamples, energyThreshold)
            nRows += 1L; nSamples += st(0); sumSq += st(1)
            if (st(2) > peak) peak = st(2)
            zc += st(3); nFrames += st(4); active += st(5)
          }
          epoch += 1L
          state.update((epoch, nRows, nSamples, sumSq, peak, zc, nFrames, active))
          Iterator((shard, epoch, nRows, nSamples, sumSq, peak, zc, nFrames, active))
      }
  }

  /** The current audio card from drained snapshots (columns shard,
    * epoch, n_rows, n_samples, sum_sq, peak, zero_crossings, n_frames,
    * active_frames): max-epoch row per shard, merged across shards,
    * finished with the batch card's quantized divisions —
    * (n_rows, total_samples, peak, total_zero_crossings, rms,
    * activity). */
  def readout(snapshots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q6 = (c: org.apache.spark.sql.Column) =>
      graft.functions.Quantize.scaledFloor(c, 6)
    snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .agg(
        coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
        coalesce(sum(col("n_samples")), lit(0L)).as("total_samples"),
        coalesce(sum(col("sum_sq")), lit(0L)).as("__ss"),
        coalesce(max(col("peak")), lit(0L)).as("peak"),
        coalesce(sum(col("zero_crossings")), lit(0L)).as("total_zero_crossings"),
        coalesce(sum(col("n_frames")), lit(0L)).as("__nf"),
        coalesce(sum(col("active_frames")), lit(0L)).as("__af"))
      .select(col("n_rows"), col("total_samples"), col("peak"),
        col("total_zero_crossings"),
        when(col("total_samples") >= 1L,
          q6(sqrt(col("__ss").cast("double") / col("total_samples").cast("double"))))
          .as("rms"),
        when(col("__nf") >= 1L,
          q6(col("__af").cast("double") / col("__nf").cast("double"))).as("activity"))
  }
}
