package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Bradley–Terry preference aggregation — the at-ingest
  * sibling of [[graft.operators.Experiment.bradleyTerry]]: pairwise
  * duels (annotator A/B votes, model win/loss logs) arrive continuously,
  * and the fit's WHOLE input is the exact (winner, loser, n) pair-count
  * table — pairs-bounded state (k items → at most k·(k−1) ordered
  * pairs), exactly the [[StreamingSrmMonitor]] bounded-keyed-fold shape.
  *
  * Per shard the state is (epoch, pair → count): O(pairs) FOREVER, no
  * watermark needed. The fold is count-commutative, so micro-batch
  * boundaries and within-batch order cannot change the cumulative
  * counts; each micro-batch re-emits the shard's full cumulative
  * pair-count snapshot under an incrementing epoch. A reader takes the
  * max-epoch rows per shard and SUMS per pair across shards — long
  * counts are associative, so the merged table equals the batch
  * `groupBy(winner, loser).count` over the same duels, and
  * [[fitFromDrained]] runs the SHARED
  * [[graft.operators.Experiment.bradleyTerryFromCounts]] MM fixed point:
  * drain ≡ batch bit for bit (`StreamingBradleyTerrySpec` pins the
  * 3-micro-batch drain, replay idempotence, and checkpoint restart;
  * q297 gates the drained fit against q279's unrolled-MM SQL oracle).
  *
  * Contract: winner/loser are non-null strings (null-keyed duels are
  * DROPPED, counted nowhere — a malformed row must not poison-pill the
  * monitor, and the batch parity statement is over non-null duels).
  * At 100 TB scale the corpus never accumulates anywhere: state is
  * pairs-bounded per shard, emission is pairs-bounded per micro-batch,
  * and the expensive MM iterations run OUTSIDE the stream on the tiny
  * merged table.
  */
object StreamingBradleyTerry {

  // Map keys must be flat strings for the state encoder; U+0001 cannot
  // occur in the word-like item names this monitor is for (same class
  // of assumption as StreamingHeavyHitters' string keys).
  private val Sep = '\u0001'

  /** (shard, seq, winner, loser) → cumulative per-shard pair counts
    * (shard, epoch, winner, loser, n), the full snapshot re-emitted per
    * micro-batch, epoch starting at 1. The seq column is part of the
    * uniform streaming-leg input shape but unused: the fold is
    * count-commutative, so no sort is needed. */
  def pairCounts(
      ds: Dataset[(Int, Long, String, String)]
  ): Dataset[(Int, Long, String, String, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[String, Long]),
        (Int, Long, String, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, duels, state: GroupState[(Long, Map[String, Long])]) =>
          var (epoch, counts) = state.getOption.getOrElse((0L, Map.empty[String, Long]))
          duels.foreach { case (_, _, w, l) =>
            if (w != null && l != null) {
              val k = s"$w$Sep$l"
              counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
            }
          }
          epoch += 1L
          state.update((epoch, counts))
          counts.iterator.map { case (k, n) =>
            val i = k.indexOf(Sep.toInt)
            (shard, epoch, k.substring(0, i), k.substring(i + 1), n)
          }
      }
  }

  /** The merged (winner, loser, n) table from drained snapshots (columns
    * shard, epoch, winner, loser, n): max-epoch rows per shard, exact
    * long sum per pair across shards — equal to the batch
    * `groupBy(winner, loser).count` over the same duels. */
  def mergedCounts(snapshots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    snapshots
      .withColumn("__maxe", max(col("epoch")).over(Window.partitionBy(col("shard"))))
      .filter(col("epoch") === col("__maxe"))
      .groupBy(col("winner"), col("loser"))
      .agg(sum(col("n")).as("n"))
  }

  /** The Bradley–Terry strengths from drained snapshots via the SHARED
    * batch MM fit — (item, strength, wins, duels), bit-identical to
    * [[graft.operators.Experiment.bradleyTerry]] over the same duels. */
  def fitFromDrained(snapshots: DataFrame, iterations: Int = 8): DataFrame =
    graft.operators.Experiment.bradleyTerryFromCounts(
      mergedCounts(snapshots), "winner", "loser", "n", iterations)
}
