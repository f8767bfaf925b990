package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming φ-frequent-item summaries — the at-ingest sibling of
  * [[graft.operators.Profiler.heavyHitters]]: per-shard Misra–Gries
  * state (≤ k counters, O(k) FOREVER — the sketch-family contract, no
  * watermark needed) folded across micro-batches, the shard's current
  * summary re-emitted each batch under an incrementing epoch so a reader
  * takes the max-epoch snapshot per shard and merges shards exactly like
  * the batch operator's partial-merge step.
  *
  * Reuses [[graft.functions.MisraGries]]'s fold verbatim (one decrement
  * rule, not two — the permCoin discipline); within a micro-batch events
  * fold in `seq` order, so a replayed topic rebuilds byte-identical
  * state. The MG guarantee survives streaming unchanged: any item with
  * true shard count > n_shard/(k+1) is present in the summary with
  * estimate undercounting by at most n_shard/(k+1).
  */
object StreamingHeavyHitters {

  /** (shard, seq, item) → (shard, epoch, item, est) — the full current
    * summary per shard per micro-batch, epoch starting at 1, plus one
    * null-item MARKER row per epoch: a Misra–Gries wipe (the k+1st
    * distinct item zeroing every counter) legitimately leaves an EMPTY
    * summary, and without the marker the latest epoch would emit nothing
    * — a reader taking max-epoch rows would silently serve the previous
    * batch's snapshot as current. Readers select max epoch per shard,
    * then drop the null marker. */
  def summaries(
      ds: Dataset[(Int, Long, String)],
      k: Int
  ): Dataset[(Int, Long, String, Long)] = {
    import ds.sparkSession.implicits._
    val mg = new graft.functions.MisraGries(k)
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[String, Long]), (Int, Long, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, events, state: GroupState[(Long, Map[String, Long])]) =>
          val (epoch, prev) = state.getOption.getOrElse((0L, Map.empty[String, Long]))
          // (seq, item) sort: duplicate seqs would otherwise fold in
          // shuffle order and MG's decrement rule is order-sensitive —
          // the byte-identical-replay contract needs a total order
          val folded = events.toSeq.sortBy(t => (t._2, t._3))
            .foldLeft(prev) { case (m, (_, _, item)) =>
              // null IS the epoch-marker sentinel in the OUTPUT — a null
              // input item would collide with it and its count would be
              // silently dropped by marker-filtering readers; fail loudly
              require(item != null, s"null item in shard $shard — nulls are reserved " +
                "for the epoch marker; filter or map them upstream")
              mg.reduce(m, item)
            }
          state.update((epoch + 1L, folded))
          (Iterator((shard, epoch + 1L, null.asInstanceOf[String], 0L)) ++
            folded.toSeq.sortBy { case (i, c) => (-c, i) }
              .map { case (i, c) => (shard, epoch + 1L, i, c) }.iterator)
      }
  }
}
