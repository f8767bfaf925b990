package graft.streaming

import graft.functions.{WordPieceKernel, WordPieceVocab}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming WordPiece vocabulary-coverage monitor — the at-ingest
  * sibling of [[graft.operators.WordPiece.coverageCard]] and the
  * WordPiece member of the tokenizer-monitor pair
  * ([[StreamingUnigramMonitor]] watches fragmentation; this watches the
  * UNK RATE, the signal that spikes first when out-of-alphabet text
  * starts flowing into a BERT-tokenized corpus). The card's whole input
  * is four exact long sums — O(1) per-shard state forever, the
  * [[StreamingSrmMonitor]] bounded-fold shape.
  *
  * Per shard the state is (epoch, n_docs, n_words, n_tokens,
  * n_unk_words): per-document stats come from the SAME fused
  * [[WordPieceKernel.docStats]] the batch card runs (greedy
  * longest-match under the broadcast-captured vocabulary), and long sums
  * are count-commutative, so micro-batch boundaries and within-batch
  * order cannot change the cumulative state. [[readout]] takes the
  * max-epoch row per shard, sums across shards, and finishes with the
  * batch card's one-division UNK rate — drain ≡ batch
  * (`StreamingWordPieceMonitorSpec`; q320 gates the drained readout
  * against q319's closed-form oracle's global totals).
  *
  * Null text counts as an empty document (doc counted, zero words) —
  * the batch card's `coalesce(text, '')` rule.
  */
object StreamingWordPieceMonitor {

  /** (shard, seq, text) → cumulative per-shard totals
    * (shard, epoch, n_docs, n_words, n_tokens, n_unk_words), one row per
    * shard per micro-batch, epoch starting at 1. */
  def stats(
      ds: Dataset[(Int, Long, String)],
      vocab: WordPieceVocab
  ): Dataset[(Int, Long, Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long),
        (Int, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, docs, state: GroupState[(Long, Long, Long, Long, Long)]) =>
          var (epoch, nDocs, nWords, nTokens, nUnk) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L))
          docs.foreach { case (_, _, text) =>
            val st = WordPieceKernel.docStats(if (text == null) "" else text, vocab)
            nDocs += 1L; nTokens += st(0); nUnk += st(1); nWords += st(2)
          }
          epoch += 1L
          state.update((epoch, nDocs, nWords, nTokens, nUnk))
          Iterator((shard, epoch, nDocs, nWords, nTokens, nUnk))
      }
  }

  /** The current coverage card from drained snapshots (columns shard,
    * epoch, n_docs, n_words, n_tokens, n_unk_words): max-epoch row per
    * shard, long-summed across shards, finished with the batch card's
    * one-division UNK rate. */
  def readout(snapshots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .agg(
        coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("n_words")), lit(0L)).as("total_words"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"),
        coalesce(sum(col("n_unk_words")), lit(0L)).as("total_unk_words"))
      .select(col("n_docs"), col("total_words"), col("total_tokens"),
        col("total_unk_words"),
        round(col("total_unk_words").cast("double")
          / col("total_words").cast("double"), 4).as("unk_rate"))
  }
}
