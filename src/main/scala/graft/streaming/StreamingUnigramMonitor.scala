package graft.streaming

import graft.functions.{UnigramKernel, UnigramVocab}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming unigram-tokenizer corpus monitor — the at-ingest sibling of
  * [[graft.operators.UnigramLm.transferCard]]: a live ingestion pipeline
  * watches token totals and the tokens-per-word fragmentation ratio
  * CONTINUOUSLY (a domain shift in the incoming corpus shows up as
  * fragmentation long before a nightly batch card runs), and the card's
  * whole input is four exact long sums — O(1) per-shard state forever,
  * the [[StreamingSrmMonitor]] bounded-fold shape.
  *
  * Per shard the state is (epoch, n_docs, n_words, n_tokens,
  * score_micro): the per-document stats come from the SAME fused
  * [[UnigramKernel.docStats]] the batch card runs (exact integer Viterbi
  * under the broadcast-captured vocabulary), and long sums are
  * count-commutative, so micro-batch boundaries and within-batch order
  * cannot change the cumulative state. A reader takes the max-epoch row
  * per shard and SUMS across shards; [[readout]] finishes with the same
  * one-division ratio expression as the batch card — drain ≡ batch
  * (`StreamingUnigramMonitorSpec`; q302 gates the drained readout
  * against the q294 closed-form oracle's global totals).
  *
  * Null text counts as an empty document (doc counted, zero words) —
  * exactly the batch card's `coalesce(text, '')`, so drain ≡ batch holds
  * on dirty input too.
  */
object StreamingUnigramMonitor {

  /** (shard, seq, text) → cumulative per-shard totals
    * (shard, epoch, n_docs, n_words, n_tokens, score_micro), one row per
    * shard per micro-batch, epoch starting at 1. The seq column is part
    * of the uniform streaming-leg input shape but unused (the fold is
    * sum-commutative). */
  def stats(
      ds: Dataset[(Int, Long, String)],
      vocab: UnigramVocab
  ): Dataset[(Int, Long, Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long),
        (Int, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, docs, state: GroupState[(Long, Long, Long, Long, Long)]) =>
          var (epoch, nDocs, nWords, nTokens, score) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L))
          docs.foreach { case (_, _, text) =>
            val st = UnigramKernel.docStats(if (text == null) "" else text, vocab)
            nDocs += 1L; score += st(0); nTokens += st(1); nWords += st(2)
          }
          epoch += 1L
          state.update((epoch, nDocs, nWords, nTokens, score))
          Iterator((shard, epoch, nDocs, nWords, nTokens, score))
      }
  }

  /** The current corpus card from drained snapshots (columns shard,
    * epoch, n_docs, n_words, n_tokens, score_micro): max-epoch row per
    * shard, long-summed across shards, finished with the batch card's
    * one-division ratio — (n_docs, total_words, total_tokens,
    * total_score_micro, tokens_per_word). */
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
        coalesce(sum(col("score_micro")), lit(0L)).as("total_score_micro"))
      .select(col("n_docs"), col("total_words"), col("total_tokens"),
        col("total_score_micro"),
        round(col("total_tokens").cast("double")
          / col("total_words").cast("double"), 4).as("tokens_per_word"))
  }
}
