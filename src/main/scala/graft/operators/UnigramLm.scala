package graft.operators

import graft.functions.{UnigramExpressions, UnigramKernel, UnigramVocab}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unigram-LM tokenizer TRAINING and APPLICATION — the SentencePiece-style
  * (Kudo 2018, "Subword Regularization") sibling of [[Tokenizer]]'s BPE:
  * instead of greedy merges, a piece vocabulary with per-piece log-probs,
  * applied by per-word Viterbi segmentation (max total log-prob). (The
  * reference has no tokenizer surface; this extends SURVEY §2.3's
  * training-data additions.)
  *
  * This implementation is the HARD-EM (Viterbi-EM) variant, chosen for
  * engine-exactness: the E-step assigns each word its single best
  * segmentation under the current scores (an exact integer DP over
  * quantized micro-log-probs — [[graft.functions.UnigramKernel]]), and
  * the M-step recounts pieces with exact long sums. No expectations, no
  * floats in any comparison — two engines replaying the same rule get
  * identical vocabularies, which is what makes the q294–q296 oracle
  * gates possible. (Soft-EM's forward-backward expectations are
  * summation-order-dependent doubles — unanchorable cross-engine.)
  *
  * Scale shape (the [[Tokenizer]] contract): statistics live on the
  * WORD-FREQUENCY table, never the corpus. [[Tokenizer.wordCounts]] is
  * the only corpus-scale pass; seeding and every EM iteration touch only
  * the vocabulary (Heaps-law-bounded). Two trainers share the contract:
  *
  *  - [[trainUnigram]] — all-Spark: the word-count table stays
  *    DISTRIBUTED; seeding is one substring-explode aggregation and each
  *    hard-EM iteration is one vocab-sized aggregation (segment via the
  *    fused [[graft.functions.UnigramTokensExpr]], explode, sum). Only
  *    the piece-count table (seed-size-bounded) reaches the driver per
  *    iteration. Use when the vocabulary cannot sit on the driver.
  *  - [[trainUnigramLocal]] — distributed word counting, then the EM
  *    loop runs on the COLLECTED vocabulary driver-side (guarded by
  *    `maxVocab`, the [[Tokenizer.trainBpeLocal]] precedent): thousands
  *    of iterations cost zero additional Spark jobs. Spec-pinned
  *    piece-for-piece identical to [[trainUnigram]].
  *
  * Application ([[docStats]] / [[tokens]] / [[tokenCount]]) is a pure
  * per-row fused-kernel projection — zero shuffle, stream-safe,
  * embarrassingly parallel at 100 TB.
  */
object UnigramLm {

  /** One trained piece: exact usage count and quantized micro-log-prob
    * `floor(ln(count/total)·1e6)`. */
  final case class UnigramPiece(piece: String, count: Long, lp_micro: Long)

  /** Default single-char fallback score: below any trained piece (a
    * count-1 piece in a 1e12-token corpus is ~−27.6e6), so unknown
    * characters never out-score vocabulary pieces. */
  val DefaultUnkLp: Long = -30000000L

  /** Quantized micro-log-prob of count/total: `floor(ln(c/t)·1e6)` —
    * computed in one double log then floored onto the integer grid, so
    * every downstream comparison is exact long math. */
  def lpMicro(count: Long, total: Long): Long = {
    require(count >= 1L && total >= count, s"bad count/total: $count/$total")
    math.floor((math.log(count.toDouble) - math.log(total.toDouble)) * 1e6).toLong
  }

  // ---------- seeding -------------------------------------------------

  /** Seed-candidate frequency table (piece, piece_count): every substring
    * of length 1..maxPieceLen of every vocabulary word, weighted by word
    * count. Vocab-scale work: one explode over the word-count table (a
    * word of length L yields <= L·maxPieceLen substrings), one keyed
    * aggregation — the corpus itself is scanned exactly once, inside
    * [[Tokenizer.wordCounts]]. */
  def seedCandidates(docs: DataFrame, textCol: String, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen out of [1,16]: $maxPieceLen")
    val wc = Tokenizer.wordCounts(docs, textCol)
    // positions 1..len(word); lengths 1..maxPieceLen clipped to the end
    wc.select(col("word"), col("word_count"),
        explode(sequence(lit(1), length(col("word")))).as("__pos"))
      .select(col("word"), col("word_count"), col("__pos"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("__pos") + 1))).as("__len"))
      .select(expr("substring(word, __pos, __len)").as("piece"), col("word_count"))
      .groupBy(col("piece"))
      .agg(sum(col("word_count")).as("piece_count"))
  }

  /** The top-`seedSize` seed pieces by (count desc, piece asc), with every
    * single character of the vocabulary FORCED in (SentencePiece's
    * character coverage — segmentation can never fail). Deterministic:
    * exact integer counts, total lexicographic tie-break. */
  def seedVocab(
      docs: DataFrame, textCol: String, maxPieceLen: Int, seedSize: Int): DataFrame = {
    require(seedSize >= 1, s"seedSize must be positive, got $seedSize")
    val cand = seedCandidates(docs, textCol, maxPieceLen)
    val top = cand.orderBy(col("piece_count").desc, col("piece")).limit(seedSize)
    val chars = cand.filter(length(col("piece")) === 1)
    top.unionByName(chars).groupBy(col("piece"))
      .agg(max(col("piece_count")).as("piece_count"))
  }

  // ---------- training -------------------------------------------------

  private def vocabOf(pieces: Seq[UnigramPiece], maxPieceLen: Int, unkLp: Long): UnigramVocab =
    UnigramVocab(pieces.map(p => (p.piece, p.lp_micro)), unkLp, maxPieceLen)

  private def rescore(counts: Map[String, Long]): Seq[UnigramPiece] = {
    val total = counts.valuesIterator.sum
    counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => UnigramPiece(p, c, lpMicro(c, total)) }
  }

  /** One hard-EM step over a (piece-count) state: segment every vocabulary
    * word under the current scores, recount piece usage weighted by word
    * count. Pieces that fall to zero usage are dropped UNLESS they are
    * single characters (coverage invariant: a char that every word
    * segments around keeps count 1 so its score exists). */
  private def emStep(
      words: Array[(String, Long)],
      pieces: Seq[UnigramPiece],
      maxPieceLen: Int,
      unkLp: Long): Seq[UnigramPiece] = {
    val vocab = vocabOf(pieces, maxPieceLen, unkLp)
    val counts = mutable.HashMap.empty[String, Long]
    words.foreach { case (w, wc) =>
      UnigramKernel.docTokens(w, vocab).foreach { p =>
        counts.update(p, counts.getOrElse(p, 0L) + wc)
      }
    }
    keepChars(counts, pieces)
  }

  private def keepChars(
      counts: mutable.HashMap[String, Long], prev: Seq[UnigramPiece]): Seq[UnigramPiece] = {
    prev.foreach { p =>
      if (p.piece.length == 1 && !counts.contains(p.piece)) counts.update(p.piece, 1L)
    }
    rescore(counts.toMap)
  }

  /** Prune to `vocabSize` pieces by (count desc, piece asc), single chars
    * always retained (they don't count against the budget shortfall —
    * coverage beats budget, SentencePiece's own rule). */
  private def prune(pieces: Seq[UnigramPiece], vocabSize: Int): Seq[UnigramPiece] = {
    val (chars, multi) = pieces.partition(_.piece.length == 1)
    val budget = math.max(0, vocabSize - chars.size)
    val kept = chars ++ multi.take(budget) // already (count desc, piece asc) ordered
    val total = kept.map(_.count).sum
    kept.map(p => p.copy(lp_micro = lpMicro(p.count, total)))
      .sortBy(p => (-p.count, p.piece))
  }

  /** One piece's likelihood-LOSS readout: `alt_micro` = the Viterbi score
    * of the piece's own string under the vocabulary WITH THE PIECE
    * REMOVED (for a string s, no segmentation of s into >1 pieces can use
    * s itself, so masking the vocab is exactly "best alternative
    * segmentation"; single chars fall to `unkLp`), and
    * `loss_micro = count · (lp − alt)` — SentencePiece's prune criterion
    * on the exact integer grid (the corpus log-likelihood drop if every
    * use of the piece re-segments its string the next-best way). Exact
    * while `count · |lp − alt| < 2^63` — at the 1e-6 grid that is
    * count·|Δlp| below ~9·10^18, i.e. any corpus under ~10^11 uses even
    * at the unk-floor gap. */
  final case class PieceLoss(
      piece: String, count: Long, lp_micro: Long, alt_micro: Long,
      loss_micro: Long, kept: Boolean)

  /** The per-piece loss table + keep decision at `vocabSize`: single
    * chars always kept (coverage); multi-char pieces ranked by
    * (loss desc, piece asc) — the highest-loss pieces are the ones whose
    * removal hurts most, so they survive. Vocab-bounded driver work (one
    * masked ≤maxPieceLen-char Viterbi per piece, zero Spark jobs). */
  def pieceLosses(
      pieces: Seq[UnigramPiece],
      vocabSize: Int,
      maxPieceLen: Int,
      unkLp: Long = DefaultUnkLp): Seq[PieceLoss] = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    val entries = pieces.map(p => (p.piece, p.lp_micro))
    val losses = pieces.map { p =>
      val masked = UnigramVocab(entries.filterNot(_._1 == p.piece), unkLp, maxPieceLen)
      val alt = UnigramKernel.docStats(p.piece, masked)(0)
      PieceLoss(p.piece, p.count, p.lp_micro, alt,
        p.count * (p.lp_micro - alt), kept = false)
    }
    val (chars, multi) = losses.partition(_.piece.length == 1)
    val budget = math.max(0, vocabSize - chars.size)
    val keptMulti = multi.sortBy(l => (-l.loss_micro, l.piece)).take(budget)
      .map(_.piece).toSet
    losses.map(l => l.copy(kept = l.piece.length == 1 || keptMulti(l.piece)))
      .sortBy(_.piece)
  }

  /** [[prune]]'s likelihood-loss sibling — keep the pieces whose removal
    * costs the corpus the most log-likelihood instead of the raw most-
    * counted (a high-count piece whose string re-segments almost as well
    * is cheap to drop; a mid-count piece with no good alternative is
    * not). Final scores re-quantized over the survivors. */
  def pruneByLoss(
      pieces: Seq[UnigramPiece],
      vocabSize: Int,
      maxPieceLen: Int,
      unkLp: Long = DefaultUnkLp): Seq[UnigramPiece] = {
    val kept = pieceLosses(pieces, vocabSize, maxPieceLen, unkLp)
      .filter(_.kept).map(_.piece).toSet
    val surv = pieces.filter(p => kept(p.piece))
    val total = surv.map(_.count).sum
    surv.map(p => p.copy(lp_micro = lpMicro(p.count, total)))
      .sortBy(p => (-p.count, p.piece))
  }

  /** Driver-side hard-EM trainer — the production path (the
    * [[Tokenizer.trainBpeLocal]] precedent): word counting is the
    * distributed [[Tokenizer.wordCounts]]; seeding, every EM iteration,
    * and pruning run on the collected vocabulary (guarded by `maxVocab`)
    * at zero Spark jobs each. Returns pieces ordered (count desc, piece
    * asc) with final quantized scores. */
  def trainUnigramLocal(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4,
      seedSize: Int = 4096,
      emIters: Int = 4,
      unkLp: Long = DefaultUnkLp,
      maxVocab: Int = 2000000,
      lossPrune: Boolean = false): Seq[UnigramPiece] = {
    require(vocabSize >= 1 && emIters >= 1, s"bad vocabSize=$vocabSize/emIters=$emIters")
    require(maxPieceLen >= 1 && maxPieceLen <= 16, s"maxPieceLen out of [1,16]: $maxPieceLen")
    val rows = Tokenizer.wordCounts(docs, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"trainUnigramLocal: vocabulary exceeds maxVocab=$maxVocab — train with " +
        "trainUnigram (distributed vocabulary) or raise the guard deliberately")
    val words = rows.map(r => (r.getString(0), r.getLong(1)))

    // seed: all substrings <= maxPieceLen weighted by word count,
    // top seedSize by (count desc, piece asc), single chars forced in
    val cand = mutable.HashMap.empty[String, Long]
    words.foreach { case (w, wc) =>
      var pos = 0
      while (pos < w.length) {
        var len = 1
        while (len <= maxPieceLen && pos + len <= w.length) {
          val p = w.substring(pos, pos + len)
          cand.update(p, cand.getOrElse(p, 0L) + wc)
          len += 1
        }
        pos += 1
      }
    }
    val ordered = cand.toSeq.sortBy { case (p, c) => (-c, p) }
    val seed = (ordered.take(seedSize) ++ ordered.filter(_._1.length == 1)).distinct
    var pieces = rescore(seed.toMap)

    var it = 0
    while (it < emIters) {
      pieces = emStep(words, pieces, maxPieceLen, unkLp)
      it += 1
    }
    if (lossPrune) pruneByLoss(pieces, vocabSize, maxPieceLen, unkLp)
    else prune(pieces, vocabSize)
  }

  /** All-Spark hard-EM trainer: the word-count table stays DISTRIBUTED and
    * persisted; seeding is [[seedVocab]]'s aggregation; each EM iteration
    * segments the vocabulary with the fused kernel and recounts pieces in
    * one explode + keyed aggregation — only the (seed-size-bounded) piece
    * counts reach the driver per iteration. Spec-pinned identical to
    * [[trainUnigramLocal]] (same seed rule, same DP, same tie-breaks,
    * same pruning). `emIters` caps low: one Spark job per iteration, the
    * [[Tokenizer.trainBpe]] trade-off. */
  def trainUnigram(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4,
      seedSize: Int = 4096,
      emIters: Int = 4,
      unkLp: Long = DefaultUnkLp,
      lossPrune: Boolean = false): Seq[UnigramPiece] = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    require(emIters >= 1 && emIters <= 16,
      s"trainUnigram runs one vocab aggregation per EM iteration — emIters=$emIters " +
        "out of [1,16]; for more iterations use trainUnigramLocal (driver loop)")
    val wc = Tokenizer.wordCounts(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seedRows = seedVocab(docs, textCol, maxPieceLen, seedSize)
        // seedVocab recounts over its own wordCounts plan; counts are
        // identical by determinism of the aggregation
        .collect()
      var pieces = rescore(seedRows.map(r => (r.getString(0), r.getLong(1))).toMap)
      var it = 0
      while (it < emIters) {
        val vocab = vocabOf(pieces, maxPieceLen, unkLp)
        val counted = wc
          .select(explode(UnigramExpressions.unigramTokens(col("word"), vocab)).as("piece"),
            col("word_count"))
          .groupBy(col("piece")).agg(sum(col("word_count")).as("cnt"))
          .collect()
        val counts = mutable.HashMap.empty[String, Long]
        counted.foreach(r => counts.update(r.getString(0), r.getLong(1)))
        pieces = keepChars(counts, pieces)
        it += 1
      }
      if (lossPrune) pruneByLoss(pieces, vocabSize, maxPieceLen, unkLp)
      else prune(pieces, vocabSize)
    } finally { wc.unpersist(false); () }
  }

  // ---------- application ----------------------------------------------

  /** Build the runtime vocabulary from trained pieces. */
  def vocab(pieces: Seq[UnigramPiece], maxPieceLen: Int, unkLp: Long = DefaultUnkLp): UnigramVocab =
    vocabOf(pieces, maxPieceLen, unkLp)

  /** Fixed-score vocabulary from (piece, micro-log-prob) literals — the
    * oracle-gate form (q294/q295) and the "bring your own SentencePiece
    * model" entry point. */
  def fixedVocab(entries: Seq[(String, Long)], maxPieceLen: Int, unkLp: Long = DefaultUnkLp): UnigramVocab =
    UnigramVocab(entries, unkLp, maxPieceLen)

  /** struct-free stats array: (total_score_micro, total_tokens, n_words). */
  def docStats(text: Column, v: UnigramVocab): Column =
    UnigramExpressions.unigramDocStats(text, v)

  /** Optimal-segmentation pieces, words flattened in order. */
  def tokens(text: Column, v: UnigramVocab): Column =
    UnigramExpressions.unigramTokens(text, v)

  /** Token count under the vocabulary (0 for empty/no-word documents). */
  def tokenCount(text: Column, v: UnigramVocab): Column =
    element_at(UnigramExpressions.unigramDocStats(text, v), 2)

  /** Rank-ordered n-best segmentations of a WORD column — flattened
    * (score, tokens) pairs, rank order (score desc, tokens asc, longest-
    * final-piece): the word-level table behind subword-regularization
    * sampling and n-best E-steps. Input is the word-frequency-table
    * shape (one word per row). */
  def nBest(word: Column, v: UnigramVocab, n: Int): Column =
    UnigramExpressions.unigramNBest(word, v, n)

  /** SAMPLED-segmentation stats — deterministic subword regularization
    * (Kudo 2018 §3): per word the hash-chosen rank
    * `floorMod(keyHash(word, salt), numCandidates)` of its n-best is
    * used, so one corpus yields distinct replayable augmented epochs per
    * salt while staying oracle-checkable. array<long>(total_score_micro,
    * total_tokens, n_words). */
  def sampledStats(text: Column, v: UnigramVocab, n: Int, salt: String): Column =
    UnigramExpressions.unigramSampledStats(text, v, n, salt)

  /** Token count under the sampled segmentation. */
  def sampledTokenCount(text: Column, v: UnigramVocab, n: Int, salt: String): Column =
    element_at(UnigramExpressions.unigramSampledStats(text, v, n, salt), 2)

  /** Vocabulary-TRANSFER data card — the domain-shift readout when an
    * existing vocabulary is applied to a NEW corpus (the first question
    * before reusing a tokenizer across domains): per group, document /
    * word / token / score totals and tokens-per-word (fragmentation —
    * it rises sharply on out-of-domain text as the DP falls back to
    * chars). Every total is an exact long sum off the fused
    * [[docStats]] kernel; the ratio is ONE division of two exact sums
    * (the [[Tokenizer.compressionCard]] rule). One scan + one
    * |groups|-row aggregation — zero extra shuffles at any scale. */
  def transferCard(
      df: DataFrame, textCol: String, groupCol: String, v: UnigramVocab): DataFrame =
    df.select(col(groupCol),
        docStats(coalesce(col(textCol), lit("")), v).as("__s"))
      .select(col(groupCol),
        element_at(col("__s"), 1).as("__score"),
        element_at(col("__s"), 2).as("__tok"),
        element_at(col("__s"), 3).as("__w"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__w")).as("total_words"),
        sum(col("__tok")).as("total_tokens"),
        sum(col("__score")).as("total_score_micro"),
        round(sum(col("__tok")).cast("double")
          / sum(col("__w")).cast("double"), 4).as("tokens_per_word"))
}
