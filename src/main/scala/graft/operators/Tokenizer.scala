package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Byte-pair-encoding (BPE) tokenizer TRAINING and APPLICATION — the
  * vocabulary-building step every LLM data pipeline runs before token
  * budgeting, packing, or dedup-by-token-window can be trusted. (The
  * reference has no tokenizer surface; this extends the training-data
  * additions of SURVEY §2.3. Algorithm: Sennrich et al. 2016, the public
  * subword-nmt merge rule.)
  *
  * Scale shape — the part that matters at 100 TB: BPE statistics live on
  * the WORD-FREQUENCY table, not the corpus. [[wordCounts]] is the only
  * corpus-scale pass (one explode + one keyed shuffle, map-side combined);
  * by Heaps' law the resulting vocabulary is orders of magnitude smaller
  * than the corpus (~millions of rows for web-scale text), and every merge
  * iteration after that touches only the vocabulary. Two trainers share
  * that contract:
  *
  *  - [[trainBpe]] — all-Spark: the vocabulary table stays DISTRIBUTED
  *    (persisted MEMORY_AND_DISK, corpus never rescanned) and each merge
  *    is one vocab-sized aggregation; only the argmax pair row reaches the
  *    driver per iteration (TakeOrdered, no global sort). Use when the
  *    vocabulary itself is too big to collect, or when you want the
  *    engine-exact oracle-checkable form (q100).
  *  - [[trainBpeLocal]] — distributed word counting, then the merge loop
  *    runs on the COLLECTED vocabulary driver-side (guarded by
  *    `maxVocab`, the collectBigramModel precedent): thousands of merges
  *    cost zero additional Spark jobs. This is the production path for
  *    real merge counts (30k+), where one job per merge would dominate;
  *    spec-pinned merge-for-merge identical to [[trainBpe]].
  *
  * Token representation: a word is rendered with every symbol wrapped in
  * pipes — "low" → `|l||o||w|` — so the pair (l,r) occurs as the literal
  * substring `|l||r|` IFF tokens l,r are adjacent (symbols never contain
  * `|`; the pattern's interior `||` can only align to a token boundary,
  * forcing l and r to match whole tokens). Merging is then a plain
  * left-to-right non-overlapping string replace — exactly BPE's greedy
  * merge order, identical in Spark (`functions.replace`) and ANSI SQL
  * `replace`, so application is a pure codegen'd projection with no UDF.
  * Ties in pair counts break lexicographically (counts are exact longs —
  * no cross-engine float hazard anywhere in training).
  */
object Tokenizer {

  /** Word separator shared by trainers, applier, and the SQL oracles. */
  val wordSepRegex = "[^a-z0-9]+"

  /** Lowercased words of a text column, empties dropped. */
  def words(textCol: Column): Column =
    filter(split(lower(textCol), wordSepRegex), w => length(w) > 0)

  /** The ONLY corpus-scale pass: word-frequency table (word, word_count).
    * One explode + one keyed aggregation (map-side combined). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    Dedup.withComputeParallelism(docs.select(explode(words(col(textCol))).as("word")))
      .groupBy(col("word")).agg(count(lit(1)).as("word_count"))

  /** `low` → `|l||o||w|` — every symbol wrapped in pipes. */
  private def wrapped(wordCol: Column): Column =
    regexp_replace(wordCol, "(.)", "|$1|")

  private def tokensOfRep(rep: Column): Column =
    split(trim(rep, "|"), "\\|\\|")

  /** Adjacent-pair counts over a (__rep, __wc) vocabulary frame. */
  private def pairCounts(rep: DataFrame): DataFrame =
    rep.select(tokensOfRep(col("__rep")).as("__t"), col("__wc"))
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("l"),
          element_at(col("__t"), i + 2).as("r")))).as("__p"), col("__wc"))
      .groupBy(col("__p.l").as("l_sym"), col("__p.r").as("r_sym"))
      .agg(sum(col("__wc")).as("pair_count"))

  final case class BpeMerge(iter: Int, l_sym: String, r_sym: String, merged: String, pair_count: Long)

  /** All-Spark BPE training: returns the merge table
    * (iter, l_sym, r_sym, merged, pair_count) in training order. Stops
    * early if the vocabulary runs out of adjacent pairs. The vocabulary
    * representation evolves as a fold of `replace` projections over the
    * persisted word-count table — lineage depth grows with `merges`, which
    * is why this form caps at 512 (beyond that, [[trainBpeLocal]] is both
    * the faster and the intended path). */
  def trainBpe(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 512,
      s"trainBpe runs one vocab aggregation per merge — merges=$merges out of [1,512]; " +
        "for real merge counts use trainBpeLocal (driver merge loop, zero jobs per merge)")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = wordCounts(docs, textCol)
      .select(wrapped(col("word")).as("__rep"), col("word_count").as("__wc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val out = mutable.ArrayBuffer.empty[BpeMerge]
      var rep = vocab
      var exhausted = false
      var i = 1
      while (i <= merges && !exhausted) {
        val best = pairCounts(rep)
          .orderBy(col("pair_count").desc, col("l_sym"), col("r_sym"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          out += BpeMerge(i, l, r, l + r, c)
          rep = rep.select(
            replace(col("__rep"), lit(s"|$l||$r|"), lit(s"|$l$r|")).as("__rep"), col("__wc"))
        }
        i += 1
      }
      out.toSeq.toDF()
    } finally { vocab.unpersist(false); () }
  }

  /** Driver-side merge loop over the collected vocabulary — the production
    * trainer for real merge counts. Word counting is still the distributed
    * [[wordCounts]]; `maxVocab` fails loudly before a corpus whose
    * vocabulary cannot sit on the driver silently OOMs (such a corpus
    * should train through [[trainBpe]] or on a sampled slice). Identical
    * merges to [[trainBpe]] by construction (same greedy argmax, same
    * lexicographic tie-break, same left-to-right application). */
  def trainBpeLocal(
      docs: DataFrame, textCol: String, merges: Int, maxVocab: Int = 2000000): Seq[BpeMerge] = {
    require(merges >= 1, s"merges must be positive, got $merges")
    val rows = wordCounts(docs, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"trainBpeLocal: vocabulary exceeds maxVocab=$maxVocab — train with trainBpe " +
        "(distributed vocabulary) or raise the guard deliberately")
    val vocab = rows.map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val out = mutable.ArrayBuffer.empty[BpeMerge]
    var exhausted = false
    var i = 1
    while (i <= merges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, wc) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + wc); j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += BpeMerge(i, l, r, l + r, c)
        var w = 0
        while (w < vocab.length) {
          val syms = vocab(w)._1
          if (syms.length >= 2) {
            val b = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                b += l + r; j += 2 // left-to-right non-overlapping, as replace()
              } else { b += syms(j); j += 1 }
            }
            if (b.length != syms.length) vocab(w) = (b.toArray, vocab(w)._2)
          }
          w += 1
        }
      }
      i += 1
    }
    out.toSeq
  }

  /** Collect a [[trainBpe]] result into the (l, r) merge list applier form,
    * in training order. Merge tables are merges-sized — driver-safe. */
  def mergesOf(trained: DataFrame): Seq[(String, String)] =
    trained.orderBy(col("iter")).collect().map(r => (r.getString(1), r.getString(2))).toSeq

  /** Subword tokens of a text column under a learned merge list: per
    * word, the merges apply in training order, each as one left-to-right
    * non-overlapping pass, then words flatten in order. Since r15 this
    * is the fused native [[graft.functions.BpeTokensExpr]] kernel — ONE
    * call per row inside WholeStageCodegen (the HOF fold it replaces
    * evaluated a regexp wrap + an interpreted replace chain per word;
    * spec-pinned token-for-token identical, and q100/q101/q123/q305's
    * oracles pin the semantics cross-engine). Stream-safe, no UDF, no
    * state. The 512 cap bounds the per-word sequential merge scan;
    * tokenizer runtimes with full 30k+ vocabularies belong in a
    * broadcast-ranks encoder, not a sequential merge list. */
  def bpeTokens(textCol: Column, merges: Seq[(String, String)]): Column = {
    require(merges.size <= 512,
      s"bpeTokens scans one merge pass per word per merge — ${merges.size} exceeds 512")
    graft.functions.BpeExpressions.bpeTokens(textCol, merges)
  }

  /** The pre-r15 HOF formulation of [[bpeTokens]] (pipe-wrapped replace
    * fold) — retained as the independent reference the parity spec pins
    * the fused kernel against. */
  private[operators] def bpeTokensHof(textCol: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(words(textCol), w => {
      val rep = merges.foldLeft(wrapped(w)) { case (c, (l, r)) =>
        replace(c, lit(s"|$l||$r|"), lit(s"|$l$r|"))
      }
      tokensOfRep(rep)
    }))

  /** `size(bpeTokens)` with an empty-document guard (0, not size(null)). */
  def bpeTokenCount(textCol: Column, merges: Seq[(String, String)]): Column =
    coalesce(size(bpeTokens(textCol, merges)), lit(0))

  /** BPE-DROPOUT application (Provilkov et al. 2020, "BPE-Dropout:
    * Simple and Effective Subword Regularization") — the BPE sibling of
    * [[UnigramLm.sampledStats]]'s deterministic subword regularization:
    * merge `i` is SKIPPED for word `w` iff
    * `keyHash(w ++ "#" ++ i, salt) mod 1e6 < dropMicro`, so one corpus
    * yields distinct REPLAYABLE augmented segmentations per salt (one
    * salt per epoch) while staying oracle-checkable (the same md5 60-bit
    * keyHash grid as [[Sampling.hashSplit]], mirrored in SQL). Dropout
    * is decided per (word, merge) — coarser than Provilkov's
    * per-occurrence coin, but the occurrence-level form cannot be a
    * deterministic pure projection (occurrence positions shift as
    * earlier merges land), and the word-level form preserves the paper's
    * property that dropped merges expose finer subwords. `dropMicro = 0`
    * degrades to [[bpeTokens]] exactly. Since r15 the fused native
    * kernel ([[graft.functions.BpeTokensExpr]] with the dropout leg —
    * one keyHash per (word, merge), the same md5 grid as the Column
    * form, spec-pinned identical); still zero shuffle, stream-safe. */
  def bpeDropoutTokens(
      textCol: Column,
      merges: Seq[(String, String)],
      dropMicro: Int,
      salt: String): Column = {
    require(merges.size <= 512,
      s"bpeDropoutTokens scans one merge pass per word per merge — ${merges.size} exceeds 512")
    require(dropMicro >= 0 && dropMicro <= 1000000,
      s"dropMicro is a probability on the 1e-6 grid, got $dropMicro")
    graft.functions.BpeExpressions.bpeTokens(textCol, merges, dropMicro, salt)
  }

  /** The HOF formulation of [[bpeDropoutTokens]] (conditional replace
    * fold over the Column keyHash) — the parity-spec reference. */
  private[operators] def bpeDropoutTokensHof(
      textCol: Column,
      merges: Seq[(String, String)],
      dropMicro: Int,
      salt: String): Column =
    flatten(transform(words(textCol), w => {
      val rep = merges.zipWithIndex.foldLeft(wrapped(w)) { case (c, ((l, r), i)) =>
        when(
          Sampling.keyHash(concat(w, lit(s"#$i")), salt) % 1000000L >= dropMicro.toLong,
          replace(c, lit(s"|$l||$r|"), lit(s"|$l$r|"))).otherwise(c)
      }
      tokensOfRep(rep)
    }))

  /** `size(bpeDropoutTokens)` with the empty-document guard. */
  def bpeDropoutTokenCount(
      textCol: Column, merges: Seq[(String, String)], dropMicro: Int, salt: String): Column =
    coalesce(size(bpeDropoutTokens(textCol, merges, dropMicro, salt)), lit(0))

  /** Per-group tokenizer DATA CARD — the compression summary a corpus
    * ships with once a tokenizer is chosen: document count, total chars,
    * total whitespace tokens, total subword tokens under the learned merge
    * list, and chars-per-subword-token (the compression ratio training-cost
    * estimates run on). Every ratio is ONE division of two exact integer
    * sums ([[graft.operators.TextAnalysis.corpusStats]]'s rule — an
    * average of per-doc doubles would be summation-order-dependent), so
    * the card is engine-exact. One scan + one |groups|-row aggregation.
    */
  def compressionCard(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      merges: Seq[(String, String)]
  ): DataFrame =
    df.select(
        col(groupCol),
        length(col(textCol)).as("__chars"),
        size(split(col(textCol), " ")).as("__ws"),
        bpeTokenCount(col(textCol), merges).as("__bpe"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__chars").cast("long")).as("total_chars"),
        sum(col("__ws").cast("long")).as("total_ws_tokens"),
        sum(col("__bpe").cast("long")).as("total_bpe_tokens"),
        round(sum(col("__chars").cast("long")).cast("double") /
          sum(col("__bpe").cast("long")).cast("double"), 4).as("chars_per_token"))
}
