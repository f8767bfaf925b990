package graft.operators

import graft.functions.{WordPieceExpressions, WordPieceKernel, WordPieceVocab}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** WordPiece tokenizer TRAINING and APPLICATION — the BERT-family
  * (Wu et al. 2016; the public HuggingFace tokenizers semantics) third
  * member of the subword trio next to [[Tokenizer]] (BPE) and
  * [[UnigramLm]] (unigram-LM). Training is BPE-shaped — greedy merges
  * over the word-frequency table — but the merge CRITERION is the
  * likelihood ratio `count(l,r) / (count(l) · count(r))` (merge the pair
  * whose co-occurrence most exceeds what its parts predict), and symbols
  * carry BERT's `##` continuation marking from the start: "low" seeds as
  * `l, ##o, ##w`, and merging `l + ##o → lo`, `##o + ##w → ##ow`.
  *
  * Engine-exactness: the ratio is quantized onto an integer grid —
  * `score_e12 = ⌊pair_count · 10¹² / (l_count · r_count)⌋`, every factor
  * an exact long — computed as integer division of exact products (BigInt
  * on the driver, DECIMAL(38,0) `div` in Spark, HUGEINT `//` in the
  * DuckDB oracle), ties broken (score desc, l_sym asc, r_sym asc). No
  * float touches any comparison, so two engines replaying the rule learn
  * identical merge tables (the q314 gate).
  *
  * Scale shape (the [[Tokenizer]] contract): statistics live on the
  * word-frequency table — [[Tokenizer.wordCounts]] is the only
  * corpus-scale pass; each merge iteration touches the Heaps-law-bounded
  * vocabulary. Application ([[tokens]] / [[docStats]]) is a pure per-row
  * fused-kernel projection — zero shuffle, stream-safe.
  */
object WordPiece {

  /** One trained merge: the chosen pair, its merged symbol, the exact
    * counts behind the ratio, and the quantized score. */
  final case class WpMerge(
      iter: Int, l_sym: String, r_sym: String, merged: String,
      pair_count: Long, l_count: Long, r_count: Long, score_e12: Long)

  /** `low` → `|l||##o||##w|` — BERT's continuation marking, piped (symbols
    * never contain `|`, so the pair (l,r) occurs as the literal substring
    * `|l||r|` IFF adjacent — the [[Tokenizer]] representation rule). */
  private def wrapped(wordCol: Column): Column =
    when(length(wordCol) <= 1, concat(lit("|"), wordCol, lit("|")))
      .otherwise(concat(
        lit("|"), substring(wordCol, 1, 1), lit("|"),
        regexp_replace(wordCol.substr(lit(2), length(wordCol)), "(.)", "|##$1|")))

  /** Adjacent-pair counts over a (__rep, __wc) vocabulary frame. */
  private def pairCounts(rep: DataFrame): DataFrame =
    rep.select(split(expr("trim(BOTH '|' FROM __rep)"), "\\|\\|").as("__t"), col("__wc"))
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("l"),
          element_at(col("__t"), i + 2).as("r")))).as("__p"), col("__wc"))
      .groupBy(col("__p.l").as("l_sym"), col("__p.r").as("r_sym"))
      .agg(sum(col("__wc")).as("pair_count"))

  /** Symbol-occurrence counts over the same frame (every position,
    * weighted by word count) — the ratio's denominator terms. */
  private def symCounts(rep: DataFrame): DataFrame =
    rep.select(explode(split(expr("trim(BOTH '|' FROM __rep)"), "\\|\\|")).as("sym"),
        col("__wc"))
      .groupBy(col("sym")).agg(sum(col("__wc")).as("sym_count"))

  /** WordPiece's merged symbol: the right side always carries `##` inside
    * a word; merging strips it and keeps the left side's marking. */
  private def mergedOf(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** All-Spark WordPiece training: the word-count table stays DISTRIBUTED
    * (persisted, corpus never rescanned); each merge is two vocab-sized
    * aggregations (pairs + symbols) and a 1-row argmax collect. The
    * quantized-ratio argmax runs in DECIMAL(38,0) integer division —
    * exact at any corpus size (a long·long product can overflow at
    * trillion-token scale; decimal128 cannot here: numerator ≤ count·10¹²
    * and denominator ≥ 1 both sit inside 38 digits for any corpus under
    * 10²⁶ tokens). Stops early if no adjacent pairs remain. */
  def trainWordPiece(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 512,
      s"trainWordPiece runs two vocab aggregations per merge — merges=$merges out of [1,512]; " +
        "for real merge counts use trainWordPieceLocal (driver merge loop)")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = Tokenizer.wordCounts(docs, textCol)
      .select(wrapped(col("word")).as("__rep"), col("word_count").as("__wc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val out = mutable.ArrayBuffer.empty[WpMerge]
      var rep = vocab
      var exhausted = false
      var i = 1
      while (i <= merges && !exhausted) {
        val sc = symCounts(rep)
        val best = pairCounts(rep).alias("p")
          .join(sc.alias("sl"), col("p.l_sym") === col("sl.sym"))
          .join(sc.alias("sr"), col("p.r_sym") === col("sr.sym"))
          .select(col("p.l_sym"), col("p.r_sym"), col("p.pair_count"),
            col("sl.sym_count").as("l_count"), col("sr.sym_count").as("r_count"),
            expr("""(CAST(pair_count AS DECIMAL(38,0)) * 1000000000000)
                   | div (CAST(sl.sym_count AS DECIMAL(38,0))
                   |      * CAST(sr.sym_count AS DECIMAL(38,0)))""".stripMargin)
              .as("score_e12"))
          .orderBy(col("score_e12").desc, col("l_sym"), col("r_sym"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val b = best(0)
          val (l, r) = (b.getString(0), b.getString(1))
          out += WpMerge(i, l, r, mergedOf(l, r),
            b.getLong(2), b.getLong(3), b.getLong(4), b.getLong(5))
          rep = rep.select(
            replace(col("__rep"), lit(s"|$l||$r|"), lit(s"|${mergedOf(l, r)}|")).as("__rep"),
            col("__wc"))
        }
        i += 1
      }
      out.toSeq.toDF()
    } finally { vocab.unpersist(false); () }
  }

  /** Driver-side merge loop over the collected vocabulary — the
    * production trainer for real merge counts (the
    * [[Tokenizer.trainBpeLocal]] precedent, `maxVocab`-guarded). The
    * ratio argmax compares exact BigInt quotients of the SAME quantized
    * rule — spec-pinned merge-for-merge identical to [[trainWordPiece]]. */
  def trainWordPieceLocal(
      docs: DataFrame, textCol: String, merges: Int, maxVocab: Int = 2000000): Seq[WpMerge] = {
    require(merges >= 1, s"merges must be positive, got $merges")
    val rows = Tokenizer.wordCounts(docs, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"trainWordPieceLocal: vocabulary exceeds maxVocab=$maxVocab — train with " +
        "trainWordPiece (distributed vocabulary) or raise the guard deliberately")
    val vocab = rows.map { r =>
      val w = r.getString(0)
      val syms = w.substring(0, 1) +: w.substring(1).map(c => "##" + c)
      (syms.toArray, r.getLong(1))
    }
    val grid = BigInt(1000000000000L)
    val out = mutable.ArrayBuffer.empty[WpMerge]
    var exhausted = false
    var i = 1
    while (i <= merges && !exhausted) {
      val pairs = mutable.HashMap.empty[(String, String), Long]
      val syms = mutable.HashMap.empty[String, Long]
      vocab.foreach { case (ss, wc) =>
        var j = 0
        while (j < ss.length) {
          syms.update(ss(j), syms.getOrElse(ss(j), 0L) + wc)
          if (j < ss.length - 1) {
            val k = (ss(j), ss(j + 1))
            pairs.update(k, pairs.getOrElse(k, 0L) + wc)
          }
          j += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val scored = pairs.toSeq.map { case ((l, r), c) =>
          val s = (BigInt(c) * grid / (BigInt(syms(l)) * BigInt(syms(r)))).toLong
          (l, r, c, syms(l), syms(r), s)
        }
        val (l, r, c, lc, rc, s) = scored.minBy { case (l, r, _, _, _, s) => (-s, l, r) }
        out += WpMerge(i, l, r, mergedOf(l, r), c, lc, rc, s)
        var w = 0
        while (w < vocab.length) {
          val ss = vocab(w)._1
          if (ss.length >= 2) {
            val b = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < ss.length) {
              if (j < ss.length - 1 && ss(j) == l && ss(j + 1) == r) {
                b += mergedOf(l, r); j += 2 // left-to-right non-overlapping
              } else { b += ss(j); j += 1 }
            }
            if (b.length != ss.length) vocab(w) = (b.toArray, vocab(w)._2)
          }
          w += 1
        }
      }
      i += 1
    }
    out.toSeq
  }

  // ---------- application ----------------------------------------------

  /** Fixed-piece vocabulary — the oracle-gate form and the "bring your
    * own BERT vocab" entry point. `continuation` entries are passed RAW
    * (pass "ab" for the vocab entry "##ab"). */
  def fixedVocab(
      initial: Seq[String], continuation: Seq[String], maxPieceLen: Int): WordPieceVocab =
    WordPieceVocab(initial, continuation, maxPieceLen)

  /** Runtime vocabulary from a trained merge table + the corpus alphabet
    * (single characters land in BOTH sets — BERT vocabs carry `x` and
    * `##x`): merged symbols route to initial/continuation by their `##`
    * marking. */
  def vocabOfMerges(merges: Seq[WpMerge], alphabet: Seq[String]): WordPieceVocab = {
    val ms = merges.map(_.merged)
    val init = alphabet ++ ms.filterNot(_.startsWith("##"))
    val cont = alphabet ++ ms.collect { case m if m.startsWith("##") => m.substring(2) }
    val maxLen = (init ++ cont).map(_.length).max
    WordPieceVocab(init.distinct, cont.distinct, maxLen)
  }

  /** Greedy longest-match tokens (`##`-marked continuations, `[UNK]` for
    * unmatchable words), words flattened in order — one fused kernel call
    * per row. */
  def tokens(text: Column, v: WordPieceVocab): Column =
    WordPieceExpressions.wordPieceTokens(text, v)

  /** struct-free stats array: (n_tokens, n_unk_words, n_words). */
  def docStats(text: Column, v: WordPieceVocab): Column =
    WordPieceExpressions.wordPieceStats(text, v)

  /** Token count under the vocabulary (0 for empty/no-word documents;
    * UNK words count 1). */
  def tokenCount(text: Column, v: WordPieceVocab): Column =
    element_at(WordPieceExpressions.wordPieceStats(text, v), 1)

  /** The local greedy segmentation — the spec-parity surface mirroring
    * [[graft.functions.WordPieceKernel.greedy]] for driver-side checks. */
  def greedyLocal(word: String, v: WordPieceVocab): Seq[String] =
    WordPieceKernel.greedy(word, v).toSeq

  /** Vocabulary-COVERAGE data card — the first question before reusing a
    * BERT-family tokenizer on a new corpus: per group, document / word /
    * token / UNK totals and the UNK rate (it spikes on out-of-alphabet
    * text, where [[UnigramLm.transferCard]]'s fragmentation ratio would
    * merely creep). Every total is an exact long sum off the fused
    * [[docStats]] kernel; the rate is ONE division of two exact sums
    * (the [[Tokenizer.compressionCard]] rule). One scan + one
    * |groups|-row aggregation — zero extra shuffle at any scale. */
  def coverageCard(
      df: DataFrame, textCol: String, groupCol: String, v: WordPieceVocab): DataFrame =
    df.select(col(groupCol),
        docStats(coalesce(col(textCol), lit("")), v).as("__s"))
      .select(col(groupCol),
        element_at(col("__s"), 1).as("__tok"),
        element_at(col("__s"), 2).as("__unk"),
        element_at(col("__s"), 3).as("__w"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__w")).as("total_words"),
        sum(col("__tok")).as("total_tokens"),
        sum(col("__unk")).as("total_unk_words"),
        round(sum(col("__unk")).cast("double")
          / sum(col("__w")).cast("double"), 4).as("unk_rate"))
}
