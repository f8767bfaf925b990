package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece (BERT-style, Wu et al. 2016 / the public HuggingFace
  * tokenizers semantics) GREEDY longest-match-first segmentation kernels —
  * the third of the big-3 subword families next to
  * [[graft.operators.Tokenizer]] (BPE) and [[graft.operators.UnigramLm]]
  * (unigram-LM), fused into one native expression call per row (the
  * [[PcmKernel]] / [[UnigramKernel]] discipline).
  *
  * Semantics (the published rule, replayed literally by the SQL oracles):
  * per word, repeatedly take the LONGEST vocabulary piece matching at the
  * current position — word-initial positions probe the initial-piece set,
  * later positions the continuation set (the `##`-prefixed half of a BERT
  * vocab); if NO piece matches at some position, the WHOLE word degrades
  * to the single `[UNK]` token (HuggingFace's all-or-nothing rule — a
  * half-tokenized word is worse than a clean unknown). Greedy is
  * positional and deterministic — no scores, no floats — so a bounded
  * vocabulary unrolls to an exact SQL CASE chain (the q313 oracle).
  */
object WordPieceKernel {

  val Unk = "[UNK]"

  /** HuggingFace's `max_input_chars_per_word`: a longer word degrades to
    * `[UNK]` without scanning — pathological mega-"words" (minified JS,
    * base64 blobs) would otherwise cost O(len · maxPieceLen) each and
    * diverge from real BERT tokenizers, which apply this exact cutoff. */
  val MaxWordLen = 100

  /** Greedy longest-match tokens of ONE word, `##`-prefixed continuations;
    * `[UNK]` alone if any position fails to match OR the word exceeds
    * `maxWordLen` (HF's all-or-nothing rules, both of them). The cutoff
    * counts CODE POINTS (`codePointCount`), matching HF's
    * `max_input_chars_per_word` on Python strings — a UTF-16 `.length`
    * would over-count astral-plane characters (emoji, rare CJK) and
    * diverge from real BERT tokenizers right at the boundary. */
  def greedy(w: String, vocab: WordPieceVocab, maxWordLen: Int = MaxWordLen): Array[String] = {
    if (w.codePointCount(0, w.length) > maxWordLen) return Array(Unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      var len = math.min(vocab.maxPieceLen, w.length - pos)
      var hit = 0
      while (len >= 1 && hit == 0) {
        if (vocab.contains(w, pos, pos + len, initial = pos == 0)) hit = len
        else len -= 1
      }
      if (hit == 0) return Array(Unk)
      out += (if (pos == 0) w.substring(0, hit) else "##" + w.substring(pos, pos + hit))
      pos += hit
    }
    out.toArray
  }

  /** Tokens over all words of `text` ([[UnigramKernel.words]]' locale-free
    * split), flattened in order; UNK words contribute the single
    * `[UNK]`. */
  def docTokens(text: String, vocab: WordPieceVocab): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    UnigramKernel.words(text).foreach(w => out ++= greedy(w, vocab))
    out.toArray
  }

  /** (n_tokens, n_unk_words, n_words) in one fused pass — the corpus-card
    * statistic (an UNK word counts as one token). */
  def docStats(text: String, vocab: WordPieceVocab): Array[Long] = {
    var tokens = 0L; var unk = 0L; var words = 0L
    UnigramKernel.words(text).foreach { w =>
      val t = greedy(w, vocab)
      tokens += t.length
      if (t.length == 1 && t(0) == Unk) unk += 1
      words += 1
    }
    Array(tokens, unk, words)
  }
}

/** Immutable WordPiece vocabulary riding the plan as ONE broadcast
  * reference object: an initial-piece set and a continuation-piece set
  * (continuations stored WITHOUT the `##` prefix — lookups probe raw
  * substrings). `maxPieceLen` bounds the greedy scan. */
final class WordPieceVocab(
    initialSet: java.util.HashSet[String],
    contSet: java.util.HashSet[String],
    val maxPieceLen: Int) extends Serializable {
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  def contains(w: String, from: Int, until: Int, initial: Boolean): Boolean = {
    val sub = w.substring(from, until)
    if (initial) initialSet.contains(sub) else contSet.contains(sub)
  }
}

object WordPieceVocab {
  /** Build from raw piece lists: `initial` as-is, `continuation` WITHOUT
    * the `##` prefix (pass `Seq("ab")` for the vocab entry `##ab`). */
  def apply(initial: Seq[String], continuation: Seq[String], maxPieceLen: Int): WordPieceVocab = {
    val i = new java.util.HashSet[String](initial.size * 2)
    val c = new java.util.HashSet[String](continuation.size * 2)
    (initial ++ continuation).foreach(p => require(
      p.nonEmpty && p.length <= maxPieceLen && !p.startsWith("##"),
      s"piece '$p' violates [1, $maxPieceLen] or carries the ## prefix (store raw)"))
    initial.foreach(i.add); continuation.foreach(c.add)
    new WordPieceVocab(i, c, maxPieceLen)
  }
}

/** Fused per-row WordPiece document statistics: string →
  * array<long>(n_tokens, n_unk_words, n_words). */
case class WordPieceStatsExpr(child: Expression, vocab: WordPieceVocab)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece_stats requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_stats"

  override def nullSafeEval(s: Any): Any =
    ArrayData.toArrayData(
      WordPieceKernel.docStats(s.asInstanceOf[UTF8String].toString, vocab))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("wpVocab", vocab, classOf[WordPieceVocab].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.WordPieceKernel.docStats($s.toString(), $vocabRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused WordPiece tokenization: string → array<string> of greedy tokens
  * (`##`-prefixed continuations, `[UNK]` for unmatchable words), all words
  * flattened in order. */
case class WordPieceTokensExpr(child: Expression, vocab: WordPieceVocab)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece_tokens requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_tokens"

  override def nullSafeEval(s: Any): Any = {
    val toks = WordPieceKernel.docTokens(s.asInstanceOf[UTF8String].toString, vocab)
    ArrayData.toArrayData(toks.map(UTF8String.fromString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("wpVocab", vocab, classOf[WordPieceVocab].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""String[] graftWp = graft.functions.WordPieceKernel.docTokens($s.toString(), $vocabRef);
         |org.apache.spark.unsafe.types.UTF8String[] graftWpU8 =
         |  new org.apache.spark.unsafe.types.UTF8String[graftWp.length];
         |for (int graftWpI = 0; graftWpI < graftWp.length; graftWpI++) {
         |  graftWpU8[graftWpI] = org.apache.spark.unsafe.types.UTF8String.fromString(graftWp[graftWpI]);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(graftWpU8);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column wrappers for the WordPiece expressions. */
object WordPieceExpressions {

  /** array<long>(n_tokens, n_unk_words, n_words) per document. */
  def wordPieceStats(text: Column, vocab: WordPieceVocab): Column =
    GraftShims.column(WordPieceStatsExpr(GraftShims.expression(text), vocab))

  /** array<string> of greedy longest-match tokens. */
  def wordPieceTokens(text: Column, vocab: WordPieceVocab): Column =
    GraftShims.column(WordPieceTokensExpr(GraftShims.expression(text), vocab))
}
