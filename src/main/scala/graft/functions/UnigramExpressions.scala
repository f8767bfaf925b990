package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style, Kudo 2018) segmentation kernels —
  * the per-document Viterbi DP behind [[graft.operators.UnigramLm]],
  * fused into one native expression call per row (the [[PcmKernel]]
  * lesson: a HOF formulation would evaluate its lambdas interpretively
  * per word/char and fall out of whole-stage codegen).
  *
  * Everything is ENGINE-EXACT integer math: piece scores are quantized
  * micro-log-probs (`floor(ln(p)·1e6)` as longs), the DP maximizes the
  * exact long score sum, ties break to the FEWEST tokens and then to the
  * LONGEST final piece — a total order, so every engine that replays the
  * same rule (the q295 oracle unrolls it positionally in SQL) lands on
  * the same (score, token-count) pair.
  */
object UnigramKernel {

  /** Split `text` into lowercased words exactly like
    * `split(lower(text), "[^a-z0-9]+")` with empties dropped, but
    * locale-free: ASCII A–Z map to a–z, [a-z0-9] are word chars, every
    * other char is a separator. (Unicode lowercasing never produces
    * ASCII here, matching the SQL oracles' `lower` + regex split on the
    * corpus's character classes.) */
  def words(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val lc =
        if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else c
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Viterbi DP over ONE word: fills `scoreOut(i)`/`tokOut(i)` for
    * prefixes of length i and returns the chosen piece length per
    * position in `lenOut` (for backtrace). Objective per prefix:
    * max score, then min tokens, then longest last piece. Single chars
    * absent from the vocabulary segment at `unkLp` (full coverage —
    * SentencePiece's character fallback). */
  private def dp(
      w: String,
      vocab: UnigramVocab,
      scoreOut: Array[Long],
      tokOut: Array[Int],
      lenOut: Array[Int]): Unit = {
    val n = w.length
    scoreOut(0) = 0L; tokOut(0) = 0
    var i = 1
    while (i <= n) {
      var bestS = Long.MinValue; var bestT = Int.MaxValue; var bestL = 0
      val maxL = math.min(vocab.maxPieceLen, i)
      var len = 1
      while (len <= maxL) {
        val lp =
          if (len == 1) {
            val single = vocab.lpOf(w, i - 1, i)
            if (single == UnigramVocab.Missing) vocab.unkLp else single
          } else vocab.lpOf(w, i - len, i)
        if (lp != UnigramVocab.Missing) {
          val s = scoreOut(i - len) + lp
          val t = tokOut(i - len) + 1
          if (s > bestS || (s == bestS && (t < bestT || (t == bestT && len > bestL)))) {
            bestS = s; bestT = t; bestL = len
          }
        }
        len += 1
      }
      scoreOut(i) = bestS; tokOut(i) = bestT; lenOut(i) = bestL
      i += 1
    }
  }

  /** (total_score, total_tokens, n_words) over all words of `text` in
    * one fused pass — the token-budget/corpus-card statistic. */
  def docStats(text: String, vocab: UnigramVocab): Array[Long] = {
    var score = 0L; var tokens = 0L; var nWords = 0L
    val ws = words(text)
    var wi = 0
    var cap = 16
    var scoreArr = new Array[Long](cap + 1)
    var tokArr = new Array[Int](cap + 1)
    var lenArr = new Array[Int](cap + 1)
    while (wi < ws.length) {
      val w = ws(wi)
      if (w.length > cap) {
        cap = w.length
        scoreArr = new Array[Long](cap + 1)
        tokArr = new Array[Int](cap + 1)
        lenArr = new Array[Int](cap + 1)
      }
      dp(w, vocab, scoreArr, tokArr, lenArr)
      score += scoreArr(w.length)
      tokens += tokArr(w.length)
      nWords += 1L
      wi += 1
    }
    Array(score, tokens, nWords)
  }

  /** One n-best candidate: exact score, token count, the rank KEY
    * (piece lengths newest-first as digit chars — compared DESCENDING,
    * so a longer final piece ranks first among score/token ties; keys
    * are compared only among equal token counts, hence equal length,
    * and two distinct segmentations of one word can never collide), and
    * the (prevRank, len) backpointer. The induced order is a monotone
    * prefix order (extending two candidates by the same piece preserves
    * their relative rank), so keeping top-n per position is exact. */
  private final case class NCand(score: Long, tokens: Int, key: String, prevRank: Int, len: Int)

  private val candOrd: Ordering[NCand] = new Ordering[NCand] {
    def compare(a: NCand, b: NCand): Int = {
      val s = java.lang.Long.compare(b.score, a.score)
      if (s != 0) s
      else {
        val t = Integer.compare(a.tokens, b.tokens)
        if (t != 0) t else b.key.compareTo(a.key)
      }
    }
  }

  /** The full n-best DP table over ONE word: position i holds the top-n
    * candidates for the length-i prefix, rank-ordered. */
  private def nbestTable(w: String, vocab: UnigramVocab, n: Int): Array[Array[NCand]] = {
    val table = new Array[Array[NCand]](w.length + 1)
    table(0) = Array(NCand(0L, 0, "", -1, 0))
    var i = 1
    while (i <= w.length) {
      val buf = scala.collection.mutable.ArrayBuffer.empty[NCand]
      val maxL = math.min(vocab.maxPieceLen, i)
      var len = 1
      while (len <= maxL) {
        val lp =
          if (len == 1) {
            val single = vocab.lpOf(w, i - 1, i)
            if (single == UnigramVocab.Missing) vocab.unkLp else single
          } else vocab.lpOf(w, i - len, i)
        if (lp != UnigramVocab.Missing) {
          val prevs = table(i - len)
          var r = 0
          while (r < prevs.length) {
            val p = prevs(r)
            buf += NCand(p.score + lp, p.tokens + 1, ('0' + len).toChar.toString + p.key, r, len)
            r += 1
          }
        }
        len += 1
      }
      table(i) = buf.sorted(candOrd).take(n).toArray
      i += 1
    }
    table
  }

  /** Rank-ordered n-best segmentations of ONE word (the input must
    * normalize to a single word — the word-frequency-table shape; zero
    * words → empty): flattened (score, tokens) pairs
    * [s1, t1, s2, t2, …], fewer than n pairs when the word has fewer
    * valid segmentations. */
  def wordNBest(text: String, vocab: UnigramVocab, n: Int): Array[Long] = {
    val ws = words(text)
    if (ws.length != 1) return Array.empty[Long]
    val table = nbestTable(ws(0), vocab, n)
    val last = table(ws(0).length)
    val out = new Array[Long](last.length * 2)
    var k = 0
    while (k < last.length) {
      out(2 * k) = last(k).score; out(2 * k + 1) = last(k).tokens.toLong
      k += 1
    }
    out
  }

  private def backtrace(
      w: String, table: Array[Array[NCand]], rank: Int,
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    val start = out.length
    var i = w.length
    var r = rank
    while (i > 0) {
      val c = table(i)(r)
      out += w.substring(i - c.len, i)
      r = c.prevRank
      i -= c.len
    }
    var a = start; var b = out.length - 1
    while (a < b) { val t = out(a); out(a) = out(b); out(b) = t; a += 1; b -= 1 }
  }

  /** SAMPLED segmentation stats — the deterministic subword-
    * regularization form (Kudo 2018 §3 with hash-based choice instead of
    * temperature randomness, so the augmentation is replayable and
    * oracle-checkable): per word, rank
    * `floorMod(keyHash(word, salt), numCandidates)` of the word's n-best
    * is used instead of rank 1. Returns (total_score, total_tokens,
    * n_words); salt varieties give distinct augmented epochs. */
  def docStatsSampled(text: String, vocab: UnigramVocab, n: Int, salt: String): Array[Long] = {
    var score = 0L; var tokens = 0L; var nWords = 0L
    val ws = words(text)
    var wi = 0
    while (wi < ws.length) {
      val w = ws(wi)
      val table = nbestTable(w, vocab, n)
      val last = table(w.length)
      val k = java.lang.Math.floorMod(
        graft.streaming.StreamingSrmMonitor.keyHashLong(w, salt), last.length.toLong).toInt
      score += last(k).score
      tokens += last(k).tokens.toLong
      nWords += 1L
      wi += 1
    }
    Array(score, tokens, nWords)
  }

  /** The sampled segmentation's pieces, words flattened in order —
    * [[docStatsSampled]]'s token-identity sibling. */
  def docTokensSampled(text: String, vocab: UnigramVocab, n: Int, salt: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val ws = words(text)
    var wi = 0
    while (wi < ws.length) {
      val w = ws(wi)
      val table = nbestTable(w, vocab, n)
      val k = java.lang.Math.floorMod(
        graft.streaming.StreamingSrmMonitor.keyHashLong(w, salt),
        table(w.length).length.toLong).toInt
      backtrace(w, table, k, out)
      wi += 1
    }
    out.toArray
  }

  /** The pieces of the optimal segmentation, words flattened in order —
    * the [[graft.operators.Tokenizer.bpeTokens]] parity surface and the
    * E-step workhorse (explode + count = expected piece counts under
    * hard EM). */
  def docTokens(text: String, vocab: UnigramVocab): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val ws = words(text)
    var wi = 0
    while (wi < ws.length) {
      val w = ws(wi)
      val scoreArr = new Array[Long](w.length + 1)
      val tokArr = new Array[Int](w.length + 1)
      val lenArr = new Array[Int](w.length + 1)
      dp(w, vocab, scoreArr, tokArr, lenArr)
      // backtrace, then reverse in place
      val start = out.length
      var i = w.length
      while (i > 0) {
        val l = lenArr(i)
        out += w.substring(i - l, i)
        i -= l
      }
      var a = start; var b = out.length - 1
      while (a < b) { val t = out(a); out(a) = out(b); out(b) = t; a += 1; b -= 1 }
      wi += 1
    }
    out.toArray
  }
}

/** Immutable piece→micro-log-prob table riding the plan as ONE broadcast
  * reference object (never per-row serialization): executors probe a
  * java.util.HashMap keyed by the piece string. `maxPieceLen` bounds the
  * DP's inner loop; `unkLp` is the single-char fallback score. */
final class UnigramVocab(
    pieces: java.util.HashMap[String, java.lang.Long],
    val unkLp: Long,
    val maxPieceLen: Int) extends Serializable {
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  def size: Int = pieces.size

  /** Micro-log-prob of `w.substring(from, until)`, or
    * [[UnigramVocab.Missing]]. Allocates the probe key once per call —
    * piece lengths are tiny (<= maxPieceLen). */
  def lpOf(w: String, from: Int, until: Int): Long = {
    val v = pieces.get(w.substring(from, until))
    if (v == null) UnigramVocab.Missing else v.longValue()
  }

  def lp(piece: String): Option[Long] = Option(pieces.get(piece)).map(_.longValue())
}

object UnigramVocab {
  /** Sentinel for "piece not in vocabulary" — below any real quantized
    * log-prob (ln quantized at 1e-6 of a prob > 0 exceeds this). */
  val Missing: Long = Long.MinValue

  def apply(entries: Seq[(String, Long)], unkLp: Long, maxPieceLen: Int): UnigramVocab = {
    val m = new java.util.HashMap[String, java.lang.Long](entries.size * 2)
    entries.foreach { case (p, lp) =>
      require(p.nonEmpty && p.length <= maxPieceLen,
        s"piece '$p' violates length bound [1, $maxPieceLen]")
      m.put(p, java.lang.Long.valueOf(lp))
    }
    new UnigramVocab(m, unkLp, maxPieceLen)
  }
}

/** Fused per-row unigram-LM document statistics: string →
  * array<long>(total_score_micro, total_tokens, n_words). One kernel
  * call per row inside WholeStageCodegen; the vocabulary rides as a
  * codegen reference object. */
case class UnigramDocStatsExpr(child: Expression, vocab: UnigramVocab)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_doc_stats requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unigram_doc_stats"

  override def nullSafeEval(s: Any): Any =
    ArrayData.toArrayData(
      UnigramKernel.docStats(s.asInstanceOf[UTF8String].toString, vocab))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab, classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.UnigramKernel.docStats($s.toString(), $vocabRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused unigram-LM tokenization: string → array<string> of the optimal
  * segmentation's pieces, all words flattened in order. */
case class UnigramTokensExpr(child: Expression, vocab: UnigramVocab)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_tokens requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_tokens"

  override def nullSafeEval(s: Any): Any = {
    val pieces = UnigramKernel.docTokens(s.asInstanceOf[UTF8String].toString, vocab)
    ArrayData.toArrayData(pieces.map(UTF8String.fromString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab, classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""String[] graftPieces = graft.functions.UnigramKernel.docTokens($s.toString(), $vocabRef);
         |org.apache.spark.unsafe.types.UTF8String[] graftU8 =
         |  new org.apache.spark.unsafe.types.UTF8String[graftPieces.length];
         |for (int graftI = 0; graftI < graftPieces.length; graftI++) {
         |  graftU8[graftI] = org.apache.spark.unsafe.types.UTF8String.fromString(graftPieces[graftI]);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(graftU8);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused n-best segmentation of a WORD column: string → array<long> of
  * flattened rank-ordered (score, tokens) pairs. */
case class UnigramNBestExpr(child: Expression, vocab: UnigramVocab, n: Int)
  extends UnaryExpression {
  require(n >= 1 && n <= 64, s"nBest out of [1,64]: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_nbest requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unigram_nbest"

  override def nullSafeEval(s: Any): Any =
    ArrayData.toArrayData(
      UnigramKernel.wordNBest(s.asInstanceOf[UTF8String].toString, vocab, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab, classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.UnigramKernel.wordNBest($s.toString(), $vocabRef, $n));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused sampled-segmentation stats (deterministic subword
  * regularization): string → array<long>(total_score, total_tokens,
  * n_words) under per-word hash-chosen n-best ranks. */
case class UnigramSampledStatsExpr(
    child: Expression, vocab: UnigramVocab, n: Int, salt: String)
  extends UnaryExpression {
  require(n >= 1 && n <= 64, s"nBest out of [1,64]: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_sampled_stats requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unigram_sampled_stats"

  override def nullSafeEval(s: Any): Any =
    ArrayData.toArrayData(
      UnigramKernel.docStatsSampled(s.asInstanceOf[UTF8String].toString, vocab, n, salt))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab, classOf[UnigramVocab].getName)
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.UnigramKernel.docStatsSampled($s.toString(), $vocabRef, $n, $saltRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column wrappers for the unigram expressions. */
object UnigramExpressions {

  /** array<long>(total_score_micro, total_tokens, n_words) per document. */
  def unigramDocStats(text: Column, vocab: UnigramVocab): Column =
    GraftShims.column(UnigramDocStatsExpr(GraftShims.expression(text), vocab))

  /** array<string> of the optimal segmentation's pieces. */
  def unigramTokens(text: Column, vocab: UnigramVocab): Column =
    GraftShims.column(UnigramTokensExpr(GraftShims.expression(text), vocab))

  /** Flattened rank-ordered (score, tokens) pairs of a word's n-best. */
  def unigramNBest(word: Column, vocab: UnigramVocab, n: Int): Column =
    GraftShims.column(UnigramNBestExpr(GraftShims.expression(word), vocab, n))

  /** array<long>(total_score, total_tokens, n_words) under hash-sampled
    * per-word n-best ranks (deterministic subword regularization). */
  def unigramSampledStats(text: Column, vocab: UnigramVocab, n: Int, salt: String): Column =
    GraftShims.column(UnigramSampledStatsExpr(GraftShims.expression(text), vocab, n, salt))
}
