package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE application kernel — the native twin of
  * [[graft.operators.Tokenizer.bpeTokens]]'s expression fold (the
  * [[PcmKernel]] lesson applied to text: the HOF form evaluates one
  * `regexp_replace` + one interpreted `replace` chain PER WORD outside
  * whole-stage codegen, and q305's two tokenization passes measured
  * ~7 s at sf0.1 where one fused call per row is several times
  * cheaper). Semantics are BIT-IDENTICAL to the pipe-wrapped replace
  * fold: merges apply in training order, each as ONE left-to-right
  * non-overlapping pass over the word's symbol array — exactly what
  * `replace("|l||r|" → "|lr|")` does on the wrapped string, and exactly
  * [[graft.operators.Tokenizer.trainBpeLocal]]'s array merge
  * (spec-pinned token-for-token against the HOF form on real text).
  *
  * Dropout: when `dropMicro > 0`, merge `i` is SKIPPED for word `w` iff
  * `keyHash(w ++ "#" ++ i, salt) mod 1e6 < dropMicro` — the same md5
  * 60-bit grid as the Column form ([[graft.streaming.StreamingSrmMonitor.keyHashLong]]
  * ≡ `Sampling.keyHash`, spec-pinned), so the fused and HOF dropout
  * paths agree byte for byte. Cost note: dropout hashes once per
  * (word, merge) — fine for the fold-sized merge lists this API caps at
  * (512); a 30k-merge production encoder belongs in a rank-based
  * broadcast structure, not either of these forms.
  */
object BpeKernel {

  /** Words of `text` (the [[UnigramKernel.words]] split), each segmented
    * by the merge list, flattened in order. `ls`/`rs` are the merge
    * pairs in training order. */
  def docTokens(
      text: String,
      ls: Array[String],
      rs: Array[String],
      dropMicro: Int,
      salt: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val ws = UnigramKernel.words(text)
    var wi = 0
    while (wi < ws.length) {
      val w = ws(wi)
      var syms = new Array[String](w.length)
      var k = 0
      while (k < w.length) { syms(k) = String.valueOf(w.charAt(k)); k += 1 }
      var n = syms.length
      var i = 0
      while (i < ls.length && n >= 2) {
        val apply =
          dropMicro == 0 ||
            java.lang.Math.floorMod(
              graft.streaming.StreamingSrmMonitor.keyHashLong(w + "#" + i, salt),
              1000000L) >= dropMicro.toLong
        if (apply) {
          val l = ls(i); val r = rs(i)
          // one left-to-right non-overlapping pass, in place
          var src = 0; var dst = 0
          while (src < n) {
            if (src < n - 1 && syms(src) == l && syms(src + 1) == r) {
              syms(dst) = l + r; src += 2
            } else { syms(dst) = syms(src); src += 1 }
            dst += 1
          }
          n = dst
        }
        i += 1
      }
      var j = 0
      while (j < n) { out += syms(j); j += 1 }
      wi += 1
    }
    out.toArray
  }
}

/** Fused BPE tokenization: string → array<string> of subword tokens,
  * words flattened in order; `dropMicro > 0` enables the deterministic
  * dropout leg. One kernel call per row inside WholeStageCodegen. */
case class BpeTokensExpr(
    child: Expression,
    ls: Array[String],
    rs: Array[String],
    dropMicro: Int,
    salt: String)
  extends UnaryExpression {
  require(ls.length == rs.length, "merge sides must align")
  require(dropMicro >= 0 && dropMicro <= 1000000,
    s"dropMicro is a probability on the 1e-6 grid, got $dropMicro")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tokens requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"

  override def nullSafeEval(s: Any): Any = {
    val pieces = BpeKernel.docTokens(
      s.asInstanceOf[UTF8String].toString, ls, rs, dropMicro, salt)
    ArrayData.toArrayData(pieces.map(UTF8String.fromString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lsRef = ctx.addReferenceObj("bpeLs", ls, "java.lang.String[]")
    val rsRef = ctx.addReferenceObj("bpeRs", rs, "java.lang.String[]")
    val saltRef = ctx.addReferenceObj("bpeSalt", salt, "java.lang.String")
    nullSafeCodeGen(ctx, ev, s =>
      s"""String[] graftBpe = graft.functions.BpeKernel.docTokens(
         |  $s.toString(), $lsRef, $rsRef, $dropMicro, $saltRef);
         |org.apache.spark.unsafe.types.UTF8String[] graftBpeU8 =
         |  new org.apache.spark.unsafe.types.UTF8String[graftBpe.length];
         |for (int graftI = 0; graftI < graftBpe.length; graftI++) {
         |  graftBpeU8[graftI] = org.apache.spark.unsafe.types.UTF8String.fromString(graftBpe[graftI]);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(graftBpeU8);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column wrapper for the fused BPE tokenizer. */
object BpeExpressions {
  def bpeTokens(
      text: Column, merges: Seq[(String, String)],
      dropMicro: Int = 0, salt: String = ""): Column =
    GraftShims.column(BpeTokensExpr(GraftShims.expression(text),
      merges.map(_._1).toArray, merges.map(_._2).toArray, dropMicro, salt))
}
