package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused span-corruption kernel — the native twin of
  * [[graft.operators.Chunking.spanCorruption]]'s HOF formulation. The
  * HOF form hashes `id#pos` with the interpreted md5 Column expression
  * roughly 2·spanTokens times per TOKEN (the maskedAt window re-tests
  * every start); the kernel hashes each position ONCE into a start
  * array and derives masks/runs from it — one call per row inside
  * WholeStageCodegen (q121 measured ~6 s at sf0.1 on the HOF form).
  * Token-for-token identical output, spec-pinned on real text and
  * crafted edges; the q121 oracle pins it cross-engine.
  */
object SpanKernel {

  /** (input, target, n_masked) for one document. Mirrors the HOF exactly:
    * tokens = `text.split(" ", -1)` (Spark's `split(col, " ")` keeps
    * empty tokens); position p (1-based) STARTS a span iff
    * `keyHash(id ++ "#" ++ p, salt) < threshold`; a position is masked
    * iff any of the previous `spanTokens` positions (itself included)
    * starts; each masked RUN contributes one `maskToken` to the input
    * and its tokens (first prefixed `sepToken ++ " "`) to the target;
    * the leading separator is stripped. */
  def corrupt(
      id: String,
      text: String,
      salt: String,
      threshold: Long,
      spanTokens: Int,
      maskToken: String,
      sepToken: String): (String, String, Int) = {
    val toks = text.split(" ", -1)
    val n = toks.length
    val start = new Array[Boolean](n + 1) // 1-based
    var p = 1
    while (p <= n) {
      start(p) = graft.streaming.StreamingSrmMonitor
        .keyHashLong(id + "#" + p, salt) < threshold
      p += 1
    }
    def masked(p1: Int): Boolean = {
      if (p1 < 1 || p1 > n) false
      else {
        var j = 0
        var m = false
        while (!m && j < spanTokens) {
          val q = p1 - j
          if (q >= 1) m = start(q)
          j += 1
        }
        m
      }
    }
    val input = new java.lang.StringBuilder
    val target = new java.lang.StringBuilder
    var nMasked = 0
    var prevMasked = false
    var firstIn = true
    var firstTg = true
    p = 1
    while (p <= n) {
      val m = masked(p)
      val rs = m && !prevMasked
      if (!m || rs) {
        if (!firstIn) input.append(' ')
        input.append(if (m) maskToken else toks(p - 1))
        firstIn = false
      }
      if (m) {
        nMasked += 1
        if (!firstTg) target.append(' ')
        if (rs) { target.append(sepToken); target.append(' ') }
        target.append(toks(p - 1))
        firstTg = false
      }
      prevMasked = m
      p += 1
    }
    val tg =
      if (target.length == 0) ""
      else target.substring(sepToken.length + 1) // strip the leading "SEP "
    (input.toString, tg, nMasked)
  }

  /** Boxed-row helper shared by the interpreted and generated paths. */
  def corruptRow(
      id: UTF8String, text: UTF8String, salt: String, threshold: Long,
      spanTokens: Int, maskToken: String, sepToken: String): InternalRow = {
    val (in, tg, nm) = corrupt(
      id.toString, text.toString, salt, threshold, spanTokens, maskToken, sepToken)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(in), UTF8String.fromString(tg), nm))
  }
}

/** Fused (id, text) → struct(input, target, n_masked); null-in-null-out
  * (the operator layer supplies the HOF's null-text degenerate row). */
case class SpanCorruptExpr(
    left: Expression,
    right: Expression,
    salt: String,
    threshold: Long,
    spanTokens: Int,
    maskToken: String,
    sepToken: String)
  extends BinaryExpression {
  require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_span_corrupt requires (string, string), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = SpanCorruptExpr.schema
  override def prettyName: String = "graft_span_corrupt"

  override def nullSafeEval(idv: Any, tv: Any): Any =
    SpanKernel.corruptRow(idv.asInstanceOf[UTF8String], tv.asInstanceOf[UTF8String],
      salt, threshold, spanTokens, maskToken, sepToken)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    val maskRef = ctx.addReferenceObj("maskTok", maskToken, "java.lang.String")
    val sepRef = ctx.addReferenceObj("sepTok", sepToken, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (id, t) =>
      s"""${ev.value} = graft.functions.SpanKernel.corruptRow(
         |  $id, $t, $saltRef, ${threshold}L, $spanTokens, $maskRef, $sepRef);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanCorruptExpr {
  val schema: StructType = StructType(Seq(
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("n_masked", IntegerType, nullable = false)))
}

/** Column wrapper. */
object SpanExpressions {
  def spanCorrupt(
      id: Column, text: Column, salt: String, threshold: Long,
      spanTokens: Int, maskToken: String, sepToken: String): Column =
    GraftShims.column(SpanCorruptExpr(
      GraftShims.expression(id), GraftShims.expression(text),
      salt, threshold, spanTokens, maskToken, sepToken))
}
