package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler kernel shared by [[JaroWinklerSimilarity]]'s
  * interpreted and generated paths — the STANDARD formulation (Winkler
  * 1990): Jaro similarity `(m/|a| + m/|b| + (m−t)/m)/3` with match
  * window `max(|a|,|b|)/2 − 1` and transpositions `t` = half the
  * out-of-order matched pairs, then the prefix boost
  * `j + ℓ·0.1·(1−j)` for the common prefix `ℓ ≤ 4`, applied only when
  * `j > 0.7` (the boost threshold) — the same parameterization DuckDB's
  * `jaro_winkler_similarity` implements, which is what makes the
  * operator oracle-checkable (exact modulo last-ulp summation-order
  * differences, absorbed by the scaled-floor gate). Works on code units
  * (chars), the usual simplification for name matching. Edge pinned to
  * the oracle engine: EMPTY vs empty scores 0.0, not 1.0 — both engines
  * treat no-characters as no-evidence rather than equality (probed:
  * DuckDB `jaro_winkler_similarity('','') = 0.0`).
  */
object JaroWinklerKernel {
  def similarity(a: String, b: String): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!matched2(j) && a.charAt(i) == b.charAt(j)) {
          matched1(i) = true; matched2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(l1, l2)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst expression for Jaro–Winkler string similarity — the
  * standard name-matching metric of entity resolution (Levenshtein
  * penalizes transpositions and length uniformly; JW weights shared
  * prefixes, which is how human-entered names actually corrupt). A
  * codegen'd single kernel call per row, inside the projection's
  * WholeStageCodegen span.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler requires two string arguments, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerKernel.similarity($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Codegen'd Jaro–Winkler similarity of two string columns in [0, 1]. */
  def similarity(a: Column, b: Column): Column =
    GraftShims.column(JaroWinklerSimilarity(GraftShims.expression(a), GraftShims.expression(b)))

  /** SQL builder shared by [[graft.GraftExtensions]] and [[register]]. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, s"graft_jaro_winkler takes 2 arguments, got ${exprs.length}")
    JaroWinklerSimilarity(exprs.head, exprs(1))
  }

  /** Runtime SQL registration (the [[graft.GraftExtensions]] alternative). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler", builder, "scala_udf")
}
