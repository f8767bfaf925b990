package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the double-array dot product, with
  * `doGenCode`: the generated loop reads `ArrayData` in place — no
  * intermediate array allocation, no lambda dispatch — where the
  * `aggregate(zip_with(...))` higher-order form allocates a zipped array per
  * row and interprets two lambdas per element.
  *
  * Semantics are EXACTLY the higher-order form's: left-to-right summation
  * from 0.0 (bit-identical doubles), null on length mismatch (zip_with pads
  * with null) and on any null element (null poisons the HOF sum).
  */
case class DotProductDouble(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Codegen'd dot product over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProductDouble(GraftShims.expression(a), GraftShims.expression(b)))

  /** THE `graft_dot` SQL builder — single definition shared by the
    * build-time [[graft.GraftExtensions]] hook and the runtime [[register]]
    * path, so the two registration routes can never desynchronize. */
  val dotBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
    DotProductDouble(exprs.head, exprs(1))
  }

  /** Register `graft_dot` for SQL use in this session (the runtime
    * alternative to the build-time [[graft.GraftExtensions]] hook; both use
    * [[dotBuilder]], so a session that sees both registrations behaves
    * identically). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "scala_udf")
}
