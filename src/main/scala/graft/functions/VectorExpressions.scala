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

/** 1-bit (sign) embedding quantization: array<float> → array<long> of
  * ⌈dim/32⌉ packed 32-bit words, bit `k` of word `w` set iff
  * `vec[32w+k] >= 0` (−0.0f compares >= 0 in SQL numeric order — both
  * engines agree). The 32× storage cut vs float32 is the memory-bound
  * 100 TB retrieval path next to int8/PQ; 32-bit words (not 64) keep
  * every value positive, so cross-engine hashing never meets a sign bit.
  * Null elements poison the row to null (the [[DotProductDouble]] rule). */
case class SignPackExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_pack requires an array<float> argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sign_pack"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long]((n + 31) / 32)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      if (x.getFloat(i) >= 0f) out(i / 32) |= 1L << (i % 32)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      s"""
         |long[] $out = new long[($a.numElements() + 31) / 32];
         |boolean $bad = false;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  if ($a.getFloat($i) >= 0f) $out[$i / 32] |= 1L << ($i % 32);
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two packed sign codes (array<long>): Σ
  * bit_count(xor) per word — null on length mismatch or null element. */
case class HammingDistExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.LongType, _),
          ArrayType(org.apache.spark.sql.types.LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_hamming requires two array<long> arguments, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
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
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
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

  /** Packed sign bits of an array<float>: array<long> of 32-bit words. */
  def signPack(vec: Column): Column =
    GraftShims.column(SignPackExpr(GraftShims.expression(vec)))

  /** Hamming distance between two packed codes. */
  def hamming(a: Column, b: Column): Column =
    GraftShims.column(HammingDistExpr(GraftShims.expression(a), GraftShims.expression(b)))

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
