package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expressions for per-row membership scans against a
  * BROADCAST set — the codegen'd replacements for the repo's last two
  * Scala UDFs (the stripKnownWindows hit-position scan and the
  * dropContaminatedStateless gram-watchlist count). A ScalaUDF on the
  * projection breaks the surrounding WholeStageCodegen span and pays a
  * catalyst→Scala conversion of the whole array per row; these evaluate
  * in place over `ArrayData` inside the generated loop. The broadcast
  * HANDLE is what the expression captures (and what task serialization
  * ships — bytes-small); the set itself moves once per executor via the
  * torrent broadcast, exactly as the UDF closures did.
  */
object BroadcastSetExpressions {

  /** Positions (0-based ints) of array<long> elements present in the
    * broadcast set. Null array → null (callers guard non-null upstream);
    * null ELEMENTS never match (the window hasher emits none). */
  def hitPositions(whs: Column, bc: Broadcast[Set[Long]]): Column =
    GraftShims.column(LongSetHitPositions(GraftShims.expression(whs), bc))

  /** Count of array<string> elements present in the broadcast set.
    * Null array → null; null elements never match. */
  def matchCount(grams: Column, bc: Broadcast[Set[String]]): Column =
    GraftShims.column(StringSetMatchCount(GraftShims.expression(grams), bc))
}

/** The Bloom membership kernel shared by [[BloomProbeExpr]]'s interpreted
  * and generated paths — k salted 60-bit md5 positions
  * ([[graft.operators.Sampling.keyHash]]'s exact arithmetic) tested
  * against the bitmap. Public static shape so the codegen'd call is one
  * plain method invocation inside the WholeStageCodegen loop. */
object BloomProbeKernel {
  // one digest instance per thread, reset by digest() itself — the
  // per-row getInstance (provider lookup + allocation) was the dominant
  // cost of the hot projection loop this kernel exists to speed up
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def probe(bitmap: Array[Long], s: String, mBits: Int, kHashes: Int, salt: String): Boolean = {
    // same bytes as md5((salt + r + s).getBytes): UTF-8 concatenation is
    // byte-concatenation, so streaming the three parts digests identically
    val sBytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val digest = md5.get()
    var r = 0; var all = true
    while (all && r < kHashes) {
      digest.update((salt + r).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      digest.update(sBytes)
      val md = digest.digest()
      // first 15 hex chars = top 60 bits of the digest = keyHash
      var hv = 0L; var i = 0
      while (i < 8) { hv = (hv << 8) | (md(i) & 0xffL); i += 1 }
      hv = hv >>> 4
      val pos = (hv % mBits).toInt
      all = (bitmap(pos / 32) & (1L << (pos % 32))) != 0L
      r += 1
    }
    all
  }
}

/** Per-row Bloom membership probe against a captured bitmap —
  * [[graft.operators.Sketches.bloomProbe]]'s native form. The bitmap
  * rides the plan's reference array (shipped once per plan, not re-read
  * per row) and the probe stays inside the projection's codegen span. */
case class BloomProbeExpr(child: Expression, bitmap: Array[Long], mBits: Int,
    kHashes: Int, salt: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe requires string, got ${t.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def nullSafeEval(a: Any): Any =
    BloomProbeKernel.probe(bitmap, a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      mBits, kHashes, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bm = ctx.addReferenceObj("bloomBitmap", bitmap, "long[]")
      val sl = ctx.addReferenceObj("bloomSalt", salt, "java.lang.String")
      s"""
         |${ev.value} = graft.functions.BloomProbeKernel.probe(
         |  $bm, $a.toString(), $mBits, $kHashes, $sl);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class LongSetHitPositions(child: Expression, bc: Broadcast[Set[Long]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_set_hit_positions requires array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_set_hit_positions"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val set = bc.value
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getLong(i))) out += i
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the broadcast handle rides the generated class as a reference
      // object; .value() resolves to the executor-local set
      val bcRef = ctx.addReferenceObj("hitSetBc", bc,
        classOf[Broadcast[Set[Long]]].getName)
      val set = ctx.freshName("set")
      val hits = ctx.freshName("hits")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      s"""
         |scala.collection.immutable.Set $set =
         |  (scala.collection.immutable.Set) $bcRef.value();
         |int $n = $a.numElements();
         |int[] $hits = new int[$n];
         |int $j = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) &&
         |      $set.contains((Object) scala.runtime.BoxesRunTime.boxToLong($a.getLong($i)))) {
         |    $hits[$j++] = $i;
         |  }
         |}
         |int[] $out = new int[$j];
         |System.arraycopy($hits, 0, $out, 0, $j);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StringSetMatchCount(child: Expression, bc: Broadcast[Set[String]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_set_match_count requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_set_match_count"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val set = bc.value
    var c = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i).toString)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bcRef = ctx.addReferenceObj("gramSetBc", bc,
        classOf[Broadcast[Set[String]]].getName)
      val set = ctx.freshName("set")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |scala.collection.immutable.Set $set =
         |  (scala.collection.immutable.Set) $bcRef.value();
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) &&
         |      $set.contains((Object) $a.getUTF8String($i).toString())) {
         |    $c++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
