package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: an exact weighted mean as an
  * `Aggregator[IN, BUF, OUT]` (the engine-recommended custom-aggregation
  * form — codegen-able, partial-aggregation-capable, usable from both the
  * typed and untyped APIs via `functions.udaf`).
  *
  * Numerical contract: per-row products are IEEE doubles, immediately
  * widened to DECIMAL scale 4 with HALF_UP (the exact semantics of Spark's
  * `cast(x as decimal(_,4))`), then summed exactly — decimal addition is
  * associative, so the result is independent of partitioning/merge order
  * and equal to the equivalent SQL aggregate in any engine.
  */
final case class WMBuffer(sumWX: JBigDecimal, sumW: JBigDecimal)

class WeightedMean extends Aggregator[(Double, Double), WMBuffer, Double] {

  private def dec4(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP)

  override def zero: WMBuffer =
    WMBuffer(JBigDecimal.ZERO.setScale(4), JBigDecimal.ZERO.setScale(4))

  override def reduce(b: WMBuffer, in: (Double, Double)): WMBuffer = {
    val (x, w) = in
    WMBuffer(b.sumWX.add(dec4(x * w)), b.sumW.add(dec4(w)))
  }

  override def merge(a: WMBuffer, b: WMBuffer): WMBuffer =
    WMBuffer(a.sumWX.add(b.sumWX), a.sumW.add(b.sumW))

  override def finish(b: WMBuffer): Double =
    b.sumWX.doubleValue() / b.sumW.doubleValue()

  override def bufferEncoder: Encoder[WMBuffer] = Encoders.product[WMBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedMean {
  /** Column-API handle: `wm(valueCol, weightCol)`. */
  def udaf: org.apache.spark.sql.expressions.UserDefinedFunction = {
    implicit val inEnc: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    org.apache.spark.sql.functions.udaf(new WeightedMean)
  }
}
