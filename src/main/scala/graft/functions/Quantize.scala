package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE quantization convention every oracle-gated float in this repo uses —
  * one implementation, not five (the r10 self-review finding).
  *
  * Scaled-floor: `floor(x·10^digits + 0.5)/10^digits`. Every step is an
  * IEEE double op, so ANY engine reproduces it bitwise on the same input
  * double — which `round()` does NOT: Spark rounds the exact decimal
  * expansion (BigDecimal of the double's shortest repr) while DuckDB
  * rounds the ×10^digits-SCALED float, and they disagree whenever scaling
  * error lands the product on .5 (measured: 3 of 10k rows on the q183
  * EWMA stream). Scaled-floor also maps (−0.5·10⁻ᵈ, 0.5·10⁻ᵈ) to +0.0,
  * killing the signed-zero hash-divergence class.
  *
  * Oracle form (DuckDB):
  * `CAST(floor(x * 10^d + 0.5) AS DOUBLE) / 10^d` — write the power as a
  * literal (1000000.0), never pow().
  */
object Quantize {

  /** Column form. Spark's floor(Column) returns LongType — the cast back
    * to double is part of the convention (and bounds the domain to 2^63
    * scaled, far beyond any gated value). */
  def scaledFloor(c: Column, digits: Int): Column = {
    require(digits >= 0 && digits <= 9, s"digits must be in [0, 9], got $digits")
    val m = math.pow(10.0, digits)
    floor(c * lit(m) + lit(0.5)).cast("double") / lit(m)
  }

  /** Plain-Scala form for driver-side / typed-fold code paths (the
    * streaming EWMA emit, the streaming contract report) — BIT-IDENTICAL
    * to the Column form on every input: the round trip through Long
    * mirrors Spark's floor(Column)-returns-LongType + cast (both
    * saturate identically past ±2^63 scaled, and NaN becomes 0.0 in both
    * — Scala's NaN.toLong and Spark's double→long cast agree; a bare
    * math.floor kept as double would neither saturate nor zero NaN and
    * the two forms would diverge there; probed empirically, floor(NaN)
    * through the Column form IS 0.0). */
  def scaledFloorDouble(x: Double, digits: Int): Double = {
    val m = math.pow(10.0, digits)
    math.floor(x * m + 0.5).toLong.toDouble / m
  }
}
