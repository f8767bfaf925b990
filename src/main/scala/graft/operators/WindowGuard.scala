package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Loud cardinality guard for the UNPARTITIONED-WINDOW class (r17
  * verdict "what's wrong" #3).
  *
  * A handful of operators run `Window.orderBy` with no partitioning —
  * always over a frame that is an AGGREGATE of the corpus (distinct
  * metric values, histogram bins, rank cuts), never the corpus itself,
  * so the single-partition sort Spark warns about is genuinely small.
  * That contract is documented per site, but a continuous
  * high-cardinality value column (nanosecond timestamps, raw doubles
  * from a dense distribution) silently breaks it: the "distinct values"
  * frame becomes corpus-shaped and the whole dataset funnels through
  * one task. This guard turns that silent degradation into a loud,
  * immediate failure — the same discipline the driver-side `collect()`
  * sites carry (maxVocab-style requires).
  *
  * Mechanics: the check rides the window itself — `row_number() OVER
  * (the same window)` compared against the bound inside an
  * `assert_true` that WRAPS the first used windowed expression, so it
  * costs no extra pass or shuffle, cannot be pruned away (it gates a
  * used column), and fires on the first row past the bound with the
  * site name in the error. Every unpartitioned-window site either calls
  * this or carries an `// UNPARTITIONED-WINDOW: bounded by <knob>`
  * inventory comment where the frame is provably parameter/enum-sized
  * (grep `UNPARTITIONED-WINDOW` for the full inventory).
  */
object WindowGuard {

  /** Default frame-row ceiling: a million aggregate rows sort in tens of
    * MB on one task — comfortably fine — while a frame past it is no
    * longer "value-cardinality-sized" in any defensible sense. */
  val DefaultMaxFrameRows: Long = 1L << 20

  /** `expr` evaluated under the guard: fails the query with `site` in
    * the message if the unpartitioned frame ordered by `orderCols` has
    * more than `bound` rows (`row_number` over the same ordering — its
    * max IS the frame size, so the assert fires iff the frame is over
    * bound, under any ordering). `row_number` takes no frame spec, so
    * the guard builds its own frameless window over the site's ordering
    * columns. Wrap the FIRST windowed expression each site actually
    * uses. */
  def guarded(expr: Column, orderCols: Seq[Column], site: String,
      bound: Long = DefaultMaxFrameRows): Column =
    when(
      assert_true(row_number().over(Window.orderBy(orderCols: _*)) <= lit(bound),
        lit(s"[$site] unpartitioned-window frame exceeded $bound rows — " +
          "the value-cardinality contract no longer holds for this input " +
          "(see WindowGuard; quantize the value column or raise the bound " +
          "deliberately)")).isNull,
      expr)
}
