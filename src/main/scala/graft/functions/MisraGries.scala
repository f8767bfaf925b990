package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries k-counter frequency summary over strings — the bounded
  * heavy-hitter CANDIDATE stage (Misra & Gries 1982; merge rule per
  * Agarwal et al. 2012). The buffer never exceeds `k` (item, count)
  * entries at any stage — partials, shuffle payloads, and merges are all
  * O(k) — and the guarantee is one-sided: EVERY item with true frequency
  * > n/(k+1) survives to the final summary; items below may or may not.
  * Counts are LOWER bounds (undercounted by at most n/(k+1)), and WHICH
  * sub-threshold items survive depends on partial-aggregation order — so
  * the summary alone is not oracle-gateable. [[graft.operators.Profiler
  * .heavyHitters]] composes it with an exact second-pass recount over
  * just the candidates, which IS deterministic: the threshold filter sits
  * strictly above the guarantee bound, so order-dependent survivors are
  * filtered identically on every run.
  *
  * reduce: increment if present; insert if room; else decrement ALL
  * (drop zeros) — the classic amortized-O(1) step. merge: add counts,
  * then if over k entries subtract the (k+1)-th largest count from every
  * entry and keep the strictly-positive ones.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0 && k <= 100000, s"k=$k out of [1, 1e5]")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1L)
      case None if b.size < k => b.updated(a, 1L)
      case None =>
        b.iterator.map { case (i, c) => (i, c - 1L) }.filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.valuesIterator.toSeq.sorted(Ordering.Long.reverse)(k)
      combined.iterator.map { case (i, c) => (i, c - cut) }.filter(_._2 > 0L).toMap
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
