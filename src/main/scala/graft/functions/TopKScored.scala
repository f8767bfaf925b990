package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by score aggregation over (score, id) pairs — the
  * score-ordered sibling of [[MinKLongs]]: the buffer NEVER holds more
  * than `k` entries at any stage (per-partition partials, shuffle
  * payloads, merges), which is what makes a per-query top-k safe when one
  * query matches 10^8 documents. A `row_number() OVER (PARTITION BY query
  * ORDER BY score DESC)` buffers the whole match set per task; this never
  * does.
  *
  * Ranking is (score DESC, id ASC) — exact score ties admit the lowest
  * id, matching the `ORDER BY score DESC, id` oracle formulation. Buffer
  * is a Vector sorted best-first; reduce rejects anything not beating the
  * current k-th best in O(1) (the common case on a hot query once the
  * buffer fills), merge is a bounded sorted merge.
  */
class TopKScored(k: Int)
    extends Aggregator[(Double, Long), Vector[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  // best-first: higher score first, lower id first on exact ties
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Vector[(Double, Long)] = Vector.empty

  override def reduce(
      b: Vector[(Double, Long)],
      a: (Double, Long)): Vector[(Double, Long)] =
    if (b.length >= k && !beats(a, b.last)) b
    else {
      val i = b.indexWhere(e => beats(a, e)) match {
        case -1 => b.length
        case p  => p
      }
      val inserted = (b.take(i) :+ a) ++ b.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }

  override def merge(
      a: Vector[(Double, Long)],
      b: Vector[(Double, Long)]): Vector[(Double, Long)] = {
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && !beats(b(j), a(i)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Vector[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Vector[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
