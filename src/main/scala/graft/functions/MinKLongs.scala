package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k (smallest) aggregation over longs: the buffer NEVER holds
  * more than `k` values, at any stage — per-partition partials, shuffle
  * payloads, and merges are all O(k), which is the property that makes a
  * per-key row cap safe on a key with 10^8 rows (`collect_list` + slice
  * buffers the whole group before slicing; this never does).
  *
  * Buffer is a sorted ascending Vector of ≤ k values; reduce rejects any
  * value ≥ the current k-th smallest in O(1) (the overwhelmingly common
  * case on a hot key once the buffer fills), otherwise inserts in O(k).
  * Merge is a bounded sorted merge. Output is the ascending k-smallest.
  */
class MinKLongs(k: Int) extends Aggregator[Long, Vector[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Vector[Long] = Vector.empty

  override def reduce(b: Vector[Long], a: Long): Vector[Long] =
    if (b.length >= k && a >= b.last) b
    else {
      val i = b.search(a)(Ordering.Long).insertionPoint
      val inserted = (b.take(i) :+ a) ++ b.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }

  override def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && a(i) <= b(j))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Vector[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Vector[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
