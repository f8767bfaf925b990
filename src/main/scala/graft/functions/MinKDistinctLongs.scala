package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum DISTINCT values over longs — the KMV-sketch buffer.
  * Same bounded-at-every-stage discipline as [[MinKLongs]] (partials,
  * shuffle payloads and merges are all O(k)), with one extra rule: a value
  * already in the buffer is ignored, so the buffer is the k smallest
  * DISTINCT inputs. That distinction is what makes the buffer a KMV
  * cardinality sketch ([[graft.operators.Sketches]]): duplicate elements
  * hash to the same value, and KMV's estimator needs the k-th smallest
  * UNIQUE hash — feeding raw (undeduplicated) hashes through a plain
  * min-k would let one hot element occupy the buffer once but a
  * pre-distinct pass would cost the full (group, element) shuffle the
  * sketch exists to avoid.
  *
  * Buffer is a sorted ascending Vector of ≤ k distinct values; reduce
  * rejects values ≥ the k-th smallest in O(1) once full and otherwise
  * insert-or-skips at the binary-search position; merge is a bounded
  * sorted merge that drops equal heads.
  */
class MinKDistinctLongs(k: Int) extends Aggregator[Long, Vector[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Vector[Long] = Vector.empty

  override def reduce(b: Vector[Long], a: Long): Vector[Long] =
    if (b.length >= k && a >= b.last) b
    else {
      val sr = b.search(a)(Ordering.Long)
      sr match {
        case scala.collection.Searching.Found(_) => b
        case scala.collection.Searching.InsertionPoint(i) =>
          val inserted = (b.take(i) :+ a) ++ b.drop(i)
          if (inserted.length > k) inserted.take(k) else inserted
      }
    }

  override def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length) { out += a(i); i += 1 }
      else if (i >= a.length) { out += b(j); j += 1 }
      else if (a(i) < b(j)) { out += a(i); i += 1 }
      else if (b(j) < a(i)) { out += b(j); j += 1 }
      else { out += a(i); i += 1; j += 1 } // equal: emit once
      n += 1
    }
    out.result()
  }

  override def finish(reduction: Vector[Long]): Seq[Long] = reduction

  override def bufferEncoder: Encoder[Vector[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
