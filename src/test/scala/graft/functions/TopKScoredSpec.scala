package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class TopKScoredSpec extends AnyFunSuite {

  private def run(k: Int, xs: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val agg = new TopKScored(k)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  test("keeps the k highest scores, ties to the lowest id, buffer never exceeds k") {
    val xs = Seq((1.0, 5L), (3.0, 2L), (2.0, 9L), (3.0, 1L), (0.5, 7L))
    assert(run(3, xs) == Vector((3.0, 1L), (3.0, 2L), (2.0, 9L)))
    assert(run(1, xs) == Vector((3.0, 1L)))
  }

  test("merge of split halves equals single-pass reduce, regardless of split point") {
    val agg = new TopKScored(4)
    val prop = Prop.forAll(
      Gen.listOf(Gen.zip(Gen.choose(0.0, 10.0), Gen.choose(0L, 20L))),
      Gen.choose(0, 100)) { (xs, cut) =>
      val (l, r) = xs.splitAt(cut % (xs.length + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      merged == xs.foldLeft(agg.zero)(agg.reduce) && merged.length <= 4
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("hot-key rejection path: values below the k-th best leave the buffer untouched") {
    val agg = new TopKScored(2)
    val full = Vector((9.0, 1L), (8.0, 2L))
    assert(agg.reduce(full, (7.0, 3L)) eq full)
    assert(agg.reduce(full, (8.0, 3L)) eq full) // tie with HIGHER id loses
    assert(agg.reduce(full, (8.0, 0L)) == Vector((9.0, 1L), (8.0, 0L)))
  }
}
