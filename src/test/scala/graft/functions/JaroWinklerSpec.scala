package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Jaro-Winkler semantics pinned against the PUBLISHED textbook vectors
  * (Winkler 1990) — the same values DuckDB's jaro_winkler_similarity
  * produces (probed empirically; the q212 oracle is the corpus-wide
  * cross-engine check). */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fl6(x: Double) = Quantize.scaledFloorDouble(x, 6)

  test("kernel matches the textbook / DuckDB vectors") {
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("arnab", "urban", 0.6),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("a", "b", 0.0))
    cases.foreach { case (a, b, want) =>
      assert(fl6(JaroWinklerKernel.similarity(a, b)) == fl6(want),
        s"similarity('$a','$b') = ${JaroWinklerKernel.similarity(a, b)}, want $want")
    }
  }

  test("the 0.7 boost threshold: low-jaro pairs get NO prefix boost") {
    // jaro('ab','az') = 2/3 < 0.7 -> unboosted despite the shared prefix
    assert(fl6(JaroWinklerKernel.similarity("ab", "az")) == fl6(2.0 / 3.0))
    assert(fl6(JaroWinklerKernel.similarity("abcdefgh", "abzzzzzz")) == 0.5)
    // just above the threshold the 4-char-capped boost applies
    assert(fl6(JaroWinklerKernel.similarity("prefixzz", "prefixaa")) == 0.9)
  }

  test("symmetry, and the expression evaluates inside a projection") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE")).toDF("a", "b")
    val viaExpr = df.select(
      JaroWinkler.similarity(col("a"), col("b")).as("s1"),
      JaroWinkler.similarity(col("b"), col("a")).as("s2"))
      .as[(Double, Double)].collect()
    viaExpr.foreach { case (s1, s2) => assert(s1 == s2) }
    assert(fl6(viaExpr.head._1) == fl6(0.9611111111111111))
    // null propagates
    assert(Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.similarity(col("a"), col("b"))).head().isNullAt(0))
  }

  test("graft_jaro_winkler is callable from pure SQL via the session extension") {
    val v = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS s")
      .head().getDouble(0)
    assert(fl6(v) == fl6(0.9611111111111111))
  }
}
