package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iterations: Int): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations)
      .as[(String, Double)].collect().toMap

  test("hand-computed two-iteration ranks on a 3-node graph with a dangling node") {
    // A->B, B->A, A->C: deg(A)=2, deg(B)=1; C is dangling (receives, drops)
    val r1 = ranksOf(Seq(("A", "B"), ("B", "A"), ("A", "C")), 1)
    val third = 1.0 / 3.0
    assert(r1("A") == (1.0 - 0.85) / 3 + 0.85 * third)          // B's whole share
    assert(r1("B") == (1.0 - 0.85) / 3 + 0.85 * (third / 2))    // half of A's
    assert(r1("C") == r1("B"))
    // iteration 2 from those ranks: A gets r1(B), B and C get r1(A)/2
    val r2 = ranksOf(Seq(("A", "B"), ("B", "A"), ("A", "C")), 2)
    assert(r2("A") == (1.0 - 0.85) / 3 + 0.85 * r1("B"))
    assert(r2("B") == (1.0 - 0.85) / 3 + 0.85 * (r1("A") / 2))
    assert(r2("C") == r2("B"))
  }

  test("iterations = 0 returns the uniform prior over the node set") {
    val r0 = ranksOf(Seq(("A", "B"), ("C", "B")), 0)
    assert(r0.keySet == Set("A", "B", "C") && r0.values.forall(_ == 1.0 / 3.0))
  }

  test("parallel edges weigh multiply (link multiplicity is intentional)") {
    // A->B twice, A->C once: B receives 2/3 of A's forwarded mass
    val r = ranksOf(Seq(("A", "B"), ("A", "B"), ("A", "C")), 1)
    assert(r("B") == (1.0 - 0.85) / 3 + 0.85 * (2.0 / 3.0 / 3.0))
    assert(r("C") == (1.0 - 0.85) / 3 + 0.85 * (1.0 / 3.0 / 3.0))
  }

  test("parameter guards fail loudly") {
    val e = Seq(("A", "B")).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", 2, damping = 1.0))
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", 65))
  }

  test("q103 corpus: raw ranks sit safely off the round(6) boundaries") {
    // The oracle compares round(rank, 6) across engines whose per-dst sums
    // can differ in the last ulp — measure the actual margins so a testdata
    // regeneration that lands a rank on a rounding boundary fails loudly
    // here instead of flaking the correctness gate.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val site = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("source").as("src"),
        concat(lit("site"), (col("doc_id") % 20).cast("string"), lit(".example.com")).as("dst"))
    val bad = docs.filter(col("doc_id") % 3 === 0)
      .select(col("source").as("src"),
        concat(lit("blocked"), (col("doc_id") % 5).cast("string"), lit(".bad.net")).as("dst"))
    val raw = Graph.pageRank(site.union(bad), "src", "dst", iterations = 2)
      .select(col("rank")).as[Double].collect()
    assert(raw.nonEmpty)
    val minDist = raw.map { r =>
      val f = (r * 1e6) % 1.0
      math.abs(f - 0.5) * 1e-6
    }.min
    assert(minDist > 1e-10,
      f"a raw rank sits $minDist%.2e from a round(6) boundary — " +
        "re-pick rounding or iterations for this corpus")
  }
}
