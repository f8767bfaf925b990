package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Johnson–Lindenstrauss projection: matrix shape, determinism, and the
  * distance-preservation property the lemma actually promises, measured on
  * the sf0.001 embeddings corpus. */
class JlProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, dir)

  test("dense planes are Rademacher: every entry is exactly +-1/sqrt(outDim)") {
    val planes = Similarity.jlPlanes(inDim = 64, outDim = 16)
    val s = 1.0 / math.sqrt(16.0)
    assert(planes.length == 16 && planes.forall(_.length == 64))
    assert(planes.flatten.forall(x => x == s || x == -s))
    // signs are balanced-ish (a constant-sign matrix would project to a line)
    val pos = planes.flatten.count(_ > 0)
    assert(pos > 400 && pos < 624, s"suspicious sign balance: $pos of 1024")
  }

  test("sparse planes are Achlioptas 3-sparse: {+s, 0, -s} with ~2/3 zeros") {
    val planes = Similarity.jlPlanes(inDim = 64, outDim = 16, sparse = true)
    val s = math.sqrt(3.0 / 16.0)
    assert(planes.flatten.forall(x => x == s || x == -s || x == 0.0))
    val zeros = planes.flatten.count(_ == 0.0).toDouble / 1024.0
    assert(zeros > 0.58 && zeros < 0.75, s"zero fraction $zeros far from 2/3")
  }

  test("planes are deterministic and disjoint from the sign-LSH hyperplanes") {
    assert(Similarity.jlPlanes(64, 16).map(_.toSeq) == Similarity.jlPlanes(64, 16).map(_.toSeq))
    val lsh = Similarity.hyperplanes(dim = 64, nBits = 16).map(_.toSeq).toSet
    assert(Similarity.jlPlanes(64, 16).map(_.toSeq).forall(p => !lsh.contains(p)))
  }

  test("64->16 projection preserves pairwise squared distances within JL bounds") {
    for (sparse <- Seq(false, true)) {
      val proj = Similarity.jlProject(emb, "embedding", "jl", 64, 16, sparse)
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"), col("jl"))
      val a = proj.select(col("vec_id").as("ida"), col("v").as("va"), col("jl").as("ja"))
      val b = proj.select(col("vec_id").as("idb"), col("v").as("vb"), col("jl").as("jb"))
      def dist2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        Similarity.fastDot(x, x) - lit(2.0) * Similarity.fastDot(x, y) + Similarity.fastDot(y, y)
      val ratios = a.join(b, col("ida") < col("idb"))
        .select((dist2(col("ja"), col("jb")) / dist2(col("va"), col("vb"))).as("r"))
        .agg(min(col("r")), max(col("r")), avg(col("r")), count(lit(1)),
          sum(when(col("r").between(0.5, 2.0), 1L).otherwise(0L)))
        .head()
      val (lo, hi, mean) = (ratios.getDouble(0), ratios.getDouble(1), ratios.getDouble(2))
      val bulk = ratios.getLong(4).toDouble / ratios.getLong(3).toDouble
      info(s"sparse=$sparse envelope=[$lo, $hi] mean=$mean bulk(0.5..2.0)=$bulk")
      // outDim 16 is a LOOSE sketch (eps ~ sqrt(8 ln n / outDim) > 1 at this
      // n), so individual pairs can distort a lot — the JL promise at this
      // outDim is about the BULK, not the envelope. Measured on this corpus:
      // dense envelope [0.14, 3.18]. Pinned: mean near 1 (unbiasedness — an
      // unscaled or all-zero matrix lands far outside) and >=85% of pairs
      // within a factor 2 (a broken projection collapses this).
      assert(lo > 0.0 && hi < 10.0, s"sparse=$sparse ratio envelope [$lo, $hi]")
      assert(mean > 0.85 && mean < 1.15, s"sparse=$sparse mean ratio $mean")
      assert(bulk > 0.85, s"sparse=$sparse only $bulk of pairs within 2x")
    }
  }

  test("projection output has outDim components and no shuffle in the plan") {
    val proj = Similarity.jlProject(emb, "embedding", "jl", 64, 16)
    assert(proj.select(size(col("jl"))).head().getInt(0) == 16)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "JL projection must stay shuffle-free")
  }
}
