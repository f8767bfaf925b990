package graft.operators

import graft.TestSpark
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: trainer determinism, Lloyd improvement, exactness
  * on a centroid-recoverable planted corpus, and the ADC ranking contract
  * against brute force. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, dir)

  /** Total squared reconstruction error of `codes` against `books`:
    * Σ_rows Σ_s ‖sv_s − centroid(s, code_s)‖². */
  private def reconError(
      vectors: DataFrame, codes: DataFrame, books: DataFrame, m: Int, dim: Int): Double = {
    val dsub = dim / m
    val bookRows = books.select(col("subspace").cast("int"), col("code").cast("long"),
        Similarity.asDouble(col("centroid")))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toArray).toMap
    def err(s: Int): Column = {
      val sv = slice(Similarity.asDouble(col("embedding")), s * dsub + 1, dsub)
      val code = element_at(col("codes"), s + 1)
      bookRows.toSeq.collect { case ((`s`, c), cent) =>
        val diff2 = Similarity.fastDot(sv, sv) -
          lit(2.0) * Similarity.fastDot(sv, lit(cent)) + lit(cent.map(x => x * x).sum)
        (c, diff2)
      }.foldLeft(when(lit(false), lit(0.0))) { case (acc, (c, d)) =>
        acc.when(code === c.toInt, d)
      }.otherwise(lit(Double.NaN))
    }
    vectors.join(codes, "vec_id")
      .select((0 until m).map(err).reduce(_ + _).as("e"))
      .agg(sum(col("e"))).head().getDouble(0)
  }

  test("pqTrain is deterministic run to run") {
    def run() = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, ksub = 4,
        dim = 64, iterations = 1)
      .orderBy(col("subspace"), col("code"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2), r.getLong(3)))
    assert(run().toSeq == run().toSeq)
  }

  test("Lloyd iterations reduce total quantization error") {
    def errAt(iters: Int): Double = {
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, ksub = 8,
        dim = 64, iterations = iters)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books, m = 4, dim = 64)
      reconError(emb, codes, books, m = 4, dim = 64)
    }
    val (e0, e2) = (errAt(0), errAt(2))
    info(s"reconstruction error: init $e0 -> 2 iterations $e2")
    assert(e2 < e0, s"training must not increase error: $e0 -> $e2")
  }

  test("on a prototype corpus PQ is exact and ADC equals the true dot ranking") {
    import spark.implicits._
    // 8 prototypes in 8 dims, corpus = each prototype repeated 4x. With
    // ksub = 8 and 2 iterations every codebook converges onto the
    // prototypes' subvectors, so reconstruction is exact and the ADC
    // ranking equals brute force.
    val protos = (0 until 8).map(p => Array.tabulate(8)(i =>
      math.sin(p * 8 + i).toFloat))
    val corpus = (0 until 32).map(i => (i.toLong, protos(i % 8).toSeq)).toDF("vec_id", "embedding")
    val books = Similarity.pqTrain(corpus, "vec_id", "embedding", m = 2, ksub = 8,
      dim = 8, iterations = 2)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", books, m = 2, dim = 8)
    assert(reconError(corpus, codes, books, m = 2, dim = 8) < 1e-12)

    val probes = corpus.filter(col("vec_id") < 3)
    val adc = Similarity.pqTopK(codes, "vec_id", "codes", books, probes, "vec_id", "embedding",
        k = 4, m = 2, dim = 8, scoreScale = 4)
      .select(col("probe_id"), col("rnk"), col("nbr_id"))
    // brute force ranked by round(dot, 4) with the same lowest-id ties:
    val v = corpus.select(col("vec_id").as("nbr_id"),
      Similarity.asDouble(col("embedding")).as("__v"))
    val p = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), Similarity.asDouble(col("embedding")).as("__p"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
      .orderBy(col("__s").desc, col("nbr_id"))
    val exact = v.crossJoin(p).filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("__s", round(Similarity.fastDot(col("__p"), col("__v")), 4))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 4)
      .select(col("probe_id"), col("rnk"), col("nbr_id"))
    assert(adc.except(exact).isEmpty && exact.except(adc).isEmpty)
  }

  test("ivfResiduals: a centroid vector's residual is exactly zero; cells follow the ivf rule") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)), (3L, Seq(0.1f, 0.9f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))).toDF("cid", "cvec")
    val got = Similarity.ivfResiduals(corpus, "vec_id", "embedding", cents, "cid", "cvec")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(got(0L)._1 == 0L && got(0L)._2.forall(_ == 0.0))
    assert(got(1L)._1 == 1L && got(1L)._2.forall(_ == 0.0))
    assert(got(2L)._1 == 0L && got(3L)._1 == 1L)
    assert(math.abs(got(2L)._2.head - (-0.1)) < 1e-7)
  }

  test("IVF-PQ on a prototype corpus: exact residual codebooks make ADC equal true dots") {
    import spark.implicits._
    // 2 cells x 4 residual patterns: vector = center(cell) + residual(j).
    // With ksub = 4 and one Lloyd iteration the residual codebooks land on
    // the exact residuals, so celldot + ADC = the true dot product.
    val centers = Seq(Array(8f, 0f, 0f, 0f), Array(0f, 8f, 0f, 0f))
    val residuals = Seq(
      Array(0.5f, 0.25f, 0f, 0f), Array(-0.5f, 0f, 0.25f, 0f),
      Array(0f, 0.5f, 0f, 0.25f), Array(0.25f, -0.5f, 0f, 0f))
    // ids 0..3 carry the four DISTINCT residual patterns (so the lowest-id
    // init already spans the residual codebook exactly); cells split 0-7/8-15
    val corpus = (0 until 16).map { i =>
      val c = centers(i / 8); val r = residuals(i % 4)
      (i.toLong, c.zip(r).map { case (a, b) => a + b }.toSeq)
    }.toDF("vec_id", "embedding")
    val cents = centers.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cid", "cvec")
    val resid = Similarity.ivfResiduals(corpus, "vec_id", "embedding", cents, "cid", "cvec")
    val books = Similarity.pqTrain(resid, "vec_id", "residual",
      m = 2, ksub = 4, dim = 4, iterations = 1)
    val encoded = Similarity.ivfPqEncode(corpus, "vec_id", "embedding",
      cents, "cid", "cvec", books, m = 2, dim = 4)
    val probes = corpus.filter(col("vec_id") < 2)
    val adc = Similarity.ivfPqTopK(encoded, "vec_id", cents, "cid", "cvec", books,
      probes, "vec_id", "embedding", k = 6, m = 2, dim = 4, nprobe = 2, scoreScale = 4)
    // exact reference: round(dot, 4) ranking, same ties
    val v = corpus.select(col("vec_id").as("nbr_id"), Similarity.asDouble(col("embedding")).as("__v"))
    val p = probes.select(col("vec_id").as("probe_id"), Similarity.asDouble(col("embedding")).as("__p"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
      .orderBy(col("__s").desc, col("nbr_id"))
    val exact = v.crossJoin(p).filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("__s", round(Similarity.fastDot(col("__p"), col("__v")), 4))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 6)
      .select(col("probe_id"), col("rnk"), col("nbr_id"), col("__s").as("adc_score"))
    assert(adc.except(exact).isEmpty && exact.except(adc).isEmpty,
      "with nprobe = nlist and exact codebooks, IVF-PQ ADC must equal the true ranking")
  }

  test("pqEncode is a shuffle-free projection with m codes per row") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, ksub = 4,
      dim = 64, iterations = 0)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books, m = 4, dim = 64)
    assert(codes.select(size(col("codes"))).head().getInt(0) == 4)
    assert(!codes.queryExecution.executedPlan.toString.contains("Exchange"),
      "PQ encode must stay shuffle-free")
    val mx = codes.select(array_max(col("codes")).as("m"), array_min(col("codes")).as("n"))
      .agg(max(col("m")), min(col("n"))).head()
    assert(mx.getInt(0) <= 3 && mx.getInt(1) >= 0, "codes must stay in [0, ksub)")
  }
}
