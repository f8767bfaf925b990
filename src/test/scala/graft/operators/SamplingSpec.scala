package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of deterministic hash sampling: layout independence (the
  * reason it exists), split disjointness/exhaustiveness, rate accuracy,
  * and salt decorrelation.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")

  test("selection is layout-independent: repartitioning never changes membership") {
    val base = ids(2000)
    val a = Sampling.deterministicSample(base, "id", 0.3, "seed").as[Long].collect().toSet
    val b = Sampling.deterministicSample(base.repartition(17), "id", 0.3, "seed")
      .as[Long].collect().toSet
    val c = Sampling.deterministicSample(base.coalesce(1), "id", 0.3, "seed")
      .as[Long].collect().toSet
    assert(a == b && b == c)
  }

  test("growing the corpus never flips an old row's decision") {
    val small = Sampling.deterministicSample(ids(1000), "id", 0.3, "seed").as[Long].collect().toSet
    val big = Sampling.deterministicSample(ids(5000), "id", 0.3, "seed").as[Long].collect().toSet
    assert(big.filter(_ <= 1000L) == small)
  }

  test("sample rate is accurate and salts decorrelate") {
    val n = 20000
    val s1 = Sampling.deterministicSample(ids(n), "id", 0.5, "a").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(ids(n), "id", 0.5, "b").as[Long].collect().toSet
    assert(math.abs(s1.size.toDouble / n - 0.5) < 0.02, s"rate off: ${s1.size}")
    // independent 50% samples overlap ~25%
    val overlap = (s1 & s2).size.toDouble / n
    assert(overlap > 0.2 && overlap < 0.3, s"salts correlated: $overlap")
  }

  test("rate 0 selects nothing, rate 1 selects everything") {
    assert(Sampling.deterministicSample(ids(100), "id", 0.0, "s").count() == 0)
    assert(Sampling.deterministicSample(ids(100), "id", 1.0, "s").count() == 100)
  }

  test("hashSplit is disjoint, exhaustive, and close to the requested fractions") {
    val n = 20000
    val split = Sampling.hashSplit(ids(n), "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == n) // exhaustive, one label per row
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.02)
    assert(math.abs(counts("val").toDouble / n - 0.1) < 0.01)
    assert(math.abs(counts("test").toDouble / n - 0.1) < 0.01)
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val df = (1L to 8000L).toDF("id")
      .withColumn("cls", when(col("id") % 2 === 0, "even").otherwise("odd"))
    val kept = Sampling.stratifiedSample(df, "id", "cls",
      rates = Seq("even" -> 1.0), defaultRate = 0.25, salt = "st")
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(kept("even") == 4000L)
    assert(math.abs(kept("odd").toDouble / 4000 - 0.25) < 0.03, s"odd rate: ${kept("odd")}")
  }

  test("sampling ops are stateless expressions: they run unchanged on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    val sampled = Sampling.deterministicSample(
      Sampling.hashSplit(in.toDF().withColumnRenamed("value", "id"), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp"),
      "id", 0.3, "seed")
    val q = sampled.writeStream.format("memory").queryName("sampling_stream")
      .outputMode("append").start()
    try {
      in.addData(1L to 2000L)
      q.processAllAvailable()
      val streamed = spark.table("sampling_stream")
        .as[(Long, String)].collect().toMap
      val batch = Sampling.deterministicSample(
        Sampling.hashSplit(ids(2000), "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp"),
        "id", 0.3, "seed").as[(Long, String)].collect().toMap
      assert(streamed == batch, "stream and batch must select and label identically")
    } finally q.stop()
  }

  test("mixByRates samples each corpus independently and labels the union") {
    val a = ids(4000).withColumn("extra", lit("x"))
    val b = (4001L to 8000L).toDF("id") // no 'extra' column — unionByName fills null
    val mixed = Sampling.mixByRates(Seq((a, 1.0, "a"), (b, 0.25, "b")), "id", "m")
    val bySource = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource("a") == 4000L)
    assert(math.abs(bySource("b").toDouble / 4000 - 0.25) < 0.03)
    // per-corpus salts: corpus b's survivors differ from a plain same-salt draw
    assert(mixed.columns.contains("extra"))
    intercept[IllegalArgumentException](
      Sampling.mixByRates(Seq((a, 0.5, "dup"), (b, 0.5, "dup")), "id", "m"))
  }

  test("split fractions must sum to 1; rates must be in range") {
    intercept[IllegalArgumentException](
      Sampling.hashSplit(ids(1), "id", Seq("a" -> 0.5, "b" -> 0.2), "s"))
    intercept[IllegalArgumentException](Sampling.threshold(1.5))
  }
}
