package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable partial-aggregate contract: merge(partials) equals the
  * from-scratch aggregate bit for bit regardless of shard boundaries or
  * merge order, and partials compose through IndexStore generations. */
class RollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus: DataFrame =
    (1L to 3000L).map(i => (i, s"k${i % 7}", i * 13 % 997)).toDF("id", "k", "v")

  private def canon(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.select(col("k"), col("cnt"), col("vsum"), col("vmin"), col("vmax"))
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("merged shard partials equal the from-scratch aggregate, any shard split") {
    val whole = Rollup.partial(corpus, Seq("k"), "v")
    for (shards <- Seq(2, 3, 7)) {
      val parts = (0 until shards).map(s => Rollup.partial(
        corpus.filter(col("id") % shards === s), Seq("k"), "v"))
      assert(canon(Rollup.merge(parts, Seq("k"))) == canon(whole),
        s"merge of $shards shards diverged")
    }
  }

  test("merge is associative: merge(merge(a,b),c) == merge(a,b,c)") {
    val parts = (0 until 3).map(s => Rollup.partial(
      corpus.filter(col("id") % 3 === s), Seq("k"), "v"))
    val nested = Rollup.merge(Seq(Rollup.merge(parts.take(2), Seq("k")), parts(2)), Seq("k"))
    assert(canon(nested) == canon(Rollup.merge(parts, Seq("k"))))
  }

  test("finalize derives the same mean as a direct avg") {
    val got = Rollup.finalize(Rollup.partial(corpus, Seq("k"), "v"))
      .select(col("k"), col("vavg")).as[(String, Double)].collect().toMap
    val direct = corpus.groupBy("k").agg(round(avg(col("v")), 4).as("a"))
      .as[(String, Double)].collect().toMap
    assert(got == direct)
  }

  test("partials persist and merge through IndexStore generations") {
    import graft.sinks.IndexStore
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    val dayA = corpus.filter(col("id") <= 1000L)
    val dayB = corpus.filter(col("id") > 1000L && col("id") <= 2000L)
    val dayC = corpus.filter(col("id") > 2000L)
    assert(IndexStore.append(Rollup.partial(dayA, Seq("k"), "v"), dir) == 0L)
    assert(IndexStore.append(Rollup.partial(dayB, Seq("k"), "v"), dir) == 1L)
    assert(IndexStore.append(Rollup.partial(dayC, Seq("k"), "v"), dir) == 2L)
    // read-side merge over all generations == from-scratch over the corpus
    val merged = Rollup.merge(Seq(IndexStore.read(spark, dir)), Seq("k"))
    assert(canon(merged) == canon(Rollup.partial(corpus, Seq("k"), "v")))
    // consolidation must not change the merged stats
    IndexStore.consolidate(spark, dir)
    val after = Rollup.merge(Seq(IndexStore.read(spark, dir)), Seq("k"))
    assert(canon(after) == canon(Rollup.partial(corpus, Seq("k"), "v")))
  }

  test("partial rides a readStream: three-batch drain equals the batch partial") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1L to 900L).map(i => (s"k${i % 5}", i * 7 % 211)).toSeq
    val in = MemoryStream[(String, Long)]
    val q = Rollup.partial(in.toDF().toDF("k", "v"), Seq("k"), "v")
      .writeStream.format("memory").queryName("rollup_stream")
      .outputMode("complete").start()
    try {
      val (b1, rest) = rows.splitAt(300)
      val (b2, b3) = rest.splitAt(250)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("rollup_stream")
        .select(col("k"), col("cnt"), col("vsum"), col("vmin"), col("vmax"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val batch = canon(Rollup.partial(rows.toDF("k", "v"), Seq("k"), "v"))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("guards: non-partial schema and empty input fail loudly") {
    intercept[IllegalArgumentException](Rollup.merge(Seq(corpus), Seq("k")))
    intercept[IllegalArgumentException](Rollup.merge(Seq.empty, Seq("k")))
    intercept[IllegalArgumentException](Rollup.partial(corpus, Seq.empty, "v"))
  }
}
