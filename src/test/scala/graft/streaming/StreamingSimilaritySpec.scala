package graft.streaming

import graft.TestSpark
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming top-k ANN must converge to the batch brute-force answer: after
  * draining a static corpus (across MULTIPLE micro-batches, so state merging
  * is actually exercised) the max-generation snapshot per probe equals
  * [[Similarity.bruteForceTopK]] on the same corpus.
  */
class StreamingSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("after draining the corpus, streaming state equals the batch brute-force top-k") {
    val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = embeddings
      .select(col("vec_id").cast("long"), Similarity.asDouble(col("embedding")))
      .as[(Long, Seq[Double])].collect().toSeq
    val probes = all.filter(_._1 < 5).map { case (id, v) => (id, v.toArray) }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val updates = StreamingSimilarity.annTopK(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", probes, k = 5)
    val q = updates.writeStream.format("memory").queryName("ann_stream")
      .outputMode("update").start()
    try {
      // three uneven micro-batches: state must merge across them
      val (b1, rest) = all.splitAt(all.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }

      val allUpdates = spark.table("ann_stream")
        .select(col("probe_id"), col("gen"), col("rnk"), col("nbr_id"),
          round(col("cos_sim"), 4).as("cos_sim"))
        .as[(Long, Long, Int, Long, Double)].collect().toSeq
      val streamed = allUpdates.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val maxGen = rows.map(_._2).max
        rows.filter(_._2 == maxGen).map(r => (r._1, r._3, r._4, r._5))
      }.sortBy(r => (r._1, r._2))

      val batch = Similarity.bruteForceTopK(
        embeddings, "vec_id", "embedding",
        embeddings.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .select(col("probe_id").cast("long"), col("rnk"), col("nbr_id").cast("long"), col("cos_sim"))
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

      assert(streamed == batch)
    } finally q.stop()
  }

  test("replayed vectors are idempotent: duplicates never distort the top-k") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // +1 keeps every vector non-zero (i=7 would otherwise be all-zeros, and
    // zero-norm vectors fail loudly under ANSI division like the batch op)
    val vecs = (1L to 20L).map(i => (i, Seq.tabulate(4)(d => (i * (d + 1)).toDouble % 7.0 + 1.0)))
    val probes = Seq((0L, Array(1.0, 2.0, 3.0, 4.0)))
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingSimilarity.annTopK(
      in.toDF().toDF("id", "v"), "id", "v", probes, k = 3)
      .writeStream.format("memory").queryName("ann_replay").outputMode("update").start()
    try {
      in.addData(vecs); q.processAllAvailable()
      in.addData(vecs); q.processAllAvailable() // full replay
      val last = spark.table("ann_replay")
      val gens = last.select(max("gen")).as[Long].head()
      val top = last.filter(col("gen") === gens)
        .select("rnk", "nbr_id").as[(Int, Long)].collect().sortBy(_._1).toSeq
      val once = last.filter(col("gen") === 1L)
        .select("rnk", "nbr_id").as[(Int, Long)].collect().sortBy(_._1).toSeq
      assert(top == once, "replay changed the top-k")
      assert(top.length == 3)
    } finally q.stop()
  }
}
