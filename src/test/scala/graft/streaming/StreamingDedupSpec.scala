package graft.streaming

import graft.TestSpark
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash-LSH candidates must equal the batch candidate set
  * after draining the same corpus — the two paths share signature and
  * band-hash arithmetic bit for bit, so this is an equality, not a
  * recall-approximation, test.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("multi-batch drain emits exactly the batch lshCandidatePairs set; replay emits nothing") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupCandidates(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", numHashes = 64, bands = 16)
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      val (b1, rest) = docs.splitAt(docs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }

      val streamed = spark.table("dedup_stream")
        .select("id_a", "id_b").distinct()
        .as[(Long, Long)].collect().toSet

      val batchShingled = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), split(col("text"), " ").as("__toks"))
        .select(col("doc_id"), Dedup.shinglesOfTokens(col("__toks"), 3).as("__sh"))
      val batch = Dedup.lshCandidatePairs(
        Dedup.minHashSignatures(batchShingled, "doc_id", col("__sh"), numHashes = 64),
        "doc_id", bands = 16, rowsPerBand = 4)
        .as[(Long, Long)].collect().toSet

      assert(streamed == batch,
        s"streaming=${streamed.size} batch=${batch.size}; " +
          s"only-stream=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
      assert(batch.nonEmpty, "corpus has no candidate pairs — test is vacuous")

      // full replay: every id already in its buckets → no new emissions
      val before = spark.table("dedup_stream").count()
      in.addData(docs); q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == before, "replay emitted duplicates")
    } finally q.stop()
  }

  test("hot-bucket cap stops admitting ids but never fails the query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val same = (1L to 10L).map(i => (i, "identical text every time"))
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupCandidates(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", numHashes = 64, bands = 16,
      maxBucket = 3)
      .writeStream.format("memory").queryName("dedup_cap").outputMode("append").start()
    try {
      in.addData(same); q.processAllAvailable()
      val pairs = spark.table("dedup_cap").select("id_a", "id_b").distinct().count()
      // 3 admitted ids per bucket → C(3,2) = 3 distinct pairs, not C(10,2)
      assert(pairs == 3L, s"expected capped pair set, got $pairs")
    } finally q.stop()
  }

  test("maxBucket boundary: exactly-at-cap admits, one-past-cap drops, replays never emit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cap = 4
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupCandidates(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", numHashes = 64, bands = 16,
      maxBucket = cap)
      .writeStream.format("memory").queryName("dedup_cap_edge").outputMode("append").start()
    try {
      def distinctPairs = spark.table("dedup_cap_edge")
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      val doc = (i: Long) => (i, "identical text every time")

      // fill to exactly the cap, one id per batch — each arrival pairs with
      // every prior: sum over k of (k-1) = C(cap, 2) pairs
      (1L to cap.toLong).foreach { i => in.addData(doc(i)); q.processAllAvailable() }
      val full = (1L to cap.toLong).combinations(2).map(p => (p(0), p(1))).toSet
      assert(distinctPairs == full, s"expected C($cap,2) pairs, got ${distinctPairs.size}")

      // one past the cap: dropped silently — no rows, no failure
      val rowsAtCap = spark.table("dedup_cap_edge").count()
      in.addData(doc(cap + 1L)); q.processAllAvailable()
      assert(spark.table("dedup_cap_edge").count() == rowsAtCap, "past-cap id emitted")

      // replay an ADMITTED id and the DROPPED id together: both no-ops
      // (idempotence must hold for ids on either side of the boundary)
      in.addData(Seq(doc(1L), doc(cap + 1L))); q.processAllAvailable()
      assert(spark.table("dedup_cap_edge").count() == rowsAtCap, "replay emitted")
      assert(distinctPairs == full, "pair set changed after boundary replays")
    } finally q.stop()
  }
}
