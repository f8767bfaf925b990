package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"t$i").mkString(" "))

  test("geometry: window/stride/tail for assorted lengths") {
    val df = Seq(doc(1, 10), doc(2, 32), doc(3, 33), doc(4, 80), doc(5, 1)).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", chunkTokens = 32, overlap = 8)
      .select("doc_id", "chunk_idx", "chunk_tokens").as[(Long, Int, Int)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(out(1L) == Seq(10))           // shorter than a window: one chunk
    assert(out(2L) == Seq(32))           // exactly one window, NO redundant tail
    assert(out(3L) == Seq(32, 9))        // stride 24: tail = tokens 25..33
    assert(out(4L) == Seq(32, 32, 32))   // starts 0,24,48 — 72 adds no new tokens
    assert(out(5L) == Seq(1))
  }

  test("consecutive chunks overlap by exactly `overlap` tokens") {
    val df = Seq(doc(1, 100)).toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(df, "doc_id", "text", chunkTokens = 32, overlap = 8)
      .orderBy("chunk_idx").select("chunk").as[String].collect().toSeq.map(_.split(" ").toSeq)
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(a.takeRight(8) == b.take(8), "overlap mismatch")
      case _         => ()
    }
  }

  test("non-overlapping chunks reassemble to the tokenized document") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val rebuilt = Chunking.reassemble(
      Chunking.chunkByTokens(df, "doc_id", "text", chunkTokens = 32, overlap = 0), "doc_id")
    val mismatched = rebuilt.join(df, "doc_id")
      .filter(col("rebuilt") =!= concat_ws(" ", split(col("text"), " ")))
    assert(mismatched.isEmpty, "reassembly lost or reordered tokens")
  }

  test("null text yields no chunks, not a phantom empty one") {
    val df = Seq((1L, Option("a b c")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", chunkTokens = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("invalid geometry is rejected") {
    val df = Seq(doc(1, 4)).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunkByTokens(df, "doc_id", "text", 0))
    intercept[IllegalArgumentException](Chunking.chunkByTokens(df, "doc_id", "text", 8, overlap = 8))
  }

  test("packSequences: bucket count moves work, never results; packs are order-contiguous") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", chunkTokens = 32, overlap = 8)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"))
    def packed(buckets: Int) =
      Chunking.packSequences(chunks, "doc_id", "chunk_idx", "chunk_tokens",
          capacity = 256, buckets = buckets)
        .orderBy("doc_id", "chunk_idx")
        .select("doc_id", "chunk_idx", "pack_id")
        .as[(Long, Int, Long)].collect().toSeq
    val serial = packed(1) // one bucket = the naive single-window cumsum
    assert(serial == packed(7) && serial == packed(64),
      "pack assignment must be invariant to the bucket split")
    // packs tile the corpus order: pack_id is non-decreasing and gapless
    val ids = serial.map(_._3)
    assert(ids.zip(ids.tail).forall { case (a, b) => b == a || b == a + 1 || (b - a >= 1) })
    assert(ids.zip(ids.tail).forall { case (a, b) => b >= a }, "pack_id must be monotone")
    assert(ids.head == 0L)
    // every pack except possibly the last spans >= capacity tokens of
    // boundary: its first chunk starts strictly below (pack_id+1)*capacity
    val tokensByPack = serial.map(_._3).zip(
      chunks.orderBy("doc_id", "chunk_idx").select("chunk_tokens").as[Int].collect())
    val perPack = tokensByPack.groupBy(_._1).view.mapValues(_.map(_._2.toLong).sum).toMap
    val maxChunk = tokensByPack.map(_._2).max
    val lastPack = ids.max
    perPack.foreach { case (p, total) =>
      if (p != lastPack)
        assert(total > 256 - maxChunk,
          s"pack $p underfilled: $total tokens (capacity 256, maxChunk $maxChunk)")
      assert(total < 256 + maxChunk, s"pack $p overfilled: $total")
    }
  }

  test("spanCorruption: lossless reassembly, mask/target correspondence, masked fraction near nominal") {
    val docs = (1L to 200L).map(i => doc(i, 50)).toDF("doc_id", "text")
    val out = Chunking.spanCorruption(docs, "doc_id", "text",
      startRate = 0.1, spanTokens = 3, salt = "spec")
      .as[(Long, String, String, Int)].collect()
    assert(out.length == 200)
    val originals = (1L to 200L).map(i => i -> doc(i, 50)._2).toMap
    var totalMasked = 0L
    out.foreach { case (id, input, target, nMasked) =>
      // reassembly: k-th <MASK> in the input <- k-th <SEP>-run of the target
      val spans = if (target.isEmpty) Array.empty[String] else target.split(" <SEP> ", -1)
      val nMasks = input.split(" ", -1).count(_ == "<MASK>")
      assert(nMasks == spans.length,
        s"doc $id: $nMasks masks but ${spans.length} target spans")
      val it = spans.iterator
      val rebuilt = input.split(" ", -1)
        .flatMap(t => if (t == "<MASK>") it.next().split(" ", -1) else Array(t))
        .mkString(" ")
      assert(rebuilt == originals(id), s"doc $id reassembly mismatch")
      // n_masked counts exactly the masked tokens
      assert(nMasked == spans.map(_.split(" ", -1).length).sum)
      totalMasked += nMasked
    }
    // nominal masked fraction 1 - 0.9^3 ~ 0.271; loose band over 10k tokens
    val frac = totalMasked.toDouble / (200 * 50)
    assert(frac > 0.20 && frac < 0.34, s"masked fraction $frac out of band")

    // determinism: a second invocation is byte-identical
    val again = Chunking.spanCorruption(docs, "doc_id", "text",
      startRate = 0.1, spanTokens = 3, salt = "spec")
      .as[(Long, String, String, Int)].collect()
    assert(again.toSeq == out.toSeq)

    // a different salt draws different masks
    val other = Chunking.spanCorruption(docs, "doc_id", "text",
      startRate = 0.1, spanTokens = 3, salt = "spec2")
      .as[(Long, String, String, Int)].collect()
    assert(other.map(_._2).toSeq != out.map(_._2).toSeq)
  }

  test("spanCorruption is stream-safe: the same call rides a readStream, drain equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1L to 30L).map(i => (i, doc(i, 40)._2))
    val in = MemoryStream[(Long, String)]
    val streamed = Chunking.spanCorruption(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", startRate = 0.1, spanTokens = 3, salt = "scs")
    try spark.catalog.dropTempView("chunk_sc") catch { case _: Exception => () }
    val q = streamed.writeStream.format("memory").queryName("chunk_sc").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-chunk-sc").toString)
      .start()
    try {
      in.addData(rows.take(15)); q.processAllAvailable()
      in.addData(rows.drop(15)); q.processAllAvailable()
      val streamedOut = spark.table("chunk_sc")
        .orderBy("doc_id").as[(Long, String, String, Int)].collect().toSeq
      val batch = Chunking.spanCorruption(rows.toDF("doc_id", "text"),
        "doc_id", "text", startRate = 0.1, spanTokens = 3, salt = "scs")
        .orderBy("doc_id").as[(Long, String, String, Int)].collect().toSeq
      assert(streamedOut == batch)
    } finally q.stop()
  }

  test("fused span kernel is byte-identical to the HOF fold on real text and crafted edges") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val f = Chunking.spanCorruption(real, "doc_id", "text",
      startRate = 0.08, spanTokens = 3, salt = "sc1").orderBy("doc_id")
    val h = Chunking.spanCorruptionHof(real, "doc_id", "text",
      startRate = 0.08, spanTokens = 3, salt = "sc1").orderBy("doc_id")
    assert(f.collect().toSeq == h.collect().toSeq,
      "fused span kernel diverged from the HOF fold on real text")
    // crafted edges: consecutive/leading/trailing spaces, empty and null
    // text, single token, span longer than the doc
    val edge = Seq(
      (1L, "a  b   c "), (2L, ""), (3L, null), (4L, "solo"),
      (5L, " lead"), (6L, "x y")).toDF("doc_id", "text")
    for (span <- Seq(1, 3, 8); rate <- Seq(0.05, 0.5)) {
      val ef = Chunking.spanCorruption(edge, "doc_id", "text",
        startRate = rate, spanTokens = span, salt = "e").orderBy("doc_id").collect().toSeq
      val eh = Chunking.spanCorruptionHof(edge, "doc_id", "text",
        startRate = rate, spanTokens = span, salt = "e").orderBy("doc_id").collect().toSeq
      assert(ef == eh, s"edge divergence at span=$span rate=$rate:\n$ef\nvs\n$eh")
    }
  }
}
