package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-artifact round-trips for all three tokenizer families:
  * save → load → apply must equal direct apply token for token (merge
  * ORDER is the thing parquet doesn't guarantee and the loaders must
  * restore). */
class TokenizerModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-tokmodel-$name").toFile
    dirs += d
    d.toString + "/model"
  }

  override def withFixture(test: NoArgTest): org.scalatest.Outcome =
    try super.withFixture(test)
    finally { // the deleteRecursively discipline: specs must not litter /tmp
      dirs.foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(d)
      }
      dirs.clear()
    }

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("BPE merges round-trip in training order; applied tokens identical") {
    val merges = Tokenizer.mergesOf(
      Tokenizer.trainBpe(docs.select(col("text")), "text", merges = 4))
    val path = tmp("bpe")
    TokenizerModel.saveBpe(merges, spark, path)
    val loaded = TokenizerModel.loadBpe(spark, path)
    assert(loaded == merges, "order and content must survive parquet")
    val direct = docs.limit(50)
      .select(Tokenizer.bpeTokens(col("text"), merges)).as[Seq[String]].collect().toSeq
    val viaModel = docs.limit(50)
      .select(Tokenizer.bpeTokens(col("text"), loaded)).as[Seq[String]].collect().toSeq
    assert(direct == viaModel)
  }

  test("unigram pieces round-trip with ranks and quantized scores; docStats identical") {
    val pieces = UnigramLm.trainUnigramLocal(docs.select(col("text")), "text",
      vocabSize = 60, maxPieceLen = 3, seedSize = 128, emIters = 2)
    val path = tmp("unigram")
    TokenizerModel.saveUnigram(pieces, spark, path)
    val loaded = TokenizerModel.loadUnigram(spark, path)
    assert(loaded == pieces)
    val v1 = UnigramLm.vocab(pieces, maxPieceLen = 3)
    val v2 = UnigramLm.vocab(loaded, maxPieceLen = 3)
    val a = docs.limit(50).select(UnigramLm.docStats(col("text"), v1)).as[Seq[Long]].collect().toSeq
    val b = docs.limit(50).select(UnigramLm.docStats(col("text"), v2)).as[Seq[Long]].collect().toSeq
    assert(a == b)
  }

  test("WordPiece merge table round-trips with counts and scores; greedy identical") {
    val merges = WordPiece.trainWordPieceLocal(docs.select(col("text")), "text", merges = 4)
    val path = tmp("wp")
    TokenizerModel.saveWordPiece(merges, spark, path)
    val loaded = TokenizerModel.loadWordPiece(spark, path)
    assert(loaded == merges, "full WpMerge rows (incl. score_e12) must survive")
    val alphabet = ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)
    val v1 = WordPiece.vocabOfMerges(merges, alphabet)
    val v2 = WordPiece.vocabOfMerges(loaded, alphabet)
    val a = docs.limit(50).select(WordPiece.tokens(col("text"), v1)).as[Seq[String]].collect().toSeq
    val b = docs.limit(50).select(WordPiece.tokens(col("text"), v2)).as[Seq[String]].collect().toSeq
    assert(a == b)
    // the inspection surface reads back as a table
    assert(TokenizerModel.asTable(spark, path).count() == merges.size.toLong)
  }

  test("loaders select by NAME: a reordered-column artifact still loads (r15 verdict)") {
    val merges = WordPiece.trainWordPieceLocal(docs.select(col("text")), "text", merges = 3)
    val path = tmp("wp-reordered")
    // write the same rows with the physical column order REVERSED — the
    // artifact an older/newer writer with different WpMerge field order
    // (or an external producer) would leave on disk
    merges.map(m =>
        (m.score_e12, m.r_count, m.l_count, m.pair_count, m.merged, m.r_sym, m.l_sym, m.iter))
      .toDF("score_e12", "r_count", "l_count", "pair_count", "merged", "r_sym", "l_sym", "iter")
      .coalesce(1).write.mode("overwrite").parquet(path)
    assert(TokenizerModel.loadWordPiece(spark, path) == merges,
      "by-name selection must survive any physical column order")

    val bpe = Seq(("er", "a"), ("th", "e"))
    val bpePath = tmp("bpe-reordered")
    bpe.zipWithIndex.map { case ((l, r), i) => (r, l, i + 1) }
      .toDF("r_sym", "l_sym", "iter")
      .coalesce(1).write.mode("overwrite").parquet(bpePath)
    assert(TokenizerModel.loadBpe(spark, bpePath) == bpe)

    val pieces = Seq(UnigramLm.UnigramPiece("ab", 7L, -1200L),
      UnigramLm.UnigramPiece("a", 5L, -3400L))
    val uniPath = tmp("uni-reordered")
    pieces.zipWithIndex.map { case (p, i) => (p.lp_micro, p.count, p.piece, i + 1) }
      .toDF("lp_micro", "count", "piece", "rank")
      .coalesce(1).write.mode("overwrite").parquet(uniPath)
    assert(TokenizerModel.loadUnigram(spark, uniPath) == pieces)
  }
}
