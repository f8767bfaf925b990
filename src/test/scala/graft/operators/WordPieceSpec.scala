package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(texts: String*) = texts.toSeq.toDF("text")

  test("greedy takes the LONGEST match first, marks continuations, all-or-nothing UNK") {
    val v = WordPiece.fixedVocab(
      initial = Seq("h", "hug", "hugg"),
      continuation = Seq("ing", "s", "g"), maxPieceLen = 4)
    // longest-first: hugg beats hug at position 0
    assert(WordPiece.greedyLocal("hugging", v) == Seq("hugg", "##ing"))
    assert(WordPiece.greedyLocal("hugs", v) == Seq("hug", "##s"))
    // any unmatchable position degrades the WHOLE word to [UNK]
    assert(WordPiece.greedyLocal("hugsy", v) == Seq("[UNK]"))
    assert(WordPiece.greedyLocal("zug", v) == Seq("[UNK]"))
    // initial vs continuation sets are distinct: "g" only continues
    assert(WordPiece.greedyLocal("g", v) == Seq("[UNK]"))
  }

  test("max_input_chars_per_word: a >100-char word is [UNK] without scanning (HF rule)") {
    val v = WordPiece.fixedVocab(
      initial = Seq("a"), continuation = Seq("a"), maxPieceLen = 1)
    // fully coverable by the vocab, but over HF's 100-char cutoff -> [UNK]
    assert(WordPiece.greedyLocal("a" * 101, v) == Seq("[UNK]"))
    // exactly at the boundary still tokenizes
    assert(WordPiece.greedyLocal("a" * 100, v).length == 100)
    // the fused doc expression applies the same cutoff
    val got = Seq((1L, ("a" * 101) + " aa")).toDF("id", "text")
      .select(WordPiece.docStats(col("text"), v))
      .as[Seq[Long]].collect().head
    assert(got == Seq(3L, 1L, 2L)) // [UNK] + (a ##a); 1 UNK word of 2
    // the cutoff counts CODE POINTS, not UTF-16 units (HF counts Python
    // chars): 99 BMP 'a's + one astral char = 100 code points but 101
    // UTF-16 units — must still TOKENIZE under a vocab covering both
    val astral = new String(Character.toChars(0x1D400)) // 𝐀, 2 UTF-16 units
    val va = WordPiece.fixedVocab(
      initial = Seq("a", astral), continuation = Seq("a", astral), maxPieceLen = 2)
    val w100cp = ("a" * 99) + astral
    assert(w100cp.length == 101 && w100cp.codePointCount(0, w100cp.length) == 100)
    assert(WordPiece.greedyLocal(w100cp, va).length == 100,
      "100-code-point word with an astral char must tokenize (UTF-16 .length would UNK it)")
    // one more code point over -> [UNK]
    assert(WordPiece.greedyLocal("a" + w100cp, va) == Seq("[UNK]"))
  }

  test("docStats/tokens: fused expressions match the local greedy; UNK words count one token") {
    val v = WordPiece.fixedVocab(
      initial = Seq("h", "hug"), continuation = Seq("s"), maxPieceLen = 3)
    val df = Seq((1L, "hugs hugs h zebra"), (2L, ""), (3L, "HUGS, h!")).toDF("id", "text")
    val got = df.select(col("id"),
        WordPiece.tokens(col("text"), v).as("t"),
        WordPiece.docStats(col("text"), v).as("st"))
      .as[(Long, Seq[String], Seq[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // "hugs hugs h zebra": hug ##s, hug ##s, h, [UNK] — 6 tokens, 1 unk, 4 words
    assert(got(1L)._1 == Seq("hug", "##s", "hug", "##s", "h", "[UNK]"))
    assert(got(1L)._2 == Seq(6L, 1L, 4L))
    assert(got(2L)._2 == Seq(0L, 0L, 0L))
    // lowercasing + separator split mirror the shared words() rule
    assert(got(3L)._1 == Seq("hug", "##s", "h"))
    // the tokenCount shortcut is stats element 1 (0 on empty docs)
    val counts = df.select(col("id"), WordPiece.tokenCount(col("text"), v))
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 6L, 2L -> 0L, 3L -> 3L))
  }

  test("trainWordPieceLocal: hand-computed ratio argmax with the lexicographic tie-break") {
    // words: aab x2, b x1. Symbols a:2 ##a:2 ##b:2 b:1.
    // Pairs (a,##a)=2 and (##a,##b)=2 BOTH score 2e12/(2*2) = 5e11 —
    // the tie breaks on l_sym asc, and '#' < 'a', so (##a,##b) merges
    // first (BPE's raw-count rule would tie the same way here; the
    // criterion split is pinned in the next test).
    val m = WordPiece.trainWordPieceLocal(corpus("aab aab b"), "text", merges = 2)
    assert(m.map(x => (x.iter, x.l_sym, x.r_sym, x.merged)) ==
      Seq((1, "##a", "##b", "##ab"), (2, "a", "##ab", "aab")))
    assert(m.forall(_.score_e12 == 500000000000L))
    assert(m.head.pair_count == 2L && m.head.l_count == 2L && m.head.r_count == 2L)
  }

  test("the likelihood-ratio criterion picks a different merge than BPE's raw count") {
    // (x,##y) has pair count 10 but x occurs 60 times -> score 1.66e10;
    // (q,##z) has pair count 2 with rare parts -> score 5e11. BPE picks
    // (x,##y); WordPiece must pick (q,##z).
    val df = corpus((Seq.fill(10)("xy") ++ Seq.fill(2)("qz") ++ Seq.fill(50)("x")).mkString(" "))
    val wp = WordPiece.trainWordPieceLocal(df, "text", merges = 1).head
    assert((wp.l_sym, wp.r_sym) == ("q", "##z"),
      s"ratio criterion must beat raw count, got ${(wp.l_sym, wp.r_sym)}")
    assert(wp.score_e12 == 2000000000000L / 4)
    val bpe = Tokenizer.trainBpeLocal(df, "text", merges = 1).head
    assert((bpe.l_sym, bpe.r_sym) == ("x", "y"), "BPE's raw count picks the frequent pair")
  }

  test("trainWordPiece (all-Spark, DECIMAL div) is merge-for-merge identical to the local trainer") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    val dist = WordPiece.trainWordPiece(docs, "text", merges = 4)
      .orderBy(col("iter"))
      .as[(Int, String, String, String, Long, Long, Long, Long)].collect().toSeq
    val local = WordPiece.trainWordPieceLocal(docs, "text", merges = 4)
      .map(m => (m.iter, m.l_sym, m.r_sym, m.merged, m.pair_count, m.l_count, m.r_count, m.score_e12))
    assert(dist == local)
  }

  test("train -> vocabOfMerges -> apply composes; early stop on pair exhaustion") {
    val m = WordPiece.trainWordPieceLocal(corpus("aab aab b"), "text", merges = 9)
    // merges exhaust after aab is one symbol
    assert(m.size == 2)
    val v = WordPiece.vocabOfMerges(m, alphabet = Seq("a", "b"))
    assert(WordPiece.greedyLocal("aab", v) == Seq("aab"))
    assert(WordPiece.greedyLocal("ab", v) == Seq("a", "##b"))
    assert(WordPiece.greedyLocal("ba", v) == Seq("b", "##a"))
    // distributed trainer stops early the same way
    val dist = WordPiece.trainWordPiece(corpus("aab aab b"), "text", merges = 9)
    assert(dist.count() == 2L)
  }
}
