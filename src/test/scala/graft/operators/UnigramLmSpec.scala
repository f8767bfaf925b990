package graft.operators

import graft.TestSpark
import graft.functions.{UnigramKernel, UnigramVocab}
import graft.operators.UnigramLm.UnigramPiece
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- brute-force reference: enumerate EVERY segmentation ----------

  /** All segmentations of w into vocabulary pieces (single chars fall
    * back to unkLp), best by (max score, min tokens) — the spec oracle
    * the DP must match exactly. */
  private def bruteBest(w: String, vocab: Map[String, Long], unkLp: Long, maxLen: Int): (Long, Int) = {
    def segs(i: Int): Seq[(Long, Int)] =
      if (i == w.length) Seq((0L, 0))
      else (1 to math.min(maxLen, w.length - i)).flatMap { len =>
        val piece = w.substring(i, i + len)
        val lp =
          if (vocab.contains(piece)) Some(vocab(piece))
          else if (len == 1) Some(unkLp)
          else None
        lp.toSeq.flatMap(l => segs(i + len).map { case (s, t) => (s + l, t + 1) })
      }
    segs(0).minBy { case (s, t) => (-s, t) }
  }

  private val overlappy = Map( // pieces that chain and overlap: the DP-hard case
    "a" -> -3000000L, "b" -> -3100000L,
    "ab" -> -5500000L, "ba" -> -5400000L, "aa" -> -5900000L,
    "bab" -> -8000000L, "aab" -> -8100000L)

  test("viterbi matches brute-force enumeration over every a/b string up to length 10") {
    val vocab = UnigramVocab(overlappy.toSeq, unkLp = -30000000L, maxPieceLen = 3)
    for (n <- 1 to 10; bits <- 0 until (1 << n)) {
      val w = (0 until n).map(k => if (((bits >> k) & 1) == 0) 'a' else 'b').mkString
      val Array(score, toks, words) = UnigramKernel.docStats(w, vocab)
      val (bs, bt) = bruteBest(w, overlappy, -30000000L, 3)
      assert(words == 1L)
      assert(score == bs && toks == bt.toLong, s"word '$w': dp ($score,$toks) vs brute ($bs,$bt)")
      // the emitted tokens re-sum to the optimal score and count
      val pieces = UnigramKernel.docTokens(w, vocab)
      assert(pieces.mkString == w, "tokens must concatenate back to the word")
      assert(pieces.length == toks)
      assert(pieces.map(p => overlappy.getOrElse(p, -30000000L)).sum == score)
    }
  }

  test("unknown characters segment at unkLp — coverage never fails") {
    val vocab = UnigramVocab(Seq("a" -> -1000000L), unkLp = -9000000L, maxPieceLen = 2)
    val Array(score, toks, words) = UnigramKernel.docStats("axa", vocab)
    assert(words == 1L && toks == 3L && score == -1000000L * 2 - 9000000L)
  }

  test("docStats splits words exactly like split(lower(text), '[^a-z0-9]+')") {
    val vocab = UnigramVocab(Seq("a" -> -1000000L), unkLp = -2000000L, maxPieceLen = 2)
    assert(UnigramKernel.words("Hello, World! 42").toSeq == Seq("hello", "world", "42"))
    assert(UnigramKernel.words("  ").isEmpty && UnigramKernel.words("").isEmpty)
    val Array(s, t, w) = UnigramKernel.docStats("A a; a.", vocab)
    assert(w == 3L && t == 3L && s == -3000000L)
    // null-free empty doc: zero everything
    assert(UnigramKernel.docStats("", vocab).toSeq == Seq(0L, 0L, 0L))
  }

  test("hard-EM learns the repeated piece and the two trainers agree piece-for-piece") {
    import spark.implicits._
    val docs = Seq(
      "abab abab baba", "abab abab abab", "baba abab", "ab ba abab",
      "abba abab abab", "abab").toDF("text")
    val local = UnigramLm.trainUnigramLocal(docs, "text",
      vocabSize = 8, maxPieceLen = 3, seedSize = 16, emIters = 3)
    val dist = UnigramLm.trainUnigram(docs, "text",
      vocabSize = 8, maxPieceLen = 3, seedSize = 16, emIters = 3)
    assert(local == dist, s"trainers diverged:\nlocal=$local\ndist=$dist")
    // 'ab' dominates the corpus: it must survive pruning with a top count
    val byPiece = local.map(p => p.piece -> p).toMap
    assert(byPiece.contains("ab"), s"expected 'ab' in $local")
    assert(local.head.count == local.map(_.count).max)
    // single chars always survive (coverage)
    assert(byPiece.contains("a") && byPiece.contains("b"))
    // scores are the quantized log of count/total — spot-check the head
    val total = local.map(_.count).sum
    assert(local.head.lp_micro == UnigramLm.lpMicro(local.head.count, total))
  }

  test("token counting under a trained vocab is consistent between stats and tokens") {
    import spark.implicits._
    val docs = Seq("the cat sat", "the bat", "catcat the").toDF("text")
    val pieces = UnigramLm.trainUnigramLocal(docs, "text",
      vocabSize = 12, maxPieceLen = 3, seedSize = 32, emIters = 2)
    val v = UnigramLm.vocab(pieces, maxPieceLen = 3)
    val out = docs.select(
      UnigramLm.tokenCount(col("text"), v).as("n"),
      size(UnigramLm.tokens(col("text"), v)).as("m")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getInt(1).toLong))
  }

  test("seedVocab: top-K by (count desc, piece asc) with single chars forced in") {
    import spark.implicits._
    val docs = Seq("aab aab", "ab b").toDF("text")
    // words: aab x2, ab x1, b x1
    // substrings (len<=2): aab: a(2x2),a? -> per word aab: a,a,b,aa,ab ; ab: a,b,ab ; b: b
    val seed = UnigramLm.seedVocab(docs, "text", maxPieceLen = 2, seedSize = 2)
      .orderBy(desc("piece_count"), asc("piece")).collect()
    val asMap = seed.map(r => r.getString(0) -> r.getLong(1)).toMap
    // counts: a: 2*2(from aab) + 1(ab) = 5; b: 2+1+1 = 4; aa: 2; ab: 2+1 = 3
    assert(asMap("a") == 5L && asMap("b") == 4L)
    // top-2 is {a, b}; chars already in — seed is exactly the union
    assert(asMap.keySet == Set("a", "b"))
    val bigger = UnigramLm.seedVocab(docs, "text", maxPieceLen = 2, seedSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bigger == Map("a" -> 5L, "b" -> 4L, "ab" -> 3L))
  }

  test("fixedVocab application plan is a pure projection — no shuffle, no UDF") {
    import spark.implicits._
    val v = UnigramLm.fixedVocab(Seq("th" -> -5500000L, "t" -> -3000000L, "h" -> -3000000L),
      maxPieceLen = 2)
    // parallelize (not a local relation) so the projection can't constant-fold away
    val df = spark.createDataset(
        spark.sparkContext.parallelize(Seq("the that", "tooth"), 2)).toDF("text")
      .select(UnigramLm.docStats(col("text"), v).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"application must not shuffle:\n$plan")
    assert(df.queryExecution.executedPlan.toString.contains("Project"))
  }

  /** All segmentations of w, sorted by the engine's total order:
    * (score desc, tokens asc, reversed-length-sequence desc). */
  private def bruteAll(w: String, vocab: Map[String, Long], unkLp: Long, maxLen: Int): Seq[(Long, Int)] = {
    def rec(i: Int, sc: Long, lens: List[Int]): Seq[(Long, Int, String)] =
      if (i == w.length) Seq((sc, lens.length, lens.reverse.map(l => ('0' + l).toChar).mkString))
      else (1 to math.min(maxLen, w.length - i)).flatMap { len =>
        val piece = w.substring(i, i + len)
        val lp =
          if (vocab.contains(piece)) Some(vocab(piece))
          else if (len == 1) Some(unkLp)
          else None
        lp.toSeq.flatMap(l => rec(i + len, sc + l, len :: lens))
      }
    // key desc: reversed length string, higher digit first
    rec(0, 0L, Nil).sortWith { (a, b) =>
      if (a._1 != b._1) a._1 > b._1
      else if (a._2 != b._2) a._2 < b._2
      else a._3 > b._3
    }.map(s => (s._1, s._2))
  }

  test("n-best matches the full enumeration's top-n order over every a/b string up to length 9") {
    val vocab = UnigramVocab(overlappy.toSeq, unkLp = -30000000L, maxPieceLen = 3)
    for (n <- Seq(1, 3, 5); len <- 1 to 9; bits <- 0 until (1 << len)) {
      val w = (0 until len).map(k => if (((bits >> k) & 1) == 0) 'a' else 'b').mkString
      val flat = UnigramKernel.wordNBest(w, vocab, n)
      val got = (0 until flat.length / 2).map(i => (flat(2 * i), flat(2 * i + 1).toInt))
      val want = bruteAll(w, overlappy, -30000000L, 3).take(n)
      assert(got == want, s"word '$w' n=$n: dp $got vs brute $want")
    }
  }

  test("n-best rank 1 equals the single-best DP; sampled with n=1 equals docStats") {
    val vocab = UnigramVocab(overlappy.toSeq, unkLp = -30000000L, maxPieceLen = 3)
    for (bits <- 0 until 256) {
      val w = (0 until 8).map(k => if (((bits >> k) & 1) == 0) 'a' else 'b').mkString
      val nb = UnigramKernel.wordNBest(w, vocab, 4)
      val Array(s, t, _) = UnigramKernel.docStats(w, vocab)
      assert(nb(0) == s && nb(1) == t)
      val Array(ss, st, sw) = UnigramKernel.docStatsSampled(w, vocab, 1, "anysalt")
      assert(ss == s && st == t && sw == 1L)
    }
  }

  test("sampled segmentation: pieces concatenate back, stats match the chosen rank, salts vary") {
    val vocab = UnigramVocab(overlappy.toSeq, unkLp = -30000000L, maxPieceLen = 3)
    var anyDiff = false
    for (bits <- 0 until 128) {
      val w = (0 until 7).map(k => if (((bits >> k) & 1) == 0) 'a' else 'b').mkString
      val pieces = UnigramKernel.docTokensSampled(w, vocab, 3, "s1")
      assert(pieces.mkString == w)
      val Array(sc, tk, _) = UnigramKernel.docStatsSampled(w, vocab, 3, "s1")
      assert(pieces.length.toLong == tk)
      assert(pieces.map(p => overlappy.getOrElse(p, -30000000L)).sum == sc)
      // the chosen (score, tokens) must be one of the word's 3-best
      val nb = UnigramKernel.wordNBest(w, vocab, 3)
      val cands = (0 until nb.length / 2).map(i => (nb(2 * i), nb(2 * i + 1)))
      assert(cands.contains((sc, tk)))
      if (UnigramKernel.docStatsSampled(w, vocab, 3, "s2").toSeq !=
        Seq(sc, tk, 1L)) anyDiff = true
    }
    assert(anyDiff, "different salts must pick different ranks somewhere")
  }

  test("pieceLosses: alt is the masked-vocab Viterbi, loss ranking decides keeps") {
    import UnigramLm.UnigramPiece
    val pieces = Seq(
      UnigramPiece("a", 400, -3000000L), UnigramPiece("b", 300, -3100000L),
      UnigramPiece("ab", 120, -5500000L), UnigramPiece("ba", 110, -5400000L),
      UnigramPiece("bab", 25, -8000000L))
    val t = UnigramLm.pieceLosses(pieces, vocabSize = 3, maxPieceLen = 3)
      .map(l => l.piece -> l).toMap
    // single chars: alt = unk floor, always kept
    assert(t("a").alt_micro == UnigramLm.DefaultUnkLp && t("a").kept)
    assert(t("b").kept)
    // ab's alternative: [a, b] = -6.1e6; loss = 120 * (-5.5e6 + 6.1e6)
    assert(t("ab").alt_micro == -6100000L && t("ab").loss_micro == 120L * 600000L)
    assert(t("ba").alt_micro == -6100000L && t("ba").loss_micro == 110L * 700000L)
    // bab's alternative may NOT use bab itself: best of [ba,b]=-8.5e6 / [b,ab]=-8.6e6
    assert(t("bab").alt_micro == -8500000L && t("bab").loss_micro == 25L * 500000L)
    // budget 1 (3 - 2 chars): highest loss wins -> ba (77e6) over ab (72e6)
    assert(t("ba").kept && !t("ab").kept && !t("bab").kept)
    // count-based prune would keep ab (120 > 110) -- the criteria differ
    val byLoss = UnigramLm.pruneByLoss(pieces, vocabSize = 3, maxPieceLen = 3)
    assert(byLoss.map(_.piece).toSet == Set("a", "b", "ba"))
    // survivors re-quantized over their own total
    val total = byLoss.map(_.count).sum
    byLoss.foreach(p => assert(p.lp_micro == UnigramLm.lpMicro(p.count, total)))
  }

  test("lossPrune trainers agree piece-for-piece (local == distributed)") {
    import spark.implicits._
    val docs = Seq(
      "abab abab baba", "abab abab abab", "baba abab", "ab ba abab",
      "abba abab abab", "abab").toDF("text")
    val local = UnigramLm.trainUnigramLocal(docs, "text",
      vocabSize = 6, maxPieceLen = 3, seedSize = 16, emIters = 3, lossPrune = true)
    val dist = UnigramLm.trainUnigram(docs, "text",
      vocabSize = 6, maxPieceLen = 3, seedSize = 16, emIters = 3, lossPrune = true)
    assert(local == dist, s"lossPrune trainers diverged:\nlocal=$local\ndist=$dist")
    assert(local.exists(_.piece == "a") && local.exists(_.piece == "b"))
  }

  test("quantized lp grid: floor onto 1e-6, exact for round ratios") {
    assert(UnigramLm.lpMicro(1, 1) == 0L)
    // ln(1/2) = -0.6931471805599453 -> floored micro
    assert(UnigramLm.lpMicro(1, 2) == -693148L)
    assert(UnigramLm.lpMicro(1, 2) == math.floor(math.log(0.5) * 1e6).toLong)
  }
}
