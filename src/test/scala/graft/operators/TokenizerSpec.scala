package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(texts: String*) = texts.toSeq.toDF("text")

  test("trainBpe learns the classic merges on a planted corpus (hand-computed)") {
    // 5x "hug", 2x "pug", 3x "pun": pair counts round 1 —
    // (h,u)=5 (u,g)=7 (p,u)=5 (u,n)=3 -> merge (u,g);
    // round 2: (h,ug)=5 (p,ug)=2 (p,u)=3 (u,n)=3 -> merge (h,ug).
    val df = corpus("hug hug hug hug hug", "pug pug", "pun pun pun")
    val merges = Tokenizer.trainBpe(df, "text", merges = 2)
      .orderBy(col("iter"))
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(merges == Seq((1, "u", "g", "ug", 7L), (2, "h", "ug", "hug", 5L)))
  }

  test("tie in pair counts breaks lexicographically (l_sym then r_sym)") {
    // "ab" and "aa" each twice: pairs (a,b)=2 and (a,a)=2 -> (a,a) wins.
    val m = Tokenizer.trainBpe(corpus("ab ab aa aa"), "text", merges = 1)
      .select("l_sym", "r_sym").as[(String, String)].head()
    assert(m == ("a", "a"))
  }

  test("trainBpe stops early when the vocabulary has no adjacent pairs left") {
    // single-char words only: zero pairs from the start
    assert(Tokenizer.trainBpe(corpus("a b", "c a"), "text", merges = 3).count() == 0L)
    // one two-char word: first merge consumes the only pair, then stop
    val got = Tokenizer.trainBpe(corpus("ab ab", "c d"), "text", merges = 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", "ab", 2L)))
  }

  test("trainBpeLocal is merge-for-merge identical to trainBpe on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    val dist = Tokenizer.mergesOf(Tokenizer.trainBpe(docs, "text", merges = 6))
    val local = Tokenizer.trainBpeLocal(docs, "text", merges = 6).map(m => (m.l_sym, m.r_sym))
    assert(dist == local)
    // and the distributed run is deterministic across invocations
    val again = Tokenizer.mergesOf(Tokenizer.trainBpe(docs, "text", merges = 6))
    assert(dist == again)
  }

  test("bpeTokens applies merges greedily left-to-right, non-overlapping") {
    // merge (a,a) on "aaaa" -> [aa, aa]; on "aaa" -> [aa, a]
    val out = Seq("aaaa aaa").toDF("text")
      .select(Tokenizer.bpeTokens(col("text"), Seq(("a", "a"))).as("t"))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "aa", "aa", "a"))
  }

  test("merge order matters and is applied in training order") {
    // (u,g) then (h,ug): "hug" -> |h||u||g| -> |h||ug| -> |hug|
    val merges = Seq(("u", "g"), ("h", "ug"))
    val out = Seq("hug hugs").toDF("text")
      .select(Tokenizer.bpeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(out == Seq("hug", "hug", "s"))
  }

  test("bpeTokenCount: empty/no-word documents count 0; case folds; separators split") {
    // "HUG-pun" -> words [hug, pun]; hug merges to 1 token, pun stays p/u/n
    val out = Seq(("", 0), ("?!.", 0), ("HUG-pun", 4))
      .toDF("text", "expect")
      .select(Tokenizer.bpeTokenCount(col("text"), Seq(("u", "g"), ("h", "ug"))).as("n"),
        col("expect"))
      .as[(Int, Int)].collect()
    out.foreach { case (n, e) => assert(n == e) }
  }

  test("trainBpeLocal maxVocab guard fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Tokenizer.trainBpeLocal(corpus("a b c d e f"), "text", merges = 1, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("a merged symbol participates in later merges (multi-char pair matching is exact)") {
    // corpus chosen so "er" merges first, then (v,er): "ver" words dominate
    val df = corpus("ver ver ver ver", "er er er")
    val merges = Tokenizer.trainBpe(df, "text", merges = 2)
      .orderBy(col("iter")).select("merged").as[String].collect().toSeq
    assert(merges == Seq("er", "ver"))
    // and application: "vver" under those merges -> [v, ver]
    val toks = Seq("vver").toDF("text")
      .select(Tokenizer.bpeTokens(col("text"), Seq(("e", "r"), ("v", "er"))).as("t"))
      .as[Seq[String]].head()
    assert(toks == Seq("v", "ver"))
  }

  test("compressionCard: integer totals and one-division ratio, per group") {
    // merges (e,r): "er er" -> 2 subwords; "ab" -> 2 subwords a|b
    val df = Seq(("en", "er er"), ("en", "ab"), ("de", "xyz"))
      .toDF("lang", "text")
    val card = Tokenizer.compressionCard(df, "text", "lang", Seq(("e", "r")))
      .orderBy("lang").collect()
    assert(card.length == 2)
    val de = card(0); val en = card(1)
    assert(de.getString(0) == "de" && de.getLong(1) == 1)
    assert(de.getLong(2) == 3 && de.getLong(3) == 1 && de.getLong(4) == 3) // x y z unmerged
    assert(de.getAs[Double]("chars_per_token") == 1.0)
    assert(en.getString(0) == "en" && en.getLong(1) == 2)
    assert(en.getLong(2) == 7)      // "er er" 5 chars + "ab" 2
    assert(en.getLong(3) == 3)      // 2 + 1 whitespace tokens
    assert(en.getLong(4) == 4)      // [er, er] + [a, b]
    assert(en.getAs[Double]("chars_per_token") == 1.75)
  }

  test("bpeDropoutTokens: p=0 is bpeTokens exactly, p=1 is the char split, pieces re-concatenate") {
    val merges = Seq(("e", "r"), ("er", "s"))
    val df = corpus("er ers erser", "unrelated words here", "ererer")
    val rows = df.select(
      Tokenizer.bpeTokens(col("text"), merges).as("plain"),
      Tokenizer.bpeDropoutTokens(col("text"), merges, dropMicro = 0, salt = "e0").as("p0"),
      Tokenizer.bpeDropoutTokens(col("text"), merges, dropMicro = 1000000, salt = "e0").as("p1"),
      Tokenizer.bpeDropoutTokens(col("text"), merges, dropMicro = 500000, salt = "e0").as("half"),
      Tokenizer.bpeDropoutTokens(col("text"), merges, dropMicro = 500000, salt = "e1").as("half2"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](0), "p=0 must equal bpeTokens")
      val chars = r.getString(5).toLowerCase.replaceAll("[^a-z0-9]", "")
      assert(r.getSeq[String](2).mkString == chars && r.getSeq[String](2).forall(_.length == 1),
        "p=1 must be the pure character split")
      // any dropout level still re-concatenates to the same characters
      assert(r.getSeq[String](3).mkString == chars)
      assert(r.getSeq[String](4).mkString == chars)
    }
    // dropout can only split finer: count(p) >= count(plain), <= count(chars)
    val counts = df.select(
      size(Tokenizer.bpeTokens(col("text"), merges)).as("a"),
      size(Tokenizer.bpeDropoutTokens(col("text"), merges, 500000, "e0")).as("b"),
      size(Tokenizer.bpeDropoutTokens(col("text"), merges, 1000000, "e0")).as("c")).collect()
    counts.foreach(r => assert(r.getInt(0) <= r.getInt(1) && r.getInt(1) <= r.getInt(2)))
  }

  test("fused BPE kernel is token-for-token identical to the HOF replace fold (plain and dropout)") {
    val docs = graft.TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val merges = Tokenizer.mergesOf(
      Tokenizer.trainBpe(docs.select(col("text")), "text", merges = 3))
    val cmp = docs.select(
      Tokenizer.bpeTokens(col("text"), merges).as("fused"),
      Tokenizer.bpeTokensHof(col("text"), merges).as("hof"),
      Tokenizer.bpeDropoutTokens(col("text"), merges, 400000, "ep7").as("dfused"),
      Tokenizer.bpeDropoutTokensHof(col("text"), merges, 400000, "ep7").as("dhof"))
    assert(cmp.filter(col("fused") =!= col("hof")).count() == 0,
      "fused kernel diverged from the HOF fold")
    assert(cmp.filter(col("dfused") =!= col("dhof")).count() == 0,
      "fused dropout kernel diverged from the HOF fold")
    // and on crafted edges: self-pair runs, chained merges, empty/null-ish docs
    val edge = corpus("aaa aaaa b", "", "xyzzy abab", "A-B c.d")
    val em = Seq(("a", "a"), ("aa", "a"), ("b", "c"))
    val e = edge.select(
      Tokenizer.bpeTokens(col("text"), em).as("fused"),
      Tokenizer.bpeTokensHof(col("text"), em).as("hof"))
    assert(e.filter(col("fused") =!= col("hof")).count() == 0)
  }
}
