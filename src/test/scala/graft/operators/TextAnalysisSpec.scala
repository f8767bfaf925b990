package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingle count is max(1, tokens - n + 1) and shingles are distinct") {
    val genWords = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "ee")))
    val prop = Prop.forAll(genWords) { words =>
      val text = words.mkString(" ")
      val sh = Seq(text).toDF("text")
        .select(Dedup.shingles(col("text"), 3).as("s"))
        .as[Seq[String]].head()
      val expectedMax = math.max(1, words.length - 2)
      sh.nonEmpty && sh.size <= expectedMax && sh.distinct.size == sh.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("language argmax tie-break is deterministic (first profile in sorted order wins)") {
    // no stopwords at all -> every profile scores 0 -> 'de' (alphabetical first)
    val out = TextAnalysis.languageScores(Seq((1L, "xyzzy qwerty")).toDF("doc_id", "text"), "doc_id", "text")
      .select("detected").as[String].head()
    assert(out == "de")
    // an English stopword flips it
    val en = TextAnalysis.languageScores(Seq((1L, "the xyzzy")).toDF("doc_id", "text"), "doc_id", "text")
      .select("detected").as[String].head()
    assert(en == "en")
  }

  test("quality metric ratios are exact small-integer divisions") {
    val m = TextAnalysis.qualityMetrics(Seq((1L, "the the bb")).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(m.getAs[Int]("token_cnt") == 3)
    assert(m.getAs[Int]("distinct_cnt") == 2)
    assert(m.getAs[Double]("stop_ratio") == 2.0 / 3.0)
    assert(m.getAs[Double]("avg_token_len") == 8.0 / 3.0)
  }

  test("rolling fingerprint is order-sensitive, md5 fingerprint is content-exact") {
    val fp = TextAnalysis.fingerprints(
      Seq((1L, "alpha beta"), (2L, "beta alpha"), (3L, "alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(fp(0).getLong(1) != fp(1).getLong(1)) // order matters
    assert(fp(0).getLong(1) == fp(2).getLong(1)) // same content, same fp
    assert(fp(0).getString(2) == fp(2).getString(2))
  }

  test("redactPii tags every pattern, counts them, and passes clean text through") {
    val df = Seq(
      (1L, "mail a.b+c@test.org and 10.1.2.3 or call 555-123-4567 twice: x@y.io"),
      (2L, "nothing sensitive here, just 3.14 and 1-2")).toDF("id", "text")
    val out = TextAnalysis.redactPii(df, "id", "text")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L,
      "mail <EMAIL> and <IP> or call <PHONE> twice: <EMAIL>", 2, 1, 1)))
    assert(out(1) == ((2L, "nothing sensitive here, just 3.14 and 1-2", 0, 0, 0)))
  }

  test("windowed source terminates via maxIterations on a never-filling window") {
    import graft.pipeline._
    val empty = spark.range(0).selectExpr("CAST(id AS TIMESTAMP) AS ts", "id AS v")
    val p = WindowedSource.tumbling(
      "empty", _ => empty, "ts",
      from = java.time.Instant.parse("2026-01-01T00:00:00Z"),
      step = java.time.Duration.ofHours(1),
      now = () => java.time.Instant.parse("2026-01-02T00:00:00Z"))
    val res = new PipelineRunner(spark, java.nio.file.Files.createTempDirectory("graft-empty").toString)
      .run(p, (_: org.apache.spark.sql.DataFrame, _: Long) => (), maxIterations = 5)
    assert(res.epochsRun == 5)
    // every pull was empty: from never moved, to widened each epoch
    assert(res.finalState.from == java.time.Instant.parse("2026-01-01T00:00:00Z"))
  }

  test("repetitionMetrics counts duplicate n-grams; short docs are one whole-text gram") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // 7 trigrams, 3 distinct -> 4/7 repeated
      (2L, "w x y z"),           // 2 trigrams, both unique -> 0
      (3L, "hi")                 // < n tokens -> single whole-text gram
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(m(0).getAs[Int]("total_ngrams") == 7)
    assert(m(0).getAs[Int]("distinct_ngrams") == 3)
    assert(m(0).getAs[Double]("dup_ngram_frac") == math.rint(4.0 / 7.0 * 1e4) / 1e4)
    assert(m(1).getAs[Double]("dup_ngram_frac") == 0.0)
    assert(m(2).getAs[Int]("total_ngrams") == 1)
    assert(m(2).getAs[Double]("dup_ngram_frac") == 0.0)
  }

  test("urlMetrics extracts urls with ports/paths, sorted distinct domains, empty on no match") {
    val docs = Seq(
      (1L, "read https://a.example.com/x?y=1 and http://b.example.com:8080/p then https://a.example.com again"),
      (2L, "no links here")).toDF("doc_id", "text")
    val out = TextAnalysis.urlMetrics(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[scala.collection.Seq[String]]("urls").toSeq == Seq(
      "https://a.example.com/x?y=1", "http://b.example.com:8080/p", "https://a.example.com"))
    assert(out(1L).getAs[Int]("n_urls") == 3)
    assert(out(1L).getAs[scala.collection.Seq[String]]("domains").toSeq ==
      Seq("a.example.com", "b.example.com"))
    assert(out(2L).getAs[Int]("n_urls") == 0 &&
      out(2L).getAs[scala.collection.Seq[String]]("domains").isEmpty)
  }

  test("filterByDomainBlocklist drops exactly blocked docs and never broadcasts the matched-id side") {
    val docs = Seq(
      (1L, "see https://ok.example.com/a"),
      (2L, "see https://spam.bad.net/b and https://ok.example.com/c"),
      (3L, "no links"),
      (4L, "https://SPAM.bad.net case differs — regex is case-sensitive, survives")
    ).toDF("doc_id", "text")
    val blocklist = Seq("spam.bad.net").toDF("domain")
    val kept = TextAnalysis.filterByDomainBlocklist(docs, "doc_id", "text", blocklist)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
    // the anti-join side is corpus-bounded: must plan sort-merge, not broadcast
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.toLowerCase.contains("leftanti"),
      s"anti-join must be SMJ:\n$plan")
    assert(!plan.contains("BroadcastHashJoin LeftAnti"), s"matched-id set broadcast:\n$plan")
  }

  test("topNgrams: exact counts, count-desc then gram-asc tiebreak, limit respected") {
    val docs = Seq(
      "a b c a b c a b c", // "a b c" x3 (+ wraps "b c a" x2, "c a b" x2)
      "z z z z",           // "z z z" x2
      "a b c"              // +1 -> "a b c" x4
    ).toDF("text")
    val top = TextAnalysis.topNgrams(docs, "text", n = 3, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a b c", 4L), ("b c a", 2L), ("c a b", 2L)),
      s"got $top") // count desc; at count 2 the gram tiebreak orders b-c-a first
  }

  test("corpusStats: integer-sum-exact ratios on a hand-computed corpus") {
    val docs = Seq(
      (1L, "the a of and is"),        // en, 5 tokens, 5 distinct
      (2L, "the the the the"),        // en, 4 tokens, 1 distinct
      (3L, "der und ist das die")     // de, 5 tokens, 5 distinct
    ).toDF("doc_id", "text")
    val out = TextAnalysis.corpusStats(docs, "text")
      .orderBy("lang").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("de", "en"))
    val en = out(1)
    assert(en.getLong(1) == 2L && en.getLong(2) == 9L)
    assert(en.getDouble(3) == math.rint((5 + 1) / 9.0 * 10000) / 10000) // 6/9 rounded
  }

  test("flagContaminated counts distinct shared n-grams and keeps zero-match docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown", "quick brown fox"
      (2L, "totally novel text here"),   // no overlap
      (3L, "the quick brown the quick brown fox") // duplicate grams count once
    ).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox ran away").toDF("btext")
    val out = TextAnalysis.flagContaminated(docs, "doc_id", "text", bench, "btext")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("matched_ngrams") == 2)
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(1).getAs[Int]("matched_ngrams") == 0)
    assert(!out(1).getAs[Boolean]("contaminated"))
    // doc 3: distinct grams containing the benchmark's "the quick brown"
    // and "quick brown fox" — the repeat inside doc 3 must not double-count
    assert(out(2).getAs[Int]("matched_ngrams") >= 2)
    assert(out(2).getAs[Int]("matched_ngrams") ==
      TextAnalysis.flagContaminated(docs, "doc_id", "text", bench, "btext",
        broadcastBench = false)
        .filter(col("doc_id") === 3).head().getAs[Int]("matched_ngrams"))
  }

  test("dropContaminatedStateless drops exactly flagContaminated's flagged docs, stateless plan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // benchmark = slices of real corpus text, so overlap genuinely exists
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(substring(col("text"), 1, 60).as("btext"))
    for (minMatches <- Seq(1, 3)) {
      val batchSurvivors = TextAnalysis
        .flagContaminated(docs, "doc_id", "text", bench, "btext", minMatches = minMatches)
        .filter(!col("contaminated")).select("doc_id").as[Long].collect().toSet
      val streamSafe = TextAnalysis.dropContaminatedStateless(
        docs, "doc_id", "text", bench, "btext", minMatches = minMatches)
      val got = streamSafe.select("doc_id").as[Long].collect().toSet
      assert(got == batchSurvivors,
        s"minMatches=$minMatches: only-stateless=${(got -- batchSurvivors).take(3)} " +
          s"only-batch=${(batchSurvivors -- got).take(3)}")
      assert(got.size < docs.count(), "no contamination found — vacuous")
      // per-row filter: no aggregate, no join, no exchange on the doc side
      val plan = streamSafe.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange") && !plan.contains("Join"),
        s"stateless form must be a pure per-row filter:\n$plan")
    }
  }

  test("bm25TopK: hand-computed scores, rank order, unmatched query empty, windowless plan") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana banana banana"),
      (4L, "durian elderberry fig")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "apple"), (2L, "banana cherry"), (3L, "missing")).toDF("query_id", "qtext")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "query_id", "qtext", k = 2)
    val got = out.orderBy(col("query_id"), col("score").desc, col("doc_id"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L)))
    // q1/d1: idf = ln 2, tf 2, dl 3 = avgdl -> ln2 * 2*2.2 / (2 + 1.2) = ln2 * 1.375
    assert(math.abs(got.head._3 - math.log(2.0) * 1.375) < 1e-9)
    // q2/d2 (cherry): idf = ln(1 + 3.5/1.5), tf 1, dl 2 ->
    //   denom = 1 + 1.2*(0.25 + 0.75*2/3) = 1.9
    assert(math.abs(got(2)._3 - math.log(1.0 + 3.5 / 1.5) * 2.2 / 1.9) < 1e-9)
    // the per-query top-k must ride the bounded aggregator, not a window
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"bm25TopK must not use a window:\n$plan")
  }

  test("bigramPerplexity: hand-computed smoothed ppl, short docs null, held-out unseen bigrams total") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    // c(a,b)=3 c(b,a)=1; c(a·)=3 c(b·)=1; V=3
    // p(b|a)=(3+1)/(3+3)=2/3, p(a|b)=(1+1)/(1+3)=1/2
    val got = TextAnalysis.bigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 3L &&
      got(0).getDouble(2) == BigDecimal(math.cbrt(4.5)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1).getLong(1) == 1L && got(1).getDouble(2) == 1.5)
    assert(got(2).getLong(1) == 0L && got(2).isNullAt(2))
    // held-out: every bigram unseen -> p = 1/V, ppl = V exactly
    val heldOut = TextAnalysis.bigramPerplexity(
      Seq((9L, "c c c")).toDF("doc_id", "text"), "doc_id", "text",
      trainOn = Some(docs))
    assert(heldOut.collect().head.getDouble(2) == 3.0)
  }

  test("bigramPerplexityStateless equals the batch operator on the corpus; pure projection; oversized model refused") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val bc = TextAnalysis.collectBigramModel(docs, "text")
    try {
      val stateless = TextAnalysis.bigramPerplexityStateless(docs, "doc_id", "text", bc)
      val batch = TextAnalysis.bigramPerplexity(docs, "doc_id", "text")
      val sMap = stateless.select("doc_id", "n_bigrams", "ppl")
        .as[(Long, Long, Option[Double])].collect().map { case (i, n, p) => i -> (n, p) }.toMap
      val bMap = batch.as[(Long, Long, Option[Double])].collect().map { case (i, n, p) => i -> (n, p) }.toMap
      assert(sMap.keySet == bMap.keySet && sMap.nonEmpty)
      sMap.foreach { case (id, (n, p)) =>
        val (bn, bp) = bMap(id)
        assert(n == bn, s"doc $id bigram count $n vs $bn")
        // row-local fold vs aggregation sum differ only in summation order
        assert((p, bp) match {
          case (Some(a), Some(b)) => math.abs(a - b) <= 1e-9
          case (None, None)       => true
          case _                  => false
        }, s"doc $id ppl $p vs $bp")
      }
      val plan = stateless.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange") && !plan.contains("Join"),
        s"stateless scoring must stay a per-row projection:\n$plan")
    } finally { bc.destroy(); () }
    val big = intercept[IllegalArgumentException] {
      TextAnalysis.collectBigramModel(docs, "text", maxBigrams = 10)
    }
    assert(big.getMessage.contains("maxBigrams"))
  }

  test("reciprocalRankFusion: hand-computed fusion, absent docs contribute nothing, k truncates") {
    import spark.implicits._
    // leg A ranks (1,2,3); leg B ranks (2,3,4) — doc 2: 1/62 + 1/61
    val legA = Seq((1L, 1L, 3.0), (1L, 2L, 2.0), (1L, 3L, 1.0)).toDF("query_id", "doc_id", "score")
    val legB = Seq((1L, 2L, 9.0), (1L, 3L, 8.0), (1L, 4L, 7.0)).toDF("query_id", "doc_id", "score")
    val got = TextAnalysis.reciprocalRankFusion(Seq(legA, legB), "query_id", "doc_id", "score", k = 3)
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(2L, 3L, 1L)) // doc 4 (rank-3 in one leg only) truncated at k=3
    assert(math.abs(got.head._3 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(got(2)._3 - 1.0 / 61) < 1e-12) // doc 1: leg A rank 1 only
  }

  test("hashedLinearScore: fold matches an independent reimplementation; pure projection plan") {
    import spark.implicits._
    val weights = (0 until 16).map(i => (i - 8) / 4.0)
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(docs, "doc_id", "text", weights, bias = 0.25)
    val got = out.orderBy("doc_id").select("doc_id", "quality_score")
      .as[(Long, Double)].collect().toMap
    def bucket(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 16).toInt
    }
    def expected(text: String): Double = {
      val z = text.split(" ").foldLeft(0.25)((acc, t) => acc + weights(bucket(t)))
      BigDecimal(1.0 / (1.0 + math.exp(-z))).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L) == expected("alpha beta gamma"))
    assert(got(2L) == expected("delta"))
    assert(got(3L) == expected("")) // split("") -> [""]: one empty-token bucket
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"hashedLinearScore must stay a per-row projection:\n$plan")
  }

  test("bm25TopK scoreScale: quantized selection collapses ulp ties to the doc-id rule") {
    // Four identical docs plus two length-variants: with b=0 the identical
    // docs score an EXACT theoretical tie, so raw-score selection at a
    // boundary is summation-order noise. scoreScale=4 must (a) emit
    // rounded scores, (b) resolve the tie straddling k to the lowest ids.
    val docs = Seq(
      (10L, "term pad"), (11L, "term pad"), (12L, "term pad"), (13L, "term pad"),
      (14L, "term"), (15L, "term pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "term")).toDF("query_id", "qtext")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "query_id", "qtext",
      k = 3, b = 0.0, scoreScale = 4)
      .orderBy(col("score").desc, col("doc_id"))
      .as[(Long, Long, Double)].collect().toSeq
    // b=0: every doc containing "term" once scores identically -> 6-way
    // rounded tie -> lowest three doc ids survive
    assert(got.map(_._2) == Seq(10L, 11L, 12L), s"got $got")
    got.foreach { case (_, _, s) =>
      assert(s == BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"score $s not quantized to 4 decimals")
    }
  }

  test("q90 corpus: raw leg scores keep a measured gap from every rounding boundary") {
    // The quantize-then-rank oracle contract is only engine-stable if no
    // true score sits within float noise (~1e-14 across libm/summation
    // order) of a 0.5e-4 rounding boundary. Measured on the sf0.01 gate
    // corpus: min distance 7.9e-10 (legB) — pinned here at 1e-11 so a
    // testdata regeneration that lands a score on a boundary fails loudly
    // instead of flaking the correctness gate.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val queries = Seq((1L, "batch join"), (2L, "customer query table"))
      .toDF("query_id", "qtext")
    for (b <- Seq(0.75, 0.0)) {
      val raw = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "query_id", "qtext",
        k = Int.MaxValue, b = b)
        .select(col("score")).as[Double].collect()
      assert(raw.nonEmpty)
      val minDist = raw.map { s =>
        val f = (s * 1e4) % 1.0
        math.abs(f - 0.5) * 1e-4
      }.min
      assert(minDist > 1e-11,
        f"b=$b: a raw score sits $minDist%.2e from a rounding boundary — " +
          "quantized ranks are no longer engine-stable on this corpus")
    }
  }

  test("bm25TopK: k truncates per query with ties to the lowest doc id") {
    val docs = Seq(
      (1L, "term"), (2L, "term"), (3L, "term"), (4L, "term")  // identical docs: equal scores
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "term")).toDF("query_id", "qtext")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "query_id", "qtext", k = 2)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 2L))
  }

  test("gopherQualityFlags: hand-computed metrics on a structured document") {
    // 3 lines; words: [the, cat, and, the, dog, -, item, wait...]
    val text = "the cat and the dog\n- item\nwait..."
    val r = TextAnalysis.gopherQualityFlags(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_words") == 8L)
    // chars: 3+3+3+3+3 + 1+4 + 7 = 27 -> 27/8 = 3.375
    assert(r.getAs[Double]("mean_word_len") == 3.375)
    // one "..." in 8 words
    assert(r.getAs[Double]("symbol_ratio") == 0.125)
    assert(r.getAs[Double]("bullet_frac") == round3(1.0 / 3))
    assert(r.getAs[Double]("ellipsis_frac") == round3(1.0 / 3))
    // "-" has no alphabetic char -> 7/8
    assert(r.getAs[Double]("alpha_frac") == 0.875)
    // distinct stops present: the, and -> 2 (repeat of "the" counts once)
    assert(r.getAs[Long]("stop_hits") == 2L)
    assert(!r.getAs[Boolean]("f_words") && r.getAs[Boolean]("f_mean_len") &&
      !r.getAs[Boolean]("f_symbols") && r.getAs[Boolean]("f_bullets") &&
      !r.getAs[Boolean]("f_ellipsis") && r.getAs[Boolean]("f_alpha") &&
      r.getAs[Boolean]("f_stops"))
    assert(!r.getAs[Boolean]("keep"))
  }

  private def round3(x: Double): Double = math.round(x * 1e4) / 1e4

  test("gopherQualityFlags: zero-word document emits null ratios and keep = false") {
    val r = TextAnalysis.gopherQualityFlags(Seq((1L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_word_len")))
    assert(r.isNullAt(r.fieldIndex("alpha_frac")))
    assert(!r.getAs[Boolean]("keep"))
  }

  test("gopherQualityFlags: a clean long document keeps") {
    val body = (1 to 60).map(i => s"word$i").mkString(" ")
    val text = s"the cat is of the and that have with sort $body"
    val r = TextAnalysis.gopherQualityFlags(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(r.getAs[Boolean]("keep"), r.toString)
  }

  test("c4Clean: line rules, doc flags, and sentence counting on a structured doc") {
    val text = Seq(
      "This line has plenty of words and ends properly.", // kept
      "Too short here.",                                  // < 5 words
      "this line has enough words but no terminal punct", // no [.!?"]
      "Please enable JavaScript to continue reading now.", // javascript
      "Another good line closes with a question mark?"    // kept
    ).mkString("\n")
    val r = TextAnalysis.c4Clean(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(r.getAs[String]("clean_text") ==
      "This line has plenty of words and ends properly.\n" +
        "Another good line closes with a question mark?")
    assert(r.getAs[Long]("n_lines") == 5L && r.getAs[Long]("n_kept_lines") == 2L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(!r.getAs[Boolean]("has_lorem") && !r.getAs[Boolean]("has_brace"))
    assert(!r.getAs[Boolean]("keep"), "2 sentences < 3 must not keep")

    val flagged = TextAnalysis.c4Clean(Seq(
      (1L, "Lorem Ipsum dolor sit amet today."),
      (2L, "A code block { x } appeared right here today."),
      (3L, "One good sentence here. Two good sentences here! Three good sentences here?"))
      .toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(flagged(0).getAs[Boolean]("has_lorem") && !flagged(0).getAs[Boolean]("keep"))
    assert(flagged(1).getAs[Boolean]("has_brace") && !flagged(1).getAs[Boolean]("keep"))
    assert(flagged(2).getAs[Boolean]("keep"), flagged(2).toString)
  }

  test("c4Clean is a shuffle-free per-row projection") {
    val df = TextAnalysis.c4Clean(Seq((1L, "a. b. c.")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("zipfFit recovers the planted power-law slope") {
    // token w_r appears floor(2^14 / r) times: an exact-ish zipf(1) corpus
    val corpus = (1 to 200).flatMap(r =>
      Seq.fill(16384 / r)(f"w$r%03d")).mkString(" ")
    val got = TextAnalysis.zipfFit(Seq(Tuple1(corpus)).toDF("text"), "text", topRanks = 200)
      .head()
    assert(got.getAs[Long]("n_ranks") == 200L)
    val slope = got.getAs[Double]("slope")
    assert(slope > -1.05 && slope < -0.95, s"planted zipf(1) slope came out $slope")
    // one distinct token: zero x-variance, fit undefined -> null, no ANSI error
    val degenerate = TextAnalysis.zipfFit(Seq(Tuple1("a a a a")).toDF("text"), "text", 10)
      .head()
    assert(degenerate.getAs[Long]("n_ranks") == 1L && degenerate.isNullAt(1))
  }

  test("charTrigrams: short-text guard and lowercase folding") {
    val got = Seq("ab", "", "AbCd").toDF("t")
      .select(TextAnalysis.charTrigrams(col("t")).as("g"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(Seq.empty, Seq.empty, Seq("abc", "bcd")))
  }

  test("trigram lang-id: a planted two-language corpus classifies perfectly, any layout") {
    // two disjoint character distributions; labels correlate with content
    // (unlike the driver corpus, whose lang column is independent of text)
    def sentence(words: Seq[String], i: Long): String =
      (0 until 12).map(j => words(((i + j) % words.size).toInt)).mkString(" ")
    val aWords = Seq("alpha", "apple", "anchor", "amber", "atlas")
    val bWords = Seq("zebra", "zulu", "zigzag", "zenith", "zephyr")
    val corpus = (0L until 200L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "zz"
      (i, lang, sentence(if (lang == "aa") aWords else bWords, i))
    }.toDF("doc_id", "lang", "text")
    val profiles = TextAnalysis.trainTrigramProfiles(
      corpus.filter(col("doc_id") < 100), "lang", "text", topN = 20)
    assert(profiles.groupBy("lang").count().select("count").as[Long].collect()
      .forall(_ == 20L))
    val pred = TextAnalysis.classifyByTrigramProfiles(
      corpus.filter(col("doc_id") >= 100), "doc_id", "text", profiles, topN = 20)
    val joined = pred.join(corpus.select(col("doc_id"), col("lang")), "doc_id")
    assert(joined.filter(col("pred_lang") =!= col("lang")).isEmpty,
      "every held-out doc must classify to its planted language")
    // layout independence (integer arithmetic end to end)
    val again = TextAnalysis.classifyByTrigramProfiles(
      corpus.filter(col("doc_id") >= 100).repartition(13), "doc_id", "text", profiles, topN = 20)
    assert(pred.except(again).isEmpty && again.except(pred).isEmpty)
  }

  test("normalizeText: lowercase + accent fold + whitespace collapse, idempotent") {
    val in = Seq((1L, "  HÉLLO\t WÖRLD  ÀÉÎÕÜ façade œuvre Ñoño  ")).toDF("doc_id", "text")
    val out = in.select(TextAnalysis.normalizeText(col("text")).as("n")).as[String].head()
    assert(out == "hello world aeiou facade ouvre nono")
    // idempotence: a second pass is the identity
    val twice = in.select(TextAnalysis.normalizeText(
      TextAnalysis.normalizeText(col("text"))).as("n")).as[String].head()
    assert(twice == out)
    // the fold map stays 1:1 (translate's contract)
    assert(TextAnalysis.AccentFrom.length == TextAnalysis.AccentTo.length)
    // stages toggle independently; the fold map is lowercase-only by
    // design (lower runs first), so skipping lowercase leaves uppercase
    // accents unfolded while lowercase ones still fold
    val keepCase = in.select(TextAnalysis.normalizeText(col("text"), lowercase = false).as("n"))
      .as[String].head()
    assert(keepCase.contains("Ö") && keepCase.contains("facade"))
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG on a planted ranking") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // query 1: d1 (irrelevant) outranks d2 (rel 2); d3 is cut by k=2;
    // d9 (rel 1) was never retrieved — recall and ideal DCG must see it
    val ranked = Seq((1L, 1L, 3.0), (1L, 2L, 2.0), (1L, 3L, 1.0))
      .toDF("query_id", "doc_id", "score")
    val qrels = Seq((1L, 2L, 2), (1L, 9L, 1)).toDF("query_id", "doc_id", "rel")
    val r = TextAnalysis.retrievalMetrics(
      ranked, "query_id", "doc_id", "score", qrels, "rel", k = 2).collect()(0)
    assert(r.getDouble(1) == 0.5) // 1 of 2 relevant retrieved
    assert(r.getDouble(2) == 0.5) // first hit at rank 2
    val dcg = 2.0 / log2(3.0)
    val idcg = 2.0 / log2(2.0) + 1.0 / log2(3.0)
    assert(math.abs(r.getDouble(3) - dcg / idcg) < 1e-12)

    // a query with NO relevant retrieval but existing qrels: zeros, not null
    val ranked2 = Seq((7L, 1L, 1.0)).toDF("query_id", "doc_id", "score")
    val qrels2 = Seq((7L, 9L, 1)).toDF("query_id", "doc_id", "rel")
    val z = TextAnalysis.retrievalMetrics(
      ranked2, "query_id", "doc_id", "score", qrels2, "rel", k = 2).collect()(0)
    assert(z.getDouble(1) == 0.0 && z.getDouble(2) == 0.0 && z.getDouble(3) == 0.0)
  }

  test("trainNaiveBayesWeights: complete domain, conserved counts, closed-form weights") {
    val docs = Seq(
      ("excellent prose with care", true),
      ("careful excellent writing", true),
      ("spam spam click here", false),
      ("click spam now", false),
      ("neutral words only", true)
    ).toDF("text", "label")
    val b = 8
    val w = TextAnalysis.trainNaiveBayesWeights(docs, "text", col("label"), buckets = b)
      .orderBy("bucket").collect()
    // every bucket present exactly once, 0..B-1
    assert(w.map(_.getInt(0)).toSeq == (0 until b))
    // counts conserve the per-class token totals (tokens = whitespace split)
    val tpos = 4 + 3 + 3 // tokens in the three positive docs
    val tneg = 4 + 3
    assert(w.map(_.getLong(1)).sum == tpos)
    assert(w.map(_.getLong(2)).sum == tneg)
    // each weight is the closed-form ln-ratio of its integer counts
    w.foreach { r =>
      val expected =
        math.log((r.getLong(1) + 1.0) / (tpos + b.toDouble)) -
          math.log((r.getLong(2) + 1.0) / (tneg + b.toDouble))
      assert(math.abs(r.getDouble(3) - expected) < 1e-12)
    }
  }

  test("NB-trained model separates the planted classes through hashedLinearScore") {
    // 'spamword' appears only in negatives, 'goodword' only in positives;
    // the trained log-odds weights must rank a fresh goodword doc above a
    // fresh spamword doc through the SAME scorer q92 uses
    val train = (1 to 20).map(i => (s"goodword filler$i", true)) ++
      (1 to 20).map(i => (s"spamword filler$i", false))
    val df = train.toDF("text", "label")
    val b = 32
    val weights = TextAnalysis.collectNaiveBayesModel(
      TextAnalysis.trainNaiveBayesWeights(df, "text", col("label"), buckets = b), buckets = b)
    val prior = TextAnalysis.naiveBayesPrior(df, col("label")).collect()(0)
    assert(prior.getLong(0) == 20 && prior.getLong(1) == 20 && prior.getDouble(2) == 0.0)
    val scored = TextAnalysis.hashedLinearScore(
      Seq((1L, "goodword goodword"), (2L, "spamword spamword")).toDF("doc_id", "text"),
      "doc_id", "text", weights, bias = prior.getDouble(2))
      .orderBy("doc_id").collect()
    assert(scored(0).getAs[Double]("quality_score") > scored(1).getAs[Double]("quality_score"))
    assert(scored(0).getAs[Double]("quality_score") > 0.5)
    assert(scored(1).getAs[Double]("quality_score") < 0.5)
  }

  test("canonicalizeUrl: variants collapse, path case kept, idempotent") {
    val urls = Seq(
      "HTTP://WWW.Example.com/Path/A/?b=2&a=1&utm_source=x#frag",
      "https://example.com/Path/A?a=1&b=2",
      "http://Example.com:80/Path/A/?utm_campaign=y&a=1&b=2",
      "https://www.example.com:443/Path/A?b=2&a=1#top"
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }
    val out = urls.toDF("id", "url")
      .select(col("id"), TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .orderBy("id").as[(Long, String)].collect()
    // all four variants collapse to ONE canonical form
    assert(out.map(_._2).distinct.toSeq == Seq("example.com/Path/A?a=1&b=2"))

    // path case is preserved; host case is not
    val cased = Seq((1L, "http://HOST.COM/CaseSensitive/Path")).toDF("id", "url")
      .select(TextAnalysis.canonicalizeUrl(col("url"))).as[String].head()
    assert(cased == "host.com/CaseSensitive/Path")

    // utm-only query drops the '?' entirely; bare host stays bare
    val utmOnly = Seq((1L, "https://a.com/x?utm_source=s")).toDF("id", "url")
      .select(TextAnalysis.canonicalizeUrl(col("url"))).as[String].head()
    assert(utmOnly == "a.com/x")
    val bare = Seq((1L, "https://a.com")).toDF("id", "url")
      .select(TextAnalysis.canonicalizeUrl(col("url"))).as[String].head()
    assert(bare == "a.com")

    // idempotent: canonicalizing a canonical form is the identity
    val twice = urls.toDF("id", "url")
      .select(TextAnalysis.canonicalizeUrl(TextAnalysis.canonicalizeUrl(col("url"))).as("c"))
      .as[String].collect()
    assert(twice.toSeq == out.map(_._2).toSeq)

    // a non-default port is KEPT (it addresses a different origin)
    val ported = Seq((1L, "http://a.com:8080/x")).toDF("id", "url")
      .select(TextAnalysis.canonicalizeUrl(col("url"))).as[String].head()
    assert(ported == "a.com:8080/x")
  }

  test("ngramNovelty: seen text scores 0, unseen 1, the mix counts novel grams exactly") {
    val ref = Seq("alpha beta gamma delta").toDF("text")
    val docs = Seq(
      (1L, "alpha beta gamma delta"),       // all 2 grams known
      (2L, "zeta eta theta iota"),          // all 2 grams novel
      (3L, "alpha beta gamma zeta eta")     // grams: abg known; bgz, gze novel
    ).toDF("doc_id", "text")
    val r = TextAnalysis.ngramNovelty(docs, "doc_id", "text", ref, "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((2L, 0L, 0.0)))
    assert(r(2L) == ((2L, 2L, 1.0)))
    assert(r(3L) == ((3L, 2L, 0.6667)))
  }

  test("scriptProfile: exact class fractions and the mojibake fingerprints") {
    val r = TextAnalysis.scriptProfile(
      Seq((1L, "ab 12!"), (2L, "ok cafÃ©"), (3L, "plain text"), (4L, "")).toDF("id", "t"),
      "id", "t")
      .as[(Long, Double, Double, Double, Double, Double, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    // "ab 12!": 6 chars = 2 alpha, 2 digit, 1 space, 1 punct
    assert(r(1L) == ((1L, 0.3333, 0.3333, 0.1667, 0.1667, 0.0, false)))
    assert(r(2L)._7 && !r(3L)._7)
    assert(r(4L) == ((4L, 0.0, 0.0, 0.0, 0.0, 0.0, false)))
  }

  test("chiSquaredKeywords: a group-exclusive term dominates its group's ranking") {
    val docs = (1 to 40).map { i =>
      if (i % 2 == 0) (s"common filler words zebra", "g1")
      else (s"common filler words yonder", "g2")
    }.toDF("text", "lang")
    val top = TextAnalysis.chiSquaredKeywords(docs, "lang", "text", minCount = 5, k = 2)
      .filter(col("rnk") === 1)
      .select(col("grp"), col("term")).as[(String, String)].collect().toMap
    assert(top == Map("g1" -> "zebra", "g2" -> "yonder"))
  }

  test("rm3Expansion: feedback terms join the query model; a no-match query keeps only its own terms") {
    val docs = Seq(
      (1L, "spark shuffle join partition"),
      (2L, "spark shuffle memory spill"),
      (3L, "gardening tulip soil water sun"))
      .toDF("doc_id", "text")
    val queries = Seq((1L, "spark shuffle"), (2L, "zzzz")).toDF("query_id", "qtext")
    val got = TextAnalysis.rm3Expansion(docs, "doc_id", "text",
      queries, "query_id", "qtext", fbDocs = 2, fbTerms = 4, origWeight = 0.5)
      .as[(Long, String, Double, Int)].collect()
    val q1 = got.filter(_._1 == 1L)
    val q1terms = q1.map(_._2).toSet
    // original terms survive; feedback surfaces doc-1/2 vocabulary, never
    // the gardening doc's
    assert(q1terms.contains("spark") && q1terms.contains("shuffle"))
    assert(q1terms.intersect(Set("join", "partition", "memory", "spill")).nonEmpty)
    assert(q1terms.intersect(Set("tulip", "soil", "gardening")).isEmpty)
    // weights positive, quantized, rank is dense 1..n by (weight desc, term)
    assert(q1.forall(_._3 > 0.0))
    assert(q1.map(_._4).sorted.toSeq == (1 to q1.length).toSeq)
    val sortedQ1 = q1.sortBy(_._4)
    assert(sortedQ1.zip(sortedQ1.tail).forall { case (hi, lo) =>
      hi._3 > lo._3 || (hi._3 == lo._3 && hi._2 < lo._2) })
    // interpolated mass is bounded: alpha*1 + (1-alpha)*(<=1)
    assert(q1.map(_._3).sum <= 1.0 + 1e-6)
    // the no-match query: exactly its own term at alpha * P(t|q) = 0.5
    val q2 = got.filter(_._1 == 2L)
    assert(q2.length == 1 && q2.head._2 == "zzzz" && q2.head._3 == 0.5)
    // determinism
    val again = TextAnalysis.rm3Expansion(docs, "doc_id", "text",
      queries, "query_id", "qtext", fbDocs = 2, fbTerms = 4, origWeight = 0.5)
      .as[(Long, String, Double, Int)].collect()
    assert(got.sortBy(r => (r._1, r._4)).toSeq == again.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("rankBiasedOverlap: identical runs score the full prefix mass; one swap costs exactly its window") {
    // run = docs 1..5 scored descending for one query
    val runA = (1 to 5).map(i => (1L, i.toLong, 10.0 - i)).toDF("q", "doc", "score")
    val ident = TextAnalysis.rankBiasedOverlap(runA, runA, "q", "doc", "score",
      p = 0.9, depth = 5).as[(Long, Long, Double)].head()
    // every doc enters at m = its own rank; sum of W[m] over m=1..5 on the
    // grid, times (1-p) — the operator's own arithmetic, pinned end to end
    val wq = TextAnalysis.rboWeightGrid(0.9, 5)
    def rbo(ms: Seq[Int]) = graft.functions.Quantize.scaledFloorDouble(
      ms.map(m => wq(m - 1)).sum.toDouble / 1e9 * (1.0 - 0.9), 6)
    assert(ident == ((1L, 5L, rbo(Seq(1, 2, 3, 4, 5)))))
    // swapping ranks 1 and 2 in run B: docs 1 and 2 now enter at m=2
    val runB = Seq((1L, 2L, 10.0), (1L, 1L, 9.0), (1L, 3L, 7.0), (1L, 4L, 6.0), (1L, 5L, 5.0))
      .toDF("q", "doc", "score")
    val swapped = TextAnalysis.rankBiasedOverlap(runA, runB, "q", "doc", "score",
      p = 0.9, depth = 5).as[(Long, Long, Double)].head()
    assert(swapped == ((1L, 5L, rbo(Seq(2, 2, 3, 4, 5)))))
    assert(swapped._3 < ident._3)
    // disjoint runs produce NO row for the query (documented: overlap-
    // positive queries only)
    val runC = (1 to 5).map(i => (1L, 100L + i, 10.0 - i)).toDF("q", "doc", "score")
    assert(TextAnalysis.rankBiasedOverlap(runA, runC, "q", "doc", "score").count() == 0)
  }

  test("tfidfCosinePairs: identical docs score 1.0; maxDf drops too-common terms") {
    val docs = Seq((1L, "apple banana"), (2L, "apple banana"), (3L, "cherry"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfCosinePairs(docs, "doc_id", "text",
      maxDf = 2, threshold = 0.5, topK = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 1.0))) // d3 shares nothing
    // every doc shares only one term with df=3 > maxDf=2 -> no candidates
    val common = Seq((1L, "apple x"), (2L, "apple y"), (3L, "apple z"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.tfidfCosinePairs(common, "doc_id", "text",
      maxDf = 2, threshold = 0.1, topK = 10).count() == 0L)
    intercept[IllegalArgumentException](TextAnalysis.tfidfCosinePairs(
      docs, "doc_id", "text", maxDf = 1, threshold = 0.5, topK = 10))
  }

  test("heapsLaw: saturated vocabulary fits beta = 0, k = |vocab|") {
    // every doc repeats the same two tokens: V(n) is flat at 2
    val docs = (1L to 10L).map(i => (i, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.heapsLaw(docs, "doc_id", "text", buckets = 5).collect().head
    assert(r.getLong(0) == 5L && r.getDouble(1) == 0.0 && r.getDouble(2) == 2.0)
  }

  test("heapsLaw: fully novel tokens fit beta = 1, k = 1 (V(n) = n exactly)") {
    val docs = (1L to 20L).map(i => (i, s"t${i}a t${i}b")).toDF("doc_id", "text")
    val r = TextAnalysis.heapsLaw(docs, "doc_id", "text", buckets = 5).collect().head
    // ln V = ln n pointwise (identical quantized values) -> slope exactly 1
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0)
    intercept[IllegalArgumentException](
      TextAnalysis.heapsLaw(docs, "doc_id", "text", buckets = 1))
  }

  test("coverageCard: exact hapax/dis counts and Good-Turing unseen mass on a planted mix") {
    // 4 hapax, 3 dis-legomena, 2 heavy tokens (10 each): N = 30, V = 9
    val text = ((1 to 4).map(i => s"h$i") ++
      (1 to 3).flatMap(i => Seq.fill(2)(s"d$i")) ++
      Seq.fill(10)("x") ++ Seq.fill(10)("y")).mkString(" ")
    val r = TextAnalysis.coverageCard(Seq(text).toDF("text"), "text").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((30L, 9L, 4L, 3L)))
    assert(math.abs(r.getDouble(4) - 4.0 / 30.0) < 1e-6, "unseen mass = n1/N")
    assert(math.abs(r.getDouble(5) - 4.0 / 9.0) < 1e-6, "hapax share = n1/V")
    // empty tokens are excluded like every token path in this file
    val pad = TextAnalysis.coverageCard(Seq("a  b   a").toDF("text"), "text").collect().head
    assert((pad.getLong(0), pad.getLong(1), pad.getLong(2)) == ((3L, 2L, 1L)))
  }
  test("Kneser-Ney: continuation backoff beats raw frequency (the Francisco effect); discount math exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // "francisco" is FREQUENT but only ever follows "san" (one context);
    // "x" is rarer as a unigram but completes three contexts
    val train = Seq("san francisco san francisco san francisco a x b x c x").toDF("text")
    val score = Seq((1L, "zzz francisco"), (2L, "zzz x")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramPerplexityKneserNey(score, "doc_id", "text",
        trainOn = Some(train))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // unseen context "zzz" backs off to p_cont: N1r(x)=3 > N1r(francisco)=1,
    // so the versatile token scores LOWER perplexity despite lower frequency
    assert(got(2L) < got(1L),
      s"continuation backoff must prefer x (ppl ${got(2L)}) over francisco (ppl ${got(1L)})")
    // exact discount arithmetic on a seen bigram: doc = "san francisco";
    // c12=3, c1(san)=3, N1l(san)=1, pcont(francisco)=(1+1)/(T+V).
    // the train text is ONE token stream, so cross-phrase bigrams count:
    // (san,francisco)x3 (francisco,san)x2 (francisco,a) (a,x) (x,b)
    // (b,x) (x,c) (c,x) -> 8 distinct types over 6 distinct unigrams
    val tTypes = 8.0
    val v = 6.0
    val pcont = (1.0 + 1.0) / (tTypes + 1.0 * v)
    val expectP = (3.0 - 0.75) / 3.0 + 0.75 * 1.0 / 3.0 * pcont
    val one = TextAnalysis.bigramPerplexityKneserNey(
        Seq((9L, "san francisco")).toDF("doc_id", "text"), "doc_id", "text",
        trainOn = Some(train))
      .collect().head
    assert(one.getLong(1) == 1L)
    assert(math.abs(one.getDouble(2) - math.rint(1.0 / expectP * 1e4) / 1e4) < 1e-9,
      s"ppl ${one.getDouble(2)} vs expected ${1.0 / expectP}")
  }
  test("trigram Kneser-Ney: two-level backoff arithmetic exact on a hand-derived corpus") {
    import spark.implicits._
    // train "a b c a b c a b d": c123(a,b,c)=2, ctx12(a,b)=3, n3(a,b)=2;
    // level 2 for (b,c): n12=1 (only w1=a), nctx2(b)=2, nl2(b)=2;
    // pcont(c)=(1+1)/(T2=4 + V=4)=0.25
    val train = Seq("a b c a b c a b d").toDF("text")
    val got = TextAnalysis.trigramPerplexityKneserNey(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
        trainOn = Some(train))
      .collect().head
    assert(got.getLong(1) == 1L)
    val pcont = (1.0 + 1.0) / (4.0 + 1.0 * 4.0)
    val p2 = math.max(1.0 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * pcont
    val p3 = math.max(2.0 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 * p2
    assert(math.abs(got.getDouble(2) - math.rint(1.0 / p3 * 1e4) / 1e4) < 1e-9,
      s"ppl ${got.getDouble(2)} vs expected ${1.0 / p3}")
    // an unseen (w1,w2) context must skip to the continuation level, not crash
    val oov = TextAnalysis.trigramPerplexityKneserNey(
        Seq((2L, "zz qq c")).toDF("doc_id", "text"), "doc_id", "text",
        trainOn = Some(train)).collect().head
    assert(oov.getLong(1) == 1L && !oov.isNullAt(2))
  }
}
