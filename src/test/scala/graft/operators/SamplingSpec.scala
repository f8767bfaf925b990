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

  test("tokenBudgetSample: two-phase form equals the single-window reference; budget holds modulo one straddler") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 600L).map { i =>
      val lang = if (i % 3 == 0) "de" else "en"
      (i, lang, Seq.fill((i % 17 + 3).toInt)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text").repartition(16)
    val budget = 700L
    val got = Sampling.tokenBudgetSample(docs, "doc_id", "text", Seq("lang"), budget, "mix-t")
      .select("lang", "doc_id").as[(String, Long)].collect().toSet

    // reference: one window per group over the same hash order
    val h = Sampling.keyHash(col("doc_id"), "mix-t")
    val w = Window.partitionBy("lang").orderBy("__h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = docs
      .withColumn("__h", h)
      .withColumn("__tc", size(split(col("text"), " ")).cast("long"))
      .withColumn("__prefix", coalesce(sum(col("__tc")).over(w), lit(0L)))
      .filter(col("__prefix") < budget)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(got == ref,
      s"only-2phase=${(got -- ref).take(3)} only-window=${(ref -- got).take(3)}")

    // every group fills its budget and overruns by at most one document
    val kept = docs.join(got.toSeq.toDF("lang", "doc_id"), Seq("lang", "doc_id"), "left_semi")
      .withColumn("__tc", size(split(col("text"), " ")).cast("long"))
      .groupBy("lang").agg(sum("__tc").as("total"), max("__tc").as("maxdoc"))
      .as[(String, Long, Long)].collect()
    kept.foreach { case (lang, total, maxdoc) =>
      assert(total >= budget, s"$lang under-filled: $total < $budget")
      assert(total < budget + maxdoc, s"$lang overran by more than one doc: $total")
    }

    // determinism across layouts: a different partitioning, same selection
    val again = Sampling.tokenBudgetSample(docs.repartition(3), "doc_id", "text",
      Seq("lang"), budget, "mix-t").select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(again == got)
  }

  test("tokenBudgetSampleByGroup applies each stratum's own budget (default for the rest)") {
    val docs = (1L to 600L).map { i =>
      val lang = if (i % 3 == 0) "de" else "en"
      (i, lang, Seq.fill((i % 17 + 3).toInt)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val kept = Sampling.tokenBudgetSampleByGroup(docs, "doc_id", "text", "lang",
      budgets = Seq("de" -> 100L), defaultBudget = 2000L, salt = "mix-g")
      .withColumn("__tc", size(split(col("text"), " ")).cast("long"))
      .groupBy("lang").agg(sum("__tc").as("total"), max("__tc").as("maxdoc"))
      .as[(String, Long, Long)].collect().map { case (l, t, m) => l -> (t, m) }.toMap
    val (deT, deM) = kept("de")
    val (enT, enM) = kept("en")
    assert(deT >= 100L && deT < 100L + deM, s"de budget not respected: $deT")
    assert(enT >= 2000L && enT < 2000L + enM, s"en budget not respected: $enT")
    // the listed stratum's cut is genuinely tighter than the default's
    assert(deT < enT / 4)
  }

  test("temperatureMixture: alpha=1 degenerates to a plain sample; alpha<1 flattens the group mix; rows unchanged") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"))
    // alpha = 1: every group's rate is exactly targetFraction
    val flat = Sampling.temperatureMixture(docs, "doc_id", "lang", alpha = 1.0,
      targetFraction = 0.4, salt = "tm")
      .select("doc_id").as[Long].collect().toSet
    val plain = Sampling.deterministicSample(docs, "doc_id", 0.4, "tm")
      .select("doc_id").as[Long].collect().toSet
    assert(flat == plain)

    // alpha = 0.25 must admit rare groups at a HIGHER rate than common ones
    val sampled = Sampling.temperatureMixture(docs, "doc_id", "lang", alpha = 0.25,
      targetFraction = 0.4, salt = "tm")
    val before = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val after = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val (commonest, rarest) = (before.maxBy(_._2)._1, before.minBy(_._2)._1)
    assert(before.size > 1, "fixture needs several languages")
    val rateOf = (l: String) => after.getOrElse(l, 0L).toDouble / before(l)
    assert(rateOf(rarest) > rateOf(commonest),
      s"flattening must favor the rare group: rare=${rateOf(rarest)} common=${rateOf(commonest)}")
    // survivors are input rows, columns untouched
    assert(sampled.columns.toSeq == Seq("doc_id", "lang"))
    assert(sampled.count() > 0 && sampled.count() < docs.count())
  }

  test("tokenBudgetSampleByGroup adversarial: an over-budget single doc still admits (then closes the stratum); unlisted groups get the default") {
    // 'de' has ONE doc of 500 tokens against a 100-token stratum budget:
    // the prefix-BEFORE-it is 0 < 100, so it must admit (the straddler
    // rule — a budget can only be enforced at document granularity), and
    // every later de doc must reject (prefix >= 500 >= 100)
    val big = (9000L, "de", Seq.fill(500)("w").mkString(" "))
    val rest = (1L to 90L).map { i =>
      val lang = i % 3 match { case 0 => "de"; case 1 => "en"; case _ => "fr" }
      (i, lang, Seq.fill(10)("w").mkString(" "))
    }
    val docs = (rest :+ big).toDF("doc_id", "lang", "text").repartition(8)
    // force the big doc FIRST in de's hash order by picking a salt where it
    // wins; scan a few salts so the fixture can't rot silently
    val salt = (0 to 50).map(s => s"adv-$s").find { s =>
      val h = Sampling.keyHash(col("doc_id"), s)
      docs.filter(col("lang") === "de").withColumn("__h", h)
        .orderBy("__h").select("doc_id").as[Long].head() == 9000L
    }.getOrElse(fail("no salt puts the big doc first in de's hash order"))

    val kept = Sampling.tokenBudgetSampleByGroup(docs, "doc_id", "text", "lang",
      budgets = Seq("de" -> 100L, "en" -> 40L), defaultBudget = 10000L, salt = salt)
      .select("lang", "doc_id").as[(String, Long)].collect().toSeq
    val byLang = kept.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // de: exactly the over-budget doc, nothing after it
    assert(byLang("de") == Set(9000L),
      s"over-budget first doc must admit alone, got ${byLang("de")}")
    // en: listed budget (40 tokens = 4 docs of 10)
    assert(byLang("en").size == 4, s"en must keep 4 docs, got ${byLang("en").size}")
    // fr is ABSENT from the budget map: defaultBudget (10000) admits all
    assert(byLang("fr") == rest.filter(_._2 == "fr").map(_._1).toSet,
      "unlisted group must fall back to defaultBudget")
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

  // ---- DSIR importance resampling ----

  private def dsirCorpus = Seq(
    (1L, "alpha alpha beta", "tgt"), (2L, "alpha beta beta", "tgt"),
    (3L, "gamma delta gamma", "raw"), (4L, "delta delta gamma", "raw"),
    (5L, "alpha alpha alpha", "raw"), (6L, "gamma gamma delta", "raw")
  ).toDF("id", "text", "kind")

  test("DSIR: target-like docs outrank raw-only docs; the score is exactly the token-wise ratio sum") {
    // buckets = 256 keeps the four spec tokens collision-free (at 32/64/128
    // alpha and gamma share a bucket — hashed features alias by design;
    // the spec wants the un-aliased ordering to be visible)
    val docs = dsirCorpus
    val ratios = Sampling.trainImportanceRatios(
      docs.filter($"kind" === "tgt"), docs, "text", buckets = 256)
    assert(ratios.size == 256)
    val scored = Sampling.importanceScore(docs, "id", "text", ratios)
      .select($"id", $"n_tokens", $"dsir_logratio")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    // target ⊂ raw means add-one smoothing pulls every ratio down at spec
    // scale — the invariant is ORDER: every target-vocab doc (1/2/5)
    // outranks every raw-only-vocab doc (3/4/6)
    val worstTarget = Seq(1L, 2L, 5L).map(scored).min
    val bestRaw = Seq(3L, 4L, 6L).map(scored).max
    assert(worstTarget > bestRaw, s"target docs must outrank raw docs: $scored")
    // the fold is exactly the sum of per-token bucket ratios
    val tokens = Seq("alpha", "alpha", "beta")
    def bucket(t: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 256).toInt
    }
    val expected = tokens.map(t => ratios(bucket(t))).sum
    assert(math.abs(scored(1L) - math.rint(expected * 1e4) / 1e4) < 1e-9)
  }

  test("DSIR: Gumbel-top-k is deterministic, layout-independent, and biased toward target-like docs") {
    val docs = dsirCorpus
    val ratios = Sampling.trainImportanceRatios(
      docs.filter($"kind" === "tgt"), docs, "text", buckets = 256)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.resampleByImportance(df, "id", "text", ratios, k = 3, salt = "s")
        .select($"id").as[Long].collect().toSet
    val a = run(docs)
    assert(a == run(docs.repartition(7)), "selection must not depend on layout")
    assert(a.size == 3)
    // over many salts, target-vocab docs are selected more often than
    // raw-vocab docs (the importance-∝-exp(logratio) property, in
    // expectation over the Gumbel draws)
    val salts = (1 to 40).map(i => s"salt$i")
    val hits = salts.flatMap(s =>
      Sampling.resampleByImportance(docs, "id", "text", ratios, k = 2, salt = s)
        .select($"id").as[Long].collect())
    val tgtHits = hits.count(Set(1L, 2L, 5L))
    val rawHits = hits.count(Set(3L, 4L, 6L))
    assert(tgtHits > rawHits, s"target-like docs should dominate: $tgtHits vs $rawHits")
  }

  test("DSIR: bucket guard and empty-ratio guard") {
    intercept[IllegalArgumentException](
      Sampling.trainImportanceRatios(dsirCorpus, dsirCorpus, "text", buckets = 100000))
    intercept[IllegalArgumentException](
      Sampling.importanceScore(dsirCorpus, "id", "text", Seq.empty))
  }

  test("clusterAwareSplit: no cluster straddles splits; identity clusters = hashSplit; singletons fall back") {
    val splits = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    val ids = (1L to 400L)
    val docs = ids.map(i => Tuple1(i)).toDF("doc_id")
    // clusters of 4: ids 4k+1..4k+4 share cluster id 4k+1 (CC min-label form)
    val clusters = ids.map(i => (i, ((i - 1) / 4) * 4 + 1)).toDF("doc_id", "cluster_id")
    val out = Sampling.clusterAwareSplit(docs, "doc_id", clusters, splits, "cs-spec")
      .as[(Long, String)].collect().toMap
    // every member of a cluster lands in the SAME split
    ids.foreach { i =>
      val rep = ((i - 1) / 4) * 4 + 1
      assert(out(i) == out(rep), s"doc $i split ${out(i)} != rep $rep split ${out(rep)}")
    }
    // and the splits genuinely differ across clusters (not all one label)
    assert(out.values.toSet.size == 3)

    // identity cluster table degenerates to hashSplit with the same salt
    val identity = ids.map(i => (i, i)).toDF("doc_id", "cluster_id")
    val viaClusters = Sampling.clusterAwareSplit(docs, "doc_id", identity, splits, "cs-spec")
      .as[(Long, String)].collect().toMap
    val plain = Sampling.hashSplit(docs, "doc_id", splits, "cs-spec")
      .as[(Long, String)].collect().toMap
    assert(viaClusters == plain)

    // docs absent from the cluster table hash their own id (= hashSplit)
    val partial = clusters.filter(col("doc_id") <= 200L)
    val fellBack = Sampling.clusterAwareSplit(docs, "doc_id", partial, splits, "cs-spec")
      .as[(Long, String)].collect().toMap
    (201L to 400L).foreach(i => assert(fellBack(i) == plain(i)))
  }

  test("bottomKSample: matches sort-by-hash take-k; shard samples merge losslessly; TakeOrdered plan") {
    val ids = (1L to 500L)
    val docs = ids.map(Tuple1(_)).toDF("doc_id")
    val k = 40
    val sample = Sampling.bottomKSample(docs, "doc_id", k, "bks").as[Long].collect().toSet
    // reference: hash every id in Spark, sort locally, take k
    val hashes = docs.select(col("doc_id"), Sampling.keyHash(col("doc_id"), "bks").as("h"))
      .as[(Long, Long)].collect().toMap
    val expected = ids.sortBy(i => (hashes(i), i)).take(k).toSet
    assert(sample == expected)

    // mergeable: bottom-k of per-shard bottom-ks == bottom-k of the whole
    val shardA = docs.filter(col("doc_id") <= 250L)
    val shardB = docs.filter(col("doc_id") > 250L)
    val merged = Sampling.bottomKSample(
      Sampling.bottomKSample(shardA, "doc_id", k, "bks")
        .unionByName(Sampling.bottomKSample(shardB, "doc_id", k, "bks")),
      "doc_id", k, "bks").as[Long].collect().toSet
    assert(merged == sample)

    // the physical plan is TakeOrdered (O(k) per partition), not a full sort
    val plan = Sampling.bottomKSample(docs, "doc_id", k, "bks")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("sampleQuantiles: k >= corpus degenerates to exact nearest-rank quantiles; ends are min/max") {
    val vals = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val qs = Sampling.sampleQuantiles(df, "id", "v", k = 100,
      quantiles = Seq(0.0, 0.5, 1.0), salt = "sq")
      .orderBy("quantile").as[(Double, Long)].collect().toSeq
    // n = 10: idx = floor(q*9)+1 -> q0 -> 10 (min), q0.5 -> idx 5 -> 50, q1 -> 100 (max)
    assert(qs == Seq((0.0, 10L), (0.5, 50L), (1.0, 100L)))
  }

  test("weightedBottomK: shard samples merge losslessly; heavy weights dominate; w<=0 excluded") {
    val corpus = (0L until 1000L).map(i => (i, if (i < 100) 1000.0 else 1.0))
      .toDF("id", "w")
    val whole = Sampling.weightedBottomK(corpus, "id", "w", 50, "wk")
      .select("id").as[Long].collect().toSet
    // mergeable: per-shard bottom-ks re-select the identical set
    val shards = Seq(corpus.filter(col("id") % 2 === 0), corpus.filter(col("id") % 2 === 1))
      .map(Sampling.weightedBottomK(_, "id", "w", 50, "wk"))
      .reduce(_.unionByName(_))
    val merged = Sampling.weightedBottomK(shards, "id", "w", 50, "wk")
      .select("id").as[Long].collect().toSet
    assert(merged == whole)
    // 100 heavy rows at weight 1000 vs 900 at 1: expected heavy share of the
    // sample >> uniform's 10%; the draw is deterministic, so pin the count
    val heavy = whole.count(_ < 100L)
    assert(heavy > 35, s"only $heavy of 50 selections hit the 1000x-weight rows")
    // zero/negative weights never selected
    val withZero = corpus.withColumn("w", when(col("id") === 7L, lit(0.0)).otherwise(col("w")))
    assert(!Sampling.weightedBottomK(withZero, "id", "w", 1000, "wk")
      .select("id").as[Long].collect().contains(7L))
  }

  test("deterministicShuffle: a permutation matching the serial rank, layout-independent, even shards") {
    val corpus = ids(3000)
    val got = Sampling.deterministicShuffle(corpus, "id", rowsPerShard = 500L, salt = "sh")
    val positions = got.select("position").as[Long].collect().sorted
    assert(positions.toSeq == (0L until 3000L).toSeq, "positions must be a 0..N-1 permutation")
    // matches the one-task serial definition
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(Sampling.keyHash(col("id"), "sh"), col("id"))
    val serial = corpus.withColumn("position", row_number().over(w).cast("long") - 1)
    assert(got.select("id", "position").except(serial.select("id", "position")).isEmpty)
    // layout independence
    val re = Sampling.deterministicShuffle(corpus.repartition(13), "id", 500L, "sh")
    assert(re.select("id", "position").except(got.select("id", "position")).isEmpty)
    // shard sizes: 6 full shards of 500
    val sizes = got.groupBy("shard").count().select("count").as[Long].collect()
    assert(sizes.length == 6 && sizes.forall(_ == 500L))
  }

  test("negativeSample: k draws per anchor minus self-hits, negatives from the corpus, deterministic") {
    val corpus = ids(500)
    val neg = Sampling.negativeSample(corpus, "id", k = 4, salt = "ng")
    val counts = neg.groupBy("anchor_id").count().select("count").as[Long].collect()
    assert(counts.length == 500 && counts.forall(c => c == 4L || c == 3L),
      "each anchor draws 4 negatives, minus at most the self-hit per draw")
    assert(neg.filter(col("neg_id") === col("anchor_id")).isEmpty, "no anchor is its own negative")
    val idSet = (1L to 500L).toSet
    assert(neg.select("neg_id").as[Long].collect().forall(idSet.contains))
    // deterministic rerun
    val again = Sampling.negativeSample(corpus.repartition(7), "id", k = 4, salt = "ng")
    assert(neg.except(again).isEmpty && again.except(neg).isEmpty)
    // draws are near-uniform over the corpus: no id should be wildly hot
    val hot = neg.groupBy("neg_id").count().agg(max("count")).head().getLong(0)
    assert(hot < 25, s"hottest negative drawn $hot of 2000 times — not uniform")
  }

  test("groupBottomKSample: min(k, group size) per group, matches the rank-over-hash reference") {
    val docs = ((1L to 100L).map(i => (i, "en")) ++ (101L to 110L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val k = 15
    val out = Sampling.groupBottomKSample(docs, "doc_id", Seq("lang"), k, "gbs")
      .as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLang("en").size == 15)
    assert(byLang("de").size == 10) // group smaller than k: whole group
    // reference: k smallest hashes per group
    val hashes = docs.select(col("doc_id"), Sampling.keyHash(col("doc_id"), "gbs").as("h"))
      .as[(Long, Long)].collect().toMap
    val expectedEn = (1L to 100L).sortBy(hashes).take(15).toSet
    assert(byLang("en") == expectedEn)
  }

  // --------------------------------------------------------------- epochMix

  test("epochMix: integral epochs copy exactly, fractional admit by hash, zero drops") {
    val rows = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "grp")
    val out = Sampling.epochMix(rows, "id", "grp",
      Seq("a" -> 2.0, "b" -> 0.5, "c" -> 0.0), "emx")
      .as[(Long, String, Long)].collect()
    val byGrp = out.groupBy(_._2)
    // a: every key exactly twice, epochs 0 and 1
    val a = byGrp("a")
    assert(a.length == 200 && a.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == Seq(0L, 1L)))
    // b: the hash-admitted subset, each once at epoch 0 — same subset the
    // threshold predicate defines
    val b = byGrp("b")
    assert(b.forall(_._3 == 0L))
    val thr = Sampling.threshold(0.5)
    val admitted = rows.filter(col("grp") === "b")
      .filter(Sampling.keyHash(col("id"), "emx") < lit(thr))
      .select(col("id")).as[Long].collect().toSet
    assert(b.map(_._1).toSet == admitted && admitted.nonEmpty && admitted.size < 100)
    // c: epoch 0 emits nothing
    assert(!byGrp.contains("c"))
    // deterministic: a second run is row-identical
    val again = Sampling.epochMix(rows, "id", "grp",
      Seq("a" -> 2.0, "b" -> 0.5, "c" -> 0.0), "emx")
      .as[(Long, String, Long)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("weightedSample: ES keys rank by u^(1/w); heavier rows win more often; zero weights excluded") {
    val rows = (1L to 400L).map(i => (i, if (i % 4 == 0) 100L else 1L)).toDF("id", "w")
    val got = Sampling.weightedSample(rows, "id", "w", k = 50, salt = "wspec")
      .as[(Long, Double, Double)].collect()
    assert(got.length == 50)
    // exact A-ES reimplementation: the winner set must match key for key
    val expected = (1L to 400L).map { i =>
      val w = if (i % 4 == 0) 100.0 else 1.0
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("wspec" + i).getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / (1L << 60).toDouble
      val key = graft.functions.Quantize.scaledFloorDouble(math.pow(u, 1.0 / w), 9)
      (i, w, key)
    }.sortBy { case (id, _, key) => (-key, id) }.take(50)
    assert(got.sortBy(r => (-r._3, r._1)).toSeq == expected.toSeq)
    // the 25% heavy rows should dominate the sample
    assert(got.count(_._2 == 100.0) > 35)
    // zero/negative weights carry no mass
    val withZero = rows.withColumn("w", when(col("id") <= 390, lit(0L)).otherwise(col("w")))
    val z = Sampling.weightedSample(withZero, "id", "w", k = 50, salt = "wspec")
      .as[(Long, Double, Double)].collect()
    assert(z.length == 10 && z.forall(_._1 > 390))
  }

  test("epochMix: unlisted groups drop by default, survive at defaultEpochs when set") {
    // "zz" never appears in the recipe — the new-language-in-the-corpus case
    val rows = (1L to 90L).map(i => (i, if (i % 2 == 0) "a" else "zz")).toDF("id", "grp")
    val dropped = Sampling.epochMix(rows, "id", "grp", Seq("a" -> 1.0), "emd")
      .as[(Long, String, Long)].collect()
    assert(dropped.forall(_._2 == "a")) // whitelist semantics, documented
    val kept = Sampling.epochMix(rows, "id", "grp", Seq("a" -> 1.0), "emd",
      defaultEpochs = 1.5)
      .as[(Long, String, Long)].collect()
    val zz = kept.filter(_._2 == "zz")
    // every unlisted-key row survives at least once; the 0.5 fractional
    // epoch admits the SAME hash subset the threshold predicate defines
    assert(zz.map(_._1).distinct.length == 45)
    val thr = Sampling.threshold(0.5)
    val admitted = rows.filter(col("grp") === "zz")
      .filter(Sampling.keyHash(col("id"), "emd") < lit(thr))
      .select(col("id")).as[Long].collect().toSet
    assert(zz.count(_._3 == 1L) == admitted.size &&
      zz.filter(_._3 == 1L).map(_._1).toSet == admitted)
    // listed groups are unaffected by the default
    assert(kept.filter(_._2 == "a").map(_._1).toSet ==
      dropped.filter(_._2 == "a").map(_._1).toSet)
  }

  test("classWeights: hand-computed inverse-frequency and ENS weights at beta=0.5") {
    import graft.functions.Quantize.scaledFloorDouble
    // a x2, b x6: inv_a = 8/(2*2) = 2, inv_b = 8/12; ENS at beta=0.5:
    // E_a = (1-0.25)/0.5 = 1.5, E_b = (1-2^-6)/0.5 = 1.96875
    val df = (Seq.fill(2)("a") ++ Seq.fill(6)("b")).toDF("c")
    val got = classWeightsOf(df)
    def raw(n: Int) = scaledFloorDouble(0.5 / (1.0 - math.pow(0.5, n.toDouble)), 9)
    val sraw = raw(2) + raw(6) // exact decimal sum of two 1e-9-grid values
    assert(got("a") == ((2L, 2.0, scaledFloorDouble(2.0 * raw(2) / sraw, 6))))
    assert(got("b") == ((6L, scaledFloorDouble(8.0 / 12.0, 6),
      scaledFloorDouble(2.0 * raw(6) / sraw, 6))))
    intercept[IllegalArgumentException](Sampling.classWeights(df, "c", beta = 1.0))
  }

  private def classWeightsOf(df: org.apache.spark.sql.DataFrame) =
    Sampling.classWeights(df, "c", beta = 0.5)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("rakeWeights: an already-balanced grid keeps every weight at exactly 1") {
    // uniform 2x2 grid, uniform targets -> every rescale factor is exactly 1
    val df = (for { r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 5 }
      yield (r, c)).toDF("r", "c")
    val w = Sampling.rakeWeights(df, "r", "c",
      Seq("a" -> 0.5, "b" -> 0.5), Seq("x" -> 0.5, "y" -> 0.5), iterations = 3)
      .as[(String, String, Long, Double)].collect()
    assert(w.length == 4 && w.forall(t => t._3 == 5L && t._4 == 1.0))
  }

  test("rakeWeights: skewed grid converges to the target marginals within the grid tolerance") {
    val df = (Seq.fill(1)("a" -> "x") ++ Seq.fill(3)("a" -> "y") ++
      Seq.fill(5)("b" -> "x") ++ Seq.fill(7)("b" -> "y")).toDF("r", "c")
    val w = Sampling.rakeWeights(df, "r", "c",
      Seq("a" -> 0.5, "b" -> 0.5), Seq("x" -> 0.5, "y" -> 0.5), iterations = 5)
      .as[(String, String, Long, Double)].collect()
    val n = 16.0
    def share(f: ((String, String, Long, Double)) => Boolean) =
      w.filter(f).map(t => t._4 * t._3).sum / n
    assert(math.abs(share(_._1 == "a") - 0.5) < 1e-6, s"row a: ${share(_._1 == "a")}")
    assert(math.abs(share(_._2 == "x") - 0.5) < 1e-3, s"col x: ${share(_._2 == "x")}")
  }

  test("rakeWeights: unlisted categories are dropped (whitelist semantics); guards fire") {
    val df = (Seq.fill(2)("a" -> "x") ++ Seq.fill(2)("b" -> "x") ++
      Seq.fill(9)("zz" -> "x")).toDF("r", "c")
    val w = Sampling.rakeWeights(df, "r", "c",
      Seq("a" -> 0.5, "b" -> 0.5), Seq("x" -> 1.0), iterations = 2)
      .as[(String, String, Long, Double)].collect()
    assert(w.map(_._1).toSet == Set("a", "b")) // zz never enters the grid or N
    assert(w.forall(_._4 == 1.0)) // a/b are balanced once zz is excluded
    intercept[IllegalArgumentException](Sampling.rakeWeights(df, "r", "c",
      Seq("a" -> 0.5, "b" -> 0.6), Seq("x" -> 1.0)))
    intercept[IllegalArgumentException](Sampling.rakeWeights(df, "r", "c",
      Seq("a" -> 0.5, "b" -> 0.5), Seq("x" -> 1.0), iterations = 0))
  }
}
