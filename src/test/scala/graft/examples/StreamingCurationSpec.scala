package graft.examples

import graft.TestSpark
import graft.operators.{Dedup, TextAnalysis}
import graft.sinks.ExactlyOnceParquetWriter
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming curation composition must drain a multi-batch corpus to the
  * batch pipeline's survivor set: survivors at exact-dedup granularity
  * (gates + first-arrival exact dedup + redaction ≡ gates + min-id exact
  * dedup + redaction when arrival order is id order), and after the
  * downstream batch resolve (verify → CC → keep-min over the drained
  * candidate stream) the near-dup-level set too — modulo the documented
  * batch-only CC step being exactly that resolve.
  */
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("multi-batch drain + batch resolve equals the batch pipeline; replay adds nothing") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val originals = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
    // plant exact duplicates of three GATE-SURVIVING documents with higher
    // ids in LATER feed batches — first arrival (the original, lower id)
    // must win, matching the batch form's min-id representative
    val gatedIds = TrainingDataPipeline.gates(docs)
      .select("doc_id").as[Long].collect().sorted.take(3)
    val copies = originals.filter(d => gatedIds.contains(d._1))
      .map { case (id, text) => (id + 100000L, text) }
    assert(copies.size == 3, "need three gate-surviving docs to clone")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"))

    val out = Files.createTempDirectory("graft-scur-out").toString
    val writer = new ExactlyOnceParquetWriter(out)
    val qSurv = streams.survivors.writeStream
      .foreachBatch(writer.write _)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-ckpt").toString)
      .start()
    try spark.catalog.dropTempView("scur_cands") catch { case _: Exception => () }
    val qCand = streams.candidates.writeStream
      .format("memory").queryName("scur_cands").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-cckpt").toString)
      .start()
    try {
      val (b1, b2) = originals.splitAt(originals.size / 2)
      Seq(b1, b2 :+ copies.head, copies.tail).foreach { b =>
        in.addData(b)
        qSurv.processAllAvailable(); qCand.processAllAvailable()
      }

      val drained = spark.read.parquet(out).select("doc_id", "text")
      val streamedSurvivors = drained.as[(Long, String)].collect().toSet

      // batch reference: gates → min-id exact dedup → redaction
      val full = originals ++ copies
      val fullDf = full.toDF("doc_id", "text")
      val batchExact = Dedup.exactKeepFirst(TrainingDataPipeline.gates(fullDf), "text", "doc_id")
      val batchSurvivors = TextAnalysis.redactPii(batchExact, "doc_id", "text")
        .select(col("doc_id"), col("redacted").as("text"))
        .as[(Long, String)].collect().toSet
      assert(streamedSurvivors == batchSurvivors,
        s"streamed=${streamedSurvivors.size} batch=${batchSurvivors.size}; " +
          s"only-stream=${(streamedSurvivors -- batchSurvivors).map(_._1).take(3)} " +
          s"only-batch=${(batchSurvivors -- streamedSurvivors).map(_._1).take(3)}")
      assert(!streamedSurvivors.exists(_._1 > 100000L), "a planted copy displaced its original")

      // downstream batch resolve over the drained candidate stream must
      // reproduce the batch pipeline's near-dup survivor ids
      val resolved = StreamingCuration.resolveClusters(
        drained, spark.table("scur_cands").select("id_a", "id_b").distinct())
        .select("doc_id").as[Long].collect().toSet
      val batchPairs = Dedup.nearDupPairs(batchExact, "doc_id", "text", numHashes = 64, bands = 16)
      val batchClusters = Dedup.connectedComponents(
        batchExact.select(col("doc_id")), "doc_id", batchPairs, "id_a", "id_b")
      val batchResolved = batchClusters.filter(col("doc_id") === col("cluster_id"))
        .select("doc_id").as[Long].collect().toSet
      assert(resolved == batchResolved,
        s"only-stream=${(resolved -- batchResolved).take(3)} only-batch=${(batchResolved -- resolved).take(3)}")
      assert(resolved.size < streamedSurvivors.size, "corpus has no near-dup clusters — vacuous")

      // full replay: dedup state swallows every text; sink count unchanged
      val before = spark.read.parquet(out).count()
      in.addData(full)
      qSurv.processAllAvailable(); qCand.processAllAvailable()
      assert(spark.read.parquet(out).count() == before, "replay wrote survivors")
    } finally { qSurv.stop(); qCand.stop() }
  }

  test("boilerplate-strip and decontamination legs ride the stream; drain equals the batch analog") {
    val boiler = Seq("subscribe to our newsletter for daily updates now")
    val docs = Seq(
      (1L, "the cat and the dog is in the house of the king\n" +
        "subscribe to our newsletter for daily updates now"),
      (2L, "subscribe to our newsletter for daily updates now"), // all boilerplate -> empty -> gated out
      (3L, "the fox and the hen is of the barn and the yard"),
      (4L, "the spell of the sea is the song of the deep tide"), // contaminated by bench
      (5L, "the king and the queen of the north and the south"))
    val bench = Seq("the spell of the sea is old").toDF("text")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"),
      boilerplateLines = boiler, benchmark = Some(bench))
    try spark.catalog.dropTempView("scur_legs") catch { case _: Exception => () }
    val q = streams.survivors.writeStream
      .format("memory").queryName("scur_legs").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-legs").toString)
      .start()
    try {
      val (b1, b2) = docs.splitAt(2)
      Seq(b1, b2).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("scur_legs").select("doc_id", "text")
        .as[(Long, String)].collect().toSet

      // batch analog: strip -> gates -> decontaminate (BATCH form, pinning
      // the two decontamination shapes against each other end-to-end)
      // -> min-id exact dedup -> redact
      val full = docs.toDF("doc_id", "text")
      val strippedB = Dedup.stripKnownLines(full, "doc_id", "text", boiler)
      val gatedB = TrainingDataPipeline.gates(strippedB)
      val cleanIds = TextAnalysis.flagContaminated(gatedB, "doc_id", "text", bench, "text")
        .filter(!col("contaminated")).select("doc_id")
      val deconB = gatedB.join(cleanIds, Seq("doc_id"), "left_semi")
      val batch = TextAnalysis.redactPii(
        Dedup.exactKeepFirst(deconB, "text", "doc_id"), "doc_id", "text")
        .select(col("doc_id"), col("redacted").as("text"))
        .as[(Long, String)].collect().toSet
      assert(streamed == batch,
        s"only-stream=${(streamed -- batch).map(_._1)} only-batch=${(batch -- streamed).map(_._1)}")
      // the legs actually bit: boilerplate doc gone, contaminated doc gone,
      // doc 1's boilerplate line stripped from its surviving text
      val ids = streamed.map(_._1)
      assert(ids == Set(1L, 3L, 5L), s"unexpected survivor ids $ids")
      assert(streamed.find(_._1 == 1L).get._2 ==
        "the cat and the dog is in the house of the king")
    } finally q.stop()
  }

  test("historyIndex drops a stream's FIRST arrival of an already-curated text, at zero stream state") {
    val yesterday = "the cat and the dog is in the house of the king"
    val fresh = "the fox and the hen is of the barn and the yard"
    // yesterday's curated corpus, persisted as a fingerprint index
    val index = Dedup.buildFingerprintIndex(
      Seq((1L, yesterday)).toDF("doc_id", "text"), "text")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"),
      historyIndex = Some(index))
    try spark.catalog.dropTempView("scur_hist") catch { case _: Exception => () }
    val q = streams.survivors.writeStream
      .format("memory").queryName("scur_hist").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-hist").toString)
      .start()
    try {
      // doc 10 re-arrives yesterday's text (its first arrival ON THIS
      // STREAM — only the history index can know it); 11 is new; 12 is an
      // in-stream duplicate of 11 caught by the stateful stage
      in.addData(Seq((10L, yesterday), (11L, fresh))); q.processAllAvailable()
      in.addData(Seq((12L, fresh))); q.processAllAvailable()
      val ids = spark.table("scur_hist").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(11L),
        s"history re-arrival and in-stream duplicate must both drop, got $ids")
    } finally q.stop()
  }

  test("bloomHistory drops a history re-arrival via the constant-memory bitmap probe, at zero stream state") {
    val yesterday = "the cat and the dog is in the house of the king"
    val fresh = "the fox and the hen is of the barn and the yard"
    // yesterday's curated corpus, persisted as a Bloom bitmap — O(mBits)
    // forever, vs the fingerprint index's O(history) rows
    val m = 4096; val kh = 3
    val sketch = graft.operators.Sketches.bloomSketch(
      Seq((1L, yesterday)).toDF("doc_id", "text"), col("text"), m, kh, "blh")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"),
      bloomHistory = Some(BloomHistory(sketch, m, kh, "blh")))
    try spark.catalog.dropTempView("scur_bloom") catch { case _: Exception => () }
    val q = streams.survivors.writeStream
      .format("memory").queryName("scur_bloom").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-bloom").toString)
      .start()
    try {
      // doc 10 re-arrives yesterday's text (no false negatives: MUST drop);
      // 11 is new (n=1, m=4096 → fp rate ~3e-9, and this fixture is
      // deterministic — 11 survives); 12 duplicates 11 in-stream
      in.addData(Seq((10L, yesterday), (11L, fresh))); q.processAllAvailable()
      in.addData(Seq((12L, fresh))); q.processAllAvailable()
      val ids = spark.table("scur_bloom").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(11L),
        s"bloom history re-arrival and in-stream duplicate must both drop, got $ids")
    } finally q.stop()
  }

  test("nearDupHistory flags a VERIFIED near-dup of an already-curated doc on the stream; resolve equals the batch index analog") {
    val oldA = "the cat and the dog is in the house of the king by the sea"
    val oldB = "the spell of the sea is the song of the deep tide at dusk"
    val nearA = oldA + " today" // not byte-identical: exact-history dedup cannot catch it
    val fresh = "the fox and the hen is of the barn and the yard at dawn"
    val oldDocs = Seq((1L, oldA), (2L, oldB)).toDF("doc_id", "text")
    // index built with curate's streaming LSH geometry (64 hashes, 16 bands)
    val index = Dedup.buildLshIndex(oldDocs, "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"),
      nearDupHistory = Some(NearDupHistory(index, oldDocs)))
    val matchesStream = streams.historyMatches.getOrElse(fail("historyMatches stream missing"))
    Seq("scur_nd_surv", "scur_nd_match").foreach { v =>
      try spark.catalog.dropTempView(v) catch { case _: Exception => () }
    }
    val qSurv = streams.survivors.writeStream
      .format("memory").queryName("scur_nd_surv").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-nds").toString)
      .start()
    val qMatch = matchesStream.writeStream
      .format("memory").queryName("scur_nd_match").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-ndm").toString)
      .start()
    try {
      in.addData(Seq((10L, nearA), (11L, fresh))); qSurv.processAllAvailable(); qMatch.processAllAvailable()

      // the match surfaced IN-STREAM, already Jaccard-verified (the same
      // pair may arrive once per matching band — distinct on drain)
      val matches = spark.table("scur_nd_match")
        .select("id_a", "id_b", "inter_cnt", "union_cnt").distinct()
      val got = matches.as[(Long, Long, Int, Int)].collect().toSet
      // batch analog over the same newcomers and the same persisted index
      val newDocs = Seq((10L, nearA), (11L, fresh)).toDF("doc_id", "text")
      val batchPairs = Dedup.nearDupAgainstIndex(
        newDocs, "doc_id", "text", index, oldDocs, shingleN = 3, numHashes = 64, bands = 16)
        .as[(Long, Long, Int, Int)].collect().toSet
      assert(got == batchPairs, s"stream=$got batch=$batchPairs")
      assert(got.map(p => (p._1, p._2)) == Set((10L, 1L)),
        s"exactly the planted near-dup must match history, got $got")

      // survivors still stream at exact granularity (10 is flagged, not
      // dropped in-stream); the batch resolve removes it — history wins
      val drained = spark.table("scur_nd_surv").select("doc_id", "text")
      assert(drained.select("doc_id").as[Long].collect().toSet == Set(10L, 11L))
      val resolved = StreamingCuration.resolveClusters(
        drained, spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b"),
        historyMatches = Some(matches))
      assert(resolved.select("doc_id").as[Long].collect().toSet == Set(11L))
    } finally { qSurv.stop(); qMatch.stop() }
  }

  test("ALL eight opt-ins composed: each leg claims exactly its victim, survivors and history matches are exact") {
    val canary = "CANARY-0x5f3759df weather balloon"
    val boiler = "subscribe to the banner now"
    val curatedHist = "the cat and a dog is in the house of the king by the sea today"
    val windowCorpus = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((900L, "zebra quokka lemur pangolin okapi axolotl fennec")).toDF("doc_id", "text")
    val histDocs = Seq((1L, curatedHist)).toDF("doc_id", "text")

    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    val exactVictim  = curatedHist                                            // 20: historyIndex
    val nearVictim   = curatedHist + " extra today more"                      // 21: flagged vs history
    val spanCarrier  = "the pig and a cow is of the farm alpha beta gamma delta epsilon and the field at noon by the river bend" // 22
    val deconVictim  = "the ant and a bee is of the hive zebra quokka lemur and the grove at noon" // 23
    val horizonText  = "the elk and a hare is of the moor and the crag at dawn frost"             // 24 + dup 25
    val shortVictim  = "the ant and a fly is of the dust bin lid"             // 26: quality model
    val fresh        = "the owl and a wren is of the wood and the glen at dusk by the lake" // 27
    val boilerDoc    = "the ram and a ewe is of the fold and the hill at dusk tonight\n" + boiler // 28
    val canaryDoc    = "the fox and a hen is of the yard and the barn at noon " + canary // 29: canary leg

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text", "ts"),
      boilerplateLines = Seq(boiler),
      benchmark = Some(bench),
      dedupHorizon = Some(DedupHorizon("ts", "2 hours")),
      historyIndex = Some(Dedup.buildFingerprintIndex(histDocs, "text")),
      nearDupHistory = Some(NearDupHistory(
        Dedup.buildLshIndex(histDocs, "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16),
        histDocs)),
      windowHistory = Some(WindowHistory(
        Dedup.buildWindowIndex(Seq((2L, windowCorpus)).toDF("doc_id", "text"), "doc_id", "text", w = 5),
        w = 5)),
      qualityModel = Some(QualityModel(Seq.fill(16)(0.05), bias = -0.9, minScore = 0.45)),
      canaries = Seq(canary))
    Seq("scur_all", "scur_all_m").foreach { v =>
      try spark.catalog.dropTempView(v) catch { case _: Exception => () }
    }
    val q = streams.survivors.writeStream
      .format("memory").queryName("scur_all").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-all").toString)
      .start()
    val qm = streams.historyMatches.get.writeStream
      .format("memory").queryName("scur_all_m").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-allm").toString)
      .start()
    try {
      in.addData(Seq((20L, exactVictim, ts(0)), (21L, nearVictim, ts(0)),
        (22L, spanCarrier, ts(0)), (23L, deconVictim, ts(0)),
        (24L, horizonText, ts(0)), (26L, shortVictim, ts(0)),
        (27L, fresh, ts(0)), (28L, boilerDoc, ts(0)), (29L, canaryDoc, ts(0))))
      q.processAllAvailable(); qm.processAllAvailable()
      in.addData(Seq((25L, horizonText, ts(1)))) // within-horizon duplicate
      q.processAllAvailable(); qm.processAllAvailable()

      val got = spark.table("scur_all").select("doc_id", "text")
        .as[(Long, String)].collect().toMap
      // 20 exact-history, 23 decontaminated, 25 horizon-dup, 26 model-scored,
      // 29 canary out; 21 is FLAGGED not dropped (resolve removes it below)
      assert(got.keySet == Set(21L, 22L, 24L, 27L, 28L), s"got ${got.keySet}")
      assert(!got(22L).contains("gamma") && got(22L).contains("farm"),
        s"historical span must vanish from the carrier: '${got(22L)}'")
      assert(!got(28L).contains("subscribe"), s"boilerplate must strip: '${got(28L)}'")

      val matches = spark.table("scur_all_m")
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      assert(matches == Set((21L, 1L)), s"history matches: $matches")

      val resolved = StreamingCuration.resolveClusters(
        spark.table("scur_all").select("doc_id", "text"),
        spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b"),
        historyMatches = Some(spark.table("scur_all_m")
          .select("id_a", "id_b", "inter_cnt", "union_cnt").distinct()))
      assert(resolved.select("doc_id").as[Long].collect().toSet == Set(22L, 24L, 27L, 28L))
    } finally { q.stop(); qm.stop() }
  }

  test("qualityModel gate drops low-scoring docs on the stream; drain equals the batch analog") {
    // uniform positive weights make the score monotonic in token count:
    // every token adds ~0.05 to z, so the 12-token doc lands below 0.5
    // and the longer ones above it (bias centers the boundary)
    val model = QualityModel(weights = Seq.fill(16)(0.05), bias = -0.9, minScore = 0.5)
    val short = "the cat and a dog is of the house king sea tide"                    // 12 tokens
    val long1 = "the fox and a hen is of the barn and the yard at dawn by the mill pond" // 18
    val long2 = "the owl and a wren is of the wood and the glen at dusk by the lake shore today still here more" // 22

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"),
      qualityModel = Some(model))
    try spark.catalog.dropTempView("scur_qm") catch { case _: Exception => () }
    val q = streams.survivors.writeStream
      .format("memory").queryName("scur_qm").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-qm").toString)
      .start()
    try {
      in.addData(Seq((10L, short), (11L, long1), (12L, long2))); q.processAllAvailable()
      val got = spark.table("scur_qm").select("doc_id").as[Long].collect().toSet
      val batch = TextAnalysis.hashedLinearScore(
          TrainingDataPipeline.gates(
            Seq((10L, short), (11L, long1), (12L, long2)).toDF("doc_id", "text")),
          "doc_id", "text", model.weights, model.bias)
        .filter(col("quality_score") >= model.minScore)
        .select("doc_id").as[Long].collect().toSet
      assert(got == batch, s"stream=$got batch=$batch")
      assert(!got.contains(10L) && got.contains(12L),
        s"the short doc must score below the gate, got $got")
    } finally q.stop()
  }

  test("domainAuthority leg gates the stream on a PERSISTED linkAuthority score table") {
    // batch leg: score domains from link topology and PERSIST the frame —
    // the historyIndex pattern (stream-static, re-read per micro-batch)
    val edges = Seq(("s1", "good.com"), ("s1", "ok.com"), ("s1", "fine.com"),
      ("s2", "good.com"), ("s2", "ok.com"), ("s2", "spam.net"))
      .toDF("src", "dst")
    val scoresDir = Files.createTempDirectory("graft-authority").toString
    graft.operators.Graph.linkAuthority(edges, "src", "dst", seeds = Seq("s1"),
      pprIterations = 1, coreK = 2, coreIterations = 1)
      .write.mode("overwrite").parquet(scoresDir)
    val persisted = spark.read.parquet(scoresDir)
    val byDom = persisted.select("domain", "score")
      .as[(String, Double)].collect().toMap
    // s1 (the trusted seed) links good/ok/fine, s2 links spam.net too:
    // spam.net gets no seed-proximity mass and scores 0
    assert(byDom("spam.net") == 0.0 && byDom("good.com") > 0.0)
    val minScore = byDom("good.com") / 2 // between spam's 0 and the good tier

    val goodText = "the fox and a hen is of the barn and the yard at dawn by the mill pond"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val streams = StreamingCuration.curate(
      in.toDF().toDF("doc_id", "text", "domain"),
      domainAuthority = Some(DomainAuthority(persisted, "domain", minScore)))
    try spark.catalog.dropTempView("scur_da") catch { case _: Exception => () }
    val q = streams.survivors.writeStream
      .format("memory").queryName("scur_da").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-da").toString)
      .start()
    try {
      in.addData(Seq((1L, goodText, "good.com"), (2L, goodText + " extra", "spam.net"),
        (3L, goodText + " other words", "unheard-of.org")))
      q.processAllAvailable()
      val got = spark.table("scur_da").select("doc_id").as[Long].collect().toSet
      // spam domain drops; unknown domain KEEPS under the default posture
      assert(got == Set(1L, 3L), s"got $got")
    } finally q.stop()

    // dropUnknown = true: no-evidence domains drop too
    val in2 = MemoryStream[(Long, String, String)]
    val streams2 = StreamingCuration.curate(
      in2.toDF().toDF("doc_id", "text", "domain"),
      domainAuthority = Some(DomainAuthority(persisted, "domain", minScore,
        dropUnknown = true)))
    try spark.catalog.dropTempView("scur_da2") catch { case _: Exception => () }
    val q2 = streams2.survivors.writeStream
      .format("memory").queryName("scur_da2").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-da2").toString)
      .start()
    try {
      in2.addData(Seq((1L, goodText, "good.com"), (3L, goodText + " other words", "unheard-of.org")))
      q2.processAllAvailable()
      val got2 = spark.table("scur_da2").select("doc_id").as[Long].collect().toSet
      assert(got2 == Set(1L), s"got $got2")
    } finally q2.stop()
  }

  test("a trainNaiveBayesWeights model drives the qualityModel leg end to end") {
    // trained-on-batch, gated-on-stream: the q116/q117 trainer's weights
    // feed the SAME QualityModel leg the literal-weight tests use — the
    // train-offline / score-at-ingest deployment loop in one spec. The
    // training frame shares a neutral sentence across classes, so neutral
    // tokens learn ~0 log-odds and the class words dominate the score.
    val train = ((1 to 20).map(i => (s"the excellent item x$i is of a house and", true)) ++
      (1 to 20).map(i => (s"the spamword item x$i is of a house and", false)))
      .toDF("text", "label")
    val b = 16
    val weights = TextAnalysis.collectNaiveBayesModel(
      TextAnalysis.trainNaiveBayesWeights(train, "text", col("label"), buckets = b), buckets = b)
    val bias = TextAnalysis.naiveBayesPrior(train, col("label"))
      .select("bias").as[Double].head()
    assert(bias == 0.0) // balanced classes

    val goodDoc = "the excellent owl and a wren is of the wood and the glen at dusk"
    val spamDoc = "the spamword owl and a wren is of the wood and the glen at dusk"
    // the docs differ in ONE token, so z_good - z_spam = w(excellent) -
    // w(spamword) > 0 regardless of which buckets the shared neutral
    // tokens collide into (at B=16 collisions shift both scores equally);
    // the gate sits at the measured midpoint — separation is the claim,
    // not an absolute calibration
    val scores = TextAnalysis.hashedLinearScore(
        Seq((20L, goodDoc), (21L, spamDoc)).toDF("doc_id", "text"),
        "doc_id", "text", weights, bias)
      .orderBy("doc_id").select("quality_score").as[Double].collect()
    assert(scores(0) > scores(1), s"trained weights must rank good over spam: ${scores.toSeq}")
    val model = QualityModel(weights, bias, minScore = (scores(0) + scores(1)) / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"),
      qualityModel = Some(model))
    try spark.catalog.dropTempView("scur_nbm") catch { case _: Exception => () }
    val q = streams.survivors.writeStream
      .format("memory").queryName("scur_nbm").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-nbm").toString)
      .start()
    try {
      in.addData(Seq((20L, goodDoc), (21L, spamDoc))); q.processAllAvailable()
      val got = spark.table("scur_nbm").select("doc_id").as[Long].collect().toSet
      assert(got == Set(20L), s"trained gate must keep the good doc, drop the spam one: $got")
    } finally q.stop()
  }

  test("windowHistory strips historical spans from arriving docs before the gates; hollowed docs fail the floor") {
    val curated = "the cat and the dog is in the house of the king by the sea"
    val index = Dedup.buildWindowIndex(
      Seq((1L, curated)).toDF("doc_id", "text"), "doc_id", "text", w = 5)
    // novel doc carrying a 5-token historical span mid-text; a doc that is
    // ENTIRELY historical spans (hollowed to nothing -> gate floor drops it)
    val carrier = "the fox and the hen went the cat and the dog is to the barn and the yard at dawn"
    val hollow = curated
    val fresh = "the owl and the wren is of the wood and the glen at dusk"

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"),
      windowHistory = Some(WindowHistory(index, w = 5)))
    try spark.catalog.dropTempView("scur_win") catch { case _: Exception => () }
    val q = streams.survivors.writeStream
      .format("memory").queryName("scur_win").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-win").toString)
      .start()
    try {
      in.addData(Seq((10L, carrier), (11L, hollow), (12L, fresh))); q.processAllAvailable()
      val got = spark.table("scur_win").select("doc_id", "text")
        .as[(Long, String)].collect().toMap
      // batch analog: the same strip feeding the same gates
      val batch = TrainingDataPipeline.gates(Dedup.stripKnownWindows(
          Seq((10L, carrier), (11L, hollow), (12L, fresh)).toDF("doc_id", "text"),
          "doc_id", "text", index, w = 5))
        .as[(Long, String)].collect().toMap
      assert(got == batch, s"stream=$got batch=$batch")
      assert(!got.contains(11L), "fully-historical doc must hollow out and fail the gates")
      assert(got(10L).contains("fox") && !got(10L).contains("cat"),
        s"historical span must vanish from the carrier, got '${got(10L)}'")
      assert(got(12L) == fresh)
    } finally q.stop()
  }

  test("dedupHorizon bounds dedup state: post-horizon re-arrival re-admits; lifetime mode never does") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    val dup = "the cat and the dog is in the house of the king"
    val other = "the fox and the hen is of the barn and the yard"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def drain(horizon: Option[DedupHorizon]): Set[Long] = {
      val in = MemoryStream[(Long, String, java.sql.Timestamp)]
      val name = s"scur_hz_${horizon.isDefined}"
      val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text", "ts"),
        dedupHorizon = horizon)
      try spark.catalog.dropTempView(name) catch { case _: Exception => () }
      val q = streams.survivors.writeStream
        .format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("graft-scur-hz").toString)
        .start()
      try {
        // batch 1: first arrival; batch 2: a WITHIN-horizon duplicate
        // (separate batches so "first arrival" is deterministic — an
        // in-batch duplicate's survivor is partition-order arbitrary)
        in.addData(Seq((1L, dup, ts(0)))); q.processAllAvailable()
        in.addData(Seq((2L, dup, ts(0)))); q.processAllAvailable()
        // batch 3: unrelated doc 5 hours on — advances the 1-hour watermark
        // past batch 1, so horizon-mode fingerprint state is pruned
        in.addData(Seq((3L, other, ts(5)))); q.processAllAvailable()
        // batch 4: the duplicate text re-arrives AFTER the horizon
        in.addData(Seq((4L, dup, ts(5)))); q.processAllAvailable()
        spark.table(name).select("doc_id").as[Long].collect().toSet
      } finally q.stop()
    }

    // bounded state: the post-horizon re-arrival is re-admitted (and left
    // for the downstream batch resolve, the documented trade)
    assert(drain(Some(DedupHorizon("ts", "1 hour"))) == Set(1L, 3L, 4L))
    // corpus-lifetime state: the duplicate never comes back
    assert(drain(None) == Set(1L, 3L))
  }

  test("horizon x historyIndex composed, killed mid-batch and replayed: exactly-once survivors, horizon re-admits, history memory outlives the horizon") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    val yesterday = "the cat and the dog is in the house of the king"
    val fresh = "the fox and the hen is of the barn and the yard"
    val other = "the spell of the sea is the song of the deep tide"
    val index = Dedup.buildFingerprintIndex(
      Seq((1L, yesterday)).toDF("doc_id", "text"), "text")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    def streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text", "ts"),
      dedupHorizon = Some(DedupHorizon("ts", "1 hour")),
      historyIndex = Some(index))
    val out = Files.createTempDirectory("graft-scur-hx-out").toString
    val ckpt = Files.createTempDirectory("graft-scur-hx-ckpt").toString
    val writer = new ExactlyOnceParquetWriter(out)
    def start() = streams.survivors.writeStream
      .foreachBatch(writer.write _)
      .option("checkpointLocation", ckpt)
      .start()

    // batch 0: 10 re-arrives yesterday's text (only history knows it — must
    // drop), 11 is fresh and survives
    val q1 = start()
    try { in.addData(Seq((10L, yesterday, ts(0)), (11L, fresh, ts(0)))); q1.processAllAvailable() }
    finally q1.stop()

    // KILL MID-BATCH: the sink wrote batch 0's data but the crash landed
    // before BOTH commit points — delete the sink marker and the
    // checkpoint's commit record, so the restart must re-execute batch 0
    // against the already-written epoch dir
    val conf = spark.sparkContext.hadoopConfiguration
    def rm(p: String) = {
      val path = new org.apache.hadoop.fs.Path(p)
      assert(path.getFileSystem(conf).delete(path, false), s"fixture: $p missing")
    }
    rm(s"$out/_graft_commits/batch-${"%020d".format(0)}")
    rm(s"$ckpt/commits/0")

    val q2 = start()
    try {
      // replay of batch 0 happens on restart, then the run continues:
      // 12 = within-horizon duplicate of 11 (state restored from the
      // checkpoint must still hold it); 13 advances the watermark 5h
      in.addData(Seq((12L, fresh, ts(0)))); q2.processAllAvailable()
      in.addData(Seq((13L, other, ts(5)))); q2.processAllAvailable()
      // post-horizon: 14 re-admits (horizon state pruned), but 15 — the
      // history text — still drops: index memory is not horizon-bounded
      in.addData(Seq((14L, fresh, ts(5)), (15L, yesterday, ts(5)))); q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out).select("doc_id").as[Long].collect().toSeq
    assert(rows.sorted == Seq(11L, 13L, 14L),
      s"exactly-once survivor multiset violated: $rows")
  }
}
