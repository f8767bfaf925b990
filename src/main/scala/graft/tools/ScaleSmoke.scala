package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{AsofJoin, Chunking, Dedup, RangeJoin, Sampling, Similarity, Skew, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-stress smoke: the heavy operators over a corpus UNIONED `mult`
  * times (distinct ids, identical texts/vectors) — `mult`-wide duplicate
  * clusters are the adversarial case for every bucketed operator (LSH
  * buckets, posting lists, and CC components all widen by `mult`), so a
  * clean run here is evidence the plans hold past the gate SF, not just on
  * it. Wall times print per stage; any stage exploding superlinearly in
  * `mult` is the finding.
  * `runMain graft.tools.ScaleSmoke [mult] [sfDir] [substr1,substr2,…]` —
  * the optional third arg runs only stages whose name contains one of the
  * comma-separated substrings (case-insensitive), for iterating on new
  * stages without replaying the list.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(16)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(2).headOption
      .map(_.toLowerCase.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // blank/comma-only filter = run everything, not nothing
    val spark = GraftSession.local("graft-scale-smoke")

    // UNTIMED inter-stage cleanup, the Bench.scala §8.0 harness: 80+
    // stages in one JVM accumulate localCheckpoint blocks (triangles,
    // HITS, CC, ppjoin all pin storage) that ContextCleaner only
    // reclaims after a GC — without this, storage-pinned memory starved
    // a ×16 ppjoin sort into UNABLE_TO_ACQUIRE_MEMORY. Only RDDs the
    // stage ITSELF pinned are dropped: a blanket clearCache()/unpersist
    // would also evict deliberately shared cross-stage frames (the
    // image-feature cache below), replaying their build per downstream
    // plan reference and invalidating any cross-stage localCheckpoint.
    // A cache-BUILDING stage (its persist materializes inside the timed
    // action, so the new RDD id is indistinguishable from stage litter)
    // passes `keepNew = true` and owns the unpersist itself.
    // stage-name filter shared by time() and the hand-timed locally{}
    // blocks (write-path stages whose cost isn't a single noop save) —
    // without the guard those blocks run on every filtered invocation
    def active(name: String): Boolean =
      !only.exists(fs => !fs.exists(name.toLowerCase.contains))
    def time(name: String, keepNew: Boolean = false)(df: => DataFrame): Unit = {
      if (!active(name)) return
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[smoke] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      if (!keepNew) {
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
        }
      }
      System.gc()
    }

    def widen(df: DataFrame, idCol: String): DataFrame =
      (0 until mult).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L))).reduce(_ union _)

    val docs = widen(Tables.documents(spark, sfDir), "doc_id")
    val vecs = widen(Tables.embeddings(spark, sfDir), "vec_id")
    println(s"[smoke] mult=$mult docs=${docs.count()} vecs=${vecs.count()}")

    time("exact dedup groups")(Dedup.exactGroups(docs, "text", "doc_id"))
    time("minhash-lsh near-dup pairs")(
      Dedup.nearDupPairs(docs, "doc_id", "text", numHashes = 64, bands = 16))
    time("simhash near-dup pairs")(
      Dedup.simHashNearDupPairs(docs, "doc_id", "text", maxHamming = 3))
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", numHashes = 64, bands = 16)
      .select("id_a", "id_b")
    time("connected components")(
      Dedup.connectedComponents(docs.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b",
        maxIter = 30))
    // bandBits sized with the corpus, the way a deployment tunes it: the
    // bucket count per band must grow with n or bucket occupancy (and the
    // candidate-pair volume, quadratically) grows instead — at 64k vectors
    // a fixed bandBits=8 produced ~145M candidates and task OOMs on the
    // single-JVM heap. Target ~16 vectors per bucket.
    val nVecs = vecs.count()
    val bandBits = math.max(8, (math.log(nVecs / 16.0) / math.log(2)).ceil.toInt)
    println(s"[smoke] cosine LSH bandBits=$bandBits")
    time("cosine pairs banded-LSH")(
      Similarity.cosineNearDupPairsLsh(vecs, "vec_id", "embedding",
        threshold = 0.8, dim = 64, bandBits = bandBits, bands = 16))
    time("hash split + chunk")(
      Chunking.chunkByTokens(
        Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.95, "val" -> 0.05), "smoke"),
        "doc_id", "text", chunkTokens = 64, overlap = 8))

    time("tf-idf")(TextAnalysis.tfidf(docs, "doc_id", "text"))

    // Line-level dedup under maximal line heat: the q62-style construction
    // over the WIDENED corpus means every body line occurs mult times and
    // the boilerplate lines occur once per document — the hot-line case the
    // min-aggregate (not a window) shape exists for.
    val lined = docs.select(col("doc_id"), concat_ws("\n",
      concat(lit("hdr "), (col("doc_id") % 7).cast("string"), lit(" x")),
      col("text"),
      lit("shared boilerplate line here")).as("text"))
    time("line-level dedup")(Dedup.dedupLines(lined, "doc_id", "text", "\n", minTokens = 3))
    time("top n-grams")(TextAnalysis.topNgrams(docs, "text", n = 3, k = 50))
    time("int8 quantize")(Similarity.quantizeInt8(vecs, "vec_id", "embedding"))

    // ANN family: probes stay probe-sized (the operators' contract); the
    // corpus side is what widens. IVF centroids come from the unwidened
    // originals — a trained quantizer doesn't grow with the corpus.
    val probes = Tables.embeddings(spark, sfDir).limit(64)
    val centroids = Tables.embeddings(spark, sfDir).limit(32)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    time("ann brute-force top-k")(
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", probes, "vec_id", "embedding", 10))
    time("ann lsh top-k")(
      Similarity.lshTopK(vecs, "vec_id", "embedding", probes, "vec_id", "embedding", 10, 64))
    time("ann ivf top-k")(
      Similarity.ivfTopK(vecs, "vec_id", "embedding", centroids, "cid", "cvec",
        probes, "vec_id", "embedding", 10, nprobe = 4))

    // As-of with HOT keys: events widen on event_id but keep user_id, so
    // every user carries mult x the events — the skew case leftAsofBucketed
    // exists for. Orders stay dimension-sized.
    val ev = widen(Tables.events(spark, sfDir).select(col("event_id"), col("user_id"), col("ts")),
      "event_id")
    val ord = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    time("asof bucketed (hot keys)")(
      AsofJoin.leftAsofBucketed(ev, ord,
        leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
        leftTime = "ts", rightTime = "o_orderdate",
        rightCols = Seq("o_orderkey"), bucketMicros = 86400000000L * 30))

    time("salted agg")(
      Skew.saltedSumCount(docs, Seq(col("lang")),
        Seq("total_chars" -> col("n_chars").cast("double")), col("doc_id")))

    // --- round-6 operators under the same widening ------------------------

    // Edit-distance verify over a candidate chain spanning the WIDENED
    // corpus (every id is a candidate endpoint; cross-replica gaps drop out
    // in the inner join). Cost model under test: candidate-bounded pair
    // count x the truncateAt-capped DP, never all-pairs.
    time("edit-distance verify")(
      Dedup.editDistanceVerify(docs, "doc_id", "text",
        docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b")),
        truncateAt = 120))

    // URL metrics + blocklist gate over the widened corpus: per-row regex
    // extraction (zero shuffle) and the broadcast-semi + SMJ-pinned
    // anti-join shape.
    time("url metrics")(TextAnalysis.urlMetrics(docs, "doc_id", "text"))
    val blocklist = spark.range(0, 64).select(
      concat(lit("spam"), col("id"), lit(".example.com")).as("domain"))
    time("domain blocklist filter")(
      TextAnalysis.filterByDomainBlocklist(docs, "doc_id", "text", blocklist))

    // Incremental dedup against a persisted index: the index covers the
    // WIDENED corpus (every text in a mult-wide identical cluster), the
    // newcomer batch is the unwidened original — so every newcomer hits
    // mult index twins, the adversarial bucket-width case for the
    // candidate join. Exact-fingerprint variant drops every newcomer.
    // offset sits BETWEEN widen()'s replica bands (i * 100000000L + id with
    // id << 50M), so newcomer ids can never collide with a widened id at
    // any mult — a +900000000L offset would equal the i=9 replica's band
    val newcomers = Tables.documents(spark, sfDir)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
    time("near-dup vs LSH index")(
      Dedup.nearDupAgainstIndex(newcomers, "doc_id", "text",
        Dedup.buildLshIndex(docs, "doc_id", "text"), docs))
    time("exact dedup vs fingerprint index")(
      Dedup.dropKnownFingerprints(newcomers, "text",
        Dedup.buildFingerprintIndex(docs, "text")))

    // Range join with SKEWED interval lengths — the maxFanOut guard's
    // adversarial regime: most intervals span one bucket, every 97th spans
    // ~50 of the 64 allowed, so the exploded side mixes 1-row and 51-row
    // fan-outs (the skew an even-width corpus never shows). Points are the
    // widened events; intervals widen with them.
    val hourUs = 3600000000L
    val evWide = widen(
      Tables.events(spark, sfDir).select(col("event_id"), col("ts")), "event_id")
    val points = evWide.select(col("event_id").as("point_id"),
      unix_micros(col("ts")).as("t"))
    def skewedIntervals(mod: Int, idName: String, s: String, e: String) =
      evWide.filter(col("event_id") % mod === 0)
        .select(col("event_id").as(idName),
          unix_micros(col("ts")).as(s),
          (unix_micros(col("ts")) +
            when(col("event_id") % 97 === 0, lit(50L * hourUs))
              .otherwise(lit(hourUs) / 2)).as(e))
    // Per-key cap with PATHOLOGICAL heat: keyed on lang (a handful of
    // values over the whole widened corpus — every key is a hot key), the
    // regime the bounded top-k Aggregator exists for.
    time("cap per key (all-hot keys)")(
      Skew.capPerKey(docs.select(col("lang"), col("doc_id")), Seq("lang"), "doc_id", k = 100))
    time("token-budget cut per lang")(
      Sampling.tokenBudgetSample(docs.select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", Seq("lang"), budgetTokens = 1000000L, salt = "smoke-mix"))

    time("range join (skewed intervals)")(
      RangeJoin.pointsInIntervals(points, "t",
        skewedIntervals(100, "interval_id", "ival_s", "ival_e"), "ival_s", "ival_e",
        bucketWidth = hourUs))
    time("interval overlap (skewed)")(
      RangeJoin.intervalOverlaps(
        skewedIntervals(100, "a_id", "a_s", "a_e"), "a_s", "a_e",
        skewedIntervals(140, "b_id", "b_s", "b_e"), "b_s", "b_e",
        bucketWidth = hourUs))

    // --- round-7/8 operators under the same widening ----------------------

    // Cross-doc window dedup under the WORST case the widening creates:
    // every doc is a mult-wide identical cluster, so EVERY window is
    // cross-doc duplicated — the dup set is the whole window table and the
    // stats/strip joins carry every row. Output (stats: one row per doc;
    // strip: every doc rewritten) grows linearly in mult.
    time("dup-window stats (all dup)")(
      Dedup.duplicatedWindowStats(docs, "doc_id", "text", w = 5))
    time("strip dup windows (all dup)")(
      Dedup.stripDuplicatedWindows(docs, "doc_id", "text", w = 5))

    // BM25 with corpus-hot query terms: every doc contains them, so each
    // query's match set is the ENTIRE corpus — the case the bounded
    // TopKScored aggregator (not a per-query window) exists for.
    locally {
      import spark.implicits._
      val hotQueries = Seq((1L, "batch join"), (2L, "customer query table"), (3L, "data"))
        .toDF("query_id", "qtext")
      time("bm25 top-10, corpus-hot queries")(
        TextAnalysis.bm25TopK(docs, "doc_id", "text", hotQueries, "query_id", "qtext", k = 10))
    }

    // Quantizer training: each Lloyd iteration is one corpus pass
    // (projection-assign + keyed mean); 3 iterations over the widened
    // vectors with k sized like a real IVF quantizer. Linear growth in
    // rows x iterations is the finding.
    time("kmeans train (k=32, 3 iters)")(
      Similarity.trainKMeans(vecs, "vec_id", "embedding", k = 32, iterations = 3, dim = 64))

    // Bigram LM self-perplexity over the widened corpus: every bigram's
    // count multiplies by mult (hot count tables), the doc side widens
    // too — the three keyed SMJ joins are what's under test.
    time("bigram LM perplexity")(
      graft.operators.TextAnalysis.bigramPerplexity(docs, "doc_id", "text"))

    // Model quality scoring: a pure per-row fold — this should track scan
    // speed exactly (the fasttext-filter inference pass at corpus scale).
    time("hashed linear quality score")(
      graft.operators.TextAnalysis.hashedLinearScore(docs, "doc_id", "text",
        (0 until 256).map(i => ((i * 37) % 21 - 10) / 10.0), bias = -0.5))

    // SemDeDup: 8 fixed centroids -> clusters of ~n/8 widened vectors, and
    // the mult-wide identical-vector clusters all land in ONE cell —
    // within-cell pair volume grows mult² BY CONTRACT (that is the
    // algorithm); the finding is whether wall time tracks that output
    // growth rather than exceeding it.
    time("semdedup (8 cells)")(
      Similarity.semDedup(vecs, "vec_id", "embedding",
        Tables.embeddings(spark, sfDir).orderBy(col("vec_id")).limit(8)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
        "cid", "cvec", threshold = 0.8))

    // Resample + ffill with HOT keys: events widened on event_id keep their
    // user_id, so every user's series is mult x denser — but the grid is
    // span/bucket-bounded, so the output should NOT widen with mult, only
    // the per-key aggregation does. Superlinear growth here means the grid
    // escaped its bound.
    time("resample + ffill (hot keys)")(
      graft.operators.TimeSeries.resampleForwardFill(
        ev.select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id")),
        "user_id", "t", "event_id", bucketWidth = 86400000000L))

    // Bucketed-table economics at scale: pay the clustered write once, then
    // the fact-fact join is exchange-free. Times the write AND the join —
    // the write is the amortized cost under test.
    time("bucketed write + zero-exchange join") {
      import graft.sinks.BucketedWrite
      BucketedWrite.writeBucketed(ev.select(col("user_id"), col("event_id")),
        "smoke_ev_b", numBuckets = 16, bucketCols = Seq("user_id"))
      BucketedWrite.writeBucketed(
        Tables.orders(spark, sfDir).select(col("o_custkey").as("user_id"), col("o_orderkey")),
        "smoke_ord_b", numBuckets = 16, bucketCols = Seq("user_id"))
      spark.table("smoke_ev_b").join(spark.table("smoke_ord_b"), "user_id")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    }

    // Small-file compaction over a many-epoch exactly-once sink: 4*mult
    // epochs x 8 files each — the after-a-week landing zone. The cost model
    // is one read+write of the data plus listings; epoch count should show
    // up in listings only.
    if (active(s"compaction (${4 * mult} epochs)")) locally {
      val dir = java.nio.file.Files.createTempDirectory("graft-smoke-compact").toString + "/sink"
      val writer = new graft.sinks.ExactlyOnceParquetWriter(dir)
      val epoch = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")).repartition(8)
      (0 until 4 * mult).foreach(b => writer.write(epoch, b.toLong))
      val t0 = System.nanoTime()
      val report = graft.sinks.Compaction.compactParquet(spark, dir)
      println(f"[smoke] ${"compaction (" + 4 * mult + " epochs)"}%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
        s"(${report.filesBefore} -> ${report.filesAfter} files)")
    }

    // Image near-dup end to end (the q84 pipeline) over a widened image
    // corpus: every 10th doc id is an image, every 20th has a planted
    // one-pixel twin, and widen() makes each image a mult-wide identical
    // cluster — encode, ImageIO decode, luminance grid, banded sign-LSH,
    // exact verify. bandBits sized with n like the vector stage above.
    if (active("image features (encode+decode) image near-dup (lsh over feats)")) locally {
      val base = docs.select(col("doc_id")).filter(col("doc_id") % 10 === 0)
      val ids = base.select(col("doc_id").as("media_id"),
          col("doc_id").as("seed"), lit(false).as("perturb"))
        .unionByName(base.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 1000000000000L).as("media_id"),
            col("doc_id").as("seed"), lit(true).as("perturb")))
      val nImgs = ids.count()
      val imgBandBits = math.max(3, (math.log(nImgs / 16.0) / math.log(2)).ceil.toInt)
      println(s"[smoke] image corpus n=$nImgs bandBits=$imgBandBits")
      val feats = graft.operators.Multimodal.extractImageFeatures(
        graft.operators.Multimodal.syntheticGrayPngs(ids), gridW = 8, gridH = 8)
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      // extraction timed once, then PERSISTED for the LSH — the pair scan
      // references the feature frame several times (candidates + verify),
      // and replaying a codec per reference is exactly what a deployment's
      // extract-once-then-dedup layout avoids
      // persist BEFORE the timed action so the one timed pass is also the
      // one that populates the cache — the codec runs exactly once
      val cached = feats.persist()
      try {
        time("image features (encode+decode)", keepNew = true)(cached)
        // centerForBuckets: luminance features live in the positive
        // orthant, where raw sign-LSH buckets collapse (the measured 167M-
        // candidate case this knob exists for — see the operator scaladoc)
        time("image near-dup (LSH over feats)")(
          Similarity.cosineNearDupPairsLsh(cached, "vec_id", "embedding",
            threshold = 0.99, dim = 64, bandBits = imgBandBits, bands = 32,
            centerForBuckets = true))
      } finally { cached.unpersist(); () }
    }

    // --- round-9 additions under the same widening ------------------------

    // NB quality-model training: corpus-shaped token stream collapsing into
    // ONE keyed counting aggregation (<= buckets rows out) — should track
    // scan+explode speed, with the widened corpus doubling only the input.
    time("nb train (4096 buckets)")(
      TextAnalysis.trainNaiveBayesWeights(docs.select(col("text"), col("lang")),
        "text", col("lang") === "en", buckets = 4096))

    // IDF-weighted SimHash: the df-count aggregation plus the SMJ join back
    // to token occurrences — every token's df multiplies by mult (hot count
    // rows, the map-side-combine case) while the occurrence side widens too.
    time("simhash weighted (idf)")(
      Dedup.simHashWeighted(docs, "doc_id", "text"))

    // Canonical-URL dedup: per-row canonicalization (pure regex projection)
    // into the SMJ-pinned keep-first semi-join; the widened corpus makes
    // every canonical key a mult-wide duplicate group (all-hot keys).
    val urled = docs.select(col("doc_id"),
      concat(lit("HTTP://WWW.site"), col("doc_id") % 1000,
        lit(".com/p/"), col("doc_id") % 10, lit("/?b=2&a=1&utm_source=x")).as("url"))
    time("canonical-url dedup")(
      Dedup.exactKeepFirst(
        urled.select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canonical")),
        "canonical", "doc_id"))

    // --- round-9 continuation additions (q131-q140 families) --------------

    // PQ: training is one corpus pass per Lloyd iteration (subspace explode
    // keeps total bytes constant); encode is a pure projection; ADC scans
    // m codes per row against the broadcast probe LUTs. All should grow
    // linearly in mult.
    if (active("pq train (m=8, ksub=16, 2 iters) pq encode pq adc top-10")) locally {
      val books = Similarity.pqTrain(vecs, "vec_id", "embedding",
        m = 8, ksub = 16, dim = 64, iterations = 2)
      time("pq train (m=8, ksub=16, 2 iters)")(books)
      val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", books, m = 8, dim = 64)
      time("pq encode")(codes)
      time("pq adc top-10")(
        Similarity.pqTopK(codes, "vec_id", "codes", books, probes, "vec_id", "embedding",
          k = 10, m = 8, dim = 64))
    }

    // Z-ordered write: one range shuffle + sort on the interleaved key —
    // the cost model is ClusteredWrite.parquet's with a cheap projection
    // on top.
    if (active("z-ordered write (2 dims)")) locally {
      val dir = java.nio.file.Files.createTempDirectory("graft-smoke-z").toString + "/t"
      val t0 = System.nanoTime()
      graft.sinks.ClusteredWrite.parquetZOrdered(
        ev.select(col("event_id"), col("user_id")), dir,
        Seq("event_id", "user_id"), numFiles = 32)
      println(f"[smoke] ${"z-ordered write (2 dims)"}%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // Deterministic shuffle: the two-phase prefix sum over the widened
    // corpus — per-bucket windows run wide, only 256 offsets serialize.
    time("deterministic shuffle")(
      Sampling.deterministicShuffle(docs.select(col("doc_id")), "doc_id",
        rowsPerShard = 100000L, salt = "smoke-sh"))

    // Negative sampling: position map + k-wide explode + SMJ position join;
    // draws-per-anchor is constant, so output grows linearly in mult.
    time("negative sampling (k=4)")(
      Sampling.negativeSample(docs.select(col("doc_id")), "doc_id", k = 4, salt = "smoke-ng"))

    // Weighted bottom-k: TakeOrdered over the widened corpus — O(k) heaps.
    time("weighted bottom-k (k=1000)")(
      Sampling.weightedBottomK(docs.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 1000, salt = "smoke-wk"))

    // Trigram lang-id: profile training is bounded by |langs|x|charset|^3
    // (count rows multiply by mult, map-side combined); classification's
    // per-doc rank windows widen with the corpus.
    if (active("trigram lang-id classify")) locally {
      val profiles = TextAnalysis.trainTrigramProfiles(
        Tables.documents(spark, sfDir), "lang", "text", topN = 20)
      time("trigram lang-id classify")(
        TextAnalysis.classifyByTrigramProfiles(docs, "doc_id", "text", profiles, topN = 20))
    }

    // HITS over the widened link graph (every source repeats mult times —
    // hot hub rows): two SMJ join-aggs + two scalar sums per iteration,
    // scores materialized per iteration by contract.
    time("hits (2 iterations)")(
      graft.operators.Graph.hits(
        docs.select(col("source").as("src"),
          concat(lit("site"), (col("doc_id") % 1000).cast("string")).as("dst")),
        "src", "dst", iterations = 2))

    // C4 cleaning: pure per-row projection — tracks scan speed.
    time("c4 clean")(TextAnalysis.c4Clean(lined, "doc_id", "text"))

    // IVF-PQ: residual encode is a pure projection (chained-when literal
    // subtraction + per-subspace argmin); ADC fan-out is probes x nprobe.
    if (active("ivf-pq encode (residual) ivf-pq adc top-10 (nprobe 2)")) locally {
      val cents = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 125 === 0)
        .select((col("vec_id") / 125).cast("long").as("cid"), col("embedding").as("cvec"))
      val resid = Similarity.ivfResiduals(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", cents, "cid", "cvec")
      val books = Similarity.pqTrain(resid, "vec_id", "residual",
        m = 8, ksub = 16, dim = 64, iterations = 1)
      val encoded = Similarity.ivfPqEncode(vecs, "vec_id", "embedding",
        cents, "cid", "cvec", books, m = 8, dim = 64)
      time("ivf-pq encode (residual)")(encoded)
      time("ivf-pq adc top-10 (nprobe 2)")(
        Similarity.ivfPqTopK(encoded, "vec_id", cents, "cid", "cvec", books,
          probes, "vec_id", "embedding", k = 10, m = 8, dim = 64, nprobe = 2))
    }

    // Funnel: k-1 keyed join+aggs over the widened events (hot users).
    time("funnel (3 steps)")(
      graft.operators.Funnel.funnelTimes(
        widen(Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts")), "event_id"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase")))

    // Rolling z-score: one per-key ordered window; hot keys carry mult x
    // the rows, cost is per-key row count.
    time("rolling z-score")(
      graft.operators.TimeSeries.rollingZScore(
        widen(Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("ts"), col("value")), "event_id"),
        "user_id", Seq("ts", "event_id"), "value", lookback = 10, threshold = 2.0))

    // Incremental CC: label edges (1/node) + the widened batch's pairs —
    // vs re-walking history's full pair list.
    if (active("incremental cc (new batch)")) locally {
      val oldDocs = Tables.documents(spark, sfDir)
      val oldCC = Dedup.connectedComponents(oldDocs.select(col("doc_id")), "doc_id",
        Dedup.jaccardPairs(oldDocs, "doc_id", "text").select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      val newDocs = Tables.documents(spark, sfDir)
        .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
      val newPairs = Dedup.nearDupAgainstIndex(newDocs, "doc_id", "text",
        Dedup.buildLshIndex(oldDocs, "doc_id", "text"), oldDocs)
        .select(col("id_a"), col("id_b"))
      time("incremental CC (new batch)")(
        Dedup.incrementalConnectedComponents(oldCC, "doc_id",
          newDocs.select(col("doc_id")), newPairs, "id_a", "id_b"))
    }

    // Bloom-prefiltered join: fact side widened, dim selective — the probe
    // prunes before the shuffle.
    time("bloom-prefiltered join")(
      Skew.bloomPrefilteredJoin(
        ev.select(col("user_id"), col("event_id")),
        Tables.orders(spark, sfDir).filter(col("o_custkey") % 3 === 0)
          .select(col("o_custkey"), col("o_orderkey")),
        "user_id", "o_custkey", mBits = 1 << 16, kHashes = 4))

    // Mergeable rollup: mult partials (one per replica band) merged — the
    // metrics-store read path; partial cost dominates, merge is key-sized.
    time("rollup partial + merge (4 shards)")(
      graft.operators.Rollup.merge(
        (0 until 4).map(s => graft.operators.Rollup.partial(
          docs.filter(col("doc_id") % 4 === s), Seq("lang"), "n_chars")), Seq("lang")))

    // Cross-corpus ANN: the banded equi-join between two widened halves —
    // candidate volume follows the band model, both key frames SMJ-pinned.
    time("cross-corpus ANN pairs")(
      Similarity.crossCosinePairsLsh(
        vecs.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        vecs.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        threshold = 0.8, dim = 64, bandBits = bandBits, bands = 16))

    // Grouped rank over enum strata (lang): the per-(group, value-bucket)
    // windows run wide; a plain window would funnel |langs| tasks.
    time("grouped rank (per-lang)")(
      Skew.groupedRank(docs.select(col("lang"), col("n_chars"), col("doc_id")),
        Seq("lang"), "n_chars", "doc_id"))

    // Snapshot diff + apply round trip over the widened corpus: one
    // full-outer SMJ + one anti-join/union — both linear.
    locally {
      val cur = docs.select(col("doc_id"), col("text"), col("lang"))
      val prior = cur.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, lit("stale")).otherwise(col("text")).as("text"),
          col("lang"))
      time("snapshot diff + apply")(
        graft.operators.Snapshot.applyChangeset(prior,
          graft.operators.Snapshot.diffSnapshots(prior, cur, Seq("doc_id")), Seq("doc_id")))
    }

    // --- round-10 additions (q148/q150-q167 tail families) ----------------

    // LATERAL top-k per group with HOT groups: orders widen on o_orderkey
    // but keep o_custkey, so every customer's correlated subquery scans
    // mult x the rows — the unmeasured regime the verdict called out.
    // Spark plans the correlated limit as a lateral join; the finding is
    // whether its per-group sort tracks group size or degrades globally.
    locally {
      widen(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")), "o_orderkey")
        .createOrReplaceTempView("smoke_orders_lat")
      Tables.customer(spark, sfDir).select(col("c_custkey"))
        .createOrReplaceTempView("smoke_customer_lat")
      time("lateral top-2 per customer (hot)")(
        spark.sql("""
          SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          FROM smoke_customer_lat c,
               LATERAL (SELECT o_orderkey, o_totalprice FROM smoke_orders_lat o
                        WHERE o.o_custkey = c.c_custkey
                        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t"""))
    }

    // SCD2 assembly with hot keys: events widen on event_id keeping
    // user_id — per-key ordered windows carry mult x the rows; nothing
    // global, so growth should be linear.
    time("scd2 assembly (hot keys)")(
      graft.operators.Scd.scd2(
        widen(Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type")), "event_id"),
        "user_id", Seq("ts", "event_id"), "event_type"))

    // Data-quality battery over the widened corpus: FD check is one keyed
    // distinct-count agg; entropy runs over enum-sized value counts; RI is
    // one SMJ anti-join.
    time("fd violations (source -> lang)")(
      graft.operators.Profiler.fdViolations(docs, Seq("source"), Seq("lang")))
    time("entropy card (lang, source)")(
      graft.operators.Profiler.entropyCard(docs, Seq("lang", "source")))
    time("ri orphans (events -> customer)")(
      graft.operators.Profiler.riOrphans(
        widen(Tables.events(spark, sfDir).select(col("event_id"), col("user_id")), "event_id"),
        "user_id", Tables.customer(spark, sfDir), "c_custkey"))

    // Journey paths with hot users: per-user collect_list widens by mult —
    // the per-key state the sort_array agg carries; output stays
    // path-cardinality-sized.
    time("journey paths (5 steps, hot)")(
      graft.operators.Funnel.journeyPaths(
        widen(Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type")), "event_id"),
        "user_id", Seq("ts", "event_id"), "event_type", maxSteps = 5))

    // Rolling HLL MAU from per-period sketches: register build is one
    // keyed max-agg over the widened events; the rolling merge touches
    // only O(periods x m) register rows — corpus size drops out after the
    // build, which is the operator's whole point.
    locally {
      val evd = widen(Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("ts")), "event_id")
        .select((unix_micros(col("ts")) / 86400000000L).cast("long").as("day"), col("user_id"))
      val regs = graft.operators.Sketches.hllRegisters(
        evd, Seq("day"), col("user_id"), p = 9, salt = "smoke-hll")
      time("hll rolling 7-day estimate")(
        graft.operators.Sketches.hllRollingEstimate(regs, "day", p = 9, windowPeriods = 7))
    }

    // Entity resolution with mult-wide blocks: widen() turns every entity
    // into a mult-wide identical cluster sharing its blocking key — the
    // per-block quadratic contract under maximal block heat. Block count
    // bounds the damage; wall time should track sum(block^2).
    locally {
      val ents = docs.select(col("doc_id"),
        substring(col("text"), 1, 40).as("name"),
        (col("doc_id") % 500).cast("int").as("blk"))
      time("entity resolution (hot blocks)")(
        Dedup.blockedEntityPairs(ents, "doc_id", "name",
          Seq("blk"), maxDistance = 6, truncateAt = 64))
    }

    // --- round-10 operator families ----------------------------------------

    // Prefix-filtered exact Jaccard join, run THE WAY ITS CONTRACT SAYS:
    // exact dedup first, ppjoin over the survivors. The widened corpus is
    // the operator's documented degenerate case when fed raw — a 16-wide
    // identical cluster has NO rare shingles, every prefix element's
    // posting is >= 16 wide, candidates are inherently Ω(width²) per
    // cluster, and the raw-input run spilled > 80 GB of candidate rows at
    // ×16 before dying (measured; the reason the dedup-first contract is
    // in the scaladoc). The composed stage: exactKeepFirst absorbs the
    // ×mult duplication at scan cost, ppjoin sees only survivors.
    time("exact-dedup-first + ppjoin")(
      Dedup.jaccardPairsPrefixFiltered(
        Dedup.exactKeepFirst(docs, "text", "doc_id"), "doc_id", "text"))

    // Triangles + peel over a two-residue graph built from the widened
    // corpus: distinct-edge count saturates at the residue grid, so both
    // should flatten past the saturation point — the degree-ordered wedge
    // bound under maximal duplicate-edge pressure.
    locally {
      val edges = docs.select((col("doc_id") % 400).as("src"),
        ((col("doc_id") / 400).cast("long") * 7 + col("doc_id") * 13 + 5).mod(400).as("dst"))
      time("triangles (compact-forward)")(
        graft.operators.Graph.triangles(edges, "src", "dst"))
      time("degree peel (k=11, 2 rounds)")(
        graft.operators.Graph.degreePeel(edges, "src", "dst", k = 11, iterations = 2))
    }

    // Personalized PageRank: same SMJ iteration as q103's, teleport a pure
    // expression — linear in edges x iterations.
    time("personalized pagerank (2 iters)")(
      graft.operators.Graph.personalizedPageRank(
        docs.select(col("source").as("src"),
          concat(lit("site"), (col("doc_id") % 1000).cast("string")).as("dst")),
        "src", "dst", seeds = Seq("src0", "src1"), iterations = 2))

    // Corpus statistics sweep: PMI (two vocab-shaped count joins), chi2
    // (enum marginals), KL (integer-grid sum), lexical diversity — all
    // count-table-bounded; linear in corpus scan.
    time("pmi collocations")(
      TextAnalysis.pmiCollocations(docs, "text", minCount = 5, k = 50))
    time("chi2 keywords per lang")(
      TextAnalysis.chiSquaredKeywords(docs, "lang", "text", minCount = 20, k = 5))
    time("kl divergence per source")(
      TextAnalysis.klFromCorpus(docs, "source", "text"))
    time("lexical diversity per lang")(
      TextAnalysis.lexicalDiversity(docs, "lang", "text"))
    time("ngram novelty vs reference")(
      TextAnalysis.ngramNovelty(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        docs.filter(col("doc_id") % 2 === 0), "text"))
    time("script profile + readability")(
      TextAnalysis.scriptProfile(docs, "doc_id", "text")
        .join(TextAnalysis.readability(docs, "doc_id", "text"), "doc_id"))

    // Epoch mixing: <= ceil(e)-wide explode, zero shuffle.
    time("epoch mix (fractional)")(
      Sampling.epochMix(docs.select(col("doc_id"), col("lang")), "doc_id", "lang",
        Seq("de" -> 2.5, "en" -> 0.5, "es" -> 1.0, "fr" -> 1.25, "zh" -> 2.0), "smoke-em"))

    // Secondary-sort folds with hot keys: events widen on event_id keeping
    // user_id — per-key series carry mult x the rows, state stays O(1).
    locally {
      val evs = widen(Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value")), "event_id")
      time("ewma fold (hot keys)")(
        graft.operators.TimeSeries.ewmaByKey(evs, "user_id", Seq("ts", "event_id"),
          "value", alpha = 0.25))
      time("cusum fold (hot keys)")(
        graft.operators.TimeSeries.cusumByKey(evs, "user_id", Seq("ts", "event_id"),
          "value", target = 50.0, slack = 10.0, threshold = 200.0))
      time("mad outliers per event type")(
        Skew.madOutliers(evs.select(col("event_id"), col("user_id"), col("value"))
          .withColumn("event_type", (col("event_id") % 5).cast("string")),
          Seq("event_type"), "value"))
    }

    // Incremental SCD2: history from the UNWIDENED events, a widened new
    // batch merged — cost should track the batch + one pass over the
    // dimension rows, never history replay.
    locally {
      val base = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val existing = graft.operators.Scd.scd2(base, "user_id", Seq("ts", "event_id"), "event_type")
      val newBatch = widen(base, "event_id")
        .select(col("event_id"), col("user_id"),
          (col("ts") + expr("INTERVAL 365 DAYS")).as("ts"), col("event_type"))
      time("scd2 incremental merge (wide batch)")(
        graft.operators.Scd.scd2Merge(existing, newBatch,
          "user_id", Seq("ts", "event_id"), "event_type"))
    }

    // --- round-11: behavioral analytics under a planted BOT user ---------
    // Events widen on event_id keeping user_id (per-user series carry
    // mult x rows), and every 97th event is REMAPPED to user 0 — one user
    // accumulating ~1% of the whole widened stream. The multi-touch
    // clicks x purchases join is per-user QUADRATIC BY CONTRACT (the
    // 7-day-window Fellegi-Sunter-style trade q192's scaladoc documents),
    // so the bot user is the adversarial case: its pair count grows
    // mult^2 while everyone else's grows mult — wall time must track the
    // PAIR count, not explode past it.
    locally {
      val evs = widen(Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          col("value")), "event_id")
        .withColumn("user_id",
          when(col("event_id") % 97 === 0, lit(0L)).otherwise(col("user_id")))
      val purchases = evs.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("pts"))
      val clicks = evs.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("cts"))
      time("multitouch attribution (bot user)") {
        val matched = clicks.hint("shuffle_merge")
          .join(purchases.hint("shuffle_merge"), Seq("user_id"))
          .filter(col("cts") <= col("pts") &&
            col("cts") >= col("pts") - lit(7L * 86400L * 1000000L))
        val perPurchase = matched.groupBy(col("purchase_id")).agg(count(lit(1)).as("__np"))
        matched.join(perPurchase.hint("shuffle_merge"), Seq("purchase_id"))
          .groupBy(col("click_id")).agg(count(lit(1)).as("n_purchases"))
      }
      time("last-touch as-of attribution (bot user)")(
        graft.operators.AsofJoin.leftAsof(
          purchases.select(col("purchase_id").as("event_id"), col("user_id"),
            col("pts").as("ts")),
          evs.filter(col("event_type") === "click")
            .groupBy(col("user_id"), unix_micros(col("ts")).as("click_ts"))
            .agg(max(col("event_id")).as("click_id")),
          leftKeys = Seq("user_id"), rightKeys = Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts",
          rightCols = Seq("click_id", "click_ts")))
      time("markov transitions (bot user)") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val trans = evs
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
        val counts = trans.groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("cnt"))
        counts.join(broadcast(
            counts.groupBy(col("from_type")).agg(sum(col("cnt")).as("__tot"))),
          Seq("from_type"))
      }
      time("funnel step lags (bot user)")(
        graft.operators.Funnel.funnelTimes(
          evs.select(col("user_id"), col("event_type"), col("ts")),
          "user_id", "event_type", "ts", Seq("view", "click", "purchase")))
      time("pearson by group (widened lineitem)")(
        graft.operators.Profiler.pearsonByGroup(
          widen(Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
              col("l_extendedprice")), "l_orderkey"),
          Seq("l_returnflag"), "l_quantity", "l_extendedprice", decimalScale = 2))
      time("benford digits (widened orders)")(
        graft.operators.Profiler.benfordDigits(
          widen(Tables.orders(spark, sfDir)
            .select(col("o_orderkey"), col("o_totalprice")), "o_orderkey"),
          "o_totalprice"))
      time("coordinated sample (events + orders)") {
        val evS = Sampling.deterministicSample(
          evs.select(col("user_id"), col("event_id")), "user_id", 0.1, "coord")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        val ordS = Sampling.deterministicSample(
          widen(Tables.orders(spark, sfDir)
            .select(col("o_custkey").as("user_id"), col("o_orderkey")), "o_orderkey"),
          "user_id", 0.1, "coord")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_orders"))
        evS.hint("shuffle_merge")
          .join(ordS.hint("shuffle_merge"), Seq("user_id"), "full_outer")
      }
    }

    // --- round-11: retrieval/quality additions ---------------------------
    // RM3 feedback expansion: the BM25 pass dominates; the fb-bounded
    // grids add a constant tail — cost must track the q87 stage.
    locally {
      val spark2 = spark
      import spark2.implicits._
      val queries = Seq((1L, "batch join"), (2L, "customer query table"))
        .toDF("query_id", "qtext")
      time("rm3 expansion (bm25 + grids)")(
        TextAnalysis.rm3Expansion(docs.select(col("doc_id"), col("text")),
          "doc_id", "text", queries, "query_id", "qtext", fbDocs = 10, fbTerms = 8))
    }
    // Jaro-Winkler over widened customers: pure projection, linear.
    time("jaro-winkler name matching")(
      widen(Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name")), "c_custkey")
        .select(col("c_custkey"),
          graft.functions.JaroWinkler.similarity(col("c_name"),
            concat(lit("K"), expr("substring(c_name, 2, length(c_name) - 1)"))).as("sim")))
    // Winnowing fingerprints: the sublinear index — per-doc windows,
    // one doc-keyed shuffle; linear in tokens.
    time("winnowing fingerprints")(
      Dedup.winnowingFingerprints(docs, "doc_id", "text", k = 5, w = 4))
    // Centroid outliers over widened embeddings: one enum-keyed grid
    // aggregation + a broadcast-back scoring projection.
    time("centroid outliers (per-group)")(
      Similarity.centroidOutliers(
        widen(Tables.embeddings(spark, sfDir), "vec_id")
          .withColumn("grp", pmod(col("vec_id"), lit(4)).cast("string")),
        "vec_id", "grp", "embedding", dim = 64, minCos = 0.2))
    // Decayed counts under the bot-user events widening: one scalar
    // anchor + one keyed aggregation.
    time("decayed counts (trending)")(
      graft.operators.TimeSeries.decayedCounts(
        widen(Tables.events(spark, sfDir).select(col("event_id"), col("event_type"),
          col("ts")), "event_id"),
        "event_type", "ts", halfLifeSecs = 7.0 * 86400.0))

    // --- round-11b: stats / community additions --------------------------
    // Label propagation over a graph whose NODE SPACE grows with mult
    // (each widened slab forms its own 100-node blocks): per-round
    // edge⋈labels join + argmax must track edges linearly.
    time("label propagation (3 rounds)")(
      graft.operators.Graph.labelPropagation(
        docs.select(col("doc_id").as("src"),
          (col("doc_id") - (col("doc_id") % 100)
            + ((col("doc_id") * 31 + 7) % 100)).as("dst")),
        "src", "dst", iterations = 3))
    // KS drift test: the per-value counting aggregation is corpus-linear;
    // the ECDF window rides the FIXED distinct-value frame (~2k lengths).
    time("ks test (even vs odd x2)")(
      graft.operators.Profiler.ksTest(
        docs.filter(col("doc_id") % 2 === 0).select(col("n_chars")),
        docs.filter(col("doc_id") % 2 =!= 0).select((col("n_chars") * 2).as("n_chars")),
        "n_chars"))
    // Poisson bootstrap: the x200 explode fuses into a map-side-combined
    // aggregation — shuffle carries 200xpartitions partials, not 200xrows.
    time("bootstrap mean CI (200 reps)")(
      graft.operators.Profiler.bootstrapMeanCi(
        docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars",
        reps = 200, salt = "smoke"))
    // Theil-Sen + ACF: the corpus-linear daily aggregation dominates; the
    // pair/lag joins ride the FIXED series (30 days x 5 types).
    time("theil-sen + acf (daily series)") {
      val daily = widen(Tables.events(spark, sfDir).select(col("event_id"),
        col("event_type"), col("ts")), "event_id")
        .filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      graft.operators.TimeSeries.theilSen(daily, "event_type", "day", "cnt")
        .join(graft.operators.TimeSeries.autocorrelation(
          daily, "event_type", "day", "cnt", maxLag = 7).hint("shuffle_merge"),
          Seq("event_type"))
    }
    // Krippendorff over a three-rater widened matrix: one unit-keyed
    // aggregation, corpus-linear.
    time("krippendorff alpha (3 raters)") {
      val ra = docs.select(col("doc_id").as("unit"), lit("a").as("rater"),
        col("lang").as("value"))
      val rc = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("unit"), lit("c").as("rater"),
          when(col("doc_id") % 7 === 0, lit("en")).otherwise(col("lang")).as("value"))
      graft.operators.Profiler.krippendorffAlpha(
        ra.union(rc), "unit", "rater", "value")
    }

    // --- round-11: composed link authority over a widened domain graph --
    // Doc widening multiplies SOURCES (src carries the widened id residue)
    // while the domain set stays fixed — out-degrees hold, co-citation
    // saturates at the domain grid, so the stage should flatten past
    // saturation exactly like the triangles stage above.
    // --- round-11c: motifs / heavy hitters / reconciliation / rfm -------
    // Event n-grams under the bot-user widening: the per-user collect is
    // the documented buffer; the bot's gram fan-out is linear in ITS
    // event count, everyone else's in theirs.
    time("event n-grams (n=3, bot user)") {
      val ev = widen(Tables.events(spark, sfDir).select(col("event_id"),
        col("user_id"), col("event_type"), col("ts")), "event_id")
        .withColumn("user_id",
          when(col("event_id") % 97 === 0, lit(0L)).otherwise(col("user_id")))
      graft.operators.Funnel.eventNgrams(ev, "user_id", Seq("ts", "event_id"),
        "event_type", n = 3, minCount = 5)
    }
    // Misra-Gries heavy hitters over the widened token stream: one O(k)
    // summary fold + one isin-filtered recount — corpus-linear twice.
    time("heavy hitters (tokens, phi=1/200)")(
      graft.operators.Profiler.heavyHitters(
        docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok")),
        "tok", phiDen = 200))
    // Reconciliation over widened lineitem: two keyed decimal sums + one
    // full-outer SMJ; output stays violation-sized.
    time("reconcile (widened lineitem)") {
      val li = widen(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")), "l_orderkey")
      graft.operators.Profiler.reconcile(
        li.select(col("l_orderkey"), col("l_quantity")), "l_orderkey", "l_quantity",
        li.filter(!(col("l_orderkey") % 1000 === 0 && col("l_linenumber") === 1))
          .select(col("l_orderkey"), col("l_quantity")), "l_orderkey", "l_quantity")
    }
    // RFM over widened events: one keyed aggregation + broadcast cuts.
    time("rfm segmentation (widened)") {
      val ev = widen(Tables.events(spark, sfDir).select(col("event_id"),
        col("user_id"), col("event_type"), col("ts")), "event_id")
        .select(col("user_id"), col("ts"),
          when(col("event_type") === "purchase", col("event_id") % 50 + 1)
            .otherwise(lit(0L)).as("amount"))
      graft.operators.Funnel.rfm(ev, "user_id", "ts", "amount")
    }

    time("link authority (ppr + triangles + core)")(
      graft.operators.Graph.linkAuthority(
        docs.select(concat(lit("s"), (col("doc_id") % 2000).cast("string")).as("src"),
          concat(lit("site"), (((col("doc_id") / 20).cast("long") % 25
            + (col("doc_id") % 20) * 2) % 40).cast("string")).as("dst")),
        "src", "dst", seeds = Seq("s0", "s1"),
        pprIterations = 2, coreK = 25, coreIterations = 2))

    // --- round-12: linkAuthority's maxOutDegree cap under a DIRECTORY
    // HUB — the case the cap exists for. The widened corpus plants a hub
    // source co-citing EVERY doc-derived domain (domain count grows with
    // mult via the doc_id residue, so uncapped the hub alone contributes
    // Ω(domains²) co-citation pairs — quadratic in mult). With the cap,
    // the hub is bounded at maxOutDegree² pairs FOREVER; wall time must
    // track the normal sources' grid, not the hub.
    time("link authority (directory hub, cap)")(
      graft.operators.Graph.linkAuthority(
        docs.select(concat(lit("s"), (col("doc_id") % 2000).cast("string")).as("src"),
          concat(lit("site"), (col("doc_id") % 5000).cast("string")).as("dst"))
          .unionByName(docs.select(lit("hubdir").as("src"),
            concat(lit("site"), (col("doc_id") % 5000).cast("string")).as("dst"))),
        "src", "dst", seeds = Seq("s0", "s1"),
        pprIterations = 2, coreK = 25, coreIterations = 2,
        maxOutDegree = 100))

    // --- round-12: the OUT-OF-SAMPLE PAV calibration chain (q258) under
    // the widening: corpus-linear score + split passes; the PAV minimax
    // and held-out scoring ride the checkpointed ≤bins frame (the
    // bins-bounded BNLJs the plan audit whitelists) — growth must track
    // the scan, never the bin joins.
    time("oos calibrated brier (PAV chain)") {
      val scored = TextAnalysis.hashedLinearScore(
        docs.select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", graft.queries.PackShared.qualityWeights, bias = -0.5)
      graft.operators.Profiler.oosCalibratedBrier(
        Sampling.hashSplit(scored.withColumn("label", col("lang") === "en"),
          "doc_id", Seq("train" -> 0.7, "heldout" -> 0.3), "smoke-oos"),
        "split", "train", "quality_score", "label", bins = 10)
    }

    // --- round-11c: inference / link-prediction / decomposition ----------
    locally {
      val evs = widen(Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts")), "event_id")
      // Spearman over widened lineitem: the two rank windows are the
      // per-group funnel (enum groups, the window-op contract); sums are
      // map-side combined.
      time("spearman (widened lineitem)")(
        graft.operators.Inference.spearmanByGroup(
          widen(Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
              col("l_extendedprice")), "l_orderkey"),
          Seq("l_returnflag"), "l_quantity", "l_extendedprice"))
      // Welch + ANOVA: single map-side-combined scalar aggregations —
      // must be shuffle-free-flat in mult.
      time("welch t (hash arms)") {
        val users = evs.groupBy(col("user_id")).agg(count(lit(1)).as("engagement"))
        graft.operators.Inference.welchTTest(
          Sampling.hashSplit(users, "user_id", Seq("a" -> 0.5, "b" -> 0.5), "exp1"),
          "split", "engagement", "a", "b")
      }
      time("anova (event types)")(
        graft.operators.Inference.anovaOneWay(
          evs.select(col("event_type"), col("value")), "event_type", "value"))
      // Kendall rides the capPerKey bound: candidate pairs are FIXED at
      // k²/2 per group no matter the corpus — cost must flatten, only the
      // cap scan growing with mult.
      time("kendall tau (capped 150/group)") {
        val e = evs.filter(col("value").isNotNull && col("ts").isNotNull)
          .select(col("event_type"), col("event_id"), col("value"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
              .cast("long").as("day"))
        graft.operators.Inference.kendallTauB(
          Skew.capPerKey(e, Seq("event_type"), "event_id", 150),
          Seq("event_type"), "event_id", "value", "day")
      }
      // Ratio jackknife: unit aggregation is the corpus-linear part; the
      // per-group window runs over the user-shaped unit frame.
      time("ratio jackknife (value/event)") {
        val units = evs.filter(col("value").isNotNull)
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("value_sum"), count(lit(1)).as("n_events"))
        graft.operators.Inference.ratioJackknife(units, Seq("event_type"),
          "value_sum", "n_events")
      }
      // Changepoint + STL over the daily series: the aggregation is
      // corpus-linear, the window frames ride the fixed day grid.
      val daily = evs.filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt"))
      time("changepoint (daily series)")(
        graft.operators.TimeSeries.changepoint(daily, Seq("event_type"), "day", "cnt"))
      time("stl decompose (daily series)")(
        graft.operators.TimeSeries.stlDecompose(daily, Seq("event_type"), "day", "cnt"))
    }
    // Adamic–Adar on the label-prop node-space-growing graph: wedge count
    // is Σdeg² on the BLOCK grid — per-block degrees are fixed, blocks
    // multiply, so growth must track edges.
    time("adamic-adar (block graph)")(
      graft.operators.Graph.adamicAdar(
        docs.select(col("doc_id").as("src"),
          (col("doc_id") - (col("doc_id") % 100)
            + ((col("doc_id") * 31 + 7) % 100)).as("dst")),
        "src", "dst", maxDegree = 1024, topK = 20))
    // Class weights: one count aggregation + a k-row reduction.
    time("class weights (langs)")(
      Sampling.classWeights(docs, "lang"))
    // Sparse TF-IDF cosine: the widened corpus multiplies df per term, so
    // the maxDf cap is scaled with mult to keep the cap semantics (a
    // deployment tunes it corpus-relative); candidate volume is Σdf².
    time("tfidf cosine pairs (maxDf-capped)")(
      TextAnalysis.tfidfCosinePairs(docs, "doc_id", "text",
        maxDf = 50 * mult, threshold = 0.3, topK = 50))
    // Brier decomposition over the widened scored corpus: one corpus
    // scan + bins-sized reductions.
    time("brier decomposition (quality scorer)") {
      val scored = TextAnalysis.hashedLinearScore(
        docs.select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", graft.queries.PackShared.qualityWeights, bias = -0.5)
      graft.operators.Profiler.brierDecomposition(
        scored.withColumn("label", col("lang") === "en"),
        "quality_score", "label", bins = 10)
    }
    // Isotonic calibration over the same widened scorer: the md5
    // projection is the corpus-linear part; the PAV minimax rides the
    // checkpointed 10-bin frame.
    time("isotonic calibration (quality scorer)") {
      val scored = TextAnalysis.hashedLinearScore(
        docs.select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", graft.queries.PackShared.qualityWeights, bias = -0.5)
      graft.operators.Profiler.isotonicCalibration(
        scored.withColumn("label", col("lang") === "en"),
        "quality_score", "label", bins = 10)
    }

    // Matched ATT: the unit aggregation is corpus-linear; the per-stratum
    // match windows run over the user-shaped unit frame (4 strata — the
    // documented funnel contract).
    time("matched att (user units)") {
      val evs = widen(Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value")),
        "event_id")
      val units = evs.groupBy(col("user_id"))
        .agg(count(lit(1)).as("engagement"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total_value"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("treated"))
        .withColumn("cohort", pmod(col("user_id"), lit(4L)))
      graft.operators.Experiment.matchedOutcomes(units, Seq("cohort"), "user_id",
        "treated", "engagement", "total_value", caliper = 5.0)
    }
    // Raking: ONE corpus-linear count; iterations ride the 100-cell grid.
    time("raking (lang x source)")(
      Sampling.rakeWeights(docs, "lang", "source",
        Seq("de", "en", "es", "fr", "zh").map(_ -> 0.2),
        (0 until 20).map(i => s"src$i" -> 0.05), iterations = 3))
    // Heaps law: two corpus-linear aggregations (the deliberate
    // double-scan), vocabulary-shaped shuffle for first-occurrence.
    time("heaps law (vocab growth)")(
      TextAnalysis.heapsLaw(docs, "doc_id", "text", buckets = 10))

    // Silhouette: the model is trained on the UNWIDENED originals (a
    // trained quantizer doesn't grow with the corpus — the IVF rule);
    // scoring is one O(n·k) projection + a k-row aggregation.
    time("silhouette (widened vecs)") {
      val cents = Similarity.trainKMeans(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", k = 4, iterations = 2, dim = 64)
      Similarity.simplifiedSilhouette(widen(Tables.embeddings(spark, sfDir), "vec_id"),
        "vec_id", "embedding", cents, "cid", "centroid")
    }
    locally {
      val evs = widen(Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts")),
        "event_id")
      val daily = evs.filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt"))
      // Mann-Kendall: pair join rides the FIXED day grid.
      time("mann-kendall (daily series)")(
        graft.operators.Inference.mannKendall(daily, Seq("event_type"), "day", "cnt"))
      // Log-rank: the subject derivation is corpus-linear; the risk
      // windows ride the fixed duration grid.
      time("log-rank (time to purchase)") {
        val winEnd = lit("2024-01-03").cast("date")
        val win = evs.filter(to_date(col("ts")) <= winEnd)
        val first = win.groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("start"))
        val firstBuy = win.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("pd"))
        val subj = first.join(firstBuy.hint("shuffle_merge"), Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("pd").isNotNull, datediff(col("pd"), col("start")))
              .otherwise(datediff(winEnd, col("start"))).as("duration"),
            col("pd").isNotNull.as("observed"))
        graft.operators.TimeSeries.logRank(
          Sampling.hashSplit(subj, "user_id", Seq("a" -> 0.5, "b" -> 0.5), "exp1"),
          "split", "duration", "observed", "a", "b")
      }
      // FDR segment sweep: the reps-explode is the corpus-heavy part
      // (users x reps), everything downstream is groups-sized.
      time("fdr segment sweep (perm x100 + BH)") {
        val perUserType = evs.groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("engagement"))
        val assigned = Sampling.hashSplit(perUserType, "user_id",
          Seq("a" -> 0.5, "b" -> 0.5), "exp1")
        graft.operators.Inference.bhAdjust(
          graft.operators.Experiment.permutationTestByGroup(assigned,
            Seq("event_type"), "user_id", "split", "engagement",
            reps = 100, salt = "perm1"),
          "p_value", Seq("event_type"), alpha = 0.1)
      }
    }

    // r14: PCM synthesis + decode + features — per-row nested
    // higher-order expressions, zero shuffle; superlinear growth would
    // mean the sample array is being recomputed per statistic.
    time("pcm synth + wav + features") {
      val pcm = graft.operators.Multimodal.synthPcm16(
        docs.select(col("doc_id")), "doc_id", nSamples = 480)
      val wav = graft.operators.Multimodal.wrapWav(pcm, "audio", sampleRate = 8000)
      graft.operators.Multimodal.audioFeatures(
        graft.operators.Multimodal.parseWav(wav, "wav"), "pcm",
        frameSamples = 160, energyThreshold = 1L << 36)
    }

    // r14: the full G.711 chain (decode → encode → decode for BOTH codecs
    // off one synthetic code stream) — four fused kernel passes per row,
    // zero shuffle; must stay corpus-linear like the pcm stage.
    time("g711 mulaw+alaw codec chain") {
      val m = graft.operators.Multimodal
      val codes = m.synthMulaw(docs.select(col("doc_id")), "doc_id", nSamples = 480)
      val mu = m.decodeMulaw(m.encodeMulaw(m.decodeMulaw(codes, "mulaw"), "pcm")
        .drop("pcm"), "mulaw_out")
        .withColumnRenamed("pcm", "mu_pcm")
      val both = m.decodeAlaw(m.encodeAlaw(m.decodeAlaw(mu, "mulaw"), "pcm")
        .drop("pcm"), "alaw_out")
      m.audioFeatures(both, "pcm", frameSamples = 160, energyThreshold = 1L << 36)
    }

    // r15: the unigram-tokenizer application surface over the widened
    // corpus — fused Viterbi docStats + hash-sampled 3-best stats per
    // row (two kernel passes), folded into the per-lang transfer card.
    // Zero shuffle until the |langs|-row aggregation; superlinear growth
    // would mean the DP is re-running per statistic.
    time("unigram viterbi + sampled card") {
      val chars = (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -3000000L)
      val v = graft.operators.UnigramLm.fixedVocab(
        chars ++ Seq("th" -> -5500000L, "er" -> -5500000L, "on" -> -5500000L),
        maxPieceLen = 2)
      docs.select(col("lang"),
          graft.operators.UnigramLm.docStats(coalesce(col("text"), lit("")), v).as("__s"),
          graft.operators.UnigramLm.sampledStats(
            coalesce(col("text"), lit("")), v, n = 3, salt = "ep1").as("__ss"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(element_at(col("__s"), 2)).as("viterbi_tokens"),
          sum(element_at(col("__ss"), 2)).as("sampled_tokens"))
    }

    // r15: the full telephony ingest chain — G.711 µ-law decode →
    // 8 kHz→16 kHz resample → WAV wrap → parse → features — five fused
    // kernel passes per row, zero shuffle; superlinear growth would mean
    // an intermediate byte array is being recomputed per stage.
    time("g711 -> resample -> wav chain") {
      val m = graft.operators.Multimodal
      val codes = m.synthMulaw(docs.select(col("doc_id")), "doc_id", nSamples = 480)
      val pcm8k = m.decodeMulaw(codes, "mulaw")
      val pcm16k = pcm8k.select(col("doc_id"),
        graft.functions.PcmExpressions.resamplePcm16(col("pcm"), 8000, 16000).as("audio"))
      val wav = m.wrapWav(pcm16k, "audio", sampleRate = 16000)
      m.audioFeatures(m.parseWav(wav, "wav"), "pcm",
        frameSamples = 160, energyThreshold = 1L << 36)
    }

    // r15: the utterance-extraction chain — composite synth (two ramps
    // around a low frame) → fused VAD segmentation → posexplode → byte
    // slice → per-segment stats. Three kernel passes + one explode per
    // row, zero shuffle; superlinear growth would mean the composite
    // binary is rebuilt per segment.
    time("vad segments + utterance slice") {
      val pcm = docs.select(col("doc_id"),
        concat(
          graft.functions.PcmExpressions.synthPcm16(col("doc_id").cast("long"), 4800),
          graft.functions.PcmExpressions.synthPcm16(lit(1057L), 160),
          graft.functions.PcmExpressions.synthPcm16(
            col("doc_id").cast("long") * 3 + 7, 4800)).as("audio"))
      graft.operators.Multimodal.speechSegments(pcm, "audio", frameSamples = 160,
          energyThreshold = 5760000000L, maxGapFrames = 1, minSpanFrames = 3)
        .select(col("doc_id"), col("seg_idx"),
          graft.functions.PcmExpressions.pcmStats(
            col("audio").substr(
              (col("start_frame") * 320 + 1).cast("int"),
              (col("span_frames") * 320).cast("int")),
            160, 5760000000L).as("st"))
    }

    // r15: WordPiece greedy application + coverage card over the widened
    // corpus — one fused kernel pass per row into the |langs|-row card.
    time("wordpiece greedy + coverage card") {
      val wchars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
        .filterNot(Set("q", "x", "z"))
      val v = graft.operators.WordPiece.fixedVocab(
        initial = wchars ++ Seq("th", "er", "on"),
        continuation = wchars ++ Seq("th", "er", "on"), maxPieceLen = 2)
      graft.operators.WordPiece.coverageCard(
        docs.select(col("lang"), col("text")), "text", "lang", v)
    }

    // r15: sign quantization + MIH Hamming pairs over the widened vector
    // table — the mult-wide duplicate clusters are the adversarial case
    // for the band buckets (every bucket widens by mult, candidates by
    // mult²); band bits sized with the corpus like the cosine-LSH stage.
    locally {
      // bandBits must divide 32; step the {8,16,32} ladder with corpus
      // size (target <= ~16 per bucket, the cosine-LSH sizing rule)
      val hBandBits = if (nVecs <= 4096) 8 else if (nVecs <= (1L << 20)) 16 else 32
      if (active("hamming")) println(s"[smoke] hamming bandBits=$hBandBits")
      time("sign quantize + hamming pairs") {
        val codes = Similarity.signQuantize(vecs, "vec_id", "embedding")
        Similarity.signHammingPairs(codes, "vec_id", "code",
          dim = 64, maxHamming = 64 / hBandBits - 1, bandBits = hBandBits)
      }
    }

    // r15: CDC chunking + cross-doc chunk dedup under the widened corpus
    // — the adversarial case: every chunk occurs mult times, so the
    // md5 group-by's hot keys widen by mult. Chunk volume is
    // corpus-linear (one fused kernel + explode per row); the dedup is
    // one keyed aggregation with map-side combine.
    time("cdc chunks + dup group-by")(
      Dedup.cdcDuplicateChunks(docs, "doc_id", "text"))

    // r15: the full mono-prep audio chain — stereo downmix → peak
    // normalize → VAD stats — three fused kernel passes per row, zero
    // shuffle, must stay corpus-linear.
    time("stereo -> gain -> vad chain") {
      val pcm = graft.operators.Multimodal.synthPcm16(
        docs.select(col("doc_id")), "doc_id", nSamples = 960)
      pcm.select(col("doc_id"),
        graft.functions.PcmExpressions.vadSegments(
          graft.functions.PcmExpressions.gainNormalize(
            graft.functions.PcmExpressions.stereoDownmix(col("audio")), 16384),
          40, 40L * 8000 * 8000, 1, 2).as("segs"))
    }

    // r14: Bradley-Terry over corpus-scaled duels — the up-front duel
    // count aggregation is the only corpus-shaped stage; 8 MM iterations
    // ride the items-bounded majority frame and must be mult-invariant.
    time("bradley-terry (8 iters)") {
      val duels = docs.select(
        concat(lit("s"), pmod(col("doc_id"), lit(7L))).as("w"),
        concat(lit("s"), pmod(col("doc_id") * 13L + 5L, lit(7L))).as("l"))
        .filter(col("w") =!= col("l"))
      graft.operators.Experiment.bradleyTerry(duels, "w", "l", iterations = 8)
    }

    // r14: the Confluent wire serde round-trip with the DLQ routing under
    // a mult-widened corpus — one mapPartitions encode + one tagged decode,
    // zero shuffle; anything superlinear here would mean per-row registry /
    // datum-reader churn crept back in.
    locally {
      import graft.serde.{ConfluentAvroFrames, ConfluentWire, ConfluentWireColumns}
      val schemaJson =
        """{"type":"record","name":"DocMeta","namespace":"graft",
           |"fields":[{"name":"lang","type":"string"},{"name":"n_chars","type":"long"}]}""".stripMargin
      time("avro wire serde + dlq route") {
        val wired = ConfluentAvroFrames.serializeAppend(
            docs.select(col("doc_id"), col("lang"), col("n_chars")),
            topic = "docs", isKey = false, schemaJson = schemaJson)
          .select(col("doc_id"),
            when(col("doc_id") % 41 === 0,
              concat(lit(Array(0x21.toByte)), substring(col("wire"), 2, Int.MaxValue)))
            .when(col("doc_id") % 31 === 0,
              ConfluentWireColumns.withWireHeader(
                ConfluentWireColumns.wirePayload(col("wire")), 999))
            .when(col("doc_id") % 29 === 0,
              substring(col("wire"), 1, ConfluentWire.HeaderSize + 1))
            .otherwise(col("wire")).as("wire"))
        ConfluentAvroFrames.deserializeTagged(
          wired, "wire", topic = "docs", isKey = false, schemaJson)
      }
    }

    // r16: the JPEG chain — real ImageIO encode per row + the fused
    // header parse; per-row codec work, zero shuffle, so the stage
    // must track scan speed (corpus-linear).
    time("jpeg transcode + dims parse") {
      val pngs = graft.operators.Multimodal.syntheticGrayPngs(
        docs.select(col("doc_id").as("media_id"), col("doc_id").as("seed"),
          lit(false).as("perturb")))
      val jp = graft.operators.Multimodal.transcodeJpeg(pngs)
      graft.operators.Multimodal.jpegDims(
          jp.select(col("media_id"), col("content")), "content")
        .groupBy(col("is_jpeg"), col("width"))
        .agg(count(lit(1)).as("n"))
    }

    // r16: the sampled fidelity card at a mult-scaled sampleMod — the
    // deployment shape: sample size (and the quadratic pair volume)
    // stays ~constant as the corpus widens, so the stage must be FLAT
    // in mult (the whole point of the sampled entry point).
    time("sign fidelity sampled card") {
      graft.operators.Similarity.signFidelityCard(
        vecs, "vec_id", "embedding",
        cosineThreshold = 0.8, maxHamming = 7, sampleMod = 2 * mult)
    }

    // r17: the audio container walks — synth + parse are both pure
    // per-row kernels (zero shuffle until the tiny audit groupBy), so
    // the stages must scan-scale. The Ogg stage runs the CRC check per
    // page — the most expensive part of the walk, deliberately in the
    // smoke's hot loop.
    time("mp3 synth + frame walk") {
      val ids = docs.select(col("doc_id").as("media_id"),
        when(col("doc_id") % 7 === 0, lit(2)).otherwise(lit(1)).cast("int").as("version"),
        (lit(1) + pmod(col("doc_id"), lit(14))).cast("int").as("bitrate_idx"),
        pmod(col("doc_id"), lit(3)).cast("int").as("rate_idx"),
        (lit(2) + pmod(col("doc_id"), lit(4))).cast("int").as("n_frames"),
        (col("doc_id") % 5 === 0).as("with_id3"),
        (col("doc_id") % 2 === 0).as("mono"))
      val media = graft.operators.Multimodal.syntheticMp3s(ids)
      graft.operators.Multimodal.mp3Info(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("sample_rate")).agg(sum(col("duration_ms")).as("ms"))
    }
    time("gzip synth + inflate audit") {
      val ids = docs.select(col("doc_id").as("media_id"), col("text"),
        pmod(col("doc_id"), lit(100000)).cast("long").as("mtime"),
        (pmod(col("doc_id"), lit(3)) * 2).cast("int").as("xfl"),
        when(col("doc_id") % 2 === 0, lit(3)).otherwise(lit(255)).cast("int").as("os"),
        when(col("doc_id") % 5 === 0, concat(lit("d"), col("doc_id"))).as("fname"),
        (col("doc_id") % 11 === 0).as("corrupt_crc"))
      val media = graft.operators.Multimodal.gzipDocuments(ids)
      graft.operators.Multimodal.gzipInfo(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("crc_ok")).agg(sum(col("n_decoded")).as("b"))
    }
    time("ogg synth + crc page walk") {
      val ids = docs.select(col("doc_id").as("media_id"),
        (lit(1) + pmod(col("doc_id"), lit(2))).cast("int").as("channels"),
        (lit(312) + pmod(col("doc_id"), lit(100))).cast("int").as("pre_skip"),
        (lit(1) + pmod(col("doc_id"), lit(3))).cast("int").as("n_audio_pages"),
        (lit(960) * (lit(1) + pmod(col("doc_id"), lit(4)))).cast("int").as("samples_per_page"),
        (col("doc_id") % 11 === 0).as("corrupt_crc"))
      val media = graft.operators.Multimodal.syntheticOpusOggs(ids)
      graft.operators.Multimodal.oggInfo(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("n_pages")).agg(sum(col("duration_ms")).as("ms"))
    }
    time("warc synth + member walk") {
      val ids = docs.select(col("doc_id").as("media_id"),
        (lit(1) + pmod(col("doc_id"), lit(4))).cast("int").as("n_rec"),
        (col("doc_id") % 11 === 0).as("corrupt_crc"))
      val media = graft.operators.Multimodal.syntheticWarcShards(ids)
      graft.operators.Multimodal.warcInfo(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("n_crc_bad")).agg(sum(col("content_total")).as("b"))
    }
    time("zstd synth + native audit") {
      val ids = docs.select(col("doc_id").as("media_id"), col("text"),
        (lit(1) + pmod(col("doc_id"), lit(5))).cast("int").as("level"),
        (col("doc_id") % 2 === 0 || col("doc_id") % 11 === 0).as("with_checksum"),
        (col("doc_id") % 11 === 0).as("corrupt_tail"))
      val media = graft.operators.Multimodal.zstdDocuments(ids)
      graft.operators.Multimodal.zstdInfo(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("decode_ok")).agg(sum(col("fcs")).as("b"))
    }
    time("zip synth + directory walk") {
      val ids = docs.select(col("doc_id").as("media_id"),
        (lit(1) + pmod(col("doc_id"), lit(3))).cast("int").as("n_ent"),
        (col("doc_id") % 11 === 0).as("tamper_crc"))
      val media = graft.operators.Multimodal.zipArchives(ids)
      graft.operators.Multimodal.zipInfo(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("n_crc_bad")).agg(sum(col("total_usize")).as("b"))
    }
    time("tfrecord synth + crc32c walk") {
      val ids = docs.select(col("doc_id").as("media_id"),
        (lit(1) + pmod(col("doc_id"), lit(4))).cast("int").as("n_rec"),
        (col("doc_id") % 11 === 0).as("tamper_crc"))
      val media = graft.operators.Multimodal.tfrecordShards(ids)
      graft.operators.Multimodal.tfrecordInfo(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("n_crc_bad")).agg(sum(col("total_bytes")).as("b"))
    }
    time("html synth + region extract") {
      val ids = docs.select(col("doc_id").as("media_id"), col("text"),
        (lit(1) + pmod(col("doc_id"), lit(5))).cast("int").as("n_nav"))
      val pages = graft.operators.Multimodal.syntheticHtmlPages(ids)
      graft.operators.Multimodal.htmlExtract(pages, "html")
        .groupBy(col("n_links")).agg(sum(length(col("text"))).as("b"))
    }
    time("charset synth + utf8 audit") {
      val ids = docs.select(col("doc_id").as("media_id"), col("text"))
      val media = graft.operators.Multimodal.encodedDocuments(ids)
      graft.operators.Multimodal.charsetInfo(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("encoding")).agg(sum(col("n_chars")).as("b"))
    }
    time("tar synth + header walk") {
      val ids = docs.select(col("doc_id").as("media_id"),
        (lit(1) + pmod(col("doc_id"), lit(3))).cast("int").as("n_samples"),
        (col("doc_id") % 11 === 0).as("corrupt_chksum"))
      val media = graft.operators.Multimodal.syntheticTarShards(ids)
      graft.operators.Multimodal.tarInfo(
          media.select(col("media_id"), col("content")), "content")
        .groupBy(col("n_chksum_bad")).agg(sum(col("total_size")).as("b"))
    }

    spark.stop()
  }
}
