package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "hi")                                           // shorter than shingle n
  ).toDF("doc_id", "text")

  test("exactGroups keeps lowest id and counts copies") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .orderBy("keep_id").select("keep_id", "copies").as[(Long, Long)].collect()
    assert(g.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L), (5L, 1L)))
  }

  test("exactKeepFirst drops only the non-keeper duplicates") {
    val kept = Dedup.exactKeepFirst(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("shingles: n-gram sets, whole-text fallback for short docs") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("s"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).contains("the quick brown"))
    assert(sh(1L).size == 7) // 9 tokens -> 7 trigrams, all distinct
    assert(sh(5L) == Seq("hi"))
  }

  test("nearDupPairs finds the near-dup and the exact dup, not the unrelated doc") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near-dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("jaccardPairs (inverted index) equals nearDupPairs (LSH+verify) exactly") {
    val viaIndex = Dedup.jaccardPairs(docs, "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect().toSet
    val viaLsh = Dedup.nearDupPairs(docs, "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(viaIndex == viaLsh)
    assert(viaIndex.contains((1L, 4L, 7, 7))) // exact dup: identical shingle sets
  }

  test("jaccardPairsPrefixFiltered equals the full inverted index exactly, incl. real corpus") {
    val viaIndex = Dedup.jaccardPairs(docs, "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect().toSet
    val viaPrefix = Dedup.jaccardPairsPrefixFiltered(docs, "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(viaPrefix == viaIndex)
    // and on the sf0.001 corpus (threshold 1/2, the q25 setting)
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Dedup.jaccardPairs(corpus, "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect().toSet
    val b = Dedup.jaccardPairsPrefixFiltered(corpus, "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(a == b, s"prefix filter must be exact: missing ${a -- b}, extra ${b -- a}")
  }

  test("jaccardPairs rejects tau = 0 (zero-intersection pairs are unobservable)") {
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(docs, "doc_id", "text", tauNum = 0)
    }
    assert(e.getMessage.contains("tauNum > 0"))
  }

  test("jaccardPairs maxDocFreq drops hot shingles but never invents pairs") {
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", maxDocFreq = Some(2))
      .as[(Long, Long, Int, Int)].collect().toSet
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(capped.map(p => (p._1, p._2)).subsetOf(exact.map(p => (p._1, p._2))))
  }

  test("connectedComponents labels every vertex with the component min") {
    val verts = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(verts, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("connectedComponents converges on a path graph (multi-round propagation)") {
    val verts = (1L to 6L).toDF("id")
    // path 6-5-4-3-2-1: the min label must walk the whole chain
    val edges = Seq((6L, 5L), (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(verts, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L))
  }

  test("connectedComponents maxIter guard stays loud; deep paths converge in O(log d) rounds") {
    // The loud-failure contract: a maxIter too small for the graph must
    // THROW, never silently emit non-minimal labels. (r18: the loop gained
    // a pointer-doubling hop from round 3, so the exact boundary is no
    // longer diameter+1 — the guard semantics are what this pins, plus the
    // logarithmic convergence the hop buys.)
    for (n <- Seq(2, 4, 6)) {
      val verts = (1L to n.toLong).toDF("id")
      val edges = (1L until n.toLong).map(i => (i + 1, i)).toDF("a", "b")
      val ok = Dedup.connectedComponents(verts, "id", edges, "a", "b", maxIter = 20)
        .as[(Long, Long)].collect().toMap
      assert(ok.values.toSet == Set(1L), s"n=$n")
    }
    val e = intercept[graft.core.GraftError] {
      Dedup.connectedComponents((1L to 8L).toDF("id"),
          "id", (1L until 8L).map(i => (i + 1, i)).toDF("a", "b"), "a", "b", maxIter = 1)
        .as[(Long, Long)].collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // a 64-path (diameter 63) must land well inside a 12-round budget —
    // the O(diameter) form needed 64 rounds, pointer doubling ~2+log2(63)
    val deep = Dedup.connectedComponents((1L to 64L).toDF("id"),
        "id", (1L until 64L).map(i => (i + 1, i)).toDF("a", "b"), "a", "b", maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(deep.values.toSet == Set(1L))
  }

  test("connectedComponents with a reliable checkpoint dir writes there and agrees") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    val verts = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(verts, "id", edges, "a", "b",
      checkpointDir = Some(dir.toString)).as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
    // the lineage truncation actually went through the reliable dir
    val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
      .count(p => p.getFileName.toString.startsWith("rdd-"))
    assert(rddDirs >= 2, s"expected reliable checkpoints under $dir, found $rddDirs")
  }

  test("simHash is deterministic and identical for identical text") {
    val s1 = Dedup.simHash(docs, "doc_id", "text").orderBy("doc_id").as[(Long, Long)].collect()
    val s2 = Dedup.simHash(docs, "doc_id", "text").orderBy("doc_id").as[(Long, Long)].collect()
    assert(s1.toSeq == s2.toSeq)
    val m = s1.toMap
    assert(m(1L) == m(4L)) // identical text, identical signature
  }

  test("simHashNearDupPairs: identical docs at hamming 0; respects threshold") {
    val pairs = Dedup.simHashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 4L)) == 0)
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val res = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .orderBy("rnk").select("nbr_id").as[Long].collect()
    assert(res.toSeq == Seq(1L, 2L, 3L)) // 0.994, 0.0, -1.0
  }

  test("cosine of identical vectors is 1, opposite is -1") {
    val row = vecs.filter(col("vec_id") === 0)
      .select(
        Similarity.cosine(Similarity.asDouble(col("embedding")), Similarity.asDouble(col("embedding"))).as("same"))
      .as[Double].head()
    assert(math.abs(row - 1.0) < 1e-12)
  }

  test("lshTopK results are a subset of brute-force rankings for the same probe") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", probes, "vec_id", "embedding", 1000)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(e, "vec_id", "embedding", probes, "vec_id", "embedding", 5, dim = 64, nBits = 4)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(brute))
  }

  // Planted near-dup corpus for the banded-LSH pairs operator: random base
  // vectors (seeded — deterministic) plus clones with small noise, so the
  // only pairs above tau = 0.9 are the planted clone pairs.
  private lazy val plantedVecs = {
    val rnd = new scala.util.Random(42)
    val dim = 32
    val base = (0 until 80).map(i => i.toLong -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    val clones = (0 until 20).map { i =>
      val src = base(i)._2
      (100 + i).toLong -> src.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
    }
    (base ++ clones).toDF("vec_id", "embedding")
  }

  test("cosineNearDupPairsLsh equals exact all-pairs on planted near-dups at aggressive bands") {
    val exact = Similarity.cosineNearDupPairs(plantedVecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupPairsLsh(plantedVecs, "vec_id", "embedding",
      threshold = 0.9, dim = 32, bandBits = 6, bands = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size == 20) // exactly the planted clone pairs
    assert(lsh == exact)     // recall 1 at these bands, precision 1 by verification
  }

  test("cosineCandidatePairs prunes the pair space but keeps every planted pair") {
    val n = plantedVecs.count()
    val allPairs = n * (n - 1) / 2
    val cands = Similarity.cosineCandidatePairs(plantedVecs, "vec_id", "embedding",
      dim = 32, bandBits = 6, bands = 16)
      .as[(Long, Long)].collect()
    assert(cands.length == cands.toSet.size) // distinct across bands
    assert(cands.length < allPairs / 2)      // genuine pruning (measured ~25%)
    val planted = (0 until 20).map(i => (i.toLong, (100 + i).toLong)).toSet
    assert(planted.subsetOf(cands.toSet))
  }

  test("cosineNearDupPairsLsh plans a bucket join, never a nested-loop cross join") {
    val plan = Similarity.cosineNearDupPairsLsh(plantedVecs, "vec_id", "embedding",
      threshold = 0.9, dim = 32, bandBits = 6, bands = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedupLines: keep-first across docs and within a doc; short lines exempt; all-boilerplate docs vanish") {
    val docs = Seq(
      (1L, "one common boilerplate line\nunique body of document one\nshort line"),
      (2L, "one common boilerplate line\nunique body of document two\none common boilerplate line"),
      (3L, "one common boilerplate line"), // nothing survives -> no output row
      (4L, "short line\nunique body of document four")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text", "\n", minTokens = 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "one common boilerplate line\nunique body of document one\nshort line")
    // doc 2 loses BOTH copies (cross-doc and its own second occurrence)
    assert(out(2L) == "unique body of document two")
    assert(!out.contains(3L), "a fully-boilerplate document must drop out entirely")
    // "short line" (2 tokens < 3) is exempt and survives in every doc
    assert(out(4L) == "short line\nunique body of document four")
  }

  test("stripKnownLines: listed lines vanish everywhere, order holds, stream-safe (no shuffle), unbounded list refused") {
    val lines = Seq("one common boilerplate line", "subscribe to our newsletter")
    val docs = Seq(
      (1L, "one common boilerplate line\nunique body of document one\nsubscribe to our newsletter"),
      (2L, "unique body of document two\none common boilerplate line\nmore unique body two"),
      (3L, "one common boilerplate line"), // fully boilerplate -> empty text, row kept
      (4L, "untouched body of document four")
    ).toDF("doc_id", "text")
    val out = Dedup.stripKnownLines(docs, "doc_id", "text", lines)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "unique body of document one")
    assert(out(2L) == "unique body of document two\nmore unique body two")
    assert(out(3L) == "") // unlike dedupLines, the ROW survives (filter gates decide later)
    assert(out(4L) == "untouched body of document four")
    // pure per-row expression: zero exchanges, so it can ride a stream
    val plan = Dedup.stripKnownLines(docs, "doc_id", "text", lines)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    // empty list is a projection-only no-op
    assert(Dedup.stripKnownLines(docs, "doc_id", "text", Nil)
      .as[(Long, String)].collect().toMap == docs.as[(Long, String)].collect().toMap)
    val err = intercept[IllegalArgumentException] {
      Dedup.stripKnownLines(docs, "doc_id", "text", (1 to 20000).map("l" + _))
    }
    assert(err.getMessage.contains("maxLines"))
  }

  test("nearDupAgainstIndex: parquet-persisted index round-trips; pairs equal exact new-x-old Jaccard") {
    val old = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val newcomers = old.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    // the index survives a write/read cycle — the operator's entire point
    // is that the old corpus is signatured once and PERSISTED
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-index").toString
    Dedup.buildLshIndex(old, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val got = Dedup.nearDupAgainstIndex(newcomers, "doc_id", "text", index, old)
      .as[(Long, Long, Int, Int)].collect().toSet

    // exact reference: verify EVERY new-x-old pair (no LSH)
    val allPairs = newcomers.select(col("doc_id").as("id_a"))
      .crossJoin(old.select(col("doc_id").as("id_b")))
    val exact = Dedup.verifyCandidatePairs(
      newcomers.unionByName(old), "doc_id", "text", allPairs)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(got == exact,
      s"only-index=${(got -- exact).take(3)} only-exact=${(exact -- got).take(3)}")
    // every planted twin found itself (J = 1 pairs can never be missed)
    val twinPairs = got.filter { case (a, b, _, _) => a == b + 100000L }
    assert(twinPairs.size == newcomers.count(),
      s"missing twins: ${twinPairs.size} of ${newcomers.count()}")
    // index build is deterministic
    assert(Dedup.buildLshIndex(old, "doc_id", "text").exceptAll(index).isEmpty)
  }

  test("dropKnownFingerprints: batch anti-join; the SAME call is a stream-static join that drains identically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val index = Dedup.buildFingerprintIndex(docs, "text")
    // re-arrivals (verbatim copies, must drop) + genuinely new texts
    val newcomers = docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 4 === 1)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text")))
    val batch = Dedup.dropKnownFingerprints(newcomers, "text", index)
      .as[(Long, String)].collect().toSet
    assert(batch.nonEmpty && batch.forall(_._1 >= 200000L),
      "exactly the verbatim re-arrivals must drop, the edited texts must survive")
    assert(batch.size == docs.filter(col("doc_id") % 4 === 1).count())

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streamed = Dedup.dropKnownFingerprints(in.toDF().toDF("doc_id", "text"), "text", index)
    try spark.catalog.dropTempView("fp_dedup_stream") catch { case _: Exception => () }
    val q = streamed.writeStream.format("memory").queryName("fp_dedup_stream")
      .outputMode("append").start()
    try {
      val feed = newcomers.as[(Long, String)].collect().toSeq
      val (b1, b2) = feed.splitAt(feed.size / 2)
      Seq(b1, b2).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("fp_dedup_stream").as[(Long, String)].collect().toSet
      assert(got == batch,
        s"only-stream=${(got -- batch).map(_._1).take(3)} only-batch=${(batch -- got).map(_._1).take(3)}")
    } finally q.stop()
  }

  test("dedupLines quotes the delimiter: regex metachars split literally") {
    val docs = Seq(
      (1L, "alpha beta gamma tokens|delta epsilon zeta tokens"),
      (2L, "alpha beta gamma tokens|eta theta iota tokens")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text", "|", minTokens = 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta gamma tokens|delta epsilon zeta tokens")
    assert(out(2L) == "eta theta iota tokens")
  }

  test("q61 production band config (bandBits 8 / 16 bands / tau 0.8): measured recall >= 0.95") {
    // the bench/verify entry computes its own recall against planted
    // near-threshold twins — this pins the floor so a banding regression
    // fails the build rather than silently shipping a low-recall config
    val r = graft.SparkEntry.queries("q61_cosine_lsh_prod")(spark, "/root/testdata/sf0.001")
      .collect()(0)
    val (planted, eligible, found, lshPairs, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(planted > 0 && eligible == planted,
      s"all twins must clear tau=0.8 at beta=0.6 (cos~0.857): planted=$planted eligible=$eligible")
    assert(recall >= 0.95, s"production-config recall $recall below the 0.95 floor ($found/$eligible)")
    // verification makes precision exactly 1; on this corpus (no true
    // base-base pairs at 0.8) every emitted pair must be a planted twin
    assert(lshPairs == found, s"unexpected non-planted pairs: lsh=$lshPairs found=$found")
  }

  test("editDistanceVerify: exact distances over LSH candidates, truncation, empty-pair identity") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog entirely"),
      (2L, "the quick brown fox jumps over the lazy cat entirely"), // one-word edit
      (3L, "completely different content with no overlap at all xx"),
      (4L, ""), (5L, "")
    ).toDF("doc_id", "text")
    // LSH candidates catch the near-identical pair; verify scores it
    val cands = Dedup.nearDupPairs(docs.filter(col("doc_id") <= 3), "doc_id", "text",
      numHashes = 64, bands = 16).select("id_a", "id_b")
    val scored = Dedup.editDistanceVerify(docs, "doc_id", "text", cands)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(scored.map(t => (t._1, t._2)) == Seq((1L, 2L)))
    assert(scored.head._3 == 3) // dog -> cat
    // two empty texts: distance 0, similarity defined as 1.0 (no NaN)
    val empty = Dedup.editDistanceVerify(docs, "doc_id", "text",
      Seq((4L, 5L)).toDF("id_a", "id_b"))
      .as[(Long, Long, Int, Double)].head()
    assert(empty._3 == 0 && empty._4 == 1.0)
    // truncation bounds the DP: beyond-truncation differences are invisible
    val far = Seq((1L, "shared prefix here then SOMETHING"), (2L, "shared prefix here then DIFFERENT"))
      .toDF("doc_id", "text")
    val trunc = Dedup.editDistanceVerify(far, "doc_id", "text",
      Seq((1L, 2L)).toDF("id_a", "id_b"), truncateAt = 24)
      .as[(Long, Long, Int, Double)].head()
    assert(trunc._3 == 0 && trunc._4 == 1.0)
  }

  test("editDistanceVerify: default truncation bounds long documents; unbounded is refused") {
    // two "megabyte-class" documents identical in the first 1024 chars —
    // the default cap makes the pair O(1024^2) instead of O(L^2), so the
    // beyond-cap difference is invisible by design
    val prefix = "x" * 2000
    val long = Seq((1L, prefix + "AAAA"), (2L, prefix + "BBBB")).toDF("doc_id", "text")
    val scored = Dedup.editDistanceVerify(long, "doc_id", "text",
      Seq((1L, 2L)).toDF("id_a", "id_b"))
      .as[(Long, Long, Int, Double)].head()
    assert(scored._3 == 0 && scored._4 == 1.0)
    // the unbounded form is a loud error, not a silent O(L^2) job
    val err = intercept[IllegalArgumentException] {
      Dedup.editDistanceVerify(long, "doc_id", "text",
        Seq((1L, 2L)).toDF("id_a", "id_b"), truncateAt = 0)
    }
    assert(err.getMessage.contains("truncateAt"))
  }

  test("quantizeInt8: max element hits ±127 exactly, zero vectors degrade, dequantized ranking holds") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val q = Similarity.quantizeInt8(e, "vec_id", "embedding")
    val rows = q.limit(50).collect()
    rows.foreach { r =>
      val qv = r.getAs[scala.collection.Seq[Int]]("qvec")
      assert(qv.forall(v => v >= -127 && v <= 127))
      assert(qv.map(math.abs).max == 127, "the max-|x| element must quantize to exactly ±127")
    }
    // zero vector: scale 0, all-zero qvec, dequantizes to zeros (no NaN/inf)
    val z = Similarity.quantizeInt8(
      Seq((1L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding"), "vec_id", "embedding")
    val zr = z.select(col("qvec"), Similarity.dequantize(col("qvec"), col("scale")).as("d")).head()
    assert(zr.getAs[scala.collection.Seq[Int]]("qvec").forall(_ == 0))
    assert(zr.getAs[scala.collection.Seq[Double]]("d").forall(_ == 0.0))

    // ANN over dequantized vectors preserves neighborhoods: top-5 by exact
    // cosine vs top-5 over the int8 reconstruction, same probes
    val deq = q.select(col("vec_id"),
      Similarity.dequantize(col("qvec"), col("scale")).as("embedding"))
    def top5(vecs: org.apache.spark.sql.DataFrame) = Similarity.bruteForceTopK(
      vecs, "vec_id", "embedding",
      vecs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = top5(e.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("embedding")))
    val approx = top5(deq)
    val overlaps = exact.map { case (p, nbrs) => (nbrs intersect approx(p)).size }
    assert(overlaps.forall(_ >= 4), s"int8 reconstruction distorted neighborhoods: $overlaps")
  }

  test("ivfTopK with nprobe = nlist degenerates to exact brute force") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter(col("vec_id") < 3)
    val cents = e.filter(col("vec_id") < 8)
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding",
      cents, "vec_id", "embedding", probes, "vec_id", "embedding", k = 5, nprobe = 8)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding",
      probes, "vec_id", "embedding", k = 5)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(ivf.sorted == brute.sorted)
  }

  test("ivfTopK with nprobe < nlist returns a ranked subset of brute force") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter(col("vec_id") < 3)
    val cents = e.filter(col("vec_id") < 8)
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding",
      cents, "vec_id", "embedding", probes, "vec_id", "embedding", k = 5, nprobe = 2)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val bruteAll = Similarity.bruteForceTopK(e, "vec_id", "embedding",
      probes, "vec_id", "embedding", k = 1000)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    assert(ivf.subsetOf(bruteAll))
  }

  private lazy val windowDocs = Seq(
    (1L, "a b c d e"),
    (2L, "x a b c d y"),       // shares "a b c" and "b c d" with d1
    (3L, "z z z"),             // whole doc duplicated in d5
    (4L, "q r"),               // shorter than the window: no windows at all
    (5L, "z z z w z z z")      // "z z z" at positions 0 and 4
  ).toDF("doc_id", "text")

  test("duplicatedWindowStats: cross-doc windows only, positions and distinct counted, short docs zero") {
    val got = Dedup.duplicatedWindowStats(windowDocs, "doc_id", "text", w = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 2L),  // "a b c"@0, "b c d"@1 duplicated with d2
      (2L, 4L, 2L, 2L),  // same two windows at positions 1, 2
      (3L, 1L, 1L, 1L),  // "z z z" also in d5
      (4L, 0L, 0L, 0L),
      (5L, 5L, 2L, 1L))) // "z z z" at 0 and 4; within-doc repeat is ONE distinct window
  }

  test("stripDuplicatedWindows: covered tokens removed with overlaps merged; clean docs byte-identical") {
    val got = Dedup.stripDuplicatedWindows(windowDocs, "doc_id", "text", w = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "e"),         // positions 0-1 cover tokens 0..3
      (2L, "x y"),       // positions 1-2 cover tokens 1..4
      (3L, ""),          // fully duplicated doc strips to empty
      (4L, "q r"),       // untouched (no windows)
      (5L, "w")))        // 0..2 and 4..6 covered, token 3 survives
  }

  test("stripDuplicatedWindows preserves extra columns and within-doc-only repeats") {
    val df = Seq(
      (1L, "p p p p p p", 10),  // repeats only within itself: NOT duplicated
      (2L, "unrelated words here", 20)
    ).toDF("doc_id", "text", "extra")
    val got = Dedup.stripDuplicatedWindows(df, "doc_id", "text", w = 3)
      .orderBy("doc_id").as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "p p p p p p", 10), (2L, "unrelated words here", 20)))
  }

  test("dedupLinesWithinDoc: intra-doc repeats keep first occurrence, short separators and cross-doc repeats survive") {
    val df = Seq(
      (1L, "alpha beta gamma\n--\nshared body line here\n--\nalpha beta gamma\nend of doc one"),
      (2L, "shared body line here\nonly in doc two")  // cross-doc repeat: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesWithinDoc(df, "doc_id", "text")
    val got = out.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "alpha beta gamma\n--\nshared body line here\n--\nend of doc one"),
      (2L, "shared body line here\nonly in doc two")))
    // pure projection: stream-safe
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"dedupLinesWithinDoc must stay a per-row projection:\n$plan")
  }

  test("trainKMeans: planted clusters recovered, centroids are cluster means, empty cluster keeps its init") {
    // three tight clusters around orthogonal axes; the three lowest ids
    // land one per cluster so init already separates them
    def jig(i: Int) = 0.01 * i
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, jig(1))), (3L, Seq(1.0, 0.0, 0.0, jig(2))), (6L, Seq(1.0, 0.0, 0.0, jig(3))),
      (1L, Seq(0.0, 1.0, 0.0, jig(1))), (4L, Seq(0.0, 1.0, 0.0, jig(2))), (7L, Seq(0.0, 1.0, 0.0, jig(3))),
      (2L, Seq(0.0, 0.0, 1.0, jig(1))), (5L, Seq(0.0, 0.0, 1.0, jig(2))), (8L, Seq(0.0, 0.0, 1.0, jig(3)))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.trainKMeans(vecs, "vec_id", "embedding", k = 3, iterations = 3, dim = 4)
      .orderBy("cid").collect()
    assert(cents.map(_.getLong(2)).toSeq == Seq(3L, 3L, 3L), "each planted cluster has 3 members")
    // centroid 0 initialized from vec 0 (x-axis) must be the x-cluster mean
    val c0 = cents(0).getSeq[Double](1)
    assert(math.abs(c0.head - 1.0) < 1e-12 && math.abs(c0(3) - 0.02) < 1e-12, s"got $c0")

    // k = 3 over two distinct points: one centroid never wins a vector and
    // must keep its initialization
    val degen = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val dc = Similarity.trainKMeans(degen, "vec_id", "embedding", k = 3, iterations = 2, dim = 2)
      .orderBy("cid").collect()
    // vectors 0 and 1 are identical: both go to centroid 0 (lowest id wins
    // the cosine tie), centroid 1 ends empty and keeps its init = vec 1
    assert(dc(1).getLong(2) == 0L && dc(1).getSeq[Double](1) == Seq(1.0, 0.0))
    assert(dc(2).getLong(2) == 1L)
  }

  test("dedupLinesWithinDoc / strip operators preserve the input column order") {
    // (lang, doc_id, text, n) — textCol mid-schema: the strip family must
    // replace text IN PLACE, not re-select (id, text, others...), or
    // positional consumers and plain union() downstream misalign
    val df = Seq(("en", 1L, "alpha beta gamma\nalpha beta gamma", 7))
      .toDF("lang", "doc_id", "text", "n")
    assert(Dedup.dedupLinesWithinDoc(df, "doc_id", "text").columns.toSeq ==
      Seq("lang", "doc_id", "text", "n"))
    assert(Dedup.stripDuplicatedWindows(df, "doc_id", "text", w = 2).columns.toSeq ==
      Seq("lang", "doc_id", "text", "n"))
    val index = Dedup.buildWindowIndex(df, "doc_id", "text", w = 2)
    assert(Dedup.stripKnownWindows(df, "doc_id", "text", index, w = 2).columns.toSeq ==
      Seq("lang", "doc_id", "text", "n"))
  }

  test("trainKMeans farthest init: seeds spread across planted clusters; deterministic; zero-norm excluded") {
    // Two tight clusters with ALL low ids in cluster X: lowest-id init
    // seeds both centroids inside X (the skewed-corpus failure), farthest
    // init must jump to Y for the second seed.
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.01, 0.0)), (1L, Seq(1.0, 0.0, 0.02, 0.0)),
      (2L, Seq(1.0, 0.0, 0.03, 0.0)), (3L, Seq(1.0, 0.0, 0.04, 0.0)),
      (10L, Seq(0.0, 1.0, 0.01, 0.0)), (11L, Seq(0.0, 1.0, 0.02, 0.0)),
      (12L, Seq(0.0, 0.0, 0.0, 0.0)) // zero-norm: no direction, excluded
    ).toDF("vec_id", "embedding")
    def sizesOf(init: String, iters: Int) = Similarity
      .trainKMeans(vecs, "vec_id", "embedding", k = 2, iterations = iters, dim = 4, init = init)
      .orderBy("cid").collect().map(_.getLong(2)).toSeq
    // at the seeds themselves (iterations = 0): lowest-id seeds v0 and v1,
    // both inside X -> the split is 1/5 (v1's seed captures nearly
    // everything); farthest seeds v0 then v10 (the least-similar vector to
    // v0, ties none) -> one seed per planted cluster, 4/2
    assert(sizesOf("farthest", 0) == Seq(4L, 2L), "farthest init separates the planted clusters")
    assert(sizesOf("lowest-id", 0) == Seq(1L, 5L), "the planted skew defeats lowest-id init")
    // the farthest seeding survives Lloyd refinement unchanged
    assert(sizesOf("farthest", 2) == Seq(4L, 2L))
    // determinism: two runs, identical centroids
    def run() = Similarity
      .trainKMeans(vecs, "vec_id", "embedding", k = 2, iterations = 2, dim = 4, init = "farthest")
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSeq
    assert(run() == run(), "farthest init must be deterministic")
    // zero-norm vector 12 is excluded from sizing (4 + 2 = 6 of 7 rows)
    assert(sizesOf("farthest", 0).sum == 6L)
  }

  test("trainKMeans spherical: normalized-member mean ignores magnitude skew") {
    // Cluster 0's members point 0° (unit) and ~44.7° (magnitude 140x):
    // the raw mean's direction is dragged to ~44° by the big member; the
    // spherical (normalized-member) mean bisects the two directions.
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),     // seeds
      (2L, Seq(100.0, 99.0)),                        // huge member, joins c0 (cos .7107 vs .7035)
      (3L, Seq(1.0, 2.0))                            // joins c1
    ).toDF("vec_id", "embedding")
    def c0Of(spherical: Boolean) = Similarity
      .trainKMeans(vecs, "vec_id", "embedding", k = 2, iterations = 1, dim = 2,
        spherical = spherical)
      .orderBy("cid").collect()(0).getSeq[Double](1)
    val n2 = math.sqrt(100.0 * 100 + 99.0 * 99)
    val sph = c0Of(spherical = true)
    assert(math.abs(sph.head - (1 + 100 / n2) / 2) < 1e-12 &&
      math.abs(sph(1) - (99 / n2) / 2) < 1e-12, s"got $sph")
    val raw = c0Of(spherical = false)
    // direction (y/x slope): raw is magnitude-dominated (~0.98), spherical
    // bisects (~0.41)
    assert(raw(1) / raw.head > 0.9, s"raw mean should follow the big member, got $raw")
    assert(sph(1) / sph.head < 0.5, s"spherical mean should bisect, got $sph")
  }

  test("centerForBuckets: identical output on a single-orthant corpus, and the twins still surface") {
    // all-positive vectors (the sign-LSH worst case) with planted twins
    val vecs = (0L until 40L).map { i =>
      val base = (0 until 8).map(k => 0.2 + ((i * 7 + k * 13) % 17) / 20.0)
      (i, base)
    } ++ Seq((100L, (0 until 8).map(k => 0.2 + ((5 * 7 + k * 13) % 17) / 20.0 + (if (k == 0) 0.001 else 0.0))))
    val df = vecs.toDF("vec_id", "embedding")
    val raw = Similarity.cosineNearDupPairsLsh(df, "vec_id", "embedding",
      threshold = 0.999, dim = 8, bandBits = 2, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val centered = Similarity.cosineNearDupPairsLsh(df, "vec_id", "embedding",
      threshold = 0.999, dim = 8, bandBits = 2, bands = 16, centerForBuckets = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(centered == raw, "centering the buckets must not change the verified output")
    assert(centered.contains((5L, 100L)), "planted twin pair must surface")
  }

  test("stripKnownWindows: history spans vanish from newcomers, shuffle-free plan, oversized index refused") {
    val history = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val index = Dedup.buildWindowIndex(history, "doc_id", "text", w = 3)
    val newcomers = Seq(
      (10L, "x y alpha beta gamma q r s"),   // one historical span mid-doc
      (11L, "nothing shared here at all"),   // untouched
      (12L, "beta gamma delta epsilon zeta"),// every window historical -> ""
      (13L, "ab")                            // shorter than the window
    ).toDF("doc_id", "text")
    val out = Dedup.stripKnownWindows(newcomers, "doc_id", "text", index, w = 3)
    val got = out.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (10L, "x y q r s"),
      (11L, "nothing shared here at all"),
      (12L, ""),
      (13L, "ab")))
    // stream-safety: a pure projection — no exchange, no join, no state
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"stripKnownWindows must stay a per-row projection:\n$plan")
    val big = intercept[IllegalArgumentException] {
      Dedup.stripKnownWindows(newcomers, "doc_id", "text", index, w = 3, maxIndexWindows = 2)
    }
    assert(big.getMessage.contains("maxIndexWindows"))
  }

  test("stripKnownWindows self-index identity: every >=w doc hollows to empty, shorter docs pass through (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genDoc = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))
    val prop = Prop.forAll(Gen.choose(2, 4), Gen.listOfN(6, genDoc)) { (w, texts) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // the index of a corpus contains every one of its windows, so
      // stripping the corpus against its own index must remove every
      // token of every >=w-token doc and touch nothing shorter — the
      // build/probe hash derivations agreeing token-for-token is exactly
      // what this exercises (the reason hashedWindows is ONE helper)
      val got = Dedup.stripKnownWindows(df, "doc_id", "text",
          Dedup.buildWindowIndex(df, "doc_id", "text", w), w)
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      got == texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (t.split(" ").length >= w) "" else t)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("semDedup: within-cluster keep-first by id; cross-cluster near-dups both survive") {
    val centroids = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cvec")
    val vecs = Seq(
      (10L, Seq(1.0, 0.05)),   // cluster 0, kept
      (11L, Seq(1.0, 0.06)),   // cluster 0, near-dup of 10 -> dropped
      (12L, Seq(0.05, 1.0)),   // cluster 1, kept
      (13L, Seq(0.04, 1.0)),   // cluster 1, near-dup of 12 -> dropped
      (14L, Seq(0.72, 0.70)),  // cluster 0, no near-dup IN its cluster
      (15L, Seq(0.70, 0.72))   // cluster 1: cos(14,15) > 0.99 but clusters differ
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(vecs, "vec_id", "embedding",
        centroids, "cid", "cvec", threshold = 0.95)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (10L, 0L, true), (11L, 0L, false),
      (12L, 1L, true), (13L, 1L, false),
      // the documented SemDeDup blind spot: near-dups split by the
      // cluster boundary are not compared, so both survive
      (14L, 0L, true), (15L, 1L, true)))
  }

  test("keepBestPerCluster keeps the max-quality copy, ties to min id; constant quality = keep-min") {
    val docs = Seq(
      (1L, "a a"), (2L, "a a a"), (3L, "a a a"), // cluster {1,2,3}: 2 and 3 tie on quality -> 2 wins
      (7L, "b")                                  // singleton survives
    ).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L)).toDF("doc_id", "cluster_id")
    val best = Dedup.keepBestPerCluster(
      docs, "doc_id", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")), clusters)
      .select("doc_id").as[Long].collect().toSet
    assert(best == Set(2L, 7L))
    // constant quality degenerates to the keep-min rule
    val keepMin = Dedup.keepBestPerCluster(docs, "doc_id", lit(1), clusters)
      .select("doc_id").as[Long].collect().toSet
    assert(keepMin == Set(1L, 7L))
  }

  test("simHashWeighted: uniform df degenerates to unweighted; rare token dominates the signature") {
    // every doc identical -> every token has df = N -> weight = round(1000*ln(1))+1 = 1
    // -> the weighted signature IS the unweighted one
    val uniform = (1L to 5L).map(i => (i, "alpha beta gamma")).toDF("doc_id", "text")
    val unweighted = Dedup.simHash(uniform, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val weighted = Dedup.simHashWeighted(uniform, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(weighted == unweighted)

    // 100 boilerplate docs + 1 doc that adds one corpus-unique token: the
    // rare token's idf weight (~ln(101)*1000) outvotes the three weight-1
    // stopwords on every bit, so the doc's weighted signature equals the
    // signature of the rare token ALONE (its raw hash bits)
    val docs = ((1L to 100L).map(i => (i, "the quick brown")) :+
      (0L, "the quick brown zebraunique")).toDF("doc_id", "text")
    val sig0 = Dedup.simHashWeighted(docs, "doc_id", "text")
      .filter(col("doc_id") === 0L).select("simhash").as[Long].head()
    val rareAlone = Dedup.simHash(Seq((0L, "zebraunique")).toDF("doc_id", "text"),
      "doc_id", "text").select("simhash").as[Long].head()
    assert(sig0 == rareAlone)
    // and the unweighted signature of the same doc is NOT that (the
    // stopwords outvote 3-to-1 per bit without idf weighting)
    val sig0Unweighted = Dedup.simHash(docs, "doc_id", "text")
      .filter(col("doc_id") === 0L).select("simhash").as[Long].head()
    assert(sig0Unweighted != rareAlone)
  }

  test("containmentPairs finds a snippet Jaccard misses; direction and counts are exact") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val snippet = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big), (2L, snippet), (3L, "totally unrelated content here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", tauNum = 9, tauDen = 10)
      .collect()
    assert(pairs.length == 1)
    val p = pairs(0)
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L)
    // snippet has 8 3-gram shingles, all inside big (58 shingles)
    assert(p.getInt(2) == 8 && p.getInt(3) == 58 && p.getInt(4) == 8)
    assert(p.getAs[Double]("cont_b") == 1.0)
    // symmetric Jaccard at the usual 1/2 threshold misses this pair entirely
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", tauNum = 1, tauDen = 2).collect()
    assert(!j.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    intercept[IllegalArgumentException](
      Dedup.containmentPairs(docs, "doc_id", "text", tauNum = 0))
  }

  test("semanticDecontaminate drops eval-similar vectors, keeps orthogonal and zero-norm ones") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), // identical to the eval vector -> dropped
      (2L, Seq(0.9f, 0.1f, 0.0f)), // near-parallel -> dropped
      (3L, Seq(0.0f, 0.0f, 1.0f)), // orthogonal -> kept
      (4L, Seq(0.0f, 0.0f, 0.0f))  // zero-norm: excluded from the scan -> kept
    ).toDF("vec_id", "embedding")
    val evalSet = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDecontaminate(corpus, "vec_id", "embedding",
      evalSet, "vec_id", "embedding", threshold = 0.8)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }

  test("simHashPairsFromSignatures over simHash output equals simHashNearDupPairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "completely different content here"),
      (4L, "alpha beta gamma delta zeta")
    ).toDF("doc_id", "text")
    val direct = Dedup.simHashNearDupPairs(docs, "doc_id", "text")
      .orderBy("id_a", "id_b").collect().toSeq
    val viaSig = Dedup.simHashPairsFromSignatures(
      Dedup.simHash(docs, "doc_id", "text"), "doc_id")
      .orderBy("id_a", "id_b").collect().toSeq
    assert(direct == viaSig)
    assert(direct.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("blockedEntityPairs: typos link within their block, cross-block twins never compared") {
    import spark.implicits._
    val recs = Seq(
      (1L, "Jonathan Smith", "NY"), (2L, "Jonathon Smith", "NY"), // dist 1, same block
      (3L, "Jonathan Smith", "CA"),                                // identical name, other block
      (4L, "Rebecca Jones", "NY"), (5L, "Entirely Different", "NY")
    ).toDF("id", "name", "state")
    val got = Dedup.blockedEntityPairs(recs, "id", "name", Seq("state"), maxDistance = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)),
      s"expected only the in-block typo pair, got $got — cross-block (1,3) must be absent")
    // distance 0 self-duplicates in one block link too
    val dup = Seq((1L, "Same Name", "NY"), (2L, "Same Name", "NY")).toDF("id", "name", "state")
    assert(Dedup.blockedEntityPairs(dup, "id", "name", Seq("state"), 0)
      .head().getAs[Int]("edit_dist") == 0)
  }

  test("incrementalConnectedComponents: label edges + new edges == from-scratch, incl. old-component merges") {
    import spark.implicits._
    // old graph: {1,2,3} and {10,11} as separate components; 20 a singleton
    val oldVerts = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val oldCC = Dedup.connectedComponents(oldVerts, "id", oldEdges, "id_a", "id_b")
    // new batch: 30-31 join each other AND bridge the two OLD components
    val newVerts = Seq(30L, 31L).toDF("id")
    val newEdges = Seq((30L, 31L), (31L, 3L), (30L, 11L)).toDF("id_a", "id_b")
    val inc = Dedup.incrementalConnectedComponents(oldCC, "id", newVerts,
      newEdges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val scratch = Dedup.connectedComponents(
      oldVerts.unionByName(newVerts), "id",
      oldEdges.unionByName(newEdges), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(inc == scratch, s"incremental $inc != from-scratch $scratch")
    // the bridge merged everything except the singleton onto min id 1
    assert(inc(11L) == 1L && inc(30L) == 1L && inc(20L) == 20L)
  }

  test("winnowingFingerprints: window-min invariants, shared-run guarantee, short-doc fallback") {
    import spark.implicits._
    val text = "a b c d e f g h i j k l m n o p"            // 16 tokens, 12 5-gram hashes
    val shifted = "x y z " + text                           // shares the full 16-token run
    val docs = Seq((1L, text), (2L, shifted), (3L, "a b c d e f")) // doc 3: m=2 < w
    val fp = Dedup.winnowingFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text",
      k = 5, w = 4)
      .as[(Long, Int, Long)].collect()
    val byDoc = fp.groupBy(_._1)
    // every full w-window of doc 1's hash sequence (starts 0..8) contains a
    // selected position — the winnowing coverage guarantee
    val pos1 = byDoc(1L).map(_._2).toSet
    (0 to 8).foreach(s => assert((s until s + 4).exists(pos1.contains),
      s"window starting at $s has no fingerprint: $pos1"))
    // the shared >= w+k-1 run guarantees at least one SHARED hash
    val h1 = byDoc(1L).map(_._3).toSet
    val h2 = byDoc(2L).map(_._3).toSet
    assert(h1.intersect(h2).nonEmpty)
    // density well under all-windows (12 hashes would index 12)
    assert(pos1.size < 12 && pos1.nonEmpty)
    // short doc: exactly its global minimum hash, once
    assert(byDoc(3L).length == 1)
    // determinism
    val again = Dedup.winnowingFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text",
      k = 5, w = 4).as[(Long, Int, Long)].collect()
    assert(fp.sorted.toSeq == again.sorted.toSeq)
  }

  test("mmrRerank: diversity beats raw relevance from step 2; rank 1 is pure relevance") {
    import spark.implicits._
    // A and B point the same way (near-duplicates), C is orthogonal with
    // half the relevance: greedy MMR at lambda 0.7 takes A then C
    val cands = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0), 0.90),
      (2L, Array(1.0, 0.001, 0.0, 0.0), 0.89),
      (3L, Array(0.0, 1.0, 0.0, 0.0), 0.50))
      .toDF("vec_id", "embedding", "rel")
    val got = Similarity.mmrRerank(cands, "vec_id", "embedding", "rel", k = 3, lambda = 0.7)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L), s"selection order: $got")
    assert(got.head._3 == graft.functions.Quantize.scaledFloorDouble(0.7 * 0.90 - 0.3 * 0.0, 6))
    // k beyond the pool truncates cleanly
    assert(Similarity.mmrRerank(cands, "vec_id", "embedding", "rel", k = 9, lambda = 0.7)
      .count() == 3)
  }

  test("centroidOutliers: the vector opposing its group's centroid flags; aligned ones don't") {
    import spark.implicits._
    val vecs = Seq(
      (1L, "g1", Array(1.0, 0.0)), (2L, "g1", Array(1.0, 0.1)),
      (3L, "g1", Array(0.9, 0.0)), (4L, "g1", Array(-1.0, 0.0)),
      (10L, "g2", Array(0.0, 1.0)), (11L, "g2", Array(0.0, 2.0)))
      .toDF("vec_id", "grp", "embedding")
    val got = Similarity.centroidOutliers(vecs, "vec_id", "grp", "embedding",
      dim = 2, minCos = 0.5)
      .select("vec_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(got(4L) && !got(1L) && !got(2L) && !got(3L))
    assert(!got(10L) && !got(11L)) // colinear group: cos 1 to its centroid
    // a zero vector has no direction: cos 0, flagged
    val z = Similarity.centroidOutliers(
      vecs.unionByName(Seq((5L, "g1", Array(0.0, 0.0))).toDF("vec_id", "grp", "embedding")),
      "vec_id", "grp", "embedding", dim = 2, minCos = 0.5)
      .filter(col("vec_id") === 5L)
      .select("cos_centroid", "is_outlier").as[(Double, Boolean)].head()
    assert(z == ((0.0, true)))
  }

  test("simplifiedSilhouette: hand-computed cosine silhouettes against literal centroids") {
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "centroid")
    // p1 on centroid 0: a = 0, b = 1 -> s = 1
    // p2 equidistant: a = b -> s = 0, tie-assigned to the LOWEST cid
    // p3 zero-norm: dropped entirely
    val pts = Seq((1L, Seq(2.0, 0.0)), (2L, Seq(1.0, 1.0)), (3L, Seq(0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.simplifiedSilhouette(pts, "vec_id", "embedding",
      cents, "cid", "centroid")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0L, 2L, 0.5)))
    intercept[IllegalArgumentException](Similarity.simplifiedSilhouette(
      pts, "vec_id", "embedding", cents.limit(1), "cid", "centroid"))
  }
}
