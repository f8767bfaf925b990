package graft.sinks

import graft.TestSpark
import graft.operators.Dedup
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The nightly-ingest index loop: run N dedups against generations 0..N-1
  * and appends its newcomers as generation N — history is never rebuilt or
  * re-scanned — and consolidation collapses generations without changing
  * the index's row set or burning the generation counter. */
class IndexStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String) =
    Files.createTempDirectory(s"graft-ixs-$tag").toString + "/idx"

  test("fingerprint index: three runs, each dropping all prior runs' texts; consolidate preserves the set and the counter") {
    val dir = tmpDir("fp")
    val dayA = Seq((1L, "alpha text one"), (2L, "beta text two")).toDF("doc_id", "text")
    assert(IndexStore.append(Dedup.buildFingerprintIndex(dayA, "text"), dir) == 0L)

    // run 2: one dup of day A, one new — only the new doc is admitted,
    // and day A's TEXTS are never consulted (the index alone decides)
    val dayB = Seq((10L, "alpha text one"), (11L, "gamma text three")).toDF("doc_id", "text")
    // materialize admissions eagerly: the lazy anti-join plan holds the
    // CURRENT generation files, which consolidation below swaps away
    val admittedB = Dedup.dropKnownFingerprints(dayB, "text", IndexStore.read(spark, dir))
      .as[(Long, String)].collect().toSeq.toDF("doc_id", "text")
    assert(admittedB.select("doc_id").as[Long].collect().toSet == Set(11L))
    assert(IndexStore.append(Dedup.buildFingerprintIndex(admittedB, "text"), dir) == 1L)

    // run 3: dups of run 1 AND run 2 both drop without any rebuild
    val dayC = Seq(
      (20L, "beta text two"), (21L, "gamma text three"), (22L, "delta text four")
    ).toDF("doc_id", "text")
    val admittedC = Dedup.dropKnownFingerprints(dayC, "text", IndexStore.read(spark, dir))
      .as[(Long, String)].collect().toSeq.toDF("doc_id", "text")
    assert(admittedC.select("doc_id").as[Long].collect().toSet == Set(22L))
    assert(IndexStore.append(Dedup.buildFingerprintIndex(admittedC, "text"), dir) == 2L)

    // consolidation: one generation, identical fingerprint set, and the
    // from-scratch index over everything admitted equals it exactly
    val before = IndexStore.read(spark, dir).as[String].collect().toSet
    val (gensBefore, rowsAfter) = IndexStore.consolidate(spark, dir)
    assert(gensBefore == 3)
    assert(rowsAfter == 4L)
    val after = IndexStore.read(spark, dir).as[String].collect().toSet
    assert(after == before)
    val scratch = Dedup.buildFingerprintIndex(
      dayA.union(admittedB).union(admittedC), "text").as[String].collect().toSet
    assert(after == scratch, "consolidated index diverged from a from-scratch build")

    // the counter is monotonic across consolidation: next append claims 3
    assert(IndexStore.append(Dedup.buildFingerprintIndex(
      Seq((30L, "epsilon five")).toDF("doc_id", "text"), "text"), dir) == 3L)
    assert(IndexStore.read(spark, dir).count() == 5L)
  }

  test("a crashed append (no _SUCCESS) is invisible to readers and reclaimed by the next append") {
    val dir = tmpDir("crash")
    IndexStore.append(Seq("a", "b").toDF("fp"), dir)
    // simulate a mid-write crash: partial gen=1 with data but no marker
    Seq("partial").toDF("fp").write.parquet(s"$dir/gen=1")
    val success = new java.io.File(s"$dir/gen=1/_SUCCESS")
    assert(success.delete(), "fixture: _SUCCESS marker missing")
    assert(IndexStore.read(spark, dir).as[String].collect().toSet == Set("a", "b"),
      "partial generation leaked into a read")
    // the next append reclaims generation 1
    assert(IndexStore.append(Seq("c").toDF("fp"), dir) == 1L)
    assert(IndexStore.read(spark, dir).as[String].collect().toSet == Set("a", "b", "c"))
  }

  test("LSH band index lifecycle: generational read matches a from-scratch index, before and after consolidation") {
    val dir = tmpDir("lsh")
    val run1 = Seq(
      (1L, "the cat and the dog is in the house of the king by the sea"),
      (2L, "the spell of the sea is the song of the deep tide at dusk")
    ).toDF("doc_id", "text")
    val run2 = Seq(
      (3L, "the fox and the hen is of the barn and the yard at dawn")
    ).toDF("doc_id", "text")
    def lsh(df: org.apache.spark.sql.DataFrame) =
      Dedup.buildLshIndex(df, "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16)
    IndexStore.append(lsh(run1), dir)
    IndexStore.append(lsh(run2), dir)
    val history = run1.union(run2)

    // newcomers: one near-dup of run 1, one near-dup of run 2, one fresh
    val newcomers = Seq(
      (10L, "the cat and the dog is in the house of the king by the sea today"),
      (11L, "the fox and the hen is of the barn and the yard at dawn now"),
      (12L, "a completely different document about graphs and sorting networks")
    ).toDF("doc_id", "text")
    def matches(index: org.apache.spark.sql.DataFrame) =
      Dedup.nearDupAgainstIndex(newcomers, "doc_id", "text", index, history,
        shingleN = 3, numHashes = 64, bands = 16)
        .as[(Long, Long, Int, Int)].collect().toSet

    val generational = matches(IndexStore.read(spark, dir))
    val scratch = matches(lsh(history))
    assert(generational == scratch, s"gen=$generational scratch=$scratch")
    assert(generational.map(p => (p._1, p._2)) == Set((10L, 1L), (11L, 3L)),
      s"planted near-dups must match their generation, got $generational")

    IndexStore.consolidate(spark, dir)
    assert(matches(IndexStore.read(spark, dir)) == scratch,
      "consolidation changed the match set")
  }

  test("window index lifecycle: gen-0 + gen-1 strip exactly what a from-scratch index strips, through consolidation") {
    // buildWindowIndex claims generation composability (any union of
    // window-hash frames is itself a valid index); this pins it through
    // the store: append two curation runs, strip newcomers against the
    // generational read, and demand byte-identical output to an index
    // built from the full history in one shot — before and after
    // consolidate (which also dedups the cross-generation `wh` overlap
    // from shared spans).
    val dir = tmpDir("win")
    val run1 = Seq(
      (1L, "the cat and the dog is in the house of the king by the sea"),
      (2L, "the spell of the sea is the song of the deep tide at dusk")
    ).toDF("doc_id", "text")
    val run2 = Seq(
      (3L, "the fox and the hen is of the barn and the yard at dawn")
    ).toDF("doc_id", "text")
    IndexStore.append(Dedup.buildWindowIndex(run1, "doc_id", "text", w = 5), dir)
    IndexStore.append(Dedup.buildWindowIndex(run2, "doc_id", "text", w = 5), dir)
    val history = run1.union(run2)

    // newcomers: one shares a >=5-token span with run 1, one with run 2,
    // one is fresh and must pass through byte-identical
    val newcomers = Seq(
      (10L, "today the cat and the dog is in the house again"),
      (11L, "the fox and the hen is of the barn tonight"),
      (12L, "a completely different document about graphs and sorting networks")
    ).toDF("doc_id", "text")
    def strip(index: org.apache.spark.sql.DataFrame) =
      Dedup.stripKnownWindows(newcomers, "doc_id", "text", index, w = 5)
        .as[(Long, String)].collect().toMap

    val scratch = strip(Dedup.buildWindowIndex(history, "doc_id", "text", w = 5))
    assert(strip(IndexStore.read(spark, dir)) == scratch,
      "generational read diverges from the from-scratch index")
    assert(scratch(10L) != "today the cat and the dog is in the house again" &&
      scratch(11L) != "the fox and the hen is of the barn tonight",
      s"planted shared spans must be stripped, got $scratch")
    assert(scratch(12L) == "a completely different document about graphs and sorting networks",
      "fresh doc must pass through byte-identical")

    val (gens, _) = IndexStore.consolidate(spark, dir)
    assert(gens == 2)
    assert(strip(IndexStore.read(spark, dir)) == scratch,
      "consolidation changed the strip result")
  }
}
