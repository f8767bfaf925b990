package graft.sinks

import graft.TestSpark
import graft.operators.Inference
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The moment-partial generation lifecycle behind q261: per-vintage exact
  * (n, Σx, Σx²) sufficient statistics persisted as IndexStore
  * generations, readouts computed from the STORE alone — raw data is
  * never rescanned, and the merged Welch readout is bit-identical to the
  * from-scratch test.
  *
  * Also pins the hazard [[IndexStore.consolidateWith]] exists for:
  * additive partials may legitimately repeat IDENTICAL rows across
  * generations (two vintages with the same per-arm sums), so the default
  * `distinct`-consolidate WOULD corrupt the store — the merge-consolidate
  * must preserve the readout while collapsing N generations to one row
  * per key. */
class MomentGenerationStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def store() =
    java.nio.file.Files.createTempDirectory("graft-moments").toString + "/store"

  test("vintage partials through the store: merged Welch == from-scratch, bit for bit") {
    val rows = (1L to 500L).map(i =>
      (if (i % 2 == 0) "a" else "b", i % 7, (i * 31 % 97).toDouble))
      .toDF("split", "vintage", "x")
    val dir = store()
    (0L until 7L).foreach { v =>
      IndexStore.append(
        Inference.momentPartial(rows.filter(col("vintage") === v), Seq("split"), "x"),
        dir)
    }
    val fromStore = Inference.welchFromMoments(
      Inference.momentMerge(Seq(IndexStore.read(spark, dir)), Seq("split")),
      "split", "a", "b").collect().toSeq
    val fromScratch = Inference.welchTTest(rows, "split", "x", "a", "b")
      .collect().toSeq
    assert(fromStore == fromScratch,
      s"store path diverged:\n$fromStore\nvs\n$fromScratch")
  }

  test("identical rows across generations: consolidateWith(momentMerge) preserves, distinct corrupts") {
    // two vintages engineered to produce IDENTICAL per-arm partials
    val vintage = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0)).toDF("split", "x")
    val dir = store()
    IndexStore.append(Inference.momentPartial(vintage, Seq("split"), "x"), dir)
    IndexStore.append(Inference.momentPartial(vintage, Seq("split"), "x"), dir)

    val both = vintage.unionByName(vintage)
    def readout() = Inference.welchFromMoments(
      Inference.momentMerge(Seq(IndexStore.read(spark, dir)), Seq("split")),
      "split", "a", "b").collect().toSeq
    val expected = Inference.welchTTest(both, "split", "x", "a", "b").collect().toSeq
    assert(readout() == expected)

    // the set-semantics pass would halve the counts — prove the hazard is
    // real on a copy, then that the merge-consolidate avoids it in place
    val hazardN = IndexStore.read(spark, dir).distinct()
      .agg(sum(col("n"))).head.getLong(0)
    assert(hazardN == 4L, "distinct over identical additive partials drops rows")

    val (gens, rowsAfter) = IndexStore.consolidateWith(spark, dir)(
      df => Inference.momentMerge(Seq(df), Seq("split")))
    assert(gens == 2 && rowsAfter == 2L, s"expected 2 gens -> 2 key rows, got ($gens, $rowsAfter)")
    assert(readout() == expected, "consolidation must not move the readout")
    assert(IndexStore.read(spark, dir).agg(sum(col("n"))).head.getLong(0) == 8L)

    // counter stays monotonic: the next vintage lands as a NEW generation
    // on top of the consolidated one and still merges cleanly
    val later = Seq(("a", 10.0), ("b", 20.0)).toDF("split", "x")
    val gen = IndexStore.append(Inference.momentPartial(later, Seq("split"), "x"), dir)
    assert(gen == 2L, s"generation counter must not reuse burned numbers, got $gen")
    val expected3 = Inference.welchTTest(both.unionByName(later), "split", "x", "a", "b")
      .collect().toSeq
    assert(readout() == expected3)
  }
}
