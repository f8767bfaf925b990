package graft.sinks

import graft.TestSpark
import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The register-store lifecycle [[graft.operators.Sketches.hllRollingEstimate]]'s
  * scaladoc promises: per-period HLL registers persisted as IndexStore
  * generations, rolling windows computed from the STORE alone — raw data is
  * never rescanned, the series costs O(periods · m) forever, and
  * consolidation preserves the estimates bit-for-bit.
  *
  * Also pins the merge's duplicate tolerance: a period whose registers
  * arrive in TWO generations (two shards, or an at-least-once upstream
  * appending twice) still yields the from-scratch estimate, because the
  * rolling merge max-aggregates registers per (period, bucket) — max is
  * idempotent, the mergeable-sketch property the store leans on.
  */
class HllGenerationStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = 6

  test("per-period generations -> rolling estimate == from-scratch, through consolidate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-gens").toString + "/regs"
    val rows = (1L to 3000L).map(i => (i % 8, i * 17 % 500)).toDF("day", "uid")

    // one generation per observed period, EXCEPT day 3, whose elements land
    // in two half-generations (the two-shard / double-append case)
    (0L until 8L).foreach { d =>
      val dayRows = rows.filter(col("day") === d)
      if (d == 3L) {
        IndexStore.append(
          Sketches.hllRegisters(dayRows.filter(col("uid") % 2 === 0),
            Seq("day"), col("uid"), p, "gen"), dir)
        IndexStore.append(
          Sketches.hllRegisters(dayRows.filter(col("uid") % 2 === 1),
            Seq("day"), col("uid"), p, "gen"), dir)
      } else {
        IndexStore.append(
          Sketches.hllRegisters(dayRows, Seq("day"), col("uid"), p, "gen"), dir)
      }
    }

    def fromScratch = (0L until 8L).map { t =>
      val win = rows.filter(col("day").between(t - 2, t))
      Sketches.hllEstimate(
        Sketches.hllRegisters(win.withColumn("day", lit(t)), Seq("day"), col("uid"), p, "gen"),
        Seq("day"), p).select(col("day"), col("hll_est"), col("zero_regs"))
    }.reduce(_ unionByName _)

    def rollingFromStore = Sketches.hllRollingEstimate(
      IndexStore.read(spark, dir), "day", p, windowPeriods = 3)
      .select(col("day"), col("hll_est"), col("zero_regs"))

    val before = rollingFromStore
    assert(before.except(fromScratch).isEmpty && fromScratch.except(before).isEmpty,
      "rolling estimate from appended generations must equal the from-scratch sketch")

    // consolidate: 9 generations -> 1; estimates must be unchanged (the
    // store's value rows are (day, bucket, reg) — distinct-safe)
    val (gensBefore, _) = IndexStore.consolidate(spark, dir)
    assert(gensBefore == 9, s"expected 9 live generations before consolidate, got $gensBefore")
    val after = rollingFromStore
    assert(after.except(fromScratch).isEmpty && fromScratch.except(after).isEmpty,
      "consolidation must preserve every rolling estimate bit-for-bit")
  }
}
