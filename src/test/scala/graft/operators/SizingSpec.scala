package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r16 verdict-#1 gate: the scale knobs the §8.5 SCALEPROBE table
  * names (LSH `bandBits`, k-means `k`) are SELF-SIZING by default, and
  * the auto rule reproduces the committed `SCALEPROBE_r16_sized.json`
  * configurations at the probe corpus sizes — the measured-linear shapes,
  * pinned as code instead of prose. */
class SizingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sizedBandBits reproduces the committed r16 sized-ladder configs at the probe corpus sizes") {
    // SCALEPROBE_r16_sized ran bandBits = 3 + ceilLog2(mult) over the
    // sf0.1 embeddings ladder (2000·mult rows). The auto rule must land on
    // exactly those widths at exactly those corpus sizes — q48/q155's
    // measured-linear configs (tail 0.93 / 0.20 vs 2.22 / 2.75 gated).
    assert(Similarity.sizedBandBits(2000L, 64) == 3) //  x1
    assert(Similarity.sizedBandBits(4000L, 64) == 4) //  x2
    assert(Similarity.sizedBandBits(8000L, 64) == 5) //  x4
    assert(Similarity.sizedBandBits(20000L, 64) == 7) // x10
    // q61's production calibration (base 8 at the same corpus): the
    // committed q61_sized_bands ladder = min(16, 8 + ceilLog2(mult))
    assert(Similarity.sizedBandBits(2000L, 64, base = 8) == 8)
    assert(Similarity.sizedBandBits(20000L, 64, base = 8) == 12)
    // below the calibration corpus the base IS the width (gate SF: the
    // auto default resolves to the oracle-calibrated recall-1 shape)
    assert(Similarity.sizedBandBits(200L, 64) == 3)
    assert(Similarity.sizedBandBits(0L, 64) == 3)
    // capped at min(24, dim): keys carry at most one useful bit per dim
    assert(Similarity.sizedBandBits(Long.MaxValue / 2, 16) == 16)
    assert(Similarity.sizedBandBits(Long.MaxValue / 2, 64) == 24)
    // monotone non-decreasing across a doubling ladder (no step back)
    val ladder = Seq(1L, 100L, 2000L, 2001L, 5000L, 64000L, 1000000L)
      .map(n => Similarity.sizedBandBits(n, 64))
    assert(ladder == ladder.sorted, s"non-monotone: $ladder")
  }

  test("sizedKMeansK reproduces the committed q96 sized ladder (k = 4·mult at 2000·mult rows)") {
    // SCALEPROBE_r16_sized's q96_sized_k ran k = 4·mult over 2000·mult
    // vectors = one cell per 500 rows, the config measured at exponent
    // 0.25 (vs 1.84 tail at fixed k = 4)
    assert(Similarity.sizedKMeansK(2000L) == 4) //  x1
    assert(Similarity.sizedKMeansK(4000L) == 8) //  x2
    assert(Similarity.sizedKMeansK(8000L) == 16) //  x4
    assert(Similarity.sizedKMeansK(20000L) == 40) // x10
    assert(Similarity.sizedKMeansK(1L) == 1)
    assert(Similarity.sizedKMeansK(501L) == 2)
  }

  test("AutoBands end to end: the auto entry point's output equals the explicit resolved width's") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // self-join form: 200 rows -> auto resolves to the calibrated 3
    val auto = Similarity.cosineNearDupPairsLsh(
      e, "vec_id", "embedding", threshold = 0.3, dim = 64, bands = 32)
    val explicit = Similarity.cosineNearDupPairsLsh(
      e, "vec_id", "embedding", threshold = 0.3, dim = 64, bandBits = 3, bands = 32)
    assert(pairs(auto) == pairs(explicit))
    // cross form sizes on TOTAL rows hashed (both corpora share buckets)
    val even = e.filter(col("vec_id") % 2 === 0)
    val odd = e.filter(col("vec_id") % 2 === 1)
    val autoX = Similarity.crossCosinePairsLsh(
      even, "vec_id", "embedding", odd, "vec_id", "embedding",
      threshold = 0.3, dim = 64, bands = 32)
    val explicitX = Similarity.crossCosinePairsLsh(
      even, "vec_id", "embedding", odd, "vec_id", "embedding",
      threshold = 0.3, dim = 64, bandBits = 3, bands = 32)
    assert(pairs(autoX) == pairs(explicitX))
  }

  test("AutoK end to end: trainKMeans(k = AutoK) equals trainKMeans(k = sizedKMeansK(n))") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def model(k: Int) = Similarity.trainKMeans(
        e, "vec_id", "embedding", k = k, iterations = 2, dim = 64)
      .orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector, r.getLong(2))).toSeq
    val n = e.count()
    val auto = model(Similarity.AutoK)
    val sized = model(Similarity.sizedKMeansK(n))
    assert(auto == sized)
    assert(auto.nonEmpty)
  }

  test("verifySmjPartitions pins the r18 partition rule at the measured configs") {
    // Correctness-gate corpus (sf0.01: 200 vectors, bb 3): estimate fits
    // one default partition budget -> the session shape is untouched, so
    // gate plans are byte-identical to pre-r18.
    assert(Similarity.verifySmjPartitions(200L, 64, 3, 32, 32) == 32)
    // Bench corpus (sf0.1: 2000 vectors, bb 3 — the q48 gate shape):
    // 7.97M estimated pairs x 608 B at the 64 MiB target -> 73.
    assert(Similarity.verifySmjPartitions(2000L, 64, 3, 32, 32) == 73)
    // The REHEARSAL_r17 spill stage (x10: 20k vectors, bb 7): estimate
    // 49.7M pairs -> 451 partitions — the measured knee (38 s / 0.3 GB
    // disk spill vs 61.5 s / 17 GB at the session default; see the
    // VerifyPartitionBytes scaladoc sweep).
    assert(Similarity.verifySmjPartitions(20000L, 64, 7, 32, 32) == 451)
    // Occupancy <= 1 (corpus smaller than the bucket space): no estimated
    // in-bucket pairs, default shape.
    assert(Similarity.verifySmjPartitions(100L, 64, 10, 32, 32) == 32)
    // Hard cap: a corpus whose estimate wants more than 4096 partitions
    // is governed by AQE skew handling past that point.
    assert(Similarity.verifySmjPartitions(10000000L, 64, 7, 32, 32)
      == Similarity.VerifyPartitionsCap)
    // The session default is always the floor.
    assert(Similarity.verifySmjPartitions(0L, 64, 3, 32, 200) == 200)
    // The target knob scales the count inversely (half the budget, about
    // twice the partitions).
    val p64 = Similarity.verifySmjPartitions(20000L, 64, 7, 32, 32, 64L << 20)
    val p32 = Similarity.verifySmjPartitions(20000L, 64, 7, 32, 32, 32L << 20)
    assert(p32 == 2 * p64 || p32 == 2 * p64 - 1)
  }

  test("auto-path verify joins run at the derived partition count end to end") {
    // 500 symmetric deterministic vectors: auto width resolves to 3 and
    // the estimate (492k pairs x 608 B) asks for 5 partitions against the
    // 4-partition test session — the rule must show up in the OUTPUT
    // partitioning (both verify SMJ sides repartitioned to p, so the join
    // runs at p, not the session default).
    val vecs = spark.range(500).select(col("id").as("vec_id"),
      array((0 until 64).map(i =>
        (pmod(hash(col("id"), lit(i)).cast("long"), lit(2001)) - 1000)
          .cast("double") / 1000.0): _*).as("embedding"))
    val default = spark.sessionState.conf.numShufflePartitions
    assert(default == 4)
    val expectedP = Similarity.verifySmjPartitions(500L, 64, 3, 32, default)
    assert(expectedP == 5)
    val out = Similarity.cosineNearDupPairsLsh(
      vecs, "vec_id", "embedding", threshold = 0.9, dim = 64, bands = 32)
    assert(out.rdd.getNumPartitions == expectedP)
    // and a corpus under the budget keeps the session shape: no derived
    // repartition, so AQE is free to coalesce below the default (an
    // explicit REPARTITION_BY_NUM as in the sized path is exempt from
    // coalescing — hence the exact == above vs the <= here)
    val small = Similarity.cosineNearDupPairsLsh(
      vecs.limit(100), "vec_id", "embedding", threshold = 0.9, dim = 64, bands = 32)
    assert(small.rdd.getNumPartitions <= default)
  }
}
