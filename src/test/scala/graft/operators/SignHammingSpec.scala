package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SignHammingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("signPack: bit positions, word boundaries, -0.0 counts positive, null poisons") {
    val v33 = Array.fill(33)(-1.0f)
    v33(0) = 1.5f; v33(31) = 0.0f; v33(32) = 2.0f // bits 0 and 31 of w0; bit 0 of w1
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.0f, -0.0f)), // bits 0,2,3 -> 13
      (2L, v33)).toDF("id", "vec")
    val got = Similarity.signQuantize(df, "id", "vec")
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(13L))
    assert(got(2L) == Seq(1L + (1L << 31), 1L)) // 32-bit words stay positive longs
    // null element -> null code (the DotProductDouble poisoning rule)
    val withNull = Seq((3L, Seq[java.lang.Float](1.0f, null))).toDF("id", "vec")
    assert(Similarity.signQuantize(withNull, "id", "vec")
      .filter(col("code").isNull).count() == 1L)
  }

  test("hammingDist: known vectors, length mismatch nulls") {
    val df = Seq(
      (Seq(13L, 1L), Seq(13L, 1L), 0L),
      (Seq(0L, 0L), Seq(5L, 1L), 3L),
      (Seq(1L + (1L << 31), 0L), Seq(0L, 0L), 2L)).toDF("a", "b", "want")
    assert(df.filter(Similarity.hammingDist(col("a"), col("b")) =!= col("want")).count() == 0L)
    val bad = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    assert(bad.select(Similarity.hammingDist(col("a"), col("b"))).head().isNullAt(0))
  }

  test("signHammingPairs equals brute force exactly (pigeonhole recall 1, verify precision 1)") {
    // 16-dim vectors whose sign patterns are the low 16 bits of the id —
    // hamming(a,b) = popcount(a^b) over ids, known in closed form
    val ids = (0 until 48).map(_.toLong)
    val df = ids.map { id =>
      (id, Array.tabulate(16)(k => if (((id >> k) & 1L) == 1L) 1.0f else -1.0f))
    }.toDF("id", "vec")
    val codes = Similarity.signQuantize(df, "id", "vec")
    val got = Similarity.signHammingPairs(codes, "id", "code",
        dim = 16, maxHamming = 3, bandBits = 4)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(a ^ b) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    // the pigeonhole precondition is enforced, not assumed
    intercept[IllegalArgumentException] {
      Similarity.signHammingPairs(codes, "id", "code", dim = 16, maxHamming = 4, bandBits = 4)
    }
    intercept[IllegalArgumentException] {
      Similarity.signHammingPairs(codes, "id", "code", dim = 16, maxHamming = 1, bandBits = 5)
    }
  }

  test("signHammingTopK ranks by (hamming, nbr_id) and excludes self") {
    val ids = (0 until 32).map(_.toLong)
    val df = ids.map { id =>
      (id, Array.tabulate(8)(k => if (((id >> k) & 1L) == 1L) 1.0f else -1.0f))
    }.toDF("id", "vec")
    val codes = Similarity.signQuantize(df, "id", "vec")
    val got = Similarity.signHammingTopK(codes, "id", "code",
        codes.filter(col("id") === 0L), "id", "code", k = 3)
      .orderBy(col("rnk"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // neighbors of 0: hamming = popcount(id) over low 8 bits (ids 0..31
    // have bits only in 0..4) — distance 1 ids are 1,2,4,8; ties break low id
    assert(got == Seq((0L, 1L, 1L, 1L), (0L, 2L, 2L, 1L), (0L, 3L, 4L, 1L)))
  }

  test("signFidelityCard: sampled card == card over the hash-selected subset; full-mode guard") {
    val vecs = (0L until 64L).map { i =>
      (i, Array.tabulate(8)(j => if (((i >> j) & 1L) == 1L) 1.0f else -1.0f))
    }.toDF("id", "vec")
    val sampled = Similarity.signFidelityCard(vecs, "id", "vec",
      cosineThreshold = 0.5, maxHamming = 2, sampleMod = 3)
    // the sample is the deterministic keyHash grid — reproduce it and
    // run the full card over exactly that subset
    val subset = vecs.filter(
      pmod(Sampling.keyHash(col("id"), "signfid"), lit(3L)) === 0L)
    val direct = Similarity.signFidelityCard(subset, "id", "vec",
      cosineThreshold = 0.5, maxHamming = 2, sampleMod = 1)
    assert(sampled.collect().toSeq == direct.collect().toSeq)
    assert(sampled.head.getLong(0) > 0L, "sampled card must still see pairs")
    // all-pairs over the full input refuses loudly past the cap
    intercept[IllegalArgumentException] {
      Similarity.signFidelityCard(vecs, "id", "vec",
        cosineThreshold = 0.5, maxHamming = 2, sampleMod = 1, maxFullRows = 10L)
        .collect()
    }
  }
}
