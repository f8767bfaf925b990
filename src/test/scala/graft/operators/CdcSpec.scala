package graft.operators

import graft.TestSpark
import graft.functions.CdcKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(t: String, w: Int = 4, m: Int = 6): Seq[(Long, Long)] =
    CdcKernel.chunkSpans(t, w, m).grouped(2).map { case Array(s, l) => (s, l) }.toSeq

  test("chunkSpans: spans tile the text exactly; short/empty edges") {
    val t = "the quick brown fox jumps over the lazy dog and keeps running onward"
    val sp = spans(t)
    assert(sp.head._1 == 1L && sp.map(_._2).sum == t.length)
    // spans are contiguous 1-based tiles
    sp.sliding(2).foreach {
      case Seq((s1, l1), (s2, _)) => assert(s2 == s1 + l1)
      case _ =>
    }
    // shorter than the window: one chunk, no hash defined
    assert(spans("abc") == Seq((1L, 3L)))
    assert(spans("") == Seq())
    // boundary replay: a boundary after 0-based i means the window hash
    // masks to zero — recompute independently for every interior cut
    sp.dropRight(1).foreach { case (s, l) =>
      val i = (s + l - 1).toInt - 1 // 0-based end of chunk
      val h = (0 until 4).map(j => t.charAt(i - j).toLong * math.pow(31, j).toLong).sum
      assert((h & 63L) == 0L, s"cut after $i is not a masked-zero window")
    }
  }

  test("clamped chunking: no-clamp parity, min suppresses, max forces, resync survives clamps") {
    import graft.functions.CdcKernel.{chunkSpans, chunkSpansClamped}
    val t = "the quick brown fox jumps over the lazy dog and keeps running onward" +
      " while the band plays something slow and the crowd hums along quietly"
    // clamps that cannot bind reproduce the unclamped spans exactly
    assert(chunkSpansClamped(t, 4, 6, 1, Int.MaxValue).toSeq == chunkSpans(t, 4, 6).toSeq)
    // minLen suppresses every boundary closer than minLen to the last cut
    val mn = chunkSpansClamped(t, 4, 6, 24, Int.MaxValue)
    assert(mn.grouped(2).toSeq.dropRight(1).forall { case Array(_, l) => l >= 24 })
    // maxLen forces: no chunk exceeds it, even where no hash boundary fell
    val mx = chunkSpansClamped(t, 4, 6, 1, 16)
    assert(mx.grouped(2).toSeq.forall { case Array(_, l) => l <= 16 })
    assert(mx.grouped(2).map { case Array(_, l) => l }.sum == t.length, "tiling holds")
    // self-synchronization under clamps: two docs sharing a long tail
    // still align on identical chunks once past the first resync cut
    val tail = "all rights reserved this transcript was generated automatically" +
      " and may contain errors please verify details against the recording"
    def chunksOf(s: String) = {
      val sp = chunkSpansClamped(s, 4, 6, 8, 48)
      sp.grouped(2).map { case Array(st, l) => s.substring(st.toInt - 1, (st + l - 1).toInt) }.toSeq
    }
    val shared = chunksOf("one prefix here " + tail).toSet
      .intersect(chunksOf("a totally different and longer opening sequence " + tail).toSet)
    assert(shared.nonEmpty, "clamped CDC must still re-align inside the shared tail")
  }

  test("containment audit: exact basis-point boundary, fully-known drops, novel survives") {
    val tail = "the quick brown fox jumps over the lazy dog and keeps running onward today"
    val old = Seq((1L, "some old document carrying " + tail)).toDF("id", "text")
    val idx = Dedup.buildChunkIndex(old, "id", "text")
    val nw = Seq(
      (10L, "some old document carrying " + tail), // identical -> containment 1
      (11L, "entirely novel words never seen before anywhere at all in history"),
      (12L, "fresh opening then " + tail)          // partial: synced tail chunks known
    ).toDF("id", "text")
    val got = Dedup.cdcContainmentAudit(nw, "id", "text", idx, thresholdBp = 3000)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(10L)._2 == got(10L)._3 && got(10L)._4, "identical doc must be fully known + dropped")
    assert(got(11L)._3 == 0L && !got(11L)._4, "novel doc has zero known chunks")
    assert(got(12L)._3 >= 1L && got(12L)._3 < got(12L)._2, "partial doc is partially known")
    // exact boundary: n_known*10000 >= bp*n_chunks decides, no float —
    // with thresholdBp = 10000 only the identical doc drops
    val strict = Dedup.cdcContainmentAudit(nw, "id", "text", idx, thresholdBp = 10000)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r._4).toMap
    assert(strict(10L) && !strict(11L) && !strict(12L))
    // thresholdBp = 0 would mark EVERY doc dropped (n_known*10^4 >= 0
    // always) — an always-drop knob is rejected loudly (r15 advice)
    intercept[IllegalArgumentException] {
      Dedup.cdcContainmentAudit(nw, "id", "text", idx, thresholdBp = 0)
    }
  }

  test("CDC self-synchronizes: different prefixes, same tail -> shared chunk hashes") {
    val tail = "all rights reserved this transcript was generated automatically and " +
      "may contain errors please verify details against the original recording"
    val docs = Seq(
      (1L, "completely different opening words here " + tail),
      (2L, "zzz qqq unrelated prefix of another length entirely " + tail),
      (3L, "third doc " + tail)).toDF("id", "text")
    val dup = Dedup.cdcDuplicateChunks(docs, "id", "text")
      .as[(String, Long, Long)].collect()
    // at least one tail chunk re-aligns across all three docs
    assert(dup.exists(_._2 == 3L),
      s"expected a chunk shared by all 3 docs, got ${dup.mkString(", ")}")
    // and the exploded form matches the kernel spans row for row
    val got = Dedup.cdcChunks(docs.filter(col("id") === 1L), "id", "text")
      .orderBy(col("chunk_idx"))
      .as[(Long, Long, Long, Long, String)].collect()
    val txt = "completely different opening words here " + tail
    val want = spans(txt).zipWithIndex.map { case ((s, l), i) =>
      (1L, i + 1L, s, l,
        java.security.MessageDigest.getInstance("MD5")
          .digest(txt.substring(s.toInt - 1, (s + l - 1).toInt).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }
    assert(got.toSeq == want)
  }
}
