package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Misra–Gries: byte-identical to the batch fold over the same
  * arrival order, O(k)-bounded state, snapshot-per-epoch emission. */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drain(batches: Seq[Seq[(Int, Long, String)]], k: Int, name: String) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, String)]
    val q = StreamingHeavyHitters.summaries(in.toDS(), k)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[(Int, Long, String, Long)].collect().toSeq
    } finally q.stop()
  }

  test("final snapshot equals the batch MG fold over the same arrival order") {
    // shard 0: 'hot' appears 10 times among 18 items, k = 3
    val items = (1L to 18L).map { i =>
      (0, i, if (i % 2 == 0 || i <= 2) "hot" else s"cold${i % 5}")
    }
    val got = drain(Seq(items.take(7), items.slice(7, 12), items.drop(12)), 3, "shh_fold")
    val lastEpoch = got.map(_._2).max
    assert(lastEpoch == 3L) // one epoch per micro-batch
    val snapshot = got.filter(t => t._2 == lastEpoch && t._3 != null)
      .map(t => t._3 -> t._4).toMap
    val mg = new graft.functions.MisraGries(3)
    val expected = items.foldLeft(Map.empty[String, Long]) {
      case (m, (_, _, item)) => mg.reduce(m, item)
    }
    assert(snapshot == expected)
    assert(snapshot.size <= 3, "state must stay k-bounded")
    assert(snapshot.contains("hot"), "a true phi-heavy item must survive")
    // MG undercount bound: est >= true - n/(k+1)
    assert(snapshot("hot") >= 10L - 18L / 4)
  }

  test("shards fold independently and batch splits don't change the snapshot") {
    val items = (1L to 40L).map(i => ((i % 2).toInt, i, s"w${i % 7}"))
    def latest(rows: Seq[(Int, Long, String, Long)]) =
      rows.groupBy(_._1).map { case (s, rs) =>
        val e = rs.map(_._2).max
        s -> rs.filter(t => t._2 == e && t._3 != null).map(t => t._3 -> t._4).toMap
      }
    val whole = latest(drain(Seq(items), 4, "shh_whole"))
    val split = latest(
      drain(Seq(items.take(13), items.slice(13, 29), items.drop(29)), 4, "shh_split"))
    // the fold is seq-ordered, so batch placement can't change the final
    // state — here the 40-item cycle ends on a wipe: BOTH snapshots are
    // legitimately empty, observable only because of the epoch marker
    assert(whole == split)
    assert(whole.values.forall(_.isEmpty), s"cycle ends on a wipe: $whole")
  }
}
