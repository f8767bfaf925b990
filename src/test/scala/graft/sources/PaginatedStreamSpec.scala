package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end DSv2 micro-batch source: checkpointed page offsets, partial-
  * page parking, growth without duplicates — the reference's fixed
  * pagination semantics behind a real `readStream`.
  */
class PaginatedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("paginated readStream drains pages, parks on the partial tail, resumes without duplicates") {
    @volatile var pages: Map[Int, Seq[String]] = Map(
      0 -> Seq("a", "b", "c"), // complete (pageSize 3)
      1 -> Seq("d", "e"))      // partial tail
    PageFetchers.register("spec", new PageFetcher {
      def fetch(page: Int): Seq[String] = pages.getOrElse(page, Nil)
    })
    val q = spark.readStream
      .format("graft.sources.PaginatedTableProvider")
      .option("fetcher", "spec")
      .option("pageSize", "3")
      .load()
      .writeStream.format("memory").queryName("pages_sink").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      import spark.implicits._
      def seen() = spark.table("pages_sink").select("value", "page", "idx")
        .as[(String, Int, Int)].collect().sortBy(r => (r._2, r._3)).toSeq
      assert(seen() == Seq(("a", 0, 0), ("b", 0, 1), ("c", 0, 2), ("d", 1, 0), ("e", 1, 1)))
      // the tail page fills up and a new partial page appears: only the NEW
      // elements may be emitted (offset parked at (1,2))
      pages = Map(0 -> Seq("a", "b", "c"), 1 -> Seq("d", "e", "f"), 2 -> Seq("g"))
      q.processAllAvailable()
      assert(seen() == Seq(
        ("a", 0, 0), ("b", 0, 1), ("c", 0, 2),
        ("d", 1, 0), ("e", 1, 1), ("f", 1, 2),
        ("g", 2, 0)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains everything available and self-terminates") {
    val pages: Map[Int, Seq[String]] = Map(
      0 -> Seq("a", "b", "c"), 1 -> Seq("d", "e", "f"), 2 -> Seq("g"))
    PageFetchers.register("avnow", new PageFetcher {
      def fetch(page: Int): Seq[String] = pages.getOrElse(page, Nil)
    })
    val q = spark.readStream
      .format("graft.sources.PaginatedTableProvider")
      .option("fetcher", "avnow")
      .option("pageSize", "3")
      .option("maxPagesPerTrigger", "1") // force several micro-batches to the cap
      .load()
      .writeStream.format("memory").queryName("avnow_sink").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    import spark.implicits._
    val seen = spark.table("avnow_sink").select("value").as[String].collect().sorted.toSeq
    assert(seen == Seq("a", "b", "c", "d", "e", "f", "g"))
  }

  test("offset json round-trips and rejects corruption") {
    val off = PageStreamOffset(7, 2)
    assert(PageStreamOffset.fromJson(off.json()) == off)
    intercept[Exception](PageStreamOffset.fromJson("{broken"))
  }
}
