package graft.sources

import graft.TestSpark
import graft.core.GraftError
import org.scalatest.funsuite.AnyFunSuite

/** The real-HTTP path: HttpPageFetcher over a live in-process server, alone
  * and behind the DSv2 readStream — the engine's analog of the reference's
  * RESTSetupSpec e2e (tamer `rest/src/test/scala/tamer/rest/
  * RESTSetupSpec.scala:39-86`, which drives its fixture RESTServer).
  */
class HttpPaginatedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(n: Int): IndexedSeq[String] = (0 until n).map(i => s"doc-$i")

  test("HttpPageFetcher pages through a live server with bearer auth, refreshing the rotated token") {
    val server = new HttpFixtureServer(corpus(10), pageSize = 3, rotateEvery = 2).start()
    try {
      val fetcher = new HttpPageFetcher(HttpFetcherConfig(
        url = server.docsUrl, auth = "bearer", tokenUrl = server.authUrl,
        authUser = "user", authPass = "pass"))
      val all = (0 to 4).flatMap(fetcher.fetch)
      assert(all == corpus(10))
      assert(fetcher.fetch(4).isEmpty, "out-of-range page must be an empty page, not an error")
      // rotateEvery=2 with a one-epoch grace: the token goes stale every
      // second epoch, so a 10-element drain must have refreshed at least once
      assert(server.authCallCount >= 2, s"expected a token refresh; auth calls = ${server.authCallCount}")
      assert(server.rejectionCount >= 1, s"expected at least one 403; got ${server.rejectionCount}")
    } finally server.stop()
  }

  test("HttpPageFetcher basic auth and unauthenticated failure") {
    val server = new HttpFixtureServer(corpus(4), pageSize = 4, rotateEvery = 0).start()
    try {
      // no auth strategy → the 401 from /auth surfaces as a loud failure
      val anon = new HttpPageFetcher(HttpFetcherConfig(url = server.authUrl))
      val e = intercept[GraftError](anon.fetch(0))
      assert(e.getMessage.contains("HTTP 401"))
      val authed = new HttpPageFetcher(HttpFetcherConfig(
        url = server.docsUrl, auth = "bearer", tokenUrl = server.authUrl,
        authUser = "user", authPass = "pass"))
      assert(authed.fetch(0) == corpus(4))
    } finally server.stop()
  }

  test("transient 503s are retried through (Retry-After honored); exhaustion fails loudly") {
    val server = new HttpFixtureServer(corpus(6), pageSize = 3, failFirst = 2).start()
    try {
      val fetcher = new HttpPageFetcher(HttpFetcherConfig(
        url = server.docsUrl, maxRetries = 3, retryBaseMillis = 1))
      // the two injected 503s land on the first fetch; retries absorb both
      assert(fetcher.fetch(0) == Seq("doc-0", "doc-1", "doc-2"))
      assert(server.injectedFailureCount == 2)
      assert(fetcher.fetch(1) == Seq("doc-3", "doc-4", "doc-5"))
    } finally server.stop()

    val flaky = new HttpFixtureServer(corpus(3), pageSize = 3, failFirst = 5).start()
    try {
      val giveUp = new HttpPageFetcher(HttpFetcherConfig(
        url = flaky.docsUrl, maxRetries = 1, retryBaseMillis = 1))
      val e = intercept[GraftError](giveUp.fetch(0))
      assert(e.getMessage.contains("HTTP 503") && e.getMessage.contains("after 1 retries"))
    } finally flaky.stop()
  }

  test("a trailing delimiter is a terminator: no phantom empty element, partial pages stay partial") {
    // line-oriented endpoints end bodies with "\n" — without stripping one
    // terminator, a newline-terminated partial page splits into pageSize
    // elements and the cursor walks past data that later lands on that page
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/raw", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = "a\nb\n".getBytes("UTF-8") // 2 items, newline-TERMINATED
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body); ex.close()
    })
    server.createContext("/empties", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = "a\n\n".getBytes("UTF-8") // ["a", ""] then a terminator? No:
      // only ONE trailing delimiter strips — this decodes as ["a", ""]
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body); ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val f = new HttpPageFetcher(HttpFetcherConfig(url = s"http://127.0.0.1:$port/raw"))
      assert(f.fetch(0) == Seq("a", "b"))
      val g = new HttpPageFetcher(HttpFetcherConfig(url = s"http://127.0.0.1:$port/empties"))
      assert(g.fetch(0) == Seq("a", ""))
    } finally server.stop(0)
  }

  test("AvailableNow: a capture cap behind the committed start never regresses the offset") {
    // the engine may capture before restoring checkpoint offsets; a cap
    // computed from a stale seed must not move the offset log backwards
    PageFetchers.register("cap-regress", new PageFetcher {
      def fetch(page: Int): Seq[String] = if (page == 0) Seq("only") else Nil
    })
    val stream = new PaginatedMicroBatchStream(
      spec = FetcherSpec.Registry("cap-regress"), pageSize = 64, maxPagesPerTrigger = 100)
    stream.prepareForTriggerAvailableNow() // walks from (0,0): cap = (0,1)
    val committed = PageStreamOffset(2, 5)
    val advanced = stream.latestOffset(
      committed, org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(advanced == committed, s"offset regressed to $advanced")
  }

  test("4xx caller errors are NOT retried: the failure surfaces on the first response") {
    // /auth with wrong credentials 401s; an unauthenticated fetcher pointed at
    // it must fail once, not burn the retry schedule (401 is an auth code)
    val server = new HttpFixtureServer(corpus(3), pageSize = 3).start()
    try {
      val t0 = System.nanoTime()
      val anon = new HttpPageFetcher(HttpFetcherConfig(
        url = server.authUrl, maxRetries = 5, retryBaseMillis = 500))
      intercept[GraftError](anon.fetch(0))
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      // 5 retries at base 500ms would take >= 15s; a pass-through is instant
      assert(elapsedMs < 5000, s"401 appears to have been retried ($elapsedMs ms)")
    } finally server.stop()
  }

  test("page URI building: {page} placeholder and append-after-existing-query both hit the right page") {
    val server = new HttpFixtureServer(corpus(6), pageSize = 3).start()
    try {
      val appended = new HttpPageFetcher(HttpFetcherConfig(url = server.docsUrl + "?limit=5"))
      assert(appended.fetch(1) == Seq("doc-3", "doc-4", "doc-5")) // '&page=1' after existing query
      val templated = new HttpPageFetcher(HttpFetcherConfig(url = server.docsUrl + "?page={page}"))
      assert(templated.fetch(1) == Seq("doc-3", "doc-4", "doc-5"))
    } finally server.stop()
  }

  test("readStream over real HTTP drains the corpus exactly once under token rotation") {
    val server = new HttpFixtureServer(corpus(11), pageSize = 3, rotateEvery = 4).start()
    try {
      val q = spark.readStream
        .format("graft.sources.PaginatedTableProvider")
        .option("url", server.docsUrl)
        .option("pageSize", "3")
        .option("maxPagesPerTrigger", "1")
        .option("auth", "bearer")
        .option("tokenUrl", server.authUrl)
        .option("authUser", "user").option("authPass", "pass")
        .load()
        .writeStream.format("memory").queryName("http_sink").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow over HTTP must self-terminate")
      import spark.implicits._
      val seen = spark.table("http_sink").select("value").as[String].collect().toSeq
      assert(seen.sortBy(_.drop(4).toInt) == corpus(11))
      assert(seen.distinct.size == seen.size, "token refresh replays must not duplicate rows")
      assert(server.authCallCount >= 2, s"expected a refresh mid-drain; auth calls = ${server.authCallCount}")
    } finally server.stop()
  }

  test("walk fails loudly when a committed page shrinks below the committed index") {
    @volatile var pages: Map[Int, Seq[String]] = Map(0 -> Seq("a", "b"))
    PageFetchers.register("shrink", new PageFetcher {
      def fetch(page: Int): Seq[String] = pages.getOrElse(page, Nil)
    })
    val q = spark.readStream
      .format("graft.sources.PaginatedTableProvider")
      .option("fetcher", "shrink")
      .option("pageSize", "3")
      .load()
      .writeStream.format("memory").queryName("shrink_sink").outputMode("append")
      .start()
    try {
      q.processAllAvailable() // commits offset (0, 2)
      pages = Map(0 -> Seq("a")) // contract violation: committed prefix shrank
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      assert(e.getMessage.contains("contract violation") ||
        Option(e.getCause).exists(_.getMessage.contains("contract violation")))
    } finally q.stop()
  }
}
