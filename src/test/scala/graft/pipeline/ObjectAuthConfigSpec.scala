package graft.pipeline

import graft.core.{GraftConfig, GraftError}
import graft.sinks.{RetryingSink, SinkBootstrap}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Named-object cursor (OCI-style), auth fetch-replay, retrying sink,
  * sink bootstrap, and env config loading.
  */
class ObjectAuthConfigSpec extends AnyFunSuite {

  // --- object cursor (ref: ObjectStorageSetup.scala:81-90) ------------------

  test("named-object source walks the bucket in listing order through the runner") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    implicit val sc: StateCodec[String] = StateCodec.stringCodec
    implicit val h: graft.core.Hashable[String] = graft.core.Hashable.stringHashable
    val objects = Seq("data-001", "data-002", "data-003")
    // state machine: "" = start, "cur:<name>" = read it this pull,
    // "done:<name>" = exhausted, idle until the listing grows
    val p = NamedObjectSource[String](
      name = "oci",
      namespace = "ns", bucket = "b",
      listAfter = after => objects.filter(o => after.forall(o > _)),
      readObject = (s, name) => Seq(name).toDF("obj"),
      initialState = "",
      objectName = s => Option(s).collect { case c if c.startsWith("cur:") => c.stripPrefix("cur:") },
      startAfter = s => Option(s).filter(_.nonEmpty).map(_.stripPrefix("cur:").stripPrefix("done:")),
      stateFold = (s, next) => next.map("cur:" + _).getOrElse(
        if (s.startsWith("cur:")) "done:" + s.stripPrefix("cur:") else s))
    val read = ArrayBuffer.empty[String]
    val sink = new BatchSink {
      def write(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
        read ++= df.collect().map(_.getString(0))
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-obj").toString
    new PipelineRunner(spark, ckpt).run(p, sink, maxIterations = 5)
    // first pull has no object (initial state), then reads each in order
    assert(read.toSeq == objects)
  }

  test("nextMatching respects the name finder") {
    assert(ObjectCursor.nextMatching(Seq("a.tmp", "b.csv", "c.csv"), _.endsWith(".csv")).contains("b.csv"))
    assert(ObjectCursor.nextMatching(Nil, _ => true).isEmpty)
  }

  // --- auth fetch-replay (ref: RESTSetup.scala:74-94) -----------------------

  private final class TokenAuth extends AuthStrategy[String] {
    var issued = 0
    def decorate(request: String, secret: Option[String]): String = s"$request?token=${secret.getOrElse("none")}"
    def acquireSecret(): Option[String] = { issued += 1; Some(s"tok$issued") }
  }

  test("expired token: 401 triggers one refresh and replay") {
    val auth = new TokenAuth
    val cache = new SecretCache
    cache.set(Some("stale"))
    val calls = ArrayBuffer.empty[String]
    val send = (req: String) => {
      calls += req
      if (req.contains("stale")) FetchResponse(401, Left("expired"))
      else FetchResponse(200, Right("payload"))
    }
    val body = AuthenticatedFetch.fetch("GET /x", send, Some(auth), cache)
    assert(body == "payload")
    assert(calls.toSeq == Seq("GET /x?token=stale", "GET /x?token=tok1"))
    assert(cache.get.contains("tok1"))
  }

  test("first use acquires a secret; success does not refresh") {
    val auth = new TokenAuth
    val cache = new SecretCache
    val body = AuthenticatedFetch.fetch("GET /y", (_: String) => FetchResponse(200, Right("ok")), Some(auth), cache)
    assert(body == "ok" && auth.issued == 1 && cache.get.contains("tok1"))
  }

  test("body-level failure clears the cached secret and raises") {
    val auth = new TokenAuth
    val cache = new SecretCache
    val err = intercept[GraftError] {
      AuthenticatedFetch.fetch("GET /z", (_: String) => FetchResponse(200, Left("boom")), Some(auth), cache)
    }
    assert(err.getMessage.contains("giving up"))
    assert(cache.get.isEmpty)
  }

  test("basic auth decorates every request, no secret lifecycle") {
    val cache = new SecretCache
    val auth = new BasicAuth[String](r => s"$r+basic")
    val calls = ArrayBuffer.empty[String]
    AuthenticatedFetch.fetch("r", (req: String) => { calls += req; FetchResponse(200, Right("ok")) }, Some(auth), cache)
    assert(calls.toSeq == Seq("r+basic") && cache.get.isEmpty)
  }

  // --- retrying sink (ref: Tamer.scala:58) ----------------------------------

  test("retrying sink: exponential backoff then success; gives up after maxRetries") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(1).toDF("n")
    val delays = ArrayBuffer.empty[Long]
    var failures = 2
    val flaky = new BatchSink {
      def write(d: org.apache.spark.sql.DataFrame, e: Long): Unit =
        if (failures > 0) { failures -= 1; throw new RuntimeException("transient") }
    }
    new RetryingSink(flaky, maxRetries = 10, baseDelayMillis = 100, sleep = delays += _).write(df, 0)
    assert(delays.toSeq == Seq(100L, 200L)) // exponential from 100ms

    val alwaysFails = new BatchSink {
      def write(d: org.apache.spark.sql.DataFrame, e: Long): Unit = throw new RuntimeException("down")
    }
    val err = intercept[GraftError] {
      new RetryingSink(alwaysFails, maxRetries = 3, baseDelayMillis = 1, sleep = _ => ()).write(df, 7)
    }
    assert(err.getMessage.contains("after 3 retries"))
  }

  // --- sink bootstrap (ref: Tamer.scala:252-327) ----------------------------

  test("sink bootstrap creates, re-verifies, and refuses foreign locations") {
    val spark = graft.TestSpark.spark
    val fresh = java.nio.file.Files.createTempDirectory("graft-boot").toString + "/out"
    SinkBootstrap.verifyOrCreate(spark, fresh, "pipe-a")
    SinkBootstrap.verifyOrCreate(spark, fresh, "pipe-a") // idempotent
    assert(intercept[GraftError](SinkBootstrap.verifyOrCreate(spark, fresh, "pipe-b"))
      .getMessage.contains("belongs to pipeline 'pipe-a'"))
    val foreign = java.nio.file.Files.createTempDirectory("graft-foreign").toString
    assert(intercept[GraftError](SinkBootstrap.verifyOrCreate(spark, foreign, "pipe-a"))
      .getMessage.contains("not a graft sink"))
  }

  test("sink bootstrap refuses a partition-layout change (partition-count parity)") {
    val spark = graft.TestSpark.spark
    val p = java.nio.file.Files.createTempDirectory("graft-boot-part").toString + "/out"
    SinkBootstrap.verifyOrCreate(spark, p, "pipe-a", partitionCols = Seq("dt", "hour"))
    SinkBootstrap.verifyOrCreate(spark, p, "pipe-a", partitionCols = Seq("dt", "hour")) // same layout ok
    val err = intercept[GraftError] {
      SinkBootstrap.verifyOrCreate(spark, p, "pipe-a", partitionCols = Seq("dt"))
    }
    assert(err.getMessage.contains("refusing to mix layouts"))
    // a pre-layout marker (owner line only) means unpartitioned — still verifies
    val legacy = java.nio.file.Files.createTempDirectory("graft-boot-legacy").toString + "/out"
    SinkBootstrap.verifyOrCreate(spark, legacy, "pipe-a")
    SinkBootstrap.verifyOrCreate(spark, legacy, "pipe-a", partitionCols = Nil)
  }

  test("sink bootstrap refuses on missing access bits (ACL parity)") {
    val spark = graft.TestSpark.spark
    val root = java.nio.file.Files.createTempDirectory("graft-boot-acl")
    val p = root.toString + "/out"
    SinkBootstrap.verifyOrCreate(spark, p, "pipe-a")
    val posix = java.nio.file.Paths.get(p)
    import java.nio.file.attribute.PosixFilePermissions
    try {
      // read-only dir: WRITE must be refused for the sink case
      java.nio.file.Files.setPosixFilePermissions(posix, PosixFilePermissions.fromString("r-xr-xr-x"))
      val err = intercept[GraftError](SinkBootstrap.verifyOrCreate(spark, p, "pipe-a"))
      assert(err.getMessage.contains("denies"))
      // write-only dir: the state-sink case needs READ+WRITE
      java.nio.file.Files.setPosixFilePermissions(posix, PosixFilePermissions.fromString("-wx-wx-wx"))
      val err2 = intercept[GraftError] {
        SinkBootstrap.verifyOrCreate(spark, p, "pipe-a", requireRead = true)
      }
      assert(err2.getMessage.contains("denies"))
    } finally
      java.nio.file.Files.setPosixFilePermissions(posix, PosixFilePermissions.fromString("rwxr-xr-x"))
  }

  // --- config loading (ref: config.scala:98-184) ----------------------------

  test("config loads with defaults and typed overrides; errors name the variable") {
    val base = Map(GraftConfig.CheckpointRoot -> "/ckpt", GraftConfig.SinkPath -> "/out")
    val c = GraftConfig.loadFromEnv(base)
    assert(c.sink.maxRetries == 10 && c.source.fetchChunkSize == 5000 && c.shufflePartitions == 32)

    val over = GraftConfig.loadFromEnv(base ++ Map(
      GraftConfig.SinkMaxRetries -> "3", GraftConfig.ShufflePartitions -> "64"))
    assert(over.sink.maxRetries == 3 && over.shufflePartitions == 64)

    assert(GraftConfig.fromEnv(Map.empty).swap.exists(_.contains("GRAFT_CHECKPOINT_ROOT")))
    assert(GraftConfig.fromEnv(base + (GraftConfig.SinkMaxRetries -> "x")).swap.exists(_.contains("must be an integer")))
    assert(GraftConfig.fromEnv(base + (GraftConfig.FetchChunkSize -> "0")).swap.exists(_.contains("must be > 0")))
  }
}
