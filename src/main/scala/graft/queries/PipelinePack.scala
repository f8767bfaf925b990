package graft.queries

import graft.Tables
import graft.pipeline.{BatchSink, PipelineRunner, WindowedSource}
import java.time.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Correctness entries for the incremental ingestion core: drive the real
  * checkpointed run loop over the `events` table in bounded mode and prove
  * the union of all windowed pulls equals a plain full scan (the oracle).
  * This is the liveness+exactness shape of the reference's TamerSpec
  * (tamer `core/src/test/scala/tamer/TamerSpec.scala:30-68`) promoted to the
  * driver's DuckDB gate.
  */
object PipelinePack extends QueryPack {

  /** Test-oriented sink: keeps each epoch's (lazy) batch; the union stays a
    * single Catalyst plan — N pruned scans, no driver materialization. */
  private final class BufferedUnionSink extends BatchSink {
    val batches = ArrayBuffer.empty[DataFrame]
    def write(df: DataFrame, epoch: Long): Unit = batches += df
    def result: Option[DataFrame] = batches.reduceOption(_ unionByName _)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Incremental tumbling-window ingestion of `events`, ~8 pulls tiling the
    // full ts range, then an aggregate over the union. Oracle = the same
    // aggregate over one full scan: any skipped, duplicated, or re-read row
    // changes cnt/sum and fails the hash compare.
    "q23_incremental_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val bounds = ev.agg(min(col("ts")), max(col("ts"))).head()
      val startTs = bounds.getTimestamp(0).toInstant.minusMillis(1)
      val endTs = bounds.getTimestamp(1).toInstant
      val range = Duration.between(startTs, endTs)
      val step = if (range.isZero) Duration.ofMillis(1) else range.dividedBy(7)
      val pipeline = WindowedSource.tumbling(
        name = "q23-events",
        relation = Tables.events(_, d),
        tsCol = "ts",
        from = startTs,
        step = step,
        lag = Duration.ZERO,
        now = () => endTs.plus(Duration.ofDays(1)),
        relationRepr = s"$d/events")
      val sink = new BufferedUnionSink
      val ckpt = java.nio.file.Files.createTempDirectory("graft-q23-ckpt").toString
      try new PipelineRunner(s, ckpt).run(
        pipeline, sink,
        maxIterations = 64,
        stopWhen = (w: graft.core.Window) => !w.from.isBefore(endTs))
      // the buffered batches are window-pruned scans of the events parquet —
      // nothing references the runner's state dir once run() returns
      finally PackShared.deleteRecursively(ckpt)
      sink.result.getOrElse(ev.limit(0))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // The DSv2 paginated streaming source driven end-to-end: the registered
    // fetcher plays the REMOTE ENDPOINT (the reference's REST server),
    // serving `documents` in fixed 64-element pages; the real readStream ->
    // memory-sink query drains all pages including the partial tail. The
    // drained rows must reproduce the whole table bit-for-bit (id + content
    // md5) — any dropped page, duplicated partial-page element, or
    // truncated value fails the hash compare against the plain-scan oracle.
    // (The collect below builds the fixture SERVER's data, not the
    // pipeline's: the pipeline itself is readStream -> parse -> sink.)
    "q44_paginated_ingest" -> ((s, d) => {
      import graft.sources.{PageFetcher, PageFetchers}
      val pageSize = 64
      val serverData: IndexedSeq[String] = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
        .map(r => s"${r.getLong(0)}|${r.getString(1)}").toIndexedSeq
      PageFetchers.register("q44-server", new PageFetcher {
        def fetch(page: Int): Seq[String] =
          serverData.slice(page * pageSize, (page + 1) * pageSize)
      })
      // fixed sink name: a fresh UUID per call would leak one full-corpus
      // memory-sink copy per invocation in long-lived JVMs
      val sinkName = "q44_sink"
      try s.catalog.dropTempView(sinkName) catch { case _: Exception => () }
      val q = s.readStream
        .format("graft.sources.PaginatedTableProvider")
        .option("fetcher", "q44-server")
        .option("pageSize", pageSize.toString)
        .load()
        .writeStream.format("memory").queryName(sinkName).outputMode("append")
        // bounded backfill drain: capture what is available, process it
        // (in maxPagesPerTrigger-bounded batches), terminate on its own
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        if (!q.awaitTermination(300000)) throw graft.core.GraftError("q44 drain timed out")
      } finally q.stop()
      s.table(sinkName)
        .select(
          substring_index(col("value"), "|", 1).cast("long").as("doc_id"),
          md5(expr("substring(value, instr(value, '|') + 1)")).as("fp_md5"))
        .orderBy(col("doc_id"))
    }),

    // The PERIODIC re-pagination source live under the hash gate: the
    // fetcher serves `documents`; a manual clock drains period 0, then
    // jumps past the scheduled roll so the SAME corpus re-reads stamped
    // period 1 (re-reading is this family's contract — it is how source
    // mutations are observed). Every doc must appear EXACTLY once per
    // period: a missed roll, double roll, page skip, or dup across the
    // roll all change the (doc_id, period) multiset and fail the compare.
    "q55_periodic_ingest" -> ((s, d) => {
      import graft.sources.{PageClocks, PageFetcher, PageFetchers}
      val pageSize = 64
      val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z")
      val serverData: IndexedSeq[String] = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
        .map(r => s"${r.getLong(0)}|${r.getString(1)}").toIndexedSeq
      PageFetchers.register("q55-server", new PageFetcher {
        def fetch(page: Int): Seq[String] =
          serverData.slice(page * pageSize, (page + 1) * pageSize)
      })
      @volatile var now = t0
      PageClocks.register("q55-clock", () => now)
      val sinkName = "q55_sink"
      try s.catalog.dropTempView(sinkName) catch { case _: Exception => () }
      val q = s.readStream
        .format("graft.sources.PeriodicPaginatedTableProvider")
        .option("fetcher", "q55-server")
        .option("minPeriodMs", "60000")
        .option("maxPeriodMs", "3600000")
        .option("periodStart", t0.toString)
        .option("clock", "q55-clock")
        .load()
        .writeStream.format("memory").queryName(sinkName).outputMode("append")
        .start()
      try {
        q.processAllAvailable()          // period 0 + parked roll at t0+60s
        now = t0.plusSeconds(90)         // past the roll, short of period 2
        q.processAllAvailable()          // period-1 re-read, parks again
      } finally q.stop()
      s.table(sinkName)
        .select(
          substring_index(col("value"), "|", 1).cast("long").as("doc_id"),
          col("period"),
          md5(expr("substring(value, instr(value, '|') + 1)")).as("fp_md5"))
        .orderBy(col("doc_id"), col("period"))
    }),

    // The flagship JDBC windowed pull as a REAL MicroBatchStream (SURVEY
    // §7.2: offset = Window in the checkpoint offset log): `events` is
    // loaded into an embedded Derby database (playing the production RDBMS),
    // then drained by readStream over the DSv2 windowed source with
    // Trigger.AvailableNow — window fold per micro-batch, range-sliced
    // parallel executor-side scans — and aggregated to the exact q23 oracle
    // shape. Any skipped/duplicated window row changes cnt/sum_value and
    // fails the hash compare against the plain full-scan oracle.
    "q49_jdbc_stream_window" -> ((s, d) => {
      val url = "jdbc:derby:memory:graftq49;create=true"
      System.setProperty("derby.stream.error.file", "/tmp/derby.log")
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.execute("DROP TABLE EVENTS") catch { case _: java.sql.SQLException => () }
        st.execute(
          "CREATE TABLE EVENTS (EVENT_ID BIGINT, TS TIMESTAMP, EVENT_TYPE VARCHAR(64), VALUE DOUBLE)")
        val ps = conn.prepareStatement("INSERT INTO EVENTS VALUES (?, ?, ?, ?)")
        // collect builds the FIXTURE DATABASE (the remote system a real
        // deployment already has), not the pipeline's data path
        Tables.events(s, d).select("event_id", "ts", "event_type", "value").collect()
          .grouped(1000).foreach { chunk =>
            chunk.foreach { r =>
              ps.setLong(1, r.getLong(0))
              ps.setTimestamp(2, r.getTimestamp(1))
              ps.setString(3, r.getString(2))
              ps.setDouble(4, r.getDouble(3))
              ps.addBatch()
            }
            ps.executeBatch()
          }
      } finally conn.close()

      // anchor the window walk off values read back through JDBC itself
      // (timezone-shift-proof, same as the epoch-runner derby spec)
      val probe = java.sql.DriverManager.getConnection(url)
      val (minTs, maxTs) =
        try {
          val rs = probe.createStatement().executeQuery("SELECT MIN(TS), MAX(TS) FROM EVENTS")
          rs.next()
          (rs.getTimestamp(1).toInstant, rs.getTimestamp(2).toInstant)
        } finally probe.close()
      val stepMs = math.max(1L, Duration.between(minTs, maxTs).toMillis / 7)

      val sinkName = "q49_sink"
      try s.catalog.dropTempView(sinkName) catch { case _: Exception => () }
      val q = s.readStream
        .format("graft.sources.JdbcWindowedTableProvider")
        .option("url", url)
        .option("table", "EVENTS")
        .option("tsCol", "TS")
        .option("from", minTs.minusSeconds(1).toString)
        .option("stepMs", stepMs.toString)
        .option("numPartitions", "4")
        .option("now", maxTs.plusSeconds(86400).toString)
        .load()
        .writeStream.format("memory").queryName(sinkName).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        if (!q.awaitTermination(300000)) throw graft.core.GraftError("q49 drain timed out")
      } finally q.stop()
      s.table(sinkName)
        .groupBy(col("EVENT_TYPE").as("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("VALUE").cast("decimal(28,4)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // The reference's timed S3 cursor (S3Setup.timed, the O10-O12 family)
    // driven end-to-end over file:// — pure cursor semantics, no SDK: the
    // events table staged as 8 timestamped drops (`drop-<ts>.csv`), walked
    // by the filename-instant cursor through the checkpointed runner (each
    // advance = smallest key-instant strictly after the state), every drop
    // read as a distributed text scan and parsed in the plan. Oracle = the
    // q23 full-scan aggregate: any skipped, re-read, or mis-parsed drop
    // changes cnt/sum_value and fails the hash compare.
    "q273_file_cursor_ingest" -> ((s, d) => {
      import java.time.{Instant, ZoneId}
      import java.time.format.DateTimeFormatterBuilder
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Files.createTempDirectory("graft-q273-drops")
      try {
        // FIXTURE: the collect stages the bucket a real deployment already
        // has (the q44/q47/q49 discipline), not the pipeline's data path.
        // Double.toString round-trips exactly through Spark's string->double
        // cast, so the staged text carries the parquet values bit-for-bit.
        val rows = Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("value")).collect()
        // colon/space-free format: Hadoop Path rejects ':' in file names
        // (scheme separator), so the key instant is compact ISO
        val formatter = new DateTimeFormatterBuilder()
          .appendPattern("yyyy-MM-dd'T'HHmmss").toFormatter.withZone(ZoneId.of("UTC"))
        val base = Instant.parse("2020-01-01T00:00:00Z")
        val nDrops = 8
        (0 until nDrops).foreach { i =>
          val name = s"drop-${formatter.format(base.plusSeconds((i + 1) * 3600L))}.csv"
          val lines = rows.iterator.filter(r => java.lang.Math.floorMod(r.getLong(0), nDrops.toLong) == i)
            .map(r => s"${r.getLong(0)}|${r.getString(1)}|${java.lang.Double.toString(r.getDouble(2))}")
          java.nio.file.Files.write(tmp.resolve(name),
            lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        val pipeline = graft.pipeline.TimedFileSource.timed(
          name = "q273-drops",
          listKeys = () => {
            val stream = java.nio.file.Files.list(tmp)
            try stream.iterator().asScala.map(_.getFileName.toString).toSeq
            finally stream.close()
          },
          readObject = (sp, key) => sp.read.textFile(tmp.resolve(key).toString).toDF("line")
            .select(
              split(col("line"), "\\|").getItem(0).cast("long").as("event_id"),
              split(col("line"), "\\|").getItem(1).as("event_type"),
              split(col("line"), "\\|").getItem(2).cast("double").as("value")),
          prefix = "drop-",
          formatter = formatter,
          from = base)
        val sink = new BufferedUnionSink
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q273-ckpt").toString
        try new graft.pipeline.PipelineRunner(s, ckpt).run(pipeline, sink,
          maxIterations = 32,
          stopWhen = (st: Instant) => !st.isBefore(base.plusSeconds(nDrops * 3600L)))
        finally PackShared.deleteRecursively(ckpt)
        // localCheckpoint: the buffered union scans the staged files, which
        // the finally below deletes — materialize the (tiny) aggregate first
        sink.result.getOrElse(Tables.events(s, d)
            .select(col("event_id"), col("event_type"), col("value")).limit(0))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
          .localCheckpoint(true)
          .orderBy(col("event_type"))
      } finally PackShared.deleteRecursively(tmp.toString)
    }),

    // The reference's OCI named-object cursor (ObjectStorageSetup, O13)
    // driven end-to-end over file:// — `startAfter` listing semantics: each
    // iteration reads the state's current object and folds the FIRST listed
    // name strictly after the cursor that passes the name finder (a planted
    // `.tmp` decoy between two data objects must be skipped, not read, and
    // must not break the walk). Objects carry base64'd documents; oracle =
    // the q44/q47 full-scan identity.
    "q274_object_cursor_ingest" -> ((s, d) => {
      import java.nio.charset.StandardCharsets.UTF_8
      import scala.jdk.CollectionConverters._
      import graft.pipeline.{NamedObjectSource, StateCodec}
      val tmp = java.nio.file.Files.createTempDirectory("graft-q274-objects")
      try {
        val rows = Tables.documents(s, d)
          .select(col("doc_id"), col("text")).collect()
        val nObjects = 4
        (0 until nObjects).foreach { i =>
          val lines = rows.iterator.filter(r => java.lang.Math.floorMod(r.getLong(0), nObjects.toLong) == i)
            .map(r => java.util.Base64.getEncoder.encodeToString(
              s"${r.getLong(0)}|${r.getString(1)}".getBytes(UTF_8)))
          java.nio.file.Files.write(tmp.resolve(f"part-$i%03d.csv"),
            lines.mkString("\n").getBytes(UTF_8))
        }
        // decoy that sorts between part-001.csv and part-002.csv: the name
        // finder must route the walk around it
        java.nio.file.Files.write(tmp.resolve("part-001.tmp"), "JUNK".getBytes(UTF_8))
        implicit val sc: StateCodec[String] = StateCodec.stringCodec
        implicit val h: graft.core.Hashable[String] = graft.core.Hashable.stringHashable
        // state machine: "" = start, "cur:<name>" = read it this pull,
        // "done:<name>" = exhausted (the ObjectAuthConfigSpec machine)
        val pipeline = NamedObjectSource[String](
          name = "q274-objects",
          namespace = "local", bucket = "q274",
          listAfter = after => {
            val stream = java.nio.file.Files.list(tmp)
            val names =
              try stream.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
              finally stream.close()
            // the store API restricts the listing to names after startAfter
            names.filter(n => after.forall(n > _))
          },
          readObject = (sp, name) => sp.read.textFile(tmp.resolve(name).toString).toDF("b64")
            .withColumn("decoded", unbase64(col("b64")).cast("string"))
            .select(
              substring_index(col("decoded"), "|", 1).cast("long").as("doc_id"),
              md5(expr("substring(decoded, instr(decoded, '|') + 1)")).as("fp_md5")),
          initialState = "",
          objectName = st => Option(st).collect { case c if c.startsWith("cur:") => c.stripPrefix("cur:") },
          startAfter = st => Option(st).filter(_.nonEmpty).map(_.stripPrefix("cur:").stripPrefix("done:")),
          stateFold = (st, next) => next.map("cur:" + _).getOrElse(
            if (st.startsWith("cur:")) "done:" + st.stripPrefix("cur:") else st),
          objectNameFinder = _.endsWith(".csv"))
        val sink = new BufferedUnionSink
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q274-ckpt").toString
        try new graft.pipeline.PipelineRunner(s, ckpt).run(pipeline, sink,
          maxIterations = 16,
          stopWhen = (st: String) => st.startsWith("done:"))
        finally PackShared.deleteRecursively(ckpt)
        sink.result.getOrElse(Tables.documents(s, d)
            .select(col("doc_id"), md5(col("text")).as("fp_md5")).limit(0))
          .localCheckpoint(true)
          .orderBy(col("doc_id"))
      } finally PackShared.deleteRecursively(tmp.toString)
    }),

    // The stream-stream interval join driven for REAL (previously the
    // only §2.2 streaming row that was spec-gated without a CORRECTNESS
    // entry): purchases and clicks staged to two parquet directories,
    // drained by TWO readStreams through Streams.intervalJoin
    // (click within the hour before the purchase), aggregated per user.
    // The watermark delay deliberately spans the whole data range: the
    // staged files are not time-ordered, so a tight watermark would drop
    // rows nondeterministically (state-pruning semantics are spec-gated;
    // this row gates JOIN correctness). Oracle = the same interval join
    // in plain SQL.
    "q288_stream_interval_join" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"))
      val t1 = java.nio.file.Files.createTempDirectory("graft-q288-l").toString
      val t2 = java.nio.file.Files.createTempDirectory("graft-q288-r").toString
      try {
        purchases.repartition(3).write.mode("overwrite").parquet(t1)
        clicks.repartition(3).write.mode("overwrite").parquet(t2)
        val sinkName = "q288_sink"
        try s.catalog.dropTempView(sinkName) catch { case _: Exception => () }
        val ls = s.readStream.schema(purchases.schema)
          .option("maxFilesPerTrigger", 1).parquet(t1)
        val rs = s.readStream.schema(clicks.schema)
          .option("maxFilesPerTrigger", 1).parquet(t2)
        val joined = graft.streaming.Streams.intervalJoin(ls, rs,
          keyCol = "user_id", leftTs = "pts", rightTs = "cts",
          lookback = "1 hour", watermarkDelay = "3650 days")
        PackShared.withShufflePartitions(s, 4) {
          val q = joined.writeStream.format("memory").queryName(sinkName)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          try {
            if (!q.awaitTermination(300000))
              throw graft.core.GraftError("q288 drain timed out")
          } finally q.stop()
        }
        s.table(sinkName)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("pairs"),
            sum(unix_micros(col("pts")) - unix_micros(col("cts"))).as("lag_us_sum"))
          .localCheckpoint(true)
          .orderBy(col("user_id"))
      } finally {
        PackShared.deleteRecursively(t1); PackShared.deleteRecursively(t2)
      }
    }),

    // The exactly-once sink driven for REAL (previously spec-only):
    // events staged to 3 files, drained by readStream → foreachBatch →
    // ExactlyOnceParquetWriter with BOTH failure modes planted — a
    // crash-before-marker leftover (junk `batch=0` data, no marker: the
    // replay must OVERWRITE it completely) and an at-least-once
    // redelivery of a committed id after the drain (must be a no-op).
    // Oracle = the plain full-scan aggregate: any junk survivor,
    // duplicate, or dropped batch changes cnt/sum_value.
    "q289_exactly_once_sink" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = Tables.events(s, d).select(
        col("event_id"), col("event_type"), col("value"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-q289")
      val stage = tmp.resolve("stage").toString
      val sinkDir = tmp.resolve("sink").toString
      try {
        ev.repartition(3).write.mode("overwrite").parquet(stage)
        val writer = new graft.sinks.ExactlyOnceParquetWriter(sinkDir)
        // planted mid-write crash: data dir exists, marker does not
        s.range(5).select(lit(-1L).as("event_id"), lit("junk").as("event_type"),
            lit(0.0).as("value"))
          .write.mode("overwrite").parquet(s"$sinkDir/batch=0")
        val writeBatch: (DataFrame, Long) => Unit = (df, id) => writer.write(df, id)
        val q = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage)
          .writeStream.foreachBatch(writeBatch)
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow()).start()
        try {
          if (!q.awaitTermination(300000))
            throw graft.core.GraftError("q289 drain timed out")
        } finally q.stop()
        // at-least-once redelivery of a COMMITTED id: must skip entirely
        writer.write(ev.limit(7), 0L)
        s.read.parquet(sinkDir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
          .localCheckpoint(true)
          .orderBy(col("event_type"))
      } finally PackShared.deleteRecursively(tmp.toString)
    }),

    // The same drain as q44, but over REAL HTTP: an in-process fixture server
    // (JDK HttpServer, port of the reference's RESTServer semantics) serves
    // `documents` in fixed pages behind a bearer token that rotates ONCE,
    // mid-way through the driver's sequential AvailableNow capture walk —
    // the HttpPageFetcher's 403 → token-refresh → replay-once machine must
    // fire for the drain to proceed, and the rotation then pins (maxEpoch=1)
    // so the parallel partition readers can never race a fresh rotation.
    // Elements are base64'd server-side (document text may contain the line
    // delimiter) and decoded in the plan. Oracle = plain scan; any dropped/
    // duplicated page element or auth-replay duplicate fails the hash
    // compare.
    "q47_http_ingest" -> ((s, d) => {
      import graft.sources.HttpFixtureServer
      import java.nio.charset.StandardCharsets.UTF_8
      val pageSize = 64
      val serverData: IndexedSeq[String] = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
        .map(r => java.util.Base64.getEncoder.encodeToString(
          s"${r.getLong(0)}|${r.getString(1)}".getBytes(UTF_8))).toIndexedSeq
      val numPages = (serverData.size + pageSize - 1) / pageSize
      val server = new HttpFixtureServer(
        serverData, pageSize,
        rotateEvery = math.max(1, numPages / 2), maxEpoch = 1).start()
      try {
        val sinkName = "q47_sink"
        try s.catalog.dropTempView(sinkName) catch { case _: Exception => () }
        val q = s.readStream
          .format("graft.sources.PaginatedTableProvider")
          .option("url", server.docsUrl)
          .option("pageSize", pageSize.toString)
          .option("maxPagesPerTrigger", "256")
          .option("auth", "bearer")
          .option("tokenUrl", server.authUrl)
          .option("authUser", "user").option("authPass", "pass")
          .load()
          .writeStream.format("memory").queryName(sinkName).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try {
          if (!q.awaitTermination(300000)) throw graft.core.GraftError("q47 drain timed out")
        } finally q.stop()
        if (server.authCallCount < 2)
          throw graft.core.GraftError(
            s"q47 expected the rotating token to force a refresh; auth calls = ${server.authCallCount}")
        s.table(sinkName)
          .withColumn("decoded", unbase64(col("value")).cast("string"))
          .select(
            substring_index(col("decoded"), "|", 1).cast("long").as("doc_id"),
            md5(expr("substring(decoded, instr(decoded, '|') + 1)")).as("fp_md5"))
          .orderBy(col("doc_id"))
      } finally server.stop()
    })
  )

  def oracles: Map[String, String] = Map(
    "q23_incremental_window" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q44_paginated_ingest" -> """
      SELECT doc_id, md5(text) AS fp_md5
      FROM documents ORDER BY doc_id""",

    "q47_http_ingest" -> """
      SELECT doc_id, md5(text) AS fp_md5
      FROM documents ORDER BY doc_id""",

    // identical to q23's oracle: the DSv2 windowed stream must reproduce the
    // full table regardless of how the window walk tiled it
    "q49_jdbc_stream_window" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",

    // identical to q23's oracle: the filename-instant walk must reproduce
    // the full table no matter how the drops sliced it
    "q273_file_cursor_ingest" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",

    // identical to q44/q47's oracle: the startAfter walk must reproduce the
    // full corpus exactly once, decoy skipped
    "q274_object_cursor_ingest" -> """
      SELECT doc_id, md5(text) AS fp_md5
      FROM documents ORDER BY doc_id""",

    // q288: the same key + interval predicate in plain SQL; exact
    // microsecond lag sums (HUGEINT cast to BIGINT for dtype parity).
    "q288_stream_interval_join" -> """
      WITH p AS (SELECT user_id, ts AS pts FROM events
                 WHERE event_type = 'purchase' AND ts IS NOT NULL),
      c AS (SELECT user_id, ts AS cts FROM events
            WHERE event_type = 'click' AND ts IS NOT NULL)
      SELECT p.user_id, count(*) AS pairs,
             CAST(sum(epoch_us(pts) - epoch_us(cts)) AS BIGINT) AS lag_us_sum
      FROM p JOIN c ON c.user_id = p.user_id
        AND cts >= pts - INTERVAL 1 HOUR AND cts <= pts
      GROUP BY p.user_id ORDER BY p.user_id""",

    // q289: identical to q23's oracle — the sink must hold the whole
    // table exactly once despite the planted crash leftover and replay
    "q289_exactly_once_sink" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",

    // two periods drained → the whole corpus exactly once per period
    "q55_periodic_ingest" -> """
      SELECT doc_id, p.period, md5(text) AS fp_md5
      FROM documents CROSS JOIN (SELECT CAST(0 AS BIGINT) AS period
                                 UNION ALL SELECT CAST(1 AS BIGINT)) p
      ORDER BY doc_id, p.period"""
  )
}
