package graft.queries
import graft.Tables
import graft.operators.{AsofJoin, Chunking, Dedup, Multimodal, Profiler, RangeJoin, Rollup, Sampling, Similarity, Sketches, Skew, TextAnalysis, TimeSeries, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the thematic query packs (split from the former
  * monolithic DataPipelinePack in round 12): oracle-SQL fragment
  * builders, the DuckDB keyHash mirror, planted-fixture generators and
  * the hashed quality-scorer weights. Package-private: only packs (and
  * the graft.tools smoke harnesses) read these. */
private[graft] object PackShared {

  /** Shared boilerplate tails for the q325/q326 CDC gates — three ASCII
    * variants (~175 chars each, several expected chunks at maskBits 6)
    * embedded VERBATIM in the DuckDB oracles, so they must stay
    * single-quote-free and ASCII. */
  val cdcBoiler0: String =
    "all rights reserved this transcript was generated automatically and may " +
      "contain errors please verify important details against the original " +
      "recording before citing it anywhere"
  val cdcBoiler1: String =
    "subscribe to our newsletter for weekly updates on data engineering " +
      "practices tooling reviews and long form interviews with practitioners " +
      "shipping large scale systems today"
  val cdcBoiler2: String =
    "the opinions expressed in this document are those of the author alone " +
      "and do not necessarily reflect the views of the publisher its " +
      "affiliates or any sponsoring organization"

  /** Scoped shuffle-partition override for the streaming-drain queries
    * (q260/q262/q263): a stateful streaming query creates ONE state
    * store per shuffle partition at first run, so a 4-shard monitor
    * under the session default (32) pays 32 store inits + commits per
    * micro-batch for 4 shards of actual state — ~8× pure overhead on a
    * 3-batch drain. The override is restored in `finally` so the
    * surrounding suite (bench windows share the session) is untouched;
    * only the drain runs under it, the batch readout after it plans at
    * the session default. On a real cluster the monitor would set its
    * state-partition count at deploy time the same way. */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** The stage-and-drain harness shared by the streaming-monitor queries
    * (q260/q262/q263): stage the batch frame to a 3-file directory,
    * drain it through a REAL readStream (maxFilesPerTrigger=1 →
    * ≥3 micro-batches, AvailableNow) into a memory sink under the
    * 4-partition state-store override, return the drained table. `fold`
    * maps the raw streaming frame (same schema as `staged`) to the
    * monitor's snapshot output. The fixed sink name is dropped first —
    * a fresh UUID per call would leak one sink copy per invocation in
    * long-lived JVMs (the q44 rule). */
  def drainStaged(s: SparkSession, staged: DataFrame, sinkName: String,
      label: String)(fold: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val stage = java.nio.file.Files
      .createTempDirectory(s"graft-$label").toString
    try {
      staged.repartition(3).write.mode("overwrite").parquet(stage)
      try s.catalog.dropTempView(sinkName) catch { case _: Exception => () }
      val in = s.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      withShufflePartitions(s, 4) {
        val q = fold(in)
          .writeStream.format("memory").queryName(sinkName).outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        try {
          if (!q.awaitTermination(300000))
            throw graft.core.GraftError(s"$label drain timed out")
        } finally q.stop()
      }
    } finally deleteRecursively(stage) // memory sink holds the drained rows;
    // the staged files are dead weight — under the min-of-N bench protocol
    // each re-run would otherwise leave a full frame copy in /tmp
    s.table(sinkName)
  }

  /** [[drainStaged]] with a GUARANTEED-LAST final batch — the harness for
    * event-time window drains (q298): append-mode windowed aggregations
    * only emit a window once the watermark passes its end, so the drain
    * plants a far-future sentinel event to flush every real window, and
    * that sentinel MUST be the last micro-batch (a sentinel processed
    * early would advance the watermark and drop every later real event
    * as late). FileStreamSource orders new files by modification time,
    * so the sentinel file's mtime is explicitly bumped past every staged
    * file — deterministic ordering with no sleeps. */
  def drainStagedLast(s: SparkSession, staged: DataFrame, lastBatch: DataFrame,
      sinkName: String, label: String)(fold: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val stage = java.nio.file.Files
      .createTempDirectory(s"graft-$label").toString
    try {
      staged.repartition(3).write.mode("overwrite").parquet(stage)
      // stage the final batch aside, then move its part file in with an
      // mtime strictly after every real file's
      val side = java.nio.file.Files.createTempDirectory(s"graft-$label-last").toString
      try {
        lastBatch.coalesce(1).write.mode("overwrite").parquet(side)
        def listDir(dir: String): Seq[java.nio.file.Path] = {
          val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.toVector
          } finally s.close()
        }
        val part = listDir(side)
          .find(p => p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet"))
          .getOrElse(throw graft.core.GraftError(s"$label: no sentinel part file"))
        val dest = java.nio.file.Paths.get(stage, "z-last-batch.parquet")
        java.nio.file.Files.move(part, dest)
        val maxReal = listDir(stage).filter(_ != dest)
          .map(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .maxOption.getOrElse(0L)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(maxReal + 10000L))
      } finally deleteRecursively(side)
      try s.catalog.dropTempView(sinkName) catch { case _: Exception => () }
      val in = s.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      withShufflePartitions(s, 4) {
        val q = fold(in)
          .writeStream.format("memory").queryName(sinkName).outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        try {
          if (!q.awaitTermination(300000))
            throw graft.core.GraftError(s"$label drain timed out")
        } finally q.stop()
      }
    } finally deleteRecursively(stage)
    s.table(sinkName)
  }

  /** [[drainStaged]] with a REAL mid-corpus RESTART (r15 verdict #2): the
    * drain runs as TWO stream queries against one checkpoint. Leg 1 sees
    * only the first half of the staged files and terminates (the stop —
    * deterministic, unlike a hard mid-batch kill, but the same recovery
    * path: the leg-2 query is a brand-new instance that must rebuild its
    * `flatMapGroupsWithState` state from the state store, not from the
    * JVM); then the remaining files are moved into the stage dir and leg 2
    * resumes from the checkpoint, processing ONLY the unseen files. The
    * sink is a durable parquet FILE sink (exactly-once via its metadata
    * log — the memory sink would forget leg 1's rows on restart), loaded
    * once and `localCheckpoint`ed so the returned frame outlives the
    * temp-dir cleanup without any driver-side collect. Mirrors the
    * reference's resumable exactly-once run loop
    * (reference/core/src/main/scala/tamer/Tamer.scala:108-148): state
    * lives in durable storage, a restarted worker continues where the
    * last commit left off, and the readout equals the never-restarted
    * run's bit for bit. */
  def drainStagedResumed(s: SparkSession, staged: DataFrame, label: String)(
      fold: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, Paths}
    val stage = Files.createTempDirectory(s"graft-$label").toString
    val side = Files.createTempDirectory(s"graft-$label-side").toString
    val out = Files.createTempDirectory(s"graft-$label-out").toString
    val ckpt = Files.createTempDirectory(s"graft-$label-ckpt").toString
    try {
      staged.repartition(6).write.mode("overwrite").parquet(stage)
      val parts = {
        val l = Files.list(Paths.get(stage))
        try {
          import scala.jdk.CollectionConverters._
          l.iterator().asScala.toVector
            .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.getFileName.toString)
        } finally l.close()
      }
      require(parts.size >= 2, s"$label: need >= 2 staged files to restart between")
      // second half waits out leg 1 in the side dir
      val held = parts.drop(parts.size / 2)
      held.foreach(p => Files.move(p, Paths.get(side, p.getFileName.toString)))
      def leg(): Unit = withShufflePartitions(s, 4) {
        val in = s.readStream.schema(staged.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage)
        val q = fold(in).writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try {
          if (!q.awaitTermination(300000))
            throw graft.core.GraftError(s"$label drain leg timed out")
        } finally q.stop()
      }
      leg() // leg 1: first half, then the query object dies
      held.foreach(p => Files.move(Paths.get(side, p.getFileName.toString),
        Paths.get(stage, p.getFileName.toString)))
      leg() // leg 2: a NEW query recovers state + seen-files from ckpt
      // the drained rows COPY (one bounded batch write — snapshot rows,
      // not corpus) to a session-scoped dir that outlives this call
      // (freed by a JVM shutdown hook) and come back as a plain parquet
      // read — r16's localCheckpoint(true) here pinned snapshot blocks in
      // executor storage for the rest of the session, which accumulates
      // across a long gate run (r16 ADVICE). A rename instead of a copy
      // would break the read: the sink's _spark_metadata log records the
      // ABSOLUTE committed-file paths, and reading THROUGH the log is
      // what keeps an aborted task's orphan part files invisible.
      val keep = Files.createTempDirectory(s"graft-$label-keep").toString
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => deleteRecursively(keep)))
      s.read.parquet(out).write.mode("overwrite").parquet(keep)
      s.read.parquet(keep)
    } finally {
      deleteRecursively(stage); deleteRecursively(side)
      deleteRecursively(out); deleteRecursively(ckpt)
    }
  }

  /** Best-effort recursive delete of a staging directory (never throws:
    * cleanup must not mask the drain's own result/failure). */
  def deleteRecursively(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverseIterator
          .foreach(p => try java.nio.file.Files.deleteIfExists(p) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }

  /** q166's oracle is GENERATED like q33's: every band key re-derived in
    * DuckDB from the same plane literals, occupancy and pair counts pure
    * integers. */
  def lshOccupancyOracle: String = {
    val planes = graft.operators.Similarity.hyperplanes(dim = 64, nBits = 32)
    val bandExprs = (0 until 8).map { k =>
      val key = (0 until 4).map { i =>
        s"(CASE WHEN list_inner_product(v, [${planes(k * 4 + i).mkString(", ")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $k AS band, $key AS key FROM e"
    }.mkString(" UNION ALL ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      keys AS ($bandExprs),
      occ AS (SELECT band, key, count(*) AS c FROM keys GROUP BY band, key)
      SELECT band, count(*) AS n_buckets, max(c) AS max_occupancy,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs
      FROM occ GROUP BY band ORDER BY band"""
  }

  /** q61's oracle is GENERATED like q33's, closing the suite's last
    * rows-only gate: the production-configuration recall measurement is
    * fully deterministic (splitmix-derived planes, sign-flip perturbation
    * from `sin` of an integer argument — DuckDB's and the JVM's `sin` can
    * differ in the last ulp but never in SIGN for nonzero integer inputs,
    * and only the sign reaches the arithmetic), so DuckDB re-derives the
    * planted corpus, all 16 band buckets (from the same plane literals as
    * q33/q166), the verified LSH pair set, the 1:1 truth pairs, and the
    * identical summary row. Every float step mirrors the Spark plan's op
    * order: float element promoted to double, perturbed, cast back through
    * float; dot products summed left-to-right (`list_inner_product` ≡
    * `fastDot`); cosine as dot/(sqrt(aa)·sqrt(bb)); recall through the
    * [[graft.functions.Quantize.scaledFloor]] convention. */
  def lshProdRecallOracle: String = {
    val dim = 64
    val bandBits = 8
    val bands = 16
    val idOffset = 100000000L
    val planes = graft.operators.Similarity.hyperplanes(dim, bandBits * bands)
    // planted twin: element i of v (double, exact image of the float) times
    // (1.0 + 0.6*sign(sin(orig_id*37 + i))), rounded through FLOAT exactly
    // as Spark's `.cast("float")`, then back to double for LSH/verify
    val perturbed = (0 until dim).map { i =>
      s"CAST(CAST(v[${i + 1}] * (1.0 + 0.6 * sign(sin(CAST(orig_id * 37 + $i AS DOUBLE)))) AS FLOAT) AS DOUBLE)"
    }.mkString("[", ", ", "]")
    val bandSelects = (0 until bands).map { k =>
      val key = (0 until bandBits).map { i =>
        s"(CASE WHEN list_inner_product(v, [${planes(k * bandBits + i).mkString(", ")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $k AS band, $key AS key FROM corpus"
    }.mkString(" UNION ALL ")
    s"""
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      planted AS (
        SELECT orig_id + $idOffset AS vec_id, $perturbed AS v
        FROM (SELECT vec_id AS orig_id, v FROM base WHERE vec_id % 5 = 0)),
      corpus AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM planted),
      keys AS ($bandSelects),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM keys a JOIN keys b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
      verified AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN corpus ca ON ca.vec_id = c.id_a
        JOIN corpus cb ON cb.vec_id = c.id_b
        WHERE round(list_inner_product(ca.v, cb.v)
                / (sqrt(list_inner_product(ca.v, ca.v)) * sqrt(list_inner_product(cb.v, cb.v))), 6) >= 0.8),
      truth AS (
        SELECT b.vec_id AS id_a, p.vec_id AS id_b,
               list_inner_product(b.v, p.v)
                 / (sqrt(list_inner_product(b.v, b.v)) * sqrt(list_inner_product(p.v, p.v))) AS cos
        FROM base b JOIN planted p ON p.vec_id = b.vec_id + $idOffset),
      agg AS (SELECT
        (SELECT count(*) FROM truth) AS planted,
        (SELECT count(*) FROM truth WHERE round(cos, 6) >= 0.8) AS eligible,
        (SELECT count(*) FROM verified v JOIN truth t
           ON v.id_a = t.id_a AND v.id_b = t.id_b AND round(t.cos, 6) >= 0.8) AS found,
        (SELECT count(*) FROM verified) AS lsh_pairs)
      SELECT planted, eligible, found, lsh_pairs,
             CAST(floor(CAST(found AS DOUBLE) / CAST(eligible AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS recall
      FROM agg"""
  }

  /** q205's oracle is GENERATED: the RBO weight table W[m] (1e-9 integer
    * grid, [[graft.operators.TextAnalysis.rboWeightGrid]]) and the (1−p)
    * factor embed as literals, so the per-pair contributions and the
    * final scaled-floor are the identical doubles. */
  def rboOracle: String = {
    val wq = graft.operators.TextAnalysis.rboWeightGrid(0.9, 10)
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      sc8 AS (SELECT vec_id,
                     list_max([CAST(abs(y) AS DOUBLE) for y in embedding]) / 127.0 AS scale
              FROM embeddings),
      dq AS (SELECT e.vec_id,
                    CASE WHEN scale = 0
                         THEN [CAST(0 AS DOUBLE) for x in v]
                         ELSE [CAST(round(x / scale) AS INTEGER) * scale for x in v]
                    END AS v
             FROM e JOIN sc8 ON e.vec_id = sc8.vec_id),
      pa AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
      pb AS (SELECT vec_id AS probe_id, v AS pv FROM dq WHERE vec_id < 5),
      sa AS (SELECT probe_id, e.vec_id AS nbr_id,
                    list_inner_product(pv, e.v) /
                      (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(e.v, e.v))) AS cs
             FROM pa CROSS JOIN e WHERE e.vec_id != probe_id),
      sb AS (SELECT probe_id, dq.vec_id AS nbr_id,
                    list_inner_product(pv, dq.v) /
                      (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(dq.v, dq.v))) AS cs
             FROM pb CROSS JOIN dq WHERE dq.vec_id != probe_id),
      ra AS (SELECT probe_id, nbr_id,
                    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, nbr_id) AS r
             FROM sa),
      rb AS (SELECT probe_id, nbr_id,
                    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, nbr_id) AS r
             FROM sb),
      j AS (SELECT ra.probe_id, greatest(ra.r, rb.r) AS m
            FROM ra JOIN rb ON ra.probe_id = rb.probe_id AND ra.nbr_id = rb.nbr_id
            WHERE ra.r <= 10 AND rb.r <= 10),
      wt AS (SELECT [${wq.mkString("CAST(", " AS BIGINT), CAST(", " AS BIGINT)")}] AS t)
      SELECT probe_id, count(*) AS overlap_at_depth,
             CAST(floor(CAST(sum(t[m]) AS DOUBLE) / 1000000000.0 * ${1.0 - 0.9}
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS rbo
      FROM j CROSS JOIN wt GROUP BY probe_id ORDER BY probe_id"""
  }

  /** q206's oracle is GENERATED: the λ and 1−λ factors embed as the exact
    * Scala doubles (1−0.7 is 0.30000000000000004 — interpolation emits
    * the round-tripping shortest form), and the five greedy steps unroll
    * as argmax CTEs with the same quantize-then-tie-break rule. */
  def mmrOracle: String = {
    val lam = 0.7
    val oneMinus = 1.0 - lam
    def fl6(x: String) = s"CAST(floor(($x) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0"
    def cosTo(sel: String) =
      s"""CASE WHEN sqrt(list_inner_product(r.v, r.v)) > 0 AND sqrt(list_inner_product($sel.v, $sel.v)) > 0
               THEN list_inner_product(r.v, $sel.v) /
                    (sqrt(list_inner_product(r.v, r.v)) * sqrt(list_inner_product($sel.v, $sel.v)))
               ELSE 0.0 END"""
    // step n: score remaining candidates against the already-selected
    // rows, take the quantized argmax (ties to the lowest id)
    val steps = (2 to 5).map { n =>
      val prevSel = (1 until n).map(i => s"s$i")
      val joins = prevSel.map(si => s"CROSS JOIN $si").mkString(" ")
      val red = prevSel.map(si => cosTo(si)).mkString("greatest(", ", ", ")")
      val notIn = prevSel.map(si => s"r.id != $si.id").mkString(" AND ")
      s"""
      sc$n AS (SELECT r.id, r.v, ${fl6(s"$lam * r.rel - $oneMinus * $red")} AS s
               FROM c r $joins WHERE $notIn),
      s$n AS (SELECT id, v, s FROM sc$n ORDER BY s DESC, id LIMIT 1)"""
    }.mkString(",")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      pr AS (SELECT v AS pv FROM e WHERE vec_id = 0),
      c AS (SELECT vec_id AS id, v,
                   list_inner_product(pv, v) /
                     (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(v, v))) AS rel
            FROM e CROSS JOIN pr WHERE vec_id > 0),
      sc1 AS (SELECT id, v, ${fl6(s"$lam * rel - $oneMinus * 0.0")} AS s FROM c),
      s1 AS (SELECT id, v, s FROM sc1 ORDER BY s DESC, id LIMIT 1),$steps
      SELECT CAST(1 AS INTEGER) AS rank, id AS vec_id, s AS mmr_score FROM s1
      UNION ALL SELECT 2, id, s FROM s2
      UNION ALL SELECT 3, id, s FROM s3
      UNION ALL SELECT 4, id, s FROM s4
      UNION ALL SELECT 5, id, s FROM s5
      ORDER BY rank"""
  }

  /** q33's oracle is GENERATED: the sign-LSH bucketing is deterministic
    * (fixed splitmix-derived hyperplanes), so the oracle SQL re-derives the
    * buckets in DuckDB from the same plane constants, embedded as literals.
    * `Double.toString` round-trips, so the re-parsed planes are
    * bit-identical and both engines dot them in the same element order.
    */
  def lshAnnOracle: String = {
    val sig = graft.operators.Similarity.hyperplanes(dim = 64, nBits = 8)
      .zipWithIndex
      .map { case (p, j) =>
        s"(CASE WHEN list_inner_product(v, [${p.mkString(", ")}]) >= 0 THEN ${1L << j} ELSE 0 END)"
      }
      .mkString(" + ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      s AS (SELECT vec_id, v, $sig AS bucket FROM e),
      p AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM s WHERE vec_id < 10),
      cand AS (
        SELECT probe_id, pv, s.vec_id AS nbr_id, s.v
        FROM p JOIN s USING (bucket) WHERE s.vec_id != probe_id),
      scored AS (
        SELECT probe_id, nbr_id, list_cosine_similarity(pv, v) AS sim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY list_cosine_similarity(pv, v) DESC, nbr_id) AS rnk
        FROM cand)
      SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, nbr_id, round(sim, 4) + 0.0 AS cos_sim
      FROM scored WHERE rnk <= 5 ORDER BY probe_id, rnk"""
  }

  /** q106's oracle is GENERATED like q33's: the JL matrix is deterministic
    * (splitmix-derived Rademacher rows), so each projected component is
    * re-derived in DuckDB from the same plane constants as SQL literals;
    * parallel `unnest`s zip the dim index with the component list.
    */
  def jlProjectOracle: String = {
    val planes = graft.operators.Similarity.jlPlanes(inDim = 64, outDim = 16)
    val ds = planes.indices.map(j => s"CAST($j AS INTEGER)").mkString(", ")
    val comps = planes
      .map(p => s"round(list_inner_product(v, [${p.mkString(", ")}]), 4) + 0.0")
      .mkString(",\n               ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT vec_id, unnest([$ds]) AS d,
             unnest([$comps]) AS comp
      FROM e ORDER BY vec_id, d"""
  }

  /** q107's oracle: project through the SPARSE Achlioptas planes (same
    * literal-embedding contract), then exact top-5 cosine in the projected
    * space, ranking on round(sim, 4) exactly as the Spark side's
    * scoreScale = 4 does. */
  def jlAnnOracle: String = {
    val planes = graft.operators.Similarity.jlPlanes(inDim = 64, outDim = 16, sparse = true)
    val comps = planes
      .map(p => s"list_inner_product(v, [${p.mkString(", ")}])")
      .mkString(",\n               ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT vec_id, [$comps] AS jv FROM e),
      probes AS (SELECT vec_id AS probe_id, jv AS pv FROM p WHERE vec_id < 5),
      scored AS (
        SELECT pr.probe_id, p.vec_id AS nbr_id,
               round(list_cosine_similarity(p.jv, pr.pv), 4) AS sim
        FROM p JOIN probes pr ON p.vec_id != pr.probe_id),
      ranked AS (
        SELECT probe_id, nbr_id, sim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY sim DESC, nbr_id) AS rnk
        FROM scored)
      SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, nbr_id, sim AS cos_sim
      FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk"""
  }

  /** q32's oracle is GENERATED like q33's: the SimHash token hash is a
    * 60-bit md5 prefix both engines compute identically, so the oracle
    * rebuilds the per-bit majority vote, the signature, and the
    * hamming-<=-3 pairs in SQL (all-pairs is fine at oracle scale; the
    * Spark side buckets by 15-bit chunks and must find the same pairs).
    */
  def simhashOracle: String = {
    val bits = graft.operators.Dedup.SimHashBits
    val votes = (0 until bits)
      .map(i => s"sum(CASE WHEN (th >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n               ")
    val sig = (0 until bits)
      .map(i => s"(CASE WHEN v$i >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      h AS (
        SELECT doc_id,
               CAST(concat('0x', substring(md5(tok), 1, ${bits / 4})) AS BIGINT) AS th
        FROM toks),
      votes AS (
        SELECT doc_id,
               $votes
        FROM h GROUP BY doc_id),
      sig AS (SELECT doc_id, $sig AS s FROM votes)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.s, b.s)) <= 3
      ORDER BY id_a, id_b"""
  }

  def simhashWeightedOracle: String = {
    val bits = graft.operators.Dedup.SimHashBits
    val votes = (0 until bits)
      .map(i => s"sum(CASE WHEN (th >> $i) & 1 = 1 THEN w ELSE -w END) AS v$i")
      .mkString(",\n               ")
    val sig = (0 until bits)
      .map(i => s"(CASE WHEN v$i >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""
      WITH dt AS (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      h AS (
        SELECT t.doc_id,
               CAST(concat('0x', substring(md5(t.tok), 1, ${bits / 4})) AS BIGINT) AS th,
               CAST(round(ln(n.n / dfc.df) * 1000, 0) AS BIGINT) + 1 AS w
        FROM toks t JOIN dfc ON t.tok = dfc.tok CROSS JOIN n),
      votes AS (
        SELECT doc_id,
               $votes
        FROM h GROUP BY doc_id)
      SELECT doc_id, $sig AS simhash FROM votes ORDER BY doc_id"""
  }

  /** DuckDB form of [[Sampling.keyHash]]: same md5 60-bit prefix, same
    * integer threshold literals — the comparison is integer-exact on both
    * engines, so the oracle is the definition, not an approximation. */
  def duckKeyHash(keyExpr: String, salt: String): String =
    s"CAST(concat('0x', substring(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** Unrolled synchronous label-propagation oracle (the q136 HITS unroll
    * discipline): `edgeSql` must yield (s, d); each round is the same
    * count-DESC-then-min-label argmax the operator's max-struct computes. */
  def lpaCtes(edgeSql: String, iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      s"""c$i AS (SELECT s.node, p.label, count(*) AS c
             FROM sym s JOIN l${i - 1} p ON p.node = s.nbr GROUP BY s.node, p.label),
      b$i AS (SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
                FROM c$i) WHERE rn = 1),
      l$i AS (SELECT n.node, coalesce(b.label, p.label) AS label
              FROM nodes n JOIN l${i - 1} p ON p.node = n.node
              LEFT JOIN b$i b ON b.node = n.node)"""
    }.mkString(",\n      ")
    s"""raw AS ($edgeSql),
      und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s <> d),
      sym AS (SELECT a AS node, b AS nbr FROM und
              UNION ALL SELECT b, a FROM und),
      nodes AS (SELECT a AS node FROM und UNION SELECT b FROM und),
      l0 AS (SELECT node, node AS label FROM nodes),
      $iters"""
  }

  def lpaOracle(edgeSql: String, iterations: Int): String =
    s"""
      WITH ${lpaCtes(edgeSql, iterations)}
      SELECT node, label FROM l$iterations ORDER BY node"""

  /** q228: the q218 LPA rounds (shared CTE builder) + Newman modularity —
    * exact integer edge/degree masses, the operator's two final divisions
    * mirrored. */
  def modularityOracle(edgeSql: String, iterations: Int): String =
    s"""
      WITH ${lpaCtes(edgeSql, iterations)},
      lbl AS (SELECT node, label AS c FROM l$iterations),
      mm AS (SELECT count(*) AS m FROM und),
      intra AS (SELECT la.c AS ca, lb.c AS cb
                FROM und u JOIN lbl la ON la.node = u.a
                           JOIN lbl lb ON lb.node = u.b),
      ec AS (SELECT count(*) AS se FROM intra WHERE ca = cb),
      degc AS (SELECT c, count(*) AS deg
               FROM (SELECT ca AS c FROM intra UNION ALL SELECT cb FROM intra)
               GROUP BY c),
      dc AS (SELECT CAST(sum(deg * deg) AS BIGINT) AS sd2,
                    count(*) AS n_communities
             FROM degc)
      SELECT n_communities, CAST(m AS BIGINT) AS n_edges,
             CAST(floor((CAST(se AS DOUBLE) / CAST(m AS DOUBLE)
                         - CAST(sd2 AS DOUBLE)
                           / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS modularity
      FROM mm CROSS JOIN ec CROSS JOIN dc"""

  val q218EdgeSql =
    """SELECT (a % 10) * 10 + (a // 10) % 10 AS s,
              (a % 10) * 10 + (a // 100) % 10 AS d
       FROM (SELECT doc_id % 1000 AS a FROM documents)
       UNION ALL
       SELECT a % 100 AS s, (a + 13) % 100 AS d
       FROM (SELECT doc_id % 1000 AS a FROM documents) WHERE a % 127 = 0"""

  /** q225's oracle, generated from the operator's OWN cumulative-Poisson
    * thresholds and alpha/2 double (`Double.toString` round-trips to the
    * identical double in DuckDB), so the inverse-CDF walk, the replicate
    * means, and the rank picks are engine-exact. */
  def bootstrapCiOracle: String = {
    val wExpr = graft.operators.Profiler.poissonCdf1
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    val lo2 = ((1.0 - 0.95) / 2.0).toString
    val h = duckKeyHash("id || ':' || CAST(b AS VARCHAR)", "bci")
    s"""
      WITH rows_ AS (SELECT CAST(doc_id AS VARCHAR) AS id, CAST(n_chars AS BIGINT) AS v
                     FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
      pt AS (SELECT count(*) AS n_rows, CAST(sum(v) AS BIGINT) AS sv FROM rows_),
      ex AS (SELECT id, v, b FROM rows_
             CROSS JOIN (SELECT unnest(range(1, 201)) AS b)),
      uu AS (SELECT b, v,
                    (CAST($h AS DOUBLE) + 0.5) / 1152921504606846976.0 AS u
             FROM ex),
      ww AS (SELECT b, v, $wExpr AS w FROM uu),
      rs AS (SELECT b, CAST(sum(w * v) AS BIGINT) AS swv, CAST(sum(w) AS BIGINT) AS sw
             FROM ww GROUP BY b HAVING sum(w) > 0),
      m9 AS (SELECT b, CAST(floor(CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE)
                                  * 1000000000.0 + 0.5) AS BIGINT) AS m9
             FROM rs),
      rk AS (SELECT m9, b, count(*) OVER () AS m,
                    row_number() OVER (ORDER BY m9, b) AS rn
             FROM m9),
      pick AS (SELECT m9, rn, m,
                      greatest(CAST(1 AS BIGINT),
                               CAST(floor(CAST(m AS DOUBLE) * $lo2) AS BIGINT)) AS lor
               FROM rk),
      ci AS (SELECT max(m) AS reps_used, min(m9) AS lo9, max(m9) AS hi9
             FROM pick WHERE rn = lor OR rn = m - lor + 1)
      SELECT pt.n_rows, ci.reps_used,
             CAST(floor(CAST(pt.sv AS DOUBLE) / CAST(pt.n_rows AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean,
             CAST(floor(CAST(ci.lo9 AS DOUBLE) / 1000000000.0
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS ci_lo,
             CAST(floor(CAST(ci.hi9 AS DOUBLE) / 1000000000.0
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS ci_hi
      FROM pt CROSS JOIN ci"""
  }

  /** q230's oracle: hashSplit's exact boundary literal + the readout
    * formulas mirrored raw-then-quantized. */
  def abReadoutOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("user_id", "exp1")
    s"""
      WITH u AS (SELECT user_id,
                        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
                 FROM events GROUP BY user_id),
      asg AS (SELECT (conv = 1) AS c,
                     CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS split
              FROM u),
      g AS (SELECT CAST(count(*) FILTER (WHERE split = 'a') AS BIGINT) AS n_a,
                   CAST(count(*) FILTER (WHERE split = 'b') AS BIGINT) AS n_b,
                   CAST(count(*) FILTER (WHERE split = 'a' AND c) AS BIGINT) AS conv_a,
                   CAST(count(*) FILTER (WHERE split = 'b' AND c) AS BIGINT) AS conv_b
            FROM asg),
      r AS (SELECT n_a, n_b, conv_a, conv_b,
                   CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
                   CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
                   CAST(conv_a + conv_b AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pooled,
                   (CAST(n_a AS DOUBLE)
                    - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * 0.5)
                     / sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * 0.5 * 0.5)
                     AS zs
            FROM g)
      SELECT n_a, n_b, conv_a, conv_b,
             CAST(floor(ra * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS rate_a,
             CAST(floor(rb * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS rate_b,
             CASE WHEN conv_a > 0
                  THEN CAST(floor((rb - ra) / ra * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS lift,
             CASE WHEN pooled > 0.0 AND pooled < 1.0
                  THEN CAST(floor((rb - ra) / sqrt(pooled * (1.0 - pooled)
                         * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS z_conv,
             CAST(floor(zs * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS z_srm,
             (abs(zs) > 3.0) AS srm_flag
      FROM r"""
  }

  /** q231's oracle: the per-user triple + quantile_cont thresholds (the
    * q198 percentile mirror) + the 1-5 scoring CASE sums, generated. */
  def rfmOracle: String = {
    def above(v: String, arr: String) = (1 to 4)
      .map(i => s"(CASE WHEN CAST($v AS DOUBLE) > $arr[$i] THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""
      WITH ev AS (SELECT user_id, ts,
                         CASE WHEN event_type = 'purchase' THEN event_id % 50 + 1
                              ELSE 0 END AS amount
                  FROM events),
      ref AS (SELECT max(CAST(ts AS DATE)) AS r FROM ev),
      pu AS (SELECT user_id, max(CAST(ts AS DATE)) AS lastd, count(*) AS frequency,
                    CAST(sum(amount) AS BIGINT) AS monetary
             FROM ev GROUP BY user_id),
      pr AS (SELECT user_id, date_diff('day', lastd, r) AS recency, frequency, monetary
             FROM pu CROSS JOIN ref),
      cuts AS (SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rc,
                      quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fc,
                      quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mc
               FROM pr),
      s AS (SELECT user_id, recency, frequency, monetary,
                   5 - (${above("recency", "rc")}) AS r_score,
                   1 + (${above("frequency", "fc")}) AS f_score,
                   1 + (${above("monetary", "mc")}) AS m_score
            FROM pr CROSS JOIN cuts)
      SELECT user_id, recency, frequency, monetary, r_score, f_score, m_score,
             CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS segment
      FROM s ORDER BY user_id"""
  }

  /** q237's oracle: the hashSplit arm boundary + Welch's closed form on
    * exact per-arm decimal sums, every double op in the operator's
    * evaluation order. */
  /** q259's oracle: Welch from scratch over ALL orders — equality with
    * the Spark side's merge-of-vintage-partials IS the mergeability
    * proof (decimal partials make shard boundaries unobservable). Value
    * snapped to integer cents on both engines before the decimal cast. */
  def vintageWelchOracle: String =
    welchOrdersOracle(
      "CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS DECIMAL(18,0))")

  /** q278's oracle: the same Welch-from-scratch, metric in WHOLE DOLLARS
    * (the streaming monitor's Σx²-fits-a-long unit rule). */
  def streamingWelchOracle: String =
    welchOrdersOracle("CAST(CAST(floor(o_totalprice) AS BIGINT) AS DECIMAL(18,0))")

  private def welchOrdersOracle(xSql: String): String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("o_custkey", "exp2")
    s"""
      WITH asg AS (SELECT CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS arm,
                     $xSql AS x
              FROM orders),
      g AS (SELECT
              CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS n_a,
              CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS n_b,
              CAST(sum(x) FILTER (WHERE arm = 'a') AS DECIMAL(38,8)) AS sa,
              CAST(sum(x) FILTER (WHERE arm = 'b') AS DECIMAL(38,8)) AS sb,
              CAST(sum(CAST(x * x AS DECIMAL(38,8))) FILTER (WHERE arm = 'a')
                AS DECIMAL(38,8)) AS ssa,
              CAST(sum(CAST(x * x AS DECIMAL(38,8))) FILTER (WHERE arm = 'b')
                AS DECIMAL(38,8)) AS ssb
            FROM asg),
      t AS (SELECT n_a, n_b,
                   CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
                   CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
                   (CAST(n_a AS DOUBLE) * CAST(ssa AS DOUBLE)
                    - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                     / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
                     / CAST(n_a AS DOUBLE) AS sea,
                   (CAST(n_b AS DOUBLE) * CAST(ssb AS DOUBLE)
                    - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                     / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
                     / CAST(n_b AS DOUBLE) AS seb
            FROM g)
      SELECT n_a, n_b,
             CAST(floor(ma * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_a,
             CAST(floor(mb * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_b,
             CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0.0
                  THEN CAST(floor((mb - ma) / sqrt(sea + seb) * 1000000.0 + 0.5)
                         AS DOUBLE) / 1000000.0
             END AS t_stat,
             CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0.0
                  THEN CAST(floor((sea + seb) * (sea + seb)
                         / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
                            + seb * seb / (CAST(n_b AS DOUBLE) - 1.0))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS df_welch
      FROM t"""
  }

  /** q279's oracle is GENERATED like the HITS/LPA unrolls: the full
    * Bradley–Terry MM iteration replayed CTE-by-CTE on the integer
    * nano-grid — per-pair terms floor-quantized to long units before the
    * Σ_j (exact BIGINT sums, order-free), per-step normalization, the
    * zero-win floor — every double op in the operator's evaluation
    * order, so the fit is engine-exact by construction. `duelSql` must
    * yield (w, l). */
  def bradleyTerryCtes(duelSql: String, iterations: Int): String = {
    val iters = (1 to iterations).map { k =>
      s"""t$k AS MATERIALIZED (SELECT s.i,
               CAST(floor(CAST(s.nij AS DOUBLE)
                    / (CAST(pa.u + pb.u AS DOUBLE) / 1000000000.0)
                    * 1000000000.0 + 0.5) AS BIGINT) AS tu
             FROM sym s
             JOIN p${k - 1} pa ON pa.item = s.i
             JOIN p${k - 1} pb ON pb.item = s.j),
      de$k AS MATERIALIZED (SELECT i, CAST(sum(tu) AS BIGINT) AS du FROM t$k GROUP BY i),
      r$k AS MATERIALIZED (SELECT w.item,
               greatest(CAST(floor(
                   CASE WHEN d.du IS NOT NULL AND d.du > 0
                        THEN CAST(w.wins AS DOUBLE)
                             / (CAST(d.du AS DOUBLE) / 1000000000.0)
                        ELSE CAST(0.0 AS DOUBLE) END
                   * 1000000000.0 + 0.5) AS BIGINT),
                 CAST(1 AS BIGINT)) AS u0
             FROM wn w LEFT JOIN de$k d ON d.i = w.item),
      n$k AS MATERIALIZED (SELECT CAST(sum(u0) AS BIGINT) AS su,
                     CAST(count(*) AS BIGINT) AS c FROM r$k),
      p$k AS MATERIALIZED (SELECT r.item,
               greatest(CAST(floor(CAST(r.u0 AS DOUBLE)
                    * (CAST(n.c * 1000000000 AS DOUBLE) / CAST(n.su AS DOUBLE))
                    + 0.5) AS BIGINT),
                 CAST(1 AS BIGINT)) AS u
             FROM r$k r CROSS JOIN n$k n)"""
    }.mkString(",\n      ")
    s"""
      WITH d AS ($duelSql),
      oc AS MATERIALIZED (SELECT w, l, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY w, l),
      it AS (SELECT w AS item FROM oc UNION SELECT l FROM oc),
      wn AS MATERIALIZED (SELECT i.item, coalesce(s.wsum, CAST(0 AS BIGINT)) AS wins
             FROM it i LEFT JOIN (SELECT w AS item, CAST(sum(n) AS BIGINT) AS wsum
                                  FROM oc GROUP BY w) s ON s.item = i.item),
      sym AS MATERIALIZED (SELECT i, j, CAST(sum(n) AS BIGINT) AS nij FROM (
                SELECT w AS i, l AS j, n FROM oc
                UNION ALL SELECT l, w, n FROM oc) GROUP BY i, j),
      dc AS (SELECT i AS item, CAST(sum(nij) AS BIGINT) AS duels FROM sym GROUP BY i),
      p0 AS MATERIALIZED (SELECT item, CAST(1000000000 AS BIGINT) AS u FROM wn),
      $iters
      SELECT p.item,
             CAST(floor(CAST(p.u AS DOUBLE) / 1000000000.0 * 1000000.0 + 0.5)
               AS DOUBLE) / 1000000.0 AS strength,
             w.wins, dc.duels
      FROM p$iterations p
      JOIN wn w ON w.item = p.item
      JOIN dc ON dc.item = p.item
      ORDER BY p.item"""
  }

  def welchOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("user_id", "exp1")
    s"""
      WITH u AS (SELECT user_id, count(*) AS v FROM events GROUP BY user_id),
      asg AS (SELECT CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS arm,
                     CAST(v AS DECIMAL(18,2)) AS x
              FROM u),
      g AS (SELECT
              CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS n_a,
              CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS n_b,
              CAST(sum(x) FILTER (WHERE arm = 'a') AS DECIMAL(38,8)) AS sa,
              CAST(sum(x) FILTER (WHERE arm = 'b') AS DECIMAL(38,8)) AS sb,
              CAST(sum(CAST(x * x AS DECIMAL(38,8))) FILTER (WHERE arm = 'a')
                AS DECIMAL(38,8)) AS ssa,
              CAST(sum(CAST(x * x AS DECIMAL(38,8))) FILTER (WHERE arm = 'b')
                AS DECIMAL(38,8)) AS ssb
            FROM asg),
      t AS (SELECT n_a, n_b,
                   CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
                   CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
                   (CAST(n_a AS DOUBLE) * CAST(ssa AS DOUBLE)
                    - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                     / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
                     / CAST(n_a AS DOUBLE) AS sea,
                   (CAST(n_b AS DOUBLE) * CAST(ssb AS DOUBLE)
                    - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                     / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
                     / CAST(n_b AS DOUBLE) AS seb
            FROM g)
      SELECT n_a, n_b,
             CAST(floor(ma * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_a,
             CAST(floor(mb * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_b,
             CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0.0
                  THEN CAST(floor((mb - ma) / sqrt(sea + seb) * 1000000.0 + 0.5)
                         AS DOUBLE) / 1000000.0
             END AS t_stat,
             CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0.0
                  THEN CAST(floor((sea + seb) * (sea + seb)
                         / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
                            + seb * seb / (CAST(n_b AS DOUBLE) - 1.0))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS df_welch
      FROM t"""
  }

  /** q244's oracle: the β literals embedded as the EXACT Scala doubles
    * (1.0 − 0.999 is 0.001000…0009 in IEEE — writing `1.0 - 0.999` in SQL
    * would make DuckDB fold it in exact decimal and diverge), per-class
    * 1e-9-quantized ENS terms summed as decimal. */
  def classWeightsOracle: String = {
    val beta = 0.999
    val oneMinus = 1.0 - beta // the exact double the operator's lit() carries
    s"""
      WITH per AS (SELECT lang AS class, CAST(count(*) AS BIGINT) AS n
                   FROM documents WHERE lang IS NOT NULL GROUP BY 1),
      p2 AS (SELECT class, n,
                    CAST(CAST(floor($oneMinus
                        / (1.0 - power($beta, CAST(n AS DOUBLE)))
                        * 1000000000.0 + 0.5) AS DOUBLE)
                      / 1000000000.0 AS DECIMAL(18,9)) AS raw
             FROM per),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS tot,
                     CAST(sum(raw) AS DECIMAL(38,9)) AS sraw
              FROM p2)
      SELECT class, n,
             CAST(floor(CAST(tot AS DOUBLE)
                 / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE))
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS inv_weight,
             CAST(floor(CAST(k AS DOUBLE) * CAST(raw AS DOUBLE)
                 / CAST(sraw AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS ens_weight
      FROM p2 CROSS JOIN tot ORDER BY class"""
  }

  /** q246's oracle: the IPF row/col rescale unrolled 3 iterations (the
    * lpaCtes discipline), shares embedded as the exact Scala doubles and
    * every rescale quantized to the 1e-9 grid like the operator. */
  def rakingOracle: String = {
    val rowShares = Seq("de", "en", "es", "fr", "zh").map(_ -> 0.2)
    val colShares = (0 until 20).map(i => s"src$i" -> 0.05)
    def inList(s: Seq[(String, Double)]) = s.map(x => s"'${x._1}'").mkString(", ")
    def caseOf(axis: String, s: Seq[(String, Double)]) =
      s"CASE $axis " + s.map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ") + " END"
    def rescale(prev: String, out: String, axis: String, s: Seq[(String, Double)]) =
      s"""$out AS (SELECT r, c, n, tot,
           CAST(CAST(floor(${caseOf(axis, s)} * CAST(tot AS DOUBLE)
               / CAST(CAST(sum(CAST(w * n AS DECIMAL(38,9))) OVER (PARTITION BY $axis)
                      AS DECIMAL(38,9)) AS DOUBLE)
               * CAST(w AS DOUBLE) * 1000000000.0 + 0.5) AS DOUBLE)
             / 1000000000.0 AS DECIMAL(18,9)) AS w
         FROM $prev)"""
    val iters = (1 to 3).flatMap { i =>
      Seq(rescale(if (i == 1) "g0" else s"c${i - 1}", s"r$i", "r", rowShares),
        rescale(s"r$i", s"c$i", "c", colShares))
    }.mkString(",\n      ")
    s"""
      WITH grid AS (SELECT lang AS r, source AS c, CAST(count(*) AS BIGINT) AS n
                    FROM documents
                    WHERE lang IN (${inList(rowShares)})
                      AND source IN (${inList(colShares)})
                    GROUP BY 1, 2),
      g0 AS (SELECT r, c, n, CAST(sum(n) OVER () AS BIGINT) AS tot,
                    CAST(1.0 AS DECIMAL(18,9)) AS w
             FROM grid),
      $iters
      SELECT r AS lang, c AS source, n, CAST(w AS DOUBLE) AS weight
      FROM c3 ORDER BY lang, source"""
  }

  /** The q93 2-iteration k-means CTE chain (lowest-id init, cosine
    * assignment with DESC-similarity/lowest-cid ties, per-dim float
    * means), ending at `c2 (cid, cv)` — shared by the q93 training gate
    * and the q249 silhouette so both score the SAME model. */
  def kmeansCtes: String = """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
             FROM e ORDER BY vec_id LIMIT 4),
      a1 AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      m1 AS (SELECT a.cid, d.i, avg(e.v[d.i]) AS x
             FROM a1 a JOIN e USING (vec_id) CROSS JOIN dims d GROUP BY a.cid, d.i),
      c1 AS (SELECT c0.cid, coalesce(mm.cv, c0.cv) AS cv
             FROM c0 LEFT JOIN (SELECT cid, list(x ORDER BY i) AS cv
                                FROM m1 GROUP BY cid) mm USING (cid)),
      a2 AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1),
      m2 AS (SELECT a.cid, d.i, avg(e.v[d.i]) AS x
             FROM a2 a JOIN e USING (vec_id) CROSS JOIN dims d GROUP BY a.cid, d.i),
      c2 AS (SELECT c1.cid, coalesce(mm.cv, c1.cv) AS cv
             FROM c1 LEFT JOIN (SELECT cid, list(x ORDER BY i) AS cv
                                FROM m2 GROUP BY cid) mm USING (cid))"""

  /** q249's oracle: the shared k-means chain, centroids floor-quantized
    * to the 1e-4 grid (the operator's model-card contract), cosine
    * rank-1/rank-2 dissimilarities, per-point 1e-6 silhouettes summed as
    * decimal. */
  def silhouetteOracle: String = s"""
      WITH $kmeansCtes,
      cq AS (SELECT cid,
                    [CAST(floor(x * 10000.0 + 0.5) AS DOUBLE) / 10000.0 for x in cv]
                      AS cv
             FROM c2),
      sims AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cv) AS sim
               FROM e CROSS JOIN cq c
               WHERE list_dot_product(e.v, e.v) > 0.0),
      ranked AS (SELECT vec_id, cid, sim,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim DESC, cid) AS rn
                 FROM sims),
      ab AS (SELECT r1.vec_id, r1.cid, 1.0 - r1.sim AS a, 1.0 - r2.sim AS b
             FROM ranked r1 JOIN ranked r2
               ON r1.vec_id = r2.vec_id AND r2.rn = 2
             WHERE r1.rn = 1),
      sil AS (SELECT cid,
                     CAST(CAST(floor((CASE WHEN greatest(a, b) > 0.0
                                           THEN (b - a) / greatest(a, b)
                                           ELSE 0.0 END)
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                       AS DECIMAL(18,6)) AS s
              FROM ab)
      SELECT cid, CAST(count(*) AS BIGINT) AS n,
             CAST(floor(CAST(CAST(sum(s) AS DECIMAL(38,6)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS mean_sil
      FROM sil GROUP BY cid ORDER BY cid"""

  /** q251's oracle: the q235 permutation machinery keyed by event_type
    * (same arm boundary, same per-(unit, rep) coin, each group's own
    * n_a share), then the BH step-up as a suffix-min over the 5-row
    * battery. */
  def fdrSegmentsOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val hArm = duckKeyHash("user_id", "exp1")
    val hPerm = duckKeyHash("id || ':' || CAST(pb AS VARCHAR)", "perm1")
    s"""
      WITH u0 AS (SELECT event_type AS g, user_id, count(*) AS v
                  FROM events GROUP BY 1, 2),
      base AS (SELECT g, CAST(user_id AS VARCHAR) AS id,
                      CASE WHEN $hArm < $b THEN 'a' ELSE 'b' END AS arm,
                      CAST(v AS BIGINT) AS v
               FROM u0),
      obs AS (SELECT g,
                     CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS na,
                     CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS nb,
                     CAST(coalesce(sum(v) FILTER (WHERE arm = 'a'), 0) AS BIGINT) AS sa,
                     CAST(coalesce(sum(v) FILTER (WHERE arm = 'b'), 0) AS BIGINT) AS sb
              FROM base GROUP BY g),
      ex AS (SELECT g, id, v, pb FROM base
             CROSS JOIN (SELECT unnest(range(1, 101)) AS pb)),
      pu AS (SELECT ex.g, ex.v, ex.pb,
                    ((CAST($hPerm AS DOUBLE) + 0.5) / 1152921504606846976.0)
                      < (CAST(obs.na AS DOUBLE)
                         / CAST(obs.na + obs.nb AS DOUBLE)) AS pa
             FROM ex JOIN obs ON ex.g = obs.g),
      pg AS (SELECT g, pb,
                    CAST(coalesce(sum(v) FILTER (WHERE pa), 0) AS BIGINT) AS psa,
                    CAST(coalesce(sum(v) FILTER (WHERE NOT pa), 0) AS BIGINT) AS psb,
                    count(*) FILTER (WHERE pa) AS pna,
                    count(*) FILTER (WHERE NOT pa) AS pnb
             FROM pu GROUP BY g, pb),
      pd AS (SELECT g, CAST(psb AS DOUBLE) / CAST(pnb AS DOUBLE)
                      - CAST(psa AS DOUBLE) / CAST(pna AS DOUBLE) AS pdiff
             FROM pg WHERE pna > 0 AND pnb > 0),
      agg AS (SELECT pd.g, count(*) AS used,
                     count(*) FILTER (WHERE abs(pdiff) >=
                       abs(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                           - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))) AS ge
              FROM pd JOIN obs ON pd.g = obs.g GROUP BY pd.g),
      tests AS (SELECT obs.g AS event_type, obs.na AS n_a, obs.nb AS n_b,
                       CASE WHEN obs.na > 0 AND obs.nb > 0
                            THEN CAST(floor((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                                   - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                                   * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                       END AS diff_obs,
                       CAST(coalesce(agg.used, 0) AS BIGINT) AS reps,
                       CASE WHEN obs.na > 0 AND obs.nb > 0 AND agg.used IS NOT NULL
                            THEN CAST(floor(CAST(agg.ge + 1 AS DOUBLE)
                                   / CAST(agg.used + 1 AS DOUBLE)
                                   * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                       END AS p_value
                FROM obs LEFT JOIN agg ON obs.g = agg.g),
      ranked AS (SELECT *,
                        CAST(count(*) OVER () AS BIGINT) AS m,
                        CAST(row_number() OVER (ORDER BY p_value, event_type)
                          AS BIGINT) AS rank
                 FROM tests WHERE p_value IS NOT NULL),
      adj AS (SELECT *,
                     CAST(floor(least(1.0,
                         min(p_value * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE))
                           OVER (ORDER BY rank
                                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS p_adj
              FROM ranked)
      SELECT event_type, n_a, n_b, diff_obs, reps, p_value, m, rank, p_adj,
             (p_adj <= 0.1) AS reject
      FROM adj ORDER BY event_type"""
  }

  /** The q203 hashed-linear quality-score CTE chain (sigmoid over the
    * md5-bucketed token weights, rounded to 1e-4), ending at
    * `sc (doc_id, lang, s)` — shared by the reliability card and the
    * q255 Brier decomposition so both gates score the SAME model. */
  def qualityScoreCtes: String =
    s"""toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      wv AS (SELECT [${qualityWeights.mkString(", ")}] AS wl),
      sc AS (SELECT doc_id, lang,
               round(1.0 / (1.0 + exp(-(
                 list_reduce(
                   list_prepend(CAST(-0.5 AS DOUBLE),
                     list_transform(w, t -> wl[
                       CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64 AS INTEGER) + 1])),
                   (acc, x) -> acc + x)))), 4) AS s
             FROM toks CROSS JOIN wv)"""

  /** q255's oracle: the shared score chain, reliabilityCard's 1e-7 snap
    * and clamped binning, per-row/per-bin terms 1e-9-quantized then
    * decimal-summed — the operator's Murphy decomposition verbatim. */
  def brierOracle: String = s"""
      WITH $qualityScoreCtes,
      b AS (SELECT least(greatest(CAST(floor(s * 10) AS BIGINT), 0), 9) AS bin,
                   CAST(floor(s * 10000000.0 + 0.5) AS BIGINT) AS c7,
                   CAST(CAST(floor(s * 10000000.0 + 0.5) AS BIGINT) AS DOUBLE)
                     / 10000000.0 AS p,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM sc),
      pb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(c7) AS BIGINT) AS s7,
                    CAST(sum(y) AS BIGINT) AS pos,
                    CAST(sum(CAST(CAST(floor((p - y) * (p - y) * 1000000000.0 + 0.5)
                        AS DOUBLE) / 1000000000.0 AS DECIMAL(18,9)))
                      AS DECIMAL(38,9)) AS ssq
             FROM b GROUP BY bin),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS gpos,
                     CAST(sum(ssq) AS DECIMAL(38,9)) AS gssq
              FROM pb),
      bt AS (SELECT
               CAST(sum(CAST(CAST(floor(CAST(pb.n AS DOUBLE)
                     * (CAST(s7 AS DOUBLE) / 10000000.0 / CAST(pb.n AS DOUBLE)
                        - CAST(pos AS DOUBLE) / CAST(pb.n AS DOUBLE))
                     * (CAST(s7 AS DOUBLE) / 10000000.0 / CAST(pb.n AS DOUBLE)
                        - CAST(pos AS DOUBLE) / CAST(pb.n AS DOUBLE))
                     * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                   AS DECIMAL(18,9))) AS DECIMAL(38,9)) AS srel,
               CAST(sum(CAST(CAST(floor(CAST(pb.n AS DOUBLE)
                     * (CAST(pos AS DOUBLE) / CAST(pb.n AS DOUBLE)
                        - CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE))
                     * (CAST(pos AS DOUBLE) / CAST(pb.n AS DOUBLE)
                        - CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE))
                     * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                   AS DECIMAL(18,9))) AS DECIMAL(38,9)) AS sres
             FROM pb CROSS JOIN tot)
      SELECT tot.n,
             CAST(floor(CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS base_rate,
             CAST(floor(CAST(gssq AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS brier,
             CAST(floor(CAST(srel AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS reliability,
             CAST(floor(CAST(sres AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS resolution,
             CAST(floor(CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * (1.0 - CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE))
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS uncertainty
      FROM tot CROSS JOIN bt"""

  /** q256's oracle: the shared score chain + the PAV minimax closed form
    * `iso(i) = max_{j≤i} min_{k≥i} mean(y, j..k)` — every mean one
    * exact-integer division off cumulative prefixes, B³ enumeration on
    * the bins-sized grid. */
  /** The q256 PAV chain (binning → cumulative prefixes → minimax),
    * ending at `iso (bin, iso)` over `cum (bin, n, pos, …)` — shared by
    * the isotonic gate and the q257 calibrated-Brier composition. */
  def isotonicCtes: String = """b AS (SELECT least(greatest(CAST(floor(s * 10) AS BIGINT), 0), 9) AS bin,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM sc),
      bb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
             FROM b GROUP BY bin),
      cum AS (SELECT bin, n, pos,
                     CAST(sum(n) OVER wc AS BIGINT) AS cn,
                     CAST(sum(pos) OVER wc AS BIGINT) AS cp
              FROM bb
              WINDOW wc AS (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      jk AS (SELECT j.bin AS j, k.bin AS k,
                    CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
                      / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS m
             FROM cum j JOIN cum k ON j.bin <= k.bin),
      mn2 AS (SELECT i.bin, jk.j, min(jk.m) AS mm
              FROM cum i JOIN jk ON jk.j <= i.bin AND jk.k >= i.bin
              GROUP BY i.bin, jk.j),
      iso AS (SELECT bin, max(mm) AS iso FROM mn2 GROUP BY bin)"""

  def isotonicOracle: String = s"""
      WITH $qualityScoreCtes,
      $isotonicCtes
      SELECT cum.bin, cum.n,
             CAST(floor(CAST(pos AS DOUBLE) / CAST(cum.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS frac_pos,
             CAST(floor(iso.iso * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS iso
      FROM cum JOIN iso USING (bin) ORDER BY bin"""

  /** q257's oracle: the raw leg IS q255's oracle as a derived table; the
    * calibrated leg reuses the shared PAV chain and computes per-bin
    * Σ(p−y)² in closed form with iso first snapped to the operator
    * output's 1e-6 grid. */
  def calibratedBrierOracle: String = s"""
      WITH $qualityScoreCtes,
      $isotonicCtes,
      ct AS (SELECT cum.n,
                    CAST(CAST(floor((CAST(cum.n AS DOUBLE)
                          * (CAST(floor(iso.iso * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
                          * (CAST(floor(iso.iso * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
                        - 2.0 * (CAST(floor(iso.iso * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
                          * CAST(cum.pos AS DOUBLE)
                        + CAST(cum.pos AS DOUBLE))
                        * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                      AS DECIMAL(18,9)) AS t
             FROM cum JOIN iso USING (bin)),
      cal AS (SELECT CAST(floor(CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
                  / CAST(sum(n) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
                / 1000000.0 AS brier_cal
              FROM ct)
      SELECT r.n, r.brier AS brier_raw, r.reliability AS reliability_raw,
             cal.brier_cal
      FROM ($brierOracle) r CROSS JOIN cal"""

  /** q258's oracle: the shared score chain + the hashSplit hash as a
    * boolean train flag, ONE (tr, bin) stats CTE (counts, positives, and
    * the 1e-9-quantized decimal raw-Brier sums), the q256 PAV chain over
    * the TRAIN rows only, iso snapped to the published 1e-6 grid, and the
    * held-out side's calibrated sum in closed form with identity fallback
    * for bins the train map never saw. */
  def oosCalibrationOracle: String = {
    val bnd = Sampling.splitBoundaries(Seq("train" -> 0.5, "test" -> 0.5)).head._2
    val h = duckKeyHash("doc_id", "cal1")
    s"""
      WITH $qualityScoreCtes,
      b AS (SELECT least(greatest(CAST(floor(s * 10) AS BIGINT), 0), 9) AS bin,
                   CAST(CAST(floor(s * 10000000.0 + 0.5) AS BIGINT) AS DOUBLE)
                     / 10000000.0 AS p,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                   ($h < $bnd) AS tr
            FROM sc),
      st AS (SELECT tr, bin, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(y) AS BIGINT) AS pos,
                    CAST(sum(CAST(CAST(floor((p - y) * (p - y) * 1000000000.0 + 0.5)
                        AS DOUBLE) / 1000000000.0 AS DECIMAL(18,9)))
                      AS DECIMAL(38,9)) AS ssq
             FROM b GROUP BY tr, bin),
      tb AS (SELECT bin, n, pos FROM st WHERE tr),
      cum AS (SELECT bin, n, pos,
                     CAST(sum(n) OVER wc AS BIGINT) AS cn,
                     CAST(sum(pos) OVER wc AS BIGINT) AS cp
              FROM tb
              WINDOW wc AS (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      jk AS (SELECT j.bin AS j, k.bin AS k,
                    CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
                      / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS m
             FROM cum j JOIN cum k ON j.bin <= k.bin),
      mn2 AS (SELECT i.bin, jk.j, min(jk.m) AS mm
              FROM cum i JOIN jk ON jk.j <= i.bin AND jk.k >= i.bin
              GROUP BY i.bin, jk.j),
      iso AS (SELECT bin, CAST(floor(max(mm) * 1000000.0 + 0.5) AS DOUBLE)
                            / 1000000.0 AS iso
              FROM mn2 GROUP BY bin),
      ntr AS (SELECT coalesce(CAST(sum(n) AS BIGINT), CAST(0 AS BIGINT)) AS n_train
              FROM tb),
      te AS (SELECT st.n, st.pos, st.ssq, iso.iso
             FROM st LEFT JOIN iso USING (bin) WHERE NOT tr),
      ct AS (SELECT n, ssq,
                    CASE WHEN iso IS NOT NULL
                      THEN CAST(CAST(floor((CAST(n AS DOUBLE) * iso * iso
                             - 2.0 * iso * CAST(pos AS DOUBLE)
                             + CAST(pos AS DOUBLE))
                           * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                         AS DECIMAL(38,9))
                      ELSE ssq END AS cal
             FROM te),
      ag AS (SELECT CAST(sum(n) AS BIGINT) AS n_test,
                    CAST(sum(ssq) AS DECIMAL(38,9)) AS sraw,
                    CAST(sum(cal) AS DECIMAL(38,9)) AS scal
             FROM ct)
      SELECT ntr.n_train, ag.n_test,
             CAST(floor(CAST(sraw AS DOUBLE) / CAST(n_test AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS brier_raw,
             CAST(floor(CAST(scal AS DOUBLE) / CAST(n_test AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS brier_cal
      FROM ag CROSS JOIN ntr"""
  }

  /** q253's oracle: q227's subject derivation + the hashSplit arm, then
    * the Mantel–Cox machinery — exact integer at-risk windows,
    * 1e-9-quantized O−E and V terms decimal-summed. */
  def logRankOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("user_id", "exp1")
    s"""
      WITH ev AS (SELECT user_id, event_type, CAST(ts AS DATE) AS dt FROM events
                  WHERE CAST(ts AS DATE) <= DATE '2024-01-03'),
      f AS (SELECT user_id, min(dt) AS start FROM ev GROUP BY user_id),
      p AS (SELECT user_id, min(dt) AS pd FROM ev WHERE event_type = 'purchase'
            GROUP BY user_id),
      subj AS (SELECT f.user_id,
                      CASE WHEN pd IS NOT NULL THEN date_diff('day', start, pd)
                           ELSE date_diff('day', start, DATE '2024-01-03') END AS t,
                      (pd IS NOT NULL) AS o
               FROM f LEFT JOIN p USING (user_id)),
      armed AS (SELECT (CASE WHEN $h < $b THEN TRUE ELSE FALSE END) AS ga, t, o
                FROM subj),
      pt AS (SELECT t,
                    CAST(count(*) FILTER (WHERE ga) AS BIGINT) AS xa,
                    CAST(count(*) FILTER (WHERE NOT ga) AS BIGINT) AS xb,
                    CAST(count(*) FILTER (WHERE ga AND o) AS BIGINT) AS da,
                    CAST(count(*) FILTER (WHERE NOT ga AND o) AS BIGINT) AS db
             FROM armed GROUP BY t),
      tot AS (SELECT CAST(count(*) FILTER (WHERE ga) AS BIGINT) AS n_a,
                     CAST(count(*) FILTER (WHERE NOT ga) AS BIGINT) AS n_b,
                     CAST(count(*) FILTER (WHERE ga AND o) AS BIGINT) AS events_a,
                     CAST(count(*) FILTER (WHERE NOT ga AND o) AS BIGINT) AS events_b
              FROM armed),
      w AS (SELECT pt.t, pt.da, pt.db,
                   n_a - coalesce(sum(xa) OVER wb, 0) AS ra,
                   n_b - coalesce(sum(xb) OVER wb, 0) AS rb
            FROM pt CROSS JOIN tot
            WINDOW wb AS (ORDER BY pt.t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      terms AS (SELECT
                  CAST(CAST(floor((CAST(da AS DOUBLE)
                        - (CAST(da AS DOUBLE) + CAST(db AS DOUBLE))
                          * CAST(ra AS DOUBLE)
                          / (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)))
                      * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                    AS DECIMAL(18,9)) AS ome,
                  CAST(CAST(floor((CASE WHEN CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE) > 1.0
                        THEN (CAST(da AS DOUBLE) + CAST(db AS DOUBLE))
                          * (CAST(ra AS DOUBLE)
                             / (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)))
                          * (1.0 - CAST(ra AS DOUBLE)
                             / (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)))
                          * (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)
                             - (CAST(da AS DOUBLE) + CAST(db AS DOUBLE)))
                          / (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE) - 1.0)
                        ELSE 0.0 END)
                      * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                    AS DECIMAL(18,9)) AS v
                FROM w WHERE da + db >= 1),
      s AS (SELECT CAST(sum(ome) AS DECIMAL(38,9)) AS osum,
                   CAST(sum(v) AS DECIMAL(38,9)) AS sv
            FROM terms)
      SELECT n_a, n_b, events_a, events_b,
             CAST(floor(CAST(coalesce(osum, CAST(0 AS DECIMAL(38,9))) AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS o_minus_e_a,
             CAST(floor(CAST(coalesce(sv, CAST(0 AS DECIMAL(38,9))) AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS var_sum,
             CASE WHEN coalesce(sv, CAST(0 AS DECIMAL(38,9))) > 0
                  THEN CAST(floor(CAST(osum AS DOUBLE) * CAST(osum AS DOUBLE)
                         / CAST(sv AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
                    / 1000000.0
             END AS chi2
      FROM tot CROSS JOIN s"""
  }

  /** q252's oracle: q174's histogram-quantile machinery grouped by the
    * hashSplit arm, then the a/b pivot and the exact-grid difference. */
  def qteOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("user_id", "exp1")
    s"""
      WITH u AS (SELECT user_id, count(*) AS v FROM events GROUP BY user_id),
      asg AS (SELECT CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS split, v FROM u),
      h AS (SELECT split,
                   ((greatest(CAST(0 AS BIGINT), least(CAST(1023 AS BIGINT),
                       CAST(v AS BIGINT)))) * 256) // 1024 AS bin,
                   count(*) AS cnt
            FROM asg GROUP BY split, bin),
      c AS (SELECT split, bin, cnt,
                   sum(cnt) OVER (PARTITION BY split ORDER BY bin
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum,
                   sum(cnt) OVER (PARTITION BY split) AS n
            FROM h),
      qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                            CAST(0.99 AS DOUBLE)]) AS q),
      hit AS (SELECT c.split, qs.q, c.bin, c.cnt,
                     qs.q * c.n AS target, c.cum - c.cnt AS before
              FROM c CROSS JOIN qs
              WHERE c.cum >= qs.q * c.n AND c.cum - c.cnt < qs.q * c.n),
      est AS (SELECT split, q,
                     CAST(floor((0 + (bin + (target - before) / cnt)
                           * (CAST(1024 AS DOUBLE) / 256))
                         * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS est
              FROM hit)
      SELECT a.q, a.est AS est_a, b.est AS est_b,
             CAST(floor((b.est - a.est) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS qte
      FROM est a JOIN est b ON a.q = b.q
      WHERE a.split = 'a' AND b.split = 'b'
      ORDER BY a.q"""
  }

  /** q248's oracle: the three single-row oracles (q230/q237/q235) as
    * CTE-bearing derived tables crossJoined — composition reuses the
    * EXACT per-leg SQL, so a scorecard divergence isolates to a leg. */
  def scorecardOracle: String =
    s"""
      SELECT ab.n_a, ab.n_b, ab.rate_a, ab.rate_b, ab.lift, ab.z_conv,
             ab.z_srm, ab.srm_flag,
             w.mean_a AS mean_eng_a, w.mean_b AS mean_eng_b,
             w.t_stat AS welch_t, w.df_welch,
             p.p_value AS perm_p
      FROM ($abReadoutOracle) ab
      CROSS JOIN ($welchOracle) w
      CROSS JOIN ($permutationOracle) p"""

  /** q235's oracle: the hashSplit arm boundary + the permutation coin on
    * the same salted grid, mirrored end to end. */
  def permutationOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val hArm = duckKeyHash("user_id", "exp1")
    val hPerm = duckKeyHash("id || ':' || CAST(pb AS VARCHAR)", "perm1")
    s"""
      WITH u0 AS (SELECT user_id, count(*) AS v FROM events GROUP BY user_id),
      base AS (SELECT CAST(user_id AS VARCHAR) AS id,
                      CASE WHEN $hArm < $b THEN 'a' ELSE 'b' END AS arm,
                      CAST(v AS BIGINT) AS v
               FROM u0),
      obs AS (SELECT CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS na,
                     CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS nb,
                     CAST(coalesce(sum(v) FILTER (WHERE arm = 'a'), 0) AS BIGINT) AS sa,
                     CAST(coalesce(sum(v) FILTER (WHERE arm = 'b'), 0) AS BIGINT) AS sb
              FROM base),
      ex AS (SELECT id, v, pb FROM base
             CROSS JOIN (SELECT unnest(range(1, 201)) AS pb)),
      pu AS (SELECT v, pb,
                    ((CAST($hPerm AS DOUBLE) + 0.5) / 1152921504606846976.0)
                      < (CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE)) AS pa
             FROM ex CROSS JOIN obs),
      pg AS (SELECT pb,
                    CAST(coalesce(sum(v) FILTER (WHERE pa), 0) AS BIGINT) AS psa,
                    CAST(coalesce(sum(v) FILTER (WHERE NOT pa), 0) AS BIGINT) AS psb,
                    count(*) FILTER (WHERE pa) AS pna,
                    count(*) FILTER (WHERE NOT pa) AS pnb
             FROM pu GROUP BY pb),
      pd AS (SELECT CAST(psb AS DOUBLE) / CAST(pnb AS DOUBLE)
                      - CAST(psa AS DOUBLE) / CAST(pna AS DOUBLE) AS pdiff
             FROM pg WHERE pna > 0 AND pnb > 0),
      agg AS (SELECT count(*) AS used,
                     count(*) FILTER (WHERE abs(pdiff) >=
                       abs(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                           - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))) AS ge
              FROM pd CROSS JOIN obs)
      SELECT na AS n_a, nb AS n_b,
             CAST(floor(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_a,
             CAST(floor(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_b,
             CAST(floor((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                         - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS diff_obs,
             CAST(used AS BIGINT) AS reps,
             CAST(floor(CAST(ge + 1 AS DOUBLE) / CAST(used + 1 AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS p_value
      FROM obs CROSS JOIN agg"""
  }

  /** q92's weight vector, shared verbatim between the Spark call and the
    * oracle's list literal so both engines fold the SAME doubles. */
  // package-visible so ScaleSmoke can drive the SAME scorer it gates
  val qualityWeights: Seq[Double] =
    (0 until 64).map(i => ((i * 37) % 21 - 10) / 10.0)

  def clusterSplitOracle: String = {
    val whens = Sampling
      .splitBoundaries(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .map { case (label, b) => s"WHEN ${duckKeyHash("cc.cluster_id", "csp")} < $b THEN '$label'" }
      .mkString(" ")
    s"""
      WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs),
      walk(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src),
      cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id)
      SELECT cc.doc_id, CASE $whens ELSE 'test' END AS split
      FROM cc ORDER BY cc.doc_id"""
  }

  def spanCorruptionOracle: String = {
    val thr = Sampling.threshold(0.08)
    // positions are 1-based; list_slice is INCLUSIVE-end in DuckDB, so the
    // span window at p is list_slice(s, greatest(p-2, 1), p) for L=3 —
    // matching Spark's slice(start, p - start + 1)
    s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      st AS (SELECT doc_id, w,
               [CASE WHEN CAST(concat('0x', substring(md5(
                      'sc1' || CAST(doc_id AS VARCHAR) || '#' || CAST(p AS VARCHAR)), 1, 15))
                      AS BIGINT) < $thr THEN 1 ELSE 0 END
                for p in range(1, len(w) + 1)] AS s
             FROM toks),
      mk AS (SELECT doc_id, w,
               [CASE WHEN list_max(list_slice(s, greatest(p - 2, 1), p)) = 1
                     THEN 1 ELSE 0 END
                for p in range(1, len(s) + 1)] AS m
             FROM st),
      built AS (
        SELECT doc_id,
               coalesce(array_to_string(
                 [CASE WHEN m[p] = 0 THEN w[p] ELSE '<MASK>' END
                  for p in range(1, len(w) + 1)
                  if m[p] = 0 OR p = 1 OR m[p - 1] = 0], ' '), '') AS input,
               coalesce(array_to_string(
                 [CASE WHEN p = 1 OR m[p - 1] = 0 THEN '<SEP> ' || w[p] ELSE w[p] END
                  for p in range(1, len(w) + 1)
                  if m[p] = 1], ' '), '') AS tgt,
               list_sum(m) AS n_masked
        FROM mk)
      SELECT doc_id, input,
             CASE WHEN len(tgt) = 0 THEN '' ELSE substring(tgt, 7) END AS target,
             CAST(coalesce(n_masked, 0) AS INTEGER) AS n_masked
      FROM built ORDER BY doc_id"""
  }

  /** q128: per-column profile with the q110 HLL chain generated per column
    * (p=6 -> 64 buckets, 54 w-bits, rank base 55) — registers rebuilt
    * exactly, plus string-form min/max and null counts. */
  /** q209's oracle is GENERATED: the q128 HLL re-derivation runs once per
    * vintage (prefixed CTE blocks), then the same full-outer drift join. */
  def profileDriftOracle: String = {
    def sideSql(cols: Seq[String], from: String, pre: String): String = {
      val hUnion = cols.map(c =>
        s"""SELECT '$c' AS "column",
               CAST(concat('0x', substring(md5('pd9' || CAST($c AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
            FROM $from AS src WHERE $c IS NOT NULL""").mkString(" UNION ALL ")
      val bUnion = cols.map(c =>
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
            FROM $from AS src""").mkString(" UNION ALL ")
      s"""${pre}h AS ($hUnion),
        ${pre}basic AS ($bUnion),
        ${pre}parts AS (SELECT "column", hv >> 54 AS bucket, hv & ${(1L << 54) - 1} AS w FROM ${pre}h),
        ${pre}ranks AS (SELECT "column", bucket,
                CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rank FROM ${pre}parts),
        ${pre}regs AS (SELECT "column", bucket, max(rank) AS reg FROM ${pre}ranks GROUP BY 1, 2),
        ${pre}agg AS (SELECT "column", sum(1::BIGINT << (55 - reg)) AS z_occ, count(*) AS occ
                FROM ${pre}regs GROUP BY 1),
        ${pre}est AS (SELECT "column",
                CAST(z_occ + (64 - occ) * (1::BIGINT << 55) AS DOUBLE) AS z,
                64 - occ AS zeros FROM ${pre}agg),
        ${pre}raws AS (SELECT "column", ${Sketches.hllAlpha(64) * 64 * 64} * ${(1L << 55).toDouble} / z AS raw, zeros
                 FROM ${pre}est),
        ${pre}prof AS (SELECT b."column", b.n_rows, b.n_nulls,
                round(CASE WHEN raw <= 160.0 AND zeros > 0
                           THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS de
             FROM ${pre}basic b JOIN ${pre}raws USING ("column"))"""
    }
    val oldFrom = "(SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0)"
    val newFrom = "(SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang, source FROM documents WHERE doc_id % 2 = 1)"
    s"""
      WITH ${sideSql(Seq("doc_id", "lang", "n_chars"), oldFrom, "o")},
      ${sideSql(Seq("doc_id", "lang", "source"), newFrom, "nn")}
      SELECT "column",
             CASE WHEN o.n_rows IS NULL THEN 'added'
                  WHEN nn.n_rows IS NULL THEN 'removed'
                  ELSE 'common' END AS status,
             o.n_rows AS old_rows, nn.n_rows AS new_rows,
             CAST(floor((coalesce(CAST(nn.n_nulls AS DOUBLE) / CAST(nn.n_rows AS DOUBLE), 0.0)
                         - coalesce(CAST(o.n_nulls AS DOUBLE) / CAST(o.n_rows AS DOUBLE), 0.0))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS null_frac_delta,
             CASE WHEN o.de > 0
                  THEN CAST(floor(nn.de / o.de * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS distinct_ratio
      FROM oprof o FULL OUTER JOIN nnprof nn USING ("column")
      ORDER BY "column""""
  }

  def tableProfileOracle: String = {
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val hUnion = cols.map(c =>
      s"""SELECT '$c' AS "column",
                 CAST(concat('0x', substring(md5('prof9' || CAST($c AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM documents WHERE $c IS NOT NULL""").mkString("\n          UNION ALL\n")
    val bUnion = cols.map(c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 min(CAST($c AS VARCHAR)) AS min_str, max(CAST($c AS VARCHAR)) AS max_str
          FROM documents""").mkString("\n          UNION ALL\n")
    s"""
      WITH h AS ($hUnion),
      basic AS ($bUnion),
      parts AS (SELECT "column", hv >> 54 AS bucket, hv & ${(1L << 54) - 1} AS w FROM h),
      ranks AS (SELECT "column", bucket,
              CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rank FROM parts),
      regs AS (SELECT "column", bucket, max(rank) AS reg FROM ranks GROUP BY 1, 2),
      agg AS (SELECT "column", sum(1::BIGINT << (55 - reg)) AS z_occ, count(*) AS occ
              FROM regs GROUP BY 1),
      est AS (SELECT "column",
              CAST(z_occ + (64 - occ) * (1::BIGINT << 55) AS DOUBLE) AS z,
              64 - occ AS zeros FROM agg),
      raws AS (SELECT "column", ${Sketches.hllAlpha(64) * 64 * 64} * ${(1L << 55).toDouble} / z AS raw, zeros
               FROM est)
      SELECT b."column", b.n_rows, b.n_nulls, b.min_str, b.max_str,
             round(CASE WHEN raw <= 160.0 AND zeros > 0
                        THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS distinct_est,
             CAST(zeros AS INTEGER) AS zero_regs
      FROM basic b JOIN raws USING ("column") ORDER BY b."column""""
  }

  def sampleQuantilesOracle: String =
    s"""WITH s AS (SELECT n_chars FROM documents
                   ORDER BY ${duckKeyHash("doc_id", "bk1")}, doc_id LIMIT 100),
        l AS (SELECT list(n_chars ORDER BY n_chars) AS ls, count(*) AS n FROM s),
        qs AS (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS quantile)
        SELECT quantile, ls[CAST(floor(quantile * (n - 1)) AS INTEGER) + 1] AS value
        FROM qs CROSS JOIN l ORDER BY quantile"""

  def groupSampleOracle: String =
    s"""SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 rank() OVER (PARTITION BY lang
                              ORDER BY ${duckKeyHash("doc_id", "gs1")}) AS r
          FROM documents)
        WHERE r <= 20 ORDER BY doc_id"""

  def bottomKSampleOracle: String =
    s"""SELECT doc_id FROM (
          SELECT doc_id FROM documents
          ORDER BY ${duckKeyHash("doc_id", "bk1")}, doc_id LIMIT 100)
        ORDER BY doc_id"""

  def hashSampleOracle: String =
    s"""SELECT doc_id, text FROM documents
        WHERE ${duckKeyHash("doc_id", "s1")} < ${Sampling.threshold(0.2)}
        ORDER BY doc_id"""

  /** q190's oracle: the SAME salted hash gate applied independently to each
    * table's user key — coordination is a property of the predicate, not
    * of any shared state, which is exactly what the query demonstrates. */
  def coordinatedSampleOracle: String =
    s"""
      WITH ev AS (SELECT user_id, count(*) AS n_events FROM events
                  WHERE ${duckKeyHash("user_id", "coord")} < ${Sampling.threshold(0.1)}
                  GROUP BY user_id),
      ord AS (SELECT o_custkey AS user_id, count(*) AS n_orders FROM orders
              WHERE ${duckKeyHash("o_custkey", "coord")} < ${Sampling.threshold(0.1)}
              GROUP BY o_custkey)
      SELECT coalesce(ev.user_id, ord.user_id) AS user_id,
             CAST(coalesce(ev.n_events, 0) AS BIGINT) AS n_events,
             CAST(coalesce(ord.n_orders, 0) AS BIGINT) AS n_orders
      FROM ev FULL OUTER JOIN ord ON ev.user_id = ord.user_id
      ORDER BY user_id"""

  def hashSplitOracle: String = {
    // identical cumulative boundaries as the implementation (shared float
    // accumulation — see Sampling.splitBoundaries)
    val whens = Sampling
      .splitBoundaries(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .map { case (label, b) => s"WHEN ${duckKeyHash("doc_id", "sp")} < $b THEN '$label'" }
      .mkString(" ")
    s"""SELECT doc_id, CASE $whens ELSE 'test' END AS split
        FROM documents ORDER BY doc_id"""
  }

  def stratifiedSampleOracle: String =
    s"""SELECT event_id, event_type FROM events
        WHERE ${duckKeyHash("event_id", "st")} <
              CASE event_type WHEN 'error' THEN ${Sampling.threshold(0.05)}
                              WHEN 'purchase' THEN ${Sampling.threshold(1.0)}
                              WHEN 'click' THEN ${Sampling.threshold(0.25)}
                              ELSE ${Sampling.threshold(0.5)} END
        ORDER BY event_id"""

  def mixCorporaOracle: String =
    s"""SELECT doc_id, source FROM (
          SELECT doc_id, 'even' AS source FROM documents
          WHERE doc_id % 2 = 0
            AND ${duckKeyHash("doc_id", "mx/even")} < ${Sampling.threshold(0.5)}
          UNION ALL
          SELECT doc_id, 'odd' AS source FROM documents
          WHERE doc_id % 2 = 1
            AND ${duckKeyHash("doc_id", "mx/odd")} < ${Sampling.threshold(0.25)})
        ORDER BY doc_id"""

  /** Same chunk geometry as the q56 Spark side: stride 24, window 32,
    * last start = the largest stride multiple strictly below len. */
  def chunkingOracle: String = {
    val (chunk, stride) = (32, 24)
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        st AS (
          SELECT doc_id, w, len(w) AS n,
                 unnest(range(0, greatest(0, (len(w) - ${chunk - stride} - 1) // $stride) * $stride + 1, $stride)) AS s
          FROM toks)
        SELECT doc_id,
               CAST(s // $stride AS INTEGER) AS chunk_idx,
               CAST(greatest(0, (n - ${chunk - stride} - 1) // $stride) + 1 AS INTEGER) AS n_chunks,
               CAST(least(s + $chunk, n) - s AS INTEGER) AS chunk_tokens,
               array_to_string(list_slice(w, s + 1, least(s + $chunk, n)), ' ') AS chunk
        FROM st ORDER BY doc_id, chunk_idx"""
  }

  /** q60: the q56 chunk geometry, then ONE global running token total
    * (exclusive) and integer division by the pack capacity — the serial
    * definition the distributed two-phase prefix sum must reproduce. */
  def packingOracle: String = {
    val (chunk, stride, capacity) = (32, 24, 512)
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        st AS (
          SELECT doc_id, w, len(w) AS n,
                 unnest(range(0, greatest(0, (len(w) - ${chunk - stride} - 1) // $stride) * $stride + 1, $stride)) AS s
          FROM toks),
        ch AS (
          SELECT doc_id,
                 CAST(s // $stride AS INTEGER) AS chunk_idx,
                 CAST(least(s + $chunk, n) - s AS INTEGER) AS chunk_tokens
          FROM st),
        cum AS (
          SELECT doc_id, chunk_idx, chunk_tokens,
                 sum(chunk_tokens) OVER (ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - chunk_tokens AS prev
          FROM ch)
        SELECT doc_id, chunk_idx, chunk_tokens,
               CAST(prev // $capacity AS BIGINT) AS pack_id
        FROM cum ORDER BY doc_id, chunk_idx"""
  }

  /** Same planted PII and the same RE2-compatible patterns as q57's Spark
    * side; DuckDB needs the explicit 'g' flag for replace-all. */
  def piiOracle: String = {
    val email = graft.operators.TextAnalysis.EmailPattern
    val ip = graft.operators.TextAnalysis.Ipv4Pattern
    val phone = graft.operators.TextAnalysis.PhonePattern
    s"""WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com at 10.0.' ||
                 (doc_id % 256) || '.7 or 555-' ||
                 lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-1234' AS text
          FROM documents)
        , staged AS (
          SELECT doc_id, text,
                 regexp_replace(text, '$email', '<EMAIL>', 'g') AS after_email
          FROM aug),
        staged2 AS (
          SELECT doc_id, text, after_email,
                 regexp_replace(after_email, '$phone', '<PHONE>', 'g') AS after_phone
          FROM staged)
        SELECT doc_id,
               regexp_replace(after_phone, '$ip', '<IP>', 'g') AS redacted,
               CAST(len(regexp_extract_all(text, '$email')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(after_phone, '$ip')) AS INTEGER) AS n_ips,
               CAST(len(regexp_extract_all(after_email, '$phone')) AS INTEGER) AS n_phones
        FROM staged2 ORDER BY doc_id"""
  }

  /** doc_id-derived URL planting shared by q63/q64 (mirrored literally in
    * their oracle SQL): most docs get a mod-20 example.com URL, every third
    * doc also a mod-5 bad.net URL, every eleventh doc none at all. */
  def plantUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 11 === 0, lit(""))
          .otherwise(concat(
            lit(" see https://site"), (col("doc_id") % 20).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string"))),
        when(col("doc_id") % 3 === 0,
          concat(lit(" http://blocked"), (col("doc_id") % 5).cast("string"),
            lit(".bad.net/x")))
          .otherwise(lit(""))).as("text"))

  /** The same construction in DuckDB SQL, as a CTE body over `documents`. */
  val urlAugSql = """
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 11 = 0 THEN ''
                     ELSE ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                          || '.example.com/p/' || CAST(doc_id AS VARCHAR) END
             || CASE WHEN doc_id % 3 = 0
                     THEN ' http://blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net/x'
                     ELSE '' END AS text
      FROM documents"""

  /** Shared CTE prefix for q131/q132: one unrolled PQ training iteration
    * (m=4 subspaces × ksub=4 codes × dsub=16 dims, lowest-id init) with
    * the assignment argmin on round(‖x‖²−2x·c+‖c‖², 6) and lowest-code
    * ties — the exact Similarity.pqTrain rule. `a2` is the post-training
    * assignment (= Similarity.pqEncode against the trained books). */
  val pqCtes = """
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ss AS (SELECT unnest(range(0, 4)) AS s),
      dims AS (SELECT unnest(range(1, 17)) AS i),
      subs AS (SELECT vec_id, s, v[s*16+1 : s*16+16] AS sv FROM e CROSS JOIN ss),
      c0 AS (SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code,
                    sv AS cv
             FROM subs WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4)),
      a1 AS (SELECT vec_id, s, code FROM (
               SELECT sub.vec_id, sub.s, c.code,
                      row_number() OVER (PARTITION BY sub.vec_id, sub.s
                        ORDER BY round(list_dot_product(sub.sv, sub.sv)
                              - 2 * list_dot_product(sub.sv, c.cv)
                              + list_dot_product(c.cv, c.cv), 6), c.code) AS rn
               FROM subs sub JOIN c0 c ON sub.s = c.s) WHERE rn = 1),
      m1 AS (SELECT a.s, a.code, d.i, avg(sub.sv[d.i]) AS x
             FROM a1 a JOIN subs sub ON a.vec_id = sub.vec_id AND a.s = sub.s
                  CROSS JOIN dims d
             GROUP BY a.s, a.code, d.i),
      c1 AS (SELECT c0.s, c0.code, coalesce(mm.cv, c0.cv) AS cv
             FROM c0 LEFT JOIN (SELECT s, code, list(x ORDER BY i) AS cv
                                FROM m1 GROUP BY s, code) mm
                  ON c0.s = mm.s AND c0.code = mm.code),
      a2 AS (SELECT vec_id, s, code FROM (
               SELECT sub.vec_id, sub.s, c.code,
                      row_number() OVER (PARTITION BY sub.vec_id, sub.s
                        ORDER BY round(list_dot_product(sub.sv, sub.sv)
                              - 2 * list_dot_product(sub.sv, c.cv)
                              + list_dot_product(c.cv, c.cv), 6), c.code) AS rn
               FROM subs sub JOIN c1 c ON sub.s = c.s) WHERE rn = 1)"""

  /** q133's bit-interleave, generated from the same bits=8 constant as the
    * Spark side so both engines compute the identical Morton formula. */
  val zInterleaveSql: String =
    (0 until 8).flatMap(i => Seq(
      s"(((bx >> $i) & 1) * ${1L << (2 * i)})",
      s"(((by >> $i) & 1) * ${1L << (2 * i + 1)})")).mkString(" + ")

}
