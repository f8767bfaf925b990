package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-command 100×-rehearsal (r16 verdict #7): the full curation
  * composition — metric gates → line+exact+near dedup → substring strip →
  * decontamination → PII scrub → chunk → split → pack
  * ([[graft.examples.TrainingDataPipeline.curate]], every opt-in leg ON) —
  * plus the embedding-hygiene legs (auto-sized LSH near-dup, AutoK
  * k-means + SemDeDup), run END TO END against a ×`mult`
  * structure-preserving widening of the bench corpus
  * ([[ScaleProbe]]'s realistic widening; ×10 of sf0.1 ≈ sf1.0-equivalent
  * rows) with the r17 AUTO knobs doing the sizing. The closest a
  * local[32] box gets to a deployment rehearsal: wall time, output rows,
  * and the executor-side pressure counters (shuffle read/write, spill,
  * peak per-task execution memory) recorded per stage.
  *
  * `runMain graft.tools.Rehearsal [sfDir] [outJson] [mult]`
  * → one JSON object (committed as REHEARSAL_r{N}.json per round).
  */
object Rehearsal {

  /** Cumulative task-metric counters — deltas between stage boundaries
    * give per-stage shuffle/spill totals; peak is max over tasks. */
  private class MetricsListener extends SparkListener {
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    @volatile var peakExecMem = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) synchronized {
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
        peakExecMem = math.max(peakExecMem, m.peakExecutionMemory)
      }
    }
    def snapshot: (Long, Long, Long, Long, Long) =
      synchronized((shuffleRead, shuffleWrite, memSpill, diskSpill, peakExecMem))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.drop(1).headOption.getOrElse("/tmp/rehearsal.json")
    val mult = args.drop(2).headOption.map(_.toInt).getOrElse(10)

    val spark = GraftSession.local("graft-rehearsal")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val load0 = osBean.getSystemLoadAverage

    val work = java.nio.file.Files.createTempDirectory("graft-rehearsal").toString
    ScaleProbe.buildDir(spark, sfDir, s"$work/x$mult", mult)
    println(s"[rehearsal] built x$mult corpus under $work")

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // each stage WRITES its output (the deployment shape — a count() would
    // let Catalyst prune the payload columns and under-measure); the row
    // count is read back from the files on the untimed side
    def stage(name: String)(body: => DataFrame): Long = {
      val before = listener.snapshot
      val t0 = System.nanoTime()
      val outDir = s"$work/out_$name"
      body.write.mode("overwrite").parquet(outDir)
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(outDir).count()
      val after = listener.snapshot
      def mb(b: Long) = f"${b / 1048576.0}%.1f"
      stages(name) =
        s"""{"sec":${f"$sec%.2f"},"rows_out":$rows,""" +
          s""""shuffle_read_mb":${mb(after._1 - before._1)},""" +
          s""""shuffle_write_mb":${mb(after._2 - before._2)},""" +
          s""""spill_mem_mb":${mb(after._3 - before._3)},""" +
          s""""spill_disk_mb":${mb(after._4 - before._4)},""" +
          s""""peak_task_exec_mem_mb":${mb(after._5)}}"""
      println(s"[rehearsal] $name: ${f"$sec%.2f"} s, $rows rows -> ${stages(name)}")
      rows
    }

    val dir = s"$work/x$mult"
    // LANGUAGE-PRESERVING widening for the curation chain: ScaleProbe's
    // all-token rename is right for the dedup/similarity operators (they
    // treat tokens as opaque) but semantically wrong for a curation
    // rehearsal — renamed copies stop being "English" and the language
    // gate (correctly) drops 9/10 of the corpus, measuring the gate, not
    // the pipeline. Here copy i renames every token EXCEPT the language
    // profiles' stopwords: detection profiles are untouched per copy,
    // quality/repetition structure is exactly the original's (bijective
    // rename), and cross-copy near-dup shingles need >= 3 CONSECUTIVE
    // stopwords — so a x10 corpus still means 10x the dedup clusters.
    val stop = graft.operators.TextAnalysis.stopwordProfiles.values.flatten.toSeq.distinct
    val base = Tables.documents(spark, sfDir).select(col("doc_id").cast("long"), col("text"))
    val docs = (0 until mult).map { i =>
      if (i == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L))
        .withColumn("text", array_join(transform(split(col("text"), " "),
          t => when(t.isin(stop: _*) || t === "", t)
            .otherwise(concat(lit(s"c${i}_"), t))), " "))
    }.reduce(_ unionByName _)
    docs.write.mode("overwrite").parquet(s"$work/documents_curation.parquet")
    val curationDocs = spark.read.parquet(s"$work/documents_curation.parquet")
    val docsIn = curationDocs.count()

    // benchmark corpus for the decontamination leg: the ×1 corpus's texts
    // (every widened copy of them must flag and drop — the worst case for
    // the leakage gate's n-gram probe)
    val bench = Tables.documents(spark, sfDir).select(col("text")).limit(200)

    // ---- crawl ingest: shard BYTES -> text through the q341 path ----
    // (r17 continuation): the rehearsal starts where a deployment starts
    // — record-at-time-gzipped WARC shards — and the curation chain
    // consumes the RECOVERED text (byte-exact with the source, the q341
    // gate's guarantee), so the ingest legs' wall time and pressure
    // counters are part of the record. Scan-shaped by construction:
    // synthesis, member walk, HTTP split, and HTML extraction fuse into
    // one zero-shuffle pipeline; the only exchange is the output write.
    val shardIds = curationDocs.select(col("doc_id").as("media_id"), col("text"),
      (lit(1) + pmod(col("doc_id"), lit(5))).cast("int").as("n_nav"))
    stage("ingest_warc_html")(
      graft.operators.Multimodal.htmlExtract(
        graft.operators.Multimodal.warcResponseBody(
          graft.operators.Multimodal.syntheticWarcHtmlShards(shardIds)
            .select(col("media_id"), col("content")),
          "content").select(col("media_id"), col("html")), "html")
        .select(col("media_id").as("doc_id"), col("text")))
    val ingested = spark.read.parquet(s"$work/out_ingest_warc_html")

    // ---- text curation: every leg of the composed pipeline ON,
    // consuming the INGESTED text ----
    stage("curate_full")(
      graft.examples.TrainingDataPipeline.curate(
        ingested, benchmark = Some(bench), lineDedupFirst = true, stripSubstrings = true))

    // ---- embedding hygiene at the AUTO knobs (r17 verdict #1) ----
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nEmb = emb.count()
    val autoBands = Similarity.sizedBandBits(nEmb, dim = 64)
    val autoK = Similarity.sizedKMeansK(nEmb)
    // tau = 0.3, the q48 gate/ladder semantics (worst case for sign-LSH,
    // nonzero output at every mult — a 0.8 pass finds nothing on this
    // corpus and would record only the candidate stage's cost)
    stage("embed_neardup_auto")(
      Similarity.cosineNearDupPairsLsh(
        emb, "vec_id", "embedding", threshold = 0.3, dim = 64, bands = 32))
    val cents = Similarity.trainKMeans(
      emb, "vec_id", "embedding", k = Similarity.AutoK, iterations = 2, dim = 64)
    stage("semdedup_autok")(
      Similarity.semDedup(emb, "vec_id", "embedding", cents, "cid", "centroid",
        threshold = 0.3))

    val load1 = osBean.getSystemLoadAverage
    val json =
      s"""{"sf_base":"$sfDir","mult":$mult,"docs_in":$docsIn,"embeddings_in":$nEmb,""" +
        s""""auto_band_bits":$autoBands,"auto_k":$autoK,"loadavg":[$load0,$load1],""" +
        s""""stages":{${stages.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    graft.queries.PackShared.deleteRecursively(work)
    spark.stop()
  }
}
