package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation lifecycle for the persisted dedup indexes
  * ([[graft.operators.Dedup.buildFingerprintIndex]] fingerprints,
  * [[graft.operators.Dedup.buildLshIndex]] band rows) — the storage side of
  * the nightly-ingest loop: every run dedups today's landing zone against
  * the index, then APPENDS the admitted newcomers' index rows as a new
  * generation, so tomorrow's run drops them without ever rebuilding over
  * (or re-scanning) the curated history.
  *
  * Layout: `<dir>/gen=<n>/…parquet`, one generation per run, Hive-style so
  * a plain partition-discovering read unions all generations and prunes by
  * generation when asked. Appends never touch existing generations; a
  * generation only becomes LIVE when its `_SUCCESS` marker lands, so a
  * crashed append leaves a partial `gen=<n>` directory that readers skip
  * and the next [[append]] reclaims with an idempotent overwrite.
  *
  * [[consolidate]] is the maintenance pass: after N runs the index is N
  * generations of small files; reading stays correct but pays N directory
  * listings and N file-open storms. Consolidation rewrites all LIVE
  * generations into a single deduplicated generation (same two-rename swap
  * discipline as [[Compaction]] — quiesce writers, readers tolerate one
  * not-found retry, `.compacted-old` is the crash-recovery copy) while
  * keeping the generation counter monotonic, so appends after a
  * consolidation never reuse a burned generation number.
  */
object IndexStore {

  private def fsOf(p: Path, spark: SparkSession) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def genDirs(spark: SparkSession, dir: String): Seq[(Long, Path)] = {
    val path = new Path(dir)
    val fs = fsOf(path, spark)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .flatMap(s => scala.util.Try(s.getPath.getName.stripPrefix("gen=").toLong)
        .toOption.map(_ -> s.getPath))
      .sortBy(_._1)
  }

  /** Live (completely written) generations: a crashed append's partial
    * directory carries no `_SUCCESS` marker and is excluded everywhere. */
  private def liveGenDirs(spark: SparkSession, dir: String): Seq[(Long, Path)] = {
    val path = new Path(dir)
    lazy val fs = fsOf(path, spark)
    genDirs(spark, dir).filter { case (_, p) => fs.exists(new Path(p, "_SUCCESS")) }
  }

  /** Append `index` rows (any schema — fingerprints, band rows) as the next
    * generation; returns the generation number. Never rewrites an existing
    * live generation; a partial directory left by a crashed append is
    * reclaimed (mode overwrite) because it never became live.
    *
    * SINGLE WRITER REQUIRED — the same fence as [[consolidate]]: two
    * concurrent appenders would both read the live-generation list, both
    * compute the same `next`, and the second job to commit would silently
    * overwrite the first's rows (generation numbering has no CAS on a
    * filesystem). Serialize appends through a writer lock —
    * PipelineRunner's atomic lock-file acquire is the in-repo fence;
    * readers need no lock, they see only `_SUCCESS`-marked generations. */
  def append(index: DataFrame, dir: String): Long = {
    val spark = index.sparkSession
    val next = liveGenDirs(spark, dir).lastOption.fold(0L)(_._1 + 1L)
    val genPath = new Path(s"$dir/gen=$next")
    index.write.mode("overwrite").parquet(genPath.toString)
    // liveness must not depend on the committer's marker config: with
    // mapreduce.fileoutputcommitter.marksuccessfuljobs=false (common on
    // object stores) no _SUCCESS lands, every complete generation would
    // look dead, and the NEXT append would compute next=0 and overwrite
    // it — so the store writes its own marker after the job completes
    val fs = fsOf(genPath, spark)
    val marker = new Path(genPath, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, false).close()
    next
  }

  /** Union of all live generations, generation column dropped — drop-in
    * wherever a [[graft.operators.Dedup.buildFingerprintIndex]] /
    * [[graft.operators.Dedup.buildLshIndex]] frame is consumed
    * (`dropKnownFingerprints`, `nearDupAgainstIndex`, the streaming
    * `historyIndex` / `nearDupHistory` legs — the static side is re-read
    * per micro-batch, so a generation appended mid-stream is picked up
    * live). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val live = liveGenDirs(spark, dir)
    require(live.nonEmpty, s"IndexStore.read: no live generations under $dir")
    spark.read.option("basePath", dir).parquet(live.map(_._2.toString): _*)
      .drop("gen")
  }

  /** Rewrite all live generations into ONE deduplicated generation numbered
    * `maxGen` (counter stays monotonic — the next append claims
    * `maxGen + 1`). `distinct` makes consolidation also repair double
    * appends of the same run's newcomers (an at-least-once upstream): index
    * rows are value-rows (fingerprints, band rows), so set semantics are
    * the contract. Returns (generations before, rows after).
    */
  def consolidate(spark: SparkSession, dir: String): (Int, Long) =
    consolidateWith(spark, dir)(_.distinct())

  /** [[consolidate]] with a caller-supplied merge instead of `distinct`
    * — REQUIRED for stores of SUMMABLE partials. `distinct`'s set
    * semantics are only correct when index rows are value-rows
    * (fingerprints, band rows) or idempotently mergeable (HLL registers
    * under max): two generations of ADDITIVE sufficient statistics
    * ([[graft.operators.Inference.momentPartial]] vintages) can
    * legitimately carry IDENTICAL rows — two days with the same per-arm
    * (n, Σx, Σx²) — and deduplicating them silently halves the count.
    * Pass the family's own re-aggregation (e.g.
    * `Inference.momentMerge(Seq(_), keys)`), which collapses N
    * generations to one row per key while the merged readout stays
    * bit-identical (MomentGenerationStoreSpec pins this). Same two-rename
    * swap, single-writer fence, and monotonic generation counter as
    * [[consolidate]]. */
  def consolidateWith(spark: SparkSession, dir: String)(
      merge: DataFrame => DataFrame): (Int, Long) = {
    val live = liveGenDirs(spark, dir)
    require(live.nonEmpty, s"IndexStore.consolidate: no live generations under $dir")
    val maxGen = live.last._1
    val merged = merge(spark.read.option("basePath", dir)
      .parquet(live.map(_._2.toString): _*)
      .drop("gen"))
    val path = new Path(dir)
    val fs = fsOf(path, spark)
    val tmp = new Path(dir + ".compacting")
    fs.delete(tmp, true)
    merged.write.parquet(new Path(tmp, s"gen=$maxGen").toString)
    // same committer-independent liveness marker as append
    val marker = new Path(new Path(tmp, s"gen=$maxGen"), "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, false).close()
    val rows = spark.read.parquet(new Path(tmp, s"gen=$maxGen").toString).count()
    Compaction.swapInPlace(fs, path, tmp)
    (live.size, rows)
  }
}
