package graft.sinks

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64}

/** Small-file compaction for parquet directories — the maintenance pass
  * every streaming sink needs at scale. A micro-batch sink (epoch parquet,
  * foreachBatch writers, `Trigger.AvailableNow` drains) emits files per
  * trigger per partition; after a week a 100 TB landing zone is millions of
  * KB-sized files, and file-open overhead (NameNode / object-store request
  * pressure, footer reads, task-per-file scheduling) starts dominating
  * scans. Compaction rewrites the directory into size-targeted files —
  * optionally range-clustered so the rewrite also buys min/max pruning
  * ([[ClusteredWrite]]) — then swaps it in.
  *
  * PARTITIONED layouts (`batch=3/`, `split=train/`) are PRESERVED: the
  * rewrite keeps the same partition directories (merging the files inside
  * them), so a sink that keeps appending new partition dirs after the
  * compaction continues to read cleanly — flattening them would leave new
  * epochs' partition dirs conflicting with flattened root files.
  *
  * [[ExactlyOnceParquetWriter]] directories get their exactly-once
  * semantics preserved end to end: only batches with a commit marker are
  * rewritten (an epoch whose writer crashed between data write and marker
  * rename must NOT be baked into the new generation — its replay would
  * then duplicate every row), uncommitted batch dirs are carried over
  * byte-for-byte so the replay's idempotent overwrite still targets them,
  * and the `_graft_commits` markers ride along so committed batches still
  * skip on replay.
  *
  * The swap is two renames on the directory (current → trash, compacted →
  * current). Each rename is atomic on HDFS and local filesystems, but the
  * PAIR is not: between rename(path → trash) and rename(tmp → path) the
  * directory does not exist, so a reader that lists it in that window gets
  * path-not-found — readers, not just writers, must either be quiesced for
  * the swap or tolerate-and-retry a transient not-found (one retry
  * suffices; the window is two metadata ops). Crash recovery: if the
  * process dies between the two renames, the complete original generation
  * sits at `<dir>.compacted-old` with nothing at `<dir>` — restore with a
  * single rename of `.compacted-old` back to the original path (the
  * `.compacting` temp dir, if present, is the incomplete new generation
  * and can be deleted). Object stores without atomic rename should point
  * `compactParquet` at a NEW generation path and flip a pointer (manifest,
  * view, or table metadata) instead — the same discipline every table
  * format uses. Writers must be quiesced for the swap window (run it
  * from the maintenance slot of the pipeline that owns the directory —
  * [[graft.pipeline.PipelineRunner]]'s single-writer lock is exactly the
  * fence to hold).
  *
  * Sizing: `targetFileBytes` against the directory's current parquet
  * bytes; file count `ceil(bytes / target)` — compressed in, compressed
  * out is the right first-order model since the rewrite preserves encoding
  * and codec. The report is metadata-only (listings), no extra data scan.
  */
object Compaction {

  final case class CompactionReport(
      filesBefore: Int,
      filesAfter: Int,
      bytes: Long,
      skippedUncommitted: Int)

  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterCols: Seq[String] = Nil
  ): CompactionReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)

    def countParquet(p: Path): (Int, Long) = {
      val it = fs.listFiles(p, true)
      var n = 0
      var bytes = 0L
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) { n += 1; bytes += s.getLen }
      }
      (n, bytes)
    }

    val top = fs.listStatus(path)
    // Hive-style partition dirs at the top level ("k=v"); one level deep
    // covers the epoch sink and split layouts this engine writes
    val partDirs = top.filter(s => s.isDirectory && s.getPath.getName.contains("="))
    val partCols = partDirs.map(_.getPath.getName.split("=", 2)(0)).distinct.toSeq
    require(partCols.size <= 1,
      s"compactParquet handles at most one partition level, found: ${partCols.mkString(", ")}")
    // a NESTED layout (batch=0/split=train/…) would pass the check above —
    // the read then infers BOTH partition columns but the rewrite
    // partitionBys only the top level, silently flattening the second into
    // data columns; refuse loudly, same as the mixed flat+partitioned case
    partDirs.foreach { d =>
      val nested = fs.listStatus(d.getPath)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      require(nested.isEmpty,
        s"compactParquet handles at most one partition level: ${d.getPath.getName} contains " +
          s"nested partition dir(s) ${nested.map(_.getPath.getName).mkString(", ")} — " +
          "compaction would flatten the second level into data columns")
    }
    // a MIXED layout (loose root parquet beside partition dirs) must fail
    // loudly: the rewrite would read only the partition dirs and the swap
    // would silently DELETE the loose files' rows
    if (partCols.nonEmpty) {
      val loose = top.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      require(loose.isEmpty,
        s"compactParquet: $dir mixes ${loose.length} root-level parquet file(s) with " +
          s"${partDirs.length} partition dir(s) — compaction would drop the loose files; " +
          "repair the layout first (move the loose files into a partition dir or a separate path)")
    }

    // exactly-once sinks: rewrite ONLY committed batches; a batch dir whose
    // value does not parse as a long (hand-placed, HIVE_DEFAULT_PARTITION)
    // is treated as uncommitted — carried over untouched, never rewritten
    val commitsDir = new Path(path, "_graft_commits")
    val committed: Option[Set[Long]] =
      if (fs.exists(commitsDir))
        Some(fs.listStatus(commitsDir).map(_.getPath.getName)
          .collect { case n if n.startsWith("batch-") => n.stripPrefix("batch-").toLong }.toSet)
      else None
    val (toCompact, toCarry) = (committed, partCols.headOption) match {
      case (Some(ids), Some("batch")) =>
        partDirs.partition(s =>
          scala.util.Try(s.getPath.getName.stripPrefix("batch=").toLong)
            .toOption.exists(ids.contains))
      case _ => (partDirs, Array.empty[org.apache.hadoop.fs.FileStatus])
    }

    val (filesBefore, bytes) = countParquet(path)
    val compactBytes =
      if (partDirs.isEmpty) bytes else toCompact.map(s => countParquet(s.getPath)._2).sum
    val nOut = math.max(1L, (compactBytes + targetFileBytes - 1) / targetFileBytes).toInt

    val sources =
      if (partDirs.isEmpty) Seq(dir)
      else toCompact.map(_.getPath.toString).toSeq
    val tmp = new Path(dir + ".compacting")
    fs.delete(tmp, true)
    if (sources.nonEmpty) {
      val df = spark.read.option("basePath", dir).parquet(sources: _*)
      val pcols = partCols.map(col)
      if (partCols.isEmpty && clusterCols.nonEmpty)
        // flat + clustered: delegate to the canonical range-layout writer
        ClusteredWrite.parquet(df, tmp.toString, clusterCols, numFiles = nOut)
      else {
        val shaped =
          if (clusterCols.nonEmpty)
            df.repartitionByRange(nOut, pcols ++ clusterCols.map(col): _*)
              .sortWithinPartitions(pcols ++ clusterCols.map(col): _*)
          else if (partCols.nonEmpty) {
            // range on (partition, uniform spread): partition values stay
            // contiguous while a big partition SPLITS across tasks — a bare
            // repartition(n, partCol) would hash each partition value to
            // one task and one output file, ignoring targetFileBytes
            val spread = xxhash64(df.columns.map(col): _*)
            df.withColumn("__spread", spread)
              .repartitionByRange(nOut, pcols :+ col("__spread"): _*)
              .drop("__spread")
          } else df.repartition(nOut)
        shaped.write.mode("overwrite").partitionBy(partCols: _*).parquet(tmp.toString)
      }
    } else fs.mkdirs(tmp)

    // carry metadata dirs (commit markers) and uncommitted epochs into the
    // new generation BEFORE the swap — copies, not moves, so every rollback
    // path leaves the original directory complete
    (top.filter(s => s.isDirectory && s.getPath.getName.startsWith("_")) ++ toCarry)
      .foreach { s =>
        if (!FileUtil.copy(fs, s.getPath, fs, new Path(tmp, s.getPath.getName), false, conf))
          throw new java.io.IOException(
            s"compaction failed: could not carry ${s.getPath.getName} over")
      }

    swapInPlace(fs, path, tmp)

    CompactionReport(filesBefore, countParquet(path)._1, bytes, toCarry.length)
  }

  /** The two-rename generation swap: move `path` aside to
    * `<path>.compacted-old`, move `tmp` into place, drop the old
    * generation. Each rename is atomic (HDFS/local) but the pair is not —
    * see the class scaladoc for the reader not-found window and the
    * `.compacted-old` crash-recovery path. Exposed for other
    * build-new-generation-then-swap maintenance passes
    * ([[IndexStore.consolidate]]). */
  private[sinks] def swapInPlace(
      fs: org.apache.hadoop.fs.FileSystem,
      path: Path,
      tmp: Path
  ): Unit = {
    val trash = new Path(path.toString + ".compacted-old")
    fs.delete(trash, true)
    if (!fs.rename(path, trash))
      throw new java.io.IOException(s"compaction swap failed: could not move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(trash, path) // roll back — the original directory is intact
      throw new java.io.IOException(s"compaction swap failed: could not move $tmp into place")
    }
    fs.delete(trash, true)
  }
}
