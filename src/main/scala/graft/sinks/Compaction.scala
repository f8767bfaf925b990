package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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
  * The swap is two renames on the directory (current → trash, compacted →
  * current). On HDFS and local filesystems a rename is atomic, so readers
  * see old-or-new, never a mix; object stores without atomic rename should
  * point `compactParquet` at a NEW generation path and flip a pointer
  * (manifest, view, or table metadata) instead — the same discipline every
  * table format uses. Writers must be quiesced for the swap window (a
  * compaction concurrent with a live appender loses the appender's files;
  * run it from the maintenance slot of the pipeline that owns the
  * directory — [[graft.pipeline.PipelineRunner]]'s single-writer lock is
  * exactly the fence to hold).
  *
  * Sizing: `targetFileBytes` is compared against the directory's CURRENT
  * parquet bytes; the file count is `ceil(bytes / target)` — compressed
  * size in, compressed size out is the right first-order model since the
  * rewrite preserves encoding and codec.
  */
object Compaction {

  final case class CompactionReport(
      filesBefore: Int,
      filesAfter: Int,
      bytes: Long,
      rows: Long)

  /** Partition subdirectories (`batch=3/`, `split=train/`) are FLATTENED:
    * their inferred columns ride along as ordinary data columns in the
    * compacted files — for an epoch-parquet sink that flattening is the
    * point (per-trigger dirs are accidental layout, and the `batch` column
    * survives as lineage). Metadata directories (names starting with `_`,
    * e.g. the exactly-once sink's `_graft_commits` markers) are carried
    * over to the compacted generation unchanged, so a checkpoint replay
    * after compaction still sees its batches as committed. */
  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterCols: Seq[String] = Nil
  ): CompactionReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // recursive: a streaming sink's files sit in per-epoch/partition subdirs
    val parquetFiles = {
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) buf += s
      }
      buf.toSeq
    }
    val bytes = parquetFiles.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt

    val df = spark.read.parquet(dir)
    val rows = df.count()
    val tmp = new Path(dir + ".compacting")
    fs.delete(tmp, true)
    if (clusterCols.nonEmpty)
      ClusteredWrite.parquet(df, tmp.toString, clusterCols, numFiles = nOut)
    else
      df.repartition(nOut).write.mode("overwrite").parquet(tmp.toString)

    // carry sink metadata dirs (commit markers etc.) into the new
    // generation BEFORE the swap — a copy, not a move, so every rollback
    // path leaves the original directory complete
    fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_"))
      .foreach { s =>
        if (!org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath, fs,
            new Path(tmp, s.getPath.getName), false, spark.sparkContext.hadoopConfiguration))
          throw new java.io.IOException(
            s"compaction failed: could not carry ${s.getPath.getName} over")
      }

    // two-rename swap: readers race against old-or-new, never a mix
    val trash = new Path(dir + ".compacted-old")
    fs.delete(trash, true)
    if (!fs.rename(path, trash))
      throw new java.io.IOException(s"compaction swap failed: could not move $dir aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(trash, path) // roll back — the original directory is intact
      throw new java.io.IOException(s"compaction swap failed: could not move $tmp into place")
    }
    fs.delete(trash, true)

    val after = {
      val it = fs.listFiles(path, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    CompactionReport(parquetFiles.length, after, bytes, rows)
  }
}
