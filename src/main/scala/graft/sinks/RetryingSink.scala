package graft.sinks

import graft.core.GraftError
import graft.pipeline.BatchSink
import org.apache.spark.sql.DataFrame

/** Retry decorator for any [[BatchSink]] — the reference's sink produce
  * policy: up to `maxRetries` retries with exponential backoff from
  * `baseDelayMillis` (tamer `core/src/main/scala/tamer/Tamer.scala:58`:
  * `Schedule.recurs(10) && Schedule.exponential(100.milliseconds)`).
  * Retrying composes with idempotent epoch writes: a half-failed attempt is
  * overwritten by the retry.
  *
  * `sleep` is injectable so tests assert the schedule without waiting.
  */
final class RetryingSink(
    inner: BatchSink,
    maxRetries: Int = 10,
    baseDelayMillis: Long = 100,
    sleep: Long => Unit = Thread.sleep
) extends BatchSink {

  def write(df: DataFrame, epoch: Long): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { inner.write(df, epoch); done = true }
      catch {
        case e: Exception if attempt < maxRetries =>
          sleep(baseDelayMillis << attempt)
          attempt += 1
        case e: Exception =>
          throw GraftError(s"sink write for epoch $epoch failed after $maxRetries retries", e)
      }
    }
  }
}

/** Sink-medium bootstrap — the engine's analog of the reference's topic
  * verify-or-create step (tamer `core/src/main/scala/tamer/Tamer.scala:
  * 252-327`): before the run loop starts, either create the output location
  * (marking it as this engine's sink) or verify an existing one is really a
  * graft sink and writable — refusing to run against a location that holds
  * something else (the reference refuses on partition/replication/ACL
  * mismatch the same way).
  */
object SinkBootstrap {
  import org.apache.hadoop.fs.{FileSystem, Path}
  import org.apache.hadoop.fs.permission.FsAction

  private val MarkerName = "_graft_sink"

  /** Bootstrap-or-verify with the reference's three refusal axes mapped to
    * the filesystem medium:
    *  - ownership (ref: topic exists but belongs to someone else) — the
    *    marker file names the owning pipeline;
    *  - layout (ref: partition-count mismatch, `Tamer.scala:281-289`) — the
    *    marker records the sink's partition COLUMNS at creation; verifying
    *    with different ones refuses, because appending epochs with a
    *    different partitioning corrupts the directory layout exactly like
    *    producing to a repartitioned topic reshuffles key placement;
    *  - access (ref: ACL verify, Write for sink / Read+Write for state,
    *    `Tamer.scala:290-315`) — permission-bit check for WRITE (and READ
    *    when `requireRead`, the state-sink case) via `FileSystem.access`.
    */
  def verifyOrCreate(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      sinkName: String,
      partitionCols: Seq[String] = Nil,
      requireRead: Boolean = false
  ): Unit = {
    val dir = new Path(path)
    val fs: FileSystem = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(dir, MarkerName)
    if (!fs.exists(dir)) {
      fs.mkdirs(dir)
      val out = fs.create(marker, true)
      try out.write(markerBody(sinkName, partitionCols).getBytes("UTF-8"))
      finally out.close()
    } else {
      if (!fs.getFileStatus(dir).isDirectory)
        throw GraftError(s"sink path $path exists and is not a directory")
      if (!fs.exists(marker))
        throw GraftError(s"sink path $path exists but is not a graft sink (missing $MarkerName); refusing to write")
      val in = fs.open(marker)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val (owner, recordedCols) = parseMarker(body)
      if (owner != sinkName)
        throw GraftError(s"sink path $path belongs to pipeline '$owner', not '$sinkName'; refusing to write")
      if (recordedCols != partitionCols)
        throw GraftError(
          s"sink path $path was created partitioned by [${recordedCols.mkString(", ")}] " +
            s"but this run wants [${partitionCols.mkString(", ")}]; refusing to mix layouts")
      val needed = if (requireRead) FsAction.READ_WRITE else FsAction.WRITE
      try fs.access(dir, needed)
      catch {
        case e: org.apache.hadoop.security.AccessControlException =>
          throw GraftError(s"sink path $path denies $needed to this user; refusing to run", e)
      }
    }
  }

  private def markerBody(sinkName: String, partitionCols: Seq[String]): String =
    sinkName + "\n" + partitionCols.mkString(",")

  // older markers carry only the owner line (implicitly unpartitioned)
  private def parseMarker(body: String): (String, Seq[String]) =
    body.split("\n", 2) match {
      case Array(owner)       => (owner.trim, Nil)
      case Array(owner, cols) =>
        (owner.trim, cols.trim.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    }
}
