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

  private val MarkerName = "_graft_sink"

  def verifyOrCreate(spark: org.apache.spark.sql.SparkSession, path: String, sinkName: String): Unit = {
    val dir = new Path(path)
    val fs: FileSystem = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(dir, MarkerName)
    if (!fs.exists(dir)) {
      fs.mkdirs(dir)
      val out = fs.create(marker, true)
      try out.write(sinkName.getBytes("UTF-8"))
      finally out.close()
    } else {
      if (!fs.getFileStatus(dir).isDirectory)
        throw GraftError(s"sink path $path exists and is not a directory")
      if (!fs.exists(marker))
        throw GraftError(s"sink path $path exists but is not a graft sink (missing $MarkerName); refusing to write")
      val in = fs.open(marker)
      val owner =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (owner != sinkName)
        throw GraftError(s"sink path $path belongs to pipeline '$owner', not '$sinkName'; refusing to write")
    }
  }
}
