package graft.pipeline

import java.time.Instant
import java.time.format.DateTimeFormatter

/** Timestamp-in-filename cursor — the reference's S3/object-store source
  * state machine (tamer `s3/src/main/scala/tamer/s3/S3Setup.scala:162-210`):
  * object keys embed a formatted datetime between a fixed prefix and an
  * optional file extension; the cursor is the key-instant, and each advance
  * picks the smallest key-instant strictly greater than the current one.
  *
  * All functions here are pure (testable against the reference's
  * DateParsingSpec/S3Spec vectors); the blocking "wait for the key list to
  * change" of the reference maps to "no new state this pull" in a
  * micro-batch engine (SURVEY.md §7.4).
  */
object FileCursor {

  /** Strip the prefix and any file extension from a key, leaving exactly the
    * formatted-datetime part. Extension detection counts dots: the formatted
    * datetime itself may contain dots (localized formats), so only dots
    * *beyond* the formatter's own count are an extension.
    * (ref: `S3Setup.scala:162-167`)
    */
  def suffixWithoutFileExtension(key: String, prefix: String, formatter: DateTimeFormatter): String = {
    val dotCountInDate = formatter.format(Instant.EPOCH).count(_ == '.')
    val keyWithoutExtension =
      if (key.count(_ == '.') > dotCountInDate) key.split('.').splitAt(dotCountInDate + 1)._1.mkString(".")
      else key
    keyWithoutExtension.stripPrefix(prefix)
  }

  /** Parse the key-embedded instant. (ref: `S3Setup.scala:169-170`) */
  def parseInstantFromKey(key: String, prefix: String, formatter: DateTimeFormatter): Instant =
    Instant.from(formatter.parse(suffixWithoutFileExtension(key, prefix, formatter)))

  /** The next cursor: smallest key-instant strictly after `from`, if any.
    * (non-blocking form of `S3Setup.scala:173-182`)
    */
  def nextInstant(keys: Seq[String], from: Instant, prefix: String, formatter: DateTimeFormatter): Option[Instant] =
    keys.map(parseInstantFromKey(_, prefix, formatter)).filter(_.isAfter(from)).sorted(Ordering.fromLessThan[Instant](_ isBefore _)).headOption

  /** The key that carries a given instant. (ref: `S3Setup.scala:184-185`) */
  def selectObjectForInstant(keys: Seq[String], instant: Instant, formatter: DateTimeFormatter): Option[String] =
    keys.find(_.contains(formatter.format(instant)))
}

/** Object-store source over the filename-timestamp cursor (the reference's
  * `S3Setup.timed`). `listKeys` is the bucket listing (driver-side, tiny);
  * `readObject` turns ONE selected key into a distributed DataFrame — on a
  * cluster that is `spark.read.text("s3a://bucket/key")`, so the object
  * bytes flow straight from the store to executors.
  */
object TimedFileSource {

  def timed(
      name: String,
      listKeys: () => Seq[String],
      readObject: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
      prefix: String,
      formatter: DateTimeFormatter,
      from: Instant
  ): GraftPipeline[Instant] = {
    implicit val h: graft.core.Hashable[Instant] = graft.core.Hashable.instantHashable
    GraftPipeline[Instant](
      name,
      initialState = from,
      repr = s"timed-files:$name:prefix=$prefix",
      iteration = (spark, state) => {
        val keys = listKeys()
        FileCursor.nextInstant(keys, state, prefix, formatter) match {
          case Some(next) =>
            val key = FileCursor.selectObjectForInstant(keys, next, formatter)
              .getOrElse(throw graft.core.GraftError(s"no key for instant $next under prefix $prefix"))
            Iteration(batch = Some(readObject(spark, key)), nextState = next)
          case None =>
            // nothing newer listed: hold state, let the trigger re-poll
            Iteration(batch = None, nextState = state)
        }
      }
    )
  }
}
