package graft.pipeline

import java.time.{Instant, LocalDateTime, ZoneId, ZonedDateTime}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, FormatStyle}
import java.util.Locale
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's filename-cursor test vectors
  * (tamer `s3/src/test/scala/tamer/s3/DateParsingSpec.scala:37-63`,
  * `s3/src/test/scala/tamer/s3/S3Spec.scala:36-49`). Expected suffixes are
  * derived through the formatter (not hardcoded) so the assertions are
  * JDK-locale-data independent while still exercising the same dot-counting
  * extension-stripping edge cases.
  */
class FileCursorSpec extends AnyFunSuite {

  private val rome = ZoneId.of("Europe/Rome")
  private val prefix = "myFolder/myPrefix"

  test("computes suffix for a localized format with an extension (ITALY SHORT)") {
    val date = LocalDateTime.parse("2021-01-01T00:01:44").atZone(rome)
    val formatter = DateTimeFormatter.ofLocalizedDateTime(FormatStyle.SHORT).localizedBy(Locale.ITALY).withZone(rome)
    val formatted = formatter.format(date)
    val key = s"$prefix$formatted.empty"
    assert(FileCursor.suffixWithoutFileExtension(key, prefix, formatter) == formatted)
  }

  test("computes suffix when the date itself contains dots and the extension is multi-part (GERMANY SHORT, .empty.tar.gz)") {
    val date = LocalDateTime.parse("2021-01-01T00:01:44").atZone(rome)
    val formatter = DateTimeFormatter.ofLocalizedDateTime(FormatStyle.SHORT).localizedBy(Locale.GERMANY).withZone(rome)
    val formatted = formatter.format(date)
    assume(formatted.count(_ == '.') > 0) // the point of the vector
    val key = s"$prefix$formatted.empty.tar.gz"
    assert(FileCursor.suffixWithoutFileExtension(key, prefix, formatter) == formatted)
  }

  test("parses the instant from a simple patterned key (Europe/Rome)") {
    val key = "myFolder/myPrefix2021-01-01 00:01:44.empty"
    val formatter = new DateTimeFormatterBuilder().appendPattern("yyyy-MM-dd HH:mm:ss").toFormatter.withZone(rome)
    assert(
      FileCursor.parseInstantFromKey(key, prefix, formatter) ==
        ZonedDateTime.parse("2021-01-01T00:01:44+01:00[Europe/Rome]").toInstant)
  }

  test("computes the next state: smallest key-instant strictly after from") {
    val formatter = new DateTimeFormatterBuilder().appendPattern("yyyy-MM-dd HH:mm:ss").toFormatter.withZone(rome)
    val from = ZonedDateTime.parse("2021-01-01T00:01:43+01:00[Europe/Rome]").toInstant
    val expected = ZonedDateTime.parse("2021-01-01T00:01:44+01:00[Europe/Rome]").toInstant
    val keys = Seq("myFolder/myPrefix2021-01-01 00:01:44.empty")
    assert(FileCursor.nextInstant(keys, from, prefix, formatter).contains(expected))
    // nothing strictly after the newest key -> None (micro-batch "no new offset")
    assert(FileCursor.nextInstant(keys, expected, prefix, formatter).isEmpty)
  }

  test("selectObjectForInstant finds the carrying key") {
    val formatter = new DateTimeFormatterBuilder().appendPattern("yyyy-MM-dd HH:mm:ss").toFormatter.withZone(rome)
    val instant = ZonedDateTime.parse("2021-01-01T00:01:44+01:00[Europe/Rome]").toInstant
    val keys = Seq("other", "myFolder/myPrefix2021-01-01 00:01:44.empty")
    assert(FileCursor.selectObjectForInstant(keys, instant, formatter).contains(keys(1)))
  }

  test("timed file source ingests keys in timestamp order through the runner") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val formatter = new DateTimeFormatterBuilder().appendPattern("yyyy-MM-dd HH:mm:ss").toFormatter.withZone(ZoneId.of("UTC"))
    val keys = Seq(
      "pfx/2021-01-01 00:00:01.txt",
      "pfx/2021-01-01 00:00:03.txt",
      "pfx/2021-01-01 00:00:02.txt")
    val p = TimedFileSource.timed(
      name = "timed",
      listKeys = () => keys,
      readObject = (s, key) => Seq(key).toDF("k"),
      prefix = "pfx/",
      formatter = formatter,
      from = Instant.parse("2021-01-01T00:00:00Z"))
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val sink = new BatchSink {
      def write(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
        order ++= df.collect().map(_.getString(0))
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-timed").toString
    val res = new PipelineRunner(spark, ckpt).run(p, sink, maxIterations = 10,
      stopWhen = (s: Instant) => s == Instant.parse("2021-01-01T00:00:03Z"))
    // ingested in key-instant order despite unsorted listing
    assert(order.toSeq == Seq(keys(0), keys(2), keys(1)))
    assert(res.visited.size == 3)
  }

  test("s3a and OCI SDK are environment-blocked: neither on any classpath (probed 2026-08-16)") {
    // The cursor/poller logic above is fully gated over file:// analogs
    // (q273/q274); the untested halves are the s3a:// FileSystem (needs
    // hadoop-aws + aws-sdk jars) and the OCI object-storage client —
    // neither ships in /opt/spark/jars. Pinned as dated probes-in-code
    // (the Mp3Spec discipline): if either class ever loads, this fails
    // loudly and the corresponding live path graduates from env-blocked
    // (SURVEY §8.3 carries the dated environment note).
    intercept[ClassNotFoundException] {
      Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem")
    }
    intercept[ClassNotFoundException] {
      Class.forName("com.oracle.bmc.objectstorage.ObjectStorageClient")
    }
  }
}
