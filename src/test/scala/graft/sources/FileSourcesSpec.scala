package graft.sources

import graft.TestSpark
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class FileSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(suffix: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-files")
    val f = dir.resolve(s"data$suffix")
    Files.writeString(f, content)
    f.toString
  }

  test("lines: one row per line (the reference's default object pipeline)") {
    val p = tmp(".txt", "alpha\nbeta\ngamma\n")
    assert(FileSources.lines(spark, p).as[String].collect().toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("csv with header") {
    val p = tmp(".csv", "id,name\n1,a\n2,b\n")
    val rows = FileSources.csv(spark, p).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("1", "a"), ("2", "b")))
  }

  test("json lines") {
    val p = tmp(".json", """{"id":1,"name":"a"}""" + "\n" + """{"id":2,"name":"b"}""" + "\n")
    val rows = FileSources.json(spark, p).selectExpr("id", "name").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("binaryFiles: whole-file content + metadata for media columns") {
    val p = tmp(".bin", "raw-bytes")
    val row = FileSources.binaryFiles(spark, p).select("length", "content").head()
    assert(row.getLong(0) == 9L)
    assert(new String(row.getAs[Array[Byte]](1), "UTF-8") == "raw-bytes")
  }

  test("lines source composes with the timed-file pipeline (end-to-end object ingestion)") {
    val dir = Files.createTempDirectory("graft-timed-files")
    // no spaces in keys: Spark file paths URL-encode them and the scan fails
    Files.writeString(dir.resolve("log-2026-01-01_00.00.01.txt"), "a\nb\n")
    Files.writeString(dir.resolve("log-2026-01-01_00.00.02.txt"), "c\n")
    val formatter = new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd_HH.mm.ss").toFormatter.withZone(java.time.ZoneId.of("UTC"))
    val p = graft.pipeline.TimedFileSource.timed(
      name = "logs",
      listKeys = () => Files.list(dir).toArray.map(_.toString).toSeq,
      readObject = (s, key) => FileSources.lines(s, key),
      prefix = s"$dir/log-",
      formatter = formatter,
      from = java.time.Instant.parse("2026-01-01T00:00:00Z"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val sink = new graft.pipeline.BatchSink {
      def write(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
        seen ++= df.as[String](org.apache.spark.sql.Encoders.STRING).collect()
    }
    val ckpt = Files.createTempDirectory("graft-timed-ckpt").toString
    new graft.pipeline.PipelineRunner(spark, ckpt).run(p, sink, maxIterations = 3)
    assert(seen.toSeq == Seq("a", "b", "c"))
  }

  test("orc: write/read round-trip preserves rows and types; predicates push to the scan") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    df.write.mode("overwrite").orc(dir)
    val back = FileSources.orc(spark, dir)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
    // the vectorized ORC reader advertises pushed filters like parquet's
    val plan = back.filter(col("n_chars") > 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"),
      s"expected a pushed ORC filter in:\n$plan")
  }
}
