package graft.sinks

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compaction shrinks the file count, preserves every row, and the swap leaves no temp dirs") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val rows = (1L to 20000L).map(i => (i, s"payload $i"))
    // a streaming sink's pathology: many tiny files
    rows.toDF("id", "payload").repartition(64).write.parquet(dir)
    val before = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(before == 64)

    val report = Compaction.compactParquet(spark, dir, targetFileBytes = 1L << 40)
    assert(report.filesBefore == 64 && report.filesAfter == 1,
      s"one target-sized file expected, got $report")
    assert(report.rows == 20000L)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == rows.toSet,
      "compaction must be row-lossless")
    val leftovers = new java.io.File(dir).getParentFile.listFiles
      .map(_.getName).filter(n => n.contains("compact"))
    assert(leftovers.sameElements(Array("t")) || leftovers.isEmpty,
      s"swap left temp dirs behind: ${leftovers.mkString(",")}")
  }

  test("clustered compaction yields disjoint file ranges (pruning survives the rewrite)") {
    val dir = Files.createTempDirectory("graft-compact-rc").toString + "/t"
    (1L to 9000L).map(i => (i, i % 7)).toDF("k", "v")
      .repartition(32).write.parquet(dir)
    val report = Compaction.compactParquet(spark, dir,
      targetFileBytes = 20L * 1024, clusterCols = Seq("k"))
    assert(report.filesAfter > 1, s"want a multi-file clustered layout, got $report")
    // per-file min/max of k must not overlap across files
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(fmin("k").as("lo"), fmax("k").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: $hi1 >= $lo2")
      case _ =>
    }
  }
}
