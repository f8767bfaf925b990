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

  test("epoch-parquet layout: nested batch dirs flatten, commit markers survive, replay still skips") {
    val dir = Files.createTempDirectory("graft-compact-eo").toString + "/t"
    val writer = new ExactlyOnceParquetWriter(dir)
    // three committed epochs, each with several files
    (0L to 2L).foreach { b =>
      writer.write((1L to 1000L).map(i => (b * 10000 + i, s"r$i")).toDF("id", "v").repartition(4), b)
    }
    // collect BEFORE the swap: a plan pinned to the old file listing must
    // not be reused across it (readers get old-or-new, never a mix)
    val beforeIds = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(beforeIds.size == 3000)

    val report = Compaction.compactParquet(spark, dir, targetFileBytes = 1L << 40)
    assert(report.filesBefore == 12 && report.filesAfter == 1, s"got $report")
    val after = spark.read.parquet(dir)
    // the epoch partition column survives as lineage data
    assert(after.count() == 3000L && after.columns.contains("batch"))
    assert(after.select("id").as[Long].collect().toSet == beforeIds)
    // commit markers carried over: a checkpoint replay still sees its
    // batches as committed and writes nothing
    (0L to 2L).foreach { b =>
      assert(writer.isCommitted(after, b), s"batch $b marker lost in compaction")
      writer.write((1L to 5L).map(i => (i, "dup")).toDF("id", "v"), b)
    }
    assert(spark.read.parquet(dir).count() == 3000L, "a replayed epoch wrote after compaction")
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
