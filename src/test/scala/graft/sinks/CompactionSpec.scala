package graft.sinks

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).map(_.getName).filter(_.endsWith(".parquet"))
  }

  test("flat dir: file count shrinks, every row survives, the swap leaves no temp dirs") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val rows = (1L to 20000L).map(i => (i, s"payload $i"))
    // a streaming sink's pathology: many tiny files
    rows.toDF("id", "payload").repartition(64).write.parquet(dir)
    assert(parquetFiles(dir).size == 64)

    val report = Compaction.compactParquet(spark, dir, targetFileBytes = 1L << 40)
    assert(report.filesBefore == 64 && report.filesAfter == 1,
      s"one target-sized file expected, got $report")
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == rows.toSet,
      "compaction must be row-lossless")
    val leftovers = new java.io.File(dir).getParentFile.listFiles
      .map(_.getName).filter(n => n.contains("compact"))
    assert(leftovers.sameElements(Array("t")) || leftovers.isEmpty,
      s"swap left temp dirs behind: ${leftovers.mkString(",")}")
  }

  test("epoch layout: partition dirs preserved, markers survive, replay skips, NEW epochs land cleanly") {
    val dir = Files.createTempDirectory("graft-compact-eo").toString + "/t"
    val writer = new ExactlyOnceParquetWriter(dir)
    (0L to 2L).foreach { b =>
      writer.write((1L to 1000L).map(i => (b * 10000 + i, s"r$i")).toDF("id", "v").repartition(4), b)
    }
    val beforeIds = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(beforeIds.size == 3000)

    val report = Compaction.compactParquet(spark, dir, targetFileBytes = 1L << 40)
    // layout preserved: files merge WITHIN each batch dir (3 dirs remain)
    assert(report.filesBefore == 12 && report.filesAfter == 3, s"got $report")
    val after = spark.read.parquet(dir)
    assert(after.columns.contains("batch"), "partition column must survive")
    assert(after.select("id").as[Long].collect().toSet == beforeIds)

    // committed replays still skip (markers carried over)
    (0L to 2L).foreach { b =>
      assert(writer.isCommitted(after, b), s"batch $b marker lost in compaction")
      writer.write((1L to 5L).map(i => (i, "dup")).toDF("id", "v"), b)
    }
    assert(spark.read.parquet(dir).count() == 3000L, "a replayed epoch wrote after compaction")

    // a genuinely NEW epoch after compaction must read cleanly alongside
    // the compacted generation (flattening would make the layouts conflict)
    writer.write((1L to 100L).map(i => (90000 + i, "new")).toDF("id", "v"), 3L)
    assert(spark.read.parquet(dir).count() == 3100L,
      "post-compaction epoch conflicts with the compacted layout")
  }

  test("uncommitted epoch is NOT baked in: its replay after compaction writes exactly once") {
    val dir = Files.createTempDirectory("graft-compact-uc").toString + "/t"
    val writer = new ExactlyOnceParquetWriter(dir)
    (0L to 1L).foreach { b =>
      writer.write((1L to 500L).map(i => (b * 10000 + i, "ok")).toDF("id", "v"), b)
    }
    // simulate a writer that crashed between data write and marker rename:
    // batch=2 data exists, no commit marker
    (1L to 500L).map(i => (20000 + i, "crashed")).toDF("id", "v")
      .write.parquet(s"$dir/batch=2")

    val report = Compaction.compactParquet(spark, dir, targetFileBytes = 1L << 40)
    assert(report.skippedUncommitted == 1, s"uncommitted epoch not detected: $report")

    // the replay rewrites batch 2 idempotently — every batch-2 row exactly once
    writer.write((1L to 500L).map(i => (20000 + i, "replayed")).toDF("id", "v"), 2L)
    val after = spark.read.parquet(dir)
    assert(after.count() == 1500L, "replayed epoch duplicated rows after compaction")
    assert(after.filter(col("v") === "replayed").count() == 500L)
    assert(after.filter(col("v") === "crashed").count() === 0L,
      "the crashed partial write must be replaced by its replay, not merged with it")
  }

  test("mixed flat+partitioned layout is refused loudly, not silently dropped") {
    val dir = Files.createTempDirectory("graft-compact-mx").toString + "/t"
    (1L to 100L).map(i => (i, "root")).toDF("id", "v").coalesce(1).write.parquet(dir)
    (1L to 100L).map(i => (1000 + i, "part")).toDF("id", "v").write.parquet(s"$dir/batch=0")
    val err = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, dir)
    }
    assert(err.getMessage.contains("loose"), err.getMessage)
    // nothing touched: both generations still on disk (a mixed-layout READ
    // is itself ambiguous in Spark — which is exactly why compaction must
    // refuse rather than rewrite what a read happens to return)
    assert(new java.io.File(dir).listFiles.exists(_.getName.endsWith(".parquet")))
    assert(spark.read.parquet(s"$dir/batch=0").count() == 100L)
    assert(spark.read.parquet(dir).count() == 100L) // the loose generation
  }

  test("nested two-level partition layout is refused loudly, not silently flattened") {
    val dir = Files.createTempDirectory("graft-compact-nst").toString + "/t"
    // batch=0/split=train passes a top-level-only partCols check (one
    // distinct top-level key) but a rewrite would flatten `split` into a
    // data column — the guard must see one level down
    (1L to 50L).map(i => (i, "a")).toDF("id", "v")
      .write.parquet(s"$dir/batch=0/split=train")
    (1L to 50L).map(i => (100 + i, "b")).toDF("id", "v")
      .write.parquet(s"$dir/batch=0/split=test")
    val err = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, dir)
    }
    assert(err.getMessage.contains("nested"), err.getMessage)
    // untouched: both leaves still readable with both partition columns
    assert(spark.read.parquet(dir).filter(col("split") === "train").count() == 50L)
  }

  test("a big partition splits across multiple target-sized files, not one file per dir") {
    val dir = Files.createTempDirectory("graft-compact-sz").toString + "/t"
    val writer = new ExactlyOnceParquetWriter(dir)
    (0L to 1L).foreach { b =>
      writer.write((1L to 20000L).map(i => (b * 100000 + i, s"payload $i")).toDF("id", "v")
        .repartition(8), b)
    }
    val report = Compaction.compactParquet(spark, dir, targetFileBytes = 64L * 1024)
    assert(report.filesBefore == 16)
    // 2 partition dirs but a sub-target file budget: each dir must hold
    // several files (a repartition-on-partition-column rewrite would give
    // exactly one file per dir regardless of target)
    assert(report.filesAfter > 2, s"partition dirs were not split by size: $report")
    assert(spark.read.parquet(dir).count() == 40000L)
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
