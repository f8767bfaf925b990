package graft.sinks

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property that makes clustering worth a shuffle: every output file
  * covers a disjoint key range (so min/max stats prune), and nothing is
  * lost or duplicated on the way.
  */
class ClusteredWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("files cover pairwise-disjoint key ranges and the data round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft-clustered").toString + "/t"
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    ClusteredWrite.parquet(src, out, Seq("l_orderkey"), numFiles = 8)

    val files = new java.io.File(out).listFiles().map(_.getPath)
      .filter(_.endsWith(".parquet")).toSeq
    assert(files.size > 1, "need several files for disjointness to mean anything")

    // per-file key ranges from the data itself (what the footer stats encode)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA <= loB, s"overlapping file ranges: $ranges")
      case _                       => ()
    }

    // nothing lost, nothing duplicated
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    assert(back.agg(sum("l_quantity")).head().getDouble(0) ==
      src.agg(sum("l_quantity")).head().getDouble(0))
  }

  test("maxRecordsPerFile splits stay sorted and disjoint") {
    val out = java.nio.file.Files.createTempDirectory("graft-clustered-split").toString + "/t"
    ClusteredWrite.parquet((1L to 10000L).toDF("k"), out, Seq("k"),
      numFiles = 2, maxRecordsPerFile = 1000L)
    val files = new java.io.File(out).listFiles().map(_.getPath)
      .filter(_.endsWith(".parquet")).toSeq
    assert(files.size >= 10, s"expected ~10 split files, got ${files.size}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB, s"overlap after split: $ranges")
      case _                       => ()
    }
  }
}
