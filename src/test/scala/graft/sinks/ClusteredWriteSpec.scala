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

  test("z-order bounds per-file spans in BOTH dimensions where 1-d sort cannot") {
    // A grid corpus (every (x, y) combination) is the worst case for
    // single-key clustering: sort by x and every file spans the FULL y
    // domain. Z-order must bound both.
    val n = 128
    val grid = (0 until n * n).map(i => (i / n, i % n)).toDF("x", "y")
    val outZ = java.nio.file.Files.createTempDirectory("graft-z").toString + "/t"
    val out1 = java.nio.file.Files.createTempDirectory("graft-1d").toString + "/t"
    ClusteredWrite.parquetZOrdered(grid, outZ, Seq("x", "y"), numFiles = 16, bits = 7)
    ClusteredWrite.parquet(grid, out1, Seq("x"), numFiles = 16)

    def spans(path: String): Seq[(Double, Double)] = {
      new java.io.File(path).listFiles().map(_.getPath).filter(_.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f)
            .agg(min("x"), max("x"), min("y"), max("y")).head()
          ((r.getInt(1) - r.getInt(0) + 1).toDouble / n,
            (r.getInt(3) - r.getInt(2) + 1).toDouble / n)
        }
    }
    val zs = spans(outZ)
    val ones = spans(out1)
    val (zx, zy) = (zs.map(_._1).sum / zs.size, zs.map(_._2).sum / zs.size)
    val oy = ones.map(_._2).sum / ones.size
    info(f"avg fractional span: z-order x=$zx%.3f y=$zy%.3f; 1-d sort y=$oy%.3f")
    // 16 files on a 2-d z-curve = 4x4 quadrants: each file covers ~1/4 of
    // each dimension (allow slack for range-partitioner boundaries)
    assert(zx < 0.6 && zy < 0.6, s"z-order did not bound both dims: x=$zx y=$zy")
    assert(oy > 0.9, s"1-d layout should span the full second dim, got $oy")
    // lossless
    assert(spark.read.parquet(outZ).count() == (n * n).toLong)
  }

  test("zValue interleaves bits exactly and zBucket is integer-exact") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L)).toDF("a", "b")
    val got = df.select(ClusteredWrite.zValue(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def morton(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    assert(got == Seq(morton(0, 0), morton(1, 0), morton(0, 1), morton(3, 5), morton(255, 255)))
    // zBucket: the full domain maps onto [0, 2^bits) hitting both ends
    val vals = spark.range(0, 1000).select(
      ClusteredWrite.zBucket(col("id"), 0L, 999L, 4).as("bk"))
    val mm = vals.agg(min("bk"), max("bk"), countDistinct("bk")).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 15L && mm.getLong(2) == 16L)
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
