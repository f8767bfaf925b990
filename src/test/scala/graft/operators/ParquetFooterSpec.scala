package graft.operators

import graft.TestSpark
import graft.functions.ParquetFooterKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The parquet footer leg (q350): pins what the SQL oracle cannot see —
  * REAL-CONSUMER parity in BOTH directions (Spark/parquet-mr must read
  * our hand-written thrift-compact files; our walk must audit
  * Spark-written and pyarrow-written footers, statistics and column
  * indexes and all), the tiling-contract mechanics, and the degrade
  * taxonomy. */
class ParquetFooterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("round trip: build -> info pins groups, leaves, rows, chunks, tiling") {
    // [is_parquet, n_row_groups, n_columns, n_rows, n_chunks, data_bytes, tiling_ok]
    val one = ParquetFooterKernel.info(
      ParquetFooterKernel.build(Seq(5), base = 0L, lieOverlap = false))
    assert(one(0) == 1L && one(1) == 1L && one(2) == 1L && one(3) == 5L &&
      one(4) == 1L && one(6) == 1L)
    val three = ParquetFooterKernel.info(
      ParquetFooterKernel.build(Seq(7, 12, 3), base = 100L, lieOverlap = false))
    assert(three.toSeq.patch(5, Nil, 1) == Seq(1L, 3L, 1L, 22L, 3L, 1L))
    // declared chunk bytes cover the whole data section exactly
    val bytes = ParquetFooterKernel.build(Seq(7, 12, 3), base = 100L, lieOverlap = false)
    val info = ParquetFooterKernel.info(bytes)
    assert(info(5) > 8L * 22) // pages + their headers
  }

  test("real-consumer parity: Spark reads our hand-written files back value-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-parity")
    try {
      val f = dir.resolve("g.parquet")
      java.nio.file.Files.write(f,
        ParquetFooterKernel.build(Seq(6, 9), base = 5000L, lieOverlap = false))
      val got = spark.read.parquet(f.toString)
      assert(got.schema.fieldNames.toSeq == Seq("v"))
      assert(got.count() == 15L)
      // values count up from base across both row groups
      assert(got.agg(min(col("v")), max(col("v")), sum(col("v"))).collect()(0)
        .toSeq == Seq(5000L, 5014L, (5000L to 5014L).sum))
    } finally {
      graft.queries.PackShared.deleteRecursively(dir.toString)
    }
  }

  test("real-consumer parity: our walk audits a Spark-written footer (stats et al skipped)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-real")
    try {
      val out = s"$dir/real.parquet"
      spark.range(1000)
        .select(col("id"), (col("id") * 2).as("twice"),
          concat(lit("row"), col("id")).as("label"))
        .coalesce(1).write.mode("overwrite").parquet(out)
      val part = new java.io.File(out).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      val info = ParquetFooterKernel.info(
        java.nio.file.Files.readAllBytes(part.toPath))
      // cross-check against parquet-mr's own footer reader
      val footer = mrFooter(part.getAbsolutePath)
      assert(info(0) == 1L)
      assert(info(1) == footer.getBlocks.size.toLong)
      assert(info(2) == footer.getFileMetaData.getSchema.getPaths.size.toLong)
      assert(info(3) == 1000L)
      assert(info(4) == footer.getBlocks.size.toLong * 3)
      assert(info(6) == 1L, "a real writer's chunks must tile cleanly")
    } finally {
      graft.queries.PackShared.deleteRecursively(dir.toString)
    }
  }

  test("real-consumer parity: the driver-written testdata footers audit clean") {
    // written by a different real writer than Spark — format breadth
    val d = new java.io.File("/root/testdata/sf0.001/documents.parquet")
    val parts =
      if (d.isDirectory) d.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      else Seq(d)
    assert(parts.nonEmpty)
    val info = ParquetFooterKernel.info(
      java.nio.file.Files.readAllBytes(parts.head.toPath))
    val footer = mrFooter(parts.head.getAbsolutePath)
    assert(info(0) == 1L)
    assert(info(1) == footer.getBlocks.size.toLong)
    assert(info(2) == footer.getFileMetaData.getSchema.getPaths.size.toLong)
    assert(info(3) == footer.getBlocks.asScala.map(_.getRowCount).sum)
    assert(info(6) == 1L)
  }

  test("degrade taxonomy: footer lies flag, structural damage fails") {
    val good = ParquetFooterKernel.build(Seq(7, 12, 3), base = 0L, lieOverlap = false)
    // the tiling lie: honest data, lying chunk offset -> flag, tallies intact
    val lied = ParquetFooterKernel.info(
      ParquetFooterKernel.build(Seq(7, 12, 3), base = 0L, lieOverlap = true))
    assert(lied.toSeq.patch(5, Nil, 1) == Seq(1L, 3L, 1L, 22L, 3L, 0L))
    // single-group lie: the region slides across the footer boundary
    val lied1 = ParquetFooterKernel.info(
      ParquetFooterKernel.build(Seq(5), base = 0L, lieOverlap = true))
    assert(lied1(0) == 1L && lied1(6) == 0L)
    // flipped footer-length byte: the walk must fail, never misparse
    val flen = good.clone()
    flen(flen.length - 8) = (flen(flen.length - 8) ^ 0x5a).toByte
    assert(ParquetFooterKernel.info(flen).head == 0L)
    // truncation (both magics but footer range broken), bad magic, junk
    assert(ParquetFooterKernel.info(good.take(10)).head == 0L)
    val noMagic = good.clone(); noMagic(0) = 'X'
    assert(ParquetFooterKernel.info(noMagic).head == 0L)
    assert(ParquetFooterKernel.info("NOTAPARQ".getBytes).head == 0L)
    assert(ParquetFooterKernel.info(null).head == 0L)
  }

  test("DataFrame chain: syntheticParquetFiles -> parquetFooterInfo round-trips the plants") {
    import spark.implicits._
    val ids = Seq((4L, false), (11L, true)).toDF("media_id", "lie_overlap")
    val got = Multimodal.parquetFooterInfo(
        Multimodal.syntheticParquetFiles(ids).select(col("media_id"), col("content")),
        "content")
      .orderBy("media_id").collect()
    // id 4: 1 + 4%3 = 2 groups, rows 5+(12+0)%20=17 and 5+(12+7)%20=24 -> 41
    val r4 = got(0)
    assert(r4.getBoolean(1) && r4.getLong(2) == 2L && r4.getLong(3) == 1L &&
      r4.getLong(4) == 41L && r4.getLong(5) == 2L && r4.getBoolean(6))
    // id 11: 1 + 11%3 = 3 groups, rows 5+33%20=18, 5+40%20=5, 5+47%20=12 -> 35;
    // lying footer -> tiling_ok false with tallies intact
    val r11 = got(1)
    assert(r11.getBoolean(1) && r11.getLong(2) == 3L && r11.getLong(4) == 35L &&
      !r11.getBoolean(6))
  }

  /** parquet-mr's own footer read (the non-deprecated open/getFooter
    * path). */
  private def mrFooter(path: String)
      : org.apache.parquet.hadoop.metadata.ParquetMetadata = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }
}
