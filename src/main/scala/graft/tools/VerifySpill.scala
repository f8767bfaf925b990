package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** One-off measurement harness for the r17 verdict-#1 fix: runs ONLY the
  * rehearsal's `embed_neardup_auto` stage (auto-banded near-dup over the
  * ×`mult` widened embeddings) and prints the stage's wall time and
  * spill/shuffle counters — the focused re-run that shows the
  * [[Similarity.verifySmjPartitions]] partition rule zeroing the 17 GB
  * disk spill REHEARSAL_r17 recorded, without paying for the full
  * rehearsal pipeline per iteration.
  *
  * `runMain graft.tools.VerifySpill [sfDir] [mult]`
  */
object VerifySpill {
  private class M extends SparkListener {
    @volatile var sr = 0L; @volatile var sw = 0L
    @volatile var ms = 0L; @volatile var ds = 0L; @volatile var pk = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) synchronized {
        sr += m.shuffleReadMetrics.totalBytesRead
        sw += m.shuffleWriteMetrics.bytesWritten
        ms += m.memoryBytesSpilled; ds += m.diskBytesSpilled
        pk = math.max(pk, m.peakExecutionMemory)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    // arg3: explicit bandBits (pre-r18 plan shape — skips the partition
    // rule) or 0 for AutoBands (the shipped default, sized verify joins)
    val bb = args.drop(2).headOption.map(_.toInt).getOrElse(0)
    // arg4: per-partition verify target in MiB (0 = shipped default)
    val targetMb = args.drop(3).headOption.map(_.toInt).getOrElse(0)
    val spark = GraftSession.local("graft-verify-spill")
    if (targetMb > 0) {
      spark.conf.set(Similarity.VerifyPartitionBytesConf, (targetMb.toLong << 20).toString)
    }
    val m = new M
    spark.sparkContext.addSparkListener(m)
    val work = s"/tmp/graft_vplan_x$mult"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(work, "embeddings.parquet"))) {
      ScaleProbe.buildDir(spark, sfDir, work, mult)
    }
    val emb = spark.read.parquet(s"$work/embeddings.parquet")
    val t0 = System.nanoTime()
    val out = s"$work/out"
    Similarity.cosineNearDupPairsLsh(
      emb, "vec_id", "embedding", threshold = 0.3, dim = 64,
      bandBits = if (bb == 0) Similarity.AutoBands else bb, bands = 32)
      .write.mode("overwrite").parquet(out)
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(out).count()
    def mb(b: Long) = f"${b / 1048576.0}%.1f"
    println(f"""{"sec":$sec%.2f,"rows_out":$rows,"shuffle_read_mb":${mb(m.sr)},""" +
      s""""shuffle_write_mb":${mb(m.sw)},"spill_mem_mb":${mb(m.ms)},""" +
      s""""spill_disk_mb":${mb(m.ds)},"peak_task_exec_mem_mb":${mb(m.pk)}}""")
    graft.queries.PackShared.deleteRecursively(work)
    spark.stop()
  }
}
