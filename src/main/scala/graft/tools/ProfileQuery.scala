package graft.tools

import graft.{GraftSession, SparkEntry}
import java.util.concurrent.atomic.AtomicLong

/** Per-query cost attribution for the optimization rounds: runs named
  * queries with the bench's noop-write protocol and reports, per run,
  * where the wall-clock went — job count, stage count, task count, summed
  * executor run time, shuffle read/write bytes, memory/disk spill, and the
  * wall-vs-exec gap (scheduler + driver + planning overhead). A query
  * whose wall time dwarfs its executor time is bottlenecked on plan/job
  * machinery (too many actions, iterations, or stages), not on data.
  *
  * `runMain graft.tools.ProfileQuery q194_ppjoin q168_er_canonical [sfDir]`
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(_.startsWith("/")).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    // an argument that is neither a path nor a known query name is a typo —
    // fail loudly instead of silently profiling the whole suite
    val qArgs = args.filterNot(_.startsWith("/"))
    val unknown = qArgs.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"[profile] unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val names =
      if (qArgs.nonEmpty) qArgs.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("graft-profile-query")

    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    val execMs = new AtomicLong(0)
    val shufR = new AtomicLong(0)
    val shufW = new AtomicLong(0)
    val spillM = new AtomicLong(0)
    val spillD = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        execMs.addAndGet(m.executorRunTime)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillM.addAndGet(m.memoryBytesSpilled)
        spillD.addAndGet(m.diskBytesSpilled)
      }
    })

    def reset(): Unit = Seq(jobs, stages, tasks, execMs, shufR, shufW, spillM, spillD)
      .foreach(_.set(0))

    // warm-up: JVM/codegen/parquet-footer costs land here, not on query #1
    SparkEntry.queries("q01_agg_pricing")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    println(f"${"query"}%-34s ${"wall_s"}%8s ${"exec_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"spillM_MB"}%10s ${"spillD_MB"}%10s")
    names.foreach { n =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      reset()
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[profile] $n FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      println(f"$n%-34s $wall%8.2f ${execMs.get / 1e3}%8.2f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${shufR.get / 1e6}%8.1f ${shufW.get / 1e6}%8.1f ${spillM.get / 1e6}%10.1f ${spillD.get / 1e6}%10.1f")
    }
    spark.stop()
  }
}
