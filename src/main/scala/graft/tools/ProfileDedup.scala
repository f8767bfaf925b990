package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-level profiling for the near-dup pipeline: times each piece of
  * [[Dedup.nearDupPairs]] in isolation (noop-write execution) so bench
  * regressions can be attributed to a stage instead of guessed at.
  * `runMain graft.tools.ProfileDedup [sfDir]`.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile-dedup")

    val stageTime = new java.util.concurrent.atomic.AtomicLong(0)
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageTime.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        taskCount.addAndGet(sc.stageInfo.numTasks)
      }
    })

    def time(name: String)(df: => DataFrame): Unit = {
      stageTime.set(0); taskCount.set(0)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"[profile] $name%-28s $wall%8.2f s wall, ${stageTime.get / 1e3}%8.2f s exec, ${taskCount.get}%4d tasks")
    }

    val docs = Tables.documents(spark, sfDir)
    println(s"[profile] docs rows = ${docs.count()}")

    val withShingles = docs
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), Dedup.shinglesOfTokens(col("__toks"), 3).as("__shingles"))
    time("warmup (shingles)")(withShingles)
    println(s"[profile] scan partitions = ${docs.rdd.getNumPartitions}")
    time("shingles, projected toks")(withShingles)
    time("shingles, expression API")(
      docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("__shingles")))

    val par = withShingles.repartition(32)
    time("repart only")(par)
    val ex = par.select(col("doc_id"), explode(col("__shingles")).as("__shingle"))
    time("explode only")(ex)
    println(s"[profile] exploded rows = ${ex.count()}")
    ex.explain("formatted")
    // Same explode over arrays materialized on disk — separates "explode is
    // slow" from "the array expression is re-evaluated under the Generate".
    withShingles.write.mode("overwrite").parquet("/tmp/shingles_mat.parquet")
    val mat = spark.read.parquet("/tmp/shingles_mat.parquet").repartition(32)
    time("explode of materialized")(mat.select(col("doc_id"), explode(col("__shingles")).as("__shingle")))
    val exh = ex.withColumn("__h", xxhash64(col("__shingle")))
    time("explode+hash")(exh)
    time("groupBy count only")(exh.groupBy(col("doc_id")).agg(count(lit(1)).as("c")))
    time("groupBy 1 min")(exh.groupBy(col("doc_id")).agg(min(xxhash64(col("__h"), lit(0))).as("h0")))
    val sigs = Dedup.minHashSignatures(withShingles, "doc_id", col("__shingles"), 64)
    time("minhash sigs (64)")(sigs)

    val cands = Dedup.lshCandidatePairs(sigs, "doc_id", 16, 4)
    time("sigs + lsh candidates")(cands)
    println(s"[profile] candidate pairs = ${cands.count()}")

    time("full nearDupPairs")(
      Dedup.nearDupPairs(docs, "doc_id", "text", numHashes = 64, bands = 16))
    time("full nearDupPairs (again)")(
      Dedup.nearDupPairs(docs, "doc_id", "text", numHashes = 64, bands = 16))

    // q39 stage decomposition (inverted-index Jaccard)
    val ws = par
    val postings = ws.select(col("doc_id"), explode(col("__shingles")).as("__sh"))
      .groupBy(col("__sh")).agg(collect_list(col("doc_id")).as("__ids"))
      .filter(size(col("__ids")) > 1)
    time("j39: postings")(postings)
    val interPairs = postings
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).cast("int").as("inter_cnt"))
    time("j39: postings+paircount")(interPairs)
    time("j39: full jaccardPairs")(Dedup.jaccardPairs(docs, "doc_id", "text"))

    spark.stop()
  }
}
