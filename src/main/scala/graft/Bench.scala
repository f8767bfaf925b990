package graft
import java.nio.file.{Files, Paths}

/** Benchmark main. Forces FULL execution of every query with a `noop`-format
  * write (a bare `.count()` lets Catalyst collapse projections/sorts into a
  * parquet row-count, which benchmarks nothing). One warm-up query first so
  * JVM/Spark startup isn't billed to whichever query happens to run first.
  *
  * PROTOCOL (recorded in the output JSON as `"protocol"`): windowed
  * min-of-2.
  *
  *  - Each query runs TWICE and the min is reported: single-shot numbers on
  *    a shared box swing ±30%+ on GC/JIT pauses (round 3 recorded three
  *    phantom 4-6x "regressions" that a re-run erased), and the min of two
  *    is the cheapest estimator that discards a one-off pause while still
  *    measuring a full cold execution of the plan.
  *  - The SparkSession is RECYCLED every 16 measured queries (untimed, with
  *    one untimed re-warm execution after each recycle). Rationale
  *    (SURVEY §8.0, three rounds of adjudication): a single long-lived
  *    session accumulates state the untimed GC can't fully reclaim — status
  *    store history, broadcast torrents, listener queues — so a query's
  *    measurement depended on its POSITION in the suite, and the tax grew
  *    with suite size (201 -> 257 queries drifted the shared total 1.07x
  *    with every individual query in-band when re-run solo). Bounding the
  *    window at 16 makes every query's environment "a session that has run
  *    at most 16+1 queries" REGARDLESS of how many queries the suite has —
  *    numbers stay comparable across rounds as the suite grows, and
  *    approximate the clean-solo protocol at ~1/16 of its restart cost.
  *
  * Every query body is re-entrant: the stateful pipelines (q23/q44/q47/q49)
  * create fresh checkpoint dirs / fixture servers per invocation, and
  * bucketed-layout queries re-create their tables in the new session's temp
  * warehouse.
  *
  * Output: one JSON line on stdout AND the same JSON written to
  * `$SPARK_GRAFT_BENCH_OUT` (default `bench_out.json` in the CWD) so the
  * driver can parse it without scraping sbt log tails.
  */
object Bench {
  private val WindowSize = 16

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var spark = GraftSession.local("graft-bench")

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // UNTIMED inter-query cleanup — the suite-vs-isolated artifact fix
      // (SURVEY §8.0): releasing caches and forcing the GC between queries
      // pays the cleanup cost on the untimed boundary instead of landing a
      // full-GC storm in the middle of whichever query is running.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      dt
    }

    // Warm-up: executes the whole stack (parquet footer reads, codegen,
    // shuffle machinery) once; not reported. Re-run after every session
    // recycle so no measured query pays the new session's first-run costs.
    def warm(): Unit = exec("q01_agg_pricing")
    warm()

    // Optional args restrict the run to the named queries (local iteration);
    // the driver invokes with no args and gets the full sorted suite. A
    // typo'd name must fail loudly, not silently measure nothing.
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"[bench] unknown queries: ${unknown.mkString(", ")}; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val names =
      if (args.nonEmpty) SparkEntry.queries.keys.toSeq.sorted.filter(args.contains)
      else SparkEntry.queries.keys.toSeq.sorted
    // Queries that have produced phantom cross-round "regressions" that
    // isolated re-measurement erased (SURVEY §8.0: r5, r6, q39 in r7, q59
    // and q35 in r8); one extra sample tightens exactly the set whose
    // noise has repeatedly demanded manual adjudication.
    val minOfThree = Set("q32_dedup_simhash", "q48_cosine_pairs_lsh", "q39_ngram_jaccard",
      "q59_repetition", "q35_tfidf")
    // min-of-two (three for the adjudicated set); a failed run (-1) wins
    // the min, keeping the failure marker
    val results = names.zipWithIndex.map { case (n, i) =>
      if (i > 0 && i % WindowSize == 0) {
        // untimed session recycle on the window boundary
        spark.stop()
        spark = GraftSession.local("graft-bench")
        warm()
      }
      val runs = if (minOfThree(n)) 3 else 2
      n -> Seq.fill(runs)(exec(n)).min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","protocol":"min2-window$WindowSize","queries":$qs,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    Files.writeString(Paths.get(out), json + "\n")
    println(json)
    // The driver snapshots only the last ~2000 log chars; the full line
    // above (~10 KB at 259 queries) truncates there and parses as null
    // (BENCH_r12 `"parsed": null`). Emit a compact, tail-sized summary as
    // the LAST line so the snapshot is self-describing: headline total,
    // protocol, failure list, and the 5 slowest queries inline; the full
    // per-query map lives in `out` (bench_out.json, committed per round).
    val failed = results.filter(_._2 < 0).map(_._1)
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","protocol":"min2-window$WindowSize","n_queries":${names.size},"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"slowest5":$slowest,"queries_in":"$out","sf":"$sfDir"}""")
    spark.stop()
  }
}
