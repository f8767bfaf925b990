package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling exponents for the suite's most expensive GATED queries
  * (r15 verdict #1): run each query unmodified — same `(spark, sfDir)`
  * entry point the correctness gate uses — against corpus-widened COPIES
  * of its input tables at multipliers `1, 2, 4, …`, time full executions
  * (noop write, the Bench discipline), and fit the per-query scaling
  * exponent `e` in `t ∝ n^e` by least squares on (ln k, ln t).
  *
  * Widening is REALISTIC, not adversarial (that's [[ScaleSmoke]]'s job):
  * a 10× corpus has 10× the duplicate CLUSTERS, not 10×-wider clusters, so
  * every copy is structure-preserving but cross-copy DISJOINT:
  *
  *  - `documents`: copy `i` prefixes every token with `c{i}_` — a
  *    bijective token rename (the `_` keeps copy indices prefix-free), so
  *    within-copy shingle/Jaccard/MinHash structure is EXACTLY the
  *    original's, while cross-copy vocabularies are disjoint
  *    (no cross-copy near-dup pairs, cluster count grows ×k).
  *  - `embeddings`: copy `i` cyclically rotates the 64-dim vector by
  *    `7i mod 64` — an orthogonal transform, so within-copy cosines (and
  *    the planted-twin geometry q61 relies on) are EXACTLY preserved.
  *  - `customer`: copy `i` shifts `c_custkey` by `i·10⁸` and `c_nationkey`
  *    by `i·100` — q168's blocking keys replicate, so block COUNT grows ×k
  *    at constant block size (how a deployment's blocking actually scales).
  *  - `events`: copy `i` shifts `user_id`/`event_id` — new users, same
  *    per-user behavior; q297's duel volume grows ×k at constant item set.
  *
  * Copy 0 is byte-identical input, so the ×1 point cross-checks BENCH.
  *
  * `runMain graft.tools.ScaleProbe [sfDir] [outJson] [multsCsv] [queriesCsv]`
  * Output: one JSON object per query with per-mult seconds, the OLS
  * exponent over all points, and the tail exponent (last two points —
  * where fixed per-query overhead matters least).
  */
object ScaleProbe {

  /** r15 verdict's top-10 by bench cost. */
  val DefaultQueries: Seq[String] = Seq(
    "q194_ppjoin", "q168_er_canonical", "q48_cosine_pairs_lsh",
    "q114_dedup_keep_best", "q108_kmv_distinct", "q61_cosine_lsh_prod",
    "q155_cross_ann", "q297_streaming_bradley_terry",
    "q147_incremental_cc", "q111_cms_freq")

  /** AUTO/SIZED variants (r17): the gate queries for q48/q155 now SHIP the
    * auto-sized default (bandBits = AutoBands -> sizedBandBits from a
    * corpus count), so their DefaultQueries ladders measure the deployment
    * shape directly. These variants cover the knobs whose gate queries
    * keep an EXPLICIT calibration: q61's production base (bandBits 8 at
    * the gate corpus, stepped by the same occupancy law), q84's image
    * chain through the auto default (its gate query pins 3 to stay
    * recall-calibrated against the all-pairs oracle), and q96's SemDeDup
    * at k = AutoK (the gate query pins k = 4, the trained-model shape its
    * oracle unrolls). */
  val SizedVariants: Map[String, (SparkSession, String, Int) => DataFrame] = Map(
    "q61_sized_bands" -> ((s: SparkSession, d: String, mult: Int) => {
      val bb = math.min(16, 8 + ceilLog2(mult))
      val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      graft.operators.Similarity.cosineNearDupPairsLsh(base, "vec_id", "embedding",
        threshold = 0.8, dim = 64, bandBits = bb, bands = 16)
    }),
    // q84's image near-dup through the AUTO default (tier-2 measured the
    // gate shape's bandBits=3 at tail 2.16 — the occupancy law; auto
    // derives the width from the image-corpus count)
    "q84_auto_bands" -> ((s: SparkSession, d: String, mult: Int) => {
      val base = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") % 10 === 0)
      val ids = base.select(col("doc_id").as("media_id"),
          col("doc_id").as("seed"), lit(false).as("perturb"))
        .unionByName(base.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 1000000L).as("media_id"),
            col("doc_id").as("seed"), lit(true).as("perturb")))
      val media = graft.operators.Multimodal.syntheticGrayPngs(ids)
      val feats = graft.operators.Multimodal
        .extractImageFeatures(media, gridW = 8, gridH = 8)
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      graft.operators.Similarity.cosineNearDupPairsLsh(feats, "vec_id", "embedding",
        threshold = 0.99, dim = 64, bands = 32,
        centerForBuckets = true)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // q96's SemDeDup at k = AutoK (tier-2 measured the gate shape's k=4
    // at tail 1.84 — fixed cells mean occupancy, and within-cell pair
    // volume, grow with the corpus; AutoK applies sizedKMeansK's k ∝ n)
    "q96_auto_k" -> ((s: SparkSession, d: String, mult: Int) => {
      val e = Tables.embeddings(s, d)
      val cents = graft.operators.Similarity.trainKMeans(
        e, "vec_id", "embedding", k = graft.operators.Similarity.AutoK,
        iterations = 2, dim = 64)
      graft.operators.Similarity.semDedup(
          e, "vec_id", "embedding", cents, "cid", "centroid", threshold = 0.3)
        .orderBy(col("vec_id"))
    }))

  private def ceilLog2(n: Int): Int =
    if (n <= 1) 0 else 32 - Integer.numberOfLeadingZeros(n - 1)

  private val widened = Set("documents", "embeddings", "customer", "events", "lineitem")

  /** One widened copy (`i` of `k`); `i = 0` is the identity so the ×1 dir
    * replays the gate input bit-for-bit. */
  private def copyOf(spark: SparkSession, sfDir: String, table: String, i: Int): DataFrame = {
    val df = Tables.load(spark, sfDir, table)
    if (i == 0) df
    else table match {
      case "documents" =>
        // token-boundary-safe rename: "c{i}_" prepends to the FIRST
        // non-space char of each token, so runs of spaces can't mint
        // standalone tokens, and the "_" terminator keeps copy indices
        // prefix-free ("c1_1x" from copy 1 can never equal "c11_x" from
        // copy 11) — the r16 "(^| )" form failed both (r16 ADVICE)
        df.withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(^|\\s)(\\S)", "$1c" + i + "_$2"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      case "embeddings" =>
        val s = (i * 7) % 64
        val rotated =
          if (s == 0) col("embedding")
          else concat(slice(col("embedding"), s + 1, 64 - s), slice(col("embedding"), 1, s))
        df.withColumn("vec_id", col("vec_id") + lit(i.toLong * 200000000L))
          .withColumn("embedding", rotated)
      case "customer" =>
        df.withColumn("c_custkey", col("c_custkey") + lit(i.toLong * 100000000L))
          .withColumn("c_nationkey", col("c_nationkey") + lit(i * 100))
      case "events" =>
        df.withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(i.toLong * 100000L))
      case "lineitem" =>
        // fresh orders, same per-order line structure; flag/status/value
        // distributions (the analytics strata) replicate untouched
        df.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 1000000000L))
      case other => throw graft.core.GraftError(s"no widening rule for $other")
    }
  }

  /** Materialize the ×k input dir: widened tables as parquet, the rest as
    * filesystem copies (single-file tables in the driver's testdata). */
  private[tools] def buildDir(spark: SparkSession, sfDir: String, outDir: String, k: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    Tables.all.foreach { t =>
      val dst = s"$outDir/$t.parquet"
      if (widened(t) && k > 1)
        (0 until k).map(copyOf(spark, sfDir, t, _)).reduce(_ unionByName _)
          .write.mode("overwrite").parquet(dst)
      else
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sfDir/$t.parquet"), java.nio.file.Paths.get(dst),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** OLS slope of ln t on ln k. */
  private def fit(points: Seq[(Int, Double)]): Double = {
    val xs = points.map(p => math.log(p._1.toDouble))
    val ys = points.map(p => math.log(p._2))
    val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = xs.map(x => (x - mx) * (x - mx)).sum
    num / den
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.drop(1).headOption.getOrElse("/tmp/scaleprobe.json")
    val mults = args.drop(2).headOption.getOrElse("1,2,4,10")
      .split(',').map(_.trim.toInt).toSeq.sorted
    val names = args.drop(3).headOption
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultQueries)
    require(mults.nonEmpty && mults.head >= 1, s"bad mults: $mults")
    names.foreach(n => require(
      SparkEntry.queries.contains(n) || SizedVariants.contains(n), s"unknown query $n"))

    val spark = GraftSession.local("graft-scale-probe")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val load0 = osBean.getSystemLoadAverage

    val work = java.nio.file.Files.createTempDirectory("graft-scaleprobe").toString
    mults.foreach { k =>
      buildDir(spark, sfDir, s"$work/x$k", k)
      println(s"[probe] built x$k")
    }

    // per-(query, mult) timing with ScaleSmoke's untimed inter-stage
    // cleanup: unpersist only RDDs the stage itself pinned, then GC
    def timeOne(name: String, dir: String, mult: Int): Double = {
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      SizedVariants.get(name)
        .map(_(spark, dir, mult))
        .getOrElse(SparkEntry.queries(name)(spark, dir))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
      System.gc()
      dt
    }

    // min-of-3 per ladder cell (r16 verdict #5): the bench's own protocol,
    // so a single noisy cell (the r16 q168 ×4 inversion) self-adjudicates —
    // the fit runs on per-cell minima and the JSON carries every sample
    val samplesPerCell = 3

    // staged protocol (r17 verdict #2): a multi-ladder battery saturates
    // the box for an hour (SCALEPROBE_r17 ran loadavg 1.0 -> 10.1), so
    // tail cells of LATER ladders time against the probe's own heat.
    // Before each cell: wait for the 1-minute loadavg to decay under
    // `coolLoad` (env GRAFT_PROBE_COOL_LOAD, default 2.5; <= 0 disables),
    // bounded by GRAFT_PROBE_COOL_MAX_SEC (default 240 s) so a busy
    // shared box cannot stall the probe forever — and RECORD the load
    // observed at cell start in the JSON, so a hot cell is visible
    // instead of argued about.
    val coolLoad = sys.env.get("GRAFT_PROBE_COOL_LOAD").map(_.toDouble).getOrElse(2.5)
    val coolMaxSec = sys.env.get("GRAFT_PROBE_COOL_MAX_SEC").map(_.toInt).getOrElse(240)
    def coolDown(): Double = {
      val deadline = System.nanoTime() + coolMaxSec * 1000000000L
      var load = osBean.getSystemLoadAverage
      while (coolLoad > 0 && load > coolLoad && System.nanoTime() < deadline) {
        Thread.sleep(10000)
        load = osBean.getSystemLoadAverage
      }
      load
    }

    val results = names.map { name =>
      // untimed per-query warm-up at the smallest mult: JVM/Spark startup,
      // codegen, and (for streaming drains) the first-stream init otherwise
      // bill to the ×1 cell and corrupt the fit (measured: q297's ×1 read
      // 2× its warm time when only a foreign query had warmed the session)
      timeOne(name, s"$work/x${mults.head}", mults.head)
      val cells = mults.map { k =>
        val cellLoad = coolDown()
        val samples = (1 to samplesPerCell).map(_ => timeOne(name, s"$work/x$k", k))
        println(f"[probe] $name%-30s x$k%-3d min=${samples.min}%8.2f s " +
          f"load0=$cellLoad%.2f " +
          s"samples=${samples.map(t => f"$t%.2f").mkString("[", ",", "]")}")
        (k, samples.min, samples, cellLoad)
      }
      val times = cells.map(c => c._1 -> c._2)
      val expAll = fit(times)
      val expTail =
        if (times.size >= 2) {
          val Seq(a, b) = times.takeRight(2).toSeq
          math.log(b._2 / a._2) / math.log(b._1.toDouble / a._1)
        } else Double.NaN
      println(f"[probe] $name%-30s exponent=$expAll%5.2f tail=$expTail%5.2f")
      (name, cells, expAll, expTail)
    }

    val load1 = osBean.getSystemLoadAverage
    val json = new StringBuilder("{\"sf_base\":\"").append(sfDir)
      .append("\",\"mults\":[").append(mults.mkString(","))
      .append(s"],\"samples_per_cell\":$samplesPerCell")
      .append(s",\"loadavg\":[$load0,$load1],\"queries\":{")
    json.append(results.map { case (name, cells, e, et) =>
      s""""$name":{"times":{${cells.map(c => s""""${c._1}":${f"${c._2}%.3f"}""").mkString(",")}},""" +
        s""""samples":{${cells.map(c =>
          s""""${c._1}":[${c._3.map(t => f"$t%.3f").mkString(",")}]""").mkString(",")}},""" +
        s""""cell_load0":{${cells.map(c =>
          s""""${c._1}":${f"${c._4}%.2f"}""").mkString(",")}},""" +
        s""""exponent":${f"$e%.3f"},"exponent_tail":${f"$et%.3f"}}"""
    }.mkString(","))
    json.append("}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json.toString)
    spark.stop()
  }
}
