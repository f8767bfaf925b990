package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs: DataFrame = graft.Tables.documents(spark, sf)

  /** Per-source distinct 3-token shingles — the element stream every KMV/
    * HLL test here sketches. ~1.3k distinct per source at sf0.01; fewer
    * but still hundreds at sf0.001. */
  private def shingleStream: DataFrame =
    docs.select(col("source"), explode(Dedup.shingles(col("text"))).as("sh"))

  // ------------------------------------------------------------- MinKDistinct

  test("MinKDistinctLongs property: any reduce/merge interleaving equals sorted-distinct-take-k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCase = for {
      k <- Gen.choose(1, 16)
      xs <- Gen.listOf(Gen.choose(-50L, 50L)) // small range forces duplicates
      split <- Gen.choose(0, math.max(xs.size, 1))
    } yield (k, xs, split)
    val prop = Prop.forAll(genCase) { case (k, xs, split) =>
      val agg = new graft.functions.MinKDistinctLongs(k)
      val (l, r) = xs.splitAt(split min xs.size)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      merged == xs.distinct.sorted.take(k).toVector
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("MinKDistinctLongs keeps the k smallest DISTINCT values, sorted") {
    val agg = udaf(new graft.functions.MinKDistinctLongs(4))
    val out = Seq(9L, 3L, 3L, 7L, 1L, 9L, 5L, 1L, 8L).toDF("v")
      .agg(agg(col("v")).as("mk")).as[Seq[Long]].head()
    assert(out == Seq(1L, 3L, 5L, 7L))
  }

  test("MinKDistinctLongs merge drops duplicates across partials") {
    val a = new graft.functions.MinKDistinctLongs(3)
    val m = a.merge(Vector(1L, 3L, 5L), Vector(1L, 2L, 5L))
    assert(m == Vector(1L, 2L, 3L))
    // reduce on a present value is a no-op
    assert(a.reduce(Vector(1L, 3L), 3L) == Vector(1L, 3L))
  }

  // ------------------------------------------------------------------- KMV

  test("KMV sketch below k is the exact distinct hash set (estimate exact)") {
    val k = 4096 // far above any per-source shingle count at sf0.001
    val sk = Sketches.kmvSketch(shingleStream, Seq("source"), col("sh"), k, "kmv")
      .withColumn("est", Sketches.kmvDistinct(col("kmv"), k))
    val exact = shingleStream.groupBy("source").agg(countDistinct(col("sh")).as("cd"))
    val joined = sk.join(exact, "source")
      .select(col("source"), col("est"), col("cd").cast("double")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getDouble(1) == r.getDouble(2), s"source ${r.getString(0)}"))
  }

  test("KMV estimate lands within the expected relative error once the sketch fills") {
    val k = 64
    val sk = Sketches.kmvSketch(shingleStream, Seq("source"), col("sh"), k, "kmv")
      .withColumn("est", Sketches.kmvDistinct(col("kmv"), k))
    val exact = shingleStream.groupBy("source").agg(countDistinct(col("sh")).as("cd"))
    val rows = sk.join(exact, "source")
      .select(col("est"), col("cd").cast("double")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, cd) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(est - cd) / cd < 0.5, s"est $est vs exact $cd") // ~4/sqrt(64)
    }
  }

  test("KMV sketches merge losslessly across shards (merge of halves == whole)") {
    val k = 64
    val whole = Sketches.kmvSketch(docs.select(explode(Dedup.shingles(col("text"))).as("sh")),
      Seq.empty, col("sh"), k, "kmv").as[Seq[Long]].head()
    val halves = docs
      .withColumn("half", (col("doc_id") % 2).cast("int"))
      .select(col("half"), explode(Dedup.shingles(col("text"))).as("sh"))
    val parts = Sketches.kmvSketch(halves, Seq("half"), col("sh"), k, "kmv")
    val merged = parts.agg(
      slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))), 1, k).as("m"))
      .as[Seq[Long]].head()
    assert(merged == whole)
  }

  test("kmvOverlap: identical sets estimate Jaccard 1, disjoint sets 0") {
    val k = 32
    val a = Sketches.kmvSketch((1 to 500).toDF("v"), Seq.empty, col("v"), k, "ov")
      .select(col("kmv").as("ka"))
    val same = a.crossJoin(a.select(col("ka").as("kb")))
      .select(Sketches.kmvOverlap(col("ka"), col("kb"), k): _*).head()
    assert(same.getDouble(0) == 1.0)
    assert(same.getDouble(1) == same.getDouble(2)) // union == intersection

    val b = Sketches.kmvSketch((10001 to 10500).toDF("v"), Seq.empty, col("v"), k, "ov")
      .select(col("kmv").as("kb"))
    val disj = a.crossJoin(b)
      .select(Sketches.kmvOverlap(col("ka"), col("kb"), k): _*).head()
    assert(disj.getDouble(0) == 0.0)
    assert(disj.getDouble(2) == 0.0)
  }

  // ------------------------------------------------------------------- HLL

  test("HLL registers are duplicate-insensitive and estimate lands in band") {
    val p = 6 // m = 64
    val li = graft.Tables.lineitem(spark, sf).select(col("l_returnflag"), col("l_orderkey"))
    val regs = Sketches.hllRegisters(li, Seq("l_returnflag"), col("l_orderkey"), p, "hll")
    val est = Sketches.hllEstimate(regs, Seq("l_returnflag"), p)
    val exact = li.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")).as("cd"))
    val rows = est.join(exact, "l_returnflag")
      .select(col("hll_est"), col("cd").cast("double")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (e, cd) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(e - cd) / cd < 0.35, s"est $e vs exact $cd") // ~2.6σ at m=64
    }
    // duplicate-insensitivity: registers over the distinct element set match
    val regsD = Sketches.hllRegisters(li.distinct(), Seq("l_returnflag"), col("l_orderkey"), p, "hll")
    assert(regs.orderBy("l_returnflag", "bucket").collect().toSeq ==
      regsD.orderBy("l_returnflag", "bucket").collect().toSeq)
  }

  test("hllRollingEstimate: merged per-period registers equal a from-scratch sketch per window") {
    val p = 6
    val rows = (1L to 2000L).map(i => (i % 10, i * 13 % 400)).toDF("day", "uid")
    val perDay = Sketches.hllRegisters(rows, Seq("day"), col("uid"), p, "roll")
    val rolling = Sketches.hllRollingEstimate(perDay, "day", p, windowPeriods = 3)
      .select(col("day"), col("hll_est"), col("zero_regs"))
    // from-scratch reference: registers over each window's raw rows
    val ref = (0L until 10L).map { t =>
      val win = rows.filter(col("day").between(t - 2, t))
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(win.withColumn("day", lit(t)), Seq("day"), col("uid"), p, "roll"),
        Seq("day"), p).select(col("day"), col("hll_est"), col("zero_regs"))
      est
    }.reduce(_ unionByName _)
    assert(rolling.except(ref).isEmpty && ref.except(rolling).isEmpty,
      "rolling merge must equal the sketch of each window's union")
  }

  test("HLL small-range correction engages below 2.5m with empty buckets") {
    val p = 6
    val tiny = (1 to 20).toDF("v") // 20 distinct << 2.5 * 64
    val regs = Sketches.hllRegisters(tiny, Seq.empty, col("v"), p, "hll")
    val est = Sketches.hllEstimate(regs, Seq.empty, p).select("hll_est", "zero_regs").head()
    val zeros = est.getInt(1)
    assert(zeros > 0)
    val expected = 64.0 * math.log(64.0 / zeros)
    assert(math.abs(est.getDouble(0) - expected) < 1e-9)
    assert(math.abs(est.getDouble(0) - 20.0) / 20.0 < 0.3)
  }

  // ------------------------------------------------------------- Count-Min

  test("CMS estimates dominate exact counts; equality at generous width; shards merge") {
    val d = 4; val w = 2048
    val elems = shingleStream.select(col("sh"))
    val sketch = Sketches.cmsSketch(elems, col("sh"), d, w, "cms")
    val exact = elems.groupBy("sh").agg(count(lit(1)).as("exact"))
    val probes = exact.orderBy(col("exact").desc, col("sh")).limit(8).select("sh")
    val est = Sketches.cmsLookup(sketch, probes, "sh", d, w, "cms")
    val rows = est.join(exact, "sh").select(col("sh"), col("cms_est"), col("exact")).collect()
    assert(rows.length == 8)
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2), s"CMS must overcount: ${r}"))

    // pre-aggregated weighted build == raw build
    val weighted = Sketches.cmsSketch(exact, col("sh"), d, w, "cms", weightCol = col("exact"))
    assert(sketch.orderBy("r", "b").collect().toSeq == weighted.orderBy("r", "b").collect().toSeq)

    // shard mergeability: counter-wise sum of half sketches == whole sketch
    val h0 = Sketches.cmsSketch(docs.filter(col("doc_id") % 2 === 0)
      .select(explode(Dedup.shingles(col("text"))).as("sh")), col("sh"), d, w, "cms")
    val h1 = Sketches.cmsSketch(docs.filter(col("doc_id") % 2 === 1)
      .select(explode(Dedup.shingles(col("text"))).as("sh")), col("sh"), d, w, "cms")
    val mergedCms = h0.unionByName(h1).groupBy("r", "b").agg(sum("cnt").as("cnt"))
    assert(mergedCms.orderBy("r", "b").collect().toSeq ==
      sketch.orderBy("r", "b").collect().toSeq)
  }

  // ----------------------------------------------------------------- Bloom

  test("Bloom has NO false negatives; false positives stay under the formula bound") {
    val m = 4096; val kh = 3
    val history = docs.filter(col("doc_id") % 2 === 0)
    val bloom = Sketches.bloomSketch(history, col("text"), m, kh, "bl")
    val probed = Sketches.bloomMightContain(
      bloom, docs.select(col("doc_id"), col("text")), "text", m, kh, "bl")
    val rows = probed.select(col("doc_id"), col("might_contain")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // one-sided: every history member MUST probe true
    rows.filter(_._1 % 2 == 0).foreach { case (id, mc) => assert(mc, s"false negative on $id") }
    // non-members: fp rate ~ (1-e^(-kn/m))^k; allow 4x slack on few hundred trials
    val nonMembers = rows.filter(_._1 % 2 == 1)
    val n = history.count().toDouble
    val fpBound = math.pow(1 - math.exp(-kh * n / m), kh)
    val fpRate = nonMembers.count(_._2).toDouble / nonMembers.size
    assert(fpRate <= 4 * fpBound + 1e-9, s"fp rate $fpRate vs bound $fpBound")
  }

  test("Bloom shard filters merge word-wise (bit_or of halves == whole)") {
    val m = 1024; val kh = 3
    val whole = Sketches.bloomSketch(docs, col("text"), m, kh, "blm")
    val h0 = Sketches.bloomSketch(docs.filter(col("doc_id") % 2 === 0), col("text"), m, kh, "blm")
    val h1 = Sketches.bloomSketch(docs.filter(col("doc_id") % 2 === 1), col("text"), m, kh, "blm")
    val merged = h0.unionByName(h1).groupBy("word").agg(expr("bit_or(bits)").as("bits"))
    assert(merged.orderBy("word").collect().toSeq == whole.orderBy("word").collect().toSeq)
  }

  test("Bloom probe passthrough keeps non-element probe columns") {
    val m = 256; val kh = 2
    val bloom = Sketches.bloomSketch(Seq("a", "b").toDF("e"), col("e"), m, kh, "blp")
    val probes = Seq(("a", 1), ("zz", 2)).toDF("e", "tag")
    val out = Sketches.bloomMightContain(bloom, probes, "e", m, kh, "blp")
    assert(out.columns.toSeq == Seq("e", "tag", "might_contain"))
    val byTag = out.collect().map(r => r.getInt(1) -> r.getBoolean(2)).toMap
    assert(byTag(1)) // member always true
  }

  test("bloomProbe (per-row bitmap UDF) is decision-identical to the join form") {
    val m = 2048; val kh = 3
    val history = docs.filter(col("doc_id") % 2 === 0)
    val sketch = Sketches.bloomSketch(history, col("text"), m, kh, "blx")
    val joinForm = Sketches.bloomMightContain(
      sketch, docs.select(col("doc_id"), col("text")), "text", m, kh, "blx")
      .select(col("doc_id"), col("might_contain")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bitmap = Sketches.collectBloom(sketch, m)
    val exprForm = docs
      .select(col("doc_id"), Sketches.bloomProbe(col("text"), bitmap, m, kh, "blx").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(exprForm == joinForm)
    // collectBloom guard is loud, not silent
    val e = intercept[IllegalArgumentException](Sketches.collectBloom(sketch, m, maxBits = 32))
    assert(e.getMessage.contains("maxBits"))
  }

  test("CMS lookup of an element absent from every bucket estimates 0") {
    val d = 2; val w = 64
    val sketch = Sketches.cmsSketch(Seq("a", "b").toDF("e"), col("e"), d, w, "cms0")
    // an element whose (r, b) cells were never written estimates 0 via the
    // left-join coalesce; collisions could lift it, so probe many and
    // require at least one zero (w=64, 2 elements -> overwhelmingly likely)
    val probes = (1 to 50).map(i => s"zz$i").toDF("e")
    val ests = Sketches.cmsLookup(sketch, probes, "e", d, w, "cms0")
      .agg(min(col("cms_est"))).head().getLong(0)
    assert(ests == 0L)
  }
}
