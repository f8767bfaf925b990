package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedEquiJoin on the pure shuffle path is 1:1 with the plain join") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force the shuffle join the salt exists for
    try {
      val big = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      val dim = Seq(("A", "returned"), ("N", "normal"), ("R", "refunded"))
        .toDF("l_returnflag", "flag_label")
      val salted = Skew.saltedEquiJoin(big, dim, Seq("l_returnflag"), col("l_orderkey"), saltBuckets = 8)
      val plain = big.join(dim, "l_returnflag")

      val plan = salted.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"expected a shuffle join:\n$plan")

      def profile(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("l_returnflag", "flag_label")
          .agg(count(lit(1)).as("cnt"), sum($"l_quantity".cast("decimal(28,4)")).as("q"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
      assert(profile(salted) == profile(plain))
      assert(salted.count() == big.count(), "inner join on a covering dim keeps every row")
    } finally spark.conf.set(key, prev)
  }

  test("capPerKey equals the row_number window form under forced skew; no per-key window in the plan") {
    import org.apache.spark.sql.expressions.Window
    // one pathologically hot key (80% of rows) + a tail of normal keys —
    // the regime where a partitionBy-key window serializes
    val rows = (1L to 8000L).map(i => ("hot", i)) ++
      (1L to 50L).flatMap(k => (1L to 40L).map(i => (s"dom$k", k * 1000000L + i)))
    val df = rows.toDF("domain", "item_id").repartition(16)
    for (k <- Seq(1, 5)) {
      val capped = Skew.capPerKey(df, Seq("domain"), "item_id", k)
        .as[(String, Long)].collect().toSet
      val windowed = df
        .withColumn("rn", row_number().over(Window.partitionBy("domain").orderBy("item_id")))
        .filter(col("rn") <= k).drop("rn")
        .as[(String, Long)].collect().toSet
      assert(capped == windowed, s"k=$k: " +
        s"only-capped=${(capped -- windowed).take(3)} only-window=${(windowed -- capped).take(3)}")
    }
    // the scale claim itself: no Window over the raw key partition
    val plan = Skew.capPerKey(df, Seq("domain"), "item_id", 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"capPerKey must not plan a per-key window:\n$plan")
  }

  test("capPerKey: NULL order values neither survive nor displace real k-smallest values") {
    val df = Seq(
      (Some(10L), "a"), (None: Option[Long], "a"), (Some(20L), "a"), (Some(30L), "a"),
      (Some(5L), "b"))
      .toDF("item_id", "domain")
    val kept = Skew.capPerKey(df, Seq("domain"), "item_id", k = 2)
      .select("domain", "item_id").as[(String, Option[Long])].collect().toSet
    // the null row is gone AND did not consume one of a's two slots
    assert(kept == Set(("a", Some(10L)), ("a", Some(20L)), ("b", Some(5L))))
  }

  test("groupedRank equals the per-group window rank; constant-value edge; layout-independent") {
    val df = (1L to 5000L).map(i => (s"g${i % 3}", i * 37 % 1000, i)).toDF("g", "v", "id")
      .repartition(11)
    val got = Skew.groupedRank(df, Seq("g"), "v", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
    val ref = df.withColumn("rank", row_number().over(w).cast("long") - 1)
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
    // all-equal values: every row ranks by the tie column alone
    val const = (1L to 100L).map(i => ("g", 7L, i)).toDF("g", "v", "id")
    val gotC = Skew.groupedRank(const, Seq("g"), "v", "id")
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert((1L to 100L).forall(i => gotC(i) == i - 1))
  }

  test("bloomPrefilteredJoin equals the plain join and the probe actually prunes") {
    val fact = (1L to 5000L).map(i => (i % 500, i)).toDF("fk", "payload")
    val dim = (0L until 500L).filter(_ % 25 == 0).map(k => (k, s"d$k")).toDF("dk", "name")
    val got = Skew.bloomPrefilteredJoin(fact, dim, "fk", "dk",
      mBits = 1 << 12, kHashes = 4)
    val plain = fact.join(dim, col("fk") === col("dk"))
    assert(got.except(plain).isEmpty && plain.except(got).isEmpty,
      "bloom prefilter must never change the join result (no false negatives)")
    // the probe filter prunes most non-matching fact rows pre-shuffle
    val sketch = Sketches.bloomSketch(dim, col("dk"), 1 << 12, 4, "bloomjoin")
    val bitmap = Sketches.collectBloom(sketch, 1 << 12)
    val survivors = fact.filter(Sketches.bloomProbe(col("fk"), bitmap, 1 << 12, 4, "bloomjoin"))
      .count()
    // true matches: 20 of 500 keys -> 200 rows; allow fp slack
    assert(survivors >= 200L && survivors < 1000L,
      s"probe kept $survivors of 5000 rows — pruning broken or fp rate off")
  }

  test("MinKLongs buffer is bounded at k through reduce and merge, in any order") {
    val agg = new graft.functions.MinKLongs(3)
    // reduce a hot stream of 10k values: buffer never exceeds k
    var b = agg.zero
    val rnd = new scala.util.Random(7)
    val vals = (1 to 10000).map(_ => rnd.nextLong() % 1000000)
    vals.foreach { v =>
      b = agg.reduce(b, v)
      assert(b.length <= 3 && b == b.sorted)
    }
    assert(agg.finish(b) == vals.sorted.take(3))
    // merge of two independently reduced halves equals the whole
    val (h1, h2) = vals.splitAt(5000)
    val m = agg.merge(
      h1.foldLeft(agg.zero)(agg.reduce), h2.foldLeft(agg.zero)(agg.reduce))
    assert(m == vals.sorted.take(3).toVector)
  }

  test("winsorizeByGroup: clips to each group's own band, keeps every row") {
    // g1: 1..100 -> p05/p95 via the interpolated percentile: 5.95 / 95.05
    // g2: constant 7 -> band [7, 7], everything maps to 7
    val rows = ((1 to 100).map(v => ("g1", v)) ++ (1 to 20).map(_ => ("g2", 7)))
      .toDF("grp", "v")
    val out = Skew.winsorizeByGroup(rows, Seq("grp"), "v", 0.05, 0.95)
      .select(col("grp"), col("v"), col("winsorized"))
      .as[(String, Int, Double)].collect()
    assert(out.length == 120)
    val g1 = out.filter(_._1 == "g1")
    assert(g1.filter(_._2 == 1).forall(_._3 == 5.95))
    assert(g1.filter(_._2 == 100).forall(_._3 == 95.05))
    assert(g1.filter(_._2 == 50).forall(_._3 == 50.0))
    assert(out.filter(_._1 == "g2").forall(_._3 == 7.0))
  }

  test("madOutliers: one wild value can't mask itself; constant groups never flag") {
    // g1: bulk at 10±1 with one wild 1000 — a stddev z would be dragged by
    // the outlier itself; MAD isn't
    val rows = ((1 to 20).map(i => ("g1", i.toLong, 10.0 + (i % 3) - 1)) :+ ("g1", 99L, 1000.0))
      .++((1 to 5).map(i => ("g2", 100L + i, 5.0)))
      .toDF("grp", "id", "v")
    val out = Skew.madOutliers(rows, Seq("grp"), "v", threshold = 3.5)
      .select(col("id"), col("robust_z"), col("is_outlier"))
      .as[(Long, Option[Double], Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(99L)._2, "the wild value must flag")
    assert((1 to 20).forall(i => !out(i.toLong)._2), "the bulk must not flag")
    // constant group: MAD = 0 -> null scores, never flags
    assert((101 to 105).forall(i => out(i.toLong) == ((None, false))))
  }

  test("trimmedMean: drops the tails, rejects float columns loudly") {
    val rows = ((1 to 10).map(v => ("g", v.toLong)) :+ ("g", 1000000L)).toDF("grp", "v")
    val r = Skew.trimmedMean(rows, Seq("grp"), "v", frac = 0.1)
      .select(col("kept_rows"), col("trimmed_mean")).as[(Long, Double)].head()
    // p10/p90 of 1..10,1e6: the million lands outside the band
    assert(r._1 < 11 && r._2 < 100.0, s"outlier must be trimmed, got $r")
    val err = intercept[IllegalArgumentException] {
      Skew.trimmedMean(Seq(("g", 1.5)).toDF("grp", "v"), Seq("grp"), "v", 0.1)
    }
    assert(err.getMessage.contains("integer column"))
  }
}
