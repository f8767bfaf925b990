package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resampleForwardFill: gaps carry the last value, grid spans min..max per key, no cross-key leakage") {
    // key A: events in buckets 0, 1, 4 (gap 2-3); key B: single bucket 7
    val rows = Seq(
      ("A", 5L, 10L), ("A", 8L, 11L),     // bucket 0 -> max 11
      ("A", 12L, 20L),                    // bucket 1
      ("A", 45L, 99L),                    // bucket 4
      ("B", 77L, 7L))                     // bucket 7
    val df = rows.toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, "k", "t", "v", bucketWidth = 10L)
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("A", 0L, 11L), ("A", 1L, 20L),
      ("A", 2L, 20L), ("A", 3L, 20L),     // forward-filled gap
      ("A", 4L, 99L),
      ("B", 7L, 7L)))                     // B's grid never inherits A's span or values
  }

  test("resampleForwardFill: negative timestamps bucket by floor division, not truncation") {
    val df = Seq(("k", -25L, 1L), ("k", 5L, 2L)).toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, "k", "t", "v", bucketWidth = 10L)
      .as[(String, Long, Long)].collect().map { case (_, b, v) => (b, v) }.toMap
    // floor(-25/10) = -3 (NOT -2): grid is -3..0 with the gap filled
    assert(out == Map(-3L -> 1L, -2L -> 1L, -1L -> 1L, 0L -> 2L))
  }

  test("rollingZScore: leakage-free baseline, spike flags, constant series and warm-up stay null") {
    // key a: 10,10,10,10,50 — the spike's baseline is the four 10s (sd=0!)
    //   so even the spike cannot score against a zero-variance history;
    // key b: 1,3,1,3,100 — nonzero variance, the 100 must flag, and the
    //   flagged row's own value must NOT inflate its baseline.
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 10.0), ("a", 5L, 50.0),
      ("b", 1L, 1.0), ("b", 2L, 3.0), ("b", 3L, 1.0), ("b", 4L, 3.0), ("b", 5L, 100.0))
      .toDF("k", "t", "v")
    val got = TimeSeries.rollingZScore(rows, "k", Seq("t"), "v", lookback = 4, threshold = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toMap
    // warm-up: first row has 0 priors, second has 1 — both null, never flag
    assert(got(("a", 1L)) == (None, false) && got(("b", 2L))._1.isEmpty)
    // constant baseline: sd = 0 -> null even for the wild value
    assert(got(("a", 5L)) == (None, false))
    // b's spike: baseline mean 2, sd = 1 -> z = 98, flagged
    assert(got(("b", 5L)) == (Some(98.0), true))
    // a non-spike row with >= 2 priors scores but does not flag
    assert(got(("b", 3L))._1.contains(-1.0) && !got(("b", 3L))._2)
  }

  test("ewmaByKey: hand-computed serial fold, state resets at key boundaries") {
    val rows = Seq(
      ("a", 1L, 8.0), ("a", 2L, 4.0), ("a", 3L, 4.0),
      ("b", 1L, 100.0), ("b", 2L, 0.0)
    ).toDF("k", "t", "value")
    val got = TimeSeries.ewmaByKey(rows, "k", Seq("t"), "value", alpha = 0.25)
      .select(col("k"), col("t"), col("ewma")).as[(String, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // a: 8; .25*4+.75*8 = 7; .25*4+.75*7 = 6.25
    assert(got(("a", 1L)) == 8.0 && got(("a", 2L)) == 7.0 && got(("a", 3L)) == 6.25)
    // b restarts at its own first value — a's state never leaks across keys
    assert(got(("b", 1L)) == 100.0 && got(("b", 2L)) == 75.0)
  }

  test("cusumByKey: sustained small shift accumulates to an alarm a z-window misses") {
    // target 10, slack 1: values at 13 add +2 per row; threshold 5 trips
    // on the 3rd elevated row. Below-target rows feed the negative side.
    val rows = (1L to 6L).map(t => ("u", t, if (t <= 2) 10.0 else 13.0)).toDF("k", "t", "value")
    val got = TimeSeries.cusumByKey(rows, "k", Seq("t"), "value",
      target = 10.0, slack = 1.0, threshold = 5.0)
      .select(col("t"), col("cusum_pos"), col("alarm")).as[(Long, Double, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((0.0, false)) && got(2L) == ((0.0, false)))
    assert(got(3L) == ((2.0, false)) && got(4L) == ((4.0, false)))
    assert(got(5L) == ((6.0, true)) && got(6L) == ((8.0, true)))
    // negative side: a sustained drop alarms symmetrically
    val drop = (1L to 4L).map(t => ("u", t, 6.0)).toDF("k", "t", "value")
    val neg = TimeSeries.cusumByKey(drop, "k", Seq("t"), "value", 10.0, 1.0, 5.0)
      .select(col("t"), col("cusum_neg"), col("alarm")).as[(Long, Double, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(neg(1L) == ((3.0, false)) && neg(2L) == ((6.0, true)))
  }

  test("decayedCounts: half-life arithmetic anchored at the corpus max, recency beats volume") {
    import org.apache.spark.sql.functions.{col, expr}
    val hl = 100.0 // seconds
    // key A: one event AT the anchor + one exactly one half-life old = 1.5
    // key B: three events two half-lives old = 0.75 (volume loses)
    val rows = Seq(
      ("A", 200_000_000L), ("A", 100_000_000L),
      ("B", 0L), ("B", 0L), ("B", 0L))
      .toDF("k", "us")
      .select(col("k"), expr("timestamp_micros(us)").as("ts"))
    val got = TimeSeries.decayedCounts(rows, "k", "ts", hl)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def fl6(x: Double) = graft.functions.Quantize.scaledFloorDouble(x, 6)
    def grid(ages: Seq[Double]) = fl6(
      ages.map(a => math.floor(math.pow(2.0, -a / hl) * 1e9 + 0.5)).sum / 1e9)
    assert(got("A") == ((2L, grid(Seq(0.0, 100.0)))))
    assert(got("B") == ((3L, grid(Seq(200.0, 200.0, 200.0)))))
    assert(got("A")._2 > got("B")._2) // recency beats 3x volume
  }

  test("autocorrelation: alternating series scores -1 at lag 1 and +1 at lag 2; constants null; gaps shorten n") {
    import spark.implicits._
    val alt = (0L to 5L).map(x => ("p", x, x % 2)) ++ (0L to 5L).map(x => ("c", x, 3L))
    val got = TimeSeries.autocorrelation(alt.toDF("k", "x", "y"), "k", "x", "y", maxLag = 2)
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("p", 1)) == ((5L, Some(-1.0))))
    assert(got(("p", 2)) == ((4L, Some(1.0))))
    // constant series: zero variance -> r undefined
    assert(got(("c", 1)) == ((5L, None)))
    // a gap shortens the overlap instead of zero-filling: x=3 missing
    // kills the (2,3) and (3,4) lag-1 pairs
    val gap = Seq(("g", 0L, 1L), ("g", 1L, 5L), ("g", 2L, 2L), ("g", 4L, 7L), ("g", 5L, 3L))
    val g = TimeSeries.autocorrelation(gap.toDF("k", "x", "y"), "k", "x", "y", maxLag = 1)
      .as[(String, Int, Long, Option[Double])].head()
    assert(g._3 == 3L)
  }

  test("kaplanMeier: censoring depletes risk without stepping; extinction forces 0") {
    import spark.implicits._
    // durations/observed: (1,T)(1,T)(2,F)(3,T)(3,F)(4,F):
    // t=1: risk 6, d 2 -> S = 2/3; t=2 censored-only: NO row, risk drops;
    // t=3: risk 3, d 1 -> S = 2/3 * 2/3 = 4/9; t=4 censored-only: no row
    val subj = Seq((1L, true), (1L, true), (2L, false), (3L, true), (3L, false),
      (4L, false)).toDF("dur", "obs")
    val got = TimeSeries.kaplanMeier(subj, "dur", "obs")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == Seq((1L, 6L, 2L), (3L, 3L, 1L)))
    assert(math.abs(got(0)._4 - 2.0 / 3.0) < 2e-6)
    assert(math.abs(got(1)._4 - 4.0 / 9.0) < 2e-6)
    // everyone at risk dies: ln(0) must not be skipped into resurrection
    val ext = Seq((1L, true), (1L, true)).toDF("dur", "obs")
    val e = TimeSeries.kaplanMeier(ext, "dur", "obs")
      .as[(Long, Long, Long, Double)].head()
    assert(e == ((1L, 2L, 2L, 0.0)))
    // extinction at an EARLIER step pins later steps at 0 too
    val ext2 = Seq((1L, true), (2L, true)).toDF("dur", "obs")
    val e2 = TimeSeries.kaplanMeier(ext2, "dur", "obs")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(e2.map(_._4).forall(s => s == 0.5 || s == 0.0) && e2.last._4 == 0.0)
  }

  test("theilSen: one spike can't drag the slope off 1; even-pair median averages; degenerate nulls") {
    import spark.implicits._
    val pts = Seq(
      // g: perfect unit slope with one 100-high outlier day: 6 of 10
      // pairwise slopes are exactly 1, so the median is 1 (OLS gives ~16)
      ("g", 0L, 0L), ("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 100L),
      // h: 3 points -> 3 pair slopes {2, 1, 0}, odd count picks 1
      ("h", 0L, 0L), ("h", 1L, 2L), ("h", 2L, 2L),
      // i: 2 points -> single pair slope 0.5
      ("i", 0L, 0L), ("i", 2L, 1L),
      // j: a single point has no trend
      ("j", 5L, 7L))
      .toDF("k", "x", "y")
    val got = TimeSeries.theilSen(pts, "k", "x", "y")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("g") == ((5L, 10L, Some(1.0))))
    assert(got("h") == ((3L, 3L, Some(1.0))))
    assert(got("i") == ((2L, 1L, Some(0.5))))
    assert(got("j") == ((1L, 0L, None)))
    // even pair count averages the two middle grid slopes
    val even = Seq(("e", 0L, 0L), ("e", 1L, 1L), ("e", 2L, 2L), ("e", 3L, 12L))
      .toDF("k", "x", "y")
    val e = TimeSeries.theilSen(even, "k", "x", "y")
      .as[(String, Long, Long, Option[Double])].head()
    // slopes: (0,1)=1 (0,2)=1 (0,3)=4 (1,2)=1 (1,3)=5.5 (2,3)=10 ->
    // sorted {1,1,1,4,5.5,10}, middles 1 and 4 -> 2.5
    assert(e._2 == 4L && e._3 == 6L && e._4.contains(2.5))
  }

  test("seasonalBaseline: per-day rates over unequal windows; new-slot, collapse, and in-band flags") {
    import spark.implicits._
    def ts(day: Int, h: Int, n: Int) =
      (1 to n).map(i => ("a", f"2024-01-0$day $h%02d:$i%02d:00"))
    val rows = (
      ts(1, 0, 2) ++ ts(2, 0, 4) ++ // pre hour0: 6 over 2 days -> rate 3
        ts(1, 2, 2) ++              // pre hour2: post empty -> ratio 0
        ts(1, 3, 2) ++ ts(2, 3, 2) ++ // pre hour3: rate 2
        ts(5, 0, 9) ++              // post hour0: 9 over 1 day -> ratio 3
        ts(5, 1, 1) ++              // post hour1: NEW slot
        ts(5, 3, 2)                 // post hour3: rate 2, in band
      ).toDF("k", "s").select(col("k"), col("s").cast("timestamp").as("ts"))
    val got = TimeSeries.seasonalBaseline(rows, "k", "ts",
      lit("2024-01-04").cast("timestamp"))
      .as[(String, Int, Long, Long, Double, Double, Option[Double], Boolean)]
      .collect().map(r => r._2 -> r).toMap
    assert(got(0) == (("a", 0, 6L, 9L, 3.0, 9.0, Some(3.0), true)))
    assert(got(1) == (("a", 1, 0L, 1L, 0.0, 1.0, None, true)))
    assert(got(2) == (("a", 2, 2L, 0L, 1.0, 0.0, Some(0.0), true)))
    assert(got(3) == (("a", 3, 4L, 2L, 2.0, 2.0, Some(1.0), false)))
  }

  test("changepoint: clean level shift is localized exactly with zero split SSE") {
    // [0,0,0,10,10,10]: split after day 2 -> both sides constant
    val s = Seq(("k", 0L, 0), ("k", 1L, 0), ("k", 2L, 0),
      ("k", 3L, 10), ("k", 4L, 10), ("k", 5L, 10)).toDF("k", "t", "v")
    val r = TimeSeries.changepoint(s, Seq("k"), "t", "v").collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 150.0 && r.getDouble(4) == 0.0 && r.getDouble(5) == 1.0)
  }

  test("changepoint: constant series has zero total SSE and null drop fraction") {
    val s = Seq(("k", 0L, 5), ("k", 1L, 5), ("k", 2L, 5), ("k", 3L, 5))
      .toDF("k", "t", "v")
    val r = TimeSeries.changepoint(s, Seq("k"), "t", "v").collect().head
    // all splits cost 0 -> earliest-time tie-break picks the first candidate
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0 && r.isNullAt(5))
  }

  test("changepoint: keys with fewer than 4 points emit nothing") {
    val s = Seq(("k", 0L, 1), ("k", 1L, 2), ("k", 2L, 3)).toDF("k", "t", "v")
    assert(TimeSeries.changepoint(s, Seq("k"), "t", "v").count() == 0L)
    intercept[IllegalArgumentException](
      TimeSeries.changepoint(s, Seq.empty, "t", "v"))
  }

  test("stl: constant series decomposes to trend=v, seasonal=0, remainder=0; edges null") {
    val s = (0L to 13L).map(d => ("k", d, 5)).toDF("k", "day", "v")
    val got = TimeSeries.stlDecompose(s, Seq("k"), "day", "v")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._2)
    assert(got.length == 14)
    got.foreach { case (_, d, v, tr, se, re) =>
      assert(v == 5.0)
      if (d >= 3 && d <= 10) assert(tr.contains(5.0) && se.contains(0.0) && re.contains(0.0))
      else assert(tr.isEmpty && se.isEmpty && re.isEmpty)
    }
  }

  test("log-rank: hand-computed two-group table (O-E, V, chi2)") {
    import graft.functions.Quantize.scaledFloorDouble
    // a: events at t=1,2; b: event at t=1, censored exit at t=3
    // t=1: ra=2 rb=2 d=2 -> E_a=1, O-E=0, V=2*.5*.5*2/3
    // t=2: ra=1 rb=1 d=1 -> E_a=.5, O-E=.5, V=1*.5*.5*1/1
    val df = Seq(("a", 1L, true), ("a", 2L, true), ("b", 1L, true), ("b", 3L, false))
      .toDF("g", "dur", "obs")
    val r = TimeSeries.logRank(df, "g", "dur", "obs", "a", "b").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    val v1 = scaledFloorDouble(2.0 * (2.0 / 4.0) * (1.0 - 2.0 / 4.0) * (4.0 - 2.0) / (4.0 - 1.0), 9)
    val v2 = scaledFloorDouble(1.0 * (1.0 / 2.0) * (1.0 - 1.0 / 2.0) * (2.0 - 1.0) / (2.0 - 1.0), 9)
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == scaledFloorDouble(v1 + v2, 6))
    assert(r.getDouble(6) == scaledFloorDouble(0.5 * 0.5 / (v1 + v2), 6))
  }

  test("log-rank: identical groups score chi2 = 0; no events yields null chi2") {
    val same = Seq(("a", 1L, true), ("a", 2L, true), ("b", 1L, true), ("b", 2L, true))
      .toDF("g", "dur", "obs")
    val rs = TimeSeries.logRank(same, "g", "dur", "obs", "a", "b").collect().head
    assert(rs.getDouble(4) == 0.0 && rs.getDouble(6) == 0.0)
    val cens = Seq(("a", 1L, false), ("b", 2L, false)).toDF("g", "dur", "obs")
    val rc = TimeSeries.logRank(cens, "g", "dur", "obs", "a", "b").collect().head
    assert(rc.getDouble(5) == 0.0 && rc.isNullAt(6))
  }

  test("stl: a weekly sawtooth lands entirely in the seasonal component") {
    // period-7 pattern [0,7,14,21,28,35,42] repeated: centered 7-row mean is
    // constant 21 wherever the window is full, so detrended = seasonal exactly
    val s = (0L to 20L).map(d => ("k", d, (d % 7).toInt * 7)).toDF("k", "day", "v")
    val got = TimeSeries.stlDecompose(s, Seq("k"), "day", "v")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().filter(_._4.nonEmpty).sortBy(_._2)
    assert(got.nonEmpty)
    got.foreach { case (_, d, _, tr, se, re) =>
      assert(tr.contains(21.0))
      assert(se.contains((d % 7).toDouble * 7 - 21.0))
      assert(re.contains(0.0))
    }
    intercept[IllegalArgumentException](
      TimeSeries.stlDecompose(s, Seq("k"), "day", "v", period = 6))
  }
  test("forecastBacktest: hand-computed MASE, short keys drop, horizon > period rejected") {
    // key A: 10 points, period 3, horizon 2 -> train idx 1..8, test idx 9..10
    // values: 1 2 3 4 5 6 7 8 | 9 10
    // test errors: |9 - y(idx 6)| = |9-6| = 3, |10 - y(idx 7)| = 3 -> sum 6
    // scale: train one-step diffs (idx 2..8) all 1 -> sum 7, n_scale 7
    // mae = 6/2 = 3; mase = 6*7 / (7*2) = 3.0
    val a = (1 to 10).map(i => ("A", i.toLong, i.toLong))
    // key B: too short (9 points < period + horizon + 1 = 6? no -- use 5 points
    // with period 3 horizon 2: needs >= 6, so 5 drops)
    val b = (1 to 5).map(i => ("B", i.toLong, i.toLong))
    val df = (a ++ b).toDF("k", "t", "v")
    val got = TimeSeries.forecastBacktest(df, Seq("k"), "t", "v", period = 3, horizon = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(("A", 8L, 2L, 3.0, 3.0)))
    intercept[IllegalArgumentException] {
      TimeSeries.forecastBacktest(df, Seq("k"), "t", "v", period = 3, horizon = 4)
    }
  }
  test("forecastBacktest: constant train window yields null mase, never Infinity") {
    // key C: constant 5s through train, jump in test -> sum_scale = 0,
    // sum_err > 0; the unguarded division would be Infinity (r15 advice)
    val c = (1 to 8).map(i => ("C", i.toLong, 5L)) ++
      Seq(("C", 9L, 9L), ("C", 10L, 9L))
    val got = TimeSeries.forecastBacktest(c.toDF("k", "t", "v"),
        Seq("k"), "t", "v", period = 3, horizon = 2)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getDouble(r.fieldIndex("mae")) == 4.0) // |9-5| + |9-5| over 2
    assert(r.isNullAt(r.fieldIndex("mase")), "degenerate scale must be null")
  }
}
