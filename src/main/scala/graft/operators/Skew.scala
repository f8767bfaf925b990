package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join splitting covers joins, but a skewed *aggregation* key
  * still funnels a hot key's pre-aggregated partials into one reducer. For
  * decomposable aggregates the classic fix is salting: aggregate on
  * (key, salt) first — spreading each hot key over `saltBuckets` reducers —
  * then merge the partials on the key alone. Stage-1 output is
  * `saltBuckets x |keys|` rows, so stage 2 is trivially small.
  *
  * Exactness: partial sums run in DECIMAL, and decimal addition is
  * associative — the salted plan is bit-equal to the direct aggregation
  * (verified by q36 sharing its oracle with the unsalted form).
  */
object Skew {

  /** Salted exact sum/count aggregation.
    *
    * @param keys        grouping key columns
    * @param sumCols     (alias -> numeric column) exact decimal sums,
    *                    emitted as double
    * @param saltSource  high-cardinality column whose hash spreads rows
    * @param saltBuckets reducers per hot key
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[Column],
      sumCols: Seq[(String, Column)],
      saltSource: Column,
      saltBuckets: Int = 16
  ): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        sumCols.map { case (alias, c) => sum(c.cast("decimal(28,4)")).as(s"__sum_$alias") }: _*)
    partial
      .groupBy(keys: _*)
      .agg(
        sum(col("__cnt")).as("cnt"),
        sumCols.map { case (alias, _) => sum(col(s"__sum_$alias")).cast("double").as(alias) }: _*)
  }

  /** Salted shuffle equi-join for hot join keys: the big side is salted by a
    * high-cardinality column, the small side is replicated once per salt
    * bucket, and the join runs on (keys..., salt) — each hot key spreads
    * over `saltBuckets` reducers instead of funneling into one.
    *
    * Exact: every big-side row carries exactly ONE salt value and the small
    * side has exactly one replica per (key, salt), so the matched pairs are
    * 1:1 with the unsalted join — no loss, no duplication (q45 shares its
    * oracle with the plain join).
    *
    * AQE's skew-join split is the first resort; this explicit form covers
    * what it cannot reach (skew under a required distribution, non-AQE
    * engines, deterministic partition sizing) and costs only the small
    * side's `saltBuckets`x replication.
    */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      saltBuckets: Int = 16
  ): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val b = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets)).cast("int"))
    val s = small.withColumn("__salt", explode(array((0 until saltBuckets).map(i => lit(i)): _*)))
    b.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Skew-proof per-key row cap — keep each key's `k` smallest `orderCol`
    * rows (the C4-family "at most k documents per domain" curation gate).
    * The textbook `row_number().over(partitionBy(key))` serializes every
    * hot key through ONE task — a celebrity domain with 10^8 documents in a
    * 100 TB web corpus is exactly the key that matters — so:
    *
    *  1. per key, a BOUNDED top-k aggregate ([[graft.functions.MinKLongs]]):
    *     a proper `Aggregator`, so map-side partials, shuffle payloads, and
    *     reducer buffers are all O(k) PER PARTITION regardless of key heat
    *     (a `collect_list` + slice formulation buffers the whole group —
    *     O(group) on exactly the hot key this operator targets);
    *  2. left-semi join the kept (key, order) pairs back — SMJ-pinned, the
    *     kept side being an aggregate derivative whose static size estimate
    *     Catalyst gets wrong (the measured derived-broadcast OOM class).
    *
    * `orderCol` must be LongType (a unique id / timestamp) and distinct
    * within a key — a tie AT the cap boundary would otherwise admit more
    * than k rows. NULL order values are excluded before aggregation (the
    * typed Long path would decode them as 0 and displace a real k-th
    * value) and such rows never survive — same outcome as the
    * null-skipping row_number formulation. Returns the surviving rows of
    * `df` unchanged.
    */
  def capPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val keys = keyCols.map(col)
    val minK = udaf(new graft.functions.MinKLongs(k))
    val kept = df
      .select(keys :+ col(orderCol): _*)
      .filter(col(orderCol).isNotNull)
      .groupBy(keys: _*)
      .agg(minK(col(orderCol)).as("__keep"))
      .select(keys :+ explode(col("__keep")).as(orderCol): _*)
    df.join(kept.hint("shuffle_merge"), keyCols :+ orderCol, "left_semi")
  }

  /** Distributed per-group rank — the hot-group form of
    * `row_number() OVER (PARTITION BY group ORDER BY value, tie)`: when
    * groups are enum-sized strata (languages, sources), the plain window
    * funnels each stratum through ONE task. Same two-phase prefix sum as
    * [[Sampling.tokenBudgetSample]], but bucketized on the VALUE RANGE
    * (the [[graft.sinks.ClusteredWrite.zBucket]] integer bucketizer over
    * the in-plan per-value min/max) so buckets are contiguous in rank
    * order: per-(group, bucket) windows run wide, |groups|·2^bits bucket
    * counts prefix-sum in one tiny window and broadcast back.
    *
    * `rank` is 0-based row_number semantics (ties broken by `tieCol` —
    * REQUIRED unique within (group, value) for determinism). Equal-width
    * value buckets are the skew caveat: a value-concentrated distribution
    * makes hot buckets (bounded by the concentration, not the group), the
    * documented trade vs a sampled range partitioner.
    */
  def groupedRank(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieCol: String,
      bits: Int = 8
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "at least one group column is required")
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val groups = groupCols.map(col)
    val mm = df.agg(min(col(valueCol)).cast("long").as("__mn"),
      max(col(valueCol)).cast("long").as("__mx")).head()
    require(!mm.isNullAt(0),
      s"groupedRank: input is empty or '$valueCol' is all null — nothing to rank")
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val bucket =
      if (mx == mn) lit(0L)
      else graft.sinks.ClusteredWrite.zBucket(col(valueCol), mn, mx, bits)
    val withB = df.withColumn("__bkt", bucket)
    val inBucket = Window.partitionBy(groups :+ col("__bkt"): _*)
      .orderBy(col(valueCol), col(tieCol))
    val acrossBuckets = Window.partitionBy(groups: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(groups :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(acrossBuckets), lit(0L)))
      .select(groups :+ col("__bkt") :+ col("__off"): _*)
    withB
      .withColumn("__rn", row_number().over(inBucket).cast("long"))
      .join(broadcast(offsets), groupCols :+ "__bkt")
      .withColumn("rank", col("__off") + col("__rn") - 1)
      .select(df.columns.map(col) :+ col("rank"): _*)
  }

  /** Bloom-prefiltered equi-join — the semi-join pushdown a 100 TB
    * fact ⋈ selective-dim join wants when the dim is too big (or too
    * late-bound) to broadcast as a hash table but its KEY SET compresses
    * into a bitmap: build an mBits Bloom filter over the dim keys (one
    * bounded aggregation, ≤ mBits/32 words collected), probe every fact
    * row with the executor-captured bitmap (pure projection — the
    * `might_contain` runtime filter Spark's own bloom-join rule injects),
    * and only surviving rows enter the shuffle join. False positives are
    * removed by the join itself, and a Bloom filter has NO false
    * negatives — so the output is row-identical to the plain join (the
    * q144 gate) while the shuffle carries only ~selectivity + fp of the
    * fact table. The join stays SMJ-pinned: pre-filtering does not make
    * either side broadcastable by contract.
    */
  def bloomPrefilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      mBits: Int = 1 << 16,
      kHashes: Int = 4,
      salt: String = "bloomjoin"
  ): DataFrame = {
    val sketch = Sketches.bloomSketch(dim, col(dimKey), mBits, kHashes, salt)
    val bitmap = Sketches.collectBloom(sketch, mBits)
    val survivors = fact
      .filter(Sketches.bloomProbe(col(factKey), bitmap, mBits, kHashes, salt))
      .hint("shuffle_merge")
    // Same-name keys (the common FK case) would make bare col() ambiguous
    // and duplicate the key column; a using-column join keeps the output
    // schema identical to the plain equi-join the scaladoc promises
    // row-identity with. Distinct names keep the explicit predicate.
    if (factKey == dimKey)
      survivors.join(dim.hint("shuffle_merge"), Seq(factKey))
    else
      survivors.join(dim.hint("shuffle_merge"), survivors(factKey) === dim(dimKey))
  }

  /** Scaled-floor quantization — `floor(x·10^s + 0.5)/10^s`, every step
    * an IEEE double op any engine reproduces bitwise (the portable form
    * of round(); see [[TimeSeries]] for the measured round() divergence
    * class). Also maps (−0.5·10⁻ˢ, 0.5·10⁻ˢ) to +0, killing signed zero. */
  private def qfloor(c: Column, scale: Int): Column =
    graft.functions.Quantize.scaledFloor(c, scale)

  /** MAD-based robust outlier scoring per group — median absolute
    * deviation with the 0.6745 normal-consistency constant:
    * `z = 0.6745 · (x − median) / MAD`, flagged at |z| > threshold.
    * The robust alternative to mean/stddev z-scores (one wild value
    * inflates a stddev and masks itself; the median pair doesn't move),
    * per stratum so a heavy group can't set another's scale.
    *
    * Two enum-sized percentile aggregations broadcast back (the q37
    * boundary-table class), then a pure projection. Zero-MAD groups
    * (constant bulk) emit null scores and never flag.
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      threshold: Double = 3.5
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(`$valueCol`, 0.5)").as("__med"))
    val withMed = df.join(broadcast(med), groupCols)
      .withColumn("__absdev", abs(col(valueCol).cast("double") - col("__med")))
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(expr("percentile(__absdev, 0.5)").as("__mad"))
    withMed.join(broadcast(mad), groupCols)
      .withColumn("robust_z",
        when(col("__mad") > 0.0,
          qfloor(lit(0.6745) * (col(valueCol).cast("double") - col("__med")) / col("__mad"), 4)))
      .withColumn("is_outlier", coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .drop("__med", "__absdev", "__mad")
  }

  /** Grouped trimmed mean over an INTEGER-valued column: the mean of the
    * values inside the group's [p_frac, p_(1−frac)] percentile band
    * (inclusive). Integer sums keep the statistic exact under any
    * shard/summation order — the reason the operator requires an
    * integer-typed column (a float column's trimmed sum is
    * order-sensitive at the last ulp, the class the scaled-floor rule
    * exists for). One enum-sized bounds aggregation broadcast back +
    * one keyed sum/count.
    */
  def trimmedMean(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      frac: Double
  ): DataFrame = {
    require(frac > 0.0 && frac < 0.5, s"frac must be in (0, 0.5), got $frac")
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType).contains(df.schema(valueCol).dataType)
    }, s"trimmedMean requires an integer column (float sums are summation-order-sensitive); " +
      s"'$valueCol' is ${df.schema(valueCol).dataType.simpleString}")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(`$valueCol`, $frac)").as("__lo"),
        expr(s"percentile(`$valueCol`, ${1.0 - frac})").as("__hi"))
    df.join(broadcast(bounds), groupCols)
      .filter(col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("kept_rows"),
        qfloor(sum(col(valueCol)).cast("double") / count(lit(1)), 4).as("trimmed_mean"))
  }

  /** Grouped winsorization — clip each value to its group's
    * [`lo`, `hi`] percentile band (linear-interpolated, the exact
    * `percentile` both engines share): the robust-scaling step outlier-
    * heavy feature columns get before any mean/variance statistic, per
    * stratum so a heavy group doesn't set another group's bounds.
    *
    * One enum-sized percentile aggregation per group broadcast back
    * (|groups| rows — the q37 boundary-table class), then a pure clamp
    * projection. Adds `winsorized` (double, round 4); never reorders or
    * drops rows.
    */
  def winsorizeByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    require(lo >= 0.0 && hi <= 1.0 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(`$valueCol`, $lo)").as("__lo"),
        expr(s"percentile(`$valueCol`, $hi)").as("__hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn("winsorized",
        qfloor(greatest(col("__lo"), least(col("__hi"), col(valueCol).cast("double"))), 4))
      .drop("__lo", "__hi")
  }
}
