package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-behavior analytics over event streams — the product-analytics
  * surface (funnel conversion, cohort retention) a clickstream warehouse
  * runs daily at fact-table scale.
  */
object Funnel {

  /** Per-user funnel reach times: `t_i` = the earliest event of step `i`
    * that happens STRICTLY AFTER the user's `t_{i-1}` (the classic ordered
    * funnel — a purchase before the first view does not convert). Users
    * appear iff they reached step 1; unreached later steps are null.
    *
    * Shape at 100 TB: step `i` is ONE keyed join (user) + ONE min
    * aggregation — k-1 shuffles total for a k-step funnel, no per-user
    * window, no event-array collection, so a bot user with 10^8 events
    * costs the aggregation's map-side combine, not a task-local sort.
    * Joins are SMJ-pinned: both sides are user-shaped and the reach
    * tables are derived (the §8.1 static-size-estimate class).
    */
  def funnelTimes(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step is required")
    require(steps.distinct.length == steps.length, "funnel steps must be distinct")
    val stepTimes = steps.zipWithIndex.map { case (_, i) => s"t${i + 1}" }
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    val reached = steps.zipWithIndex.tail.foldLeft(first) { case (prev, (step, i)) =>
      val tPrev = s"t$i"
      val tThis = s"t${i + 1}"
      val next = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol))
        .hint("shuffle_merge")
        .join(prev.hint("shuffle_merge"), Seq(userCol))
        .filter(col(tsCol) > col(tPrev))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(tThis))
        .select(col(userCol), col(tThis))
      prev.join(next.hint("shuffle_merge"), Seq(userCol), "left")
    }
    reached.select(col(userCol) +: stepTimes.map(col): _*)
  }

  /** Funnel step counts from [[funnelTimes]]: one row per step with the
    * number of users whose reach time is non-null — the conversion
    * report. ONE single-row aggregation over the user-shaped reach table,
    * unpivoted to (step, step_name, users). */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps)
    val counts = times.agg(
      count(col("t1")).as("c1"),
      steps.indices.tail.map(i => count(col(s"t${i + 1}")).as(s"c${i + 1}")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_name"), col(s"c${i + 1}").as("users"))
    }: _*)).as("__e")).select(col("__e.*"))
  }

  /** User-journey path mining: each user's first `maxSteps` event types in
    * order, joined into a path string, counted across users — the "what
    * do users actually do" report. The per-user collect buffers O(events
    * per user) before the slice — cap pathological users upstream with
    * [[Skew.capPerKey]] when the corpus has them (documented trade; the
    * aggregation itself is one keyed shuffle). `orderCols` needs the
    * usual unique tie-break suffix. Output: (path, n_users).
    */
  def journeyPaths(
      events: DataFrame,
      userCol: String,
      orderCols: Seq[String],
      typeCol: String,
      maxSteps: Int
  ): DataFrame = {
    require(maxSteps >= 1, s"maxSteps must be >= 1, got $maxSteps")
    require(orderCols.nonEmpty, "orderCols must include a tie-breaking unique suffix")
    val ordered = sort_array(collect_list(struct(orderCols.map(col) :+ col(typeCol).as("__t"): _*)))
    events
      .groupBy(col(userCol))
      .agg(ordered.as("__evs"))
      .select(array_join(
        transform(slice(col("__evs"), 1, maxSteps), e => e.getField("__t")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
  }

  /** RFM segmentation — the classic user-value card (recency: days since
    * last activity vs the corpus reference date; frequency: event count;
    * monetary: sum of an INTEGRAL value column — float corpus sums are
    * order-sensitive, the trimmedMean rule): each dimension scored 1–5
    * against its own corpus quintile thresholds (percentile cuts
    * broadcast back — the q198 thresholds pattern, never a global ntile
    * sort), recency inverted so fresher = higher. `segment` is the
    * concatenated "rfm" digit string ("555" = best).
    *
    * Shape: one keyed aggregation (per-user triple), one 1-row
    * three-quantile aggregation broadcast back, one pure scoring
    * projection — the output is the per-user feature frame a churn model
    * trains on. Output: (userCol, recency, frequency, monetary,
    * r_score, f_score, m_score, segment).
    */
  def rfm(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    import org.apache.spark.sql.types._
    require(
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(events.schema(valueCol).dataType),
      s"$valueCol must be an integral column — float corpus sums are order-sensitive")
    val ref = events.agg(max(to_date(col(tsCol))).as("__ref"))
    val perUser = events
      .groupBy(col(userCol))
      .agg(max(to_date(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol)).as("monetary"))
      .crossJoin(broadcast(ref))
      .select(col(userCol), datediff(col("__ref"), col("__last")).as("recency"),
        col("frequency"), col("monetary"))
      // referenced by the cuts aggregation AND the scoring projection
      .localCheckpoint(true)
    val cuts = perUser.agg(
      expr("percentile(recency, array(0.2, 0.4, 0.6, 0.8))").as("__rc"),
      expr("percentile(frequency, array(0.2, 0.4, 0.6, 0.8))").as("__fc"),
      expr("percentile(monetary, array(0.2, 0.4, 0.6, 0.8))").as("__mc"))
    def above(v: Column, cutsCol: Column): Column =
      (1 to 4).map(i => when(v.cast("double") > element_at(cutsCol, i), 1).otherwise(0))
        .reduce(_ + _)
    perUser.crossJoin(broadcast(cuts))
      .select(col(userCol), col("recency"), col("frequency"), col("monetary"),
        (lit(5) - above(col("recency"), col("__rc"))).as("r_score"),
        (lit(1) + above(col("frequency"), col("__fc"))).as("f_score"),
        (lit(1) + above(col("monetary"), col("__mc"))).as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
  }

  /** Frequent event-type n-grams: every CONTIGUOUS length-`n` run of a
    * user's time-ordered events, counted across the corpus — the
    * behavioral-motif complement to [[journeyPaths]] (paths fingerprint
    * each user's PREFIX; n-grams mine recurring sub-sequences anywhere in
    * the stream — "view>click>purchase" as a motif, not an opening).
    *
    * Shape: one keyed collect (the journeys per-user-buffer caveat —
    * [[Skew.capPerKey]] pathological users upstream), a per-user
    * (events−n+1)-wide transform+explode, one map-side-combined count.
    * `orderCols` needs the usual unique tie-break suffix. Rows with
    * count < `minCount` are dropped (the long tail is noise and its
    * output would be corpus-shaped). Output: (gram, n_users_events) by
    * cnt desc, gram.
    */
  def eventNgrams(
      events: DataFrame,
      userCol: String,
      orderCols: Seq[String],
      typeCol: String,
      n: Int,
      minCount: Long
  ): DataFrame = {
    require(n >= 2 && n <= 10, s"n=$n out of [2, 10]")
    require(orderCols.nonEmpty, "orderCols must include a tie-breaking unique suffix")
    val ordered = sort_array(collect_list(struct(orderCols.map(col) :+ col(typeCol).as("__t"): _*)))
    events
      .groupBy(col(userCol))
      .agg(ordered.as("__evs"))
      .select(transform(col("__evs"), e => e.getField("__t")).as("__ts"))
      .filter(size(col("__ts")) >= n)
      .select(explode(transform(
        sequence(lit(1), size(col("__ts")) - lit(n - 1)),
        i => array_join(slice(col("__ts"), i, lit(n)), ">"))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("gram"))
  }

  /** Cohort retention: users cohorted by their FIRST-seen bucket (floor of
    * epoch-days over `bucketDays`), activity counted as distinct
    * (user, bucket) pairs at each offset — "of the users who arrived in
    * week w, how many were active in week w+k". Integer day arithmetic
    * end to end.
    *
    * Shape: one min-aggregation (first seen), one distinct over
    * (user, bucket) — both keyed map-side-combined shuffles — and one
    * SMJ-pinned user join; never a countDistinct over a corpus-wide
    * group. Output is cohort×offset-sized (enum-like).
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      bucketDays: Int = 7
  ): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    val bucket: Column = floor(unix_date(to_date(col(tsCol))) / bucketDays).cast("long")
    val firstSeen = events.groupBy(col(userCol)).agg(min(bucket).as("cohort"))
    val active = events.select(col(userCol), bucket.as("__b")).distinct()
    active.hint("shuffle_merge")
      .join(firstSeen.hint("shuffle_merge"), Seq(userCol))
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("active_users"))
  }
}
