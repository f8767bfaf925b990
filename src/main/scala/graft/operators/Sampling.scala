package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling, splitting and stratified mixing — the
  * reproducibility primitives of a training-data pipeline. `df.sample()` is
  * seeded per-partition, so its selection changes whenever partitioning
  * changes (a repartition, a different file split, a cluster resize);
  * content-hash sampling keys the decision on the ROW, making every
  * selection stable across runs, engines and layouts — which is what lets a
  * 100 TB corpus be re-sampled incrementally (new shards sample themselves;
  * old decisions never flip) and lets train/val/test membership be an
  * invariant of the datum rather than of the job that assigned it.
  *
  * Mechanics: a row's key hashes to a uniform 60-bit integer (md5 prefix —
  * portable, every engine computes it bit-identically; same technique as
  * [[Dedup.SimHashBits]]); a rate r admits keys with hash < floor(r·2^60).
  * Comparisons are INTEGER-exact — thresholds are precomputed literals, so
  * there is no float-rounding disagreement to chase across engines. All
  * pure codegen'd expressions: sampling is a filter (no shuffle), splitting
  * is a projection, stratification is a chained-when lookup (no join for
  * enum-sized strata).
  *
  * (The reference has no sampling operators — this is part of the
  * training-data-pipeline surface the engine adds; see SURVEY.md §2.2.)
  */
object Sampling {

  private val HashHexChars = 15 // 60 bits: positive in a signed 64-bit int everywhere

  /** Uniform 60-bit hash of (salt, key). The salt decorrelates independent
    * decisions on the same corpus — sampling at 10% and splitting 80/10/10
    * with different salts are independent events per row.
    *
    * NULL keys hash to null: filters ([[deterministicSample]],
    * [[stratifiedSample]]) DROP such rows and [[hashSplit]] sends them to
    * the last label — identically in Spark and in any SQL oracle, since
    * three-valued logic treats a null comparison the same way in both. Key
    * on a non-null column. */
  def keyHash(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, HashHexChars), 16, 10)
      .cast("long")

  /** floor(rate · 2^60): the integer admission threshold for `rate`. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0, 1], got $rate")
    if (rate >= 1.0) 1L << 60 else math.floor(rate * (1L << 60).toDouble).toLong
  }

  /** Keep each row iff hash(salt, key) < floor(rate · 2^60). Layout- and
    * run-independent; at any scale this is a pushdown-friendly filter. */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double, salt: String): DataFrame =
    df.filter(keyHash(col(keyCol), salt) < lit(threshold(rate)))

  /** Cumulative integer boundaries for all but the last label — the ONE
    * place the float arithmetic happens, shared by [[hashSplit]] and any
    * independently-generated oracle so both compare against bit-identical
    * literals (0.8 + 0.1 is 0.9000000000000001 in doubles; two sides doing
    * their own accumulation would disagree at the boundary ulp). */
  def splitBoundaries(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(splits.nonEmpty, "at least one split is required")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cumulative = splits.scanLeft(0.0) { case (acc, (_, r)) => acc + r }.tail
    splits.init.zip(cumulative.init).map { case ((label, _), cum) => label -> threshold(cum) }
  }

  /** Disjoint exhaustive split assignment (train/val/test and friends):
    * labels claim cumulative hash ranges in order, the last label absorbing
    * the remainder so every row lands somewhere regardless of rounding.
    * Membership is a pure function of (salt, key) — re-running, resharding
    * or growing the corpus never moves an existing row between splits. */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)], salt: String): DataFrame = {
    val h = keyHash(col(keyCol), salt)
    val labeled = splitBoundaries(splits).foldLeft(when(lit(false), lit(""))) {
      case (c, (label, boundary)) => c.when(h < lit(boundary), lit(label))
    }.otherwise(lit(splits.last._1))
    df.withColumn("split", labeled)
  }

  /** Cluster-aware split — the eval-hygiene form of [[hashSplit]]:
    * near-duplicate documents must all land in the SAME split, because a
    * val/test doc with a train-side near-twin leaks evaluation content
    * into training — the classic split-leakage bug, reintroduced at the
    * split step whenever membership hashes the DOC id. Membership here
    * hashes the duplicate-CLUSTER id instead: `clusters` is
    * [[Dedup.connectedComponents]] output `(idCol, cluster_id)`; docs
    * absent from it fall back to their own id (a singleton's cluster id
    * IS its id under CC's min-label convention, so partial cluster
    * tables compose correctly). Same shared-boundary literals, salt
    * discipline, and layout/run/engine determinism as [[hashSplit]] —
    * and with an identity cluster table the output IS [[hashSplit]]'s
    * (spec-pinned).
    *
    * Shape at 100 TB: ONE keyed left join (SMJ-pinned — the cluster
    * table is corpus-shaped and sits under aggregates, the §8.1
    * derived-broadcast class) plus the same literal-threshold projection;
    * stateless past the join, so membership never moves when the corpus
    * grows (a NEW near-dup edge can merge two clusters and legitimately
    * move the smaller cluster's docs — that is the semantics, not drift).
    */
  def clusterAwareSplit(
      df: DataFrame,
      idCol: String,
      clusters: DataFrame,
      splits: Seq[(String, Double)],
      salt: String
  ): DataFrame = {
    val h = keyHash(coalesce(col("cluster_id"), col(idCol)), salt)
    val labeled = splitBoundaries(splits).foldLeft(when(lit(false), lit(""))) {
      case (c, (label, boundary)) => c.when(h < lit(boundary), lit(label))
    }.otherwise(lit(splits.last._1))
    df.join(clusters.select(col(idCol), col("cluster_id")).hint("shuffle_merge"),
        Seq(idCol), "left")
      .withColumn("split", labeled)
      .drop("cluster_id")
  }

  /** Deterministic bottom-k sample: the `k` rows with the smallest 60-bit
    * [[keyHash]] (ties to the smallest key) — the fixed-SIZE companion to
    * [[deterministicSample]]'s fixed-RATE filter, for eval slices, data
    * cards, and human audits that need "exactly k uniformly-drawn docs,
    * the same k every run/engine/layout". MERGEABLE like a KMV sketch on
    * rows: the bottom-k of a union is the bottom-k of the concatenated
    * per-shard bottom-ks (spec-pinned), so daily shards keep k-row samples
    * and a roll-up re-selects without rescanning corpora. Spark plans
    * orderBy+limit as TakeOrdered — an O(k) heap per partition feeding one
    * O(shards·k) driver merge, never a full sort.
    *
    * NOT stable under corpus growth by design (a new row hashing below the
    * k-th displaces it — a fixed-size sample is a corpus-level constraint,
    * [[tokenBudgetSample]]'s caveat); per-row stability wants
    * [[deterministicSample]].
    */
  def bottomKSample(df: DataFrame, keyCol: String, k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.orderBy(keyHash(col(keyCol), salt), col(keyCol)).limit(k)
  }

  /** Approximate quantiles from the deterministic bottom-k sample: the
    * O(k)-memory companion to [[graft.operators.Skew]]'s exact distributed
    * percentiles — right when the value domain is corpus-shaped (per-doc
    * byte counts over 10B docs) and an exact value-count pre-aggregation
    * is itself the bottleneck. The estimate is the EXACT nearest-rank
    * quantile of the [[bottomKSample]] (a uniform sample, so standard
    * sample-quantile error ~ O(1/sqrt(k)) around each quantile), computed
    * at index `floor(q·(n-1)) + 1` of the value-sorted sample —
    * deterministic and engine-exact because the sample membership is.
    * One TakeOrdered pass + one k-bounded single-row aggregation.
    */
  def sampleQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      k: Int,
      quantiles: Seq[Double],
      salt: String
  ): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be non-empty, each in [0, 1]")
    bottomKSample(df.select(col(keyCol), col(valueCol)), keyCol, k, salt)
      .agg(sort_array(collect_list(col(valueCol))).as("__s"))
      .select(explode(typedLit(quantiles)).as("quantile"), col("__s"))
      .select(col("quantile"),
        element_at(col("__s"),
          (floor(col("quantile") * (size(col("__s")) - 1)) + 1).cast("int")).as("value"))
  }

  /** Weighted sampling WITHOUT replacement, bottom-k form (Efraimidis &
    * Spirakis 2006 A-ES): row priority `−ln(u)/w` with `u` the row's
    * 60-bit content hash scaled into (0,1) — an Exp(w) draw, so keeping
    * the k SMALLEST priorities samples k rows without replacement with
    * inclusion probability ∝ weight. The quality-weighted companion to
    * [[bottomKSample]]: eval slices and distillation subsets drawn
    * "proportional to quality score" with the same determinism
    * (layout/run/engine-invariant — u is exact in both engines: hash+0.5
    * over the power-of-two 2^60).
    *
    * MERGEABLE exactly like [[bottomKSample]]: priorities are per-row
    * invariants, so per-shard bottom-ks re-select losslessly. Selection
    * runs on `round(priority, 9)` with key tie-break (ln differs at ulp
    * across libms — the scoreScale discipline); rows with weight ≤ 0 are
    * EXCLUDED (an Exp(w) draw needs w > 0 — documented, not silent: the
    * filter is part of the contract). Same TakeOrdered shape as
    * [[bottomKSample]]: O(k) heap per partition, never a full sort.
    */
  def weightedBottomK(
      df: DataFrame, keyCol: String, weightCol: String, k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (keyHash(col(keyCol), salt).cast("double") + lit(0.5)) / lit((1L << 60).toDouble)
    val priority = round(-log(u) / col(weightCol).cast("double"), 9)
    df.filter(col(weightCol).cast("double") > 0.0)
      .orderBy(priority, col(keyCol))
      .limit(k)
  }

  /** Deterministic corpus shuffle — reproducible GLOBAL training order:
    * every row gets `position` = its rank in (60-bit content hash, key)
    * order and `shard` = position / rowsPerShard, so the "randomly
    * shuffled, sharded corpus" a training run consumes is a pure function
    * of (salt, corpus) — two engines, two layouts, two re-runs emit
    * byte-identical shard assignments (the reproducible-training-data
    * property [[Chunking.spanCorruption]] gives masks, applied to
    * ordering).
    *
    * Shape at 100 TB: a naive `row_number() OVER (ORDER BY hash)` funnels
    * the corpus through ONE task. Same two-phase prefix sum as
    * [[tokenBudgetSample]]: the hash's top 8 bits bucketize its own order
    * contiguously (256 uniform buckets), per-bucket ranks run wide, the
    * 256 bucket counts prefix-sum in one tiny window and broadcast back.
    */
  def deterministicShuffle(
      df: DataFrame, keyCol: String, rowsPerShard: Long, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rowsPerShard > 0, s"rowsPerShard must be positive, got $rowsPerShard")
    val withH = df
      .withColumn("__h", keyHash(col(keyCol), salt))
      .withColumn("__bkt", shiftright(col("__h"), 52))
    val inBucket = Window.partitionBy(col("__bkt")).orderBy(col("__h"), col(keyCol))
    // UNPARTITIONED-WINDOW: bounded at 4096 rows (12-bit __bkt space) —
    // the two-phase prefix-sum offset frame
    val acrossBuckets = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withH.groupBy(col("__bkt")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(acrossBuckets), lit(0L)))
      .select(col("__bkt"), col("__off"))
    withH
      .withColumn("__rn", row_number().over(inBucket).cast("long"))
      .join(broadcast(offsets), Seq("__bkt"))
      .withColumn("position", col("__off") + col("__rn") - 1)
      .withColumn("shard", floor(col("position") / lit(rowsPerShard)).cast("long"))
      .select(df.columns.map(col) :+ col("position") :+ col("shard"): _*)
  }

  /** Deterministic negative sampling — contrastive-pair prep: each anchor
    * row draws `k` pseudo-uniform corpus rows as negatives, `draw j` =
    * the row whose [[deterministicShuffle]] position equals
    * `hash(anchor#j) mod N`. Fully deterministic (re-runs and engines
    * agree), and uniform over the corpus per draw. Draws that hit the
    * anchor itself are DROPPED (documented: an anchor yields k−1
    * negatives with probability ~k/N, never a wrong pair); distinct draws
    * can collide (sampling WITH replacement across j, the standard
    * contrastive-batch trade).
    *
    * Shape: the position map is ONE [[deterministicShuffle]] pass; the
    * anchor fan-out is a k-wide explode; matching draw→row is a keyed
    * join SMJ-pinned on both sides (the position map is corpus-shaped and
    * derived — the §8.1 static-size-estimate class). N rides in-plan as a
    * broadcast 1-row count. `hash mod N` carries the standard modulo
    * bias — positions below `2^60 mod N` draw at most (1 + N/2^60)× the
    * rate of the rest, immaterial for any real corpus (N ≪ 2^60).
    */
  def negativeSample(
      df: DataFrame, keyCol: String, k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val positions = deterministicShuffle(df.select(col(keyCol)), keyCol, Long.MaxValue, salt)
      .select(col(keyCol).as("neg_id"), col("position"))
    val nRow = df.agg(count(lit(1)).as("__n"))
    val anchors = df.select(col(keyCol).as("anchor_id"))
      .crossJoin(broadcast(nRow))
      .select(col("anchor_id"),
        explode(array((0 until k).map(lit): _*)).as("draw"), col("__n"))
      .withColumn("position",
        pmod(keyHash(concat(col("anchor_id").cast("string"), lit("#"), col("draw")), salt),
          col("__n")))
    anchors.hint("shuffle_merge")
      .join(positions.hint("shuffle_merge"), Seq("position"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("draw"), col("neg_id"))
  }

  /** Uniform k-per-group sample: [[Skew.capPerKey]] driven by the 60-bit
    * hash instead of a semantic order column — "k uniformly-drawn docs per
    * language/source", the per-stratum audit/eval slice. Inherits
    * capPerKey's bounded-aggregator shape (O(k) state at every stage, no
    * hot-group window) and [[bottomKSample]]'s determinism; group
    * cardinality may be arbitrary (the aggregator state is per-group O(k),
    * never corpus-shaped).
    */
  def groupBottomKSample(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      k: Int,
      salt: String
  ): DataFrame =
    // re-select in input order: the semi join inside capPerKey puts its
    // using-columns first, and schema order is part of the contract
    Skew.capPerKey(df.withColumn("__h", keyHash(col(keyCol), salt)), groupCols, "__h", k)
      .select(df.columns.map(col): _*)

  /** Weighted corpus mixing: each source is hash-sampled at its own rate
    * and the survivors unioned (by name) under a `source` label — the
    * training-mixture step, with every per-corpus decision as deterministic
    * as [[deterministicSample]]. Rates are per-corpus admission fractions;
    * to hit target mixture PROPORTIONS, set `rate_i ∝ target_i / |corpus_i|`
    * (corpus sizes are catalog facts the caller already has — keeping them
    * out of the plan keeps every threshold a literal). Schemas must align on
    * the shared columns; `unionByName` with missing-column fill makes
    * heterogeneous metadata columns explicit rather than positional.
    */
  def mixByRates(corpora: Seq[(DataFrame, Double, String)], keyCol: String, salt: String): DataFrame = {
    require(corpora.nonEmpty, "at least one corpus is required")
    require(corpora.map(_._3).distinct.length == corpora.length, "source labels must be unique")
    corpora.map { case (df, rate, label) =>
      // per-corpus salt: the same key in two corpora draws independently
      deterministicSample(df, keyCol, rate, s"$salt/$label")
        .withColumn("source", lit(label))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** TOKEN-budget sampling per mixture group: walk each group's documents
    * in deterministic hash order and keep them while the group's running
    * token total (exclusive of the current document) is below
    * `budgetTokens` — the "2T tokens of English, 300B of code" mixture cut,
    * specified in the unit mixtures are actually specified in. The document
    * straddling the boundary is kept (pack-style: every budget is filled,
    * overrun bounded by one document). Hash order makes the cut a uniform
    * random sample, stable across runs, layouts, and engines for a GIVEN
    * corpus. It is NOT stable under corpus growth — a budget is a
    * corpus-level constraint, so a new document hashing before the cut
    * displaces the last admitted one; when incremental stability matters
    * more than an exact token total, use [[deterministicSample]] with
    * `rate ≈ budget / corpusTokens` instead (per-row decisions never
    * flip).
    *
    * Shape at 100 TB: the naive per-group `Window.orderBy(hash)` funnels
    * each group through one task — and groups here are mixture strata
    * (a handful of languages/sources), so that is the WHOLE corpus through
    * |groups| tasks. Same two-phase prefix sum as
    * [[Chunking.packSequences]], with the hash itself as the order-aligned
    * bucketizer (its top bits partition the hash ORDER contiguously, and
    * uniformity balances the buckets): per-(group, bucket) windows run wide,
    * then |groups|·256 bucket totals prefix-sum in one tiny window and
    * broadcast back. Group cardinality must be strata-sized (enum-like);
    * a high-cardinality group column would make the offset table itself
    * corpus-shaped.
    */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCols: Seq[String],
      budgetTokens: Long,
      salt: String
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    tokenBudgetSampleImpl(df, idCol, textCol, groupCols, lit(budgetTokens), salt)
  }

  /** [[tokenBudgetSample]] with a DIFFERENT budget per stratum — the form
    * mixtures are actually written in ("2T tokens of English, 300B of
    * code"): each group's cut walks the same hash order against its own
    * budget; strata not listed get `defaultBudget`. The budget rides a
    * chained `when` on the single group column — no join, no extra pass. */
  def tokenBudgetSampleByGroup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgets: Seq[(String, Long)],
      defaultBudget: Long,
      salt: String
  ): DataFrame = {
    require(defaultBudget > 0, "defaultBudget must be positive")
    budgets.foreach { case (g, b) => require(b > 0, s"budget for '$g' must be positive") }
    val budget = budgets.foldLeft(when(lit(false), lit(0L))) {
      case (c, (g, b)) => c.when(col(groupCol) === g, lit(b))
    }.otherwise(lit(defaultBudget))
    tokenBudgetSampleImpl(df, idCol, textCol, Seq(groupCol), budget, salt)
  }

  private def tokenBudgetSampleImpl(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCols: Seq[String],
      budgetTokens: Column,
      salt: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groups = groupCols.map(col)
    val withH = df
      .withColumn("__h", keyHash(col(idCol), salt))
      .withColumn("__tc", size(split(col(textCol), " ")).cast("long"))
      // top 8 of the 60 hash bits: 256 buckets CONTIGUOUS in hash order.
      // shiftright, not floor(h / 2^52): Column `/` is double division, and
      // hashes near a multiple of 2^52 can round into the adjacent bucket,
      // breaking the bucket/hash-order alignment the prefix sum relies on.
      .withColumn("__bkt", shiftright(col("__h"), 52))
    val inBucket = Window.partitionBy(groups :+ col("__bkt"): _*)
      .orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = withH.withColumn("__cum", sum(col("__tc")).over(inBucket))
    val acrossBuckets = Window.partitionBy(groups: _*)
      .orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withH
      .groupBy(groups :+ col("__bkt"): _*)
      .agg(sum(col("__tc")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(acrossBuckets), lit(0L)))
      .select(groups :+ col("__bkt") :+ col("__off"): _*)
    withCum
      .join(broadcast(offsets), groupCols :+ "__bkt")
      .filter(col("__off") + col("__cum") - col("__tc") < budgetTokens)
      .select(df.columns.map(col): _*)
  }

  /** Per-stratum rates (class-balance mixing): a row of stratum s survives
    * iff hash(salt, key) < floor(rates(s) · 2^60); strata not listed use
    * `defaultRate`. Rates ride a chained when — no join, no shuffle. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Seq[(String, Double)],
      defaultRate: Double,
      salt: String
  ): DataFrame = {
    val cutoff = rates.foldLeft(when(lit(false), lit(0L))) {
      case (c, (stratum, r)) => c.when(col(stratumCol) === stratum, lit(threshold(r)))
    }.otherwise(lit(threshold(defaultRate)))
    df.filter(keyHash(col(keyCol), salt) < cutoff)
  }

  /** Temperature-based mixture sampling — the multilingual/multi-source
    * rebalancing rule (sampling probability ∝ group-share^α): keep a
    * `targetFraction` of the corpus overall while flattening (α < 1) or
    * sharpening (α > 1) the group distribution. Per-group admission rate
    * `r_g = targetFraction · N · n_g^α / (Σ_h n_h^α · n_g)`, capped at 1 —
    * expected survivors = targetFraction · N exactly (modulo capping),
    * with the α=1 case degenerating to [[deterministicSample]] per group.
    *
    * Group counts, the power sums, and the per-group thresholds are all
    * IN-PLAN (a group-count aggregate — enum-sized by the stratum
    * contract — crossJoined as a broadcast scalar and broadcast-joined
    * back), so the whole thing stays one lazy declarative frame: no
    * driver-side counts, no collect. Admission is the same 60-bit
    * hash-threshold row invariant as every sampler here; the threshold is
    * derived through double `pow`, so two engines can disagree only when
    * a hash lands within an ulp-scaled window of a boundary (~2^-50 per
    * row — the accepted cross-engine float class, see q87). */
  def temperatureMixture(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      alpha: Double,
      targetFraction: Double,
      salt: String
  ): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction must be in (0, 1], got $targetFraction")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).cast("double").as("__n"))
    val totals = counts.agg(
      sum(col("__n")).as("__total"),
      sum(pow(col("__n"), lit(alpha))).as("__sa"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(groupCol),
        least(
          lit(targetFraction) * col("__total") * pow(col("__n"), lit(alpha)) /
            (col("__sa") * col("__n")),
          lit(1.0)).as("__rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(keyHash(col(keyCol), salt) <
        floor(col("__rate") * lit((1L << 60).toDouble)).cast("long"))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** 60-bit md5 bucket of a token — the engine-portable feature-hash used
    * by [[TextAnalysis.hashedLinearScore]]; shared here so the DSIR
    * feature space and any oracle agree bucket for bucket. */
  private def tokenBucket(t: Column, buckets: Int): Column =
    (conv(substring(md5(t), 1, HashHexChars), 16, 10).cast("long") % buckets).cast("int")

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): fit hashed bag-of-words
    * categorical models of a TARGET distribution (the high-quality corpus
    * you want more of) and the RAW distribution (the crawl you select
    * from), and return per-bucket `log p_target(b) − log p_raw(b)` with
    * add-one smoothing. A document's importance weight is then the sum of
    * its tokens' bucket log-ratios ([[importanceScore]]).
    *
    * Shape at 100 TB: training is two explode→groupBy count aggregations
    * (map-side combined, `buckets`-bounded output) and collects exactly
    * `buckets` rows — a model parameter (guarded ≤ 65536), the
    * small-by-contract class of [[Similarity.trainKMeans]]. Scoring never
    * touches these frames again: the ratios ride as a literal array. */
  def trainImportanceRatios(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int
  ): Seq[Double] = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets=$buckets out of (0, 65536] — the ratio table must stay a literal-array model")
    def bucketCounts(df: DataFrame): Map[Int, Long] =
      df.select(explode(split(col(textCol), " ")).as("__t"))
        .groupBy(tokenBucket(col("__t"), buckets).as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val t = bucketCounts(target)
    val r = bucketCounts(raw)
    val tTot = t.values.sum.toDouble
    val rTot = r.values.sum.toDouble
    (0 until buckets).map { b =>
      math.log((t.getOrElse(b, 0L) + 1.0) / (tTot + buckets)) -
        math.log((r.getOrElse(b, 0L) + 1.0) / (rTot + buckets))
    }
  }

  /** Per-document DSIR importance score: the sequential left fold of the
    * trained bucket log-ratios over the token order (bit-identical
    * wherever it reruns — [[TextAnalysis.hashedLinearScore]]'s inference
    * shape: pure per-row projection, zero shuffles, stream-safe). Emits
    * `n_tokens` and `dsir_logratio` (rounded to 4; the raw fold rides on
    * for [[resampleByImportance]]). */
  def importanceScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      logRatios: Seq[Double]
  ): DataFrame = {
    require(logRatios.nonEmpty, "logRatios must be non-empty")
    val rl = typedLit(logRatios)
    val buckets = logRatios.size
    val z = aggregate(
      col("__toks"),
      lit(0.0),
      (acc, t) => acc + element_at(rl, tokenBucket(t, buckets) + 1))
    df.withColumn("__toks", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("__raw_logratio", z)
      .withColumn("dsir_logratio", round(col("__raw_logratio"), 4))
      .drop("__toks")
  }

  /** DSIR selection proper — importance RESAMPLING without replacement via
    * the Gumbel-top-k trick: draw `g_i = −ln(−ln(u_i))` with `u_i` the
    * row's 60-bit content hash scaled into (0,1) (exact: 2^60 is a power
    * of two), and keep the k largest `logratio_i + g_i`. Equivalent to
    * sampling k docs without replacement with probability ∝ exp(logratio)
    * — but fully deterministic, layout-independent, and re-runnable, the
    * same row-invariant discipline as [[deterministicSample]].
    *
    * Shape at 100 TB: score is a per-row projection; selection is a
    * global top-k (`TakeOrdered`, per-partition heaps + driver merge of
    * k·partitions rows) — no global sort materializes. Ties break to the
    * lowest id; two engines disagree only when adjacent noisy scores sit
    * within float-noise of the cut (the accepted ~2^-50 class — the
    * continuous Gumbel noise keeps exact ties measure-zero). */
  def resampleByImportance(
      df: DataFrame,
      idCol: String,
      textCol: String,
      logRatios: Seq[Double],
      k: Int,
      salt: String
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val scored = importanceScore(df, idCol, textCol, logRatios)
    val u = (keyHash(col(idCol), salt).cast("double") + lit(0.5)) /
      lit((1L << 60).toDouble)
    scored
      .withColumn("gumbel_key", round(col("__raw_logratio") - log(-log(u)), 4))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
      .drop("__raw_logratio")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES): each row draws `u ∈ (0,1)` from the salted 60-bit
    * hash grid (`(keyHash + 0.5)/2⁶⁰` — [[resampleByImportance]]'s u) and
    * keys on `u^(1/w)`; the k LARGEST keys are a weighted sample without
    * replacement, each row's inclusion probability proportional to its
    * weight among the remaining mass — the quality-weighted corpus-subset
    * primitive ("sample 1M docs ∝ quality score"), where plain
    * [[deterministicSample]] can only sample uniformly.
    *
    * Deterministic end to end: keys quantize to the 1e-9 grid before
    * ranking (cross-engine `pow` ulps against grid boundaries — the
    * accepted q172 class), ties to the lowest id; non-POSITIVE weights
    * carry no mass and are excluded. The top-k runs through the bounded
    * [[graft.functions.TopKScored]] aggregator (O(k) state at every
    * stage — never a corpus-wide sort), and the k-row winner set joins
    * back for the weight column (a parameter-sized broadcast).
    * Output: (idCol, weight, es_key).
    *
    * CONTRACT: `keyCol` must be LONG-CASTABLE (the [[mmrRerank]] id rule)
    * — rows whose id fails the long cast are EXCLUDED, exactly like
    * null/non-positive-weight rows; string-keyed corpora should pass a
    * surrogate (e.g. `xxhash64(id)`) and join the originals back.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: String
  ): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k=$k out of [1, 1e6]")
    val u = (keyHash(col(keyCol), salt).cast("double") + lit(0.5)) /
      lit((1L << 60).toDouble)
    val keyed = df
      .filter(col(weightCol) > 0 && col(keyCol).cast("long").isNotNull)
      .select(col(keyCol).cast("long").as("__id"),
        col(weightCol).cast("double").as("__w"),
        graft.functions.Quantize.scaledFloor(
          pow(u, lit(1.0) / col(weightCol).cast("double")), 9).as("__k"))
    val topK = udaf(new graft.functions.TopKScored(k))
    val winners = keyed
      .groupBy()
      .agg(topK(col("__k"), col("__id")).as("__keep"))
      .select(explode(col("__keep")).as("__kv"))
      .select(col("__kv._2").as("__id"), col("__kv._1").as("es_key"))
    keyed.select(col("__id"), col("__w"))
      .join(broadcast(winners), Seq("__id"))
      .select(col("__id").as(keyCol), col("__w").as("weight"), col("es_key"))
  }

  /** Epoch-aware corpus mixing with FRACTIONAL epochs — the training-mix
    * primitive behind "web ×0.5, books ×2.5" recipes: every row of group g
    * is emitted ⌊e_g⌋ times (epoch = 0 … ⌊e_g⌋−1), plus one more copy iff
    * its salted hash admits at rate frac(e_g) — so the group's expected
    * volume is exactly e_g × its size, membership of the fractional epoch
    * is a deterministic per-key coin (reproducible across runs, and the
    * SAME subset at every downstream consumer), and each emitted copy
    * carries its epoch index for curriculum/locality-aware sharding
    * downstream ([[deterministicShuffle]] per epoch is the companion).
    *
    * Shape at 100 TB: one pure projection + a ≤⌈e⌉-wide explode — zero
    * shuffle, stream-safe; the mix table is a literal CASE chain, never a
    * join.
    *
    * Groups ABSENT from `epochs` get 0 copies and are DROPPED — the recipe
    * is a whitelist, so a new language appearing in the corpus after the
    * recipe was written silently vanishes from the mix. Callers that want
    * unlisted groups to survive must say so: pass `defaultEpochs = 1.0`
    * (or any rate) to give every unlisted group that epoch count instead.
    */
  def epochMix(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      epochs: Seq[(String, Double)],
      salt: String,
      defaultEpochs: Double = 0.0
  ): DataFrame = {
    require(epochs.nonEmpty && epochs.forall(_._2 >= 0.0), "epochs must be non-negative")
    require(epochs.map(_._1).distinct.length == epochs.length, "duplicate group in epochs")
    require(defaultEpochs >= 0.0, s"defaultEpochs must be non-negative, got $defaultEpochs")
    val full = epochs.foldLeft(when(lit(false), lit(0L))) { case (c, (g, e)) =>
      c.when(col(groupCol) === g, lit(math.floor(e).toLong))
    }.otherwise(lit(math.floor(defaultEpochs).toLong))
    val defaultFrac = defaultEpochs - math.floor(defaultEpochs)
    val admit = epochs.foldLeft(when(lit(false), lit(false))) { case (c, (g, e)) =>
      val frac = e - math.floor(e)
      c.when(col(groupCol) === g,
        keyHash(col(keyCol), salt) < lit(threshold(frac)))
    }.otherwise(
      if (defaultFrac == 0.0) lit(false)
      else keyHash(col(keyCol), salt) < lit(threshold(defaultFrac)))
    df
      .withColumn("__copies", full + admit.cast("long"))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Per-class loss/sampling weights for imbalanced training — both
    * standard recipes from one class-count aggregation:
    *
    *  - `inv_weight = N / (k · n_c)`: plain inverse frequency, normalized
    *    so a balanced dataset gives every class 1.0;
    *  - `ens_weight`: "effective number of samples" reweighting (Cui et
    *    al. 2019) — `E_c = (1 − β^{n_c})/(1 − β)` discounts marginal
    *    examples as a class saturates (β → 1 recovers inverse frequency,
    *    β = 0 gives uniform), weights `∝ 1/E_c` normalized to sum to k.
    *
    * The β^n powers are IEEE doubles (identical on any engine for the
    * same integer counts — the benford log10 class) and the k-row
    * normalizing sum adds 1e-9-quantized terms as decimal, so both
    * weights are engine- and order-exact. One map-side-combined count +
    * a k-row reduction broadcast back; nothing corpus-shaped survives.
    * Output: (class, n, inv_weight, ens_weight) — k rows.
    */
  def classWeights(
      df: DataFrame,
      classCol: String,
      beta: Double = 0.999
  ): DataFrame = {
    require(beta >= 0.0 && beta < 1.0, s"beta must be in [0, 1), got $beta")
    val q9 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 9)
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val per = df.filter(col(classCol).isNotNull)
      .groupBy(col(classCol).as("class"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__raw",
        q9(lit(1.0 - beta) / (lit(1.0) - pow(lit(beta), col("n").cast("double"))))
          .cast("decimal(18,9)"))
      .localCheckpoint(true) // feeds the totals reduction AND the final projection
    val tot = per.agg(count(lit(1)).as("__k"), sum(col("n")).as("__tot"),
      sum(col("__raw")).cast("decimal(38,9)").as("__sraw"))
    per.crossJoin(broadcast(tot))
      .select(col("class"), col("n"),
        q6(col("__tot").cast("double") /
          (col("__k").cast("double") * col("n").cast("double"))).as("inv_weight"),
        q6(col("__k").cast("double") * col("__raw").cast("double") /
          col("__sraw").cast("double")).as("ens_weight"))
  }

  /** Raking (iterative proportional fitting, Deming & Stephan 1940):
    * per-cell weights over a two-way categorical grid such that the
    * WEIGHTED marginals match target shares on both axes — the survey /
    * corpus reweighting standard when you know the population mix you
    * want (lang share, source share) but can only adjust at the cell
    * level. A fixed iteration count keeps the operator deterministic and
    * the oracle unrollable (the labelPropagation contract); IPF converges
    * geometrically, so a handful of rounds lands within the 1e-9 grid.
    *
    * Each round rescales row-then-column: `w ← ⌊(T_axis/Σ_axis w·n) · w⌋₉`
    * with the axis sums EXACT (decimal products of 1e-9-grid weights and
    * integer counts) and the update quantized back to the 1e-9 grid — so
    * every iteration is engine-reproducible. Cells outside the listed
    * categories are dropped (epochMix whitelist semantics); shares must
    * each sum to 1 ± 1e-9.
    *
    * Scale shape: ONE corpus-linear counting aggregation; iterations run
    * on the |rows|·|cols| enum grid (per-axis window sums over grid-sized
    * partitions). Output: (rowCol, colCol, n, weight), weight on the 1e-9
    * grid as a double.
    */
  def rakeWeights(
      df: DataFrame,
      rowCol: String,
      colCol: String,
      rowShares: Seq[(String, Double)],
      colShares: Seq[(String, Double)],
      iterations: Int = 3
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iterations >= 1 && iterations <= 8, s"iterations=$iterations out of [1, 8]")
    def checkShares(nm: String, s: Seq[(String, Double)]): Unit = {
      require(s.nonEmpty && s.forall(_._2 > 0.0), s"$nm shares must be positive")
      require(math.abs(s.map(_._2).sum - 1.0) < 1e-9, s"$nm shares must sum to 1")
      require(s.map(_._1).distinct.size == s.size, s"$nm categories must be unique")
    }
    checkShares("row", rowShares); checkShares("col", colShares)
    def shareExpr(shares: Seq[(String, Double)], c: Column): Column =
      shares.tail.foldLeft(when(c === shares.head._1, lit(shares.head._2))) {
        case (acc, (k, v)) => acc.when(c === k, lit(v))
      }
    val q9 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 9)
    val grid = df
      .filter(col(rowCol).isin(rowShares.map(_._1): _*) &&
        col(colCol).isin(colShares.map(_._1): _*))
      .groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__N", sum(col("n")).over(Window.partitionBy(lit(1))))
      .withColumn("__w", lit(1.0).cast("decimal(18,9)"))
      .localCheckpoint(true) // grid-sized; the iteration base
    // every listed category must actually occur: an absent category's
    // target mass is unallocatable, so IPF would "converge" to weights
    // matching NEITHER marginal with no error — fail loudly instead
    def checkPresent(nm: String, axis: String, s: Seq[(String, Double)]): Unit = {
      val present = grid.select(col(axis).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      val missing = s.map(_._1).filterNot(present)
      require(missing.isEmpty,
        s"$nm categories ${missing.mkString(", ")} have no rows — their target " +
          "share is unallocatable; drop them (and renormalize) first")
    }
    checkPresent("row", "__r", rowShares); checkPresent("col", "__c", colShares)
    def rescale(cur: DataFrame, axis: String, shares: Seq[(String, Double)]): DataFrame =
      cur
        .withColumn("__axsum",
          // n cast to decimal(10,0) FIRST: (18,9)×(20,0) would hit the
          // 38-precision ceiling and Spark silently drops the scale to 8
          // (rounding w·n to 1e-8) while other engines keep 1e-9 — the
          // systematic half-grid divergence this round's verify caught
          sum((col("__w") * col("n").cast("decimal(10,0)")).cast("decimal(38,9)"))
            .over(Window.partitionBy(col(axis))).cast("decimal(38,9)"))
        .withColumn("__w",
          q9(shareExpr(shares, col(axis)) * col("__N").cast("double") /
            col("__axsum").cast("double") * col("__w").cast("double"))
            .cast("decimal(18,9)"))
        .drop("__axsum")
    val done = (1 to iterations).foldLeft(grid: DataFrame) { (cur, _) =>
      rescale(rescale(cur, "__r", rowShares), "__c", colShares)
    }
    done.select(col("__r").as(rowCol), col("__c").as(colCol), col("n"),
      col("__w").cast("double").as("weight"))
  }
}
