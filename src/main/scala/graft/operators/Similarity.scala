package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, as a 100 TB pipeline needs:
  *  - [[bruteForceTopK]] — the exact baseline: broadcast the (small) probe
  *    set against the full vector table. Embarrassingly parallel scan, one
  *    small shuffle for the per-probe top-k. Exact, oracle-checkable.
  *  - [[lshTopK]] — the scale path: random-hyperplane LSH buckets the table
  *    so each probe only scores vectors sharing its signature bucket.
  *    Approximate (recall < 1), sub-linear per probe.
  *
  * All arithmetic runs in double precision through the native codegen'd
  * dot-product expression ([[graft.functions.DotProductDouble]]) — no UDFs,
  * no collect; the stock higher-order form is kept as the bit-identical
  * reference implementation.
  */
object Similarity {

  /** Cast an array<float> column to array<double> (all similarity math runs
    * in doubles so results are stable and engine-comparable). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product as a higher-order-function fold — the stock-Spark
    * reference implementation. Hot paths below use the codegen'd native
    * expression [[graft.functions.VectorExpressions.dot]], which is proven
    * bit-identical (same fold order) and allocation-free; an unrolled
    * `element_at` tree was also tried and measured 2x SLOWER (falls out of
    * whole-stage codegen). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Codegen'd fast path (see [[graft.functions.DotProductDouble]]). */
  def fastDot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(fastDot(a, a))

  def cosine(a: Column, b: Column): Column = fastDot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for every probe row.
    *
    * @param vectors  (id, vec float array) table — arbitrarily large
    * @param probes   (id, vec) — small enough to broadcast
    * @return (probe_id, nbr_id, rnk, cos_sim) with rnk 1..k by descending
    *         similarity, id-tiebroken
    */
  /** `scoreScale >= 0` quantizes the cosine (`round(sim, scoreScale)`)
    * BEFORE the rank window — the rank-stable retrieval form (see
    * [[TextAnalysis.bm25TopK]]'s scoreScale for the full rationale): dot
    * products are summation-order-sensitive float sums, so raw-score
    * ranks at a close boundary are engine noise; quantize-then-tiebreak
    * (lowest nbr id) gives one engine-independent answer provided no true
    * cosine sits within noise of a rounding boundary (measured per
    * corpus). */
  def bruteForceTopK(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      probes: DataFrame,
      probeId: String,
      probeCol: String,
      k: Int,
      scoreScale: Int = -1
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Norms are per-vector, so compute them BELOW the join (once per row,
    // not once per pair) — the division is unchanged, so results are
    // bit-identical to the naive form at a third of the flops.
    val v = Dedup.withComputeParallelism(
        vectors.select(col(vectorId).as("nbr_id"), asDouble(col(vectorCol)).as("__v")))
      .withColumn("__vn", norm(col("__v")))
    val p = probes.select(col(probeId).as("probe_id"), asDouble(col(probeCol)).as("__p"))
      .withColumn("__pn", norm(col("__p")))
    val rawSim = fastDot(col("__p"), col("__v")) / (col("__pn") * col("__vn"))
    val scored = v
      .crossJoin(broadcast(p))
      .filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("__sim", if (scoreScale >= 0) round(rawSim, scoreScale) else rawSim)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("__sim").desc, col("nbr_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("nbr_id"), round(col("__sim"), 4).as("cos_sim"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes for sign-LSH: plane
    * `j` component `d` is a fixed hash-derived value in [-1, 1). Stable
    * across JVMs/machines (no RNG state).
    */
  private def planeComponent(j: Int, d: Int): Double = {
    // splitmix64-style mix of (j, d) — public-domain constant mixing
    var z = j.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L + 0x94d049bb133111ebL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** The deterministic sign-LSH planes, exposed so an INDEPENDENT engine can
    * reproduce the bucketing exactly — the q33 oracle embeds these values as
    * SQL literals (Double.toString round-trips, so the re-parsed constants
    * are bit-identical). */
  def hyperplanes(dim: Int, nBits: Int): Seq[Array[Double]] =
    (0 until nBits).map(j => Array.tabulate(dim)(i => planeComponent(j, i)))

  /** Sign-LSH bucket signature: bit j = sign(v · plane_j). Each plane is a
    * literal double array dotted through the codegen'd native expression —
    * nBits dot calls instead of nBits×dim `element_at` nodes (same
    * left-to-right summation order, so results are bit-identical to the
    * unrolled form; the expression tree is ~dim× smaller). */
  def lshSignature(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = hyperplanes(dim, nBits).zipWithIndex.map { case (plane, j) =>
      val d = fastDot(vec, lit(plane))
      when(d >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Johnson–Lindenstrauss random-projection matrix rows, deterministic and
    * hash-seeded (no RNG state — stable across JVMs, reproducible by an
    * independent engine from `Double.toString` literals, same contract as
    * [[hyperplanes]]).
    *
    *  - `sparse = false`: Rademacher entries ±1/sqrt(outDim) — the classic
    *    dense JL matrix (Achlioptas 2001, "database-friendly" ±1 form).
    *  - `sparse = true`: Achlioptas 3-sparse entries {+s, 0, -s} with
    *    probabilities {1/6, 2/3, 1/6}, s = sqrt(3/outDim) — two thirds of
    *    the multiplies vanish, the at-scale choice when inDim is large.
    *
    * Entries draw from the same splitmix64 family as [[planeComponent]] but
    * at a disjoint row range (offset 1_000_003), so JL rows are independent
    * of the sign-LSH planes a pipeline may use downstream of the projection.
    */
  def jlPlanes(inDim: Int, outDim: Int, sparse: Boolean = false): Seq[Array[Double]] = {
    require(inDim > 0 && outDim > 0, "dimensions must be positive")
    val scale = if (sparse) math.sqrt(3.0 / outDim) else 1.0 / math.sqrt(outDim)
    (0 until outDim).map { j =>
      Array.tabulate(inDim) { d =>
        val u = (planeComponent(j + 1000003, d) + 1.0) / 2.0 // uniform [0, 1)
        if (sparse) {
          if (u < 1.0 / 6.0) scale else if (u < 1.0 / 3.0) -scale else 0.0
        } else if (u < 0.5) -scale
        else scale
      }
    }
  }

  /** Johnson–Lindenstrauss projection: adds `outCol` = the input embedding
    * multiplied through the deterministic [[jlPlanes]] matrix, shrinking
    * `inDim` dims to `outDim` while preserving pairwise distances within
    * the JL (1±eps) bound, eps ~ sqrt(8 ln n / outDim).
    *
    * Scale shape: a pure per-row projection — `outDim` codegen'd
    * dot-products against literal rows, zero shuffle, zero state, stream-
    * safe. At 100 TB this runs in the scan stage; the payoff is every
    * DOWNSTREAM shuffle (LSH bucketing, IVF assignment, near-dup verify,
    * ANN scoring) moving outDim/inDim of the bytes — e.g. 64→16 cuts
    * shuffle width of [[cosineNearDupPairsLsh]]'s verify legs 4×. Compose:
    * `jlProject(...)` then any operator in this file on `outCol`.
    */
  def jlProject(
      df: DataFrame,
      vectorCol: String,
      outCol: String,
      inDim: Int,
      outDim: Int,
      sparse: Boolean = false
  ): DataFrame = {
    val planes = jlPlanes(inDim, outDim, sparse)
    val v = asDouble(col(vectorCol))
    df.withColumn(outCol, array(planes.map(p => fastDot(v, lit(p))): _*))
  }

  /** Approximate top-k: score only vectors in the probe's LSH bucket.
    * Shuffles on the bucket signature — per-probe work is bucket-sized, not
    * table-sized. Recall improves with fewer bits (bigger buckets); this is
    * the knob a 100 TB deployment tunes. Falls back to fewer than k results
    * for probes in sparse buckets (standard ANN behavior).
    */
  def lshTopK(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      probes: DataFrame,
      probeId: String,
      probeCol: String,
      k: Int,
      dim: Int,
      nBits: Int = 12
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Dedup.withComputeParallelism(
        vectors.select(col(vectorId).as("nbr_id"), asDouble(col(vectorCol)).as("__v")))
      .withColumn("__bucket", lshSignature(col("__v"), dim, nBits))
      .withColumn("__vn", norm(col("__v")))
    val p = probes.select(col(probeId).as("probe_id"), asDouble(col(probeCol)).as("__p"))
      .withColumn("__bucket", lshSignature(col("__p"), dim, nBits))
      .withColumn("__pn", norm(col("__p")))
    val scored = v
      .join(broadcast(p), Seq("__bucket"))
      .filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("__sim", fastDot(col("__p"), col("__v")) / (col("__pn") * col("__vn")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("__sim").desc, col("nbr_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("nbr_id"), round(col("__sim"), 4).as("cos_sim"))
  }

  /** IVF (inverted-file) approximate nearest neighbor — the second scale
    * path next to [[lshTopK]], with a knob ANN deployments actually tune
    * (`nprobe`): coarse-quantize every vector to its nearest centroid's cell,
    * then score each probe only against the `nprobe` cells nearest to it.
    *
    * Scale shape: centroids are collected driver-side ONCE (a k-means-sized
    * list — the "trained" quantizer; centroid choice is pluggable) and folded
    * into a literal argmax expression, so cell assignment of the big vector
    * table is a pure map — no join, no shuffle, whole-stage codegen'd. The
    * only shuffles are the broadcast-join of the (tiny) probe×cell fan-out
    * and the per-probe top-k window over candidate rows.
    *
    * Fully deterministic (argmax tie-breaks on the lowest centroid id), so
    * unlike sign-LSH the output is oracle-checkable end to end.
    *
    * @param centroids (id, vector) quantizer table — nlist rows, collected
    * @param nprobe    cells searched per probe; recall knob (nprobe = nlist
    *                  degenerates to exact brute force)
    */
  /** Quantizer table collected to the driver BY DESIGN: centroids are
    * small-by-contract (nlist rows) and compile into literal expressions
    * so assignment is a pure projection — see the ivfTopK scaladoc. */
  private def collectCentroids(
      centroids: DataFrame, centroidId: String, centroidCol: String): Seq[(Long, Array[Double], Double)] = {
    val cents = centroids
      .select(col(centroidId).cast("long"), asDouble(col(centroidCol)))
      .collect()
      .map(r => {
        val arr = r.getSeq[Double](1).toArray
        (r.getLong(0), arr, math.sqrt(arr.map(x => x * x).sum))
      })
      .sortBy(_._1)
      .toSeq
    require(cents.nonEmpty, "centroid table is empty")
    cents
  }

  /** Cells ranked by cosine(x, c_i): one dot expression per centroid into a
    * flat struct array, lexicographically sorted on (-sim, cid) — the
    * default struct ordering — so ascending sort = descending similarity
    * with the LOWEST centroid id winning exact ties (matches a
    * `row_number() OVER (ORDER BY sim DESC, cid)` oracle). Linear-size
    * expression tree; a folded `when` argmax would duplicate the running
    * best struct per level and blow up exponentially.
    */
  private def centroidsByDistance(
      cents: Seq[(Long, Array[Double], Double)], x: Column, xNorm: Column): Column =
    array_sort(array(cents.map { case (cid, arr, cn) =>
      struct((-(fastDot(x, lit(arr)) / (xNorm * lit(cn)))).as("ns"), lit(cid).as("c"))
    }: _*))

  def ivfTopK(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      centroids: DataFrame,
      centroidId: String,
      centroidCol: String,
      probes: DataFrame,
      probeId: String,
      probeCol: String,
      k: Int,
      nprobe: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = collectCentroids(centroids, centroidId, centroidCol)
    def cellsByDistance(x: Column, xNorm: Column): Column =
      centroidsByDistance(cents, x, xNorm)

    val v = Dedup.withComputeParallelism(
        vectors.select(col(vectorId).as("nbr_id"), asDouble(col(vectorCol)).as("__v")))
      .withColumn("__vn", norm(col("__v")))
      .withColumn("__cell", cellsByDistance(col("__v"), col("__vn")).getItem(0).getField("c"))

    // Probe side fans out to its nprobe nearest cells (probe set is small).
    val p = probes.select(col(probeId).as("probe_id"), asDouble(col(probeCol)).as("__p"))
      .withColumn("__pn", norm(col("__p")))
      .withColumn("__cell",
        explode(transform(slice(cellsByDistance(col("__p"), col("__pn")), 1, nprobe),
          e => e.getField("c"))))

    val scored = v
      .join(broadcast(p), Seq("__cell"))
      .filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("__sim", fastDot(col("__p"), col("__v")) / (col("__pn") * col("__vn")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("__sim").desc, col("nbr_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("nbr_id"), round(col("__sim"), 4).as("cos_sim"))
  }

  /** Sentinel default for the banded-LSH `bandBits` knob: resolve the
    * band width from a corpus count via [[sizedBandBits]] (one bounded
    * count job — a single long back to the driver — before planning the
    * pair mining). Pass an explicit width to skip the count, e.g. when
    * the corpus size is known or the recall calibration differs from the
    * default (base 3 at 2 000 rows, the §8.5 gate calibration). */
  val AutoBands: Int = -1

  /** Sentinel for [[trainKMeans]]'s `k`: resolve the cell count from the
    * corpus count via [[sizedKMeansK]] — the SemDeDup paper's own `k ∝ n`
    * sizing, which keeps within-cell pair volume linear in the corpus. */
  val AutoK: Int = -1

  /** `base` is recall-calibrated at this corpus size (the gate corpus the
    * §8.5 scale probe measured: 2 000 embeddings at sf0.1). */
  val SizedBandBitsN0: Long = 2000L

  /** Target vectors per k-means cell for [[sizedKMeansK]] — the occupancy
    * the committed SCALEPROBE_r16_sized q96 ladder held constant
    * (k = 4·mult over 2 000·mult vectors). */
  val SizedCellTarget: Long = 500L

  private[graft] def ceilLog2(n: Long): Int =
    if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)

  /** The measured §8.5 occupancy law, as code: the band width that holds
    * per-band bucket occupancy at (or under) its recall-calibrated
    * reference as the corpus grows — `base + ⌈log₂(n/n₀)⌉` for `n > n₀`,
    * `base` below it (fewer bits than the calibrated floor only add cost
    * at sizes where cost is already negligible). Each doubling past `n₀`
    * adds one bit, which doubles the bucket count and returns expected
    * occupancy — and with it the candidate-pair volume the verify join
    * scans — to the reference shape, the difference between the measured
    * exponent 1.96 (bandBits pinned at 3) and 0.93 (stepped) on the q48
    * ladder (SCALEPROBE_r16 vs _sized). Capped at min(24, dim): sign-LSH
    * keys carry at most one useful bit per dimension, and past 2²⁴
    * buckets per band the keys outnumber any real corpus's rows. */
  def sizedBandBits(n: Long, dim: Int, base: Int = 3, n0: Long = SizedBandBitsN0): Int = {
    require(n >= 0 && base >= 1 && n0 >= 1,
      s"sizedBandBits needs n >= 0, base >= 1, n0 >= 1; got ($n, $base, $n0)")
    val growth = if (n <= n0) 0 else ceilLog2((n + n0 - 1) / n0)
    math.min(math.min(24, dim), base + growth)
  }

  /** `k ∝ n` (SemDeDup's own sizing): cells scaled so expected occupancy
    * stays at `targetCellSize` — within-cell pair volume, the quadratic
    * term of [[semDedup]]/[[trainKMeans]] pipelines, then grows linearly
    * with the corpus (measured: exponent 1.03/tail 1.84 at fixed k = 4 vs
    * 0.25 at k ∝ n on the q96 ladder, SCALEPROBE_r16_tier2 vs _sized). */
  def sizedKMeansK(n: Long, targetCellSize: Long = SizedCellTarget): Int = {
    require(n >= 1 && targetCellSize >= 1,
      s"sizedKMeansK needs n >= 1 and targetCellSize >= 1; got ($n, $targetCellSize)")
    math.max(1L, (n + targetCellSize - 1) / targetCellSize).toInt
  }

  /** Resolve a possibly-[[AutoBands]] band width against the corpus:
    * explicit widths pass through untouched; the sentinel costs one
    * bounded count job (a single long to the driver) and applies
    * [[sizedBandBits]] at the default calibration. */
  private def resolveBandBits(bandBits: Int, corpus: => DataFrame, dim: Int): Int =
    if (bandBits != AutoBands) bandBits
    else sizedBandBits(corpus.count(), dim)

  /** Default in-memory sort budget per verify-join task, overridable per
    * session via `spark.graft.verify.partitionBytes`. Half the fair
    * execution-memory share of a fully-loaded executor (heap × 0.6 /
    * concurrent tasks — ~150 MB on the reference 8 GiB / 32-thread
    * shape): a partition that sorts inside its share never spills, and
    * the occupancy estimate is an upper bound, so real partitions land at
    * or under the target. Measured sweep on the ×10 rehearsal corpus
    * (47.5M candidate pairs, the REHEARSAL_r17 spill stage, clean box):
    * session-default 32 partitions → 61.5 s with 17 GB disk spill;
    * 226 partitions (128 MiB) → 43 s / 2.6 GB; **451 (64 MiB) → 38 s /
    * 0.3 GB**; 902 (32 MiB) → 56 s (shuffle blocks fragment: each
    * vector's run of pair rows splits across more blocks, and on this
    * corpus-with-repeats that costs 1.5× in compressed shuffle volume).
    * 64 MiB is the measured knee — spill ≤ 0.07× the stage shuffle at
    * the best wall time. */
  private[graft] val VerifyPartitionBytes: Long = 64L << 20

  /** Session override for [[VerifyPartitionBytes]] — set it to the
    * cluster's actual per-task execution-memory share when that differs
    * from the reference shape. */
  private[graft] val VerifyPartitionBytesConf = "spark.graft.verify.partitionBytes"

  /** Hard ceiling on the derived verify-partition count — at the point the
    * estimate asks for more than this, per-partition volume is governed by
    * skew, not count, and AQE's skew-join split is the right tool. */
  private[graft] val VerifyPartitionsCap: Int = 4096

  /** Shuffle-partition count for the banded-LSH candidate-VERIFY sort-merge
    * joins, derived from the same occupancy math that sizes the band width
    * — the r17 rehearsal's one pressure point made code. At `n` rows and
    * `2^bandBits` buckets per band, uniform expected occupancy is
    * `c = n / 2^bandBits` and per-band in-bucket pair volume is
    * `Σ c·(c−1)/2 ≥ n·(c−1)/2` (Jensen: uniform occupancy is the floor for
    * fixed `n`). Across `bands` bands the DISTINCT candidate set lies
    * between one band's volume (fully clustered corpus: the same groups
    * collide in every band) and `bands ×` it (spread corpus: each band
    * contributes fresh pairs); sizing on the upper bound only makes tasks
    * smaller, never partitions fewer, so the upper bound is what this uses.
    * The volume that matters is the WIDE sort — the first join's output
    * (pair ids + ONE projected double vector, `8·dim + 32` array bytes +
    * row overhead) shuffled on `id_b`; the second vector only joins in
    * after that sort — and the count targets `targetBytes`
    * ([[VerifyPartitionBytes]]) of in-memory sort per task: the knob that
    * zeroes the 17 GB disk spill REHEARSAL_r17 measured on the same
    * volume squeezed into the session-default 32 partitions. Never
    * returns fewer than `default` (small corpora keep the session shape
    * and gate plans unchanged), never more than [[VerifyPartitionsCap]]. */
  private[graft] def verifySmjPartitions(
      n: Long, dim: Int, bandBits: Int, bands: Int, default: Int,
      targetBytes: Long = VerifyPartitionBytes): Int = {
    require(n >= 0 && dim >= 1 && bandBits >= 1 && bands >= 1 && default >= 1 &&
        targetBytes >= (1L << 20),
      s"verifySmjPartitions needs n >= 0, dim/bandBits/bands/default >= 1, " +
        s"targetBytes >= 1 MiB; got ($n, $dim, $bandBits, $bands, $default, $targetBytes)")
    val buckets = 1L << math.min(bandBits, 62)
    val occ = n.toDouble / buckets.toDouble
    val estPairs = bands.toDouble * n.toDouble * math.max(occ - 1.0, 0.0) / 2.0
    val rowBytes = 8.0 * dim + 32.0 + 64.0
    val p = math.ceil(estPairs * rowBytes / targetBytes.toDouble)
    math.max(default, math.min(VerifyPartitionsCap.toDouble, p).toInt)
  }

  /** The session's effective verify-partition target: the
    * [[VerifyPartitionBytesConf]] override if set, else the default. */
  private def verifyTargetBytes(df: DataFrame): Long =
    df.sparkSession.conf.getOption(VerifyPartitionBytesConf)
      .map(_.toLong).getOrElse(VerifyPartitionBytes)

  /** The session's configured shuffle-partition count — the floor (and the
    * "leave the plan alone" sentinel) for [[verifySmjPartitions]]. */
  private def sessionShufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Hash-repartition both sides of an equi-join key to `p` partitions when
    * `p` exceeds the session default (otherwise pass through untouched —
    * the SMJ then shuffles to the session shape exactly as before). Both
    * sides carrying `HashPartitioning(key, p)` satisfies the SMJ's
    * clustered-distribution requirement with NO further exchange, so this
    * sets the join's parallelism without touching session config; an
    * explicit user repartition is also exempt from AQE coalescing, so the
    * count sticks. */
  private def repartitionForVerify(df: DataFrame, key: String, p: Int, default: Int): DataFrame =
    if (p <= default) df else df.repartition(p, col(key))

  /** Per-band sign-LSH keys for the banded (OR-amplified) pairs operator:
    * band `k`'s key packs `bandBits` sign bits from planes
    * `k*bandBits .. k*bandBits + bandBits - 1` — the SAME deterministic
    * [[hyperplanes]] family as [[lshSignature]]/q33, so an independent
    * engine can reproduce every bucket from the published constants.
    * Returned as `array<long>`, one key per band (no 64-bit packing limit,
    * unlike the single-long signature).
    */
  def bandKeys(vec: Column, dim: Int, bandBits: Int, bands: Int): Column = {
    val planes = hyperplanes(dim, bandBits * bands)
    val keys = (0 until bands).map { k =>
      (0 until bandBits).map { i =>
        val d = fastDot(vec, lit(planes(k * bandBits + i)))
        when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    array(keys: _*)
  }

  /** Candidate near-dup pairs from banded sign-LSH: ids sharing any band's
    * key become a candidate. Same bucket-local shape as
    * [[Dedup.lshCandidatePairs]] — one explode + one shuffle on
    * (band, key), pair expansion inside the bucket, never a self-join and
    * never all-pairs. Bucket width is bounded by `2^bandBits` fan-in, the
    * recall/pruning knob: P(candidate) = 1 - (1 - p^bandBits)^bands with
    * p = 1 - angle/pi per plane.
    *
    * The expansion emits each in-bucket pair ONCE (ids sorted, partner
    * slice strictly after the anchor position) instead of the n² grid
    * filtered to i < j — at weak thresholds the generated row count is the
    * wide stage, so halving it matters more than anything downstream. The
    * cross-band `distinct()` is cheaper than it looks: partial hash
    * aggregation dedups map-side, so the shuffle carries unique pairs, not
    * the full expansion. (A first-matching-band filter that avoids the
    * distinct entirely was tried and measured 4x SLOWER: carrying per-row
    * key-prefix arrays through collect_list and a zip_with per generated
    * pair costs far more than the dedup shuffle saves.)
    */
  def cosineCandidatePairs(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      dim: Int,
      bandBits: Int,
      bands: Int,
      centerForBuckets: Boolean = false
  ): DataFrame =
    candidatePairsFromProjected(
      Dedup.withComputeParallelism(
        vectors.select(col(vectorId), asDouble(col(vectorCol)).as("__v"))),
      vectorId, dim, bandBits, bands, centerForBuckets)

  /** Candidate stage over an ALREADY-projected `(id, __v double array)`
    * frame — lets [[cosineNearDupPairsLsh]] share one projection between
    * candidate generation and verification instead of re-scanning the base
    * table per stage. */
  private def candidatePairsFromProjected(
      projected: DataFrame,
      vectorId: String,
      dim: Int,
      bandBits: Int,
      bands: Int,
      centerForBuckets: Boolean = false
  ): DataFrame = {
    // Sign-LSH assumes the corpus is spread around the origin; a corpus
    // confined to one orthant (image luminance grids, raw pixel/count
    // features: everything non-negative) pairs at cosine ~0.75 on AVERAGE,
    // so planes agree with p ~ 0.77 and buckets collapse — measured ~167M
    // candidate pairs over 12k such vectors at bandBits=10 where a
    // centered corpus yields ~2M. Centering the vectors FOR BUCKETING ONLY
    // restores the spread; verification always scores the RAW vectors, so
    // any pair surviving candidate generation is scored identically either
    // way. The candidate SET itself follows the centered spread model: at
    // configurations with candidate recall < 1, centered and raw bucketing
    // can admit different pairs (equality of output is only guaranteed
    // when recall is 1, as in q84's wide-band setting). The mean is a
    // 1-row in-plan aggregate, broadcast.
    val bucketed =
      if (!centerForBuckets) projected
      else {
        val mu = projected.agg(
          array((0 until dim).map(i => avg(element_at(col("__v"), i + 1))): _*).as("__mu"))
        projected.crossJoin(broadcast(mu))
          .select(col(vectorId),
            zip_with(col("__v"), col("__mu"), (a, b) => a - b).as("__v"))
      }
    val sigs = bucketed
      .select(col(vectorId), bandKeys(col("__v"), dim, bandBits, bands).as("__keys"))
    sigs
      .select(col(vectorId), posexplode(col("__keys")).as(Seq("__band", "__key")))
      .groupBy(col("__band"), col("__key"))
      .agg(sort_array(collect_list(col(vectorId))).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("__ids"), col("__i") + lit(2), size(col("__ids")))).as("id_b"))
      .distinct()
  }

  /** Band-bucket occupancy report — the measurement behind the §8.1
    * `bandBits ≈ log2(n/16)` sizing rule: per band, the bucket count,
    * the hottest bucket, and the PREDICTED candidate-pair volume
    * `Σ_buckets c·(c−1)/2` (exactly what the banded pair operators will
    * generate). Run this before a production
    * [[cosineNearDupPairsLsh]]/[[crossCosinePairsLsh]] campaign: a band
    * whose candidate_pairs explodes tells you to raise bandBits (or
    * center — the q84 orthant collapse shows up here as one mega-bucket)
    * BEFORE the task OOM does. Integer-exact end to end; one keyed
    * aggregation per stage.
    */
  def lshOccupancyReport(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      dim: Int,
      bandBits: Int,
      bands: Int,
      centerForBuckets: Boolean = false
  ): DataFrame = {
    val projected = Dedup.withComputeParallelism(
      vectors.select(col(vectorId), asDouble(col(vectorCol)).as("__v")))
    val bucketed =
      if (!centerForBuckets) projected
      else {
        val mu = projected.agg(
          array((0 until dim).map(i => avg(element_at(col("__v"), i + 1))): _*).as("__mu"))
        projected.crossJoin(broadcast(mu))
          .select(col(vectorId), zip_with(col("__v"), col("__mu"), (a, b) => a - b).as("__v"))
      }
    bucketed
      .select(posexplode(bandKeys(col("__v"), dim, bandBits, bands)).as(Seq("band", "__key")))
      .groupBy(col("band"), col("__key")).agg(count(lit(1)).as("__c"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("__c")).as("max_occupancy"),
        // c·(c−1) is even; shiftright halves it in INTEGER space (Column
        // `/` would detour through doubles and lose exactness past 2^53)
        sum(shiftright(col("__c") * (col("__c") - 1), 1)).as("candidate_pairs"))
  }

  /** CROSS-corpus cosine pair mining — [[cosineNearDupPairsLsh]]'s shape
    * between TWO DIFFERENT corpora (alignment/translation-pair mining,
    * corpus-vs-benchmark contamination at embedding level, catalog
    * matching): banded sign-LSH keys on both sides, candidates from the
    * (band, key) equi-join ACROSS the corpora (never a cross join), exact
    * cosine verification of candidates only. Both sides share the same
    * deterministic plane family, so an independent engine reproduces
    * every bucket. Precision 1 by verification; recall is the banding
    * knob (same model as the self-join form). Verify joins SMJ-pinned —
    * both sides corpus-shaped, the §8.1 derived-broadcast class.
    */
  def crossCosinePairsLsh(
      left: DataFrame,
      leftId: String,
      leftVecCol: String,
      right: DataFrame,
      rightId: String,
      rightVecCol: String,
      threshold: Double,
      dim: Int,
      bandBits: Int = AutoBands,
      bands: Int = 32
  ): DataFrame = {
    val l = Dedup.withComputeParallelism(
      left.select(col(leftId).as("id_a"), asDouble(col(leftVecCol)).as("__va")))
      .withColumn("__na", norm(col("__va")))
    val r = Dedup.withComputeParallelism(
      right.select(col(rightId).as("id_b"), asDouble(col(rightVecCol)).as("__vb")))
      .withColumn("__nb", norm(col("__vb")))
    // auto width sizes on TOTAL rows hashed into the shared bucket space
    // (both corpora land in the same (band, key) buckets); the same count
    // then sizes the verify joins' shuffle-partition count (the r17
    // rehearsal spill fix — see [[verifySmjPartitions]])
    val nOpt =
      if (bandBits == AutoBands)
        Some(l.select(col("id_a")).unionAll(r.select(col("id_b").as("id_a"))).count())
      else None
    val bb = nOpt.map(sizedBandBits(_, dim)).getOrElse(bandBits)
    val default = sessionShufflePartitions(l)
    val p = nOpt.map(verifySmjPartitions(_, dim, bb, bands, default, verifyTargetBytes(l)))
      .getOrElse(default)
    val lKeys = l.select(col("id_a"),
      posexplode(bandKeys(col("__va"), dim, bb, bands)).as(Seq("__band", "__key")))
    val rKeys = r.select(col("id_b"),
      posexplode(bandKeys(col("__vb"), dim, bb, bands)).as(Seq("__band", "__key")))
    // BOTH key frames are corpus-shaped explode derivatives with garbage
    // static size estimates — the §8.1 derived-broadcast class; pin the
    // candidate join to sort-merge (PlanAudit caught the right side being
    // broadcast at gate SF the first time this operator was audited)
    val cands = lKeys.hint("shuffle_merge")
      .join(rKeys.hint("shuffle_merge"), Seq("__band", "__key"))
      .select(col("id_a"), col("id_b")).distinct()
    repartitionForVerify(cands, "id_a", p, default)
      .join(repartitionForVerify(l, "id_a", p, default).hint("shuffle_merge"), Seq("id_a"))
      .transform(j => repartitionForVerify(j, "id_b", p, default))
      .join(repartitionForVerify(r, "id_b", p, default).hint("shuffle_merge"), Seq("id_b"))
      .withColumn("__sim", fastDot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(round(col("__sim"), 6) >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__sim"), 4).as("cos_sim"))
  }

  /** The scale path for [[cosineNearDupPairs]]: banded sign-LSH candidate
    * generation ([[cosineCandidatePairs]]) followed by EXACT cosine
    * verification of only the candidates — precision is always 1; recall is
    * the banding knob. The verification joins are pinned to sort-merge
    * (shuffle on id; see the body comment for why broadcast is forbidden),
    * the candidate stage is one keyed shuffle — no cross join anywhere, so
    * the plan contains no BroadcastNestedLoopJoin.
    *
    * Recall model: a pair at angle θ matches a band with prob
    * `(1 - θ/π)^bandBits` and is a candidate unless ALL `bands` bands miss.
    * At a realistic near-dup threshold (τ ≥ 0.8 → p ≥ 0.80, bandBits 8,
    * bands 16: miss ≈ (1 - 0.17)^16 ≈ 5%; bandBits 6 → miss < 0.4%) the
    * candidate set is a tiny fraction of all pairs. That model assumes a
    * corpus spread around the origin — for single-orthant embeddings (raw
    * image/count features) set `centerForBuckets = true`: bucketing runs
    * on mean-centered vectors (restoring the spread), verification stays
    * on the raw vectors, so the output is unchanged row for row. The q48
    * gate instead
    * runs τ = 0.3 on a no-planted-pairs corpus — the worst case for
    * sign-LSH (p ≈ 0.60) — with wide bands (bandBits 3, bands 32) chosen so
    * the measured recall on that corpus is exactly 1 and the output
    * hash-matches the all-pairs oracle; the docstring math, not the gate
    * corpus, is the 100 TB sizing guide.
    *
    * `bandBits` DEFAULTS TO [[AutoBands]] (r17): the width is derived from
    * a corpus count via [[sizedBandBits]], so a default-config deployment
    * gets the measured-linear occupancy-law shape at any corpus size (at
    * the gate corpora the auto width resolves to the same 3 bits the
    * oracle calibration pins, so auto ≡ gate shape there). The count is
    * one extra pass over `vectors` — callers with an expensive upstream
    * (decode chains) should persist their features or pass an explicit
    * calibrated width.
    */
  def cosineNearDupPairsLsh(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      threshold: Double,
      dim: Int,
      bandBits: Int = AutoBands,
      bands: Int = 32,
      centerForBuckets: Boolean = false
  ): DataFrame = {
    // ONE projection feeds both stages: candidate generation reuses the
    // same (id, __v) frame the verification joins against, so the base
    // table is scanned/projected once, not once per stage
    val projected = Dedup.withComputeParallelism(
      vectors.select(col(vectorId), asDouble(col(vectorCol)).as("__v")))
    val v = projected.withColumn("__n", norm(col("__v")))
    // ONE count drives both sizing laws on the auto path: the band width
    // (occupancy) and the verify join's shuffle-partition count (pair
    // volume). Explicit-width callers skip the count and keep the session
    // partitioning — they are expected to have sized both knobs themselves.
    val nOpt = if (bandBits == AutoBands) Some(projected.count()) else None
    val bb = nOpt.map(sizedBandBits(_, dim)).getOrElse(bandBits)
    val default = sessionShufflePartitions(projected)
    val p = nOpt
      .map(verifySmjPartitions(_, dim, bb, bands, default, verifyTargetBytes(projected)))
      .getOrElse(default)
    val cands = candidatePairsFromProjected(projected, vectorId, dim, bb, bands, centerForBuckets)
    // SHUFFLE_MERGE pins the verify joins to sort-merge: the candidate table
    // comes out of an explode->aggregate chain whose STATIC size estimate is
    // garbage (Catalyst propagates the pre-explode scan size), so the
    // planner will happily build a BroadcastHashJoin over a candidate set
    // that scales O(sum bucket^2) with the corpus — a measured
    // driver-OOM at 16x the gate SF (36M candidate rows broadcast), and a
    // statically-planned broadcast is one AQE cannot demote at runtime.
    // Both verify sides are corpus-sized at production scale, so the merge
    // join IS the 100 TB shape; at gate SF the forgone broadcast costs
    // milliseconds.
    // Verify joins run at `p` partitions ([[verifySmjPartitions]]): both
    // sides of each SMJ are hash-repartitioned on the join key, so the
    // exchanges HERE are the join's exchanges (HashPartitioning(key, p)
    // satisfies the SMJ requirement — no second shuffle) and the sort that
    // previously squeezed the whole candidate volume into the session's
    // default partition count now meets a per-task volume it can sort
    // in memory (the REHEARSAL_r17 spill fix).
    val va = v.select(col(vectorId).as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val vb = v.select(col(vectorId).as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    repartitionForVerify(cands, "id_a", p, default)
      .join(repartitionForVerify(va, "id_a", p, default).hint("shuffle_merge"), Seq("id_a"))
      .transform(j => repartitionForVerify(j, "id_b", p, default))
      .join(repartitionForVerify(vb, "id_b", p, default).hint("shuffle_merge"), Seq("id_b"))
      .withColumn("__sim", fastDot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(round(col("__sim"), 6) >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__sim"), 4).as("cos_sim"))
  }

  /** Symmetric per-vector INT8 quantization — the embedding-storage
    * compression step of a 100 TB ANN deployment (4x smaller at rest, and
    * integer dot products downstream): `scale = max|x| / 127` (the largest
    * element maps to ±127 exactly, tie-free), `q_i = round(x_i / scale)`
    * in [-127, 127]. Pure codegen'd column expressions, zero shuffles;
    * all-zero vectors quantize to scale 0 with an all-zero qvec.
    * Output: (vectorId, qvec array<int>, scale double).
    */
  def quantizeInt8(vectors: DataFrame, vectorId: String, vectorCol: String): DataFrame = {
    val projected = vectors.select(col(vectorId), asDouble(col(vectorCol)).as("__v"))
    val scale = array_max(transform(col("__v"), x => abs(x))) / 127.0
    projected
      .select(col(vectorId), col("__v"), scale.as("scale"))
      .select(
        col(vectorId),
        when(col("scale") === 0.0, transform(col("__v"), _ => lit(0)))
          .otherwise(transform(col("__v"), x => round(x / col("scale")).cast("int")))
          .as("qvec"),
        col("scale"))
  }

  /** Inverse of [[quantizeInt8]] for scoring: `x'_i = q_i * scale`. Exact
    * reconstruction of the max element; everything else within scale/2. */
  def dequantize(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)

  // --- 1-bit (sign) quantization + Hamming search ------------------------

  /** 1-BIT sign quantization (Charikar 2002's SimHash applied to the raw
    * embedding axes): bit `k` of packed 32-bit word `w` is set iff
    * `vec[32w+k] >= 0`. At 100 TB this is the memory-bound extreme of the
    * quantization ladder ([[quantizeInt8]] 4×, [[pqEncode]] ~dim×/m, sign
    * 32×): a 64-dim float32 corpus drops from 256 B to 8 B per vector, and
    * Hamming distance (one xor+popcount per word) approximates angular
    * distance — `cos(θ) ≈ cos(π·h/dim)`. One fused kernel call per row
    * ([[graft.functions.SignPackExpr]]), zero shuffle, stream-safe.
    * Output: (vectorId, code array<long> of ⌈dim/32⌉ positive words). */
  def signQuantize(vectors: DataFrame, vectorId: String, vectorCol: String): DataFrame =
    vectors.select(col(vectorId),
      graft.functions.VectorExpressions.signPack(col(vectorCol)).as("code"))

  /** Hamming distance between two packed codes (exact integer — the
    * oracle-friendly scoring primitive). */
  def hammingDist(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.hamming(a, b)

  /** Sign-code FIDELITY card — the one-row confusion summary of the
    * Hamming screen vs exact cosine (pairs_total / cos_pairs / ham_pairs /
    * both_pairs + screen recall/precision): the diagnostics a deployment
    * reads before trusting [[signHammingPairs]] as its candidate screen.
    *
    * DELIBERATELY ALL-PAIRS over the vectors it is given (the q31
    * allowance class): a fidelity measurement must see the misses, and a
    * banded screen cannot report its own false-negative rate. That makes
    * the contract explicit: **at scale this card runs on a SAMPLE, never
    * the corpus** — `sampleMod` keeps every id with
    * `keyHash(id) % sampleMod == 0` (deterministic, layout-invariant, the
    * [[Sampling.keyHash]] grid), so `sampleMod = 200` measures fidelity on
    * ~0.5 % of a 100 TB corpus at ~1/40000 of the pair cost, and the
    * estimate is unbiased because the sample is uniform over ids.
    * `sampleMod = 1` (full corpus) is the gate-scale diagnostics setting;
    * the guard refuses it beyond `maxFullRows` vectors so the quadratic
    * cannot ride a config default into production. */
  def signFidelityCard(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      cosineThreshold: Double,
      maxHamming: Int,
      sampleMod: Int = 1,
      maxFullRows: Long = 200000L
  ): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    val sampled =
      if (sampleMod == 1) vectors
      else vectors.filter(
        pmod(Sampling.keyHash(col(vectorId), "signfid"), lit(sampleMod.toLong)) === 0L)
    if (sampleMod == 1) {
      // all-pairs on the FULL input is a diagnostics-only setting: refuse
      // loudly past the cap instead of launching an n² shuffle (the count
      // is one cheap scan next to the pair volume it prevents)
      val n = vectors.select(col(vectorId)).count()
      require(n <= maxFullRows,
        s"signFidelityCard over all pairs of $n rows — pass sampleMod > 1 " +
          s"(deterministic hash sample) above $maxFullRows vectors")
    }
    val withCode = signQuantize(sampled, vectorId, vectorCol)
      .join(sampled, vectorId)
      .select(col(vectorId), asDouble(col(vectorCol)).as("__v"), col("code"))
      .withColumn("__n", norm(col("__v")))
    val a = withCode.select(col(vectorId).as("id_a"), col("__v").as("__va"),
      col("__n").as("__na"), col("code").as("__ca"))
    val b = withCode.select(col(vectorId).as("id_b"), col("__v").as("__vb"),
      col("__n").as("__nb"), col("code").as("__cb"))
    val cos = fastDot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select((round(cos, 6) >= cosineThreshold).as("__cp"),
        (hammingDist(col("__ca"), col("__cb")) <= maxHamming.toLong).as("__hp"))
      .agg(
        count(lit(1)).as("pairs_total"),
        count(when(col("__cp"), 1)).as("cos_pairs"),
        count(when(col("__hp"), 1)).as("ham_pairs"),
        count(when(col("__cp") && col("__hp"), 1)).as("both_pairs"))
      .select(col("pairs_total"), col("cos_pairs"), col("ham_pairs"), col("both_pairs"),
        round(col("both_pairs").cast("double") / col("cos_pairs").cast("double"), 4)
          .as("screen_recall"),
        round(col("both_pairs").cast("double") / col("ham_pairs").cast("double"), 4)
          .as("screen_precision"))
  }

  /** HARD-NEGATIVE mining for embedding training — per probe, the top-k
    * most-similar vectors that are NOT near-duplicates: the highest-value
    * contrastive negatives are the ones closest to the anchor, but a
    * near-dup in the negative set poisons the loss (it IS the anchor), so
    * the candidate set anti-joins an exclusion pair table first
    * ([[signHammingPairs]] is the cheap screen that builds it at scale).
    * [[bruteForceTopK]]'s shape with the exclusion applied BEFORE the
    * rank window (excluding after would leave rank gaps). Exclusions are
    * matched in both orientations; self always excluded. */
  def hardNegatives(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      probes: DataFrame,
      probeId: String,
      probeCol: String,
      exclude: DataFrame, // (id_a, id_b) near-dup pairs, either orientation
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Dedup.withComputeParallelism(
        vectors.select(col(vectorId).as("nbr_id"), asDouble(col(vectorCol)).as("__v")))
      .withColumn("__vn", norm(col("__v")))
    val p = probes.select(col(probeId).as("probe_id"), asDouble(col(probeCol)).as("__p"))
      .withColumn("__pn", norm(col("__p")))
    val ex = exclude.select(col("id_a").as("probe_id"), col("id_b").as("nbr_id"))
      .unionByName(exclude.select(col("id_b").as("probe_id"), col("id_a").as("nbr_id")))
      .distinct()
    val w = Window.partitionBy(col("probe_id")).orderBy(col("__sim").desc, col("nbr_id"))
    v.crossJoin(broadcast(p))
      .filter(col("nbr_id") =!= col("probe_id"))
      // near-dup exclusion pairs are a join derivative with garbage size
      // estimates — pin the anti-join to SMJ (the q61 eligible rule)
      .join(ex.hint("shuffle_merge"), Seq("probe_id", "nbr_id"), "left_anti")
      .withColumn("__sim", fastDot(col("__p"), col("__v")) / (col("__pn") * col("__vn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("nbr_id"), round(col("__sim"), 4).as("cos_sim"))
  }

  /** EXACT all-pairs Hamming-radius search via multi-index hashing
    * (Norouzi et al. 2012, "Fast Search in Hamming Space with Multi-Index
    * Hashing"): the `dim` code bits split into ⌈dim/bandBits⌉ disjoint
    * bands; by pigeonhole two codes within Hamming distance `maxHamming <
    * bands` agree EXACTLY on at least one band, so a band-value equi-join
    * finds every qualifying pair — guaranteed recall 1 (unlike sign-LSH
    * banding, whose recall is probabilistic) — and the verify step makes
    * precision 1. Scale shape: |corpus|·bands rows shuffle on (band,
    * value); candidates per bucket are corpus-dependent but bounded by the
    * band width (2^bandBits buckets per band); the exact Hamming check is
    * one fused xor+popcount per candidate. SMJ-pinned self-join under the
    * explode (the [[Dedup.simHashPairsFromSignatures]] rule — static size
    * estimates under explodes are garbage, broadcasting the corpus is
    * wrong at scale). */
  def signHammingPairs(
      df: DataFrame,
      idCol: String,
      codeCol: String,
      dim: Int,
      maxHamming: Int,
      bandBits: Int = 8
  ): DataFrame = {
    require(bandBits >= 1 && bandBits <= 32 && 32 % bandBits == 0,
      s"bandBits must divide 32, got $bandBits")
    val bands = (dim + bandBits - 1) / bandBits
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole needs maxHamming < bands: $maxHamming >= $bands " +
        s"(dim=$dim, bandBits=$bandBits) — narrow the radius or the bands")
    val bandVals = (0 until bands).map { j =>
      shiftright(element_at(col(codeCol), j * bandBits / 32 + 1),
        (j * bandBits) % 32).bitwiseAND((1L << bandBits) - 1)
    }
    val banded = df.select(col(idCol), col(codeCol),
      posexplode(array(bandVals: _*)).as(Seq("__band", "__bv")))
    val a = banded.select(col("__band"), col("__bv"),
      col(idCol).as("id_a"), col(codeCol).as("__ca"))
    val b = banded.select(col("__band"), col("__bv"),
      col(idCol).as("id_b"), col(codeCol).as("__cb"))
    a.join(b.hint("shuffle_merge"), Seq("__band", "__bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist(col("__ca"), col("__cb")).as("hamming"))
      // filter BEFORE the dedup shuffle: hamming is a function of the
      // pair, so far-apart band-collision candidates can be dropped
      // map-side instead of riding through the distinct with both
      // packed codes attached (r15 ADVICE)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact Hamming top-k over packed codes — [[bruteForceTopK]]'s 1-bit
    * sibling (broadcast probes, scan the corpus once, per-probe top-k; the
    * per-pair cost drops from `dim` float multiplies to ⌈dim/32⌉
    * xor+popcounts). Rank by (hamming asc, nbr id asc) — all-integer, so
    * even the ranking is engine-exact. */
  def signHammingTopK(
      vectors: DataFrame,
      vectorId: String,
      codeCol: String,
      probes: DataFrame,
      probeId: String,
      probeCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Dedup.withComputeParallelism(
      vectors.select(col(vectorId).as("nbr_id"), col(codeCol).as("__c")))
    val p = probes.select(col(probeId).as("probe_id"), col(probeCol).as("__p"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("hamming"), col("nbr_id"))
    v.crossJoin(broadcast(p))
      .filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("hamming", hammingDist(col("__p"), col("__c")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk").cast("long").as("rnk"),
        col("nbr_id"), col("hamming"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold.
    * Exact over all pairs below `maxIdForExact` table sizes it is meant for
    * oracle checking; the scale path is the same computation restricted to
    * LSH buckets (see [[cosineNearDupPairsLsh]]).
    */
  def cosineNearDupPairs(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      threshold: Double
  ): DataFrame = {
    val v = Dedup.withComputeParallelism(
        vectors.select(col(vectorId), asDouble(col(vectorCol)).as("__v")))
      .withColumn("__n", norm(col("__v")))
    val a = v.select(col(vectorId).as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val b = v.select(col(vectorId).as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("__sim", fastDot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(round(col("__sim"), 6) >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__sim"), 4).as("cos_sim"))
  }

  /** Semantic decontamination — the EMBEDDING-level sibling of the n-gram
    * benchmark decontamination ([[TextAnalysis]]'s decontaminate family):
    * drop every corpus document whose embedding sits within cosine
    * `threshold` of ANY eval-set embedding. Paraphrased benchmark items
    * share no 8-gram with the original but land on near-identical
    * embeddings — this is the gate that catches them.
    *
    * Scale shape: the eval set is benchmark-sized by contract and is
    * EXPLICITLY broadcast (the [[TextAnalysis.filterByDomainBlocklist]]
    * small-by-nature argument); the corpus is scanned once against it (a
    * BNLJ over a constant-size side — q26's intended probe shape). The
    * matched-id set is bounded by how much of the CORPUS is contaminated —
    * potentially large and statically misestimated, so the anti-join back
    * is SMJ-pinned (q64's discipline). The similarity test quantizes to 6
    * decimals before the threshold compare ([[cosineNearDupPairs]]'s
    * boundary rule), so membership is engine-stable. Zero-norm vectors
    * have no direction (and 0/0 is an ANSI-mode error, not NaN): they are
    * EXCLUDED from the match scan on both sides, so a zero-norm corpus
    * vector is always KEPT (documented, not silent).
    */
  def semanticDecontaminate(
      corpus: DataFrame,
      vectorId: String,
      vectorCol: String,
      evalVecs: DataFrame,
      evalId: String,
      evalVecCol: String,
      threshold: Double
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0, 1], got $threshold")
    val ev = broadcast(
      evalVecs.select(asDouble(col(evalVecCol)).as("__ev"))
        .withColumn("__en", norm(col("__ev")))
        .filter(col("__en") > 0))
    val hit = corpus
      .select(col(vectorId), asDouble(col(vectorCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .filter(col("__n") > 0)
      .crossJoin(ev)
      .filter(round(fastDot(col("__v"), col("__ev")) / (col("__n") * col("__en")), 6)
        >= threshold)
      .select(col(vectorId)).distinct()
    corpus.join(hit.hint("shuffle_merge"), Seq(vectorId), "left_anti")
  }

  /** Embedding-space drift between two corpus vintages: cosine between
    * the per-dimension MEAN vectors (plus both norms) — the cheap
    * first-alarm for an embedding-model swap or a population shift
    * upstream of every ANN index built on the space. Two dim-bounded
    * aggregations + one scalar row; rounds to 6.
    */
  def embeddingDrift(
      dfA: DataFrame, dfB: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim > 0, "dim must be positive")
    def meanVec(df: DataFrame, out: String) =
      df.select(asDouble(col(vecCol)).as("__v"))
        .agg(array((0 until dim).map(i => avg(element_at(col("__v"), i + 1))): _*).as(out))
    meanVec(dfA, "__ma").crossJoin(broadcast(meanVec(dfB, "__mb")))
      .select(
        round(sqrt(fastDot(col("__ma"), col("__ma"))), 6).as("norm_a"),
        round(sqrt(fastDot(col("__mb"), col("__mb"))), 6).as("norm_b"),
        round(fastDot(col("__ma"), col("__mb")) /
          (sqrt(fastDot(col("__ma"), col("__ma"))) * sqrt(fastDot(col("__mb"), col("__mb")))), 6)
          .as("cos_means"))
  }

  /** Per-group embedding-centroid outlier flags — the SEMANTIC outlier
    * filter of a curation pipeline (a "zh" document whose embedding sits
    * far from the zh centroid is mislabeled, machine-generated, or
    * garbage; q165's corpus-level drift signal taken to row granularity).
    *
    * The centroid is ORDER-FREE by the klFromCorpus integer-grid
    * convention: each element quantized to a 1e-7 grid as a long,
    * integer-summed per dimension (any shuffle order), one division by
    * the group count — so the centroid, every cosine, and the flag are
    * bit-identical across engines and runs. Zero-norm rows (and groups
    * whose centroid collapses to zero) emit cos 0 and flag true — no
    * direction means no evidence of membership.
    *
    * Shape at 100 TB: one keyed aggregation to |groups|·dim partial sums
    * (map-side combined, enum-bounded output), centroids broadcast back
    * (a |groups|-row model frame — the q37 boundary-table class), then a
    * pure scoring projection. Output: (id, group, cos_centroid,
    * is_outlier).
    */
  def centroidOutliers(
      vectors: DataFrame,
      idCol: String,
      groupCol: String,
      vectorCol: String,
      dim: Int,
      minCos: Double
  ): DataFrame = {
    require(dim > 0 && dim <= 4096, s"dim=$dim out of (0, 4096]")
    val proj = vectors.select(col(idCol), col(groupCol),
      asDouble(col(vectorCol)).as("__v"))
    val q = transform(col("__v"), x => floor(x * 1e7 + lit(0.5)).cast("long"))
    val sums = proj
      .select(col(groupCol), q.as("__q"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        array((0 until dim).map(i => sum(element_at(col("__q"), i + 1))): _*).as("__s"))
      .select(col(groupCol),
        transform(col("__s"), s => s.cast("double") / 1e7 / col("__n")).as("__c"))
    proj.join(broadcast(sums), Seq(groupCol))
      .withColumn("__cn", norm(col("__c")))
      .withColumn("__vn", norm(col("__v")))
      .select(col(idCol), col(groupCol),
        graft.functions.Quantize.scaledFloor(
          when(col("__vn") > 0 && col("__cn") > 0,
            fastDot(col("__v"), col("__c")) / (col("__vn") * col("__cn")))
            .otherwise(lit(0.0)), 6).as("cos_centroid"))
      .withColumn("is_outlier", col("cos_centroid") < minCos)
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    * from a RELEVANCE-scored candidate pool, greedily select `k` items,
    * each step taking the candidate maximizing
    * `λ·rel − (1−λ)·max_{s ∈ selected} cos(v, v_s)` — relevance traded
    * against redundancy with what is already picked. THE diversity
    * re-ranker of retrieval-augmented pipelines (a RAG context window of
    * five near-identical passages wastes four slots; MMR spends them).
    *
    * Greedy selection is inherently sequential in k, and k is a CONTEXT
    * WINDOW budget (guarded ≤ 64) — so each of the k steps is one
    * corpus-safe argmax (a 1-row sort-limit collect of (score, id, vec),
    * the trainKMeans farthest-point class: only k rows ever reach the
    * driver; the pool is scanned k times, never joined with itself).
    * Scores quantize through [[graft.functions.Quantize.scaledFloor]](6)
    * BEFORE the argmax with ties to the lowest id, so the selection is
    * engine-reproducible. Output: (rank 1..k, id, mmr_score) — rank 1's
    * score is λ times its (quantized) relevance (the redundancy term is
    * zero at the first pick, but the λ factor still applies).
    */
  def mmrRerank(
      candidates: DataFrame,
      idCol: String,
      vectorCol: String,
      relevanceCol: String,
      k: Int,
      lambda: Double
  ): DataFrame = {
    require(k >= 1 && k <= 64, s"k=$k out of [1, 64] — k is a context-window budget")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0, 1], got $lambda")
    val spark = candidates.sparkSession
    // non-long-castable ids are EXCLUDED before the long-keyed loop (the
    // bm25TopK null-decode discipline); the pool is materialized ONCE —
    // each of the k argmax steps re-references it, and without the
    // checkpoint every step replans and re-runs the caller's entire
    // scoring subtree (the rm3Expansion fb-table class)
    val pool = candidates.select(col(idCol).cast("long").as("__id"),
      asDouble(col(vectorCol)).as("__v"), col(relevanceCol).cast("double").as("__rel"))
      .filter(col("__id").isNotNull)
      .localCheckpoint(true)
    val cos = (v: Column, p: Array[Double]) => {
      val pn = math.sqrt(p.map(x => x * x).sum)
      when(norm(v) > 0 && lit(pn) > 0, fastDot(v, lit(p)) / (norm(v) * lit(pn)))
        .otherwise(lit(0.0))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
    var i = 0
    while (i < k) {
      val already = selected.map(_._1)
      val base = if (already.isEmpty) pool else pool.filter(!col("__id").isin(already.toSeq: _*))
      val redundancy = selected.map { case (_, v, _) => cos(col("__v"), v) }.toSeq match {
        case Seq() => lit(0.0)
        case Seq(one) => one // Greatest requires >= 2 args
        case many => greatest(many: _*)
      }
      val top = base
        .select(col("__id"), col("__v"),
          graft.functions.Quantize.scaledFloor(
            lit(lambda) * col("__rel") - lit(1.0 - lambda) * redundancy, 6).as("__s"))
        .orderBy(col("__s").desc, col("__id"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val r = top.head
        selected += ((r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      } else i = k // pool exhausted
      i += 1
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, _, s), rk) => (rk + 1, id, s) }
      .toDF("rank", idCol, "mmr_score")
  }

  /** Deterministic distributed k-means for the IVF/SemDeDup quantizer —
    * closes the "centroids are trained offline" contract with an in-repo
    * trainer. Assignment is nearest-centroid by COSINE (argmax ties to the
    * lowest centroid id, the exact [[ivfTopK]]/[[semDedup]] rule); the
    * update is the arithmetic per-dimension mean of RAW member vectors by
    * default — cosine is scale-invariant in the centroid, so the
    * un-renormalized mean assigns identically to its normalized
    * counterpart, but high-magnitude members pull the mean's DIRECTION in
    * proportion to their norm, which is NOT spherical k-means unless the
    * corpus is unit-normalized. `spherical = true` averages L2-normalized
    * members instead (Dhillon & Modha's objective proper) — use it on
    * mixed-magnitude corpora. Zero-norm vectors have no direction (cosine
    * is NaN): they are excluded from training and from the returned sizes.
    *
    * Initialization (`init`):
    *  - `"lowest-id"` — the `k` lowest-id vectors. One pass, but a skewed
    *    id-to-region correlation can seed all k centroids in one region
    *    (hot IVF cells / hot SemDeDup clusters at 100 TB).
    *  - `"farthest"` — deterministic farthest-point traversal: seed with
    *    the lowest-id vector, then repeatedly add the vector whose nearest
    *    chosen centroid is LEAST similar (cosine; ties to the lowest id).
    *    k-1 extra corpus passes, each a pure projection + a 1-row sort-
    *    limit collect — the standard k-means++ determinization, spreads
    *    seeds across the corpus hull.
    * Both are deterministic by construction, so two runs (or two engines)
    * produce identical centroids.
    *
    * Scale shape per Lloyd iteration: ONE corpus pass — assignment is a
    * pure projection against literal centroid expressions, the update one
    * hash-shuffle aggregation to k×dim partial sums; only the k centroid
    * rows ever reach the driver (the same small-by-contract collect as
    * [[ivfTopK]]'s quantizer load). An empty cluster keeps its previous
    * centroid. Returns (centroidId, centroidCol, size) ready to feed
    * [[ivfTopK]] / [[semDedup]].
    */
  def trainKMeans(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      k: Int,
      iterations: Int,
      dim: Int,
      init: String = "lowest-id",
      spherical: Boolean = false
  ): DataFrame = {
    require(k == AutoK || k > 0, s"k must be positive or AutoK, got $k")
    require(iterations >= 0, "iterations must be non-negative")
    require(init == "lowest-id" || init == "farthest", s"unknown init '$init'")
    val spark = vectors.sparkSession
    import spark.implicits._
    val projected = Dedup.withComputeParallelism(
        vectors.select(col(vectorId).cast("long").as("__id"), asDouble(col(vectorCol)).as("__v")))
      .withColumn("__n", norm(col("__v")))
      // no-direction vectors would make every cosine NaN and poison the
      // assignment sort (the NaN-ordering cross-engine divergence class)
      .filter(col("__n") > lit(0.0))
    // AutoK resolution / k ∝ n guidance guard (r17): a FIXED cell count is
    // the q96-class scale trap — occupancy, and within-cell pair volume
    // downstream ([[semDedup]]), grows with the corpus. One bounded count
    // job resolves the sentinel and audits an explicit k against the
    // measured occupancy target.
    val k0 = {
      val n = projected.count()
      if (k == AutoK) sizedKMeansK(n)
      else {
        if (k > 0 && n / k > 2L * SizedCellTarget)
          System.err.println(
            s"[graft][sizing] trainKMeans: $n vectors over k=$k cells = ${n / k} per cell " +
              s"(over 2x the $SizedCellTarget-row target); within-cell pair stages downstream " +
              s"scale superlinearly at this occupancy - size k with sizedKMeansK(n) or AutoK")
        k
      }
    }
    def asCentroid(idx: Long, arr: Array[Double]): (Long, Array[Double], Double) =
      (idx, arr, math.sqrt(arr.map(x => x * x).sum))
    val initCents: Seq[(Long, Array[Double], Double)] = init match {
      case "lowest-id" =>
        val got = projected.orderBy(col("__id")).limit(k0).collect()
        require(got.length == k0, s"corpus has fewer than k=$k0 usable vectors")
        require(!got.exists(_.isNullAt(0)),
          s"id column '$vectorId' does not cast to long (null in init head); trainKMeans needs a numeric-castable id")
        got.zipWithIndex.map { case (r, i) => asCentroid(i.toLong, r.getSeq[Double](1).toArray) }.toSeq
      case "farthest" =>
        val first = projected.orderBy(col("__id")).limit(1).collect()
        require(first.nonEmpty, "corpus has no usable vectors")
        val seed = Seq(asCentroid(0L, first(0).getSeq[Double](1).toArray))
        (1 until k0).foldLeft(seed) { case (chosen, j) =>
          // nearest-chosen similarity = -ns of the sorted head; the NEXT
          // seed minimizes it (farthest point), ties to the lowest id
          val next = projected
            .withColumn("__best",
              -centroidsByDistance(chosen, col("__v"), col("__n")).getItem(0).getField("ns"))
            .orderBy(col("__best"), col("__id")).limit(1).collect()
          require(next.nonEmpty, s"corpus has fewer than k=$k0 usable vectors")
          chosen :+ asCentroid(j.toLong, next(0).getSeq[Double](1).toArray)
        }
    }

    val memberDim: Int => Column =
      if (spherical) i => element_at(col("__v"), i + 1) / col("__n")
      else i => element_at(col("__v"), i + 1)
    val finalCents = (0 until iterations).foldLeft(initCents) { case (cents, _) =>
      val assigned = projected.withColumn("cluster",
        centroidsByDistance(cents, col("__v"), col("__n")).getItem(0).getField("c"))
      val means = assigned
        .groupBy(col("cluster"))
        .agg(array((0 until dim).map(i => avg(memberDim(i))): _*).as("__mu"),
          count(lit(1)).as("__sz"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Double](1).toArray)
        .toMap
      cents.map { case (cid, old, _) =>
        val next = means.getOrElse(cid, old)
        (cid, next, math.sqrt(next.map(x => x * x).sum))
      }
    }

    val sizes = projected.withColumn("cluster",
        centroidsByDistance(finalCents, col("__v"), col("__n")).getItem(0).getField("c"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("size"))
    finalCents.map { case (cid, arr, _) => (cid, arr.toSeq) }
      .toDF("cid", "centroid")
      .join(sizes.withColumnRenamed("cluster", "cid"), Seq("cid"), "left")
      .select(col("cid"), col("centroid"), coalesce(col("size"), lit(0L)).as("size"))
  }

  /** Product-quantization codebook training (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search") — the memory-bound ANN
    * scale path past [[quantizeInt8]]: split every vector into `m`
    * subvectors of `dim/m` dims and learn an independent `ksub`-centroid
    * codebook per subspace, so a vector stores as `m` small codes
    * (m bytes at ksub ≤ 256 — a 64-dim float vector compresses 256→8
    * bytes, 32×) while distances stay computable from code lookups alone
    * ([[pqTopK]]).
    *
    * Determinism contract (the [[trainKMeans]] discipline): init codebook
    * `code j` of every subspace = subvector of the (j+1)-th LOWEST-id
    * vector; assignment is argmin squared-L2 distance with the distance
    * QUANTIZED to 6 decimals before the compare (the expansion
    * `‖x‖² − 2x·c + ‖c‖²` is a summation-order-sensitive float sum, so
    * two engines can disagree at ulp scale — rounding makes the argmin
    * engine-stable unless a true distance sits within noise of a rounding
    * boundary), ties to the lowest code. Two runs/engines produce
    * identical codebooks.
    *
    * Scale shape per Lloyd iteration: ONE corpus pass — the subspace
    * explode emits `m` rows of `dim/m` doubles per vector (same total
    * bytes as the input), assignment is a pure projection against literal
    * centroids, the update one keyed aggregation to `m·ksub` partial
    * means; only `m·ksub` rows reach the driver (small-by-contract, the
    * [[ivfTopK]] quantizer class). Empty codes keep their previous
    * centroid. Returns (subspace, code, centroid, size).
    */
  def pqTrain(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      m: Int,
      ksub: Int,
      dim: Int,
      iterations: Int
  ): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub > 0 && iterations >= 0, "ksub must be positive, iterations non-negative")
    val spark = vectors.sparkSession
    import spark.implicits._
    val dsub = dim / m
    val projected = Dedup.withComputeParallelism(
      vectors.select(col(vectorId).cast("long").as("__id"), asDouble(col(vectorCol)).as("__v")))
    // long-format (id, subspace, subvector) — m rows per vector, same bytes
    val subs = projected.select(col("__id"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), slice(col("__v"), s * dsub + 1, dsub).as("sv"))): _*)).as("__e"))
      .select(col("__id"), col("__e.s").as("__s"), col("__e.sv").as("__sv"))
      .withColumn("__n2", fastDot(col("__sv"), col("__sv")))

    val init: Map[Int, Seq[(Long, Array[Double])]] = {
      val got = projected.orderBy(col("__id")).limit(ksub).collect()
      require(got.length == ksub, s"corpus has fewer than ksub=$ksub vectors")
      // a non-numeric id casts to null, which sorts FIRST — so any null in
      // the head means the 'deterministic lowest-id' contract is undefined;
      // fail loudly instead of training on an arbitrary codebook
      require(!got.exists(_.isNullAt(0)),
        s"id column '$vectorId' does not cast to long (null in init head); pqTrain needs a numeric-castable id")
      (0 until m).map { s =>
        s -> got.zipWithIndex.map { case (r, j) =>
          (j.toLong, r.getSeq[Double](1).slice(s * dsub, (s + 1) * dsub).toArray)
        }.toSeq
      }.toMap
    }

    /** argmin code for subspace `s` given its literal codebook: quantized
      * squared-L2 struct-sort (ascending (dist, code)), the linear-size
      * argmin tree [[centroidsByDistance]] uses. */
    def nearestCode(book: Seq[(Long, Array[Double])]): Column =
      array_sort(array(book.map { case (code, c) =>
        val cc = c.map(x => x * x).sum
        struct(round(col("__n2") - lit(2.0) * fastDot(col("__sv"), lit(c)) + lit(cc), 6)
          .as("d"), lit(code).as("k"))
      }: _*)).getItem(0).getField("k")
    def codeFor(books: Map[Int, Seq[(Long, Array[Double])]]): Column =
      (0 until m).foldLeft(when(lit(false), lit(0L))) { case (c, s) =>
        c.when(col("__s") === s, nearestCode(books(s)))
      }.otherwise(lit(-1L))

    val trained = (0 until iterations).foldLeft(init) { case (books, _) =>
      val means = subs.withColumn("__code", codeFor(books))
        .groupBy(col("__s"), col("__code"))
        .agg(array((0 until dsub).map(i => avg(element_at(col("__sv"), i + 1))): _*).as("__mu"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      books.map { case (s, book) =>
        s -> book.map { case (code, old) => (code, means.getOrElse((s, code), old)) }
      }
    }

    val sizes = subs.withColumn("__code", codeFor(trained))
      .groupBy(col("__s"), col("__code")).agg(count(lit(1)).as("size"))
    trained.toSeq.flatMap { case (s, book) =>
      book.map { case (code, c) => (s, code, c.toSeq) }
    }.toDF("subspace", "code", "centroid")
      .join(sizes.withColumnRenamed("__s", "subspace").withColumnRenamed("__code", "code"),
        Seq("subspace", "code"), "left")
      .select(col("subspace"), col("code"), col("centroid"),
        coalesce(col("size"), lit(0L)).as("size"))
  }

  /** Codebooks collected driver-side BY DESIGN — m·ksub rows, the same
    * small-by-contract collect as [[collectCentroids]]. */
  private def collectCodebooks(
      codebooks: DataFrame, m: Int, dsub: Int): Map[Int, Seq[(Long, Array[Double])]] = {
    val books = codebooks
      .select(col("subspace").cast("int"), col("code").cast("long"), asDouble(col("centroid")))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1)
      .map { case (s, rows) => s -> rows.map(t => (t._2, t._3)).sortBy(_._1).toSeq }
    require(books.keySet == (0 until m).toSet,
      s"codebooks must cover subspaces 0..${m - 1}, got ${books.keySet.toSeq.sorted}")
    books.foreach { case (s, book) =>
      book.foreach { case (_, c) =>
        require(c.length == dsub, s"subspace $s centroid has ${c.length} dims, expected $dsub") }
    }
    books
  }

  /** PQ encoding: each vector becomes `m` codes (`array<int>`), code `s` =
    * the subspace-`s` codebook entry nearest in quantized squared-L2 (the
    * exact [[pqTrain]] assignment rule, so encode∘train is consistent).
    * A pure per-row projection against literal centroids — zero shuffle,
    * stream-safe, the compressed representation a 100 TB ANN index
    * actually stores. */
  def pqEncode(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      codebooks: DataFrame,
      m: Int,
      dim: Int
  ): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val books = collectCodebooks(codebooks, m, dsub)
    // STAGED projections (the §8.2b derived-array rule): the cast and the
    // subvector slices materialize once per row as multi-referenced
    // columns — inlining them into every (subspace × code) distance term
    // was measured to push generated methods past the 64 KB codegen limit
    // at m=8/ksub=16 and blow the interpreted fallback's heap.
    val staged = vectors
      .select(col(vectorId), asDouble(col(vectorCol)).as("__v"))
      .select(col(vectorId) +:
        (0 until m).map(s => slice(col("__v"), s * dsub + 1, dsub).as(s"__sv$s")): _*)
      .select(col(vectorId) +: (0 until m).map(s => col(s"__sv$s")) :+
        array((0 until m).map(s => fastDot(col(s"__sv$s"), col(s"__sv$s"))): _*).as("__n2"): _*)
    val codes = (0 until m).map { s =>
      val sv = col(s"__sv$s")
      val n2 = element_at(col("__n2"), s + 1)
      array_sort(array(books(s).map { case (code, c) =>
        val cc = c.map(x => x * x).sum
        struct(round(n2 - lit(2.0) * fastDot(sv, lit(c)) + lit(cc), 6).as("d"),
          lit(code.toInt).as("k"))
      }: _*)).getItem(0).getField("k")
    }
    staged.select(col(vectorId), array(codes: _*).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k retrieval over PQ codes: each probe
    * precomputes a lookup table `lut[s][j] = probe_sub_s · centroid_{s,j}`
    * (m·ksub literal-dot expressions on the BROADCAST probe side), and a
    * corpus row scores as `Σ_s lut[s][codes_s]` — m array lookups per row,
    * never touching the original vectors. This is why PQ is the
    * memory-bound scale path: the scan reads m bytes per vector instead
    * of 4·dim, with the full-precision probe keeping asymmetric accuracy.
    * Scores approximate the probe·vector dot product (quantization error
    * bounded by the codebook residuals; for cosine semantics normalize
    * vectors before [[pqEncode]] and probes before calling).
    *
    * Selection runs on `round(score, scoreScale)` with lowest-id
    * tie-break — the [[bruteForceTopK]] scoreScale contract (ADC sums m
    * floats per row, so raw boundaries are summation-order noise).
    */
  def pqTopK(
      encoded: DataFrame,
      encodedId: String,
      codesCol: String,
      codebooks: DataFrame,
      probes: DataFrame,
      probeId: String,
      probeCol: String,
      k: Int,
      m: Int,
      dim: Int,
      scoreScale: Int = 4
  ): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val dsub = dim / m
    val books = collectCodebooks(codebooks, m, dsub)
    val pv = asDouble(col(probeCol))
    val lut = array((0 until m).map { s =>
      val psv = slice(pv, s * dsub + 1, dsub)
      array(books(s).map { case (_, c) => fastDot(psv, lit(c)) }: _*)
    }: _*)
    val p = probes.select(col(probeId).as("probe_id"), lut.as("__lut"))
    val score = (0 until m).map(s =>
      element_at(element_at(col("__lut"), s + 1),
        element_at(col(codesCol), s + 1) + lit(1))).reduce(_ + _)
    val scored = encoded.select(col(encodedId).as("nbr_id"), col(codesCol))
      .crossJoin(broadcast(p))
      .filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("__sim", round(score, scoreScale))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("__sim").desc, col("nbr_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("nbr_id"), col("__sim").as("adc_score"))
  }

  /** Residual frame for IVF-PQ codebook training: every vector's nearest
    * cell (the [[ivfTopK]] assignment rule) and `x − c_cell` — feed this
    * to [[pqTrain]] (on the `residual` column) so codebooks quantize the
    * residual distribution [[ivfPqEncode]] actually encodes. Pure
    * projection against literal centroids. */
  def ivfResiduals(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      centroids: DataFrame,
      centroidId: String,
      centroidCol: String
  ): DataFrame = {
    val cents = collectCentroids(centroids, centroidId, centroidCol)
    val v = asDouble(col(vectorCol))
    val vn = sqrt(fastDot(v, v))
    val cell = centroidsByDistance(cents, v, vn).getItem(0).getField("c")
    val resid = cents.tail.foldLeft(
      when(col("cell") === cents.head._1, zip_with(col("__v"), lit(cents.head._2), _ - _))) {
      case (acc, (cid, arr, _)) =>
        acc.when(col("cell") === cid, zip_with(col("__v"), lit(arr), _ - _))
    }
    vectors.select(col(vectorId), v.as("__v"), cell.as("cell"))
      .select(col(vectorId), col("cell"), resid.as("residual"))
  }

  /** IVF cell assignment + PQ-encoded RESIDUALS — the FAISS `IVFx,PQy`
    * production index shape: each vector stores its nearest-centroid cell
    * plus the PQ codes of `x − c_cell` (residuals are smaller than raw
    * vectors, so the same codebook budget quantizes them finer). Output
    * `(vectorId, cell, codes)`; train `codebooks` on THIS function's
    * residual output (`pqTrain` over a prior pass) or accept the
    * coarse-only loss of raw-vector codebooks. Cell assignment is the
    * exact [[ivfTopK]] rule (cosine argmax, lowest-cid ties); everything
    * is a pure projection against literal centroids/codebooks — zero
    * shuffle, stream-safe.
    */
  def ivfPqEncode(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      centroids: DataFrame,
      centroidId: String,
      centroidCol: String,
      codebooks: DataFrame,
      m: Int,
      dim: Int
  ): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val cents = collectCentroids(centroids, centroidId, centroidCol)
    val books = collectCodebooks(codebooks, m, dsub)
    val v = asDouble(col(vectorCol))
    val vn = sqrt(fastDot(v, v))
    val cell = centroidsByDistance(cents, v, vn).getItem(0).getField("c")
    // STAGED (the §8.2b derived-array rule, same as pqEncode): the full
    // residual materializes ONCE per row (one chained-when over the
    // small-by-contract centroid list), then per-subspace slices and
    // their norms — inlining the residual chain into every
    // (subspace × code) term was the measured 64 KB-codegen/OOM path.
    val resid = cents.tail.foldLeft(
      when(col("cell") === cents.head._1, zip_with(col("__v"), lit(cents.head._2), _ - _))) {
      case (acc, (cid, arr, _)) =>
        acc.when(col("cell") === cid, zip_with(col("__v"), lit(arr), _ - _))
    }
    val staged = vectors
      .select(col(vectorId), v.as("__v"), cell.as("cell"))
      .select(col(vectorId), col("cell"), resid.as("__r"))
      .select(col(vectorId) +: col("cell") +:
        (0 until m).map(s => slice(col("__r"), s * dsub + 1, dsub).as(s"__rs$s")): _*)
      .select(col(vectorId) +: col("cell") +: (0 until m).map(s => col(s"__rs$s")) :+
        array((0 until m).map(s => fastDot(col(s"__rs$s"), col(s"__rs$s"))): _*).as("__n2"): _*)
    val codes = (0 until m).map { s =>
      val rsv = col(s"__rs$s")
      val n2 = element_at(col("__n2"), s + 1)
      array_sort(array(books(s).map { case (code, c) =>
        val cc = c.map(x => x * x).sum
        struct(round(n2 - lit(2.0) * fastDot(rsv, lit(c)) + lit(cc), 6).as("d"),
          lit(code.toInt).as("k"))
      }: _*)).getItem(0).getField("k")
    }
    staged.select(col(vectorId), col("cell"), array(codes: _*).as("codes"))
  }

  /** ADC retrieval over an [[ivfPqEncode]] index: probes fan out to their
    * `nprobe` nearest cells; a candidate row in cell `c` with codes
    * `(k_1..k_m)` scores as
    * `probe·c  +  Σ_s probe_sub_s · codebook_s[k_s]`
    * — the residual decomposition means the per-cell correction is ONE
    * scalar (computed on the broadcast probe side) and the code lookups
    * are cell-independent, so the scan still reads m bytes per row. Same
    * quantized-selection contract as [[pqTopK]].
    */
  def ivfPqTopK(
      encoded: DataFrame,
      encodedId: String,
      centroids: DataFrame,
      centroidId: String,
      centroidCol: String,
      codebooks: DataFrame,
      probes: DataFrame,
      probeId: String,
      probeCol: String,
      k: Int,
      m: Int,
      dim: Int,
      nprobe: Int,
      scoreScale: Int = 4
  ): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && nprobe > 0, "k and nprobe must be positive")
    import org.apache.spark.sql.expressions.Window
    val dsub = dim / m
    val cents = collectCentroids(centroids, centroidId, centroidCol)
    val books = collectCodebooks(codebooks, m, dsub)
    val pv = asDouble(col(probeCol))
    val pn = sqrt(fastDot(pv, pv))
    // (rank-sim, cell, probe·centroid) per cell, ranked by the ivfTopK rule
    val cellStructs = array_sort(array(cents.map { case (cid, arr, cn) =>
      struct((-(fastDot(pv, lit(arr)) / (pn * lit(cn)))).as("ns"),
        lit(cid).as("c"), fastDot(pv, lit(arr)).as("d"))
    }: _*))
    val lut = array((0 until m).map { s =>
      val psv = slice(pv, s * dsub + 1, dsub)
      array(books(s).map { case (_, c) => fastDot(psv, lit(c)) }: _*)
    }: _*)
    val p = probes.select(col(probeId).as("probe_id"), lut.as("__lut"),
        explode(slice(cellStructs, 1, nprobe)).as("__cellinfo"))
      .select(col("probe_id"), col("__lut"),
        col("__cellinfo").getField("c").as("cell"),
        col("__cellinfo").getField("d").as("__celldot"))
    val adc = (0 until m).map(s =>
      element_at(element_at(col("__lut"), s + 1),
        element_at(col("codes"), s + 1) + lit(1))).reduce(_ + _)
    val scored = encoded.select(col(encodedId).as("nbr_id"), col("cell"), col("codes"))
      .join(broadcast(p), Seq("cell"))
      .filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("__sim", round(col("__celldot") + adc, scoreScale))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("__sim").desc, col("nbr_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("nbr_id"), col("__sim").as("adc_score"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    * embeddings and keeping ONE representative of every within-cluster
    * near-duplicate group. Each vector is assigned to its nearest centroid
    * by cosine (argmax ties to the lowest centroid id, same deterministic
    * rule as [[ivfTopK]]); within a cluster, a vector is dropped iff some
    * LOWER-id cluster-mate sits at cosine >= `threshold` (keep-first, the
    * oracle-friendly form of "keep one per dup group"). Returns every
    * input id with its `cluster` and a `kept` flag.
    *
    * Scale shape: assignment is a pure projection against literal centroid
    * expressions (centroids are small-by-contract, like IVF's quantizer);
    * the pair scan is all-pairs WITHIN a cluster only — one shuffle on
    * cluster id, SMJ-pinned self-join (both sides the full corpus — the
    * derived-broadcast trap class). Per-cluster cost is quadratic in
    * cluster size BY CONTRACT (that is the SemDeDup algorithm); the
    * centroid count is the knob that bounds it — size nlist so n/nlist
    * rows fit a task, exactly like IVF cell sizing. For corpora where even
    * n/nlist is too hot, pre-bucket clusters with
    * [[cosineNearDupPairsLsh]] instead.
    */
  def semDedup(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      centroids: DataFrame,
      centroidId: String,
      centroidCol: String,
      threshold: Double
  ): DataFrame = {
    val cents = collectCentroids(centroids, centroidId, centroidCol)
    // k ∝ n guidance guard (r17): the within-cell pair join below is the
    // quadratic term of the SemDeDup pipeline — a cell count that didn't
    // grow with the corpus (the q96 gate shape, measured tail 1.84) blows
    // expected occupancy, and occupancy² is what the join emits. One
    // bounded count audits the model against the measured target before
    // the expensive stage runs.
    val nVecs = vectors.count()
    if (cents.nonEmpty && nVecs / cents.length > 2L * SizedCellTarget)
      System.err.println(
        s"[graft][sizing] semDedup: $nVecs vectors over k=${cents.length} cells = " +
          s"${nVecs / cents.length} per cell (over 2x the $SizedCellTarget-row target); " +
          s"within-cell pair volume scales with occupancy^2 - retrain with " +
          s"trainKMeans(k = AutoK) / sizedKMeansK(n)")
    val v = Dedup.withComputeParallelism(
        vectors.select(col(vectorId), asDouble(col(vectorCol)).as("__v")))
      .withColumn("__n", norm(col("__v")))
      .withColumn("cluster",
        centroidsByDistance(cents, col("__v"), col("__n")).getItem(0).getField("c"))
    val a = v.select(col("cluster"), col(vectorId).as("__ida"), col("__v").as("__va"), col("__n").as("__na"))
    val b = v.select(col("cluster"), col(vectorId).as("__idb"), col("__v").as("__vb"), col("__n").as("__nb"))
    val dropped = a.join(b.hint("shuffle_merge"), Seq("cluster"))
      .filter(col("__ida") < col("__idb"))
      .filter(round(fastDot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6) >= threshold)
      .select(col("__idb").as(vectorId))
      .distinct()
      .withColumn("__dropped", lit(true))
    v.select(col(vectorId), col("cluster"))
      .join(dropped.hint("shuffle_merge"), Seq(vectorId), "left")
      .select(col(vectorId), col("cluster"), col("__dropped").isNull.as("kept"))
  }

  /** Simplified silhouette (Hruschka et al. 2004) of a trained centroid
    * model under COSINE dissimilarity `d = 1 − cos(x, c)`: per point,
    * `a` = dissimilarity to its assigned (nearest) centroid, `b` = to the
    * runner-up, `s = (b − a)/max(a, b)` — the clustering-quality read
    * (s → 1 tight/separated, s → 0 boundary, s < 0 misassigned) at O(n·k)
    * instead of the exact silhouette's O(n²) pair matrix — the only form
    * that exists at corpus scale.
    *
    * Determinism: centroids are collected (k model rows) and quantized to
    * the 1e-4 grid FIRST — the training means are float averages that
    * agree across engines only at that grid (the q93 contract), so
    * scoring against the quantized model card is what makes per-point s
    * reproducible; assignment ties break to the lowest cid (the q93
    * rule). Per-point s is 1e-6-quantized and decimal-summed per cluster.
    * Zero-norm vectors are dropped (cosine undefined — the trainKMeans
    * filter). Output: (cid, n, mean_sil) per assigned cluster.
    */
  def simplifiedSilhouette(
      vectors: DataFrame,
      vectorId: String,
      vectorCol: String,
      centroids: DataFrame,
      centroidId: String,
      centroidCol: String,
      modelDigits: Int = 4
  ): DataFrame = {
    require(modelDigits >= 1 && modelDigits <= 9, s"modelDigits out of [1, 9]")
    val cents = collectCentroids(centroids, centroidId, centroidCol).map {
      case (cid, arr, _) =>
        val qa = arr.map(graft.functions.Quantize.scaledFloorDouble(_, modelDigits))
        (cid, qa, math.sqrt(qa.map(x => x * x).sum))
    }
    require(cents.size >= 2, "silhouette needs at least 2 centroids")
    // a centroid whose every component quantizes to 0 would make its
    // cosine NaN for ALL points — and NaN sorts LAST in Spark's struct
    // sort but FIRST under a DESC-similarity oracle, the cross-engine
    // divergence class. Fail loudly; the model is degenerate anyway.
    require(cents.forall(_._3 > 0.0),
      s"centroid(s) ${cents.filter(_._3 == 0.0).map(_._1).mkString(", ")} " +
        s"quantize to the zero vector at $modelDigits digits — cosine undefined")
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val ranked = Dedup.withComputeParallelism(
        vectors.select(col(vectorId).cast("long").as("__id"),
          asDouble(col(vectorCol)).as("__v")))
      .withColumn("__n", norm(col("__v")))
      .filter(col("__n") > lit(0.0))
      .withColumn("__r", centroidsByDistance(cents, col("__v"), col("__n")))
      .select(col("__id"),
        col("__r").getItem(0).getField("c").as("cid"),
        (lit(1.0) + col("__r").getItem(0).getField("ns")).as("__a"),
        (lit(1.0) + col("__r").getItem(1).getField("ns")).as("__b"))
    val sil = ranked.select(col("cid"),
      q6(when(greatest(col("__a"), col("__b")) > 0.0,
        (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
        .otherwise(lit(0.0))).cast("decimal(18,6)").as("__s"))
    sil.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"),
        sum(col("__s")).cast("decimal(38,6)").as("__ss"))
      .select(col("cid"), col("n"),
        q6(col("__ss").cast("double") / col("n").cast("double")).as("mean_sil"))
  }
}
