package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality and frequency sketches — KMV (k-minimum-values)
  * distinct counting and set-overlap estimation, HyperLogLog distinct
  * counting, and Count-Min frequency estimation.
  *
  * Why sketches at 100 TB: `COUNT(DISTINCT x)` shuffles every distinct
  * value to its reducer — on a web-scale corpus the distinct URL / token /
  * shingle set IS corpus-shaped, so the exact answer costs a full shuffle
  * of the thing being counted. Every sketch here is a BOUNDED aggregate:
  * per-partition partials, shuffle payloads and merged states are all O(k)
  * or O(m) regardless of input cardinality, and the merge is associative +
  * commutative, so partial sketches combine map-side and across shards /
  * days / generations without re-touching data. KMV additionally supports
  * SET ALGEBRA on the sketches themselves: two corpora's sketches alone
  * estimate their Jaccard overlap and intersection size — estimating
  * crawl-vs-crawl or corpus-vs-benchmark overlap WITHOUT the join.
  *
  * Engine-portable determinism (the repo-wide rule, see
  * [[Sampling.keyHash]]): every element hashes through the salted 60-bit
  * md5 prefix, all register/bucket arithmetic is INTEGER (the HLL
  * harmonic-mean denominator is summed as scaled integers, not floats, so
  * no summation-order ulp), and the only floating-point steps are final
  * single-division estimates — bit-identical in any engine that computes
  * the same formula once. An oracle SQL can therefore reproduce every
  * sketch REGISTER, not just approximate the estimate.
  *
  * (The reference has no sketch operators — this extends the
  * training-data-pipeline surface, SURVEY.md §2.2.)
  */
object Sketches {

  /** 2^60 as a double: the hash space size of [[Sampling.keyHash]]. */
  private val HashSpace = (1L << 60).toDouble

  // ---------------------------------------------------------------- KMV

  /** KMV sketch per group: the k smallest DISTINCT element hashes,
    * ascending. ONE keyed aggregation with O(k) state at every stage
    * ([[graft.functions.MinKDistinctLongs]]) — no pre-distinct shuffle,
    * no global sort. Sketches of disjoint shards merge losslessly
    * (min-k of unions = merge of min-ks), which is the property that lets
    * daily shards keep per-source sketches and a roll-up aggregate them
    * without rescanning text.
    */
  def kmvSketch(
      df: DataFrame,
      groupCols: Seq[String],
      elemCol: Column,
      k: Int,
      salt: String
  ): DataFrame = {
    require(k > 1, "k must be > 1 (the estimator divides by the k-th smallest)")
    val minK = udaf(new graft.functions.MinKDistinctLongs(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(minK(Sampling.keyHash(elemCol, salt)).as("kmv"))
  }

  /** Distinct-count estimate from a KMV sketch column (ascending array of
    * ≤ k distinct 60-bit hashes): exact when the sketch never filled
    * (fewer than k distinct elements — the sketch IS the distinct hash
    * set), else the classic (k-1) · 2^60 / h_k estimator (Bar-Yossef et
    * al.; relative error ~ 1/sqrt(k)). */
  def kmvDistinct(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / element_at(sketch, k).cast("double"))

  /** Set-overlap estimation from two KMV sketches built with the SAME k
    * and salt: the k smallest distinct hashes of the union are recovered
    * from the two sketches alone (merge + dedup + take k), the Jaccard
    * estimate is the fraction of that union sketch present in BOTH input
    * sketches, and the intersection estimate is Jaccard × the union
    * sketch's distinct estimate (Beyer et al., "On synopses for
    * distinct-value estimation under multiset operations"). Input: any
    * two-row-joinable frames holding one sketch each; output columns
    * `jaccard_est`, `union_est`, `inter_est`.
    *
    * All array ops are over ≤ k element literals-in-row — no shuffle at
    * all once the two sketches exist; estimating overlap of two 50 TB
    * crawls costs two bounded aggregations plus this O(k) row-local step.
    */
  def kmvOverlap(sketchA: Column, sketchB: Column, k: Int): Seq[Column] = {
    // merged union sketch: k smallest distinct of A ∪ B (both ascending)
    val merged = slice(array_sort(array_union(sketchA, sketchB)), 1, k)
    val inBoth = size(array_intersect(array_intersect(merged, sketchA), sketchB))
    val j = inBoth.cast("double") / size(merged).cast("double")
    Seq(
      j.as("jaccard_est"),
      kmvDistinct(merged, k).as("union_est"),
      (j * kmvDistinct(merged, k)).as("inter_est")
    )
  }

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog registers per group, `p` bucket bits (m = 2^p buckets):
    * bucket = top p bits of the 60-bit element hash, rank = leading-zero
    * count of the remaining (60-p) bits + 1, register = max rank seen.
    * Output: (group..., bucket int, reg int) — only OCCUPIED buckets (a
    * missing bucket is register 0; [[hllEstimate]] accounts for them).
    *
    * One keyed aggregation whose state is ≤ m small ints per group —
    * map-side combine applies (max is associative), shuffle payload is
    * O(m) per group. The rank is computed WITHOUT floating log2:
    * `length(bin(w))` is floor(log2 w)+1 for w ≥ 1 in every engine, so
    * registers are integer-exact and an oracle reproduces them verbatim.
    */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      elemCol: Column,
      p: Int,
      salt: String
  ): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val h = Sampling.keyHash(elemCol, salt)
    val wBits = 60 - p
    val bucket = shiftright(h, wBits).cast("int")
    val w = h.bitwiseAND(lit((1L << wBits) - 1L))
    val rank = when(w === 0L, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)).cast("int"))
    df.select((groupCols.map(col) :+ bucket.as("bucket") :+ rank.as("rank")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rank")).as("reg"))
  }

  /** The HLL bias-correction constant α_m (Flajolet et al. 2007). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** HLL distinct estimate per group from [[hllRegisters]] output.
    *
    * The harmonic-mean denominator Σ 2^(-M_j) is summed as INTEGERS
    * scaled by 2^(wBits+1): each term 2^(wBits+1-M_j) is an exact long
    * (max m · 2^(wBits+1) ≤ 2^61), so the sum is order-independent and
    * engine-exact; the estimate is then ONE double division —
    * α_m · m² · 2^(wBits+1) / Z. Missing buckets contribute the M_j = 0
    * term, added as (m - occupied) · 2^(wBits+1) without materializing
    * them. Small-range linear counting (E ≤ 2.5m with empty buckets →
    * m · ln(m / zeros)) is applied per the paper; its `ln` is the one
    * transcendental in the module — callers wanting register-exact
    * cross-engine comparison should size p so estimates sit above 2.5m
    * (the raw path), as the sketch queries do.
    *
    * Output: (group..., hll_est double, zero_regs int).
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val wBits = 60 - p
    val scale = (1L << (wBits + 1)).toDouble
    val alpha = hllAlpha(m)
    val zTerm = expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - reg)")
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(zTerm).as("__z_occ"), count(lit(1)).as("__occ"))
      .withColumn("__zeros", lit(m) - col("__occ"))
      .withColumn("__z", col("__z_occ") + col("__zeros") * lit(1L << (wBits + 1)))
      .withColumn("__raw", lit(alpha * m * m) * lit(scale) / col("__z").cast("double"))
      .withColumn("hll_est",
        when(col("__raw") <= lit(2.5 * m) && col("__zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros").cast("double")))
          .otherwise(col("__raw")))
      .select((groupCols.map(col) :+ col("hll_est") :+ col("__zeros").cast("int").as("zero_regs")): _*)
  }

  /** ROLLING distinct estimate from per-period HLL registers — rolling
    * MAU/DAU from sketches alone: each period's registers fan out to the
    * `windowPeriods` trailing windows they belong to (one bounded
    * explode), registers merge by max per (target, bucket) — the HLL
    * merge rule, so the window estimate is EXACTLY the estimate of the
    * union of the window's periods — and [[hllEstimate]] finalizes.
    * Raw data is never rescanned: at 100 TB the per-period register
    * tables are the only input (persist them as IndexStore generations
    * and the rolling series costs O(periods · m) forever). Targets
    * restrict to OBSERVED periods (a gap period emits no row — windows
    * ending inside a gap are not fabricated).
    */
  def hllRollingEstimate(
      registers: DataFrame,
      periodCol: String,
      p: Int,
      windowPeriods: Int
  ): DataFrame = {
    require(windowPeriods >= 1, s"windowPeriods must be >= 1, got $windowPeriods")
    val targets = registers.select(col(periodCol).as("__t")).distinct()
    val spread = registers.select(col(periodCol), col("bucket"), col("reg"),
      explode(sequence(col(periodCol),
        col(periodCol) + lit(windowPeriods - 1))).as("__t"))
    val merged = spread
      .join(targets.hint("shuffle_merge"), Seq("__t"), "left_semi")
      .groupBy(col("__t"), col("bucket")).agg(max(col("reg")).as("reg"))
      .withColumnRenamed("__t", periodCol)
    hllEstimate(merged, Seq(periodCol), p)
  }

  // ----------------------------------------------------------- Count-Min

  /** Count-Min sketch build: `depth` independent hash rows × `width`
    * buckets; counter(r, b) = Σ weight over elements with
    * hash_r(elem) mod width = b. Input is one row per element OCCURRENCE
    * (pass a pre-aggregated (elem, weight) frame and `weightCol` to avoid
    * the depth-fold over raw rows when counts are already keyed).
    *
    * The sketch is (depth × width) counters — a FIXED-size table
    * regardless of input cardinality, built by one explode(depth) + one
    * keyed sum with map-side combine. Sketches of shards merge by
    * counter-wise addition (a union-all + re-sum), never touching data.
    * Output: (r int, b int, cnt long).
    */
  def cmsSketch(
      df: DataFrame,
      elemCol: Column,
      depth: Int,
      width: Int,
      salt: String,
      weightCol: Column = lit(1L)
  ): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val rows = (0 until depth).map { r =>
      struct(lit(r).as("r"), pmod(Sampling.keyHash(elemCol, s"$salt$r"), lit(width.toLong)).cast("int").as("b"))
    }
    df.select(explode(array(rows: _*)).as("__rb"), weightCol.as("__w"))
      .groupBy(col("__rb.r").as("r"), col("__rb.b").as("b"))
      .agg(sum(col("__w")).as("cnt"))
  }

  // -------------------------------------------------------------- Bloom

  /** Bloom filter as a RELATIONAL sketch: (word int, bits long) rows, word
    * = bit-position DIV 32, bits = OR of 32-bit masks (shifts stay ≤ 31 —
    * a 63-bit shift overflows signed arithmetic in some engines, so the
    * bitmap is 32-bit words held in longs). `kHashes` salted positions per
    * element; build is one explode(k) + a `bit_or` keyed aggregation with
    * map-side combine, ≤ mBits/32 output rows regardless of input
    * cardinality. Shard filters merge by word-wise `bit_or` — the same
    * aggregation over a union — so per-day filters roll up without
    * re-scanning history.
    *
    * Why this beats the broadcast fingerprint SET at the top end: the set
    * probe ([[Dedup.stripKnownWindows]]'s class) holds every 8-byte hash —
    * 10 B fingerprints = 80 GB, unbroadcastable; a Bloom at 10 bits/key is
    * 12.5 GB… still big, but m is a KNOB: false-positive rate
    * (1 - e^(-kn/m))^k degrades gracefully as m shrinks, and membership
    * stays one-sided (no false NEGATIVES — a miss is definitely new).
    */
  def bloomSketch(
      df: DataFrame,
      elemCol: Column,
      mBits: Int,
      kHashes: Int,
      salt: String
  ): DataFrame = {
    require(mBits >= 32 && mBits % 32 == 0, s"mBits must be a positive multiple of 32, got $mBits")
    require(kHashes >= 1 && kHashes <= 8, s"kHashes must be in [1, 8], got $kHashes")
    val positions = (0 until kHashes).map { r =>
      pmod(Sampling.keyHash(elemCol, s"$salt$r"), lit(mBits.toLong)).cast("int")
    }
    df.select(explode(array(positions: _*)).as("__pos"))
      .select(expr("__pos DIV 32").cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), __pos % 32)").as("__mask"))
      .groupBy("word")
      .agg(expr("bit_or(__mask)").as("bits"))
  }

  /** Membership probe: for each probe row, true iff ALL `kHashes` bit
    * positions are set — `might_contain` (one-sided: false ⇒ definitely
    * absent; true ⇒ present OR a false positive at the documented rate).
    * The probe explodes its k positions, LEFT-joins the ≤ mBits/32-row
    * sketch on `word` (broadcast-sized by construction), and reduces with
    * a min-over-bits test — no corpus shuffle, stream-safe (a stream-static
    * join + keyed aggregation over the probe's own k rows).
    *
    * Passthrough columns: everything in `probes` except the element column
    * survives via the probe-side struct. */
  def bloomMightContain(
      sketch: DataFrame,
      probes: DataFrame,
      probeElemCol: String,
      mBits: Int,
      kHashes: Int,
      salt: String
  ): DataFrame = {
    val keyed = probes
      .select(struct(probes.columns.map(col): _*).as("__row"),
        explode(array((0 until kHashes).map { r =>
          pmod(Sampling.keyHash(col(probeElemCol), s"$salt$r"), lit(mBits.toLong)).cast("int")
        }: _*)).as("__pos"))
      .select(col("__row"), expr("__pos DIV 32").cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), __pos % 32)").as("__mask"))
    keyed
      .join(sketch, Seq("word"), "left")
      .select(col("__row"),
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("__mask")) === col("__mask"))
          .cast("int").as("__hit"))
      .groupBy(col("__row"))
      .agg((min(col("__hit")) === 1).as("might_contain"))
      .select(col("__row.*"), col("might_contain"))
  }

  /** Materialize a [[bloomSketch]] frame as the dense bitmap it encodes —
    * `mBits / 32` longs each holding one 32-bit word. SMALL-BY-CONTRACT
    * collect: the bitmap is the operator's whole memory story (mBits is a
    * sizing knob, NEVER corpus-shaped), and the loud guard keeps a
    * miscalibrated call from materializing gigabytes on the driver —
    * `maxBits`'s default (2^27 = 16 MB of words) already covers ~13M
    * history keys at 10 bits/key. */
  def collectBloom(sketch: DataFrame, mBits: Int, maxBits: Int = 1 << 27): Array[Long] = {
    require(mBits <= maxBits,
      s"mBits=$mBits exceeds maxBits=$maxBits (${maxBits / 8 / 1024 / 1024} MB of bitmap); " +
        "raise maxBits explicitly if the driver/executor heap budget allows")
    val words = new Array[Long](mBits / 32)
    sketch.select(col("word"), col("bits")).collect().foreach { r =>
      words(r.getInt(0)) = r.getLong(1)
    }
    words
  }

  /** Per-row membership probe against a [[collectBloom]] bitmap: a pure
    * projection — zero shuffle, zero state — so the SAME call rides a
    * readStream (the curation `bloomHistory` leg). Decision-identical to
    * the [[bloomMightContain]] join form (spec-pinned): the probe
    * recomputes the k salted 60-bit md5 positions ([[Sampling.keyHash]]'s
    * exact arithmetic) and tests the captured bitmap — a native
    * Catalyst expression ([[graft.functions.BloomProbeExpr]]), so the
    * probe stays inside the projection's WholeStageCodegen span and the
    * bitmap rides the plan's reference array instead of being re-shipped
    * as literals; the probe is O(k) array reads.
    *
    * The bitmap is FIXED at query start — unlike the stream-static
    * `historyIndex` anti-join, generations appended while a stream runs
    * are not picked up until restart. */
  def bloomProbe(
      elem: Column,
      bitmap: Array[Long],
      mBits: Int,
      kHashes: Int,
      salt: String
  ): Column = {
    require(bitmap.length == mBits / 32,
      s"bitmap has ${bitmap.length} words, expected ${mBits / 32} for mBits=$mBits")
    org.apache.spark.sql.GraftShims.column(
      graft.functions.BloomProbeExpr(
        org.apache.spark.sql.GraftShims.expression(elem.cast("string")),
        bitmap, mBits, kHashes, salt))
  }

  /** Point-query a Count-Min sketch for each probe element: estimate =
    * min over the depth rows of the counter at hash_r(elem) mod width
    * (0 when a counter row is absent — an element whose buckets were
    * never touched). Always ≥ the true count; equality when no collision
    * landed in all d buckets. The probe side is parameter-sized by
    * contract (a broadcast), the sketch is fixed-size — the lookup join
    * is broadcast-hash on (r, b), no corpus shuffle.
    */
  def cmsLookup(
      sketch: DataFrame,
      probes: DataFrame,
      probeElemCol: String,
      depth: Int,
      width: Int,
      salt: String
  ): DataFrame = {
    val keyed = probes.select(
      col(probeElemCol),
      explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"),
          pmod(Sampling.keyHash(col(probeElemCol), s"$salt$r"), lit(width.toLong)).cast("int").as("b"))
      }: _*)).as("__rb"))
      .select(col(probeElemCol), col("__rb.r").as("r"), col("__rb.b").as("b"))
    keyed
      .join(sketch, Seq("r", "b"), "left")
      .groupBy(col(probeElemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
