package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora.
  *
  * Everything here is pure DataFrame algebra — shuffles are keyed so the
  * plans survive 100 TB:
  *  - exact dedup: ONE hash shuffle on the dedup key (map-side partial agg);
  *  - MinHash-LSH near-dup: shuffle on (band, bandHash) — candidate pairs
  *    are generated per LSH bucket, NEVER via an all-pairs cross join; the
  *    exact-Jaccard verification then touches only the candidates;
  *  - SimHash near-dup: 64-bit signature, bucketed by 16-bit chunks
  *    (pigeonhole: hamming distance <= 3 implies at least one of the 4
  *    chunks is identical), verified with bit_count.
  *
  * (The reference has no dedup operators — this is part of the
  * training-data-pipeline surface the engine adds; see SURVEY.md §2.2.)
  */
object Dedup {

  /** Repartition compute-heavy per-row pipelines up to cluster parallelism
    * when the scan planned too few tasks: a single small parquet file plans
    * as ONE input partition, which serializes shingling/hashing on one core.
    * At real scale inputs already carry thousands of partitions and this is
    * a no-op (the guard never triggers), so the extra exchange exists only
    * in exactly the case where it is cheap.
    */
  private[operators] def withComputeParallelism(df: DataFrame): DataFrame = {
    // A plan that already contains an exchange outputs shuffle-partition-
    // count partitions (i.e. is already parallel) — and probing `.rdd` on
    // such a plan under AQE would EXECUTE the upstream stages just to read
    // a number. Only narrow scan-shaped plans are probed (where `.rdd` is
    // free) — exactly the case the guard exists for.
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    val hasExchange = df.queryExecution.sparkPlan.exists {
      case _: ShuffleExchangeLike | _: BroadcastExchangeLike => true
      case _                                                 => false
    }
    if (hasExchange) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target) else df
    }
  }

  /** Shared prelude for every shingle-based operator: the parallelism guard
    * plus token projection BEFORE the shingle lambda (see
    * [[shinglesOfTokens]] for why the projection is load-bearing). Output:
    * (`idCol`, `__shingles`).
    */
  private def projectedShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    withComputeParallelism(df.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), shinglesOfTokens(col("__toks"), n).as("__shingles"))

  /** Exact duplicate grouping: one row per distinct `keyCol` value with the
    * lowest `idCol` as the keeper and the group size. Scalable shape: a
    * single hash shuffle on the key with partial aggregation — NOT a window
    * over the key (a window serializes hot keys; min/count aggregate
    * pre-combines map-side).
    */
  def exactGroups(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Exact dedup: keep exactly the keeper row per duplicate group. The
    * keeper-id set is CORPUS-SHAPED (≈ the distinct-key count) and sits
    * under an aggregate whose static size estimate is garbage, so the
    * semi-join is SMJ-pinned — the §8.1 derived-broadcast class. */
  def exactKeepFirst(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.join(
      exactGroups(df, keyCol, idCol).select(col("keep_id").as(idCol)).hint("shuffle_merge"),
      Seq(idCol),
      "left_semi")

  /** CORPUS-WIDE LINE-LEVEL dedup — the C4/CCNet boilerplate-removal pass:
    * a repeated line ("subscribe to our newsletter…", nav bars, license
    * headers) is kept only at its FIRST occurrence (minimum `(idCol, line
    * position)` lexicographically) and removed from every other document.
    * Lines shorter than `minTokens` whitespace tokens are exempt (separators
    * and stubs stay put); documents keep their surviving lines in order.
    * Output: `(idCol, textCol)` with the deduplicated text.
    *
    * Shape at 100 TB: explode to lines, then ONE hash shuffle on the line
    * with a `min` AGGREGATE (map-side partial combine — a boilerplate line
    * occurring in millions of documents collapses to one row per map
    * partition; a window over the line key would serialize exactly those
    * hot keys), an SMJ join back (both sides corpus-sized and derived —
    * broadcast is pinned off for the usual garbage-static-estimate reason),
    * and one shuffle on `idCol` to reassemble documents. No state, no
    * iteration.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      delim: String = "\n",
      minTokens: Int = 3
  ): DataFrame = {
    require(minTokens >= 1, "minTokens must be at least 1")
    // split on the literal delimiter (quoted — split's pattern arg is a
    // regex and "\n" happens to be benign but "." or "|" would not be)
    val lines = withComputeParallelism(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
          .as(Seq("__pos", "__line")))
    val eligible = size(split(col("__line"), " ")) >= minTokens
    val firsts = lines
      .filter(eligible)
      .groupBy(col("__line"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__first"))
    lines
      .join(firsts.hint("shuffle_merge"), Seq("__line"), "left")
      .filter(!eligible || struct(col(idCol), col("__pos")) === col("__first"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")),
        delim).as(textCol))
  }

  /** WITHIN-document line dedup — C4's intra-document step, the row-local
    * sibling of the corpus-wide [[dedupLines]]: a line repeated INSIDE one
    * document survives only at its first occurrence; repetition across
    * documents is untouched (that is [[dedupLines]]'s job). Lines shorter
    * than `minTokens` are exempt (blank separator lines repeat by design).
    * A PURE per-row projection — zero shuffles, zero state, rides a
    * readStream unchanged. The first-occurrence test is an explicit
    * `array_position` probe (O(lines²) row-local, bounded by document
    * size) rather than `array_distinct`, so the eligibility exemption
    * composes and the semantics are engine-portable (DuckDB's
    * list_distinct does NOT preserve order; list_position does).
    */
  def dedupLinesWithinDoc(
      df: DataFrame,
      idCol: String,
      textCol: String,
      delim: String = "\n",
      minTokens: Int = 3
  ): DataFrame = {
    require(minTokens >= 1, "minTokens must be at least 1")
    val kept = filter(col("__lines"), (l, i) =>
      size(split(l, " ")) < minTokens || array_position(col("__lines"), l) === i + 1)
    df.withColumn("__lines", split(col(textCol), java.util.regex.Pattern.quote(delim)))
      .select(withTextReplaced(df, textCol, array_join(kept, delim)): _*)
  }

  /** Input-schema-order projection: every input column as-is, with
    * `textCol` replaced IN PLACE — the strip/dedup family must not reorder
    * the output schema relative to the input (positional consumers and
    * plain `union()` downstream would silently misalign). */
  private def withTextReplaced(df: DataFrame, textCol: String, replacement: Column): Seq[Column] =
    df.columns.toSeq.map(c => if (c == textCol) replacement.as(textCol) else col(c))

  /** Persistable EXACT-dedup fingerprint index: the distinct md5
    * fingerprints of `keyCol` — 16 bytes per distinct document, the
    * at-rest form of the fingerprint state [[graft.examples.StreamingCuration]]
    * keeps in memory. Build it from the already-curated corpus, persist,
    * and every later batch (or stream) dedups against history via
    * [[dropKnownFingerprints]] without touching the old texts.
    */
  def buildFingerprintIndex(df: DataFrame, keyCol: String): DataFrame =
    df.select(md5(col(keyCol)).as("fp")).distinct()

  /** Drop rows whose `keyCol` fingerprint is already in `index` — the
    * incremental EXACT-dedup gate (today's landing zone vs yesterday's
    * curated corpus). A plain left-anti equi-join on the fingerprint:
    * batch-wise it shuffles both sides on `fp` (SMJ-pinned — the index is
    * corpus-sized, one fingerprint per distinct historical document, so
    * broadcasting it is exactly the derived-size mistake this library
    * pins against); on a STREAMING `newDocs` frame the same call is a
    * stream-static anti join, Spark's supported shape for
    * dedup-against-history at ingest (the static side is re-read per
    * micro-batch, so a newly persisted index generation is picked up
    * without restarting the query). */
  def dropKnownFingerprints(newDocs: DataFrame, keyCol: String, index: DataFrame): DataFrame =
    newDocs.join(
      index.select(col("fp")).hint("shuffle_merge"),
      md5(col(keyCol)) === col("fp"),
      "left_anti")

  /** Strip a KNOWN boilerplate-line list from every document — the
    * streaming-safe sibling of [[dedupLines]]. The corpus-wide form needs a
    * line-level aggregate (stateful, so it cannot ride an append stream);
    * this form takes the line list as data — mined upstream by a batch
    * [[dedupLines]] / [[graft.operators.TextAnalysis.topNgrams]] pass over
    * an earlier snapshot, the way C4-style pipelines ship a boilerplate
    * list — and applies it as a PURE per-row expression: split, drop
    * listed lines, rejoin. Zero state, zero shuffles, so it applies
    * unchanged to a readStream frame.
    *
    * The list rides the plan as a literal and each line probes it linearly,
    * so membership cost is `|lines|` per document line — the right trade
    * for a curated boilerplate list (hundreds of entries); `maxLines` fails
    * loudly before an unbounded list turns every row into a scan.
    */
  def stripKnownLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lines: Seq[String],
      delim: String = "\n",
      maxLines: Int = 10000
  ): DataFrame = {
    // the maxLines loud-failure guard lives in stripKnownLinesExpr, which
    // every non-trivial path goes through
    if (lines.isEmpty) df.select(col(idCol), col(textCol))
    else df.select(col(idCol),
      stripKnownLinesExpr(col(textCol), lines, delim, maxLines).as(textCol))
  }

  /** The [[stripKnownLines]] transform as a bare column expression, for
    * callers composing it into a wider projection (e.g. a stream with an
    * event-time column riding alongside). Carries the same `maxLines`
    * loud-failure guard — every entry point must refuse an unbounded list,
    * since the literal probe is O(|lines|) per document line. */
  def stripKnownLinesExpr(
      text: Column,
      lines: Seq[String],
      delim: String = "\n",
      maxLines: Int = 10000
  ): Column = {
    require(lines.size <= maxLines,
      s"stripKnownLines: ${lines.size} lines exceeds maxLines=$maxLines — a list this " +
        "large should be a broadcast-join dedupLines pass, not a per-row literal probe")
    val listed = typedLit(lines.distinct)
    array_join(
      filter(split(text, java.util.regex.Pattern.quote(delim)),
        l => !array_contains(listed, l)),
      delim)
  }

  /** Distinct word n-gram shingles from a PRE-PROJECTED token-array column;
    * documents shorter than `n` tokens fall back to the whole (reconstructed)
    * text as a single shingle.
    *
    * `toks` must be a bound column (project `split(text, " ")` first), not
    * the split expression itself: higher-order-function lambdas evaluate
    * interpreted and outside subexpression elimination, so an expression
    * referenced inside the lambda re-evaluates once PER ELEMENT — measured
    * 10x+ on this exact operator (re-tokenizing every document ~144 times).
    */
  def shinglesOfTokens(toks: Column, n: Int = 3): Column = {
    val starts = sequence(lit(0), size(toks) - n)
    val sh = transform(starts, i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    when(size(toks) >= n, array_distinct(sh))
      // concat_ws over the tokens reconstructs the text exactly (split on a
      // single-space delimiter keeps empty tokens, so the join inverts it).
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Expression-API convenience over [[shinglesOfTokens]]. Only safe where
    * the surrounding plan evaluates it once per row (a plain projection);
    * operators in this file always go through the projected-tokens form.
    */
  def shingles(textCol: Column, n: Int = 3): Column =
    shinglesOfTokens(split(textCol, " "), n)

  /** MinHash signature columns `h0..h{numHashes-1}`: per document, the min
    * of each seeded hash over the shingle set. One explode + one keyed
    * shuffle with map-side partial min.
    *
    * The shingle STRING is hashed exactly once; the per-seed family derives
    * from re-hashing that 8-byte value (`xxhash64(h, seed)`), which costs
    * ~1/50th of hashing the string per seed — at 100 TB the string-hash pass
    * dominates MinHash cost, so this is the difference between 1 and
    * `numHashes` scans of the text bytes.
    */
  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      shinglesCol: Column,
      numHashes: Int = 128
  ): DataFrame = {
    val ex = df
      .select(col(idCol), explode(shinglesCol).as("__shingle"))
      .withColumn("__h", xxhash64(col("__shingle")))
    val aggs = (0 until numHashes).map(s => min(xxhash64(col("__h"), lit(s))).as(s"h$s"))
    ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-ROW MinHash signature columns `h0..h{numHashes-1}` — the
    * shuffle-free form of [[minHashSignatures]], for pipelines that cannot
    * aggregate (append-mode streams) or that want the signature beside the
    * row. Values are bit-identical to the aggregate form: same
    * hash-the-string-once-then-derive-seeds scheme (`xxhash64(shingle)` →
    * `xxhash64(h, seed)`), with the shingle-hash array BOUND to a real
    * column first so the per-seed lambdas iterate it instead of re-hashing
    * the text `numHashes` times (the [[shinglesOfTokens]] HOF caveat).
    * Input shingle arrays must be non-empty (the [[shinglesOfTokens]]
    * short-doc fallback guarantees this); an empty array yields null sigs.
    */
  def withMinHashColumns(df: DataFrame, shinglesCol: Column, numHashes: Int = 128): DataFrame = {
    val bound = df.withColumn("__mh_hs", transform(shinglesCol, sh => xxhash64(sh)))
    val sigs = (0 until numHashes).map(s =>
      array_min(transform(col("__mh_hs"), h => xxhash64(h, lit(s)))).as(s"h$s"))
    bound.select(bound.columns.map(col) ++ sigs: _*).drop("__mh_hs")
  }

  /** The per-band bucket hashes of a `h0..` signature row — the SAME
    * multi-argument xxhash64 construction [[lshCandidatePairs]] buckets on,
    * exposed so streaming ingest buckets identically to the batch op. */
  def bandHashColumns(bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i")): _*)
    }

  /** LSH candidate pairs from a signature frame: band the signature
    * (`bands` x `rowsPerBand` = numHashes), hash each band, group ids per
    * (band index, band hash) bucket and expand pairs bucket-locally.
    * Output: (`id_a`, `id_b`) with id_a < id_b, distinct.
    *
    * Grouping + in-bucket expansion instead of a self-join matters twice at
    * scale: the signature aggregation upstream is computed ONCE (a
    * self-join's differently-projected sides defeat exchange reuse, doubling
    * the most expensive stage), and pair generation is bucket-local after a
    * single shuffle on the band hash. Bucket width — and therefore the
    * per-row expansion — is bounded by the near-dup cluster size plus hash
    * collisions, the same bound any LSH bucket join has.
    */
  def lshCandidatePairs(
      signatures: DataFrame,
      idCol: String,
      bands: Int,
      rowsPerBand: Int
  ): DataFrame = {
    signatures
      .select(col(idCol), posexplode(array(bandHashColumns(bands, rowsPerBand): _*)).as(Seq("__band", "__bh")))
      .groupBy(col("__band"), col("__bh"))
      .agg(collect_list(col(idCol)).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs: MinHash-LSH candidates verified by EXACT Jaccard
    * over the shingle sets, emitted as integer intersection/union sizes with
    * the threshold applied as a rational comparison
    * (`tauDen * |A∩B| >= tauNum * |A∪B|`) — no float in the result, so the
    * output is engine-exact and oracle-checkable.
    *
    * Defaults: 128 hashes as 32 bands x 4 rows, tau = 1/2. For J >= 0.9 true
    * pairs the miss probability is (1 - 0.9^4)^32 ≈ 1.5e-15 — the LSH
    * output equals the exact all-pairs answer in any realistic run, at
    * bucket-join cost instead of O(n²).
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      tauNum: Int = 1,
      tauDen: Int = 2
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val withShingles = projectedShingles(df, idCol, textCol, shingleN)
    val sigs = minHashSignatures(withShingles, idCol, col("__shingles"), numHashes)
    val cands = lshCandidatePairs(sigs, idCol, bands, numHashes / bands)
    verifyShingled(withShingles, idCol, cands, tauNum, tauDen)
  }

  /** Persistable LSH band index of a corpus: one row per (document, band)
    * with the band's bucket hash — `(idCol, band, band_hash)`. Built from
    * the PER-ROW signature form ([[withMinHashColumns]], zero shuffles), so
    * writing the index is a scan-and-write; bucket hashes are bit-identical
    * to both the batch [[lshCandidatePairs]] bucketing and the streaming
    * ingest form. Write it range-clustered on `band_hash` (see
    * [[graft.sinks.ClusteredWrite]]) and incremental runs prune to the
    * buckets their newcomers actually touch.
    */
  def buildLshIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = withMinHashColumns(
      projectedShingles(df, idCol, textCol, shingleN), col("__shingles"), numHashes)
    sigs.select(col(idCol),
      posexplode(array(bandHashColumns(bands, numHashes / bands): _*)).as(Seq("band", "band_hash")))
  }

  /** INCREMENTAL near-dup: match a batch of NEWCOMERS against an existing
    * corpus through its persisted [[buildLshIndex]] — the nightly-ingest
    * shape where yesterday's 100 TB must not be re-signatured to admit
    * today's 100 GB. Candidates come from an equi-join of the newcomers'
    * band hashes (per-row, shuffle-free) against the index — the old corpus
    * is never scanned for candidate GENERATION; `oldDocs` is consulted only
    * to verify, and only for the matched ids (the semi-join prunes the
    * scan). Emits the same exact-Jaccard-verified
    * `(id_a=new, id_b=old, inter_cnt, union_cnt)` contract as
    * [[nearDupPairs]]; ids across the two sides must be distinct (they are
    * different generations of one id space by construction).
    *
    * Both candidate-join sides and both verify joins are SMJ-pinned: every
    * one of them is either corpus-sized or a derived table whose static
    * size estimate is the measured derived-broadcast OOM class.
    */
  def nearDupAgainstIndex(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      oldDocs: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      tauNum: Int = 1,
      tauDen: Int = 2
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val newShingled = projectedShingles(newDocs, idCol, textCol, shingleN)
    val newBands = withMinHashColumns(newShingled, col("__shingles"), numHashes)
      .select(col(idCol).as("id_a"),
        posexplode(array(bandHashColumns(bands, numHashes / bands): _*)).as(Seq("band", "band_hash")))
    val cands = newBands
      .join(index.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
        .hint("shuffle_merge"), Seq("band", "band_hash"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(newShingled.select(col(idCol).as("id_a"), col("__shingles").as("__sa"))
        .hint("shuffle_merge"), Seq("id_a"))
      .join(projectedShingles(oldDocs, idCol, textCol, shingleN)
        .select(col(idCol).as("id_b"), col("__shingles").as("__sb"))
        .hint("shuffle_merge"), Seq("id_b"))
      .withColumn("inter_cnt", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("union_cnt", size(col("__sa")) + size(col("__sb")) - col("inter_cnt"))
      .filter(col("inter_cnt") * tauDen >= col("union_cnt") * tauNum)
      .select("id_a", "id_b", "inter_cnt", "union_cnt")
  }

  /** EXACT-Jaccard verification of an EXTERNAL candidate-pair table — the
    * verify stage of [[nearDupPairs]] exposed for candidates produced
    * elsewhere (the streaming ingest path's
    * [[graft.streaming.StreamingDedup]] emits candidate pairs whose
    * verification is deliberately a downstream batch step: it needs both
    * documents' shingle sets, which would make streaming state
    * corpus-sized). `candidates` needs `id_a`/`id_b` columns; same output
    * and threshold semantics as [[nearDupPairs]].
    */
  def verifyCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleN: Int = 3,
      tauNum: Int = 1,
      tauDen: Int = 2
  ): DataFrame =
    verifyShingled(
      projectedShingles(df, idCol, textCol, shingleN), idCol,
      candidates.select(col("id_a"), col("id_b")), tauNum, tauDen)

  /** Edit-distance (Levenshtein) verification of candidate pairs — the
    * FUZZY member of the verify family, for near-identical texts where
    * shingle Jaccard is too coarse (one-word edits in short titles or
    * boilerplate variants). Cost is O(|a|·|b|) PER PAIR, so candidates must
    * be bounded upstream (LSH buckets, consecutive keys) — never all-pairs
    * — and `truncateAt` caps the DP size per pair. It MUST be positive:
    * an unbounded default would make one megabyte-document pair a ~10^12
    * -cell DP (full-document edit distance is the wrong tool past a few
    * KB; chunk first, or raise `truncateAt` deliberately for a corpus of
    * known-short texts). Output: (id_a, id_b, edit_dist, similarity) with
    * `similarity = round(1 - dist / max(len_a, len_b), 4)` (two empty
    * texts are identical → 1.0). Verify joins SMJ-pinned like the
    * Jaccard form.
    */
  def editDistanceVerify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      truncateAt: Int = 1024
  ): DataFrame = {
    require(truncateAt > 0,
      s"truncateAt must be positive (got $truncateAt): unbounded Levenshtein is O(|a|*|b|) " +
        "per pair and a long-document pair can be a trillion-cell DP; chunk long documents " +
        "upstream or set truncateAt to a deliberate cap")
    val t = substring(col(textCol), 1, truncateAt)
    val side = df.select(col(idCol), t.as("__t"))
    val dist = levenshtein(col("__ta"), col("__tb"))
    val maxLen = greatest(length(col("__ta")), length(col("__tb")))
    candidates.select(col("id_a"), col("id_b"))
      .join(side.select(col(idCol).as("id_a"), col("__t").as("__ta"))
        .hint("shuffle_merge"), Seq("id_a"))
      .join(side.select(col(idCol).as("id_b"), col("__t").as("__tb"))
        .hint("shuffle_merge"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        dist.as("edit_dist"),
        when(maxLen === 0, lit(1.0))
          .otherwise(round(lit(1.0) - dist.cast("double") / maxLen.cast("double"), 4))
          .as("similarity"))
  }

  private def verifyShingled(
      withShingles: DataFrame,
      idCol: String,
      cands: DataFrame,
      tauNum: Int,
      tauDen: Int
  ): DataFrame = {
    val sh = withShingles.select(col(idCol), col("__shingles"))
    // SHUFFLE_MERGE: the candidate table's static size estimate is garbage
    // (explode->aggregate chain), so without the hint the planner can pick
    // BroadcastHashJoin over a candidate set that grows with every duplicate
    // cluster in the corpus — a driver OOM at scale that AQE cannot undo
    // once statically planned (see cosineNearDupPairsLsh for the measured
    // failure). Both verify sides are corpus-sized at 100 TB; merge join is
    // the right shape there and costs milliseconds at gate SF.
    cands
      .join(sh.select(col(idCol).as("id_a"), col("__shingles").as("__sa"))
        .hint("shuffle_merge"), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__shingles").as("__sb"))
        .hint("shuffle_merge"), Seq("id_b"))
      .withColumn("inter_cnt", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("union_cnt", size(col("__sa")) + size(col("__sb")) - col("inter_cnt"))
      .filter(col("inter_cnt") * tauDen >= col("union_cnt") * tauNum)
      .select("id_a", "id_b", "inter_cnt", "union_cnt")
  }

  /** Exact n-gram Jaccard similar pairs via an INVERTED SHINGLE INDEX — the
    * direct (non-LSH) member of the dedup family: every pair sharing at least
    * one shingle is counted exactly, so for any tau > 0 the output equals the
    * all-pairs answer without ever forming the O(n²) cross join.
    *
    * Shape: explode shingles (per-doc set size riding along as a column) ->
    * group by shingle (ONE keyed shuffle) -> expand each posting list
    * locally, pairs carrying both set sizes -> count shared shingles per
    * pair (second keyed shuffle, map-side combine); the union size is then
    * arithmetic, no join. Work is sum over shingles of |postings|², i.e.
    * driven by shingle document-frequency, not corpus size.
    *
    * `maxDocFreq` drops shingles whose posting list exceeds the cap — the
    * standard skew guard for web-scale corpora where a boilerplate n-gram
    * appears in millions of documents. It trades exactness for a bound on
    * per-key work (a dropped shingle can only lower inter/union counts);
    * None (default) keeps the operator exact and oracle-checkable.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      tauNum: Int = 1,
      tauDen: Int = 2,
      maxDocFreq: Option[Int] = None
  ): DataFrame = {
    // The inverted index only ever enumerates pairs sharing >= 1 shingle, so
    // tau = 0 (which zero-intersection pairs would satisfy) cannot be served
    // exactly — enforce the documented precondition instead of silently
    // dropping those pairs.
    require(tauNum > 0, s"jaccardPairs requires tauNum > 0 (got $tauNum): " +
      "zero-intersection pairs never share a posting list and would be missing")
    require(tauDen > 0, s"jaccardPairs requires tauDen > 0 (got $tauDen)")
    val withShingles = projectedShingles(df, idCol, textCol, shingleN)
    // The per-doc set size RIDES THROUGH the explode as a column, so the
    // union size falls out of the pair expansion directly — no join of the
    // (much larger) pair table back against a sizes table. The whole
    // operator is exactly two keyed shuffles: group-by-shingle, then
    // group-by-pair. (sz is functionally dependent on the id, so grouping
    // by (id, sz) pairs is grouping by the ids.)
    val ex = withShingles.select(
      col(idCol),
      size(col("__shingles")).cast("int").as("__sz"),
      explode(col("__shingles")).as("__sh"))
    val postings = ex
      .groupBy(col("__sh"))
      .agg(collect_list(struct(col(idCol).as("id"), col("__sz").as("sz"))).as("__ids"))
      .filter(size(col("__ids")) > 1)
    val capped = maxDocFreq.fold(postings)(cap => postings.filter(size(col("__ids")) <= cap))
    capped
      .select(explode(col("__ids")).as("__a"), col("__ids"))
      .select(col("__a"), explode(col("__ids")).as("__b"))
      .filter(col("__a.id") < col("__b.id"))
      .groupBy(
        col("__a.id").as("id_a"), col("__b.id").as("id_b"),
        col("__a.sz").as("__sza"), col("__b.sz").as("__szb"))
      .agg(count(lit(1)).cast("int").as("inter_cnt"))
      .withColumn("union_cnt", col("__sza") + col("__szb") - col("inter_cnt"))
      .filter(col("inter_cnt") * tauDen >= col("union_cnt") * tauNum)
      .select("id_a", "id_b", "inter_cnt", "union_cnt")
  }

  /** [[jaccardPairs]] with PREFIX-FILTERED candidate generation (the
    * AllPairs/PPJoin family, Bayardo 2007 / Xiao 2008) — the EXACT
    * set-similarity join's standard scale path, and a structurally
    * different candidate scheme from banded LSH: order every doc's
    * shingle set by GLOBAL rarity (document frequency asc, shingle), and
    * only each doc's first `|x| − ⌈τ·|x|⌉ + 1` elements generate
    * candidates — any pair with J ≥ τ must share a prefix element under
    * the common order (pigeonhole on the ⌈τ·|x|⌉ suffix), so the
    * candidate set is a SUPERSET of the answer and the exact verify
    * restores equality with [[jaccardPairs]] row for row (the q48≡q31
    * move applied to exact Jaccard).
    *
    * Why it scales where the full inverted index hurts: posting lists of
    * COMMON shingles (the quadratic bombs) are touched only by docs that
    * carry them in their prefix — and common shingles sort LAST, so they
    * almost never are. Candidate volume is driven by rare-shingle
    * postings. Shapes: one df-count aggregation, one per-doc
    * rank-and-cut (window over the doc's own elements — doc-length
    * bounded), one prefix self-join, one verify join against the full
    * element table; every join SMJ-pinned.
    *
    * CONTRACT: run EXACT dedup first. A w-wide cluster of IDENTICAL
    * documents has no rare shingles — every prefix element's posting is
    * ≥ w wide, so candidates are inherently Ω(w²) per cluster (that IS
    * the J=1 output, but it is also ~80 GB of candidate spill at the
    * ×16-identical ScaleSmoke widening). On a deduped/organic corpus the
    * rarity order concentrates prefixes on near-unique shingles and the
    * candidate set tracks the true near-dup pairs (measured: the
    * text-perturbed ×16 smoke stage).
    */
  def jaccardPairsPrefixFiltered(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      tauNum: Int = 1,
      tauDen: Int = 2
  ): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"need 0 < tauNum/tauDen <= 1, got $tauNum/$tauDen")
    import org.apache.spark.sql.expressions.Window
    // the shingle-SET table feeds the element explode (df-counts + the
    // prefix cut) AND both verify sides — materialize it once (a
    // deployment reads a persisted table here) or every reference replays
    // the tokenize+shingle pass (measured 10.9 s -> the dominant cost).
    // Checkpointing the ARRAY form (one row per doc) instead of the
    // exploded element form holds |docs| rows instead of |elements|; the
    // two element-shaped references below re-explode from memory.
    val sets = projectedShingles(df, idCol, textCol, shingleN).select(
      col(idCol),
      size(col("__shingles")).cast("int").as("__sz"),
      col("__shingles"))
      .localCheckpoint(true)
    val ex = sets.select(col(idCol), col("__sz"), explode(col("__shingles")).as("__sh"))
    val dfreq = ex.groupBy(col("__sh")).agg(count(lit(1)).as("__df"))
    // prefix length = sz − ⌈τ·sz⌉ + 1, integer-exact ceil
    val prefLen = col("__sz") -
      ((col("__sz") * tauNum + lit(tauDen - 1)) - pmod(col("__sz") * tauNum + lit(tauDen - 1), lit(tauDen))) / lit(tauDen) + lit(1)
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__df"), col("__sh"))
    val prefix = ex.join(dfreq.hint("shuffle_merge"), Seq("__sh"))
      .withColumn("__rn", row_number().over(wDoc))
      .filter(col("__rn") <= prefLen)
      .select(col(idCol), col("__sz"), col("__sh"))
    // Candidate pairs carry both set sizes through the prefix join, so the
    // LENGTH filter (Arasu 2006 / the PPJoin size bound) prunes BEFORE the
    // distinct and the verify joins: J ≥ τ forces τ·max(|A|,|B|) ≤
    // min(|A|,|B|) (J ≤ min/max), so any pair failing
    // sza·tauDen ≥ szb·tauNum ∧ szb·tauDen ≥ sza·tauNum cannot pass the
    // exact verify — dropping it here changes nothing downstream.
    val cands = prefix.select(col(idCol).as("id_a"), col("__sz").as("__sza"), col("__sh"))
      .hint("shuffle_merge")
      .join(prefix.select(col(idCol).as("id_b"), col("__sz").as("__szb"), col("__sh"))
        .hint("shuffle_merge"), Seq("__sh"))
      .filter(col("id_a") < col("id_b") &&
        col("__sza") * tauDen >= col("__szb") * tauNum &&
        col("__szb") * tauDen >= col("__sza") * tauNum)
      .select(col("id_a"), col("id_b"))
      .distinct()
    // VERIFY against the per-doc shingle ARRAYS, not the exploded element
    // table: the element form shuffles |cands| × |shingles/doc| skinny
    // rows (the r18 profile measured 605 executor-seconds at gate SF on
    // 409k candidates); attaching the two arrays and counting
    // array_intersect moves the same bytes in |cands| rows and verifies
    // each pair in one O(|A|+|B|) row-local pass — same (id_a, id_b,
    // inter_cnt, union_cnt) rows bit for bit (sets are array_distinct'd,
    // so |A∩B| is the same count the join-and-group computed). Joins stay
    // SMJ-pinned: both sides are corpus-shaped derived frames (the §8.1
    // derived-broadcast class).
    val setsA = sets.select(col(idCol).as("id_a"), col("__shingles").as("__sha"))
    val setsB = sets.select(col(idCol).as("id_b"), col("__shingles").as("__shb"))
    cands
      .join(setsA.hint("shuffle_merge"), Seq("id_a"))
      .join(setsB.hint("shuffle_merge"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__sha"), col("__shb"))).as("inter_cnt"),
        size(col("__sha")).as("__sza"), size(col("__shb")).as("__szb"))
      .withColumn("union_cnt", (col("__sza") + col("__szb") - col("inter_cnt")).cast("int"))
      .filter(col("inter_cnt") * tauDen >= col("union_cnt") * tauNum)
      .select(col("id_a"), col("id_b"), col("inter_cnt").cast("int").as("inter_cnt"),
        col("union_cnt"))
  }

  /** Shingle CONTAINMENT pairs (Broder's directional coefficient
    * `|A∩B| / |A|`): surfaces documents mostly CONTAINED in another —
    * quotes, excerpts, snippet pages, prepended-boilerplate copies — which
    * symmetric Jaccard misses by construction (a 12-token snippet of a
    * 500-token doc has Jaccard ≈ 0.02 but containment 1.0). The standard
    * companion gate to [[jaccardPairs]] in crawl dedup.
    *
    * Same two-keyed-shuffle inverted-index shape as [[jaccardPairs]]
    * (posting lists enumerate only pairs sharing ≥ 1 shingle; per-doc set
    * sizes ride the explode), same rational-arithmetic threshold
    * (`inter · tauDen ≥ sz · tauNum`, integer-exact in any engine), applied
    * in EITHER direction. `tauNum > 0` for the same posting-list reason.
    * Output: (id_a, id_b, inter_cnt, sz_a, sz_b, cont_a, cont_b) where
    * `cont_a` = fraction of a's shingles inside b.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      tauNum: Int = 9,
      tauDen: Int = 10,
      maxDocFreq: Option[Int] = None
  ): DataFrame = {
    require(tauNum > 0, s"containmentPairs requires tauNum > 0 (got $tauNum): " +
      "zero-intersection pairs never share a posting list and would be missing")
    require(tauDen > 0, s"containmentPairs requires tauDen > 0 (got $tauDen)")
    val withShingles = projectedShingles(df, idCol, textCol, shingleN)
    val ex = withShingles.select(
      col(idCol),
      size(col("__shingles")).cast("int").as("__sz"),
      explode(col("__shingles")).as("__sh"))
    val postings = ex
      .groupBy(col("__sh"))
      .agg(collect_list(struct(col(idCol).as("id"), col("__sz").as("sz"))).as("__ids"))
      .filter(size(col("__ids")) > 1)
    val capped = maxDocFreq.fold(postings)(cap => postings.filter(size(col("__ids")) <= cap))
    capped
      .select(explode(col("__ids")).as("__a"), col("__ids"))
      .select(col("__a"), explode(col("__ids")).as("__b"))
      .filter(col("__a.id") < col("__b.id"))
      .groupBy(
        col("__a.id").as("id_a"), col("__b.id").as("id_b"),
        col("__a.sz").as("__sza"), col("__b.sz").as("__szb"))
      .agg(count(lit(1)).cast("int").as("inter_cnt"))
      .filter(col("inter_cnt") * tauDen >= col("__sza") * tauNum ||
        col("inter_cnt") * tauDen >= col("__szb") * tauNum)
      .select(col("id_a"), col("id_b"), col("inter_cnt"),
        col("__sza").as("sz_a"), col("__szb").as("sz_b"),
        round(col("inter_cnt").cast("double") / col("__sza"), 4).as("cont_a"),
        round(col("inter_cnt").cast("double") / col("__szb"), 4).as("cont_b"))
  }

  /** Record linkage / entity resolution: BLOCKING + bounded edit-distance
    * verify — the classic two-phase shape (Fellegi-Sunter's candidate
    * generation) over an attribute column: rows sharing every `blockCols`
    * value become candidates (one keyed self-join — never all-pairs), and
    * candidates link iff Levenshtein over the truncated attribute is
    * ≤ `maxDistance`. Output is [[editDistanceVerify]]'s
    * (id_a, id_b, edit_dist, similarity), filtered.
    *
    * Blocking keys are the scale contract: per-block cost is quadratic in
    * block size (exactly [[graft.operators.Similarity.semDedup]]'s
    * cluster contract), so choose keys selective enough that blocks fit a
    * task — and note a pair split across blocks is NEVER compared (the
    * recall trade every blocking scheme makes; canonical-key
    * normalization upstream — [[graft.operators.TextAnalysis.canonicalizeUrl]]'s
    * family — is how production linkage shrinks that loss).
    */
  def blockedEntityPairs(
      df: DataFrame,
      idCol: String,
      attrCol: String,
      blockCols: Seq[String],
      maxDistance: Int,
      truncateAt: Int = 256
  ): DataFrame = {
    require(blockCols.nonEmpty, "at least one blocking column is required")
    require(maxDistance >= 0, s"maxDistance must be non-negative, got $maxDistance")
    // The attribute rides THROUGH the block self-join (r18): the former
    // two-phase form generated bare (id_a, id_b) candidates and re-joined
    // the attribute on via editDistanceVerify's two SMJs — two extra
    // shuffles of the (quadratic-in-block-size) candidate table just to
    // re-attach a short string both sides already had. Levenshtein runs
    // BOUNDED (the maxDistance overload, O(maxDistance·min|a|,|b|) per
    // pair instead of O(|a|·|b|), returning -1 past the bound): for the
    // rows this operator keeps (edit_dist <= maxDistance) the bounded
    // value equals the exact one, so output is identical row for row.
    val t = substring(col(attrCol), 1, truncateAt)
    // Both sides are explicitly hash-repartitioned on the block keys at
    // the session count: the blocked frame is BYTES-tiny but the join
    // output is QUADRATIC per block and every surviving row pays a
    // Levenshtein, so AQE's bytes-based coalescing would run the whole
    // verify on one task (measured 0.6 s -> 0.3 s at gate SF from this
    // pin alone). The user repartition IS the SMJ's exchange (same keys,
    // same count — no second shuffle), so at scale this moves exactly
    // the bytes the join moved before, minus the coalesce.
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val a = df.select(blockCols.map(col) :+ col(idCol).as("id_a") :+ t.as("__ta"): _*)
      .repartition(p, blockCols.map(col): _*)
    val b = df.select(blockCols.map(col) :+ col(idCol).as("id_b") :+ t.as("__tb"): _*)
      .repartition(p, blockCols.map(col): _*)
    val dist = levenshtein(col("__ta"), col("__tb"), maxDistance)
    val maxLen = greatest(length(col("__ta")), length(col("__tb")))
    a.hint("shuffle_merge")
      .join(b.hint("shuffle_merge"), blockCols)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        dist.as("edit_dist"),
        when(maxLen === 0, lit(1.0))
          .otherwise(round(lit(1.0) - dist.cast("double") / maxLen.cast("double"), 4))
          .as("similarity"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDistance)
  }

  /** Connected components over a pair list by iterative min-label
    * propagation — turns near-dup PAIRS (any of the family above) into dedup
    * CLUSTERS: every vertex gets the smallest vertex id reachable from it.
    *
    * Each round is fully distributed (symmetrized-edge join + min aggregate,
    * both keyed shuffles); only the loop control runs on the driver, which is
    * how iterative graph algorithms on Spark always terminate. Labels only
    * ever decrease, so convergence is checked with an `isEmpty` on the
    * changed set, and lineage is truncated each round: `localCheckpoint` by
    * default (executor-memory blocks — fine in local mode and on
    * static clusters), or a RELIABLE checkpoint when `checkpointDir` is
    * given, which is what a 1000-executor run wants — localCheckpoint blocks
    * die with a lost executor and are unrecoverable mid-loop, whereas
    * reliable checkpoints live in the shared filesystem. Near-dup
    * components are shallow (near-cliques), so rounds ~ 2-3 in practice;
    * `maxIter` bounds the worst case, which since r18 is O(log diameter)
    * rather than O(diameter) — from round 3 every round adds a
    * pointer-doubling hop (see the loop body).
    *
    * `checkpointDir` is set on the SparkContext (session-wide, Spark has no
    * per-job checkpoint dir); per-round files are reclaimed on GC when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
    */
  def connectedComponents(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val truncate: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        vertices.sparkSession.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint()
    }
    // Materialize the (tiny relative to the corpus) edge list once: it is
    // re-joined EVERY round, and without this the whole upstream pair
    // computation re-executes per iteration — measured 3x on q43.
    // The checkpoint is CAPPED at the session shuffle-partition count
    // (coalesce — a partition merge, no shuffle): the union doubles the
    // upstream partition count, a checkpoint loses partitioning, and every
    // round re-exchanges sym from scratch, so each of the ~diameter rounds
    // launches one map task per checkpointed partition (r18: an upstream
    // pinned at 2x32 partitions made the 20-round q168 loop launch 128 map
    // tasks per round over a kilobyte-sized edge list). At scale the cap
    // is the session's own deliberately-sized shuffle width. The coalesce
    // fuses into (and caps) the terminal upstream stage of the one-time
    // edge materialization: for every caller here that stage is already
    // post-exchange at the session width (pair generation ends in an
    // aggregate/join), so the cap is a no-op there — only scan-shaped
    // edge inputs wider than the session width get merged, and those are
    // exactly the cheap-per-row case the cap exists for.
    val symP = edges.sparkSession.sessionState.conf.numShufflePartitions
    // Symmetrize in ONE pass (explode of the two orientations per edge)
    // instead of a union of two selects: each union branch re-evaluated
    // the whole upstream pair-generation DAG inside the checkpoint job —
    // for the jaccardPairs callers that was the single most expensive
    // subtree in the query, paid twice (r18: q114 measured ~2x the
    // pair-stage executor time in exactly this union).
    val sym = truncate(edges
      .select(explode(array(
        struct(col(srcCol).as("__src"), col(dstCol).as("__dst")),
        struct(col(dstCol).as("__src"), col(srcCol).as("__dst")))).as("__e"))
      .select(col("__e.__src").as("__src"), col("__e.__dst").as("__dst"))
      .coalesce(symP))
    var labels = truncate(
      vertices.select(col(idCol).as("__id"), col(idCol).as("__label")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // One aggregation does the whole step: the propagated frame is
      // {own (id, label)} ∪ {(dst, label of src) per edge}, and
      // min(label) per id IS least(own, min over neighbours) — the same
      // fixpoint as the former join-aggregate-join form (r18: that form
      // exchanged `labels` twice per round and re-joined the aggregate
      // back; this one is a single keyed shuffle per round, and the
      // min is map-side combinable so hot vertices pre-collapse in each
      // map partition). `__o` carries the previous label for the
      // convergence probe: only the own-row has it non-null, so max()
      // recovers exactly that row's value.
      val nbr = sym.join(labels, col("__src") === col("__id"))
        .select(col("__dst").as("__id"), col("__label"),
          // a NULL of __label's own type, whatever the caller's id type is
          when(lit(false), col("__label")).as("__o"))
      val own = labels.select(col("__id"), col("__label"), col("__label").as("__o"))
      val half = truncate(own.unionByName(nbr)
        .groupBy(col("__id"))
        .agg(min(col("__label")).as("__label"), max(col("__o")).as("__old"))
        // an edge endpoint absent from `vertices` has no own-row (null
        // __old); the former left-join form dropped such ids — keep that.
        // CONTRACT: a NULL vertex id is likewise excluded (its own-row
        // label — and therefore __old — is null, indistinguishable from
        // the no-own-row marker); every caller's id is a non-null key by
        // construction, and a dirty vertex table should be null-filtered
        // upstream rather than given a null cluster label here.
        .filter(col("__old").isNotNull))
      // POINTER-DOUBLING hop from round 3 on (pointer jumping / path
      // halving, Shiloach-Vishkin): a label is itself a vertex id of the
      // same component, so following it one step (label-of-label) squares
      // the propagation distance — deep components converge in O(log
      // diameter) rounds instead of O(diameter) (r18: q168's edit-chain
      // clusters ran the full 20-round budget at ~1.5 s/round; with the
      // hop the loop lands in ~7). The first two rounds stay plain: most
      // dedup graphs here are near-cliques that converge in 2 rounds, and
      // for them the hop's extra self-join and checkpoint are pure
      // overhead. The fixpoint is unchanged — labels still only ever
      // decrease toward the component minimum, and the convergence
      // criterion (no decrease in a full round) is checked on the
      // hopped result.
      val stepped =
        if (iter < 2) half
        else {
          val byId = half.select(col("__id").as("__lid"), col("__label").as("__llab"))
          truncate(half.join(byId, half("__label") === byId("__lid"), "left")
            .select(col("__id"),
              least(col("__label"), coalesce(col("__llab"), col("__label"))).as("__label"),
              col("__old")))
        }
      converged = stepped.filter(col("__label") < col("__old")).isEmpty
      labels = stepped.select(col("__id"), col("__label"))
      iter += 1
    }
    // A truncated propagation would silently emit non-minimal labels (a
    // diameter-(maxIter+1) chain still moves labels on round maxIter) —
    // wrong answers must be loud.
    if (!converged)
      throw graft.core.GraftError(
        s"connectedComponents did not converge within $maxIter rounds; raise maxIter (graph diameter exceeds it)")
    labels.select(col("__id").as(idCol), col("__label").as("cluster_id"))
  }

  /** INCREMENTAL connected components — merge a new batch into existing
    * clusters without replaying history's edges: the prior clustering
    * collapses to ONE label edge per non-root node (`id → cluster_id`,
    * which under [[connectedComponents]]'s min-label convention is itself
    * a member id of the same component), so propagating over
    * (label edges ∪ new edges) reaches the same global minimum id as a
    * from-scratch run over ALL edges ever seen — bit-identical labels
    * (the q147 gate), at the cost of |nodes| label edges + |new edges|
    * instead of the full historical pair list. This is the daily-ingest
    * shape of the dedup family's third memory: near-dup PAIRS against the
    * LSH history index ([[nearDupAgainstIndex]]) feed `newEdges`, and
    * clusters stay globally consistent while each day's CC run only ever
    * sees one day of fresh pairs.
    *
    * A new edge can merge two OLD components — the smaller one's members
    * legitimately relabel (that is the semantics, not drift —
    * [[graft.operators.Sampling.clusterAwareSplit]]'s caveat).
    */
  def incrementalConnectedComponents(
      oldClusters: DataFrame,
      idCol: String,
      newVertices: DataFrame,
      newEdges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val labelEdges = oldClusters
      .filter(col(idCol) =!= col("cluster_id"))
      .select(col(idCol).as(srcCol), col("cluster_id").as(dstCol))
    val vertices = oldClusters.select(col(idCol))
      .unionByName(newVertices.select(col(idCol)))
      .distinct()
    connectedComponents(vertices, idCol,
      labelEdges.unionByName(newEdges.select(col(srcCol), col(dstCol))),
      srcCol, dstCol, maxIter, checkpointDir)
  }

  /** Keep the BEST-QUALITY representative of every duplicate cluster —
    * production near-dedup keeps the highest-quality copy (longest, best
    * quality score, freshest crawl), not the minimum id the plain keep-min
    * tail uses. `clusters` is [[connectedComponents]] output (idCol,
    * `cluster_id`); the winner per cluster maximizes `(quality, -id)` —
    * quality first, ties to the SMALLEST id, so with a constant quality
    * column this degenerates to exactly the keep-min rule.
    *
    * Scale shape: one keyed join docs↔clusters on id, ONE aggregation on
    * cluster_id whose state is a single (quality, id) struct per cluster
    * (max is associative — map-side combine applies, no window, no
    * whole-cluster collect), then a semi join back. Hot clusters cost
    * nothing extra.
    */
  def keepBestPerCluster(
      docs: DataFrame,
      idCol: String,
      qualityCol: Column,
      clusters: DataFrame
  ): DataFrame = {
    val winners = docs
      .join(clusters, Seq(idCol))
      .groupBy(col("cluster_id"))
      .agg(max(struct(qualityCol.as("q"), (-col(idCol)).as("nid"))).as("__w"))
      .select((-col("__w.nid")).as(idCol))
    docs.join(winners, Seq(idCol), "left_semi")
  }

  /** SimHash signature width. 60 bits, not 64: the per-token hash is the
    * 15-hex-char (60-bit) prefix of md5 — a hash every engine computes
    * identically, which is what lets the SimHash pipeline be oracle-checked
    * bit-for-bit against an independent SQL engine (q32). 60 bits keeps the
    * value positive in a signed BIGINT on both sides; the 4-bit loss is
    * irrelevant to SimHash quality. (xxhash64 would hash ~3x faster, but
    * token hashing is a small slice of the signature aggregation and
    * portability buys the exactness gate.)
    */
  val SimHashBits = 60

  /** SimHash signature per document: per token-hash bit, majority vote
    * across tokens (term-frequency weighted — duplicate tokens vote once
    * each). Returns (`idCol`, `simhash`).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = withComputeParallelism(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .withColumn("__h", conv(substring(md5(col("__tok")), 1, SimHashBits / 4), 16, 10).cast("long"))
    val voteAggs = (0 until SimHashBits).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i")
    }
    val votes = ex.groupBy(col(idCol)).agg(voteAggs.head, voteAggs.tail: _*)
    val sig = (0 until SimHashBits)
      .map(i => when(col(s"v$i") >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    votes.select(col(idCol), sig.as("simhash"))
  }

  /** IDF-weighted SimHash (the Charikar/Manku production form): like
    * [[simHash]], but each token occurrence's ±1 bit vote is scaled by an
    * INTEGER idf weight `round(1000·ln(N/df)) + 1` from an in-plan
    * document-frequency aggregation — rare, discriminative tokens dominate
    * the signature instead of stopwords, which is what makes weighted
    * SimHash separate near-dups that share only boilerplate vocabulary.
    *
    * Engine-exact on purpose: the weight is quantized to an integer ONCE
    * (from `ln` of two integer counts — order-independent), so the per-bit
    * vote sums are INTEGER sums — no float summation order anywhere, and
    * an oracle reproduces the signature bit for bit. The `+ 1` keeps
    * ubiquitous tokens (df = N → ln = 0) voting with weight 1, exactly the
    * unweighted behaviour — so on a corpus where every token has equal df
    * the signature degenerates to [[simHash]]'s (spec-pinned).
    *
    * Shape at 100 TB: df is ONE keyed aggregation over row-local distinct
    * tokens (map-side combine; a stopword's billions of occurrences
    * collapse to one row per map partition), the weight join back to token
    * occurrences is SMJ-pinned (both sides corpus-shaped and derived —
    * the static estimate under an explode is garbage, see
    * [[nearDupPairs]]), N rides as a 1-row scalar, and the vote aggregate
    * is the same single keyed pass as [[simHash]].
    */
  def simHashWeighted(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = withComputeParallelism(df.select(col(idCol), col(textCol)))
    val dfCounts = base
      .select(col(idCol), explode(array_distinct(split(col(textCol), " "))).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__df"))
    val n = base.agg(count(lit(1)).as("__n"))
    val weighted = base
      .select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .join(dfCounts.hint("shuffle_merge"), Seq("__tok"))
      .crossJoin(n)
      .withColumn("__w",
        round(log(col("__n").cast("double") / col("__df").cast("double")) * 1000, 0)
          .cast("long") + 1L)
      .withColumn("__h",
        conv(substring(md5(col("__tok")), 1, SimHashBits / 4), 16, 10).cast("long"))
    val voteAggs = (0 until SimHashBits).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, col("__w"))
        .otherwise(-col("__w"))).as(s"v$i")
    }
    val votes = weighted.groupBy(col(idCol)).agg(voteAggs.head, voteAggs.tail: _*)
    val sig = (0 until SimHashBits)
      .map(i => when(col(s"v$i") >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    votes.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming (<= 3 for
    * the 4x15-bit chunk bucketing to be exhaustive by pigeonhole). Candidate
    * generation shuffles on 15-bit chunk values — never all-pairs.
    */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame =
    simHashPairsFromSignatures(simHash(df, idCol, textCol), idCol, maxHamming)

  /** The chunk-bucketed pair search over an ALREADY-COMPUTED signature
    * frame (`(idCol, simhash)` — [[simHash]] or [[simHashWeighted]]
    * output): exposed so the weighted form, persisted signature tables,
    * and streamed signatures all share one candidate path. */
  def simHashPairsFromSignatures(sig: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk bucketing is only exhaustive for hamming <= 3")
    val chunkBits = SimHashBits / 4
    val chunks = (0 until 4).map(i => shiftright(col("simhash"), i * chunkBits).bitwiseAND((1L << chunkBits) - 1))
    val banded = sig.select(col(idCol), col("simhash"), posexplode(array(chunks: _*)).as(Seq("__chunk", "__cv")))
    val a = banded.select(col("__chunk"), col("__cv"), col(idCol).as("id_a"), col("simhash").as("__ha"))
    val b = banded.select(col("__chunk"), col("__cv"), col(idCol).as("id_b"), col("simhash").as("__hb"))
    // SHUFFLE_MERGE: both self-join sides are the full banded corpus (4 rows
    // per doc) — broadcasting either is wrong at scale, and the static size
    // estimate under the explode is unreliable (see nearDupPairs).
    a.join(b.hint("shuffle_merge"), Seq("__chunk", "__cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // --- cross-document repeated-substring (window) dedup ---------------------

  /** All overlapping `w`-token windows per document with their start
    * positions (0-based): one row per (doc, pos), the window carried as its
    * 16-byte md5 so the window-key shuffle moves 16 bytes, not ~8·w of
    * text. Docs shorter than `w` tokens contribute no windows — a window
    * is a span of exactly `w` tokens, no short-doc fallback (unlike
    * [[shinglesOfTokens]], whose whole-text fallback exists for Jaccard
    * over short docs).
    */
  private def windowHashes(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    withComputeParallelism(df.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .filter(size(col("__toks")) >= w)
      .select(col(idCol),
        posexplode(hashedWindows(col("__toks"), w, s => unhex(md5(s))))
          .as(Seq("__pos", "__wh")))

  /** One hashed value per `w`-token window of a PRE-PROJECTED token array —
    * the ONE derivation every window operator shares: the index build and
    * the index probe (and the within-corpus stats) must agree
    * token-for-token or probes silently stop matching, so the window text
    * is assembled in exactly one place and only the hash family varies
    * (16-byte md5 for the exact in-corpus operators, xxhash64 for the
    * broadcast index set). */
  private def hashedWindows(toks: Column, w: Int, hash: Column => Column): Column =
    transform(sequence(lit(0), size(toks) - w),
      i => hash(concat_ws(" ", (0 until w).map(j => element_at(toks, i + j + 1)): _*)))

  /** The window keys occurring in MORE THAN ONE distinct document — the
    * "duplicated substring" set of Lee et al.'s training-data dedup,
    * at `w`-token granularity. One keyed aggregation on the 16-byte window
    * hash with map-side partial min/max; `min(id) != max(id)` is the
    * two-distinct-docs test without a countDistinct. A window repeated
    * only WITHIN one document does not qualify (intra-doc repetition is
    * [[TextAnalysis]]'s repetition metrics' job).
    */
  private def crossDocWindowKeys(wins: DataFrame, idCol: String): DataFrame =
    wins.groupBy(col("__wh"))
      .agg(min(col(idCol)).as("__lo"), max(col(idCol)).as("__hi"))
      .filter(col("__lo") =!= col("__hi"))
      .select(col("__wh"))

  /** Per-document cross-doc duplication profile: how much of each doc is
    * covered by `w`-token spans that also appear verbatim in some OTHER
    * document. `n_windows` = total windows, `dup_positions` = positions
    * whose window is cross-doc duplicated, `dup_distinct` = distinct such
    * windows in this doc. Shape: the window explode (w-bounded per row),
    * ONE shuffle on the window hash, an SMJ semi-join back (both sides
    * corpus-sized explode derivatives — the static-estimate broadcast trap
    * class), and a keyed re-aggregation per doc. Short docs report zeros.
    */
  def duplicatedWindowStats(df: DataFrame, idCol: String, textCol: String, w: Int = 8): DataFrame = {
    require(w >= 2, "window must span at least 2 tokens")
    val wins = windowHashes(df, idCol, textCol, w)
    val dup = crossDocWindowKeys(wins, idCol)
    val perDoc = wins
      .join(dup.hint("shuffle_merge"), Seq("__wh"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__dp"), count_distinct(col("__wh")).as("__dd"))
    df.select(col(idCol), greatest(size(split(col(textCol), " ")) - (w - 1), lit(0)).cast("long").as("n_windows"))
      .join(perDoc.hint("shuffle_merge"), Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("__dp"), lit(0L)).as("dup_positions"),
        coalesce(col("__dd"), lit(0L)).as("dup_distinct"))
  }

  /** Remove every token covered by a cross-doc-duplicated `w`-token window
    * (overlapping spans merge naturally: a token survives iff NO
    * duplicated window covers it), rebuilding the text from the survivors
    * — the removal form of [[duplicatedWindowStats]], the operation that
    * measurably de-memorizes a training corpus without dropping whole
    * documents.
    *
    * Scale shape: the duplicated POSITIONS per doc come back as one
    * array-typed aggregation (bounded by doc length, not corpus size), and
    * the strip itself is a row-local projection — the coverage test is
    * `O(len · dup_spans)` per row with no further shuffle. Docs with no
    * duplicated windows pass through byte-identical (including docs
    * shorter than `w`).
    */
  def stripDuplicatedWindows(df: DataFrame, idCol: String, textCol: String, w: Int = 8): DataFrame = {
    require(w >= 2, "window must span at least 2 tokens")
    val wins = windowHashes(df, idCol, textCol, w)
    val dup = crossDocWindowKeys(wins, idCol)
    val dupPos = wins
      .join(dup.hint("shuffle_merge"), Seq("__wh"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_list(col("__pos")).as("__dups"))
    df.join(dupPos.hint("shuffle_merge"), Seq(idCol), "left")
      .withColumn("__toks", split(col(textCol), " "))
      .select(withTextReplaced(df, textCol,
        when(col("__dups").isNull, col(textCol))
          .otherwise(rebuildWithoutWindows(col("__toks"), col("__dups"), w))): _*)
  }

  /** Row-local rebuild shared by the strip operators: tokens whose index is
    * covered by any `w`-token window starting at a position in `dupsCol`
    * are dropped, the rest re-join on a single space. Both inputs must be
    * PRE-PROJECTED attribute columns: a raw split(...) expression
    * referenced inside a higher-order lambda re-evaluates once per element
    * (see [[shinglesOfTokens]]), an attribute reference does not. */
  private def rebuildWithoutWindows(toksCol: Column, dupsCol: Column, w: Int): Column = {
    val keptIdx = filter(sequence(lit(0), size(toksCol) - 1),
      i => !exists(dupsCol, p => i >= p && i < p + w))
    concat_ws(" ", transform(keptIdx, i => element_at(toksCol, i + 1)))
  }

  /** Persistable window index: the DISTINCT xxhash64 values of every
    * `w`-token window in the corpus — 8 bytes per distinct span, the
    * substring-granularity sibling of [[buildFingerprintIndex]]. Build it
    * from the curated corpus (generations via `sinks/IndexStore` compose),
    * and later batches or streams strip any span already present in
    * history via [[stripKnownWindows]] without ever re-scanning the old
    * texts. 64-bit hashing: a collision falsely strips one innocent span;
    * at 10^9 distinct windows the corpus-wide expected collision count is
    * ~0.03 — acceptable for a lossy-by-design cleaning pass (the exact
    * operators in this file stay on 16-byte hashes).
    */
  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local fingerprinting algorithm): over each document's
    * sequence of `k`-token window hashes, every run of `w` CONSECUTIVE
    * hashes contributes its minimum (rightmost position on hash ties),
    * and the fingerprint set is the distinct selected (position, hash)
    * pairs. The local-containment guarantee: any shared token run of
    * length ≥ w + k − 1 yields at least one SHARED fingerprint — what
    * [[buildWindowIndex]] buys by indexing EVERY window, winnowing buys
    * at expected density 2/(w+1), the sublinear index for substring-dedup
    * at 100 TB (the index shrinks ~w/2-fold; detection granularity
    * coarsens from w to w+k−1 tokens, the published trade).
    *
    * The window hash is the engine-portable 60-bit md5
    * ([[Sampling.keyHash]]'s arithmetic) of the space-joined k-gram, NOT
    * xxhash64 — a fingerprint index is an EXCHANGE format (oracles,
    * other engines, cross-pipeline sharing) by design. Docs with fewer
    * than w hashes contribute their global minimum (the
    * at-least-one-fingerprint rule).
    *
    * Shape: one projection to the hash sequence, posexplode, ONE per-doc
    * ordered window (a (hash, −pos) struct-min over a w-row frame — the
    * rightmost-tie rule as plain struct ordering), distinct. Everything
    * is per-doc bounded; one shuffle on the doc key. Output:
    * (idCol, pos, wh).
    */
  /** CONTENT-DEFINED CHUNKING of a text column
    * ([[graft.functions.CdcKernel]] — boundaries wherever the rolling
    * window hash masks to zero, so chunking SELF-SYNCHRONIZES across
    * documents sharing long substrings regardless of differing
    * prefixes; the storage-dedup modality the fixed-window family
    * can't express). One fused kernel call + posexplode per row, the
    * chunk carried as its md5 so downstream grouping shuffles 32 hex
    * chars, not chunk text. Output: (idCol, chunk_idx 1-based, start
    * 1-based, len, chunk_md5). Empty/null texts contribute no chunks. */
  def cdcChunks(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 4, maskBits: Int = 6): DataFrame =
    df.select(col(idCol), col(textCol),
        graft.functions.CdcExpressions.cdcChunkSpans(
          coalesce(col(textCol), lit("")), window, maskBits).as("__sp"))
      .select(col(idCol), col(textCol),
        // sequence(0, -1) DESCENDS in Spark — empty span arrays must
        // short-circuit to an empty struct array (the speechSegments rule)
        posexplode(expr(
          """CASE WHEN size(__sp) = 0
            |THEN CAST(array() AS array<struct<start:bigint,len:bigint>>)
            |ELSE transform(sequence(0, size(__sp) div 2 - 1),
            |  i -> struct(__sp[CAST(2 * i AS INT)] AS start,
            |              __sp[CAST(2 * i + 1 AS INT)] AS len)) END""".stripMargin))
          .as(Seq("__i", "__c")))
      .select(col(idCol), (col("__i") + 1).cast("long").as("chunk_idx"),
        col("__c.start").as("start"), col("__c.len").as("len"),
        md5(expr(s"substring($textCol, CAST(__c.start AS INT), CAST(__c.len AS INT))"))
          .as("chunk_md5"))

  /** Cross-document duplicated-chunk table over [[cdcChunks]]: chunk
    * hashes appearing in 2+ documents, with the document and occurrence
    * counts — the "how much of this corpus is shared byte ranges"
    * readout. One keyed aggregation on the 32-char hash. */
  def cdcDuplicateChunks(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 4, maskBits: Int = 6): DataFrame =
    cdcChunks(df, idCol, textCol, window, maskBits)
      .groupBy(col("chunk_md5"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= 2)

  /** Distinct chunk-hash index over a corpus — the persistable side of
    * incremental CDC dedup ([[buildFingerprintIndex]]'s chunk-level
    * sibling): at 100 TB the historical corpus is chunked ONCE and only
    * new arrivals re-chunk. */
  def buildChunkIndex(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 4, maskBits: Int = 6): DataFrame =
    cdcChunks(df, idCol, textCol, window, maskBits)
      .select(col("chunk_md5")).distinct()

  /** CONTAINMENT audit of new documents against a chunk index: per new
    * doc, how many of its CDC chunks are already known, and the drop
    * decision `n_known · 10000 >= thresholdBp · n_chunks` (basis-point
    * threshold as an EXACT integer cross-multiplication — no float
    * ratio anywhere, so two engines agree on every drop). The
    * mostly-boilerplate / mostly-recycled arrival is the case chunk
    * containment catches that whole-document hashing misses. Scale
    * shape: one fused chunking pass + one chunk-keyed join against the
    * (corpus-sized, so never broadcast) index + one per-doc count
    * aggregation. */
  def cdcContainmentAudit(
      newDocs: DataFrame, idCol: String, textCol: String,
      knownChunks: DataFrame, thresholdBp: Int,
      window: Int = 4, maskBits: Int = 6): DataFrame = {
    // >= 1, not >= 0: at 0 the cross-multiplication `n_known·10⁴ >= 0`
    // holds for EVERY doc (zero known chunks included), silently turning
    // the audit into drop-everything (r15 ADVICE) — an always-drop knob
    // is a config bug, so reject it loudly
    require(thresholdBp >= 1 && thresholdBp <= 10000,
      s"thresholdBp is basis points in [1, 10000], got $thresholdBp " +
        "(0 would mark every document dropped)")
    cdcChunks(newDocs, idCol, textCol, window, maskBits)
      .join(knownChunks.select(col("chunk_md5")).distinct()
        .withColumn("__k", lit(1)).hint("shuffle_merge"), Seq("chunk_md5"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"), count(col("__k")).as("n_known"))
      .withColumn("is_dropped",
        col("n_known") * 10000L >= lit(thresholdBp.toLong) * col("n_chunks"))
  }

  def winnowingFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 4
  ): DataFrame = {
    require(k >= 2, "k-gram must span at least 2 tokens")
    require(w >= 2, "winnowing window must span at least 2 hashes")
    import org.apache.spark.sql.expressions.Window
    val portable = (g: Column) => conv(substring(md5(g), 1, 15), 16, 10).cast("long")
    val hashed = withComputeParallelism(df.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col(idCol), hashedWindows(col("__toks"), k, portable).as("__whs"))
      .select(col(idCol), size(col("__whs")).as("__m"),
        posexplode(col("__whs")).as(Seq("pos", "wh")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    hashed
      .withColumn("__mn", min(struct(col("wh"), (-col("pos")).as("np"))).over(win))
      .withColumn("__cnt", count(lit(1)).over(win))
      // full windows select; a short doc (m < w) selects its global min
      // via the pos-0 frame, which then spans the whole sequence
      .filter(col("__cnt") === w || (col("__m") < w && col("pos") === 0))
      .select(col(idCol), (-col("__mn.np")).as("pos"), col("__mn.wh").as("wh"))
      .distinct()
  }

  def buildWindowIndex(df: DataFrame, idCol: String, textCol: String, w: Int = 8): DataFrame = {
    require(w >= 2, "window must span at least 2 tokens")
    withComputeParallelism(df.select(col(idCol), col(textCol)))
      .select(split(col(textCol), " ").as("__toks"))
      .filter(size(col("__toks")) >= w)
      .select(explode(hashedWindows(col("__toks"), w, xxhash64(_))).as("wh"))
      .distinct()
  }

  /** STREAM-SAFE strip of every `w`-token span already present in a
    * [[buildWindowIndex]] history index — the substring-granularity
    * sibling of [[stripKnownLines]], and the strip-vs-history analog of
    * [[dropKnownFingerprints]]: newcomers lose the spans history already
    * has, instead of being dropped whole.
    *
    * The index hashes are collected ONCE into an executor-broadcast hash
    * set and probed per row — a pure projection, zero state, zero
    * shuffles, so the SAME call applies unchanged to a readStream frame.
    * The membership probe is a native Catalyst expression
    * ([[graft.functions.LongSetHitPositions]] — O(1) per window against
    * the broadcast set, inside the projection's codegen span); the window
    * derivation and the rebuild stay the codegen'd expressions shared
    * with [[stripDuplicatedWindows]].
    * `maxIndexWindows` fails loudly before an oversized index OOMs the
    * driver — a corpus-scale index belongs in the join-based
    * [[stripDuplicatedWindows]] shape instead (or strata of it).
    */
  def stripKnownWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      w: Int = 8,
      maxIndexWindows: Int = 5000000
  ): DataFrame =
    stripKnownWindows(df, idCol, textCol,
      collectWindowHashes(index, maxIndexWindows), w)

  /** The [[stripKnownWindows]] index set as a reusable broadcast — split
    * out (like `TextAnalysis.collectBenchGrams`) so a long-lived driver
    * builds ONE broadcast per index generation, reuses it across stream
    * compositions, and `.destroy()`s it when the index rotates; the
    * convenience overload above builds a fresh one per call, whose
    * lifetime is then the Spark session's. `maxIndexWindows` fails loudly
    * before an oversized index OOMs the driver. */
  def collectWindowHashes(
      index: DataFrame,
      maxIndexWindows: Int = 5000000
  ): org.apache.spark.broadcast.Broadcast[Set[Long]] = {
    val hashes = index.select(col("wh").cast("long")).distinct()
      .limit(maxIndexWindows + 1).collect().map(_.getLong(0))
    require(hashes.length <= maxIndexWindows,
      s"stripKnownWindows: index exceeds maxIndexWindows=$maxIndexWindows — " +
        "an index this large should be the join-based stripDuplicatedWindows shape, " +
        "not a driver-collected broadcast")
    index.sparkSession.sparkContext.broadcast(hashes.toSet)
  }

  /** [[stripKnownWindows]] over a pre-collected broadcast index set. */
  def stripKnownWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bc: org.apache.spark.broadcast.Broadcast[Set[Long]],
      w: Int
  ): DataFrame = {
    require(w >= 2, "window must span at least 2 tokens")
    // native expression, not a UDF: the hit scan runs inside the
    // projection's WholeStageCodegen span over ArrayData in place
    def hitPositions(whs: Column): Column =
      graft.functions.BroadcastSetExpressions.hitPositions(whs, bc)
    df.withColumn("__toks", split(col(textCol), " "))
      .withColumn("__whs",
        when(size(col("__toks")) >= w, hashedWindows(col("__toks"), w, xxhash64(_)))
          .otherwise(array().cast("array<long>")))
      .withColumn("__dups", hitPositions(col("__whs")))
      .select(withTextReplaced(df, textCol,
        when(size(col("__dups")) === 0, col(textCol))
          .otherwise(rebuildWithoutWindows(col("__toks"), col("__dups"), w))): _*)
  }
}
