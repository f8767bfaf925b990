package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — slicing long documents into bounded, optionally
  * overlapping token windows, the preparation step between a raw corpus and
  * fixed-context training sequences (or RAG passages). All pure codegen'd
  * expressions: the chunk starts are a `sequence`, the slices are
  * `transform` + `slice` over a BOUND token array (the same
  * evaluate-once-per-row discipline as [[Dedup.shinglesOfTokens]]), and the
  * per-document fan-out is one `posexplode` — no UDFs, no shuffle beyond
  * what the caller does with the result.
  *
  * Chunk geometry: windows of `chunkTokens` starting every
  * `chunkTokens - overlap` tokens. The last window is allowed to be short
  * (it keeps the document's tail) but never empty; documents shorter than
  * one window come through as a single chunk. Each row carries
  * (`chunk_idx`, `n_chunks`, `chunk_tokens`, chunk text), so downstream
  * packing can weigh or reassemble.
  *
  * (The reference has no chunking — training-data-pipeline surface; see
  * SURVEY.md §2.2.)
  */
object Chunking {

  /** (idCol, chunk_idx, n_chunks, chunk_tokens, chunk) — one row per window.
    * `stride = chunkTokens - overlap` must be positive. */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens, s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val toks = df
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // starts: 0, stride, 2*stride, ... — a window is only opened if it
    // contributes tokens BEYOND the previous window's coverage (s + overlap
    // < n); otherwise a one-window document would grow a redundant tail
    // chunk fully contained in chunk 0. The tail window may be short but
    // always carries new tokens. NULL text must yield NO rows (posexplode
    // of a null array), not a phantom empty chunk — `greatest` skips nulls
    // in Spark, so null-ness is propagated explicitly.
    val lastStart = when(col("__n").isNull, lit(null))
      .otherwise(greatest(lit(0), floor((col("__n") - overlap - 1) / stride)) * stride)
    val starts = sequence(lit(0), lastStart, lit(stride))
    val chunks = transform(starts, s => slice(col("__toks"), s + 1, lit(chunkTokens)))
    toks
      .withColumn("__chunks", chunks)
      .select(col(idCol), col("__chunks"),
        posexplode(col("__chunks")).as(Seq("chunk_idx", "__chunk")))
      .select(
        col(idCol),
        col("chunk_idx"),
        size(col("__chunks")).as("n_chunks"),
        size(col("__chunk")).as("chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk"))
  }

  /** Sequence packing — assign every chunk to a fixed-token-budget training
    * pack: `pack_id = floor(prefix_tokens / capacity)` where `prefix_tokens`
    * is the running token total over the global (docCol, idxCol) order,
    * exclusive of the current chunk. Linear token-boundary binning: packs
    * are contiguous in corpus order, every pack except the last holds at
    * least `capacity` tokens' worth of boundary, and a chunk straddling a
    * boundary stays in the earlier pack (so a pack can run over by at most
    * one chunk — the standard approximation when sample-packing a corpus
    * whose chunks are much smaller than the context window).
    *
    * The naive formulation — one `Window.orderBy` over the whole corpus —
    * funnels 100 TB through a SINGLE task (a global window has one
    * partition); this is the distributed two-phase prefix sum instead:
    *
    *  1. rows get an ORDER-ALIGNED bucket (contiguous `docCol` ranges, so
    *     bucket boundaries respect the global order — a hash bucket would
    *     not); the range width comes from `max(docCol)`, folded into the
    *     plan as a broadcast scalar, no driver collect;
    *  2. a per-bucket window (parallel across buckets) computes the
    *     within-bucket running total;
    *  3. per-bucket TOTALS — `buckets` rows, bounded by the parameter —
    *     prefix-sum in a single tiny window and broadcast-join back as each
    *     bucket's starting offset.
    *
    * Output: the input columns plus `pack_id`. Deterministic for any
    * `buckets` value (the split points only change where the work happens,
    * never the prefix sums).
    */
  def packSequences(
      chunks: DataFrame,
      docCol: String,
      idxCol: String,
      tokenCol: String,
      capacity: Int,
      buckets: Int = 256
  ): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(buckets > 0, "buckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val maxDoc = chunks.agg(max(col(docCol)).cast("long").as("__maxdoc"))
    val bucketed = chunks
      .crossJoin(broadcast(maxDoc))
      .withColumn("__bkt",
        floor(col(docCol).cast("long") / (floor(col("__maxdoc") / buckets) + 1)))
      .drop("__maxdoc")
    val inBucket = Window.partitionBy(col("__bkt"))
      .orderBy(col(docCol), col(idxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = bucketed
      .withColumn("__cum", sum(col(tokenCol).cast("long")).over(inBucket))
    // UNPARTITIONED-WINDOW: bounded by the `buckets` knob — the
    // two-phase prefix-sum offset frame (see the scaladoc above on the
    // avoided global-window form)
    val acrossBuckets = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy(col("__bkt"))
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(acrossBuckets), lit(0L)))
      .select(col("__bkt"), col("__off"))
    withCum
      .join(broadcast(offsets), Seq("__bkt"))
      .withColumn("pack_id",
        floor((col("__off") + col("__cum") - col(tokenCol)) / capacity).cast("long"))
      .select(chunks.columns.map(col) :+ col("pack_id"): _*)
  }

  /** Deterministic span corruption — the T5/BART-style denoising prep that
    * turns a document into an (input, target) pair: token spans are masked
    * out of the input (each whole run replaced by ONE `maskToken`) and the
    * masked spans, in order and `sepToken`-delimited, become the target.
    * Reassembly is lossless: the k-th mask in the input corresponds to the
    * k-th `sepToken`-run of the target (spec-pinned).
    *
    * Mask selection is a pure function of (doc id, position, salt): a
    * position STARTS a span iff its 60-bit [[Sampling.keyHash]] clears
    * `threshold(startRate)`, and a span covers `spanTokens` positions, so
    * overlapping spans merge into longer runs and the nominal masked
    * fraction is `1 - (1 - startRate)^spanTokens ≈ startRate·spanTokens`.
    * Deterministic across runs, layouts, and engines — re-running the prep
    * regenerates byte-identical pairs, which is what makes checkpointed
    * multi-epoch training data reproducible.
    *
    * Shape at 100 TB: one codegen'd per-row projection — the per-position
    * state is an INDEX-AWARE `transform` whose window test inlines ≤ 2L
    * hash compares, so the whole pass is O(n·L) hash tests per row. The
    * costly anti-pattern is spelled out because the first version hit it:
    * `element_at(derivedArray, p)` INSIDE a HOF lambda re-evaluates the
    * entire derived array per element once CollapseProject inlines the
    * single-use projection — O(n²·L) per row, measured 34 s for 5k docs at
    * sf0.1 where this form takes a fraction of a second. Never randomly
    * index a derived array from a lambda; either re-derive the element
    * from scalars (as here) or keep consumers array-at-a-time
    * (filter/transform chains). Zero shuffles, zero state: stream-safe
    * (spec-pinned).
    *
    * `sepToken`/`maskToken` must be whitespace-free (they ride the token
    * stream). Output: (idCol, input, target, n_masked).
    */
  def spanCorruption(
      df: DataFrame,
      idCol: String,
      textCol: String,
      startRate: Double,
      spanTokens: Int = 3,
      salt: String = "span",
      maskToken: String = "<MASK>",
      sepToken: String = "<SEP>"
  ): DataFrame = {
    require(startRate > 0.0 && startRate < 1.0, s"startRate must be in (0, 1), got $startRate")
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    require(!maskToken.contains(" ") && !sepToken.contains(" "),
      "mask/sep tokens must be whitespace-free")
    val thr = Sampling.threshold(startRate)
    // Since r15 the per-token mask derivation is the fused native
    // SpanCorruptExpr kernel (one keyHash per POSITION instead of the
    // HOF's ~2·spanTokens interpreted md5 Columns per token — q121 went
    // ~6 s → ~1 s at sf0.1); spec-pinned token-for-token identical to
    // the HOF fold below, which survives as the parity reference. Null
    // text degrades to the HOF's exact row ("", "", null).
    val fused = graft.functions.SpanExpressions.spanCorrupt(
      col(idCol).cast("string"), col(textCol), salt, thr, spanTokens, maskToken, sepToken)
    val corrupted = when(col(textCol).isNull,
        struct(lit("").as("input"), lit("").as("target"),
          lit(null).cast("int").as("n_masked")))
      .otherwise(fused)
    df.select(col(idCol), corrupted.as("__c"))
      .select(col(idCol),
        col("__c.input").as("input"),
        col("__c.target").as("target"),
        col("__c.n_masked").as("n_masked"))
  }

  /** The pre-r15 HOF formulation of [[spanCorruption]] — retained as the
    * independent reference the parity spec pins the fused kernel
    * against. */
  private[operators] def spanCorruptionHof(
      df: DataFrame,
      idCol: String,
      textCol: String,
      startRate: Double,
      spanTokens: Int = 3,
      salt: String = "span",
      maskToken: String = "<MASK>",
      sepToken: String = "<SEP>"
  ): DataFrame = {
    val thr = Sampling.threshold(startRate)
    // pos1 is the 1-based position; positions < 1 test false (And does not
    // short-circuit, but hashing "id#0" is merely wasted, never an error)
    def startTest(pos1: Column) =
      (pos1 >= 1) && (Sampling.keyHash(
        concat(col(idCol).cast("string"), lit("#"), pos1.cast("string")), salt) < thr)
    def maskedAt(pos1: Column) =
      (0 until spanTokens).map(j => startTest(pos1 - j)).reduce(_ || _)
    // one struct per token: (token, masked, run-start) — all from scalars
    val marked = transform(split(col(textCol), " "), (t, i) => {
      val p = i + 1
      val m = maskedAt(p)
      struct(t.as("tok"), m.as("m"), (m && !maskedAt(p - 1)).as("rs"))
    })
    // consumers below reference __marked several times, which keeps the
    // projection from collapsing into the lambdas (non-cheap, multi-use)
    val mk = col("__marked")
    val inputArr = transform(
      filter(mk, m => !m.getField("m") || m.getField("rs")),
      m => when(m.getField("m"), lit(maskToken)).otherwise(m.getField("tok")))
    val targetArr = transform(
      filter(mk, m => m.getField("m")),
      m => when(m.getField("rs"), concat(lit(sepToken + " "), m.getField("tok")))
        .otherwise(m.getField("tok")))
    // the first masked run always opens with "<SEP> " — strip it by fixed
    // offset (substring, not regex: sep tokens stay regex-agnostic)
    val joinedTarget = concat_ws(" ", targetArr)
    df.select(col(idCol), col(textCol))
      .withColumn("__marked", marked)
      .select(
        col(idCol),
        concat_ws(" ", inputArr).as("input"),
        when(length(joinedTarget) === 0, lit(""))
          .otherwise(substring(joinedTarget, sepToken.length + 2, Int.MaxValue)).as("target"),
        size(filter(mk, m => m.getField("m"))).as("n_masked"))
  }

  /** Reassembly check aid: concatenating non-overlapping chunks in
    * chunk_idx order reconstructs the tokenized document. */
  def reassemble(chunked: DataFrame, idCol: String): DataFrame =
    chunked
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          s => s.getField("chunk"))).as("rebuilt"))
}
