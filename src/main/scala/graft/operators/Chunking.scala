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
