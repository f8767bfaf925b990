package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-MODEL artifacts — the save/load hand-off between training
  * and deployment for all three subword families ([[Tokenizer]] BPE,
  * [[UnigramLm]], [[WordPiece]]): a trained vocabulary is a tiny ordered
  * table, and the portable artifact is just that table as parquet (the
  * same artifact a Spark job, a different cluster, or an offline scorer
  * reloads — no JVM serialization, no versioned binary format). Order is
  * carried EXPLICITLY (`iter` for merge lists, `rank` for piece tables):
  * merge lists are order-SENSITIVE (BPE/WordPiece apply merges in
  * training order) and parquet read order is not a contract, so every
  * loader re-sorts on the carried column. Round-trips are spec-pinned
  * token-for-token (`TokenizerModelSpec`): save → load → apply must
  * equal direct apply on all three families.
  */
object TokenizerModel {

  // ---------- BPE -------------------------------------------------------

  /** Persist a BPE merge list in training order. */
  def saveBpe(merges: Seq[(String, String)], spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("iter", "l_sym", "r_sym")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a BPE merge list, training order restored from `iter`.
    * Columns are selected BY NAME before collecting — an artifact written
    * with a different physical column order (older writer, external
    * producer) must still load (r15 VERDICT nit). */
  def loadBpe(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy(col("iter"))
      .select(col("l_sym"), col("r_sym"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  // ---------- unigram-LM -------------------------------------------------

  /** Persist trained unigram pieces with their (count desc, piece asc)
    * rank and quantized scores. */
  def saveUnigram(
      pieces: Seq[UnigramLm.UnigramPiece], spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    pieces.zipWithIndex.map { case (p, i) => (i + 1, p.piece, p.count, p.lp_micro) }
      .toDF("rank", "piece", "count", "lp_micro")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload unigram pieces in rank order (columns by name, as [[loadBpe]]). */
  def loadUnigram(spark: SparkSession, path: String): Seq[UnigramLm.UnigramPiece] =
    spark.read.parquet(path).orderBy(col("rank"))
      .select(col("piece"), col("count"), col("lp_micro"))
      .collect()
      .map(r => UnigramLm.UnigramPiece(r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq

  // ---------- WordPiece --------------------------------------------------

  /** Persist a WordPiece merge table (all WpMerge columns — the counts
    * and quantized scores document WHY each merge won, the audit a model
    * card wants). */
  def saveWordPiece(
      merges: Seq[WordPiece.WpMerge], spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    merges.toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a WordPiece merge table in training order. Columns selected
    * BY NAME, not position: the artifact schema came from `merges.toDF()`
    * (case-class field order), and a future `WpMerge` field reorder must
    * not silently mis-load previously-saved artifacts (r15 VERDICT). */
  def loadWordPiece(spark: SparkSession, path: String): Seq[WordPiece.WpMerge] =
    spark.read.parquet(path).orderBy(col("iter"))
      .select(col("iter"), col("l_sym"), col("r_sym"), col("merged"),
        col("pair_count"), col("l_count"), col("r_count"), col("score_e12"))
      .collect()
      .map(r => WordPiece.WpMerge(r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq

  /** The generic inspection surface: any saved model as a DataFrame. */
  def asTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
