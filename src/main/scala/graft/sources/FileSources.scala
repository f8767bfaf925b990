package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-format readers — the engine's scan surface over object stores and
  * local filesystems. The reference reads line-oriented UTF-8 text from S3
  * (tamer `s3/src/main/scala/tamer/s3/S3Setup.scala:133`:
  * `utf8Decode >>> splitLines`); [[lines]] is that pipeline, and the other
  * formats come free with Spark's vectorized readers. All return lazy scans:
  * filters/projections push down, `maxPartitionBytes` governs split sizing.
  */
object FileSources {

  /** Line-oriented UTF-8 text: one row per line, column `value` — the
    * reference's default object pipeline. */
  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true, inferSchema: Boolean = false): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema).csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Columnar ORC scan — the other columnar lake format (Spark's native
    * vectorized ORC reader: predicate pushdown and column pruning apply
    * exactly as for parquet). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Whole-file binary scan (path, modificationTime, length, content) — the
    * substrate for [[graft.operators.Multimodal]] media columns. */
  def binaryFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
}
