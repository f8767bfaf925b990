package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Always go through these: they read a single table directory so Catalyst
  * sees a plain parquet relation — filters and projections push down to the
  * scan (`PushedFilters` / `ReadSchema`), and partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes`, which is exactly what we want at
  * 100 TB: never pre-materialize, never collect, let pruning happen.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in two vintages: TIMESTAMP(NANOS) parquet
    * (which Spark 4 only maps as a long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session build by
    * [[GraftSession]]) and plain micros TIMESTAMP. Normalize both to the
    * session-zone TimestampType every downstream query was written against:
    * nanos truncate with integer arithmetic (`DIV`, not `/` — ns since epoch
    * exceeds double's 53-bit mantissa); naive micros (read as TIMESTAMP_NTZ)
    * cast exactly under the UTC session zone.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
