package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed TABLE layout — the co-location primitive for repeated fact-fact
  * joins: both tables hash-partitioned into the same number of buckets on
  * the join key at WRITE time, so every later join (or aggregation) on that
  * key reads matching buckets side by side with NO exchange. At 100 TB the
  * economics are decisive: a nightly pipeline that joins events to orders
  * on every run pays one bucketed write once instead of re-shuffling both
  * fact tables every night — the single biggest shuffle any recurring
  * pipeline has.
  *
  * Mechanics: `bucketBy` is TABLE metadata (bucket function + count ride
  * the catalog entry), so this writes through `saveAsTable` rather than a
  * path write; readers get the co-location for free via `spark.table`.
  * `sortBy` additionally orders rows within each bucket file so a
  * sort-merge join skips its sort stages and min/max row-group pruning
  * works within buckets (the same effect [[ClusteredWrite]] achieves for
  * path-based range layouts). Both joined tables must use the SAME bucket
  * count; Spark joins mismatched counts through a regular shuffle.
  *
  * (SURVEY §2.2 layout surface; the reference has no storage layout
  * control at all — its sink is a Kafka topic.)
  */
object BucketedWrite {

  /** Write `df` as a bucketed (optionally bucket-sorted) parquet table.
    * `sortCols` defaults to `bucketCols` — sorted buckets make the
    * bucket-to-bucket join plan sort-free as well as shuffle-free. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil
  ): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(bucketCols.nonEmpty, "at least one bucket column is required")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }
}
