package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Layout-optimized parquet output: range-cluster rows on the columns the
  * downstream queries filter by, so parquet min/max statistics actually
  * prune at read time. At 100 TB the difference between a randomly-laid-out
  * table and a range-clustered one is whether a selective filter reads the
  * whole table or a handful of files: every file (and, via the
  * within-partition sort, every row group) covers a DISJOINT range of the
  * cluster key, so a range/point predicate overlaps O(1) of them.
  *
  * Mechanics: `repartitionByRange` (sampled range partitioner — one
  * shuffle) gives file-level disjointness; `sortWithinPartitions` gives
  * row-group-level monotonicity inside each file (parquet stores min/max
  * per row group, and the vectorized reader skips non-overlapping groups
  * when `spark.sql.parquet.filterPushdown` is on, its default).
  * `maxRecordsPerFile` bounds file size; extra files split from one range
  * partition stay disjoint because rows are already sorted when split.
  */
object ClusteredWrite {

  def parquet(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      numFiles: Int,
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    require(clusterCols.nonEmpty, "at least one cluster column is required")
    require(numFiles > 0, "numFiles must be positive")
    val cols = clusterCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Morton (z-order) interleave of `n` pre-bucketized integer columns,
    * `bits` bits each: output bit `i·n + j` = bit `i` of column `j`. Pure
    * integer bit arithmetic (shift/and/or), so any engine reproduces it
    * exactly; inputs MUST already lie in `[0, 2^bits)` (see [[zBucket]])
    * and `n · bits` must fit a signed long.
    *
    * Why interleave instead of sorting (a, b): lexicographic order gives
    * file-level locality in `a` only — every file spans the FULL `b`
    * domain, so min/max pruning on `b` reads the whole table. The z-curve
    * alternates the dimensions' bits, so a run of consecutive z-values is
    * a small rectangle in (a, b) space: every file covers a bounded range
    * of EACH dimension and predicates on any clustered column prune
    * (Delta/Iceberg's OPTIMIZE ZORDER rationale).
    */
  def zValue(buckets: Seq[org.apache.spark.sql.Column], bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val n = buckets.length
    require(n > 0, "at least one column is required")
    require(bits > 0 && n * bits <= 63, s"n*bits = ${n * bits} must fit a signed long")
    val parts = for {
      i <- 0 until bits
      (c, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    parts.reduce(_.bitwiseOR(_))
  }

  /** Linear min/max bucketization of a column into `[0, 2^bits)` — all
    * BIGINT arithmetic (`(x − min) · 2^bits DIV (max − min + 1)`), so the
    * mapping is engine-exact. Linear scaling is skew-sensitive (an
    * outlier squeezes the bulk into few buckets); for heavy-tailed keys
    * bucketize by rank upstream instead. */
  def zBucket(c: org.apache.spark.sql.Column, minV: Long, maxV: Long, bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(maxV >= minV, s"empty domain [$minV, $maxV]")
    // Column `/` is DOUBLE division (the §8 shiftright lesson), so divide
    // only after subtracting the remainder: (num − num % den) / den is an
    // integer-valued quotient, exact as long as num stays ≤ 2^53.
    // checked positive FIRST: maxV - minV + 1 overflows Long for
    // near-full-range domains, and the overflowed negative width would
    // pass a bare <= check vacuously
    require(maxV - minV + 1L > 0L && maxV - minV + 1L <= (1L << (53 - bits)),
      s"domain [$minV, $maxV] too wide for exact bucketization at bits=$bits")
    val num = (c.cast("long") - lit(minV)) * lit(1L << bits)
    val den = lit(maxV - minV + 1L)
    ((num - pmod(num, den)) / den).cast("long")
  }

  /** Z-order-clustered parquet: bucketize each cluster column by its
    * min/max (one tiny driver-side 1-row aggregate — the scalar-by-
    * construction class), interleave with [[zValue]], then range-partition
    * and sort on the z-value exactly as [[parquet]] does on a single key.
    * Every file/row group covers a disjoint z-range = a bounded rectangle
    * in ALL cluster dimensions, so parquet min/max stats prune multi-
    * dimensional predicates — the layout a 100 TB fact table wants when
    * two or more independent filter columns matter.
    */
  def parquetZOrdered(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      numFiles: Int,
      bits: Int = 12,
      maxRecordsPerFile: Long = 0L
  ): Unit = {
    import org.apache.spark.sql.functions._
    require(clusterCols.nonEmpty, "at least one cluster column is required")
    require(numFiles > 0, "numFiles must be positive")
    val aggs = clusterCols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = clusterCols.zipWithIndex.map { case (c, j) =>
      // an empty frame or an all-null cluster column yields null min/max;
      // name the offender instead of an opaque NPE from Row.getLong
      require(!mm.isNullAt(2 * j) && !mm.isNullAt(2 * j + 1),
        s"cluster column '$c' has no non-null values (empty input or all-null column)")
      zBucket(col(c), mm.getLong(2 * j), mm.getLong(2 * j + 1), bits)
    }
    df.withColumn("__z", zValue(buckets, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
