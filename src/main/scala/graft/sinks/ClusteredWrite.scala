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
}
