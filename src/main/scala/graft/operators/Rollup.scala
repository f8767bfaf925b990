package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable per-key partial aggregates — the incremental "metrics store"
  * pattern: each ingest run writes its OWN shard's (key → cnt/sum/min/max)
  * partial table (one map-side-combined aggregation over just that shard),
  * and any later reader merges partials with a key-count-sized aggregation
  * instead of rescanning corpora. The same economics as the sketch family
  * ([[Sketches]]) but for the exact algebraic aggregates; persist partials
  * as [[graft.sinks.IndexStore]] generations and nightly corpus stats
  * become O(Σ|partials|), not O(corpus).
  *
  * Exactness contract: the value column must be integral (long) — integer
  * sums are associative/commutative bit-exactly, so merge(partials) equals
  * the from-scratch aggregate REGARDLESS of shard boundaries, engines, or
  * merge order (the q139 gate). Float values would make the sum
  * order-dependent; route them through a decimal cast upstream.
  *
  * Stream-safe: `partial` is one bounded keyed aggregation
  * (associative + commutative), so the same call rides a readStream in
  * update mode, maintaining live per-key stats at ingest.
  */
object Rollup {

  private val PartialCols = Seq("cnt", "vsum", "vmin", "vmax")

  /** One shard's partial aggregate: (keys..., cnt, vsum, vmin, vmax). */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    val v = col(valueCol).cast("long")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(v).as("vsum"), min(v).as("vmin"), max(v).as("vmax"))
  }

  /** Merge any number of partial tables (all [[partial]] schemas over the
    * same keys) into the aggregate of their union: one keyed aggregation
    * over key-count-sized inputs. Associative — merge(merge(a, b), c) ==
    * merge(a, b, c) bit for bit. */
  def merge(partials: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "at least one partial table is required")
    partials.foreach { p =>
      require(PartialCols.forall(p.columns.contains),
        s"not a partial-aggregate table: ${p.columns.mkString(", ")}")
    }
    partials.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("vsum")).as("vsum"),
        min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
  }

  /** Read-side finalization: derived stats (here the mean) computed from
    * the merged partials — ONE division per key row, exactly what a
    * from-scratch avg() would produce on the same engine. */
  def finalize(merged: DataFrame, scale: Int = 4): DataFrame =
    merged.withColumn("vavg", round(col("vsum").cast("double") / col("cnt").cast("double"), scale))
}
