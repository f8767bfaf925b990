package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming data-contract monitor — the at-ingest sibling of
  * [[graft.operators.Profiler.expectationReport]] for the kinds whose
  * sufficient statistics are O(1): `min_ge`, `max_le`, `null_frac_le`
  * over one numeric column. A landing zone that admits files
  * continuously should flag a contract breach (a unit change driving
  * values out of range, an upstream null storm) AT INGEST, not at the
  * nightly batch audit — and the whole live-side state is four scalars
  * per shard. (`distinct_*` kinds are deliberately absent: exact
  * distinct state is corpus-shaped; the KMV/HLL sketch family is the
  * streaming-cardinality path.)
  *
  * Per shard the state is (epoch, n, nulls, min, max): O(1) FOREVER, no
  * watermark needed. min/max/count folds are order-free and exact (no
  * floating-point summation is involved), so micro-batch boundaries
  * cannot change the cumulative state; each micro-batch re-emits the
  * shard's snapshot under an incrementing epoch. [[report]] takes one
  * row per shard (row_number — duplicate at-least-once deliveries of
  * the max-epoch snapshot collapse), merges (sum/sum/min/max), and
  * evaluates the rules with the batch operator's exact quantization —
  * so the drained report is BIT-IDENTICAL to
  * `expectationReport(sameRows, rules)` restricted to these kinds
  * (`StreamingExpectationsSpec` pins drain ≡ batch and the fail-closed
  * all-null contract; q267 gates the drained report against a SQL
  * oracle).
  */
object StreamingExpectations {

  /** (shard, seq, value) → cumulative per-shard snapshot (shard, epoch,
    * n, nulls, min, max), one row per shard per micro-batch, epoch
    * starting at 1. `value` is Option[Double]: None rows count into n
    * and nulls, exactly as batch `count(when(isNull))` does. min/max
    * are null until the shard sees a non-null value. The seq column is
    * part of the uniform streaming-leg input shape but unused: the fold
    * is order-free. */
  def stats(
      ds: Dataset[(Int, Long, Option[Double])]
  ): Dataset[(Int, Long, Long, Long, Option[Double], Option[Double])] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Option[Double], Option[Double]),
        (Int, Long, Long, Long, Option[Double], Option[Double])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, events,
            state: GroupState[(Long, Long, Long, Option[Double], Option[Double])]) =>
          var (epoch, n, nulls, mn, mx) =
            state.getOption.getOrElse((0L, 0L, 0L,
              None: Option[Double], None: Option[Double]))
          events.foreach { case (_, _, v) =>
            n += 1L
            v match {
              case Some(x) =>
                // Double.compare, NOT math.min/max: Spark's min/max
                // aggregates order NaN as LARGEST and -0.0 below 0.0
                // (probed empirically: min{NaN,5} = 5, max{NaN,5} = NaN,
                // min{-0.0,0.0} = -0.0), while math.min(NaN, x) = NaN —
                // the fold must mirror the batch ordering or one NaN
                // value breaks the drain≡batch bit-identity on min
                mn = Some(mn.fold(x)(cur =>
                  if (java.lang.Double.compare(x, cur) < 0) x else cur))
                mx = Some(mx.fold(x)(cur =>
                  if (java.lang.Double.compare(x, cur) > 0) x else cur))
              case None => nulls += 1L
            }
          }
          epoch += 1L
          state.update((epoch, n, nulls, mn, mx))
          Iterator((shard, epoch, n, nulls, mn, mx))
      }
  }

  /** The current contract report from drained snapshots (columns shard,
    * epoch, n, nulls, min, max): one max-epoch row per shard
    * (row_number — replay-safe), scalars merged across shards, then
    * each rule evaluated on the batch operator's 1e-6 grid. `rules` is
    * (kind, bound) with kind in {min_ge, max_le, null_frac_le}; output
    * (col_name, kind, bound, observed, pass) — the
    * [[graft.operators.Profiler.expectationReport]] schema, with range
    * rules failing CLOSED when no non-null value has arrived. */
  def report(
      snapshots: DataFrame,
      colName: String,
      rules: Seq[(String, Double)]
  ): DataFrame = {
    require(rules.nonEmpty, "at least one expectation is required")
    val kinds = Set("min_ge", "max_le", "null_frac_le")
    rules.foreach { case (k, _) =>
      require(kinds.contains(k), s"unknown streaming expectation kind '$k'")
    }
    import org.apache.spark.sql.expressions.Window
    val spark = snapshots.sparkSession
    val merged = snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("nulls")), lit(0L)).as("nulls"),
        min(col("min")).as("min"), max(col("max")).as("max"))
      .collect().head // 1 row by construction — the scalar class
    def opt(i: Int): Option[Double] =
      if (merged.isNullAt(i)) None else Some(merged.getDouble(i))
    val n = merged.getLong(0); val nulls = merged.getLong(1)
    // scaledFloorDouble is bit-identical to the batch Column form by its
    // own contract (saturating Long round trip, NaN → 0.0); pass rule
    // and output schema are the batch operator's own
    val q6 = (x: Double) => graft.functions.Quantize.scaledFloorDouble(x, 6)
    val out = rules.map { case (k, bound) =>
      val observed = k match {
        case "min_ge" => opt(2).map(q6)
        case "max_le" => opt(3).map(q6)
        case _ => if (n == 0L) None
          else Some(q6(nulls.toDouble / n.toDouble))
      }
      Row(colName, k, bound, observed.map(Double.box).orNull,
        graft.operators.Profiler.expectationPass(k, observed, bound))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1),
      graft.operators.Profiler.expectationSchema)
  }
}
