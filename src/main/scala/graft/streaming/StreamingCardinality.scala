package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cardinality contract — the `distinct_*` kinds that
  * [[StreamingExpectations]] deliberately defers to "the sketch family"
  * (exact distinct state is corpus-shaped; a landing zone cannot hold
  * the seen-set of a 100 TB stream). Per shard the state is a KMV
  * sketch: the k smallest DISTINCT 60-bit element hashes — O(k) FOREVER,
  * no watermark, order-free (min-k of a multiset ignores both duplicate
  * deliveries within the state's own fold and arrival order), so
  * micro-batch boundaries cannot change the cumulative state.
  *
  * Drain ≡ batch by SHARED finishing expressions: the report merges the
  * max-epoch shard sketches exactly the way
  * [[graft.operators.Sketches.kmvSketch]]'s aggregator merges partials
  * (distinct-merge, keep k smallest — lossless by the min-k-of-unions
  * property) and estimates through the batch
  * [[graft.operators.Sketches.kmvDistinct]] column itself, so the
  * drained estimate is BIT-IDENTICAL to the batch sketch estimate over
  * the same rows (`StreamingCardinalitySpec` pins it; q275 gates the
  * drained report against a SQL oracle that re-derives the estimator
  * from the same md5 hash literals).
  *
  * The report schema extends
  * [[graft.operators.Profiler.expectationSchema]] with an `estimated`
  * flag: unlike min/max/null-fraction, the distinct observation is an
  * ESTIMATE whenever the merged sketch filled (relative error
  * ~1/sqrt(k)); when it never filled the sketch IS the distinct hash
  * set and the observation is exact (`estimated = false`).
  */
object StreamingCardinality {

  /** (shard, seq, elemHash) → cumulative per-shard KMV snapshot
    * (shard, epoch, kmv), one row per shard per micro-batch, epoch
    * starting at 1; `kmv` is the ascending array of the ≤ k smallest
    * distinct hashes the shard has ever seen. `elemHash` must be
    * [[graft.operators.Sampling.keyHash]] of the audited element (the
    * hashing stays in the codegen'd Column domain; the typed fold only
    * maintains the bounded buffer). The seq column is part of the
    * uniform streaming-leg input shape but unused: the fold is
    * order-free. */
  def kmvSketches(
      ds: Dataset[(Int, Long, Long)],
      k: Int
  ): Dataset[(Int, Long, Seq[Long])] = {
    require(k > 1, "k must be > 1 (the estimator divides by the k-th smallest)")
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Vector[Long]), (Int, Long, Seq[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, events, state: GroupState[(Long, Vector[Long])]) =>
          var (epoch, kmv) = state.getOption.getOrElse((0L, Vector.empty[Long]))
          events.foreach { case (_, _, h) =>
            // the batch aggregator's own reduce: reject >= k-th once full,
            // insert-or-skip at the binary-search position otherwise
            if (!(kmv.length >= k && h >= kmv.last)) {
              kmv.search(h)(Ordering.Long) match {
                case scala.collection.Searching.Found(_) => ()
                case scala.collection.Searching.InsertionPoint(i) =>
                  val inserted = (kmv.take(i) :+ h) ++ kmv.drop(i)
                  kmv = if (inserted.length > k) inserted.take(k) else inserted
              }
            }
          }
          epoch += 1L
          state.update((epoch, kmv))
          Iterator((shard, epoch, kmv))
      }
  }

  /** The current distinct-cardinality contract report from drained
    * snapshots (columns shard, epoch, kmv): one max-epoch row per shard
    * (row_number — duplicate at-least-once deliveries collapse), shard
    * sketches distinct-merged to the k smallest (the batch aggregator's
    * merge), estimated through the batch [[Sketches.kmvDistinct]]
    * expression on the 1e-6 grid. `rules` is (kind, bound) with kind in
    * {distinct_ge, distinct_le}; output (col_name, kind, bound,
    * observed, pass, estimated) — the
    * [[graft.operators.Profiler.expectationReport]] schema plus the
    * estimate-mode flag; fails CLOSED (pass = false, observed null)
    * when no snapshot has arrived. */
  def distinctReport(
      snapshots: DataFrame,
      colName: String,
      rules: Seq[(String, Double)],
      k: Int
  ): DataFrame = {
    require(rules.nonEmpty, "at least one expectation is required")
    val kinds = Set("distinct_ge", "distinct_le")
    rules.foreach { case (kd, _) =>
      require(kinds.contains(kd), s"unknown streaming cardinality kind '$kd'")
    }
    import org.apache.spark.sql.expressions.Window
    val spark = snapshots.sparkSession
    val merged = snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      // shards hold bounded sketches: flatten ≤ shards·k longs, then the
      // aggregator's merge = distinct + ascending + keep k smallest
      .agg(flatten(collect_list(col("kmv"))).as("all"))
      .select(slice(array_sort(array_distinct(col("all"))), 1, k).as("kmv"))
      .select(
        graft.functions.Quantize.scaledFloor(
          graft.operators.Sketches.kmvDistinct(col("kmv"), k), 6).as("est"),
        (size(col("kmv")) === k).as("estimated"),
        size(col("kmv")).as("sz"))
      .collect().headOption
    val observed: Option[Double] = merged.collect {
      case r if r.getInt(2) > 0 => r.getDouble(0)
    }
    val estimated: Boolean = merged.exists(_.getBoolean(1))
    val out = rules.map { case (kd, bound) =>
      Row(colName, kd, bound, observed.map(Double.box).orNull,
        graft.operators.Profiler.expectationPass(kd, observed, bound),
        estimated)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), reportSchema)
  }

  /** [[graft.operators.Profiler.expectationSchema]] + the estimate-mode
    * flag. */
  val reportSchema: org.apache.spark.sql.types.StructType =
    graft.operators.Profiler.expectationSchema
      .add("estimated", org.apache.spark.sql.types.BooleanType, nullable = false)
}
