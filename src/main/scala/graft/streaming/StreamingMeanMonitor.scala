package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming experiment monitor for a CONTINUOUS metric — the mean-test
  * sibling of [[StreamingSrmMonitor]]: where the SRM monitor carries
  * four longs of per-arm COUNT state, this carries the per-arm MOMENT
  * triple (n, Σx, Σx²) — still O(1) per shard FOREVER, no watermark —
  * and its drained readout feeds the two continuous-metric finishes the
  * batch side already owns:
  * [[graft.operators.Inference.welchFromMoments]] (the fixed-horizon
  * t readout, [[welchReadout]]) and
  * [[graft.operators.Experiment.msprtMeanReadout]] (the always-valid
  * sequential readout over per-epoch cuts — composition pinned in
  * `StreamingMeanMonitorSpec` exactly like the SRM→msprt composition).
  *
  * Contract: one row per UNIT with an INTEGRAL metric value (the
  * [[graft.operators.Experiment.permutationTest]] rule — long sums are
  * exact and order-free, which is what makes micro-batch boundaries
  * invisible and drain ≡ batch bit-for-bit). The cumulative Σx² must
  * fit a long: value² × lifetime-rows-per-shard < 2⁶³ — e.g. |value| ≤
  * ~3·10⁴ at a billion rows per shard; scale the metric's unit down
  * (cents → whole dollars) when the horizon calls for it. Arm assignment
  * is the same salted 60-bit grid as
  * [[graft.operators.Sampling.hashSplit]] via
  * [[StreamingSrmMonitor.keyHashLong]]; null keys take the LAST arm
  * (b), mirroring hashSplit's `otherwise` — dirty input must not
  * poison-pill a continuous monitor (q278 gates the drained Welch
  * readout against q261's from-scratch SQL oracle).
  */
object StreamingMeanMonitor {

  /** (shard, seq, userId, value) → cumulative per-shard snapshot
    * (shard, epoch, n_a, sum_a, sumsq_a, n_b, sum_b, sumsq_b), one row
    * per shard per micro-batch, epoch starting at 1. The fold is
    * sum-commutative over exact longs, so no sort and no per-task group
    * materialization; the seq column is the uniform streaming-leg shape
    * but unused. */
  def moments(
      ds: Dataset[(Int, Long, String, Long)],
      salt: String,
      pA: Double = 0.5
  ): Dataset[(Int, Long, Long, Long, Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    require(pA > 0.0 && pA < 1.0, s"pA must be in (0, 1), got $pA")
    val boundary = graft.operators.Sampling
      .splitBoundaries(Seq("a" -> pA, "b" -> (1.0 - pA))).head._2
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long, Long, Long),
        (Int, Long, Long, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, events,
            state: GroupState[(Long, Long, Long, Long, Long, Long, Long)]) =>
          var (epoch, na, sa, qa, nb, sb, qb) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, 0L, 0L))
          events.foreach { case (_, _, user, v) =>
            if (user != null && StreamingSrmMonitor.keyHashLong(user, salt) < boundary) {
              na += 1L; sa += v; qa += v * v
            } else {
              nb += 1L; sb += v; qb += v * v
            }
          }
          epoch += 1L
          state.update((epoch, na, sa, qa, nb, sb, qb))
          Iterator((shard, epoch, na, sa, qa, nb, sb, qb))
      }
  }

  /** The merged per-arm moment table from drained snapshots (columns
    * shard, epoch, n_a, sum_a, sumsq_a, n_b, sum_b, sumsq_b): max-epoch
    * row per shard (replay-safe), long sums across shards, reshaped to
    * the (arm, n, sx, sxx) frame the batch moment family consumes —
    * decimal casts make it a [[graft.operators.Inference.momentPartial]]
    * twin (exact integers either way). */
  def momentsTable(snapshots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .agg(coalesce(sum(col("n_a")), lit(0L)).as("n_a"),
        coalesce(sum(col("sum_a")), lit(0L)).as("s_a"),
        coalesce(sum(col("sumsq_a")), lit(0L)).as("q_a"),
        coalesce(sum(col("n_b")), lit(0L)).as("n_b"),
        coalesce(sum(col("sum_b")), lit(0L)).as("s_b"),
        coalesce(sum(col("sumsq_b")), lit(0L)).as("q_b"))
    latest.select(explode(array(
        struct(lit("a").as("arm"), col("n_a").as("n"),
          col("s_a").cast("decimal(38,8)").as("sx"),
          col("q_a").cast("decimal(38,8)").as("sxx")),
        struct(lit("b").as("arm"), col("n_b").as("n"),
          col("s_b").cast("decimal(38,8)").as("sx"),
          col("q_b").cast("decimal(38,8)").as("sxx")))).as("r"))
      .select(col("r.arm").as("arm"), col("r.n").as("n"),
        col("r.sx").as("sx"), col("r.sxx").as("sxx"))
  }

  /** The fixed-horizon Welch readout from drained snapshots — the SHARED
    * [[graft.operators.Inference.welchFromMoments]] closed form over
    * [[momentsTable]], so drain ≡ batch bit for bit. */
  def welchReadout(snapshots: DataFrame): DataFrame =
    graft.operators.Inference.welchFromMoments(momentsTable(snapshots), "arm", "a", "b")
}
