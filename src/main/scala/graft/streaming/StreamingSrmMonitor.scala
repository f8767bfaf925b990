package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming experiment-health / SRM monitor — the at-ingest sibling of
  * [[graft.operators.Experiment.abReadout]]: every live experiment needs
  * the sample-ratio-mismatch guard CONTINUOUSLY (an arm-selective
  * ingestion loss silently biases every downstream metric long before a
  * nightly batch readout runs), and the readout's whole input is four
  * longs — exactly the bounded keyed state the
  * [[StreamingHeavyHitters]] pattern (per-shard fold + epoch snapshot)
  * carries.
  *
  * Per shard the state is (epoch, n_a, n_b, conv_a, conv_b): O(1)
  * FOREVER, no watermark needed. Each micro-batch folds its rows in
  * (seq, user) order (replayed topics rebuild byte-identical state) and
  * re-emits the shard's cumulative snapshot under an incrementing epoch;
  * a reader takes the max-epoch row per shard and SUMS across shards —
  * long counts are associative, so the merged snapshot equals the batch
  * aggregation over the same users and [[readout]] is bit-identical to
  * [[graft.operators.Experiment.abReadout]] (spec-pinned across
  * micro-batches, including the SRM flag firing mid-stream on an
  * injected arm-selective loss).
  *
  * Contract: one row per USER (the abReadout input shape — dedupe
  * events upstream); arm assignment is the same salted 60-bit hash grid
  * as [[graft.operators.Sampling.hashSplit]], computed driver-free per
  * row via [[keyHashLong]] (spec-pinned equal to the Column form).
  */
object StreamingSrmMonitor {

  /** Scala twin of [[graft.operators.Sampling.keyHash]]: first 15 hex
    * chars of md5(salt ++ key) parsed base-16 — the same 60-bit integer
    * the Column form yields, so stream- and batch-assigned arms agree
    * exactly. */
  def keyHashLong(key: String, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + key).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** (shard, seq, userId, converted) → cumulative per-shard snapshot
    * (shard, epoch, n_a, n_b, conv_a, conv_b), one row per shard per
    * micro-batch, epoch starting at 1. Counts are CUMULATIVE (monotone),
    * so no empty-wipe marker is needed — every epoch emits exactly one
    * row. */
  def counts(
      ds: Dataset[(Int, Long, String, Boolean)],
      salt: String,
      pA: Double = 0.5
  ): Dataset[(Int, Long, Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    require(pA > 0.0 && pA < 1.0, s"pA must be in (0, 1), got $pA")
    val boundary = graft.operators.Sampling
      .splitBoundaries(Seq("a" -> pA, "b" -> (1.0 - pA))).head._2
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long),
        (Int, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, events,
            state: GroupState[(Long, Long, Long, Long, Long)]) =>
          var (epoch, na, nb, ca, cb) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L))
          // (seq, user) sort: the fold result is count-commutative, but
          // the total order keeps the replay contract uniform with the
          // other streaming legs (and deterministic under duplicate seqs)
          events.toSeq.sortBy(t => (t._2, t._3)).foreach {
            case (_, _, user, converted) =>
              require(user != null,
                s"null user in shard $shard — hashSplit sends null keys to " +
                  "the last arm in batch; filter or map them upstream")
              if (keyHashLong(user, salt) < boundary) {
                na += 1L; if (converted) ca += 1L
              } else {
                nb += 1L; if (converted) cb += 1L
              }
          }
          epoch += 1L
          state.update((epoch, na, nb, ca, cb))
          Iterator((shard, epoch, na, nb, ca, cb))
      }
  }

  /** The current experiment-health row from drained snapshots (columns
    * shard, epoch, n_a, n_b, conv_a, conv_b): max-epoch row per shard,
    * long-summed across shards, then the SHARED
    * [[graft.operators.Experiment.readoutFromCounts]] closed form —
    * structurally the same expressions as the batch readout, so drain ≡
    * batch bit for bit. */
  def readout(snapshots: DataFrame, pA: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = snapshots
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .agg(coalesce(sum(col("n_a")), lit(0L)).as("n_a"),
        coalesce(sum(col("n_b")), lit(0L)).as("n_b"),
        coalesce(sum(col("conv_a")), lit(0L)).as("conv_a"),
        coalesce(sum(col("conv_b")), lit(0L)).as("conv_b"))
    graft.operators.Experiment.readoutFromCounts(latest, pA)
  }
}
