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
  * FOREVER, no watermark needed. The fold is count-commutative, so
  * micro-batch boundaries and within-batch order cannot change the
  * cumulative state; each micro-batch re-emits the shard's cumulative
  * snapshot under an incrementing epoch. A reader takes the max-epoch
  * row per shard and SUMS across shards — long counts are associative,
  * so the merged snapshot equals the batch aggregation over the same
  * users and [[readout]] is bit-identical to
  * [[graft.operators.Experiment.abReadout]]
  * (`StreamingSrmMonitorSpec` pins the 3-micro-batch drain against the
  * batch readout, replay idempotence, and the SRM flag firing
  * mid-stream on an injected arm-selective loss; q260 gates the drained
  * readout against q230's SQL oracle).
  *
  * Contract: one row per USER (the abReadout input shape — dedupe
  * events upstream); arm assignment is the same salted 60-bit hash grid
  * as [[graft.operators.Sampling.hashSplit]], computed driver-free per
  * row via [[keyHashLong]] (spec-pinned equal to the Column form on
  * ASCII and non-ASCII keys). Null users take the LAST arm (b), exactly
  * as hashSplit's `otherwise` routes null keys in batch — a malformed
  * row must not poison-pill a continuous health monitor into an
  * offset-replay crash loop, and drain ≡ batch must hold even on dirty
  * input.
  */
object StreamingSrmMonitor {

  // one digest per executor thread: MessageDigest is stateful (not
  // shareable) but reset()-reusable — per-row getInstance allocation on
  // the hot ingest path is pure garbage-collector pressure
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Scala twin of [[graft.operators.Sampling.keyHash]]: first 15 hex
    * chars of md5(salt ++ key) parsed base-16 — the same 60-bit integer
    * the Column form yields, so stream- and batch-assigned arms agree
    * exactly. */
  def keyHashLong(key: String, salt: String): Long = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest((salt + key).getBytes("UTF-8"))
    // 15 hex chars = the top 7.5 bytes of the digest, parsed directly —
    // no intermediate 32-char hex string per row
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >>> 4)
  }

  /** Debug/spec helper: the full 32-char lowercase hex of md5(s) using
    * the same thread-local digest (lets the spec cross-check
    * [[keyHashLong]] against `Long.parseLong(hex.take(15), 16)`). */
  private[streaming] def md5Hex(s: String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) & 0xf0) >>> 4)
      out(2 * i + 1) = hexDigits(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** (shard, seq, userId, converted) → cumulative per-shard snapshot
    * (shard, epoch, n_a, n_b, conv_a, conv_b), one row per shard per
    * micro-batch, epoch starting at 1. Counts are CUMULATIVE (monotone),
    * so no empty-wipe marker is needed — every epoch emits exactly one
    * row. The seq column is part of the uniform streaming-leg input
    * shape but unused here: the fold is count-commutative, so no sort
    * (and no per-task materialization of the group) is needed. */
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
          events.foreach { case (_, _, user, converted) =>
            // null key → last arm, mirroring hashSplit's `otherwise`
            // (keyHash(null) is null, null < boundary is null → falsy)
            if (user != null && keyHashLong(user, salt) < boundary) {
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
