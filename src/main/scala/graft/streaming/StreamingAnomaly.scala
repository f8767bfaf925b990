package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Anomaly scoring AT INGEST — the streaming sibling of
  * [[graft.operators.TimeSeries.rollingZScore]]: per-key Welford state
  * (count, mean, M2) carried across micro-batches, each event scored
  * against the statistics of all PRIOR events of its key (the expanding-
  * window baseline; the batch operator's lookback window instead bounds
  * the frame — both are leakage-free: the tested value never joins its
  * own baseline).
  *
  * State is THREE DOUBLES per key forever — the O(1)-state form of the
  * sketch family's contract; no watermark needed. Within a micro-batch
  * events fold in `seq` order (pass an event-time-derived sequence);
  * ACROSS batches order follows arrival, the standard at-ingest
  * semantics (replay a key's history in order to rebuild state).
  */
object StreamingAnomaly {

  /** (key, seq, value) → (key, seq, value, zscore, is_anomaly).
    * z = (v − mean_prior)/sd_prior (population sd), rounded to 4, null
    * until a key has ≥ 2 prior values with nonzero variance. */
  def cumulativeZScore(
      ds: Dataset[(Long, Long, Double)],
      threshold: Double
  ): Dataset[(Long, Long, Double, Option[Double], Boolean)] = {
    import ds.sparkSession.implicits._
    require(threshold > 0.0, s"threshold must be positive, got $threshold")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Double), (Long, Long, Double, Option[Double], Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, events, state: GroupState[(Long, Double, Double)]) =>
          var (n, mean, m2) = state.getOption.getOrElse((0L, 0.0, 0.0))
          val out = events.toSeq.sortBy(_._2).map { case (_, seq, v) =>
            val z =
              if (n >= 2 && m2 > 0.0) {
                val sd = math.sqrt(m2 / n)
                Some(BigDecimal((v - mean) / sd)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
              } else None
            n += 1
            val d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            (key, seq, v, z, z.exists(x => math.abs(x) > threshold))
          }
          state.update((n, mean, m2))
          out.iterator
      }
  }

  /** Streaming EWMA — [[graft.operators.TimeSeries.ewmaByKey]]'s fold
    * carried across micro-batches: state is ONE double per key forever
    * (plus the started flag), each batch's events fold in `seq` order,
    * so an in-order drain reproduces the batch operator value for value
    * (the [[graft.operators.TimeSeries]] scaled-floor quantization,
    * applied at emit — state stays raw so quantization never compounds).
    * Cross-batch ordering follows arrival, the at-ingest contract
    * [[cumulativeZScore]] documents.
    */
  def streamingEwma(
      ds: Dataset[(Long, Long, Double)],
      alpha: Double
  ): Dataset[(Long, Long, Double, Double)] = {
    import ds.sparkSession.implicits._
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val oneMinus = 1.0 - alpha
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Boolean, Double), (Long, Long, Double, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, events, state: GroupState[(Boolean, Double)]) =>
          var (started, e) = state.getOption.getOrElse((false, 0.0))
          val out = events.toSeq.sortBy(_._2).map { case (_, seq, v) =>
            e = if (!started) v else alpha * v + oneMinus * e
            started = true
            (key, seq, v, graft.functions.Quantize.scaledFloorDouble(e, 6))
          }
          state.update((started, e))
          out.iterator
      }
  }
}
