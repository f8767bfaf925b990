package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A probe's running neighbor list entry. */
final case class AnnNeighbor(nbr_id: Long, sim: Double)

/** Keyed state: update generation + current top-k (descending sim). */
final case class AnnTopKState(gen: Long, top: Seq[AnnNeighbor])

/** One emitted row: probe `probe_id`'s rank-`rnk` neighbor as of state
  * generation `gen` (consumers take the max-gen snapshot per probe). */
final case class AnnTopKUpdate(probe_id: Long, gen: Long, rnk: Int, nbr_id: Long, cos_sim: Double)

/** Continuous top-k cosine retrieval over a VECTOR STREAM: a fixed probe
  * set (the "watch list" — queries, dedup anchors, safety probes) is scored
  * against every arriving embedding, and per-probe keyed state maintains
  * the exact running top-k. This is the streaming form of
  * [[Similarity.bruteForceTopK]] — same arithmetic, incremental state —
  * so after draining a static corpus the state equals the batch answer
  * (diff-tested in `StreamingSimilaritySpec`).
  *
  * Scale shape: scoring is stateless and codegen'd (probes ride as literal
  * arrays through the native dot expression — no UDF, no join); the only
  * shuffle keys on probe_id, and state is O(probes · k). A replayed or
  * duplicated vector row cannot corrupt the result: merging dedups on
  * nbr_id keeping the best sim, making updates idempotent.
  */
object StreamingSimilarity {

  /** @param stream streaming (idCol: long, vecCol: numeric array) frame
    * @param probes  (probe id, probe vector) watch list — state is
    *                O(probes · k); self-matches (nbr_id == probe_id) are
    *                excluded like the batch op
    * @return Update-mode stream of [[AnnTopKUpdate]] rows (raw sims — round
    *         at the edge if presenting)
    */
  def annTopK(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      probes: Seq[(Long, Array[Double])],
      k: Int
  ): Dataset[AnnTopKUpdate] = {
    require(probes.nonEmpty, "at least one probe is required")
    require(k > 0, "k must be positive")
    val spark = stream.sparkSession
    import spark.implicits._

    // probes as a LITERAL array-of-structs: explode + native dot keeps the
    // whole scoring stage inside whole-stage codegen
    val probeLit = typedLit(probes.map { case (pid, v) => (pid, v.toSeq) })
    val scored = stream
      .select(col(idCol).cast("long").as("nbr_id"), Similarity.asDouble(col(vecCol)).as("__v"))
      .withColumn("__vn", Similarity.norm(col("__v")))
      .select(explode(probeLit).as("__p"), col("nbr_id"), col("__v"), col("__vn"))
      .withColumn("probe_id", col("__p._1"))
      .filter(col("nbr_id") =!= col("probe_id"))
      // same expression shape as the batch op: dot / (probe norm · vec norm)
      .withColumn("__sim",
        Similarity.fastDot(col("__p._2"), col("__v")) /
          (Similarity.norm(col("__p._2")) * col("__vn")))
      .select(col("probe_id"), col("nbr_id"), col("__sim").as("sim"))
      .as[(Long, Long, Double)]

    scored
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnnTopKState, AnnTopKUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (pid, rows, state) =>
        val cur = state.getOption.getOrElse(AnnTopKState(0L, Nil))
        val merged = (cur.top ++ rows.map(r => AnnNeighbor(r._2, r._3)))
          .groupBy(_.nbr_id).valuesIterator.map(_.maxBy(_.sim)).toSeq
          .sortBy(n => (-n.sim, n.nbr_id))
          .take(k)
        val next = AnnTopKState(cur.gen + 1, merged)
        state.update(next)
        merged.iterator.zipWithIndex.map { case (n, i) =>
          AnnTopKUpdate(pid, next.gen, i + 1, n.nbr_id, n.sim)
        }
      }
  }
}
