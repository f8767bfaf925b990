package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** A near-duplicate candidate surfaced at ingest: the arriving `id_b`
  * collided with already-seen `id_a` in LSH bucket (`band`, `bucket`).
  * (id_a, id_b) is emitted min-first; the same pair may surface from
  * several bands — `.distinct()` downstream, like the batch op does. */
final case class StreamingDedupCandidate(id_a: Long, id_b: Long, band: Int, bucket: Long)

/** MinHash-LSH near-duplicate detection ON THE STREAM: every arriving
  * document is signatured per-row (no aggregation — append-mode safe),
  * banded exactly like the batch op, and checked against per-bucket keyed
  * state of previously-seen ids; collisions emit candidate pairs the moment
  * the second document arrives. The streaming form of
  * [[Dedup.lshCandidatePairs]]: draining a static corpus emits exactly the
  * batch candidate set (diff-tested in `StreamingDedupSpec`), because the
  * signature + band-hash arithmetic is shared, bit for bit.
  *
  * Scale shape: signature and banding are stateless per-row expressions;
  * the only shuffle keys on (band, bucket); state per bucket is an id list
  * bounded by `maxBucket` (the hot-bucket guard — an all-identical-boilerplate
  * bucket otherwise grows O(corpus); beyond the cap new ids are dropped
  * from that bucket with the same "hot shingles are noise" rationale as the
  * batch `maxDocFreq` knob). Replayed documents are idempotent: an id
  * already in the bucket emits nothing new.
  *
  * Exact-Jaccard verification of candidates stays a BATCH step downstream
  * (it needs both documents' shingle sets; carrying every shingle set in
  * state would make state corpus-sized) — the streaming op's contract is
  * candidate RECALL equal to the batch op's.
  */
object StreamingDedup {

  def nearDupCandidates(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucket: Int = 1024
  ): Dataset[StreamingDedupCandidate] = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    require(maxBucket > 1, "maxBucket must be at least 2")
    val rowsPerBand = numHashes / bands
    val spark = stream.sparkSession
    import spark.implicits._

    // same prelude discipline as the batch operators: bind tokens before
    // the shingle lambda, bind shingles before the signature lambdas
    val shingled = stream
      .select(col(idCol).cast("long").as("__id"), split(col(textCol), " ").as("__toks"))
      .select(col("__id"), Dedup.shinglesOfTokens(col("__toks"), shingleN).as("__shingles"))
    val banded = Dedup.withMinHashColumns(shingled, col("__shingles"), numHashes)
      .select(col("__id"),
        posexplode(array(Dedup.bandHashColumns(bands, rowsPerBand): _*)).as(Seq("__band", "__bh")))
      .select(col("__id"), col("__band"), col("__bh"))
      .as[(Long, Int, Long)]

    banded
      .groupByKey { case (_, band, bh) => (band, bh) }
      .flatMapGroupsWithState[Seq[Long], StreamingDedupCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { case ((band, bh), rows, state) =>
        var seen = state.getOption.getOrElse(Vector.empty[Long])
        // membership probes against a Set (the Vector alone makes a hot
        // bucket O(maxBucket^2) per batch); the Vector stays authoritative
        // for emission order and is what persists in state
        var seenSet = seen.toSet
        val out = Seq.newBuilder[StreamingDedupCandidate]
        // deterministic intra-batch order so batch boundaries cannot
        // reorder emissions
        rows.map(_._1).toSeq.distinct.sorted.foreach { id =>
          if (!seenSet.contains(id) && seen.size < maxBucket) {
            seen.foreach { prior =>
              out += StreamingDedupCandidate(math.min(prior, id), math.max(prior, id), band, bh)
            }
            seen = seen :+ id
            seenSet = seenSet + id
          }
        }
        state.update(seen)
        out.result().iterator
      }
  }
}
