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

  /** Near-dups of the STREAM against a persisted [[Dedup.buildLshIndex]] of
    * previously curated history — verified IN-STREAM, with zero stream
    * state. The streaming form of [[Dedup.nearDupAgainstIndex]]: the
    * arriving document is signatured per-row, its band hashes equi-joined
    * against the static index (candidate generation never scans old texts),
    * and — because history is STATIC — the exact-Jaccard verify join
    * against the old documents' shingles rides the same micro-batch as a
    * stream-static join, so unlike the in-stream pair path
    * ([[nearDupCandidates]], whose verification must wait for a batch
    * step) the emitted matches are already verified.
    *
    * Two deliberate deltas from the batch form, both forced by append-mode
    * statelessness (no aggregation allowed), both resolved by a
    * `.distinct()` on the drained output:
    *  - a pair matching in k bands emits k times (the batch form's
    *    candidate `.distinct()` is a stateful op);
    *  - the stream row's shingle array rides the band explosion (`bands`
    *    copies in the join shuffle) instead of being re-joined afterwards —
    *    a batch-side self-join would be a stream-stream join here.
    *
    * Output columns: (`id_a` = stream id, `id_b` = history id,
    * `inter_cnt`, `union_cnt`), same contract and threshold arithmetic as
    * [[Dedup.nearDupAgainstIndex]]. All joins SMJ-pinned: the index and the
    * old corpus are corpus-sized, and the exploded stream side is the
    * derived-size-estimate broadcast-OOM class this library pins against.
    */
  def nearDupsAgainstIndex(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      oldDocs: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      tauNum: Int = 1,
      tauDen: Int = 2
  ): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val shingled = stream
      .select(col(idCol).as("id_a"), split(col(textCol), " ").as("__toks"))
      .select(col("id_a"), Dedup.shinglesOfTokens(col("__toks"), shingleN).as("__sa"))
    val banded = Dedup.withMinHashColumns(shingled, col("__sa"), numHashes)
      .select(col("id_a"), col("__sa"),
        posexplode(array(Dedup.bandHashColumns(bands, numHashes / bands): _*))
          .as(Seq("band", "band_hash")))
    val oldShingled = oldDocs
      .select(col(idCol).as("id_b"), split(col(textCol), " ").as("__toks"))
      .select(col("id_b"), Dedup.shinglesOfTokens(col("__toks"), shingleN).as("__sb"))
    banded
      .join(index.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
        .hint("shuffle_merge"), Seq("band", "band_hash"))
      .join(oldShingled.hint("shuffle_merge"), Seq("id_b"))
      .withColumn("inter_cnt", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("union_cnt", size(col("__sa")) + size(col("__sb")) - col("inter_cnt"))
      .filter(col("inter_cnt") * tauDen >= col("union_cnt") * tauNum)
      .select("id_a", "id_b", "inter_cnt", "union_cnt")
  }
}
