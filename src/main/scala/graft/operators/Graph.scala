package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation. PageRank-style authority
  * is the classic source-quality prior (a domain linked by many reputable
  * domains is itself reputable — the Common-Crawl-curation companion
  * signal to the per-document gates in [[TextAnalysis]]).
  */
object Graph {

  /** Fixed-iteration damped PageRank over an edge list.
    *
    * Semantics: `rank₀ = 1/N` over the node set (distinct sources ∪
    * destinations); each iteration
    * `rank' = (1-d)/N + d · Σ_incoming rank(src)/outdeg(src)`.
    * Parallel edges count multiply (an edge list from per-document link
    * extraction WANTS link multiplicity to weigh); dangling nodes (no
    * out-edges) keep receiving but stop forwarding — their mass is
    * dropped, the simplified form most link-spam scoring uses, chosen
    * here because it keeps every term a pure join-aggregate (the
    * redistribute-uniformly variant needs an extra global sum per
    * iteration; add it when rank mass conservation actually matters).
    *
    * Scale shape: node init and each iteration are keyed shuffles only —
    * ranks⋈outdeg and edges⋈shares are SMJ-pinned (both sides are
    * graph-shaped; nothing corpus-sized is ever broadcast), the
    * per-destination sum is a map-side-combined aggregation, and N rides
    * the plan as a broadcast 1-row count. Lineage grows one join-agg layer
    * per iteration — fine for the fixed small iteration counts authority
    * scoring uses (the iterations cap is a loud reminder, not a tuning
    * knob; checkpoint between iterations if you genuinely need more).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double = 0.85
  ): DataFrame = {
    require(iterations >= 0 && iterations <= 64,
      s"iterations=$iterations out of [0,64] — deep fixed-point chains should checkpoint")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    val e = edges.select(
      col(srcCol).cast("string").as("__src"), col(dstCol).cast("string").as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val nRow = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val init = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
    (1 to iterations).foldLeft(init) { case (ranks, _) =>
      val shares = ranks.join(outdeg.hint("shuffle_merge"), ranks("node") === outdeg("__src"))
        .select(col("__src"), (col("rank") / col("__deg")).as("__share"))
      val contribs = e.join(shares.hint("shuffle_merge"), "__src")
        .groupBy(col("__dst")).agg(sum(col("__share")).as("__contrib"))
      nodes.join(contribs.hint("shuffle_merge"), nodes("node") === contribs("__dst"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__contrib"), lit(0.0))).as("rank"))
    }
  }
}
