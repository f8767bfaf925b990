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

  /** Fixed-iteration HITS (Kleinberg 1999): hubs point at good
    * authorities, authorities are pointed at by good hubs — the
    * directional complement to [[pageRank]] for link-graph curation
    * (a domain can be a worthless authority but a valuable directory
    * hub, and vice versa).
    *
    * Semantics: `hub₀ = auth₀ = 1/N`; each iteration
    * `auth'(v) = Σ_{u→v} hub(u)`, L1-normalized, then
    * `hub'(u) = Σ_{u→v} auth'(v)`, L1-normalized. L1 (sum)
    * normalization instead of the textbook L2 keeps every step a plain
    * sum-and-divide — same fixpoint direction, no sqrt, and the whole
    * iteration is reproducible in any SQL engine (the q136 oracle
    * unrolls it). Parallel edges count multiply, matching [[pageRank]].
    * Nodes with no in-edges (out-edges) hold authority (hub) 0.
    *
    * Scale shape: per iteration two keyed SMJ-pinned join+aggregations
    * (edges ⋈ hubs by src, edges ⋈ auths by dst) and two 1-row L1 sums
    * broadcast back — scores are never collected, nothing corpus-shaped
    * is broadcast. Unlike [[pageRank]]'s linear chain, each HITS
    * iteration references the fresh `auth` frame TWICE (once to derive
    * hubs, once in the output), so a lazy fold would DOUBLE the plan per
    * iteration (measured: 58 BNLJ nodes at 2 iterations — the PlanAudit
    * class); the iteration result is therefore materialized with
    * `localCheckpoint` (the GraphX discipline), keeping plan size and
    * lineage linear in iterations at the cost of caching one
    * node-scores-sized frame per step.
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int
  ): DataFrame = {
    require(iterations >= 0 && iterations <= 64,
      s"iterations=$iterations out of [0,64] — deep fixed-point chains should checkpoint")
    val e = edges.select(
      col(srcCol).cast("string").as("__src"), col(dstCol).cast("string").as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val init = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("__n")).as("hub"), (lit(1.0) / col("__n")).as("auth"))
    (1 to iterations).foldLeft(init) { case (scores, _) =>
      val authRaw = e.join(
          scores.select(col("node").as("__src"), col("hub")).hint("shuffle_merge"), "__src")
        .groupBy(col("__dst")).agg(sum(col("hub")).as("__a"))
      val authSum = authRaw.agg(sum(col("__a")).as("__as"))
      // referenced twice below — materialize so the plan stays linear in
      // iterations (see the scaladoc)
      val auths = nodes
        .join(authRaw.hint("shuffle_merge"), nodes("node") === authRaw("__dst"), "left")
        .crossJoin(broadcast(authSum))
        .select(col("node"), (coalesce(col("__a"), lit(0.0)) / col("__as")).as("auth"))
        .localCheckpoint(true)
      val hubRaw = e.join(
          auths.select(col("node").as("__dst"), col("auth")).hint("shuffle_merge"), "__dst")
        .groupBy(col("__src")).agg(sum(col("auth")).as("__h"))
      val hubSum = hubRaw.agg(sum(col("__h")).as("__hs"))
      nodes
        .join(hubRaw.hint("shuffle_merge"), nodes("node") === hubRaw("__src"), "left")
        .crossJoin(broadcast(hubSum))
        .join(auths.hint("shuffle_merge"), "node")
        .select(col("node"), (coalesce(col("__h"), lit(0.0)) / col("__hs")).as("hub"), col("auth"))
        .localCheckpoint(true)
    }
  }
}
