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

  /** Personalized PageRank: [[pageRank]] with the teleport vector
    * concentrated on a literal SEED set instead of uniform —
    * `rank' = (1−d)·tele(v) + d·Σ contribs` with `tele = 1/|seeds|` on
    * seeds, 0 elsewhere; `rank₀ = tele`. Ranks measure proximity TO the
    * seeds, which is the trusted-domain expansion primitive (TrustRank):
    * seed a handful of known-good (or known-bad) domains and the scores
    * rank everything else by link-distance-weighted reachability.
    *
    * Seeds are a parameter-bounded literal list by contract (a
    * watchlist, not a corpus), so the teleport term compiles to a pure
    * `isin` expression — no join, nothing broadcast beyond pageRank's
    * own shapes (same SMJ-pinned iteration, dangling mass dropped the
    * same way).
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: Seq[String],
      iterations: Int,
      damping: Double = 0.85
  ): DataFrame = {
    require(seeds.nonEmpty && seeds.distinct.length == seeds.length,
      "seeds must be non-empty and distinct")
    require(seeds.length <= 10000,
      s"${seeds.length} seeds — a seed set is a watchlist, not a corpus; " +
        "beyond ~10k compile the teleport as a broadcast join instead")
    require(iterations >= 0 && iterations <= 64,
      s"iterations=$iterations out of [0,64] — deep fixed-point chains should checkpoint")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    val e = edges.select(
      col(srcCol).cast("string").as("__src"), col(dstCol).cast("string").as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val tele = when(col("node").isin(seeds: _*), lit(1.0 / seeds.length)).otherwise(lit(0.0))
    val init = nodes.select(col("node"), tele.as("rank"))
    (1 to iterations).foldLeft(init) { case (ranks, _) =>
      val shares = ranks.join(outdeg.hint("shuffle_merge"), ranks("node") === outdeg("__src"))
        .select(col("__src"), (col("rank") / col("__deg")).as("__share"))
      val contribs = e.join(shares.hint("shuffle_merge"), "__src")
        .groupBy(col("__dst")).agg(sum(col("__share")).as("__contrib"))
      nodes.join(contribs.hint("shuffle_merge"), nodes("node") === contribs("__dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * tele +
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

  /** Per-node triangle count + local clustering coefficient over an
    * undirected simple graph (self-loops dropped, parallel/reverse edges
    * collapsed) — the link-farm / community-density signal: organic link
    * neighborhoods close triangles, spam rings and bipartite scaffolds
    * don't.
    *
    * Algorithm is the degree-ordered node-iterator ("compact-forward",
    * Latapy 2008): every undirected edge is DIRECTED from its lower
    * endpoint to its higher endpoint under the total order (degree, id),
    * wedges are generated only at each edge's lower-ranked endpoint, and a
    * wedge (v, w) closes iff v→w is itself a directed edge — so each
    * triangle is found exactly once, and the wedge count is bounded by
    * Σ outdeg², which degree-ordering keeps O(m^1.5) on any graph
    * (a raw hub of degree d would otherwise fan out d² wedges; under the
    * ordering a hub's out-degree is capped by the count of HIGHER-degree
    * neighbors). That bound is the whole 100 TB story: three keyed SMJ
    * self-joins on graph-shaped frames, no broadcast, no window.
    *
    * Returns (node, degree, tri_cnt, clustering) where clustering =
    * 2·tri / (deg·(deg−1)) (0.0 for deg < 2), rounded to 6.
    */
  def triangles(
      edges: DataFrame,
      srcCol: String,
      dstCol: String
  ): DataFrame = {
    val raw = edges.select(
      col(srcCol).cast("long").as("__s"), col(dstCol).cast("long").as("__d"))
      .filter(col("__s") =!= col("__d"))
    val und = raw.select(
      least(col("__s"), col("__d")).as("a"), greatest(col("__s"), col("__d")).as("b"))
      .distinct()
      // und feeds deg AND the directed-edge join; deg is referenced three
      // times, dir four — materialize both once (edge-/node-sized frames)
      // or every reference re-plans the full upstream scan
      .localCheckpoint(true)
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    // direct each edge low→high under (degree, id): u precedes v iff
    // deg(u) < deg(v) or (deg(u) = deg(v) and u < v)
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("degree").as("__da")).hint("shuffle_merge"), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("__db")).hint("shuffle_merge"), Seq("b"))
    val precedes = (col("__da") < col("__db")) ||
      (col("__da") === col("__db") && col("a") < col("b"))
    val dir = withDeg.select(
      when(precedes, col("a")).otherwise(col("b")).as("u"),
      when(precedes, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint(true)
    // wedges at u: ordered pairs of u's out-neighbors; closure probe
    // against the directed edge set finds each triangle once
    val wedges = dir.as("e1").hint("shuffle_merge")
      .join(dir.as("e2").hint("shuffle_merge"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("tu"), col("e1.v").as("tv"), col("e2.v").as("tw"))
    // tie-broken order makes (tv, tw) direction ambiguous relative to the
    // (degree, id) order — probe both orientations of the closing edge
    val closing = dir.select(col("u").as("tv"), col("v").as("tw"))
      .union(dir.select(col("v").as("tv"), col("u").as("tw")))
    val tris = wedges.join(closing.hint("shuffle_merge"), Seq("tv", "tw"), "left_semi")
    val perNode = tris.select(explode(array(col("tu"), col("tv"), col("tw"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
    deg.join(perNode.hint("shuffle_merge"), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
        when(col("degree") >= 2,
          graft.functions.Quantize.scaledFloor(lit(2.0) * coalesce(col("tri_cnt"), lit(0L)) /
            (col("degree") * (col("degree") - lit(1L))), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Bounded degree peeling toward the k-core: `iterations` rounds of
    * "drop every node with degree < k, restrict edges to survivors,
    * recompute" over the undirected simple graph — the dense-subgraph
    * extractor (true k-core is the fixpoint; a FIXED round count keeps the
    * operator deterministic-by-contract and the oracle expressible, and in
    * practice web-graph peeling converges in a handful of rounds — pass
    * the fixpoint budget you can afford, exactly like [[pageRank]]'s
    * iteration cap). Returns the surviving (node, degree) with degrees on
    * the FINAL restricted edge set.
    *
    * Each round is one keyed degree count + two semi-joins (all
    * SMJ-shaped, graph-sized); lineage is truncated per round the way
    * [[hits]] does.
    */
  def degreePeel(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      iterations: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iterations >= 1 && iterations <= 64,
      s"iterations=$iterations out of [1,64] — deep fixed-point chains should checkpoint")
    val raw = edges.select(
      col(srcCol).cast("long").as("__s"), col(dstCol).cast("long").as("__d"))
      .filter(col("__s") =!= col("__d"))
    val und0 = raw.select(
      least(col("__s"), col("__d")).as("a"), greatest(col("__s"), col("__d")).as("b"))
      .distinct()
      .localCheckpoint(true)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node")).union(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val finalEdges = (1 to iterations).foldLeft(und0) { case (e, _) =>
      val keep = degrees(e).filter(col("degree") >= k)
      e.join(keep.select(col("node").as("a")).hint("shuffle_merge"), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")).hint("shuffle_merge"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
    }
    degrees(finalEdges).filter(col("degree") >= k)
  }

  /** Composed link-authority score per DOMAIN — the way production
    * link-spam curation actually uses the graph signals TOGETHER rather
    * than in isolation:
    *
    *  - `rank`: [[personalizedPageRank]] proximity to the trusted seed
    *    sources (TrustRank) over the DIRECTED source→domain link graph;
    *  - `clustering`: [[triangles]] clustering coefficient over the
    *    domain CO-CITATION graph (two domains adjacent iff some source
    *    links both — the one-mode projection where genuine communities
    *    triangle and isolated spam islands don't);
    *  - `in_core`: [[degreePeel]] k-core membership on the same
    *    co-citation graph (the dense-subgraph signal).
    *
    * Composite: `score = scaledFloor(rank · (0.5 + 0.5·clustering) ·
    * (in_core ? 1 : 0.5), 9)` — seed-proximity modulated up by community
    * embedding and halved outside the core; the StreamingCuration
    * qualityModel shape, but over link topology instead of text.
    *
    * The co-citation projection is per-source QUADRATIC BY CONTRACT
    * (the q168 blocking trade): distinct (src, dst) first, then in-src
    * pairs — bounded by max out-degree². The hub cap is ENFORCED
    * IN-PLAN (round-12, closing the one contract that lived in prose):
    * `maxOutDegree` runs [[Skew.capPerKey]] over (source, domain-id)
    * BEFORE the self-join, keeping each source's `maxOutDegree`
    * smallest 60-bit domain ids — a deterministic, oracle-reproducible
    * sample of a hub's links, O(k) state per source at every stage. A
    * directory page co-citing 10⁶ domains now contributes at most
    * maxOutDegree² pairs instead of 5·10¹¹; its co-citation signal is
    * noise anyway, which is why a cap (not an error) is the right
    * guard. The PPR leg keeps the UNCAPPED edges — it is linear in
    * edges, and seed proximity through a hub is real signal.
    * Domains cross into the long-keyed triangle/peel legs via
    * the engine's 60-bit md5 id ([[Sampling.keyHash]]'s exact
    * arithmetic, oracle-reproducible; collisions at domain-count scale
    * are the accepted 2⁻⁶⁰ class). Everything corpus-shaped stays
    * SMJ-keyed; nothing beyond pageRank's own scalars broadcasts.
    *
    * Output: (domain, rank, clustering, in_core, score), one row per
    * distinct link-target domain.
    */
  def linkAuthority(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: Seq[String],
      pprIterations: Int,
      coreK: Int,
      coreIterations: Int,
      damping: Double = 0.85,
      maxOutDegree: Int = 1000
  ): DataFrame = {
    require(maxOutDegree > 0, s"maxOutDegree must be positive, got $maxOutDegree")
    val e = edges.select(col(srcCol).cast("string").as("__src"),
      col(dstCol).cast("string").as("__dst")).distinct()
      // referenced by the PPR leg, the projection, and the domain dim —
      // materialize once (edge-sized), the triangles discipline
      .localCheckpoint(true)
    val ppr = personalizedPageRank(e, "__src", "__dst", seeds, pprIterations, damping)
    val domId = conv(substring(md5(col("__dst")), 1, 15), 16, 10).cast("long")
    val dims = e.select(col("__dst").as("domain")).distinct()
      .select(col("domain"),
        conv(substring(md5(col("domain")), 1, 15), 16, 10).cast("long").as("__id"))
    // hub cap BEFORE the quadratic projection: (src, domain-id) is distinct
    // (e is distinct, the id injective mod the accepted 2^-60 class), so
    // capPerKey's unique-order contract holds; both self-join sides read
    // the SAME capped frame, materialized once
    val srcDom = Skew.capPerKey(
        e.select(col("__src"), domId.as("__d")), Seq("__src"), "__d", maxOutDegree)
      .localCheckpoint(true)
    val cocite = srcDom
      .join(srcDom.select(col("__src"), col("__d").as("__d2")).hint("shuffle_merge"),
        Seq("__src"))
      .filter(col("__d") < col("__d2"))
      .select(col("__d").as("da"), col("__d2").as("db"))
      .distinct()
    val tri = triangles(cocite, "da", "db")
      .select(col("node").as("__id"), col("clustering"))
    val core = degreePeel(cocite, "da", "db", coreK, coreIterations)
      .select(col("node").as("__id"), lit(true).as("in_core"))
    dims
      .join(ppr.select(col("node").as("domain"), col("rank")).hint("shuffle_merge"),
        Seq("domain"), "left")
      .join(tri.hint("shuffle_merge"), Seq("__id"), "left")
      .join(core.hint("shuffle_merge"), Seq("__id"), "left")
      .select(col("domain"),
        coalesce(col("rank"), lit(0.0)).as("rank"),
        coalesce(col("clustering"), lit(0.0)).as("clustering"),
        coalesce(col("in_core"), lit(false)).as("in_core"),
        graft.functions.Quantize.scaledFloor(
          coalesce(col("rank"), lit(0.0)) *
            (lit(0.5) + lit(0.5) * coalesce(col("clustering"), lit(0.0))) *
            when(coalesce(col("in_core"), lit(false)), lit(1.0)).otherwise(lit(0.5)),
          9).as("score"))
  }

  /** Newman modularity of a community assignment over the undirected
    * simple graph — the partition-quality score that makes
    * [[labelPropagation]]'s output measurable (Q ≈ 0: no better than
    * random; Q ≳ 0.3: real community structure; a spam-farm partition
    * with high Q over the co-citation graph is the actionable signal):
    * `Q = Σ_c [ e_c/m − (deg_c/(2m))² ]` with `e_c` intra-community
    * edges, `deg_c` the community's degree mass, `m` total edges.
    *
    * Every term is an exact integer until the final divisions
    * (`Σe_c`, `Σdeg_c²`, `m` are longs; documented bound deg_c < 3·10⁹),
    * so `Q = Σe_c/m − Σdeg_c²/(4m²)` is two exact-input divisions,
    * scaledFloor-quantized — no per-community float sum at all.
    *
    * Shape: edges normalized like [[labelPropagation]] (dedupe,
    * self-loops dropped), two label joins onto the edge list (SMJ), one
    * community-keyed aggregation, two scalars. Output: (n_communities,
    * n_edges, modularity).
    */
  def modularity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      labels: DataFrame,
      nodeCol: String,
      labelCol: String
  ): DataFrame = {
    val und = edges.select(
      col(srcCol).cast("long").as("__s"), col(dstCol).cast("long").as("__d"))
      .filter(col("__s") =!= col("__d"))
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .distinct()
      .localCheckpoint(true) // referenced by m, the label joins, and degrees
    val lbl = labels.select(col(nodeCol).cast("long").as("node"),
      col(labelCol).cast("long").as("__c"))
    val m = und.agg(count(lit(1)).as("__m"))
    val intra = und
      .join(lbl.select(col("node").as("a"), col("__c").as("__ca")).hint("shuffle_merge"),
        Seq("a"))
      .join(lbl.select(col("node").as("b"), col("__c").as("__cb")).hint("shuffle_merge"),
        Seq("b"))
      .select(col("__ca"), col("__cb"))
      .localCheckpoint(true) // feeds intra-edge AND degree-mass aggregations
    val ec = intra.filter(col("__ca") === col("__cb"))
      .agg(count(lit(1)).as("__se"))
    val degC = intra
      .select(explode(array(col("__ca"), col("__cb"))).as("__c"))
      .groupBy(col("__c")).agg(count(lit(1)).as("__deg"))
    val dc = degC.agg(sum(col("__deg") * col("__deg")).as("__sd2"),
      count(lit(1)).as("n_communities"))
    m.crossJoin(broadcast(ec)).crossJoin(broadcast(dc))
      .select(col("n_communities"), col("__m").as("n_edges"),
        graft.functions.Quantize.scaledFloor(
          col("__se").cast("double") / col("__m").cast("double") -
            col("__sd2").cast("double") /
              (lit(4.0) * col("__m").cast("double") * col("__m").cast("double")), 6)
          .as("modularity"))
  }

  /** Fixed-iteration synchronous label propagation (Raghavan et al. 2007)
    * — the near-linear community detector for link-spam ring discovery
    * and topical clustering (connected components says "reachable";
    * communities say "densely reachable", which is what a spam farm is).
    *
    * Semantics: over the undirected SIMPLE graph (deduped, self-loops
    * dropped — multiplicity is noise for community membership), every
    * node starts labeled with its own id; each round EVERY node
    * simultaneously adopts the most frequent label among its neighbors,
    * ties broken by the SMALLEST label — the deterministic variant
    * (asynchronous/random-tie LPA is irreproducible by construction and
    * unusable as a gated operator). Isolated nodes keep their label.
    * A FIXED round count keeps it oracle-expressible, exactly like
    * [[degreePeel]]'s contract; deterministic synchronous LPA can
    * 2-cycle on bipartite-ish structure, so the round count is the
    * convergence budget, not a fixpoint promise.
    *
    * Scale shape: per round one edge⋈labels SMJ join, one
    * (node, label)-keyed count, one max-struct argmax aggregation, one
    * left join back onto the node dim — all keyed shuffles, nothing
    * corpus-shaped broadcast. Labels ride as longs (node ids) so the
    * argmax `max(struct(cnt, −label))` is exact integer comparison.
    * Lineage is truncated per round the way [[hits]] does. Output:
    * (node, label) with label = the community's id.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations=$iterations out of [1,64] — deep fixed-point chains should checkpoint")
    val und = edges.select(
      col(srcCol).cast("long").as("__s"), col(dstCol).cast("long").as("__d"))
      .filter(col("__s") =!= col("__d"))
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val sym = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
    val nodes = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .distinct().localCheckpoint(true)
    val init = nodes.select(col("node"), col("node").as("label"))
    (1 to iterations).foldLeft(init) { case (labels, _) =>
      val nbrLabels = sym
        .join(labels.select(col("node").as("nbr"), col("label")).hint("shuffle_merge"),
          Seq("nbr"))
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("__cnt"))
      val best = nbrLabels.groupBy(col("node"))
        .agg(max(struct(col("__cnt"), (-col("label")).as("__neg"))).as("__best"))
        .select(col("node"), (-col("__best.__neg")).as("label"))
      nodes.join(labels.withColumnRenamed("label", "__old").hint("shuffle_merge"),
          Seq("node"))
        .join(best.withColumnRenamed("label", "__new").hint("shuffle_merge"),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("__new"), col("__old")).as("label"))
        .localCheckpoint(true)
    }
  }

  /** Common-neighbor link prediction over the undirected simple graph:
    * for every NON-adjacent node pair sharing ≥ 1 neighbor, the
    * common-neighbor count and the Adamic–Adar score
    * `Σ_z 1/ln(deg z)` (Adamic & Adar 2003) — the degree-discounted form
    * that stops hub nodes from predicting everything (a z linking half
    * the graph carries ~no evidence; a degree-2 bridge carries a lot).
    * The curation read: a high-AA non-edge inside a suspected ring is the
    * "about to be linked" signal link farms exhibit before they densify.
    *
    * Shape: wedges are generated at each shared neighbor z — an SMJ
    * self-join of the symmetric adjacency list keyed on z — then one
    * keyed count/sum per candidate pair, an anti-join against the edge
    * set, and a top-k. Wedge count is Σ_z deg(z)², the quadratic hub
    * hazard triangles' degree-ordering avoids; here every wedge is a
    * candidate BY DEFINITION, so the bound is `maxDegree`: neighbors-of-z
    * fan-out is capped by dropping z's with deg > maxDegree (standard in
    * AA mining — a super-hub's 1/ln(deg) term is ~0 anyway, so the
    * dropped mass is the noise floor, and the cap is part of the
    * operator's contract, mirrored by the oracle).
    *
    * Each 1/ln(deg z) term is quantized to the 1e-9 grid and summed as
    * decimal — order-independent, engine-exact (the jackknife
    * discipline). Output: top-k (node_a, node_b, common_neighbors,
    * adamic_adar) by score desc, ties by (a, b); node_a < node_b.
    */
  def adamicAdar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxDegree: Int = 1024,
      topK: Int = 20
  ): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    require(topK > 0, s"topK must be positive, got $topK")
    val und = edges.select(
      col(srcCol).cast("long").as("__s"), col(dstCol).cast("long").as("__d"))
      .filter(col("__s") =!= col("__d"))
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .distinct()
      .localCheckpoint(true) // feeds degrees, the adjacency list, and the anti-join
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("__deg"))
    // symmetric adjacency restricted to generator nodes z with
    // deg(z) <= maxDegree, each row carrying z's quantized AA term
    val nbr = und.select(col("a").as("z"), col("b").as("nbr"))
      .union(und.select(col("b").as("z"), col("a").as("nbr")))
      .join(deg.select(col("node").as("z"), col("__deg")).hint("shuffle_merge"),
        Seq("z"))
      // deg-1 nodes can't generate a wedge AND their ln(1)=0 would divide
      // by zero under ANSI — drop them before the term projection runs
      .filter(col("__deg") >= 2 && col("__deg") <= maxDegree)
      .select(col("z"), col("nbr"),
        graft.functions.Quantize.scaledFloor(
          lit(1.0) / log(col("__deg").cast("double")), 9)
          .cast("decimal(18,9)").as("__term"))
      .localCheckpoint(true) // both sides of the wedge self-join
    val wedges = nbr.as("l").hint("shuffle_merge")
      .join(nbr.as("r").hint("shuffle_merge"),
        col("l.z") === col("r.z") && col("l.nbr") < col("r.nbr"))
      .select(col("l.nbr").as("a"), col("r.nbr").as("b"), col("l.__term").as("__term"))
    val scored = wedges.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("__term")).cast("decimal(38,9)").as("__aa"))
      .join(und.hint("shuffle_merge"), Seq("a", "b"), "left_anti")
    scored
      .orderBy(col("__aa").desc, col("a"), col("b"))
      .limit(topK)
      .select(col("a").as("node_a"), col("b").as("node_b"),
        col("common_neighbors"),
        graft.functions.Quantize.scaledFloor(col("__aa").cast("double"), 6)
          .as("adamic_adar"))
  }
}
