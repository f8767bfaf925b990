package graft.queries
import graft.Tables
import graft.operators.{AsofJoin, Chunking, Dedup, Multimodal, Profiler, RangeJoin, Rollup, Sampling, Similarity, Sketches, Skew, TextAnalysis, TimeSeries, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import PackShared._

/** Graph & behavioral analytics: PageRank/HITS/PPR, triangles, k-core, label propagation, modularity, link authority, funnels, cohorts, journeys, attribution, Markov chains, RFM, sessionization.
  *
  * Conventions: every computed column aliased identically on both
  * engines, deterministic ORDER BY, exact-decimal float sums — see
  * [[QueryPack]]. */
object GraphPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank domain authority over the planted link graph (source ->
    // linked site domains, the q63/q64 URL construction as an edge list):
    // 2 damped iterations, dangling site domains receive but don't
    // forward. The oracle unrolls both iterations; ranks round to 6 (the
    // GraphSpec boundary test measures rounding margins on this corpus).
    "q103_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val siteLinks = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("source").as("src"),
          concat(lit("site"), (col("doc_id") % 20).cast("string"),
            lit(".example.com")).as("dst"))
      val badLinks = docs.filter(col("doc_id") % 3 === 0)
        .select(col("source").as("src"),
          concat(lit("blocked"), (col("doc_id") % 5).cast("string"),
            lit(".bad.net")).as("dst"))
      graft.operators.Graph.pageRank(siteLinks.union(badLinks), "src", "dst", iterations = 2)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }),

    // Personalized PageRank from two trusted seed sources (TrustRank):
    // proximity-to-seed scores over the same link graph — the
    // trusted-domain expansion primitive; teleport is a pure isin
    // expression over the literal seed list.
    "q191_ppr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val siteLinks = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("source").as("src"),
          concat(lit("site"), (col("doc_id") % 20).cast("string"),
            lit(".example.com")).as("dst"))
      val badLinks = docs.filter(col("doc_id") % 3 === 0)
        .select(col("source").as("src"),
          concat(lit("blocked"), (col("doc_id") % 5).cast("string"),
            lit(".bad.net")).as("dst"))
      graft.operators.Graph.personalizedPageRank(siteLinks.union(badLinks),
        "src", "dst", seeds = Seq("src0", "src1"), iterations = 2)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }),

    // Batch sessionization through the native session_window operator (the
    // same operator the streaming surface uses): 3-hour inactivity gap.
    "q42_sessionize" -> ((s, d) => {
      graft.streaming.Streams.sessionAggregate(
        Tables.events(s, d), keyCol = "user_id", tsCol = "ts", valueCol = "value", gap = "3 hours")
        .orderBy(col("user_id"), col("session_start"))
    }),

    // q42's operator driven through a REAL readStream drain (the q300
    // pattern, now with the DECIMAL value-sum leg): session windows
    // MERGE in state as unordered micro-batches land, and the merged
    // aggregates (count + decimal sum cast back to double) must equal
    // the batch gaps-and-islands oracle. Full-span watermark delay +
    // guaranteed-last far-future sentinel (user -1, filtered).
    "q308_session_agg_drain" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("ts"), col("user_id"), col("value"))
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val sentinelTs = java.sql.Timestamp.from(
        maxTs.toInstant.plus(java.time.Duration.ofDays(3651)))
      val sentinel = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(sentinelTs, -1L, null)), ev.schema)
      PackShared.drainStagedLast(s, ev, sentinel, "q308_sink", "q308-events")(
          in => graft.streaming.Streams.sessionAggregate(
            in.withWatermark("ts", "3650 days"),
            keyCol = "user_id", tsCol = "ts", valueCol = "value", gap = "3 hours"))
        .filter(col("user_id") =!= -1L)
        .orderBy(col("user_id"), col("session_start"))
    }),

    // User-journey paths: each user's first 5 event types in order,
    // counted across users — the behavioral fingerprint report.
    "q161_journeys" -> ((s, d) => {
      graft.operators.Funnel.journeyPaths(Tables.events(s, d),
        "user_id", Seq("ts", "event_id"), "event_type", maxSteps = 5)
        .orderBy(col("path"))
    }),

    // Per-node triangle count + clustering coefficient over a synthetic
    // doc-derived link graph (same-id-space modular edges, so triangles
    // exist — q136's source→site graph is bipartite and has none).
    // Degree-ordered compact-forward: three SMJ self-joins, wedge volume
    // O(m^1.5)-bounded — the community-density / link-farm signal.
    "q169_triangles" -> ((s, d) => {
      val edges = Tables.documents(s, d).select(
        (col("doc_id") % 100).as("src"), ((col("doc_id") * 31 + 7) % 100).as("dst"))
      graft.operators.Graph.triangles(edges, "src", "dst")
        .orderBy(col("node"))
    }),

    // Bounded degree peeling toward the 11-core (2 rounds) over a
    // two-residue doc graph — dense-subgraph extraction; each round is a
    // keyed degree count + two semi-joins, oracle unrolled round by round.
    "q179_degree_peel" -> ((s, d) => {
      val edges = Tables.documents(s, d).select(
        (col("doc_id") % 80).as("src"),
        ((col("doc_id") / 80).cast("long") * 7 + col("doc_id") * 13 + 5).mod(80).as("dst"))
      graft.operators.Graph.degreePeel(edges, "src", "dst", k = 11, iterations = 2)
        .orderBy(col("node"))
    }),

    // Last-touch attribution: each purchase attributed to the user's most
    // recent click within a 7-day lookback — the as-of join composed with
    // an event-type split; click ties at one timestamp resolve to the max
    // click id (the q22 dedup-first discipline).
    "q182_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      val joined = AsofJoin.leftAsof(purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("user_id"),
        leftTime = "ts", rightTime = "click_ts",
        rightCols = Seq("click_id", "click_ts"))
      val lagUs = unix_micros(col("ts")) - unix_micros(col("click_ts"))
      val within = col("click_id").isNotNull && lagUs <= lit(7L * 86400L * 1000000L)
      joined.select(col("event_id"), col("user_id"),
        when(within, col("click_id")).as("attributed_click"),
        when(within, lagUs).as("lag_us"))
        .orderBy(col("event_id"))
    }),

    // Funnel step-lag quantiles: p25/p50/p75 of the view→click and
    // click→purchase conversion delays — order statistics over integer
    // microsecond lags are exact doubles, no quantization needed.
    "q188_funnel_lags" -> ((s, d) => {
      val times = graft.operators.Funnel.funnelTimes(
        Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts")),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      val lags = times.select(explode(array(
        struct(lit("click>purchase").as("transition"),
          when(col("t3").isNotNull, unix_micros(col("t3")) - unix_micros(col("t2")))
            .as("lag_us")),
        struct(lit("view>click").as("transition"),
          when(col("t2").isNotNull, unix_micros(col("t2")) - unix_micros(col("t1")))
            .as("lag_us")))).as("__e"))
        .select(col("__e.*")).filter(col("lag_us").isNotNull)
      lags.groupBy(col("transition"))
        .agg(count(lit(1)).as("n_users"),
          expr("percentile(lag_us, 0.25)").as("p25"),
          expr("percentile(lag_us, 0.5)").as("p50"),
          expr("percentile(lag_us, 0.75)").as("p75"))
        .orderBy(col("transition"))
    }),

    // Composed link-authority curation gate: PPR-to-trusted-seeds (q191's
    // signal), co-citation clustering coefficient (q169's), and k-core
    // membership (q179's) COMBINED into one per-domain quality score, then
    // joined onto the document frame as the keep/drop gate — the way
    // production link-spam curation uses the graph signals together. The
    // link graph is two-tier by construction (8 wide generalist sources +
    // 12 narrow ones + blocked-domain hubs) so every signal has spread:
    // clustering 0.815..1.0, a proper-subset 25-core (38 of 45 domains),
    // PPR reaching 28 of 45. Oracle re-derives all three legs and the
    // composition; keep = score >= 0.004 (splits the measured bimodal
    // score distribution at its gap).
    "q202_link_authority_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("source").as("src"),
          concat(lit("site"),
            (((col("doc_id") / 20).cast("long") %
                when(col("doc_id") % 20 < 8, 25).otherwise(3)
              + (col("doc_id") % 20) * 2) % 40).cast("string"),
            lit(".example.com")).as("dst"))
        .unionByName(docs.filter(col("doc_id") % 9 === 0)
          .select(col("source").as("src"),
            concat(lit("blocked"), (col("doc_id") % 5).cast("string"),
              lit(".bad.net")).as("dst")))
      val authority = graft.operators.Graph.linkAuthority(edges, "src", "dst",
        seeds = Seq("src0", "src1"), pprIterations = 2, coreK = 25, coreIterations = 2)
      docs.select(col("doc_id"),
          concat(lit("site"), (col("doc_id") % 40).cast("string"),
            lit(".example.com")).as("domain"))
        .join(authority.hint("shuffle_merge"), Seq("domain"), "left")
        .select(col("doc_id"), col("domain"),
          coalesce(col("score"), lit(0.0)).as("score"),
          coalesce(col("in_core"), lit(false)).as("in_core"),
          (coalesce(col("score"), lit(0.0)) >= 0.004).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic synchronous label propagation over a planted
    // 10-block community graph (intra-block edges from the doc-id digit
    // grid + sparse %127 bridges): 3 rounds, min-label ties — the
    // spam-ring / topical-cluster detector beyond plain connectivity.
    "q218_label_prop" -> ((s, d) => {
      val a = col("doc_id") % 1000
      val base = Tables.documents(s, d).select(a.as("a"))
      val intra = base.select(
        ((col("a") % 10) * 10 + expr("a DIV 10 % 10")).as("src"),
        ((col("a") % 10) * 10 + expr("a DIV 100 % 10")).as("dst"))
      val bridges = base.filter(col("a") % 127 === 0)
        .select((col("a") % 100).as("src"), ((col("a") + 13) % 100).as("dst"))
      graft.operators.Graph.labelPropagation(
        intra.union(bridges), "src", "dst", iterations = 3)
        .orderBy(col("node"))
    }),

    // Behavioral motif mining: every contiguous 3-gram of a user's
    // time-ordered event types, counted corpus-wide (min count 5) —
    // journeys fingerprint the opening, n-grams find recurring motifs
    // anywhere in the stream.
    "q226_event_ngrams" -> ((s, d) => {
      graft.operators.Funnel.eventNgrams(Tables.events(s, d),
        "user_id", Seq("ts", "event_id"), "event_type", n = 3, minCount = 5)
    }),

    // Modularity of the q218 label-propagation partition on its own
    // graph — the partition-quality score; exact integer edge/degree
    // masses to the final two divisions.
    "q228_modularity" -> ((s, d) => {
      val a = col("doc_id") % 1000
      val base = Tables.documents(s, d).select(a.as("a"))
      val intra = base.select(
        ((col("a") % 10) * 10 + expr("a DIV 10 % 10")).as("src"),
        ((col("a") % 10) * 10 + expr("a DIV 100 % 10")).as("dst"))
      val bridges = base.filter(col("a") % 127 === 0)
        .select((col("a") % 100).as("src"), ((col("a") + 13) % 100).as("dst"))
      val edges = intra.union(bridges)
      val labels = graft.operators.Graph.labelPropagation(edges, "src", "dst",
        iterations = 3)
      graft.operators.Graph.modularity(edges, "src", "dst", labels, "node", "label")
    }),

    // RFM segmentation: per-user recency/frequency/monetary (synthetic
    // integral purchase amounts) scored 1-5 against corpus quintile
    // thresholds — the churn-model feature frame.
    "q231_rfm" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        when(col("event_type") === "purchase", col("event_id") % 50 + 1)
          .otherwise(lit(0L)).as("amount"))
      graft.operators.Funnel.rfm(ev, "user_id", "ts", "amount")
        .orderBy(col("user_id"))
    }),

    // Adamic–Adar link prediction on the q169 synthetic domain graph —
    // top-20 highest-evidence missing links.
    "q241_adamic_adar" -> ((s, d) => {
      val edges = Tables.documents(s, d).select(
        (col("doc_id") % 100).as("src"), ((col("doc_id") * 31 + 7) % 100).as("dst"))
      graft.operators.Graph.adamicAdar(edges, "src", "dst",
        maxDegree = 1024, topK = 20)
    }),

    // Multi-touch linear attribution: every purchase splits one unit of
    // credit equally across ALL the user's clicks in the 7-day lookback
    // (q182's last-touch generalized) — user-keyed SMJ join, per-purchase
    // touch counts, per-click credit sums; scaled-floor quantized since
    // the 1/n credit sum is float-accumulated.
    "q192_multitouch" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("cts"))
      val matched = clicks.hint("shuffle_merge")
        .join(purchases.hint("shuffle_merge"), Seq("user_id"))
        .filter(col("cts") <= col("pts") &&
          col("cts") >= col("pts") - lit(7L * 86400L * 1000000L))
      val perPurchase = matched.groupBy(col("purchase_id")).agg(count(lit(1)).as("__np"))
      matched.join(perPurchase.hint("shuffle_merge"), Seq("purchase_id"))
        // per-purchase 1/n credit quantized to a 1e-7 integer grid before
        // summing — the order-free form (see klFromCorpus); 1/n is a single
        // division, the same double in any engine
        .withColumn("__c7",
          floor(lit(1.0) / col("__np") * lit(1.0e7) + lit(0.5)).cast("long"))
        .groupBy(col("click_id"))
        .agg(count(lit(1)).as("n_purchases"),
          graft.functions.Quantize.scaledFloor(
            sum(col("__c7")).cast("double") / lit(1.0e7), 6).as("credit"))
        .orderBy(col("click_id"))
    }),

    // First-order Markov transition matrix over per-user event sequences:
    // P(next_type | type) from adjacent pairs — the behavioral-model /
    // bot-detection fingerprint; a single exact-integer division per cell
    // (same double both engines), scaled-floor quantized.
    "q193_markov" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
      val counts = trans.groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("cnt"))
      val totals = counts.groupBy(col("from_type")).agg(sum(col("cnt")).as("__tot"))
      counts.join(broadcast(totals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("cnt"),
          graft.functions.Quantize.scaledFloor(
            col("cnt") / col("__tot").cast("double"), 6).as("prob"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Ordered funnel (view -> click -> purchase): per-user reach times
    // where each step's event must follow the previous step's earliest
    // reach — k-1 keyed join+min-aggregations, no per-user window, no
    // event-array collection (the bot-user-proof shape).
    "q141_funnel" -> ((s, d) => {
      graft.operators.Funnel.funnelTimes(Tables.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    }),

    // Weekly cohort retention: first-seen bucket x activity offset with
    // distinct (user, bucket) pre-aggregation — never a countDistinct
    // over a corpus-wide group.
    "q142_cohort" -> ((s, d) => {
      graft.operators.Funnel.cohortRetention(Tables.events(s, d), "user_id", "ts",
        bucketDays = 7)
        .orderBy(col("cohort"), col("offset"))
    }),

    // HITS hubs/authorities over the q103 link graph: 2 L1-normalized
    // iterations, both unrolled in the oracle; document sources are pure
    // hubs (no in-links), site/blocked domains pure authorities.
    "q136_hits" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val siteLinks = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("source").as("src"),
          concat(lit("site"), (col("doc_id") % 20).cast("string"),
            lit(".example.com")).as("dst"))
      val badLinks = docs.filter(col("doc_id") % 3 === 0)
        .select(col("source").as("src"),
          concat(lit("blocked"), (col("doc_id") % 5).cast("string"),
            lit(".bad.net")).as("dst"))
      graft.operators.Graph.hits(siteLinks.union(badLinks), "src", "dst", iterations = 2)
        .select(col("node"), round(col("hub"), 6).as("hub"), round(col("auth"), 6).as("auth"))
        .orderBy(col("node"))
    }),
  )

  def oracles: Map[String, String] = Map(

    "q161_journeys" -> """
      WITH r AS (SELECT user_id, event_type,
                        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                 FROM events),
      p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
            FROM r WHERE rn <= 5 GROUP BY user_id)
      SELECT path, count(*) AS n_users FROM p GROUP BY path ORDER BY path""",

    // degree-ordered compact-forward re-derived relationally: direct each
    // undirected edge low→high under (degree, id), wedge at the lower
    // endpoint, closure via either orientation of the third edge.
    "q169_triangles" -> """
      WITH raw AS (SELECT doc_id % 100 AS s, (doc_id * 31 + 7) % 100 AS d FROM documents),
      und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s <> d),
      deg AS (SELECT n AS node, count(*) AS degree
              FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n),
      wd AS (SELECT u.a, u.b, da.degree AS da, db.degree AS db
             FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
      dir AS (SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
                     CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
              FROM wd),
      wedges AS (SELECT e1.u AS tu, e1.v AS tv, e2.v AS tw
                 FROM dir e1 JOIN dir e2 ON e1.u = e2.u AND e1.v < e2.v),
      closing AS (SELECT u AS tv, v AS tw FROM dir UNION ALL SELECT v, u FROM dir),
      tris AS (SELECT w.tu, w.tv, w.tw FROM wedges w
               WHERE EXISTS (SELECT 1 FROM closing c WHERE c.tv = w.tv AND c.tw = w.tw)),
      pn AS (SELECT node, count(*) AS tri_cnt FROM (
               SELECT tu AS node FROM tris UNION ALL
               SELECT tv FROM tris UNION ALL
               SELECT tw FROM tris) GROUP BY node)
      SELECT deg.node, deg.degree,
             CAST(coalesce(pn.tri_cnt, 0) AS BIGINT) AS tri_cnt,
             CASE WHEN deg.degree >= 2
                  THEN CAST(floor(2.0 * coalesce(pn.tri_cnt, 0) /
                             (deg.degree * (deg.degree - 1)) * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0
                  ELSE 0.0 END AS clustering
      FROM deg LEFT JOIN pn USING (node) ORDER BY node""",

    // two peel rounds unrolled: drop degree-<11 nodes, restrict edges,
    // repeat; final degrees on the restricted edge set.
    "q179_degree_peel" -> """
      WITH raw AS (SELECT doc_id % 80 AS s,
                          (doc_id // 80 * 7 + doc_id * 13 + 5) % 80 AS d
                   FROM documents),
      e0 AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s <> d),
      d0 AS (SELECT n AS node, count(*) AS degree
             FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0) GROUP BY n),
      k0 AS (SELECT node FROM d0 WHERE degree >= 11),
      e1 AS (SELECT a, b FROM e0
             WHERE a IN (SELECT node FROM k0) AND b IN (SELECT node FROM k0)),
      d1 AS (SELECT n AS node, count(*) AS degree
             FROM (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1) GROUP BY n),
      k1 AS (SELECT node FROM d1 WHERE degree >= 11),
      e2 AS (SELECT a, b FROM e1
             WHERE a IN (SELECT node FROM k1) AND b IN (SELECT node FROM k1)),
      d2 AS (SELECT n AS node, count(*) AS degree
             FROM (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2) GROUP BY n)
      SELECT node, degree FROM d2 WHERE degree >= 11 ORDER BY node""",

    // q202: every leg re-derived — the q191-shape unrolled PPR, the q169
    // wedge/closure triangle count over the co-citation projection, the
    // q179 unrolled peel at k=25 — then the same scaled-floor composition
    // and the per-doc gate join. Domains cross into the long-keyed legs
    // via the engine's 60-bit md5 id (q104's CAST(concat('0x',...)) form).
    "q202_link_authority_gate" -> """
      WITH e AS (SELECT DISTINCT src, dst FROM (
        SELECT source AS src,
               'site' || CAST(((doc_id // 20) % (CASE WHEN doc_id % 20 < 8 THEN 25 ELSE 3 END)
                               + (doc_id % 20) * 2) % 40 AS VARCHAR) || '.example.com' AS dst
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT source, 'blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net'
        FROM documents WHERE doc_id % 9 = 0)),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      tl AS (SELECT node,
                    CASE WHEN node IN ('src0', 'src1') THEN 1.0 / 2 ELSE 0.0 END AS tele
             FROM nodes),
      sdeg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
      r0 AS (SELECT node, tele AS rank FROM tl),
      pc1 AS (SELECT e.dst, sum(r.rank / d.dg) AS contrib
              FROM e JOIN r0 r ON e.src = r.node JOIN sdeg d ON e.src = d.src
              GROUP BY e.dst),
      r1 AS (SELECT tl.node, (1.0 - 0.85) * tl.tele + 0.85 * coalesce(pc1.contrib, 0.0) AS rank
             FROM tl LEFT JOIN pc1 ON tl.node = pc1.dst),
      pc2 AS (SELECT e.dst, sum(r.rank / d.dg) AS contrib
              FROM e JOIN r1 r ON e.src = r.node JOIN sdeg d ON e.src = d.src
              GROUP BY e.dst),
      r2 AS (SELECT tl.node, (1.0 - 0.85) * tl.tele + 0.85 * coalesce(pc2.contrib, 0.0) AS rank
             FROM tl LEFT JOIN pc2 ON tl.node = pc2.dst),
      ids AS (SELECT dst AS domain,
                     CAST(concat('0x', substring(md5(dst), 1, 15)) AS BIGINT) AS id
              FROM (SELECT DISTINCT dst FROM e)),
      em AS (SELECT e.src, ids.id FROM e JOIN ids ON e.dst = ids.domain),
      und AS (SELECT DISTINCT a.id AS a, b.id AS b
              FROM em a JOIN em b ON a.src = b.src AND a.id < b.id),
      tdeg AS (SELECT n AS node, count(*) AS degree
               FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n),
      wd AS (SELECT u.a, u.b, da.degree AS da, db.degree AS db
             FROM und u JOIN tdeg da ON u.a = da.node JOIN tdeg db ON u.b = db.node),
      dir AS (SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
                     CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
              FROM wd),
      wedges AS (SELECT e1.u AS tu, e1.v AS tv, e2.v AS tw
                 FROM dir e1 JOIN dir e2 ON e1.u = e2.u AND e1.v < e2.v),
      closing AS (SELECT u AS tv, v AS tw FROM dir UNION ALL SELECT v, u FROM dir),
      tris AS (SELECT w.tu, w.tv, w.tw FROM wedges w
               WHERE EXISTS (SELECT 1 FROM closing c WHERE c.tv = w.tv AND c.tw = w.tw)),
      pn AS (SELECT node, count(*) AS tri_cnt FROM (
               SELECT tu AS node FROM tris UNION ALL
               SELECT tv FROM tris UNION ALL
               SELECT tw FROM tris) GROUP BY node),
      clus AS (SELECT tdeg.node AS id,
                      CASE WHEN tdeg.degree >= 2
                           THEN CAST(floor(2.0 * coalesce(pn.tri_cnt, 0) /
                                  (tdeg.degree * (tdeg.degree - 1)) * 1000000.0 + 0.5) AS DOUBLE)
                                / 1000000.0
                           ELSE 0.0 END AS clustering
               FROM tdeg LEFT JOIN pn USING (node)),
      k0 AS (SELECT node FROM tdeg WHERE degree >= 25),
      pe1 AS (SELECT a, b FROM und
              WHERE a IN (SELECT node FROM k0) AND b IN (SELECT node FROM k0)),
      pd1 AS (SELECT n AS node, count(*) AS degree
              FROM (SELECT a AS n FROM pe1 UNION ALL SELECT b FROM pe1) GROUP BY n),
      k1 AS (SELECT node FROM pd1 WHERE degree >= 25),
      pe2 AS (SELECT a, b FROM pe1
              WHERE a IN (SELECT node FROM k1) AND b IN (SELECT node FROM k1)),
      pd2 AS (SELECT n AS node, count(*) AS degree
              FROM (SELECT a AS n FROM pe2 UNION ALL SELECT b FROM pe2) GROUP BY n),
      core AS (SELECT node AS id FROM pd2 WHERE degree >= 25),
      auth AS (SELECT i.domain,
                      coalesce(r2.rank, 0.0) AS rank,
                      coalesce(c.clustering, 0.0) AS clustering,
                      (core.id IS NOT NULL) AS in_core,
                      CAST(floor(coalesce(r2.rank, 0.0) *
                             (0.5 + 0.5 * coalesce(c.clustering, 0.0)) *
                             (CASE WHEN core.id IS NOT NULL THEN 1.0 ELSE 0.5 END)
                             * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0 AS score
               FROM ids i
               LEFT JOIN r2 ON r2.node = i.domain
               LEFT JOIN clus c ON c.id = i.id
               LEFT JOIN core ON core.id = i.id)
      SELECT d.doc_id,
             'site' || CAST(d.doc_id % 40 AS VARCHAR) || '.example.com' AS domain,
             coalesce(a.score, 0.0) AS score,
             coalesce(a.in_core, false) AS in_core,
             (coalesce(a.score, 0.0) >= 0.004) AS keep
      FROM documents d
      LEFT JOIN auth a ON a.domain = 'site' || CAST(d.doc_id % 40 AS VARCHAR) || '.example.com'
      ORDER BY d.doc_id""",

    "q182_attribution" -> """
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS click_ts, max(event_id) AS click_id
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
      SELECT p.event_id, p.user_id,
             CASE WHEN c.click_id IS NOT NULL
                   AND epoch_us(p.ts) - epoch_us(c.click_ts) <= 604800000000
                  THEN c.click_id END AS attributed_click,
             CASE WHEN c.click_id IS NOT NULL
                   AND epoch_us(p.ts) - epoch_us(c.click_ts) <= 604800000000
                  THEN epoch_us(p.ts) - epoch_us(c.click_ts) END AS lag_us
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts >= c.click_ts
      ORDER BY p.event_id""",

    "q188_funnel_lags" -> """
      WITH r1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      r2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN r1 ON e.user_id = r1.user_id
             WHERE e.event_type = 'click' AND e.ts > r1.t1 GROUP BY e.user_id),
      r3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN r2 ON e.user_id = r2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > r2.t2 GROUP BY e.user_id),
      l AS (SELECT 'view>click' AS transition,
                   epoch_us(r2.t2) - epoch_us(r1.t1) AS lag_us
            FROM r1 JOIN r2 ON r1.user_id = r2.user_id
            UNION ALL
            SELECT 'click>purchase', epoch_us(r3.t3) - epoch_us(r2.t2)
            FROM r2 JOIN r3 ON r2.user_id = r3.user_id)
      SELECT transition, count(*) AS n_users,
             quantile_cont(lag_us, 0.25) AS p25,
             quantile_cont(lag_us, 0.5) AS p50,
             quantile_cont(lag_us, 0.75) AS p75
      FROM l GROUP BY transition ORDER BY transition""",

    "q192_multitouch" -> """
      WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
            FROM events WHERE event_type = 'click'),
      m AS (SELECT c.click_id, p.purchase_id
            FROM c JOIN p ON c.user_id = p.user_id
            WHERE c.cts <= p.pts AND c.cts >= p.pts - 604800000000),
      np AS (SELECT purchase_id, count(*) AS np FROM m GROUP BY purchase_id),
      terms AS (SELECT m.click_id,
                       CAST(floor(1.0 / CAST(np.np AS DOUBLE) * 10000000.0 + 0.5) AS BIGINT) AS c7
                FROM m JOIN np ON m.purchase_id = np.purchase_id)
      SELECT click_id, count(*) AS n_purchases,
             CAST(floor(CAST(sum(c7) AS DOUBLE) / 10000000.0 * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS credit
      FROM terms GROUP BY click_id ORDER BY click_id""",

    "q193_markov" -> """
      WITH tr AS (
        SELECT event_type AS from_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (SELECT from_type, to_type, count(*) AS cnt FROM tr
            WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      t AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY from_type)
      SELECT c.from_type, c.to_type, CAST(c.cnt AS BIGINT) AS cnt,
             CAST(floor(c.cnt / CAST(t.tot AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS prob
      FROM c JOIN t ON c.from_type = t.from_type
      ORDER BY c.from_type, c.to_type""",

    "q141_funnel" -> """
      WITH r1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      r2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN r1 ON e.user_id = r1.user_id
             WHERE e.event_type = 'click' AND e.ts > r1.t1 GROUP BY e.user_id),
      r3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN r2 ON e.user_id = r2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > r2.t2 GROUP BY e.user_id)
      SELECT r1.user_id, r1.t1, r2.t2, r3.t3
      FROM r1 LEFT JOIN r2 ON r1.user_id = r2.user_id
           LEFT JOIN r3 ON r1.user_id = r3.user_id
      ORDER BY r1.user_id""",

    "q142_cohort" -> """
      WITH b AS (SELECT user_id,
                        CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS bkt
                 FROM events),
      f AS (SELECT user_id, min(bkt) AS cohort FROM b GROUP BY user_id),
      a AS (SELECT DISTINCT user_id, bkt FROM b)
      SELECT f.cohort, a.bkt - f.cohort AS offset, count(*) AS active_users
      FROM a JOIN f ON a.user_id = f.user_id
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q136_hits" -> """
      WITH e AS (
        SELECT source AS src,
               'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS dst
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT source, 'blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net'
        FROM documents WHERE doc_id % 3 = 0),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      h0 AS (SELECT node, 1.0 / n.n AS hub FROM nodes CROSS JOIN n),
      ar1 AS (SELECT e.dst, sum(h.hub) AS a FROM e JOIN h0 h ON e.src = h.node GROUP BY e.dst),
      as1 AS (SELECT sum(a) AS s FROM ar1),
      a1 AS (SELECT nodes.node, coalesce(ar1.a, 0.0) / as1.s AS auth
             FROM nodes LEFT JOIN ar1 ON nodes.node = ar1.dst CROSS JOIN as1),
      hr1 AS (SELECT e.src, sum(a.auth) AS h FROM e JOIN a1 a ON e.dst = a.node GROUP BY e.src),
      hs1 AS (SELECT sum(h) AS s FROM hr1),
      h1 AS (SELECT nodes.node, coalesce(hr1.h, 0.0) / hs1.s AS hub
             FROM nodes LEFT JOIN hr1 ON nodes.node = hr1.src CROSS JOIN hs1),
      ar2 AS (SELECT e.dst, sum(h.hub) AS a FROM e JOIN h1 h ON e.src = h.node GROUP BY e.dst),
      as2 AS (SELECT sum(a) AS s FROM ar2),
      a2 AS (SELECT nodes.node, coalesce(ar2.a, 0.0) / as2.s AS auth
             FROM nodes LEFT JOIN ar2 ON nodes.node = ar2.dst CROSS JOIN as2),
      hr2 AS (SELECT e.src, sum(a.auth) AS h FROM e JOIN a2 a ON e.dst = a.node GROUP BY e.src),
      hs2 AS (SELECT sum(h) AS s FROM hr2),
      h2 AS (SELECT nodes.node, coalesce(hr2.h, 0.0) / hs2.s AS hub
             FROM nodes LEFT JOIN hr2 ON nodes.node = hr2.src CROSS JOIN hs2)
      SELECT h2.node, round(h2.hub, 6) AS hub, round(a2.auth, 6) AS auth
      FROM h2 JOIN a2 ON h2.node = a2.node ORDER BY h2.node""",

    // q218: the synchronous min-label-tie LPA rounds unrolled CTE by CTE
    // (the q136 HITS discipline) over the same planted block graph.
    "q218_label_prop" -> lpaOracle(q218EdgeSql, iterations = 3),

    // q228: the q218 partition re-derived by the shared CTE builder, then
    // the exact-integer modularity identity.
    "q228_modularity" -> modularityOracle(q218EdgeSql, iterations = 3),

    // q226: DuckDB's ordered list aggregation + 1-based slice windows,
    // the same '>'-joined grams and min-count gate.
    "q226_event_ngrams" -> """
      WITH seq AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS ts_
                   FROM events GROUP BY user_id),
      g AS (SELECT array_to_string(ts_[CAST(i AS INTEGER):CAST(i AS INTEGER) + 2], '>') AS gram
            FROM (SELECT ts_, unnest(range(1, len(ts_) - 1)) AS i
                  FROM seq WHERE len(ts_) >= 3))
      SELECT gram, count(*) AS cnt FROM g GROUP BY gram
      HAVING count(*) >= 5 ORDER BY cnt DESC, gram""",
    "q231_rfm" -> rfmOracle,

    // q241: wedges at each shared neighbor (deg <= 1024), per-z 1/ln(deg)
    // 1e-9-quantized then decimal-summed, anti-join against the edge set,
    // exact-decimal top-20.
    "q241_adamic_adar" -> """
      WITH raw AS (SELECT doc_id % 100 AS s, (doc_id * 31 + 7) % 100 AS d FROM documents),
      und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s <> d),
      deg AS (SELECT n AS node, CAST(count(*) AS BIGINT) AS degree
              FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n),
      nbr AS (SELECT t.z, t.nbr,
                     CAST(CAST(floor(1.0 / ln(CAST(degree AS DOUBLE))
                         * 1000000000.0 + 0.5) AS DOUBLE)
                       / 1000000000.0 AS DECIMAL(18,9)) AS term
              FROM (SELECT a AS z, b AS nbr FROM und
                    UNION ALL SELECT b AS z, a AS nbr FROM und) t
              JOIN deg ON t.z = deg.node
              WHERE degree >= 2 AND degree <= 1024),
      w AS (SELECT l.nbr AS a, r.nbr AS b, l.term AS term
            FROM nbr l JOIN nbr r ON l.z = r.z AND l.nbr < r.nbr),
      sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
                    CAST(sum(term) AS DECIMAL(38,9)) AS aa
             FROM w GROUP BY a, b),
      missing AS (SELECT sc.a, sc.b, sc.common_neighbors, sc.aa
                  FROM sc LEFT JOIN und ON sc.a = und.a AND sc.b = und.b
                  WHERE und.a IS NULL)
      SELECT a AS node_a, b AS node_b, common_neighbors,
             CAST(floor(CAST(aa AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS adamic_adar
      FROM missing ORDER BY aa DESC, a, b LIMIT 20""",

    // Two unrolled PageRank iterations; the damping constants are written
    // as (1.0 - 0.85) to mirror the Spark-side lit(1.0 - damping)
    // arithmetic bit for bit.
    "q103_pagerank" -> """
      WITH e AS (
        SELECT source AS src,
               'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS dst
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT source, 'blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net'
        FROM documents WHERE doc_id % 3 = 0),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes CROSS JOIN n),
      c1 AS (SELECT e.dst, sum(r.rank / d.deg) AS contrib
             FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r1 AS (SELECT nodes.node, (1.0 - 0.85) / n.n + 0.85 * coalesce(c1.contrib, 0.0) AS rank
             FROM nodes LEFT JOIN c1 ON nodes.node = c1.dst CROSS JOIN n),
      c2 AS (SELECT e.dst, sum(r.rank / d.deg) AS contrib
             FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r2 AS (SELECT nodes.node, (1.0 - 0.85) / n.n + 0.85 * coalesce(c2.contrib, 0.0) AS rank
             FROM nodes LEFT JOIN c2 ON nodes.node = c2.dst CROSS JOIN n)
      SELECT node, round(rank, 6) AS rank FROM r2 ORDER BY node""",

    // q103's unrolled iterations with the teleport concentrated on the
    // two seeds: tele = 1/2 on src0/src1, 0 elsewhere; rank0 = tele.
    "q191_ppr" -> """
      WITH e AS (
        SELECT source AS src,
               'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS dst
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT source, 'blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net'
        FROM documents WHERE doc_id % 3 = 0),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      tl AS (SELECT node,
                    CASE WHEN node IN ('src0', 'src1') THEN 1.0 / 2 ELSE 0.0 END AS tele
             FROM nodes),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      r0 AS (SELECT node, tele AS rank FROM tl),
      c1 AS (SELECT e.dst, sum(r.rank / d.deg) AS contrib
             FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r1 AS (SELECT tl.node, (1.0 - 0.85) * tl.tele + 0.85 * coalesce(c1.contrib, 0.0) AS rank
             FROM tl LEFT JOIN c1 ON tl.node = c1.dst),
      c2 AS (SELECT e.dst, sum(r.rank / d.deg) AS contrib
             FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r2 AS (SELECT tl.node, (1.0 - 0.85) * tl.tele + 0.85 * coalesce(c2.contrib, 0.0) AS rank
             FROM tl LEFT JOIN c2 ON tl.node = c2.dst)
      SELECT node, round(rank, 6) AS rank FROM r2 ORDER BY node""",

    // Gaps-and-islands formulation of session_window semantics: a new
    // session starts only when the gap since the previous event STRICTLY
    // exceeds 3 h — Spark merges adjacent windows, so an event at exactly
    // last + gap still joins the session; session_end = last event + gap.
    "q42_sessionize" -> """
      WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 3 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      i AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT user_id,
             min(ts) AS session_start,
             max(ts) + INTERVAL 3 HOUR AS session_end,
             CAST(count(*) AS INTEGER) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM i GROUP BY user_id, sid ORDER BY user_id, session_start""",

    // q308: q42's oracle over the non-null-ts slice — the drain must
    // converge on the batch islands and sums.
    "q308_session_agg_drain" -> """
      WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 3 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL),
      i AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT user_id,
             min(ts) AS session_start,
             max(ts) + INTERVAL 3 HOUR AS session_end,
             CAST(count(*) AS INTEGER) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM i GROUP BY user_id, sid ORDER BY user_id, session_start""",
  )
}
