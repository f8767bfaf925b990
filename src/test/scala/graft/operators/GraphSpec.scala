package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iterations: Int): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations)
      .as[(String, Double)].collect().toMap

  test("hand-computed two-iteration ranks on a 3-node graph with a dangling node") {
    // A->B, B->A, A->C: deg(A)=2, deg(B)=1; C is dangling (receives, drops)
    val r1 = ranksOf(Seq(("A", "B"), ("B", "A"), ("A", "C")), 1)
    val third = 1.0 / 3.0
    assert(r1("A") == (1.0 - 0.85) / 3 + 0.85 * third)          // B's whole share
    assert(r1("B") == (1.0 - 0.85) / 3 + 0.85 * (third / 2))    // half of A's
    assert(r1("C") == r1("B"))
    // iteration 2 from those ranks: A gets r1(B), B and C get r1(A)/2
    val r2 = ranksOf(Seq(("A", "B"), ("B", "A"), ("A", "C")), 2)
    assert(r2("A") == (1.0 - 0.85) / 3 + 0.85 * r1("B"))
    assert(r2("B") == (1.0 - 0.85) / 3 + 0.85 * (r1("A") / 2))
    assert(r2("C") == r2("B"))
  }

  test("iterations = 0 returns the uniform prior over the node set") {
    val r0 = ranksOf(Seq(("A", "B"), ("C", "B")), 0)
    assert(r0.keySet == Set("A", "B", "C") && r0.values.forall(_ == 1.0 / 3.0))
  }

  test("parallel edges weigh multiply (link multiplicity is intentional)") {
    // A->B twice, A->C once: B receives 2/3 of A's forwarded mass
    val r = ranksOf(Seq(("A", "B"), ("A", "B"), ("A", "C")), 1)
    assert(r("B") == (1.0 - 0.85) / 3 + 0.85 * (2.0 / 3.0 / 3.0))
    assert(r("C") == (1.0 - 0.85) / 3 + 0.85 * (1.0 / 3.0 / 3.0))
  }

  test("parameter guards fail loudly") {
    val e = Seq(("A", "B")).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", 2, damping = 1.0))
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", 65))
  }

  private def hitsOf(edges: Seq[(String, String)], iterations: Int): Map[String, (Double, Double)] =
    Graph.hits(edges.toDF("src", "dst"), "src", "dst", iterations)
      .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap

  test("HITS: hand-computed one-iteration hub/auth on a 2x2 bipartite graph") {
    // A->X, A->Y, B->X: auth'(X) = h(A)+h(B) = 2/4, auth'(Y) = 1/4 ->
    // L1-normalized (2/3, 1/3); hub'(A) = 2/3+1/3 = 1, hub'(B) = 2/3 ->
    // normalized (3/5, 2/5). Pure-source nodes hold auth 0, sinks hub 0.
    val h = hitsOf(Seq(("A", "X"), ("A", "Y"), ("B", "X")), 1)
    assert(h("X")._2 == 2.0 / 3.0 && h("Y")._2 == 1.0 / 3.0)
    assert(math.abs(h("A")._1 - 0.6) < 1e-15 && math.abs(h("B")._1 - 0.4) < 1e-15)
    assert(h("A")._2 == 0.0 && h("B")._2 == 0.0)
    assert(h("X")._1 == 0.0 && h("Y")._1 == 0.0)
  }

  test("HITS: L1 mass is 1 on each side after every iteration; iterations=0 is uniform") {
    val edges = Seq(("A", "X"), ("A", "Y"), ("B", "X"), ("C", "A"), ("X", "C"))
    for (it <- 0 to 3) {
      val h = hitsOf(edges, it)
      val hubSum = h.values.map(_._1).sum
      val authSum = h.values.map(_._2).sum
      assert(math.abs(hubSum - 1.0) < 1e-12, s"hub mass $hubSum at iteration $it")
      assert(math.abs(authSum - 1.0) < 1e-12, s"auth mass $authSum at iteration $it")
    }
    val h0 = hitsOf(edges, 0)
    assert(h0.values.forall { case (hb, au) => hb == 0.2 && au == 0.2 })
  }

  test("HITS: a directory hub with many good out-links out-ranks a single-link hub") {
    // D links to every authority, E to one: hub(D) must dominate
    val edges = Seq(("D", "X"), ("D", "Y"), ("D", "Z"), ("E", "X"))
    val h = hitsOf(edges, 2)
    assert(h("D")._1 > h("E")._1)
    // X is pointed at by both hubs: top authority
    assert(h("X")._2 > h("Y")._2 && h("Y")._2 == h("Z")._2)
  }

  test("q136 corpus: raw hub/auth scores sit safely off the round(6) boundaries") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val site = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("source").as("src"),
        concat(lit("site"), (col("doc_id") % 20).cast("string"), lit(".example.com")).as("dst"))
    val bad = docs.filter(col("doc_id") % 3 === 0)
      .select(col("source").as("src"),
        concat(lit("blocked"), (col("doc_id") % 5).cast("string"), lit(".bad.net")).as("dst"))
    val raw = Graph.hits(site.union(bad), "src", "dst", iterations = 2)
      .select(col("hub"), col("auth")).as[(Double, Double)].collect()
      .flatMap(t => Seq(t._1, t._2))
    val minDist = raw.map { r =>
      val f = (r * 1e6) % 1.0
      math.abs(f - 0.5) * 1e-6
    }.min
    assert(minDist > 1e-10,
      f"a raw score sits $minDist%.2e from a round(6) boundary — " +
        "re-pick rounding or iterations for this corpus")
  }

  test("q103 corpus: raw ranks sit safely off the round(6) boundaries") {
    // The oracle compares round(rank, 6) across engines whose per-dst sums
    // can differ in the last ulp — measure the actual margins so a testdata
    // regeneration that lands a rank on a rounding boundary fails loudly
    // here instead of flaking the correctness gate.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val site = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("source").as("src"),
        concat(lit("site"), (col("doc_id") % 20).cast("string"), lit(".example.com")).as("dst"))
    val bad = docs.filter(col("doc_id") % 3 === 0)
      .select(col("source").as("src"),
        concat(lit("blocked"), (col("doc_id") % 5).cast("string"), lit(".bad.net")).as("dst"))
    val raw = Graph.pageRank(site.union(bad), "src", "dst", iterations = 2)
      .select(col("rank")).as[Double].collect()
    assert(raw.nonEmpty)
    val minDist = raw.map { r =>
      val f = (r * 1e6) % 1.0
      math.abs(f - 0.5) * 1e-6
    }.min
    assert(minDist > 1e-10,
      f"a raw rank sits $minDist%.2e from a round(6) boundary — " +
        "re-pick rounding or iterations for this corpus")
  }

  // ------------------------------------------------------------- triangles

  private def triRows(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Graph.triangles(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (n, d, t, c) => n -> (d, t, c) }.toMap

  test("triangles: K4 is all-triangles (3 per node, clustering 1), duplicates/reverses collapse") {
    // complete graph on {1,2,3,4}, with a reversed duplicate and a self-loop
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 2L), (2L, 2L))
    val r = triRows(k4)
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    r.values.foreach { case (deg, tri, cc) =>
      assert(deg == 3L && tri == 3L && cc == 1.0)
    }
  }

  test("triangles: a path has none; one chord closes exactly one") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(triRows(path).values.forall { case (_, t, c) => t == 0L && c == 0.0 })
    // chord 1-3 closes triangle {1,2,3} only
    val r = triRows(path :+ (1L, 3L))
    assert(r(1L)._2 == 1L && r(2L)._2 == 1L && r(3L)._2 == 1L && r(4L)._2 == 0L)
    // node 2: deg 2, 1 triangle -> clustering 1.0; node 3: deg 3 -> 1/3
    assert(r(2L)._3 == 1.0)
    assert(r(3L)._3 == math.rint(1.0 / 3.0 * 1e6) / 1e6)
  }

  // ----------------------------------------------------------- degree peel

  test("degreePeel: pendant chain peels off round by round, the clique survives") {
    // K4 on {1,2,3,4} + chain 4-5, 5-6
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    // k=2, 1 round: node 6 (deg 1) drops; 5 keeps deg 2 at eval time but
    // fell to 1 after the restriction -> dropped by the final filter
    val one = Graph.degreePeel(g, "src", "dst", k = 2, iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(one.keySet == Set(1L, 2L, 3L, 4L))
    // 2 rounds: same fixpoint; the clique keeps degree 3
    val two = Graph.degreePeel(g, "src", "dst", k = 2, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max degree empties the graph
    assert(Graph.degreePeel(g, "src", "dst", k = 5, iterations = 1).isEmpty)
  }

  test("linkAuthority: hand-computed PPR x clustering x core composition on a 2-source graph") {
    // s1 -> A,B,C (the seed, wide); s2 -> A,B,D. Co-citation edges:
    // {AB, AC, BC} from s1 plus {AB, AD, BD} from s2 = AB AC BC AD BD.
    // Degrees A=3 B=3 C=2 D=2; triangles ABC, ABD -> A,B in 2 each, C,D
    // in 1; clustering A=B=2/3, C=D=1. Core at k=2: everyone survives.
    // One PPR iteration from seed s1: contrib 1/3 to each of A,B,C;
    // rank = 0.85 * (1/3) there, D gets 0.
    val edges = Seq(("s1", "A"), ("s1", "B"), ("s1", "C"),
      ("s2", "A"), ("s2", "B"), ("s2", "D")).toDF("src", "dst")
    val r = Graph.linkAuthority(edges, "src", "dst", seeds = Seq("s1"),
      pprIterations = 1, coreK = 2, coreIterations = 1)
      .as[(String, Double, Double, Boolean, Double)].collect()
      .map { case (d, rk, cl, core, sc) => d -> ((rk, cl, core, sc)) }.toMap
    assert(r.keySet == Set("A", "B", "C", "D"))
    val rk = 0.85 * (1.0 / 3.0)
    val cl23 = graft.functions.Quantize.scaledFloorDouble(
      2.0 * 2 / (3 * 2).toDouble, 6)
    def score(rank: Double, clus: Double, core: Boolean) =
      graft.functions.Quantize.scaledFloorDouble(
        rank * (0.5 + 0.5 * clus) * (if (core) 1.0 else 0.5), 9)
    assert(r("A") == ((rk, cl23, true, score(rk, cl23, core = true))))
    assert(r("B") == ((rk, cl23, true, score(rk, cl23, core = true))))
    assert(r("C") == ((rk, 1.0, true, score(rk, 1.0, core = true))))
    assert(r("D") == ((0.0, 1.0, true, 0.0)))
    // raise the core bar to 3: C and D (degree 2) peel off, the surviving
    // restriction {A-B} leaves A,B at degree 1 < 3 — the core empties and
    // every score halves (the out-of-core factor)
    val r2 = Graph.linkAuthority(edges, "src", "dst", seeds = Seq("s1"),
      pprIterations = 1, coreK = 3, coreIterations = 1)
      .as[(String, Double, Double, Boolean, Double)].collect()
      .map { case (d, rk2, cl, core, sc) => d -> ((cl, core, sc)) }.toMap
    assert(r2.values.forall(!_._2))
    assert(r2("C")._3 == score(rk, 1.0, core = false))
    assert(r2("A")._3 == score(rk, cl23, core = false))
  }

  test("linkAuthority: maxOutDegree caps a directory-page hub's co-citation blow-up in-plan") {
    // "dir" is a directory page linking 20 domains — uncapped it would mint
    // C(20,2)=190 co-citation pairs (a clique); with maxOutDegree=3 only the
    // hub's 3 smallest 60-bit domain ids survive the projection, so exactly
    // 3 domains co-cite (C(3,2)=3 pairs) and the other 17 are isolated.
    val hubDoms = (0 until 20).map(i => s"h$i")
    val edges = hubDoms.map(d => ("dir", d)).toDF("src", "dst")
    // the kept 3 = smallest ids under the SAME md5 conv the operator uses
    val kept3 = hubDoms.toDF("d")
      .select(col("d"), conv(substring(md5(col("d")), 1, 15), 16, 10)
        .cast("long").as("id"))
      .orderBy(col("id")).limit(3).select(col("d")).as[String].collect().toSet

    val capped = Graph.linkAuthority(edges, "src", "dst", seeds = Seq("dir"),
        pprIterations = 1, coreK = 2, coreIterations = 2, maxOutDegree = 3)
      .as[(String, Double, Double, Boolean, Double)].collect()
      .map { case (d, rk, cl, core, sc) => d -> ((rk, cl, core)) }.toMap
    assert(capped.keySet == hubDoms.toSet) // domain dim stays UNCAPPED
    // co-citation signal exists ONLY inside the kept triangle
    assert(capped.filter(_._2._2 > 0.0).keySet == kept3)
    assert(kept3.forall(d => capped(d)._2 == 1.0 && capped(d)._3))
    assert((hubDoms.toSet -- kept3).forall(d => !capped(d)._3))
    // the PPR leg reads the UNCAPPED edges: every domain keeps seed proximity
    assert(capped.values.forall(_._1 > 0.0))

    // a bound above the hub's out-degree is a no-op (the q202-hash guarantee)
    val wide = Graph.linkAuthority(edges, "src", "dst", seeds = Seq("dir"),
        pprIterations = 1, coreK = 2, coreIterations = 2)
      .as[(String, Double, Double, Boolean, Double)].collect()
      .map { case (d, rk, cl, core, sc) => d -> ((cl, core)) }.toMap
    assert(hubDoms.forall(d => wide(d) == ((1.0, true))))

    intercept[IllegalArgumentException] {
      Graph.linkAuthority(edges, "src", "dst", Seq("dir"), 1, 2, 1,
        maxOutDegree = 0)
    }
  }

  test("labelPropagation: two bridged triangles settle into two communities by min label") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L)).toDF("s", "d")
    // hand-traced synchronous rounds with count-then-min-label argmax:
    // r1 [1,0,0,2,3,3]; r2 [0,0,0,3,2,2]; r3 [0,0,0,2,2,2]
    val got = Graph.labelPropagation(edges, "s", "d", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("modularity: two bridged triangles under the true partition score 6/7 - 1/2") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L)).toDF("s", "d")
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L),
      (3L, 2L), (4L, 2L), (5L, 2L)).toDF("node", "label")
    // m=7; intra 3+3=6; degree mass 7 per community -> Q = 6/7 - 98/196
    val got = Graph.modularity(edges, "s", "d", labels, "node", "label")
      .as[(Long, Long, Double)].head()
    assert(got._1 == 2L && got._2 == 7L)
    assert(got._3 == graft.functions.Quantize.scaledFloorDouble(6.0 / 7.0 - 0.5, 6))
    // everything in ONE community: Q = m/m - (2m)^2/(4m^2) = 0 exactly
    val one = labels.select(col("node"), lit(0L).as("label"))
    val q0 = Graph.modularity(edges, "s", "d", one, "node", "label")
      .as[(Long, Long, Double)].head()
    assert(q0._3 == 0.0)
  }

  test("labelPropagation: duplicates/reverses/self-loops collapse; an isolated pair 2-cycles by contract") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 1L), // dup + reverse + loop
      (7L, 8L)).toDF("s", "d")
    val one = Graph.labelPropagation(edges, "s", "d", iterations = 1)
      .as[(Long, Long)].collect().toMap
    // one round: each adopts its only neighbor's label (multiplicity ignored)
    assert(one == Map(0L -> 1L, 1L -> 0L, 7L -> 8L, 8L -> 7L))
    // the deterministic 2-cycle on a bipartite pair: odd rounds swap,
    // even rounds restore — the documented convergence-budget contract
    val two = Graph.labelPropagation(edges, "s", "d", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(two == Map(0L -> 0L, 1L -> 1L, 7L -> 7L, 8L -> 8L))
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(edges, "s", "d", iterations = 0)
    }
  }

  test("adamic-adar: path graph predicts the closing link with the 1/ln(deg) weight") {
    // 1-2-3: only non-adjacent pair sharing a neighbor is (1,3) through
    // node 2 (deg 2) -> AA = 1/ln(2); degree-1 endpoints generate no wedge
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val got = Graph.adamicAdar(edges, "s", "d")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 1L,
      graft.functions.Quantize.scaledFloorDouble(
        graft.functions.Quantize.scaledFloorDouble(1.0 / math.log(2.0), 9), 6))))
  }

  test("adamic-adar: existing edges are excluded; two shared neighbors sum terms") {
    // square 1-2-3-4-1: (1,3) share {2,4}, (2,4) share {1,3}; all degs 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val got = Graph.adamicAdar(edges, "s", "d")
      .as[(Long, Long, Long, Double)].collect().toSet
    val term = graft.functions.Quantize.scaledFloorDouble(1.0 / math.log(2.0), 9)
    val aa = graft.functions.Quantize.scaledFloorDouble(2 * term, 6)
    assert(got == Set((1L, 3L, 2L, aa), (2L, 4L, 2L, aa)))
  }

  test("adamic-adar: maxDegree drops super-hub generators entirely") {
    // star center 0 with leaves 1..3: all wedges go through 0 (deg 3)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    assert(Graph.adamicAdar(edges, "s", "d", maxDegree = 2).count() == 0L)
    assert(Graph.adamicAdar(edges, "s", "d", maxDegree = 3).count() == 3L)
    intercept[IllegalArgumentException](Graph.adamicAdar(edges, "s", "d", maxDegree = 1))
    intercept[IllegalArgumentException](Graph.adamicAdar(edges, "s", "d", topK = 0))
  }
}
