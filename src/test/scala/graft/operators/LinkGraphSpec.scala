package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("two-node cycle is stationary at rank = scale") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val ranks = LinkGraph.pageRank(edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // teleport 150e9 + 85% of 1e12 = exactly 1e12 every iteration
    assert(ranks == Map(0L -> 1000000000000L, 1L -> 1000000000000L))
  }

  test("dangling chain: hand-computed two iterations") {
    // a -> b; b dangles. iter1: a = teleport; b = teleport + 85% * scale.
    // iter2: b = teleport + (85 * rank1(a)) div 100.
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val t = 150000000000L
    val r1 = LinkGraph.pageRank(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(0L) == t && r1(1L) == t + 850000000000L)
    val r2 = LinkGraph.pageRank(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(0L) == t && r2(1L) == t + 85L * t / 100L)
  }

  test("rank mass never exceeds n * scale and ranks stay positive") {
    val docs = (0L until 64L).toDF("doc_id")
    val edges = LinkGraph.syntheticLinks(docs, k = 3, mult = 17L)
    val ranks = LinkGraph.pageRank(edges, iters = 5)
    val total = ranks.agg(sum("rank_fp")).head.getLong(0)
    assert(total <= 64L * 1000000000000L)
    assert(ranks.filter(col("rank_fp") <= 0).count() == 0)
  }

  test("syntheticLinks: k out-edges per node, targets in range") {
    val docs = (0L until 50L).toDF("doc_id")
    val edges = LinkGraph.syntheticLinks(docs, k = 3, mult = 17L)
    val degs = edges.groupBy("src").count().collect()
    assert(degs.length == 50 && degs.forall(_.getLong(1) == 3L))
    assert(edges.filter(col("dst") < 0 || col("dst") >= 50).count() == 0)
    // deterministic: same call twice gives the identical edge set
    val again = LinkGraph.syntheticLinks(docs, k = 3, mult = 17L)
    assert(edges.except(again).count() == 0 && again.except(edges).count() == 0)
  }

  test("personalized: spam cluster unreachable from seeds gets zero") {
    // seeds {0}; 0→1→2 trusted chain; 8↔9 a dense spam pair with no
    // path from the seed
    val edges = Seq((0L, 1L), (1L, 2L), (8L, 9L), (9L, 8L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val r = LinkGraph.pageRankPersonalized(edges, seeds, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > 0 && r(1L) > 0 && r(2L) > 0)
    assert(r(8L) == 0 && r(9L) == 0)
    // trust decays with distance from the seed
    assert(r(0L) > r(1L) && r(1L) > r(2L))
  }

  test("warm-start continues the same recurrence: warm(r3, 2) == cold(5)") {
    val docs = (0L until 40L).toDF("doc_id")
    val edges = LinkGraph.syntheticLinks(docs, k = 3, mult = 17L)
    val r3 = LinkGraph.pageRank(edges, iters = 3)
    val warm = LinkGraph.pageRankWarmStart(edges, r3, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = LinkGraph.pageRank(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm == cold)
  }

  test("warm-start: nodes newly discovered start at the teleport floor") {
    // prev knows only node 0; edge 0→1 introduces node 1
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val prev = Seq((0L, 999000000000L)).toDF("id", "rank_fp")
    val r = LinkGraph.pageRankWarmStart(edges, prev, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // node 0: no in-edges → teleport; node 1: teleport + 85% of prev(0)
    assert(r(0L) == 150000000000L)
    assert(r(1L) == 150000000000L + 85L * 999000000000L / 100L)
  }

  test("pageRank IS personalized with seeds = all nodes") {
    val docs = (0L until 40L).toDF("doc_id")
    val edges = LinkGraph.syntheticLinks(docs, k = 3, mult = 17L)
    val all = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val a = LinkGraph.pageRank(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LinkGraph.pageRankPersonalized(edges, all, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  private def tri(edges: Seq[(Long, Long)]): Long =
    LinkGraph.triangleCount(edges.toDF("src", "dst"))
      .head.getLong(0)

  test("triangle count: known graphs") {
    assert(tri(Seq((0L, 1L), (1L, 2L), (2L, 0L))) == 1) // one triangle
    assert(tri(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))) == 0) // square
    // K4 = 4 triangles; edges given in mixed directions with a duplicate
    // and a self-loop — canonicalization must absorb all of it
    val k4 = Seq((0L, 1L), (0L, 2L), (3L, 0L), (1L, 2L), (3L, 1L),
      (2L, 3L), (2L, 1L), (2L, 2L))
    assert(tri(k4) == 4)
  }

  test("triangle count: hub graph (star) has none, star+rim has spokes") {
    val star = (1L to 6L).map(i => (0L, i))
    assert(tri(star) == 0)
    // close the rim 1-2: exactly one triangle (0,1,2)
    assert(tri(star :+ (1L, 2L)) == 1)
  }

  test("higher in-degree wins: a hub out-ranks a leaf") {
    // everyone links to node 0; node 0 links to 1
    val edges = ((1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val ranks = LinkGraph.pageRank(edges, iters = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0L) > ranks(2L) && ranks(1L) > ranks(2L))
  }

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8) =
    LinkGraph.kCore(edges.toDF("src", "dst"), k, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: a 4-clique with a tail keeps exactly the clique at k=3") {
    val clique = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val tail = Seq((3L, 4L), (4L, 5L))
    assert(core(clique ++ tail, k = 3) ==
      Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("kCore: peeling cascades — a path empties at k=2") {
    // endpoints have degree 1 → removed; removal exposes new endpoints
    // every round; a 6-path needs 3 peel rounds to vanish entirely
    val path = (0L until 6L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(core(path, k = 2).isEmpty)
    // a cycle is its own 2-core: no endpoints, nothing peels
    val cycle = path :+ (5L, 0L)
    assert(core(cycle, k = 2) == (0L to 5L).map(_ -> 2L).toMap)
  }

  test("kCore: rounds past convergence are no-ops; direction/dups ignored") {
    val clique = for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b)
    val r3 = core(clique, k = 3, rounds = 3)
    val r9 = core(clique, k = 3, rounds = 9)
    assert(r3 == r9 && r3.values.forall(_ == 3L))
  }

  test("syntheticHubLinks plant a k-core the base graph lacks") {
    val docs = (0L until 500L).toDF("doc_id")
    val base = LinkGraph.syntheticLinks(docs, k = 3, mult = 17L)
    val withHub = base.unionAll(
      LinkGraph.syntheticHubLinks(docs, every = 10, k = 5))
    assert(LinkGraph.kCore(base, k = 6, rounds = 8).count() == 0)
    val planted = LinkGraph.kCore(withHub, k = 6, rounds = 8)
    // the planted circulant block (ids ≡ 0 mod 10) survives
    assert(planted.count() == 50)
    assert(planted.filter(col("id") % 10 =!= 0).count() == 0)
  }

  test("redistributeDangling restores textbook semantics on a chain") {
    // 0 -> 1 -> 2; node 2 dangles. Hand-computed with the integer
    // recurrence (teleport 150e9, damp 85, share = D div 3):
    //   iter1: D = 1e12, share = 333333333333
    //     r(0) = t + 85*share div 100                 = 433333333333
    //     r(1) = t + 85*(1e12 + share) div 100        = 1283333333333
    //     r(2) = r(1)
    //   iter2: D = 1283333333333, share = 427777777777
    //     r(0) = 513611111110, r(1) = 881944444443, r(2) = 1604444444443
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val r2 = LinkGraph.pageRank(edges, iters = 2,
        redistributeDangling = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(0L -> 513611111110L, 1L -> 881944444443L,
      2L -> 1604444444443L))
    // textbook invariant the leak variant loses: total mass is conserved
    // (up to integer-div truncation, < 4 units here vs 1.57e12 leaked)
    assert(math.abs(r2.values.sum - 3000000000000L) < 8)
    val leak = LinkGraph.pageRank(edges, iters = 2).collect()
      .map(_.getLong(1)).sum
    assert(leak == 1427500000000L, "leak variant (the oracle face) moved")
  }

  test("redistributeDangling with an empty teleport set does not divide by zero") {
    // dampPct = 100 zeroes every node's teleport mass, so nSeeds = 0 and
    // the dangling share has no distribution to land in — must fall back
    // to the documented leak, not throw ArithmeticException
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val out = LinkGraph.pageRank(edges, iters = 2, dampPct = 100,
      redistributeDangling = true).collect()
    assert(out.length == 3)
    // and a personalized seed set disjoint from the graph's nodes
    val seeds = Seq(99L).toDF("id")
    val p = LinkGraph.pageRankPersonalized(edges, seeds, iters = 1,
      redistributeDangling = true).collect()
    assert(p.nonEmpty)
  }

  test("bfsDepth: layered chain, unreached absent, shortest wins") {
    // 0→1→2→3→4 chain plus a shortcut 0→3; 9 isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L),
      (8L, 9L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = LinkGraph.bfsDepth(edges, seeds, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 is depth 1 via the shortcut (not 3 via the chain); 4 is 2
    assert(got == Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L, 4L -> 2L))
    // maxDepth 0 = just the seeds
    val d0 = LinkGraph.bfsDepth(edges, seeds, maxDepth = 0)
      .collect().map(_.getLong(0)).toSet
    assert(d0 == Set(0L))
  }

  test("hits: star graph separates the hub and authority roles exactly") {
    // 1,2,3 all point to 0: 0 is the pure authority, 1-3 pure hubs.
    // Hand-replay of the integer recurrence (scale S = 1e9):
    //   iter1: rawAuth(0)=3S, div=3 → auth(0)=S; rawHub(1..3)=S, div=3
    //          → hub=S/3=333333333
    //   iter2: rawAuth(0)=3*333333333=999999999, div=max(0,1)=1;
    //          rawHub(1..3)=999999999 each, total=2999999997, div=2
    //          → hub=499999999
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val r = LinkGraph.hits(edges, iters = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) == (999999999L, 0L))
    assert(Seq(1L, 2L, 3L).forall(i => r(i) == (0L, 499999999L)))
  }

  test("hits: symmetric bipartite graph gives equal scores per side") {
    val edges = Seq((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L))
      .toDF("src", "dst")
    val r = LinkGraph.hits(edges, iters = 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) == r(1L) && r(2L) == r(3L))
    assert(r(2L)._1 > 0 && r(2L)._2 == 0) // right side: authorities only
    assert(r(0L)._2 > 0 && r(0L)._1 == 0) // left side: hubs only
  }

  test("hits: deterministic under repartitioning, scores non-negative, " +
       "L1 mass inside the 2x renorm band") {
    val docs = (0L until 64L).toDF("doc_id")
    val edges = LinkGraph.syntheticLinks(docs, k = 3, mult = 17L)
    val a = LinkGraph.hits(edges, iters = 3).orderBy("id").collect()
    val b = LinkGraph.hits(edges.repartition(7), iters = 3)
      .orderBy("id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(2) >= 0))
    // renorm divides by q = max(total div scale, 1): post-norm L1 total
    // ≤ total/q = scale + r/q < 2·scale (division-only renorm trades a
    // ≤2× mass band for overflow-freedom at any graph size)
    val authSum = a.map(_.getLong(1)).sum
    val hubSum = a.map(_.getLong(2)).sum
    assert(authSum < 2000000000L && hubSum < 2000000000L)
  }

  private def lpaMap(edges: org.apache.spark.sql.DataFrame, iters: Int) =
    LinkGraph.labelPropagation(edges, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: two bridged triangles, hand-simulated rounds") {
    // triangles {0,1,2} and {3,4,5}, bridge 2-3 (undirected semantics)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L)).toDF("src", "dst")
    // round 1 from labels=id: every neighbor label is distinct (cnt ties),
    // so each node adopts its MIN neighbor label
    assert(lpaMap(edges, 1) ==
      Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 3L, 5L -> 3L))
    // by round 4 the left triangle settles on 0 and the right on 2 (the
    // bridge pulls label 2, not 3 — min-label tie-breaking)
    assert(lpaMap(edges, 4) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("labelPropagation: synchronous two-node oscillation is pinned") {
    // a single undirected edge swaps labels every synchronous round —
    // the documented determinism contract (fixed iters, not convergence)
    val edges = Seq((7L, 9L)).toDF("src", "dst")
    assert(lpaMap(edges, 1) == Map(7L -> 9L, 9L -> 7L))
    assert(lpaMap(edges, 2) == Map(7L -> 7L, 9L -> 9L))
  }

  test("labelPropagation: planted blocks recovered exactly") {
    // block=5, k=2 makes each block a clique on 5 nodes (ring distance
    // ≤2 covers all pairs): one round converges every block to its min id
    val docs = (0L until 15L).toDF("doc_id")
    val edges = LinkGraph.syntheticBlockLinks(docs, block = 5, k = 2)
    val r = lpaMap(edges, 2)
    assert(r == (0L until 15L).map(i => i -> (i / 5) * 5).toMap)
  }

  test("labelPropagation: deterministic under repartitioning") {
    val docs = (0L until 100L).toDF("doc_id")
    val edges = LinkGraph.syntheticBlockLinks(docs, block = 10, k = 2)
    val a = LinkGraph.labelPropagation(edges, 3).orderBy("id").collect()
    val b = LinkGraph.labelPropagation(edges.repartition(7), 3)
      .orderBy("id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("syntheticBlockLinks: k out-edges per node, block-local targets") {
    val docs = (0L until 23L).toDF("doc_id") // deliberately partial block
    val e = LinkGraph.syntheticBlockLinks(docs, block = 10, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.length == 23 * 3)
    assert(e.forall { case (s, d) => s / 10 == d / 10 && s != d })
  }
}
