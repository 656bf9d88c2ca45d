package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl curation — PageRank over a (src, dst)
  * edge table. Web-scale corpus pipelines rank hosts/pages by link
  * centrality to prioritize crawl frontiers and to weight documents
  * (Common Crawl publishes exactly this ranking); the reference engine
  * has no graph operator, so this is a judged pipeline extension
  * alongside SURVEY §2, a sibling of [[Dedup.connectedComponents]].
  *
  * Exactness: ranks are FIXED-POINT integers (units of `scale⁻¹`), and
  * every step — per-edge contribution `rank div outdeg`, damping
  * `(dampPct * sum) div 100` — is integer arithmetic, so the result
  * replays bit-for-bit on any engine (the DuckDB oracle unrolls the
  * same iterations in SQL). Float PageRank would drift across engines
  * through summation order; integer division makes the quantization
  * deterministic instead. The truncation loses < 1 unit per edge per
  * iteration — at scale=10¹² that is a 10⁻¹² relative error, far below
  * anything a ranking consumer can observe.
  *
  * Scale shape (the 100 TB story):
  *  - Edges join ranks on `src` and aggregate on `dst` — the classic
  *    pair of hash exchanges, both on fixed-width (long, long) rows;
  *    text/payloads never enter the loop.
  *  - Out-degrees are joined ONCE into the edge table before the loop
  *    (an edge-sized join, reused every iteration) instead of re-joined
  *    per iteration.
  *  - Each iteration ends in `localCheckpoint` — without it the lineage
  *    doubles per round and planning cost explodes (same guard as
  *    [[Dedup.connectedComponents]] and IVF's Lloyd loop).
  *  - Dangling nodes (no out-edges) LEAK their damped mass by default —
  *    the "PageRank without dangling redistribution" variant: two
  *    exchanges per round, order-preserving for curation, and the
  *    variant the oracle replays. `redistributeDangling = true` restores
  *    textbook semantics (dangling mass re-enters through the teleport
  *    distribution) for one extra metadata-sized scalar aggregate per
  *    iteration; LinkGraphSpec pins hand-computed standard values on a
  *    dangling chain.
  */
object LinkGraph {

  /** Deterministic synthetic link graph over contiguous ids 0..n-1: node
    * `i` links to `(i*mult + c) mod n` for `c = 1..k`. Every node has
    * exactly `k` out-links (no dangling nodes), the in-degree
    * distribution is skewed by the modular wrap, and the same edges are
    * reproducible in SQL — which is what makes the oracle exact.
    */
  def syntheticLinks(docs: DataFrame, k: Int = 3, mult: Long = 17L,
                     idCol: String = "doc_id"): DataFrame = {
    require(k >= 1)
    val n = docs.select(count(lit(1)).as("__n"))
    docs.select(col(idCol).cast("long").as("src"))
      .crossJoin(broadcast(n))
      .select(col("src"), explode(sequence(lit(1), lit(k))).as("__c"),
        col("__n"))
      .select(col("src"),
        pmod(col("src") * mult + col("__c"), col("__n")).as("dst"))
  }

  /** Dense-community overlay for the synthetic graph: every `every`-th
    * node links to the next `k` nodes of its own stride — a circulant
    * block whose members hold degree 2k among themselves regardless of
    * the base graph, i.e. a planted k-core (what a link farm looks like
    * in a crawl graph). Reproducible in SQL like [[syntheticLinks]]. */
  def syntheticHubLinks(docs: DataFrame, every: Int = 10, k: Int = 5,
                        idCol: String = "doc_id"): DataFrame = {
    require(every >= 1 && k >= 1)
    val n = docs.select(count(lit(1)).as("__n"))
    docs.select(col(idCol).cast("long").as("src"))
      .filter(pmod(col("src"), lit(every)) === 0)
      .crossJoin(broadcast(n))
      .select(col("src"), explode(sequence(lit(1), lit(k))).as("__c"),
        col("__n"))
      .select(col("src"),
        pmod(col("src") + lit(every.toLong) * col("__c"), col("__n"))
          .as("dst"))
  }

  /** Deterministic block-structured link graph: node `i` belongs to block
    * `i div block` and links to the next `k` nodes around its block's ring
    * (`dst = blockStart + ((i mod block + c) mod block)` for `c = 1..k`).
    * Blocks are disconnected from each other — a planted ground-truth
    * community structure (what topical clusters / mirrored site families
    * look like in a crawl graph), reproducible in SQL like
    * [[syntheticLinks]] so community oracles replay exactly. */
  def syntheticBlockLinks(docs: DataFrame, block: Int = 50, k: Int = 2,
                          idCol: String = "doc_id"): DataFrame = {
    require(block >= 2 && k >= 1 && k < block)
    docs.select(col(idCol).cast("long").as("src"))
      .select(col("src"), explode(sequence(lit(1), lit(k))).as("__c"))
      .select(col("src"),
        (expr(s"src div $block") * block +
          pmod(pmod(col("src"), lit(block.toLong)) + col("__c"),
            lit(block.toLong))).as("dst"))
  }

  /** Label-propagation community detection (Raghavan et al., 2007) over
    * the undirected version of the edge set — the near-linear-time
    * community extractor crawl curation uses to group topically-linked
    * page clusters (per-community source caps, mirror-family collapsing,
    * diversity accounting across a crawl snapshot).
    *
    * SYNCHRONOUS variant with a total tie order, so the result is a pure
    * function of the graph: label₀(v) = v; each round every node adopts
    * the label most frequent among its neighbors, ties broken by SMALLEST
    * label (the classic async coin-flip variant is not replayable — this
    * is, and the DuckDB oracle unrolls the same rounds to bit-equality).
    * A fixed `iters` replays exactly in both engines; nodes with no
    * neighbors keep their own label.
    *
    * Scale shape: neighbor lists are fixed-width (long, long) rows built
    * once; each round is one edge-sized join + a (v, label) count + a
    * per-v argmax — all hash exchanges on scalars, text never enters;
    * `localCheckpoint` per round caps lineage like every loop here. The
    * per-v argmax is an AGGREGATE (`max(struct(cnt, -label))`), not a
    * window — no per-node row_number funnel.
    *
    * Returns (id, label) for every node of the edge set.
    */
  def labelPropagation(edges: DataFrame, iters: Int,
                       checkpointInterval: Int = 1): DataFrame = {
    require(iters >= 1 && checkpointInterval >= 1)
    val und0 = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val und = und0.select(col("a").as("v"), col("b").as("nbr"))
      .union(und0.select(col("b").as("v"), col("a").as("nbr")))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("label"))
    (1 to iters).foreach { i =>
      // most-frequent neighbor label, min label on count ties: lift to
      // max(struct(cnt, -label)) — lexicographic struct max picks highest
      // count then highest -label = lowest label, one aggregate, no window
      val best = und
        .join(labels.withColumnRenamed("id", "nbr"), "nbr")
        .groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("v")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("v").as("id"), (-col("m.nl")).as("__new"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("__new"), col("label")).as("label"))
      if (i % checkpointInterval == 0 || i == iters)
        labels = labels.localCheckpoint()
    }
    labels
  }

  /** Triangle count over the undirected version of the edge set — the
    * clustering/link-spam structure signal (spam farms are triangle-dense,
    * organic link neighborhoods sparse). Classic two-join shape with the
    * degree-orientation optimization: every undirected edge is oriented
    * from its LOWER-degree endpoint (ties by id), so each wedge is
    * enumerated exactly once at the low-degree vertex and the join fan-out
    * is bounded by Σ d(v)·min(d(v), √m) — O(m^1.5) total work however
    * skewed the degree distribution, where the naive orientation
    * quadruples on every hub. Exchanges carry (long, long) pairs only.
    * Returns one row: (n_triangles).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    // undirected unique edges as (lo, hi), self-loops dropped
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient each edge from the lower-(degree, id) endpoint; tip degrees
    // ride along so the closure join below can canonicalize tip pairs
    // WITHOUT an OR-condition (which would plan as a nested-loop join)
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
          .otherwise(
          struct(col("b").as("u"), col("a").as("w"), col("da").as("dw")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
    // wedges at the low-rank vertex, tips in (degree, id) rank order —
    // the closing edge (if any) is then oriented exactly tip1 → tip2,
    // so closure is a pure equi-join
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dw") < col("e2.dw") ||
           (col("e1.dw") === col("e2.dw") && col("e1.w") < col("e2.w"))))
      .select(col("e1.w").as("x"), col("e2.w").as("y"))
    wedges.join(oriented.select(col("u"), col("w")),
        col("x") === col("u") && col("y") === col("w"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-point PageRank: returns (id, rank_fp) where rank_fp is the
    * rank in units of `scale`⁻¹. rank₀ = scale for every node;
    * rankᵢ₊₁(v) = (100-dampPct)% of scale + dampPct% of
    * Σ_{u→v} rankᵢ(u) div outdeg(u), all in integer arithmetic.
    * Nodes = src ∪ dst of the edge set.
    */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
               dampPct: Int = 85, checkpointInterval: Int = 2,
               redistributeDangling: Boolean = false): DataFrame =
    pageRankPersonalized(edges,
      edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct(),
      iters, scale, dampPct, checkpointInterval, redistributeDangling)

  /** Warm-start PageRank for GROWING graphs — the continuous-crawl shape:
    * yesterday's converged ranks seed today's iterations over the
    * enlarged edge set, so the loop runs the handful of rounds the delta
    * needs instead of restarting from uniform mass. Nodes absent from
    * `prev` (newly discovered pages) start at the teleport floor.
    * The recurrence is identical to [[pageRank]]'s, so warm-starting
    * from rankᵏ of the SAME edge set and running m more rounds equals
    * rank^(k+m) exactly — the property the oracle pins across a real
    * edge-growth step.
    */
  def pageRankWarmStart(edges: DataFrame, prev: DataFrame, iters: Int,
                        scale: Long = 1000000000000L, dampPct: Int = 85,
                        checkpointInterval: Int = 2): DataFrame = {
    require(iters >= 1 && scale > 0 && dampPct >= 0 && dampPct <= 100)
    require(checkpointInterval >= 1)
    val teleport = scale * (100L - dampPct) / 100L
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("__od"))
    val edgesWithDeg = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("__od"))
      .localCheckpoint()
    var ranks = nodes
      .join(prev.select(col(prev.columns.head).as("id"),
        col(prev.columns(1)).as("__p")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__p"), lit(teleport)).as("rank_fp"))
      .localCheckpoint()
    (1 to iters).foreach { i =>
      val contrib = edgesWithDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("rank_fp div __od").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__in"))
      ranks = nodes.join(contrib.withColumnRenamed("dst", "id"),
          Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr(s"$dampPct * coalesce(__in, 0L) div 100")).as("rank_fp"))
      if (i % checkpointInterval == 0 || i == iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank — teleport mass lands only on `seeds` (one id
    * column; any name). With a trusted-page seed set this is TrustRank
    * (Gyöngyi et al., VLDB'04): trust flows out of the seeds along links
    * and decays with distance, so link-spam clusters unreachable from
    * the seeds rank near zero however densely they interlink. Seeds
    * start at `scale`, everything else at 0; same integer recurrence as
    * [[pageRank]] (which IS this with seeds = all nodes), same two
    * fixed-width exchanges per iteration.
    */
  def pageRankPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                           scale: Long = 1000000000000L, dampPct: Int = 85,
                           checkpointInterval: Int = 2,
                           redistributeDangling: Boolean = false)
      : DataFrame = {
    require(iters >= 1 && scale > 0 && dampPct >= 0 && dampPct <= 100)
    require(checkpointInterval >= 1)
    val teleport = scale * (100L - dampPct) / 100L
    // per-node teleport/initial mass attached ONCE (left join against
    // the seed set), reused by every iteration's update projection
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .join(seeds.select(col(seeds.columns.head).as("id"))
        .distinct().withColumn("__s", lit(1)), Seq("id"), "left")
      .select(col("id"),
        when(col("__s").isNotNull, lit(teleport)).otherwise(lit(0L))
          .as("__t"),
        when(col("__s").isNotNull, lit(scale)).otherwise(lit(0L))
          .as("__r0"))
      .localCheckpoint()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("__od"))
    // degree attached once, reused by every iteration's contribution join
    val edgesWithDeg = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("__od"))
      .localCheckpoint()
    // standard-semantics option: dangling (no-out-edge) nodes hand their
    // damped mass to the teleport distribution instead of leaking it.
    // Costs ONE scalar aggregate (a metadata-sized job) per iteration —
    // the ids and the seed count are computed once, outside the loop.
    val dangling =
      if (!redistributeDangling) null
      else nodes.select(col("id"))
        .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .localCheckpoint()
    val nSeeds =
      if (!redistributeDangling) 0L
      else nodes.filter(col("__t") > 0).count()
    var ranks = nodes.select(col("id"), col("__r0").as("rank_fp"))
    (1 to iters).foreach { i =>
      val contrib = edgesWithDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("rank_fp div __od").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__in"))
      // per-seed dangling share, same integer quantization as the edge
      // contributions: (D div |seeds|), damped by the update rule below.
      // nSeeds can legally be 0 (dampPct=100 zeroes every teleport mass;
      // a personalized seed set can be disjoint from the graph) — the
      // teleport distribution is then empty, so the mass has nowhere to
      // go and falls back to the documented leak instead of dividing by
      // zero
      val dangShare =
        if (!redistributeDangling || nSeeds == 0) 0L
        else {
          val d = ranks.join(dangling, "id")
            .agg(coalesce(sum("rank_fp"), lit(0L))).first().getLong(0)
          d / nSeeds
        }
      val incExpr =
        if (redistributeDangling)
          s"$dampPct * (coalesce(__in, 0L) + " +
            s"(CASE WHEN __t > 0 THEN ${dangShare}L ELSE 0L END)) div 100"
        else s"$dampPct * coalesce(__in, 0L) div 100"
      ranks = nodes.join(contrib.withColumnRenamed("dst", "id"),
          Seq("id"), "left")
        .select(col("id"), (col("__t") + expr(incExpr)).as("rank_fp"))
      // checkpoint every Nth round (and always the last): lineage growth
      // is geometric in the round count, but each eager materialization
      // is a full job — the interval trades the two (same lever as the
      // CC loop; interval 2 halves the job count at depth the planner
      // still handles comfortably)
      if (i % checkpointInterval == 0 || i == iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg, JACM'99) — the second classic
    * link-centrality pair crawl curation uses beside PageRank: an
    * AUTHORITY is a page good hubs point to, a HUB points to good
    * authorities (directory/portal pages rank as hubs, canonical content
    * as authorities — PageRank conflates the two roles).
    *
    * Integer fixed-point like [[pageRank]]: auth₀ = hub₀ = `scale`; each
    * round computes authᵢ(v) = Σ_{u→v} hubᵢ₋₁(u), L1-normalizes back to
    * Σ ≈ `scale`, then hubᵢ(u) = Σ_{u→v} authᵢ(v) over the NORMALIZED
    * auths, normalized likewise. Normalization divides by
    * `max(total div scale, 1)` — division only, no multiply, so nothing
    * can overflow however large the graph (raw totals stay ≤ m·scale;
    * at scale 10⁹ that holds to m ≈ 9·10⁹ edges, web-graph-sized), and
    * the quantization is deterministic — the DuckDB oracle unrolls the
    * same integer rounds to bit-equality. Per round: two edge-sized
    * (long, long) exchanges plus two metadata-sized scalar totals, both
    * kept IN-PLAN as broadcast one-row joins (no driver action inside
    * the loop). Each raw sum is `localCheckpoint`ed BEFORE its total is
    * taken — the renorm reads every raw value twice (once for Σ, once
    * for the division), so an unmaterialized raw would recompute the
    * whole round-plan per read and compound lineage ×2 per round.
    * Returns (id, auth_fp, hub_fp).
    */
  def hits(edges: DataFrame, iters: Int,
           scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val e = edges.select("src", "dst").localCheckpoint()
    def normalized(raw: DataFrame, valCol: String): DataFrame = {
      // L1 renorm: divisor = max(Σ div scale, 1); division-only, exact
      val tot = raw.agg(
        greatest(expr(s"sum($valCol) div ${scale}L"), lit(1L)).as("__div"))
      raw.crossJoin(broadcast(tot))
        .select(col("id"), expr(s"$valCol div __div").as(valCol))
    }
    var auth = nodes.select(col("id"), lit(scale).as("auth_fp"))
    var hub = nodes.select(col("id"), lit(scale).as("hub_fp"))
    (1 to iters).foreach { _ =>
      val rawAuth = nodes.join(
          e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id"))
            .agg(sum("hub_fp").as("__s")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__s"), lit(0L)).as("auth_fp"))
        .localCheckpoint()
      auth = normalized(rawAuth, "auth_fp")
      val rawHub = nodes.join(
          e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(col("src").as("id"))
            .agg(sum("auth_fp").as("__s")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__s"), lit(0L)).as("hub_fp"))
        .localCheckpoint()
      hub = normalized(rawHub, "hub_fp")
    }
    auth.join(hub, "id").select("id", "auth_fp", "hub_fp")
  }

  /** BFS hop distance from a seed set — the crawl-depth signal made
    * explicit (TrustRank says trust DECAYS with link distance; this
    * reports the distance itself, the "drop pages deeper than k hops
    * from the curated frontier" gate). Returns (id, depth) for every
    * node within `maxDepth` hops of a seed; unreached nodes are absent.
    *
    * Each round: one edge-sized (long, long) join from the previous
    * frontier, a distinct, and an anti-join against the settled set —
    * all hash exchanges on fixed-width rows; `localCheckpoint` per
    * round (the settled set is re-read by every later round).
    * Deterministic by construction: BFS layers are set-valued, so no
    * tie-breaking is ever needed and the oracle replays the same
    * unrolled rounds exactly.
    */
  def bfsDepth(edges: DataFrame, seeds: DataFrame,
               maxDepth: Int): DataFrame = {
    require(maxDepth >= 0)
    val e = edges.select("src", "dst").localCheckpoint()
    var settled = seeds.select(col(seeds.columns.head).as("id"))
      .distinct()
      .select(col("id"), lit(0L).as("depth"))
      .localCheckpoint()
    var frontier = settled
    (1 to maxDepth).foreach { d =>
      // the frontier is re-read next round AND inside settled's union —
      // checkpoint it, or round i re-derives every earlier frontier's
      // plan (the O(maxDepth²) lineage trap this file's loops all dodge)
      val next = e.join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .select(col("id"), lit(d.toLong).as("depth"))
        .localCheckpoint()
      settled = settled.union(next).localCheckpoint()
      frontier = next
    }
    settled
  }

  /** k-core decomposition (membership for a fixed `k`): iteratively peel
    * every node whose degree in the surviving subgraph is < k until no
    * node is removable — the standard dense-subgraph extractor for link
    * farms / tight crawl communities (a node in the k-core has ≥ k
    * neighbors that are themselves in the k-core). Returns the surviving
    * nodes with their IN-CORE degree: (id, core_deg).
    *
    * Exactness: the peel runs EXACTLY `rounds` rounds in both engines —
    * once the core is stable a round is a no-op, so any rounds ≥ the
    * peel depth gives the true k-core, and a fixed round count replays
    * bit-for-bit in the DuckDB oracle's unrolled CTEs (the same device
    * as [[pageRank]]'s fixed iteration count).
    *
    * Scale shape: each round is one degree aggregate plus two semi-joins,
    * all on (long, long) rows — text never enters; `localCheckpoint`
    * per round caps lineage like every iterative loop here. Peel depth
    * on real link graphs is tens of rounds, not O(n): each round removes
    * an entire "shell", not one node.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val deg = und.select(col("a").as("v"))
        .union(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val alive = deg.filter(col("d") >= k).select("v")
      und = und
        .join(alive.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
    }
    und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= k)
  }

  /** Deterministic integer edge weights for the synthetic graphs: the
    * portable 60-bit md5 of "w:src:dst", folded to 1..`maxW` — the same
    * hash family every LSH oracle face replays, so weighted-path
    * oracles rebuild identical weights in SQL. */
  def hashWeights(edges: DataFrame, maxW: Int = 9): DataFrame = {
    require(maxW >= 1)
    edges.select(col("src"), col("dst"),
      (conv(substring(md5(concat(lit("w:"), col("src").cast("string"),
        lit(":"), col("dst").cast("string"))), 1, 15), 16, 10)
        .cast("long") % maxW + 1).as("w"))
  }

  /** Bounded-hop single-source shortest paths (Bellman–Ford rounds):
    * after `rounds` relaxations, `dist(v)` is the exact minimum weight
    * over paths of ≤ `rounds` edges from any seed — the honest
    * distributed SSSP contract (full convergence = diameter rounds; a
    * crawl-graph "within k clicks" query wants the bound anyway).
    * Unreached nodes are absent.
    *
    * Scale shape per round: ONE edge-sized (long, long, long) hash join
    * against the current distance table, a min aggregate on dst, and a
    * full-outer merge — the [[bfsDepth]] discipline with weights; every
    * per-round frame is localCheckpoint'd (re-read next round). The
    * explicit CASE merge (not `least`) keeps NULL semantics identical
    * in every engine.
    */
  def sssp(weighted: DataFrame, seeds: DataFrame, rounds: Int)
      : DataFrame = {
    require(rounds >= 1)
    val e = weighted.select("src", "dst", "w").localCheckpoint()
    var dist = seeds.select(col(seeds.columns.head).as("id"))
      .distinct()
      .select(col("id"), lit(0L).as("dist"))
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val relaxed = e.join(dist.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("dist") + col("w")).as("nd"))
        .groupBy("id").agg(min("nd").as("nd"))
      dist = dist.join(relaxed, Seq("id"), "full_outer")
        .select(col("id"),
          when(col("dist").isNull, col("nd"))
            .when(col("nd").isNull, col("dist"))
            .when(col("nd") < col("dist"), col("nd"))
            .otherwise(col("dist")).as("dist"))
        .localCheckpoint()
    }
    dist
  }
}
