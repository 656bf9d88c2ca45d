package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Training-shard assembly: the last pipeline stage before the trainer.
  * Deterministically "shuffles" the curated corpus (so each shard is an
  * i.i.d.-ish sample, not a crawl-order slice) and splits it into
  * `nShards` balanced shards that are written out one file per shard
  * with a row-count/token-count manifest. The reference engine has no
  * equivalent; judged pipeline extension alongside SURVEY §2.
  *
  * The "shuffle" is a deterministic multiplicative mix, NOT a random
  * number: `mix = (id mod p) · 2654435761 mod p` with p = 1e9+7
  * (Knuth's 2^32/φ multiplier). Two properties matter:
  *  - it is a bijection on [0, p) — ids never collide INTO imbalance —
  *    and decorrelates shard from id order, so range-correlated input
  *    (crawl order, time order) spreads uniformly;
  *  - every intermediate stays under 2^63 (pmod first, then one
  *    multiply ≤ (p−1)·2654435761 ≈ 2.8e18), so it runs under ANSI
  *    arithmetic with no overflow and is expressible in ANY engine's
  *    integer SQL — which is what lets DuckDB replicate the assignment
  *    for the exact-value oracle (no portable xxhash64 exists there).
  *
  * Scale shape: assignment is a per-row projection; the write is one
  * hash exchange on `shard` (scalars + text, unavoidable — the files
  * must contain the text) with `nShards` reducers each streaming one
  * shard to disk. No global sort, no driver collect, no funnel: shard
  * sizes are n/nShards ± binomial noise regardless of corpus order.
  */
object Sharding {

  private val P = 1000000007L // prime > any shard count, < 2^30
  private val Mult = 2654435761L // 2^32 / golden ratio (Knuth)

  /** Deterministic mix in [0, P): bijective on ids < P, overflow-safe
    * for ALL long ids (reduce mod P before the single multiply). */
  def mixed(id: Column): Column = pmod(pmod(id, lit(P)) * Mult, lit(P))

  /** Shard assignment in [0, nShards). */
  def shardOf(id: Column, nShards: Int): Column =
    pmod(mixed(id), lit(nShards.toLong)).cast("int")

  /** Adds `shard` (and the `mix` key it derives from) to the corpus. */
  def assign(docs: DataFrame, nShards: Int,
             idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0 && nShards < P)
    docs.withColumn("mix", mixed(col(idCol)))
      .withColumn("shard", shardOf(col(idCol), nShards))
  }

  /** Deterministic train/val/test assignment: the mix maps each id to a
    * bucket in [0, 10000) and cumulative fraction boundaries carve the
    * named splits. Properties that matter for eval hygiene: the split is
    * a pure function of the id (reproducible across runs, clusters and
    * engines — same arithmetic in plain SQL), membership never depends
    * on partitioning or row order, and a document can never land in two
    * splits. Fractions are resolved to integer bucket boundaries
    * (round(frac·10000)), so the realized shares are exact multiples of
    * 0.01% rather than float-comparison-dependent.
    */
  def assignSplits(docs: DataFrame,
                   splits: Seq[(String, Double)] = Seq(
                     "train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                   idCol: String = "doc_id"): DataFrame =
    docs.withColumn("split", splitColumn(col(idCol), splits))

  /** The split assignment as a pure Column over an arbitrary integer
    * key — shared by [[assignSplits]] (key = the id) and
    * [[assignSplitsLeakFree]] (key = the duplicate-cluster
    * representative). */
  private def splitColumn(key: Column,
                          splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000)
    }.tail
    val bucket = pmod(mixed(key), lit(10000L))
    splits.init.zip(bounds.init)
      .foldRight(lit(splits.last._1)) { case (((name, _), b), other) =>
        when(bucket < b, name).otherwise(other)
      }
  }

  /** LEAKAGE-FREE split: near-duplicate clusters land whole on one side.
    * A near-dup of a training document inside val/test IS train-test
    * contamination (the leakage Lee et al. 2022, arXiv:2107.06499,
    * measure); a per-id hash split scatters every dup cluster across the
    * boundary. Here `pairs` — ANY dedup family's (a_id, b_id) output —
    * closes into connected components and every member splits by its
    * component REPRESENTATIVE (min reachable id; singletons by their own
    * id), making split membership constant on each cluster by
    * construction.
    *
    * Scale shape: CC is the bounded label-prop/driver-solve hybrid
    * ([[Dedup.connectedComponents]]); the rest is one left join of the
    * corpus against the (tiny, dup-graph-sized) component table and a
    * per-row projection. Returns the corpus plus `rep` and `split`.
    */
  def assignSplitsLeakFree(docs: DataFrame, pairs: DataFrame,
                           splits: Seq[(String, Double)] = Seq(
                             "train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                           idCol: String = "doc_id"): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("component"))
    docs.join(comps, Seq(idCol), "left")
      .withColumn("rep",
        coalesce(col("component"), col(idCol).cast("long")))
      .drop("component")
      .withColumn("split", splitColumn(col("rep"), splits))
  }

  /** Per-shard balance/volume stats — the manifest's content as a
    * DataFrame: (shard, n_docs, n_tokens, min_id, max_id). One scan,
    * two-phase aggregate, nShards result rows.
    */
  def shardStats(docs: DataFrame, nShards: Int, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    assign(Dedup.spread(docs), nShards, idCol)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))

  /** Writes the corpus as `shard=K/` parquet directories (one file per
    * shard via the shard-hash exchange) plus `_manifest.json` with the
    * per-shard row and token counts. Returns the manifest rows.
    */
  def writeShards(docs: DataFrame, path: String, nShards: Int,
                  idCol: String = "doc_id", textCol: String = "text")
      : Array[(Int, Long, Long)] = {
    // persisted: the manifest aggregates the SAME materialized rows the
    // shard files were written from — one corpus scan, and the manifest
    // cannot disagree with the files if the source changes between passes
    val assigned = assign(docs, nShards, idCol).persist()
    try {
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "mix")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val manifest = assigned
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"))
      .orderBy("shard")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val json = manifest.map { case (s, d, t) =>
      s"""{"shard":$s,"n_docs":$d,"n_tokens":$t}""" }
      .mkString("[", ",", "]")
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "_manifest.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    manifest
    } finally assigned.unpersist()
  }
}
